package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.Text
import org.apache.spark.sql.graft.TextExpr

/** Text kernels: tokenization, shingles, Jaccard, fingerprints,
  * language/quality heuristics (SURVEY §2.8 analogues + pipeline tier).
  */
class TextSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different words entirely unrelated text here"),
    (4L, ""),
    (5L, "   "),
    (6L, "one two")
  ).toDF("doc_id", "text")

  test("tokens: whitespace split, blank-safe") {
    val got = docs.select($"doc_id", Text.tokenCount($"text").as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 9, 2L -> 9, 3L -> 7, 4L -> 0, 5L -> 0, 6L -> 2))
  }

  test("shingles: n-gram count and distinctness") {
    val sh = docs.select($"doc_id", Text.shingles($"text", 3).as("sh"))
    val n = sh.collect().map(r => r.getLong(0) -> r.getSeq[String](1).length).toMap
    // 9 tokens -> 7 trigram positions, all distinct here; <3 tokens -> 0
    assert(n(1L) == 7 && n(3L) == 5 && n(4L) == 0 && n(6L) == 0)
  }

  test("jaccard: near-dup pair high, unrelated pair low, self = 1") {
    val sh = docs.filter($"doc_id" <= 3).select($"doc_id", Text.shingles($"text", 3).as("sh"))
    val pairs = sh.as("a").crossJoin(sh.as("b"))
      .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib"),
        Text.jaccard($"a.sh", $"b.sh").as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 1L)) == 1.0)
    assert(pairs((1L, 2L)) > 0.5 && pairs((1L, 2L)) < 1.0)
    assert(pairs((1L, 3L)) == 0.0)
  }

  test("simhash: custom expression matches the HOF formulation bit-for-bit") {
    val toks = docs.select($"doc_id", Text.tokens($"text").as("toks"))
    // reference HOF formulation (the original interpreted implementation)
    val hofWeights = aggregate(
      $"toks",
      array_repeat(lit(0L), 64),
      (acc, t) =>
        zip_with(
          acc,
          transform(sequence(lit(0), lit(63)),
            p => when(call_function("shiftright", xxhash64(t), p).bitwiseAND(lit(1L)) === 1, lit(1L)).otherwise(lit(-1L))),
          (w, d) => w + d
        )
    )
    val hofSim = aggregate(
      zip_with(hofWeights, sequence(lit(0), lit(63)),
        (w, p) => when(w > 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))),
      lit(0L),
      (acc, bit) => acc.bitwiseOR(bit)
    )
    val rows = toks.select(Text.simhash64($"toks").as("fast"), hofSim.as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("simhash: near-dup docs land at small hamming distance") {
    val fp = docs.filter(Text.tokenCount($"text") > 0)
      .select($"doc_id", Text.simhash64(Text.tokens($"text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(2L)) <= 12)
    assert(ham(fp(1L), fp(3L)) > 12)
  }

  test("rolling hash: custom expression matches chained xxhash64 HOF; order-sensitive") {
    val toks = docs.filter($"doc_id" <= 3).select($"doc_id", Text.tokens($"text").as("toks"))
    val hofRoll = aggregate($"toks", lit(0L), (acc, t) => xxhash64(acc, t))
    val rows = toks.select(Text.rollingFingerprint($"toks").as("fast"), hofRoll.as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    val ab = Seq((1L, "alpha beta"), (2L, "beta alpha")).toDF("id", "text")
      .select(Text.rollingFingerprint(Text.tokens($"text")).as("h")).collect()
    assert(ab(0).getLong(0) != ab(1).getLong(0))
  }

  test("winnow sketch: w smallest distinct shingle hashes, ascending; matches HOF") {
    val toks = docs.select($"doc_id", Text.tokens($"text").as("toks"), Text.shingles($"text", 3).as("sh"))
    val hofWinnow = slice(array_sort(transform($"sh", s => xxhash64(s))), 1, 4)
    val rows = toks
      .select(Text.winnowFingerprint($"toks", 3, 4).as("fast"), hofWinnow.as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("language guess: stopword-dominant languages detected; blank -> und") {
    val t = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "le chat est dans la maison et la vie est belle"),
      (3L, "der hund ist nicht mit der katze auf dem sofa"),
      (4L, "xyzzy plugh qwerty")
    ).toDF("doc_id", "text")
    val got = t.select($"doc_id", Text.langGuess($"text").as("l")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "fr", 3L -> "de", 4L -> "und"))
  }

  test("quality score: clean prose scores higher than junk") {
    val t = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away to the hills"),
      (2L, "a b c d e f g h i j k l m n o p"),
      (3L, "!!!! .... ;;;; ???? !!!! .... ;;;; ????")
    ).toDF("doc_id", "text")
    val got = t.select($"doc_id", Text.qualityScore($"text").as("q")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 1.0)
    assert(got(1L) > got(2L) && got(1L) > got(3L))
  }

  test("minhash signature expression: components bound shingle hashes, dup docs agree") {
    val t = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8"),
      (4L, "a b")
    ).toDF("doc_id", "text")
    val rows = t.select($"doc_id", TextExpr.minhashSig(Text.tokens($"text"), 3, 16).as("sig")).collect()
    val sig = rows.map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    assert(sig(1L).get == sig(2L).get, "identical docs must share signatures")
    assert(sig(1L).get != sig(3L).get, "different docs must differ")
    assert(sig(4L).isEmpty, "fewer tokens than shingle width -> null signature")
    assert(sig(1L).get.length == 16)
  }

  test("minhash band buckets: compiled expression == HOF xxhash64 formulation bit-for-bit") {
    val (bands, r) = (8, 2)
    val t = Seq((1L, "w1 w2 w3 w4 w5 w6 w7 w8"), (2L, "z1 z2 z3 z4 z5 z6 z7 z8"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextExpr.minhashSig(Text.tokens($"text"), 3, bands * r).as("sig"))
    val compiled = t.select($"doc_id",
      explode(TextExpr.minhashBands($"sig", bands, r)).as("bb")).collect()
      .map(x => (x.getLong(0), x.getStruct(1).getInt(0), x.getStruct(1).getLong(1))).toSet
    val hof = t.select($"doc_id",
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), xxhash64(b, slice($"sig", b * r + 1, lit(r))).as("bucket"))))
        .as("bb")).collect()
      .map(x => (x.getLong(0), x.getStruct(1).getInt(0), x.getStruct(1).getLong(1))).toSet
    assert(compiled == hof)
  }

  test("ngramsOf: compiled expression == transform(sequence) HOF, multiplicity kept") {
    val docs = Seq("a b a b a", "one two", "solo", "", "x y z w").toDF("text")
    val toks = Text.tokens($"text")
    val compiled = docs.select(TextExpr.ngramsOf(toks, 2).as("g")).collect()
      .map(_.getSeq[String](0))
    val hof = docs.select(
      when(size(toks) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(toks) - 2),
          i => concat_ws(" ", slice(toks, i + 1, lit(2))))).as("g")).collect()
      .map(_.getSeq[String](0))
    compiled.zip(hof).foreach { case (c, h) => assert(c == h, s"$c != $h") }
    assert(compiled.head == Seq("a b", "b a", "a b", "b a"))
  }

  test("gramHashes: compiled expression == xxhash64(concat_ws ∘ slice) HOF, position order") {
    val docs = Seq("a b c d e f g h i j", "one two three", "tiny", "", "a a a a a a a a")
      .toDF("text")
    val toks = Text.tokens($"text")
    val k = 3
    val compiled = docs.select(TextExpr.gramHashes(toks, k).as("h")).collect()
      .map(_.getSeq[Long](0))
    val hof = docs.select(
      when(size(toks) < k, array().cast("array<bigint>"))
        .otherwise(transform(sequence(lit(1), size(toks) - k + 1),
          i => xxhash64(concat_ws(" ", slice(toks, i, lit(k)))))).as("h")).collect()
      .map(_.getSeq[Long](0))
    compiled.zip(hof).foreach { case (c, h) => assert(c == h, s"$c != $h") }
    assert(compiled(2).isEmpty && compiled(3).isEmpty)
  }

  test("chunksOf: compiled expression == transform(sequence) HOF, full chunks only") {
    val docs = Seq("a b c d e f g h i", "a b c", "ab", "").toDF("text")
    val toks = Text.tokens($"text")
    val compiled = docs.select(TextExpr.chunksOf(toks, 4).as("c")).collect()
      .map(_.getSeq[String](0))
    val hof = docs.select(
      when(size(toks) < 4, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), (size(toks) / 4).cast("int") - 1),
          i => concat_ws(" ", slice(toks, i * 4 + 1, lit(4))))).as("c")).collect()
      .map(_.getSeq[String](0))
    compiled.zip(hof).foreach { case (c, h) => assert(c == h, s"$c != $h") }
    assert(compiled.head == Seq("a b c d", "e f g h")) // trailing partial dropped
  }

  test("langQualityCounts kernel == the six regexp_extract_all passes it replaces") {
    val docs = Seq(
      "the cat sat on the mat, and it was that good.",
      "le chat est sur la table; de la musique et des idées!",
      "der Hund ist nicht auf der Couch, und das ist gut",
      "el perro y la gata: es una casa de los abuelos",
      "汉字文本 with the word 和 mixed in; 你好!",
      "theater theory another atheist",     // substrings must NOT count
      "the,the.the!the the", "a a a", "", " ", "de la de un 1a a1 _a a_"
    ).toDF("text")
    val kernel = docs.select(TextExpr.langQualityCounts($"text").as("k")).collect()
      .map(_.getSeq[Long](0))
    val regexes = Seq(
      "\\b(the|a|of|to|in|and|is|it|that|for)\\b",
      "\\b(le|la|les|de|des|un|une|et|est|que)\\b",
      "\\b(der|die|das|und|ist|ein|eine|nicht|mit|auf)\\b",
      "\\b(el|la|los|las|de|un|una|y|es|que)\\b",
      "[一-鿿]", "[.,!?;:]"
    )
    val regex = docs.select(regexes.map(p => Text.matchCount($"text", p)): _*).collect()
      .map(r => (0 until 6).map(i => r.getInt(i).toLong))
    kernel.zip(regex).zipWithIndex.foreach { case ((k, r), i) =>
      assert(k == r, s"doc $i: kernel $k != regex $r")
    }
  }

  test("simhash chunk keys: compiled expression == shiftright/mask formulation bit-for-bit") {
    val (chunks, width) = (4, 16)
    val t = Seq((1L, -6148914691236517206L), (2L, 81985529216486895L)).toDF("doc_id", "simhash")
    val compiled = t.select($"doc_id",
      explode(TextExpr.simhashChunks($"simhash", chunks, width)).as("blk")).collect()
      .map(x => (x.getLong(0), x.getStruct(1).getInt(0), x.getStruct(1).getLong(1))).toSet
    val hof = t.select($"doc_id",
      explode(transform(sequence(lit(0), lit(chunks - 1)),
        c => struct(c.as("chunk"),
          call_function("shiftright", $"simhash", c * width)
            .bitwiseAND(lit((1L << width) - 1)).as("ckey")))).as("blk")).collect()
      .map(x => (x.getLong(0), x.getStruct(1).getInt(0), x.getStruct(1).getLong(1))).toSet
    assert(compiled == hof)
  }

  test("piiScrub: planted PII classes redact in order; null-class collisions resolved") {
    val planted = Seq(
      (1L, "write to alice.smith+spam@example-mail.com today"),
      (2L, "server at 192.168.10.100 port 8080"),
      (3L, "call +33-6-12-34-56-78 or 555-867-5309"),
      (4L, "fr mobile 06.12.34.56.78 and plain 1234567890"),
      // dotted quad must become <IP>, never feed the phone pattern
      (5L, "quad 168.10.100.20 is an address"),
      (6L, "no pii here at all"),
      (7L, "v1.2.3 release and range 10-20 stay untouched")
    ).toDF("doc_id", "text")
    val got = planted.select($"doc_id", Text.piiScrub($"text").as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "write to <EMAIL> today")
    assert(got(2L) == "server at <IP> port <NUM>")
    assert(got(3L) == "call <TEL> or <TEL>")
    assert(got(4L) == "fr mobile <TEL> and plain <NUM>")
    assert(got(5L) == "quad <IP> is an address")
    assert(got(6L) == "no pii here at all")
    assert(got(7L) == "v<NUM>.<NUM>.<NUM> release and range <NUM>-<NUM> stay untouched")
  }

  test("repetitionCounts: hand-checked docs through the codegen path") {
    val docs = Seq(
      (1L, "a a b"),     // top token a=2; bigrams [a a, a b] all unique
      (2L, "a a a"),     // bigrams [a a, a a]: top 2, dup instances 2
      (3L, ""),          // blank -> all zeros
      (4L, "x"),         // single token: no bigrams
      (5L, "p q p q p")  // tokens p=3; bigrams [p q, q p, p q, q p]: top 2, dup 4
    ).toDF("doc_id", "text")
    val got = docs
      .select($"doc_id", Text.repetitionCounts(Text.tokens($"text")).as("c"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(3L, 2L, 2L, 1L, 0L))
    assert(got(2L) == Seq(3L, 3L, 2L, 2L, 2L))
    assert(got(3L) == Seq(0L, 0L, 0L, 0L, 0L))
    assert(got(4L) == Seq(1L, 1L, 0L, 0L, 0L))
    assert(got(5L) == Seq(5L, 3L, 4L, 2L, 4L))
  }
}
