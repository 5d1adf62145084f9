package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.sources.PgCopy

/** Property tests for the pure kernels (SURVEY §5: property tests for
  * smart-key bijectivity and parse/escape invariants). Raw ScalaCheck
  * (no scalatest bridge in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def check(label: String, p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, s"$label: ${r.status}")
  }

  private val dateGen: Gen[java.time.LocalDate] =
    Gen.choose(0L, 365L * 200).map(java.time.LocalDate.of(1970, 1, 1).plusDays(_))

  test("smart yyyymmdd key is bijective over dates") {
    check("smart-key", Prop.forAll(dateGen) { d =>
      val key = d.getYear * 10000 + d.getMonthValue * 100 + d.getDayOfMonth
      val back = java.time.LocalDate.of(key / 10000, key / 100 % 100, key % 100)
      back == d && key > 19700000 && key < 21700000
    })
  }

  test("PG COPY escape/unescape round-trips arbitrary strings") {
    check("escape-roundtrip", Prop.forAll { (s: String) =>
      PgCopy.unescape(PgCopy.escape(s)) == s
    })
  }

  test("escaped values never contain raw delimiters") {
    check("no-raw-delims", Prop.forAll { (s: String) =>
      val e = PgCopy.escape(s)
      !e.contains('\t') && !e.contains('\n') && !e.contains('\r')
    })
  }

  test("PG array literal quote/parse round-trips arbitrary element lists") {
    val elems = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr,
      Gen.const("has space"), Gen.const("a,b"), Gen.const("q\"uote"),
      Gen.const("back\\slash"), Gen.const("NULL"), Gen.const("")
    ))
    check("array-roundtrip", Prop.forAll(elems) { xs =>
      val literal = xs.map(PgCopy.quoteArrayElem).mkString("{", ",", "}")
      PgCopy.parseArray(literal) == xs
    })
  }

  // ------------------------------------------------------------------
  // Round-8 compiled text kernels vs independent references (pure JVM,
  // no Spark session — the kernels are static functions).
  // ------------------------------------------------------------------
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.graft.TextKernels

  private def toks(xs: Seq[String]): ArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
  private def strs(a: ArrayData): Seq[String] =
    (0 until a.numElements()).map(a.getUTF8String(_).toString)

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).map(_.take(6))
  private val tokensGen = Gen.listOf(wordGen).map(_.take(40))

  test("ngramsOf kernel == sliding-window reference, any n") {
    val g = for { ts <- tokensGen; n <- Gen.choose(1, 5) } yield (ts, n)
    check("ngrams-ref", Prop.forAll(g) { case (ts, n) =>
      val expected = if (ts.length < n) Nil else ts.sliding(n).map(_.mkString(" ")).toList
      strs(TextKernels.ngramsOf(toks(ts), n)) == expected
    })
  }

  test("chunksOf kernel == grouped reference (full chunks only), any width") {
    val g = for { ts <- tokensGen; w <- Gen.choose(1, 7) } yield (ts, w)
    check("chunks-ref", Prop.forAll(g) { case (ts, w) =>
      val expected = ts.grouped(w).filter(_.length == w).map(_.mkString(" ")).toList
      strs(TextKernels.chunksOf(toks(ts), w)) == expected
    })
  }

  test("md5WinnowSketch kernel == MessageDigest + sliding-minima reference") {
    val g = for { ts <- tokensGen; n <- Gen.choose(1, 4); w <- Gen.choose(1, 6) } yield (ts, n, w)
    check("winnow-ref", Prop.forAll(g) { case (ts, n, w) =>
      val row = TextKernels.md5WinnowSketch(toks(ts), n, w)
      val (gotEmp, gotSk) = (row.getUTF8String(0).toString, row.getUTF8String(1).toString)
      if (ts.length < n) gotEmp == "" && gotSk == ""
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hs = ts.sliding(n).map { g =>
          md.reset()
          md.digest(g.mkString(" ").getBytes("UTF-8"))
            .take(8).map(b => f"$b%02x").mkString
        }.toVector
        val minima = hs.indices.map(i => hs.slice(i, math.min(i + w, hs.length)).min)
        gotEmp == hs.min && gotSk == minima.distinct.sorted.mkString(",")
      }
    })
  }

  test("langQualityCounts kernel == java.util.regex reference on adversarial text") {
    val pieces = Gen.oneOf(
      wordGen, Gen.const("the"), Gen.const("de"), Gen.const("la"), Gen.const("a"),
      Gen.const("idées"), Gen.const("und"), Gen.const("es"), Gen.const("_a"),
      Gen.const("汉字"), Gen.const("你好"), Gen.const("a1"), Gen.const("1a"),
      Gen.const(","), Gen.const("."), Gen.const("!"), Gen.const(";"), Gen.const("?"),
      Gen.const(":"), Gen.const("-"), Gen.const("\"")
    )
    val textGen = Gen.listOf(pieces).map(_.take(60)).flatMap { ws =>
      Gen.oneOf(" ", "", "  ").map(sep => ws.mkString(sep))
    }
    val regexes = Seq(
      "\\b(the|a|of|to|in|and|is|it|that|for)\\b",
      "\\b(le|la|les|de|des|un|une|et|est|que)\\b",
      "\\b(der|die|das|und|ist|ein|eine|nicht|mit|auf)\\b",
      "\\b(el|la|los|las|de|un|una|y|es|que)\\b",
      "[一-鿿]", "[.,!?;:]"
    ).map(java.util.regex.Pattern.compile)
    check("langcounts-ref", Prop.forAll(textGen) { text =>
      val got = TextKernels.langQualityCounts(UTF8String.fromString(text))
      val expected = regexes.map { p =>
        val m = p.matcher(text); var c = 0L; while (m.find()) c += 1; c
      }
      (0 until 6).forall(i => got.getLong(i) == expected(i))
    })
  }

  test("repetitionCounts kernel == collections reference on repetition-heavy token lists") {
    // tiny vocabulary so top/dup counters actually bind
    val tokGen = Gen.listOf(Gen.oneOf("a", "b", "ab", "ba", "aa", "c")).map(_.take(50))
    check("repetition-ref", Prop.forAll(tokGen) { toks =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(UTF8String.fromString).toArray)
      val got = (0 until 5).map(TextKernels.repetitionCounts(arr).getLong(_))
      val bgs = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toList
      val bgCounts = bgs.groupBy(identity).values.map(_.size.toLong)
      val expected = Seq(
        toks.length.toLong,
        if (toks.isEmpty) 0L else toks.groupBy(identity).values.map(_.size).max.toLong,
        bgs.length.toLong,
        if (bgs.isEmpty) 0L else bgCounts.max,
        bgCounts.filter(_ >= 2).sum)
      got == expected
    })
  }
}
