package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.functions.Text

/** Benchmark decontamination: flag training documents that share token
  * n-grams with an evaluation set — the standard pre-training hygiene
  * pass (n-gram collision screening of the training corpus against every
  * benchmark that will be used to evaluate the model).
  *
  * Scale design: the eval side is SMALL by contract (benchmarks are
  * thousands of docs; the training corpus is the 100 TB side), so the
  * distinct eval-gram set is broadcast and the training corpus streams
  * through ONE map-side semi-join pass — the corpus is never shuffled on
  * the gram key. Gram extraction is the compiled ShinglesOf kernel (pure
  * map). The only exchange is the per-doc overlap count, a groupBy on
  * doc id whose input is the (rare) collision rows only. The broadcast
  * is SIZED before it is forced: one aggregate over the (small) eval
  * side measures the distinct-gram payload against the budget, and past
  * it the screen degrades to a shuffled semi-join on the gram value —
  * still O(collisions) wide rows, never all-pairs.
  */
object Decontaminate {

  /** Per-training-doc n-gram overlap against `eval`.
    *
    * Returns every training doc with its distinct n-gram count, the
    * number of those n-grams that also occur anywhere in the eval set,
    * and the contamination flag (any overlap). Grams are DISTINCT per
    * doc on both sides — overlap is set intersection, so a boilerplate
    * gram repeated 100× in one doc counts once.
    *
    * `gramBroadcastBytes` bounds the eval-gram broadcast; < 0 (default)
    * reads `spark.graft.decontaminate.gramBroadcastBytes` (default
    * 512 MB — hundreds of benchmarks' worth of 5-gram vocabulary).
    * Sizing runs one aggregate over the eval side only (small by
    * contract); the 100 TB train side is never touched to decide.
    */
  def ngramOverlap(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      gramBroadcastBytes: Long = -1L
  ): DataFrame =
    // distinct gram VALUES only — the broadcast payload is the benchmark
    // vocabulary, not the benchmark corpus
    ngramOverlapGrams(train,
      eval.select(explode(Text.shingles(col(textCol), n)).as("g")).distinct(),
      idCol, textCol, n, gramBroadcastBytes)

  /** [[ngramOverlap]] against a PUBLISHED distinct eval-gram relation —
    * the stored-model entry point (the IngestDedup signature-store
    * convention applied to decontamination): the gram vocabulary is
    * derived ONCE when the benchmark set lands and persisted; every
    * later screen — batch or per-trigger (IngestDecon) — reads the
    * store instead of re-shingling the benchmarks. Sizing runs over the
    * gram relation only; the train side is never touched to decide.
    */
  def ngramOverlapGrams(
      train: DataFrame,
      evalGrams: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      gramBroadcastBytes: Long = -1L
  ): DataFrame = {
    def grams(df: DataFrame) = df.select(
      col(idCol).as("doc_id"),
      explode(Text.shingles(col(textCol), n)).as("g")
    )
    // clamped to the driver's collect ceiling like every dedup budget:
    // a broadcast the driver cannot collect must degrade, not die
    val budget = Dedup.clampToDriverLimit(train.sparkSession,
      if (gramBroadcastBytes >= 0) gramBroadcastBytes
      else train.sparkSession.conf
        .getOption("spark.graft.decontaminate.gramBroadcastBytes")
        .map(Dedup.parseBytes)
        .getOrElse(512L * 1024 * 1024))
    // UTF-8 payload + per-row object overhead, same accounting as the
    // minhashLsh sig budget; the agg is one pass over the (small by
    // contract) eval-gram side
    val Array(gramBytes) = evalGrams
      .agg(coalesce(sum(octet_length(col("g")) + lit(48L)), lit(0L)))
      .collect().map(_.getLong(0))
    val evalSide = if (budget > 0 && gramBytes <= budget) broadcast(evalGrams) else evalGrams
    val shared = grams(train)
      .join(evalSide, Seq("g"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_partages"))
    // The per-doc gram total is a SECOND map pass of the shingle kernel
    // over the train side — deliberate: folding it into the exploded
    // pass (size carried per gram row, aggregated per doc) would need
    // the per-doc rollup to run over ALL gram rows instead of the rare
    // collision survivors, turning the one narrow exchange into a
    // corpus-wide-grams exchange. Recomputing a compiled map kernel is
    // the cheaper side of that trade at any corpus size.
    train
      .select(col(idCol).as("doc_id"), size(Text.shingles(col(textCol), n)).as("n_grams"))
      .join(shared, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_grams"),
        coalesce(col("n_partages"), lit(0L)).as("n_partages"),
        (coalesce(col("n_partages"), lit(0L)) > 0).as("contamine")
      )
  }

  /** The APPLY-side reduction of [[ngramOverlap]]: just the distinct ids
    * of contaminated training docs (any shared n-gram with the eval
    * set) — what a removal stage consumes. Skips the per-doc overlap
    * counts and the n_grams census pass entirely: ONE corpus map pass
    * (gram explode → budgeted-broadcast semi join) plus a distinct over
    * the collision survivors. Same eval-side sizing as [[ngramOverlap]].
    */
  def contaminatedIds(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      gramBroadcastBytes: Long = -1L
  ): DataFrame =
    contaminatedGrams(train.sparkSession,
      train.select(col(idCol).as("doc_id"),
        explode(Text.shingles(col(textCol), n)).as("g")),
      eval.select(explode(Text.shingles(col(textCol), n)).as("g")).distinct(),
      gramBroadcastBytes)

  /** [[contaminatedIds]] with a PRE-TOKENIZED train side — the composed-
    * pipeline entry point (p04 keeps the scrubbed corpus in token
    * space); the eval side stays text (benchmarks arrive as raw text).
    */
  def contaminatedIdsTokens(
      trainToks: DataFrame,
      idCol: String,
      tokensCol: String,
      eval: DataFrame,
      evalTextCol: String,
      n: Int = 5,
      gramBroadcastBytes: Long = -1L
  ): DataFrame =
    contaminatedGrams(trainToks.sparkSession,
      trainToks.select(col(idCol).as("doc_id"),
        explode(org.apache.spark.sql.graft.TextExpr
          .shinglesOf(col(tokensCol), n)).as("g")),
      eval.select(explode(Text.shingles(col(evalTextCol), n)).as("g")).distinct(),
      gramBroadcastBytes)

  /** [[contaminatedIdsTokens]] against a PRE-BUILT eval gram relation —
    * the published-store entry point (the IngestDecon convention: the
    * benchmark gram vocabulary is derived once when the eval set lands
    * and persisted; later screens — and the p06 refresh's
    * corpus-survivors-vs-NEW-eval-grams pass — read the store instead
    * of re-shingling benchmarks). `evalGrams` is a one-column relation
    * of distinct gram strings (n must match the store's scheme).
    */
  def contaminatedIdsTokensVsGrams(
      trainToks: DataFrame,
      idCol: String,
      tokensCol: String,
      evalGrams: DataFrame,
      n: Int = 5,
      gramBroadcastBytes: Long = -1L,
      preparedEval: Option[DataFrame] = None
  ): DataFrame =
    contaminatedGrams(trainToks.sparkSession,
      trainToks.select(col(idCol).as("doc_id"),
        explode(org.apache.spark.sql.graft.TextExpr
          .shinglesOf(col(tokensCol), n)).as("g")),
      evalGrams.select(col(evalGrams.columns.head).as("g")),
      gramBroadcastBytes, preparedEval)

  /** The eval-side preparation of [[contaminatedGrams]] on its own: size
    * the gram relation (one bounded aggregate) and return the
    * broadcast-local side when it fits the budget, the raw relation
    * otherwise. Public so a composed pipeline (the p06 refresh) can run
    * this driver-side measurement+collect CONCURRENTLY with unrelated
    * stages and pass the result back via `preparedEval` — the screen
    * itself then starts with zero eval-side jobs on its critical path.
    */
  def preparedEvalGrams(
      evalGrams0: DataFrame,
      gramBroadcastBytes: Long = -1L
  ): DataFrame = {
    val spark = evalGrams0.sparkSession
    val evalGrams = evalGrams0.select(col(evalGrams0.columns.head).as("g"))
    val budget = evalBudget(spark, gramBroadcastBytes)
    // the eval side is small BY CONTRACT, but the budget must be proven
    // BEFORE any driver materialization: a row-count limit at the 48 B
    // accounting floor admits few-but-huge grams (a 1 KB-gram eval set
    // could pull GBs through a "budgeted" collect). So size first with
    // one distributed octet_length aggregate (the ngramOverlapGrams
    // convention) and only collect when the measured bytes fit — one
    // extra bounded eval-side job, paid for driver safety.
    val maxRows = math.max(1L, budget / 48L)
    val fits = budget > 0 && maxRows < Int.MaxValue && {
      val m = evalGrams
        .agg(count(lit(1)).as("n"),
          coalesce(sum(octet_length(col("g")) + lit(48L)), lit(0L)).as("octets"))
        .collect()(0)
      m.getLong(0) <= maxRows && m.getLong(1) <= budget
    }
    // the collect itself stays BOUNDED even though the aggregate just
    // proved the budget: a non-deterministic eval relation (or one that
    // changed between the two jobs) could otherwise exceed the proven
    // bytes — a check-then-collect TOCTOU. Cap the rows at the proven
    // ceiling and re-verify both dimensions on the driver; on any
    // mismatch fall back to the shuffled semi-join (correct either way).
    val evalSide =
      if (fits) {
        import spark.implicits._
        val capped = evalGrams.limit(maxRows.toInt).collect()
        val bytes = capped.iterator
          .map(r => r.getString(0).getBytes("UTF-8").length.toLong + 48L).sum
        if (capped.length < maxRows && bytes <= budget)
          broadcast(capped.map(_.getString(0)).toSeq.toDF("g"))
        else evalGrams
      } else evalGrams
    evalSide
  }

  private def evalBudget(
      spark: org.apache.spark.sql.SparkSession, gramBroadcastBytes: Long): Long =
    Dedup.clampToDriverLimit(spark,
      if (gramBroadcastBytes >= 0) gramBroadcastBytes
      else spark.conf
        .getOption("spark.graft.decontaminate.gramBroadcastBytes")
        .map(Dedup.parseBytes)
        .getOrElse(512L * 1024 * 1024))

  private def contaminatedGrams(
      spark: org.apache.spark.sql.SparkSession,
      trainGrams: DataFrame,
      evalGrams: DataFrame,
      gramBroadcastBytes: Long,
      preparedEval: Option[DataFrame] = None
  ): DataFrame =
    trainGrams
      .join(preparedEval.getOrElse(preparedEvalGrams(evalGrams, gramBroadcastBytes)),
        Seq("g"), "left_semi")
      .select(col("doc_id"))
      .distinct()

  /** Bloom-pruned variant of [[ngramOverlap]] — EXACTLY the same result
    * (the bloom only prunes; false positives die in an exact verify),
    * with the eval-side payload shrunk from the full gram vocabulary to
    * a bit array: ~`bitsPerGram`/8 bytes per gram (12 bits ≈ 1.5 B/gram
    * vs ~50 B/gram of UTF-8 + row overhead, fpp ≈ 0.5% at 5 hashes).
    * This is the screen to run when the benchmark vocabulary outgrows
    * the [[ngramOverlap]] broadcast budget but all-gram shuffling of a
    * 100 TB corpus is still unaffordable: the corpus streams ONE
    * map-side pass against the bloom (a plan literal, codegen'd k-probe
    * per gram), and only the surviving ~fpp fraction plus true
    * collisions reach the exact semi-join — whose shuffle is
    * O(survivors), not O(corpus grams).
    *
    * The bloom is built DISTRIBUTED (explode k positions per gram →
    * bit_or per 64-bit word); only the finished words array comes back
    * to the driver — `m/64` longs, bounded by `maxBits` (default 2^30
    * bits = 128 MB, ~90 M grams at 12 bits each) independent of gram
    * count, never the grams themselves. Hashes are xxhash64 seeded by
    * probe index, deterministic across retries and engines.
    */
  def ngramOverlapBloom(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      bitsPerGram: Int = 12,
      numHashes: Int = 5,
      maxBits: Long = 1L << 30
  ): DataFrame = {
    require(bitsPerGram >= 2 && numHashes >= 1, "bloom: need >=2 bits/gram and >=1 hash")
    def grams(df: DataFrame) = df.select(
      col(idCol).as("doc_id"),
      explode(Text.shingles(col(textCol), n)).as("g")
    )
    val evalGrams = grams(eval).select("g").distinct()
    // eval-side sizing count (small by contract — same pattern as the
    // ngramOverlap byte-sizing aggregate)
    val nGrams = evalGrams.count()
    val mRaw = math.max(64L, nGrams * bitsPerGram.toLong)
    require(mRaw <= maxBits,
      s"bloom of $nGrams grams needs $mRaw bits > maxBits=$maxBits; " +
        "raise maxBits or fall back to ngramOverlap's shuffled semi-join")
    val m = ((mRaw + 63) / 64) * 64
    val nWords = (m / 64).toInt

    def positions(g: org.apache.spark.sql.Column) =
      (0 until numHashes).map(i => pmod(xxhash64(lit(i), g), lit(m)))

    // distributed build: k positions per gram, OR'd into 64-bit words;
    // the collect is the finished bit array only
    val wordRows = evalGrams
      .select(explode(array(positions(col("g")): _*)).as("pos"))
      .select((col("pos") / 64).cast(LongType).as("w"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast(IntegerType)).as("bit"))
      .groupBy(col("w")).agg(expr("bit_or(bit)").as("word"))
      .collect()
    val words = new Array[Long](nWords)
    wordRows.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    val bloom = typedLit(words)

    // map-side probe: all k bits set ⇒ candidate (codegen'd, no UDF)
    val shared = grams(train)
      .filter(positions(col("g"))
        .map(p => call_function("shiftright",
          element_at(bloom, (p / 64).cast(IntegerType) + 1),
          (p % 64).cast(IntegerType)).bitwiseAND(lit(1L)) === lit(1L))
        .reduce(_ && _))
      // exact verify over survivors only. The eval side takes the SAME
      // budgeted broadcast decision as ngramOverlap — leaving it to AQE
      // is not free: AQE re-plans only after the leaf exchanges
      // materialize, so the survivor side pays its shuffle WRITE first,
      // and on a bloom-hostile corpus (tiny vocabulary ⇒ the prune
      // barely bites) that write is nearly the full gram relation —
      // measured 422 MB at the adversarial 100× stress tier vs ~30 MB
      // hinted. Past the budget (the vocabulary the bloom exists for)
      // the un-hinted shuffle IS the honest plan, over survivors only.
      .join(verifySide(train.sparkSession, evalGrams), Seq("g"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_partages"))
    train
      .select(col(idCol).as("doc_id"), size(Text.shingles(col(textCol), n)).as("n_grams"))
      .join(shared, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_grams"),
        coalesce(col("n_partages"), lit(0L)).as("n_partages"),
        (coalesce(col("n_partages"), lit(0L)) > 0).as("contamine")
      )
  }

  /** The verify-join eval side under the gram broadcast budget (the
    * ngramOverlap sizing: UTF-8 payload + 48 B/row, driver-clamped).
    */
  private def verifySide(
      spark: org.apache.spark.sql.SparkSession, evalGrams: DataFrame): DataFrame = {
    val budget = Dedup.clampToDriverLimit(spark,
      spark.conf
        .getOption("spark.graft.decontaminate.gramBroadcastBytes")
        .map(Dedup.parseBytes)
        .getOrElse(512L * 1024 * 1024))
    val Array(gramBytes) = evalGrams
      .agg(coalesce(sum(octet_length(col("g")) + lit(48L)), lit(0L)))
      .collect().map(_.getLong(0))
    if (budget > 0 && gramBytes <= budget) broadcast(evalGrams) else evalGrams
  }
}
