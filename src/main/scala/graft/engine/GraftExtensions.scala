package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.{ChunksOf, CosineSim, DotProduct, LangQualityCounts, Md5SimHashBits, Md5WinnowSketch, MinHashSig, NgramsOf, RandomProjections, RepetitionCounts, RepetitionScrub, RollingHash, SigMatchCount, SimHash64, WinnowSketch}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the graft kernels (SURVEY §2.11) — registered through
  * the standard `SparkSessionExtensions` seam, so a SQL-only user gets
  * the custom Catalyst expressions without touching the Scala API:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.engine.GraftExtensions ...
  * SELECT doc_id, graft_simhash64(graft_tokens(text)) FROM documents
  * }}}
  *
  * Each function resolves to the SAME expression class the DataFrame API
  * uses (codegen'd static kernels — see `TextExpressions.scala`), so SQL
  * and Scala plans are identical. Arity/type errors surface at analysis
  * time; integer shape parameters (n, k, bits) must be literals because
  * they fix the expression's output schema.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(
        s"$fn: $arg must be an INTEGER literal (it fixes the output shape), got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$fn expects $n argument(s), got ${args.length}")

  private def inject(
      ext: SparkSessionExtensions,
      name: String,
      usage: String
  )(builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction(
      (
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
        (args: Seq[Expression]) => builder(args)
      )
    )

  /** Wrap a Column-composition function (functions.Text/Vectors style)
    * as an expression builder: the composed tree of BUILT-IN expressions
    * is spliced in at analysis time, exactly as the DataFrame API would.
    */
  private def composed1(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)(
      args: Seq[Expression]): Expression = {
    import org.apache.spark.sql.graft.TextExpr.{columnOf, expressionOf}
    expressionOf(f(columnOf(args.head)))
  }

  private def composed2(
      f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column)(
      args: Seq[Expression]): Expression = {
    import org.apache.spark.sql.graft.TextExpr.{columnOf, expressionOf}
    expressionOf(f(columnOf(args.head), columnOf(args(1))))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    inject(ext, "graft_tokens", "whitespace tokenization; blank text gives an empty array") {
      args => arity("graft_tokens", args, 1); composed1(graft.functions.Text.tokens)(args)
    }
    inject(ext, "graft_shingles", "deduplicated word n-gram shingles: (text, n)") { args =>
      arity("graft_shingles", args, 2)
      val n = intLit(args(1), "graft_shingles", "n")
      composed1(graft.functions.Text.shingles(_, n))(args)
    }
    inject(ext, "graft_jaccard", "exact Jaccard similarity of two shingle-set arrays") {
      args => arity("graft_jaccard", args, 2); composed2(graft.functions.Text.jaccard)(args)
    }
    inject(ext, "graft_hamming64", "Hamming distance between two 64-bit fingerprints") {
      args => arity("graft_hamming64", args, 2); composed2(graft.functions.Text.hamming64)(args)
    }
    inject(ext, "graft_quality_score", "Gopher-style document quality heuristic in [0,1]") {
      args => arity("graft_quality_score", args, 1); composed1(graft.functions.Text.qualityScore)(args)
    }
    inject(ext, "graft_lang_guess", "stopword/CJK-density language ID ('und' when unknown)") {
      args => arity("graft_lang_guess", args, 1); composed1(graft.functions.Text.langGuess)(args)
    }
    inject(ext, "graft_rolling_hash", "order-sensitive chained xxhash64 over a token array") {
      args => arity("graft_rolling_hash", args, 1); RollingHash(args.head)
    }
    inject(ext, "graft_simhash64", "xxhash64 SimHash fingerprint of a token array") {
      args => arity("graft_simhash64", args, 1); SimHash64(args.head)
    }
    inject(ext, "graft_md5_simhash_bits", "md5 SimHash as a 64-char bit string (engine-portable)") {
      args => arity("graft_md5_simhash_bits", args, 1); Md5SimHashBits(args.head)
    }
    inject(ext, "graft_minhash_sig", "k-component MinHash signature of n-gram shingles: (tokens, n, k)") {
      args =>
        arity("graft_minhash_sig", args, 3)
        MinHashSig(
          args.head,
          intLit(args(1), "graft_minhash_sig", "n"),
          intLit(args(2), "graft_minhash_sig", "k"))
    }
    inject(ext, "graft_winnow_sketch", "w smallest distinct n-gram shingle hashes: (tokens, n, w)") {
      args =>
        arity("graft_winnow_sketch", args, 3)
        WinnowSketch(
          args.head,
          intLit(args(1), "graft_winnow_sketch", "n"),
          intLit(args(2), "graft_winnow_sketch", "w"))
    }
    inject(ext, "graft_sig_match_count", "count of equal positions in two BIGINT arrays") {
      args => arity("graft_sig_match_count", args, 2); SigMatchCount(args.head, args(1))
    }
    inject(ext, "graft_dot", "dot product of two DOUBLE arrays") {
      args => arity("graft_dot", args, 2); DotProduct(args.head, args(1))
    }
    inject(ext, "graft_cosine", "cosine similarity of two DOUBLE arrays (0.0 on zero norm)") {
      args => arity("graft_cosine", args, 2); CosineSim(args.head, args(1))
    }
    inject(ext, "graft_random_projections", "n hyperplane projections of a DOUBLE array: (vec, n)") {
      args =>
        arity("graft_random_projections", args, 2)
        RandomProjections(args.head, intLit(args(1), "graft_random_projections", "n"))
    }
    inject(ext, "graft_ngrams", "word n-grams WITH multiplicity: (tokens, n)") { args =>
      arity("graft_ngrams", args, 2)
      NgramsOf(args.head, intLit(args(1), "graft_ngrams", "n"))
    }
    inject(ext, "graft_chunks", "non-overlapping width-token chunks: (tokens, width)") { args =>
      arity("graft_chunks", args, 2)
      ChunksOf(args.head, intLit(args(1), "graft_chunks", "width"))
    }
    inject(ext, "graft_lang_quality_counts",
      "en/fr/de/es stopword, CJK and punctuation counts in one text scan") {
      args => arity("graft_lang_quality_counts", args, 1); LangQualityCounts(args.head)
    }
    inject(ext, "graft_repetition_counts",
      "Gopher repetition counters over a token array: [n_tok, top_tok, n_bg, top_bg, dup_bg]") {
      args => arity("graft_repetition_counts", args, 1); RepetitionCounts(args.head)
    }
    inject(ext, "graft_repetition_scrub",
      "kept tokens after intra-document duplicated-k-gram span removal: (tokens, k)") { args =>
      arity("graft_repetition_scrub", args, 2)
      RepetitionScrub(args.head, intLit(args(1), "graft_repetition_scrub", "k"))
    }
    inject(ext, "graft_md5_winnow_sketch",
      "whole-document md5 winnowing (empreinte, sketch): (tokens, n, w)") { args =>
      arity("graft_md5_winnow_sketch", args, 3)
      Md5WinnowSketch(
        args.head,
        intLit(args(1), "graft_md5_winnow_sketch", "n"),
        intLit(args(2), "graft_md5_winnow_sketch", "w"))
    }
  }
}
