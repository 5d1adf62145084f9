package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.11 — the SQL surface for the custom kernels: a session
  * created with `spark.sql.extensions=graft.engine.GraftExtensions` must
  * resolve the graft_* functions to the same expressions the DataFrame
  * API builds, so SQL and Scala agree bit-for-bit.
  */
class ExtensionsSpec extends AnyFunSuite {

  /** Builds a SEPARATE session instance (same underlying SparkContext)
    * with the extensions installed; restores the shared session after.
    */
  private def withExtendedSession[A](f: SparkSession => A): A = {
    val base = TestSession.spark // ensures the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // `spark.sql.extensions` is a STATIC conf — it only applies when the
    // SparkContext is created (spark-submit --conf, the production path).
    // The test JVM shares one context across suites, so install the same
    // injector class through the builder hook instead.
    val s = SparkSession
      .builder()
      .master("local[8]")
      .withExtensions(new graft.engine.GraftExtensions)
      .getOrCreate()
    try f(s)
    finally {
      // do NOT stop s — it shares the JVM-wide SparkContext
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("graft_* SQL functions resolve and match the DataFrame API bit-for-bit") {
    withExtendedSession { s =>
      import s.implicits._
      Seq((1L, "spark makes big data small"), (2L, "small data stays small"))
        .toDF("id", "text")
        .createOrReplaceTempView("docs")
      val sql = s.sql(
        """SELECT id,
          |  graft_rolling_hash(split(text, ' ')) AS rh,
          |  graft_simhash64(split(text, ' ')) AS sh,
          |  graft_md5_simhash_bits(split(text, ' ')) AS shb,
          |  graft_minhash_sig(split(text, ' '), 2, 8) AS sig,
          |  graft_winnow_sketch(split(text, ' '), 2, 3) AS wk
          |FROM docs ORDER BY id""".stripMargin)
      val api = s
        .table("docs")
        .select(
          col("id"),
          graft.functions.Text.rollingFingerprint(split(col("text"), " ")).as("rh"),
          graft.functions.Text.simhash64(split(col("text"), " ")).as("sh"),
          graft.functions.Text.md5SimhashBits(split(col("text"), " ")).as("shb"),
          org.apache.spark.sql.graft.TextExpr.minhashSig(split(col("text"), " "), 2, 8).as("sig"),
          org.apache.spark.sql.graft.TextExpr.winnowSketch(split(col("text"), " "), 2, 3).as("wk")
        )
        .orderBy(col("id"))
      assert(sql.collect().toSeq == api.collect().toSeq)
    }
  }

  test("composed text functions from SQL: tokens, shingles, jaccard, quality, lang") {
    withExtendedSession { s =>
      val r = s.sql(
        """SELECT
          |  graft_tokens('  a b  c ') AS t,
          |  graft_shingles('a b c d', 2) AS sh,
          |  round(graft_jaccard(array('a b', 'b c'), array('b c', 'c d')), 6) AS j,
          |  graft_hamming64(7L, 1L) AS h,
          |  graft_lang_guess('the cat is on the mat and it is fine') AS lg
          |""".stripMargin)
        .collect()
        .head
      assert(r.getSeq[String](0) == Seq("a", "b", "c"))
      assert(r.getSeq[String](1) == Seq("a b", "b c", "c d"))
      assert(r.getDouble(2) == 0.333333)
      assert(r.getInt(3) == 2)
      assert(r.getString(4) == "en")
    }
  }

  test("round-8 kernels from SQL: ngrams, lang/quality counts, md5 winnowing") {
    withExtendedSession { s =>
      val r = s.sql(
        """SELECT
          |  graft_ngrams(array('a', 'b', 'a', 'b'), 2) AS g,
          |  graft_lang_quality_counts('the cat, the hat!') AS k,
          |  graft_md5_winnow_sketch(array('w1', 'w2', 'w3', 'w4', 'w5'), 3, 4) AS w
          |""".stripMargin)
        .collect().head
      assert(r.getSeq[String](0) == Seq("a b", "b a", "a b"))
      assert(r.getSeq[Long](1) == Seq(2L, 0L, 0L, 0L, 0L, 2L))
      val w = r.getStruct(2)
      // struct must agree with the DataFrame-API kernel on the same tokens
      val api = s.range(1)
        .select(org.apache.spark.sql.graft.TextExpr
          .md5WinnowSketch(typedLit(Seq("w1", "w2", "w3", "w4", "w5")), 3, 4).as("w"))
        .collect().head.getStruct(0)
      assert(w == api)
      assert(w.getString(0).length == 16 && w.getString(1).nonEmpty)
    }
  }

  test("graft_repetition_scrub from SQL: intra-doc repeat collapses, matches the DataFrame API") {
    withExtendedSession { s =>
      val r = s.sql(
        """SELECT graft_repetition_scrub(
          |  array('a', 'b', 'c', 'p', 'q', 'r', 'a', 'b', 'c'), 3) AS kept""".stripMargin)
        .collect().head
      assert(r.getSeq[String](0) == Seq("a", "b", "c", "p", "q", "r"))
      val api = s.range(1)
        .select(org.apache.spark.sql.graft.TextExpr
          .repetitionScrub(typedLit(Seq("a", "b", "c", "p", "q", "r", "a", "b", "c")), 3)
          .as("kept"))
        .collect().head
      assert(r.getSeq[String](0) == api.getSeq[String](0))
    }
  }

  test("vector kernels from SQL: dot, cosine, sig match count") {
    withExtendedSession { s =>
      val r = s.sql(
        """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
          |  graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
          |  graft_cosine(array(0.0d, 0.0d), array(1.0d, 0.0d)) AS z,
          |  graft_sig_match_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS m""".stripMargin)
        .collect()
        .head
      assert(r.getDouble(0) == 11.0)
      assert(r.getDouble(1) == 1.0)
      assert(r.getDouble(2) == 0.0)
      assert(r.getInt(3) == 2)
    }
  }

  test("shape parameters must be integer literals (analysis-time error)") {
    withExtendedSession { s =>
      val e = intercept[Exception] {
        s.sql("SELECT graft_minhash_sig(array('a'), 2, 1 + 1)").collect()
      }
      assert(e.getMessage.contains("INTEGER literal"))
    }
  }
}
