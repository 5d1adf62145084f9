package graft

import org.apache.spark.sql.functions._
import graft.operators.Mix
import graft.sources.Tables

/** Dataset mixing: copy counts must match an independent JVM md5
  * reference exactly, weights must act as up/down-sampling rates, and
  * the whole pass must stay map-side (no exchange).
  */
class MixSpec extends SparkSpec {
  import spark.implicits._

  private def refCopies(source: String, id: Long, w: Double): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$source:$id".getBytes("UTF-8"))
    val slot = Integer.parseInt(md.take(2).map("%02x".format(_)).mkString, 16)
    val base = math.floor(w).toInt
    base + (if (slot < ((w - math.floor(w)) * 65536).toInt) 1 else 0)
  }

  test("copy counts and epochs match the independent md5 reference") {
    val docs = Tables.documents(spark, sfDir)
    val weights = Map("src0" -> 2.5, "src1" -> 0.5, "src2" -> 0.0)
    val got = Mix.weightedSample(docs, "doc_id", "source", weights, defaultWeight = 1.0)
      .collect()
      .map(r => (r.getLong(0), r.getInt(4)) -> (r.getString(1), r.getInt(3)))
      .toMap
    val base = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    base.foreach { case (id, src) =>
      val n = refCopies(src, id, weights.getOrElse(src, 1.0))
      (0 until n).foreach { e =>
        assert(got.contains(id -> e), s"doc $id ($src, w=${weights.getOrElse(src, 1.0)}) missing epoch $e")
        assert(got(id -> e) == (src, n))
      }
      assert(!got.contains(id -> n), s"doc $id must have exactly $n epochs")
    }
    // weight 0 sources vanish entirely
    assert(!got.values.exists(_._1 == "src2"))
  }

  test("weights act as rates: upsample multiplies rows, downsample thins them") {
    val docs = Tables.documents(spark, sfDir)
    val out = Mix.weightedSample(docs, "doc_id", "source",
      Map("src0" -> 3.0, "src1" -> 0.5), defaultWeight = 1.0)
    val bySrc = out.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val baseCounts = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == baseCounts("src0") * 3, "integer weight = exact epoch multiply")
    assert(bySrc("src1") < baseCounts("src1"), "w=0.5 must thin the source")
    assert(bySrc("src1") > 0)
    assert(bySrc("src3") == baseCounts("src3"), "default weight 1.0 passes through")
  }

  test("a NULL source hashes like any other stratum — never silently dropped") {
    val docs = Seq(
      (1L, Option("srcA")), (2L, Option.empty[String]), (3L, Option.empty[String])
    ).toDF("doc_id", "source")
    val got = Mix.weightedSample(docs, "doc_id", "source", Map("srcA" -> 1.0), defaultWeight = 2.0)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // default weight 2.0 guarantees 2 epochs for the NULL-source docs;
    // a null-propagating slot hash would emit zero
    assert(got(2L) == 2L && got(3L) == 2L, s"NULL-source docs dropped or mis-weighted: $got")
    assert(got(1L) == 1L)
  }

  test("the mixing pass plans no exchange (pure map + bounded explode)") {
    val plan = Mix.weightedSample(Tables.documents(spark, sfDir), "doc_id", "source",
      Map("src0" -> 2.5)).queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"),
      s"mixing is a per-row decision and must never shuffle:\n$plan")
  }
}
