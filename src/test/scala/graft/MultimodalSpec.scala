package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal plumbing: binary payload column + typed metadata, batched
  * feature extraction, frame sampling. (Decode kernel is the documented
  * deterministic stub — the Spark-side contract is what is tested.)
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.fromDocuments(Tables.documents(spark, sfDir))

  test("media table: schema and deterministic metadata") {
    val df = media
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
    val r = df.filter($"media_id" === 3).collect().head
    assert(r.getString(1) == "image") // 3 % 3 == 0
    val meta = r.getStruct(3)
    assert(meta.getInt(0) == (3 % 8) * 160 + 320)
  }

  test("payload round-trips the source text bytes") {
    val row = media.select($"media_id", $"payload").filter($"media_id" === 1).collect().head
    val text = Tables.documents(spark, sfDir).filter($"doc_id" === 1)
      .select($"text").collect().head.getString(0)
    assert(new String(row.getAs[Array[Byte]](1), "UTF-8") == text)
  }

  test("feature extraction: fixed dim, deterministic, per-partition batched") {
    val f1 = Multimodal.extractFeatures(media, featDim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7), featDim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(f1.values.forall(_.length == 16))
    assert(f1 == f2, "features must not depend on partitioning")
  }

  test("resize: image rows only, dims rewritten, byte count scales with pixel ratio") {
    val resized = Multimodal.resize(media, 64, 64).collect()
    val nImages = media.filter($"media_type" === "image").count()
    assert(resized.length == nImages)
    resized.foreach { r =>
      assert(r.getInt(1) == 64 && r.getInt(2) == 64)
      assert(r.getAs[Array[Byte]](3).length >= 1)
    }
  }

  test("frame sampling: n frames per video row, bytes partition the payload") {
    val frames = Multimodal.sampleFrames(media, n = 4)
    val counts = frames.groupBy($"media_id").count().collect().map(_.getLong(1)).toSet
    assert(counts == Set(4L))
    val vids = media.filter($"media_type" === "video").count()
    assert(frames.select($"media_id").distinct().count() == vids)
  }
}
