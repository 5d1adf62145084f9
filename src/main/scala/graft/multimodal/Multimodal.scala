package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The image/audio codecs are NOT in this container, so the decode kernel
  * is a clearly-marked deterministic fake (`fakeDecode`) — the Spark-side
  * contract (schema, batching via mapPartitions, partition sizing, typed
  * output) is real and tested. Swapping `fakeDecode` for a JNI/codec call
  * is a one-function change.
  *
  * Scale notes: media rows are wide — `maxPartitionBytes` should be
  * lowered for real payloads so a task holds O(100) rows, and feature
  * extraction is per-partition (amortizes codec init, the same reason
  * Python pipelines use mapInPandas batches).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(
    Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField(
        "meta",
        StructType(
          Seq(
            StructField("width", IntegerType),
            StructField("height", IntegerType),
            StructField("duration_ms", IntegerType)
          )
        )
      )
    )
  )

  /** Build a media table from the documents fixture: UTF-8 payload bytes,
    * metadata derived deterministically from the id.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")), (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (pmod(col("doc_id"), lit(8)) * 160 + 320).cast(IntegerType).as("width"),
        (pmod(col("doc_id"), lit(8)) * 90 + 180).cast(IntegerType).as("height"),
        (pmod(col("doc_id"), lit(60)) * 1000 + 1000).cast(IntegerType).as("duration_ms")
      ).as("meta")
    )

  /** STUB decode kernel: a real implementation would call the codec here.
    * The fake derives a dim-`featDim` float feature from payload bytes —
    * deterministic AND order-independent (exact integer byte sums, one
    * float division at the end), so the result is reproducible by any
    * engine from the raw bytes regardless of summation order.
    */
  private def fakeDecode(payload: Array[Byte], featDim: Int): Array[Float] = {
    val acc = new Array[Long](featDim)
    var i = 0
    while (i < payload.length) {
      acc(i % featDim) += (payload(i) & 0xff)
      i += 1
    }
    val out = new Array[Float](featDim)
    var j = 0
    while (j < featDim) { out(j) = (acc(j).toDouble / 255.0).toFloat; j += 1 }
    out
  }

  /** Per-partition feature extraction over the binary column — the Scala
    * equivalent of a mapInPandas batch UDF: one decoder per partition,
    * rows streamed through it.
    */
  def extractFeatures(media: DataFrame, featDim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, String, Array[Float])] = media
      .select(col("media_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // codec/session init would happen once per partition here
        rows.map { case (id, tpe, payload) => (id, tpe, fakeDecode(payload, featDim)) }
      }
    ds.toDF("media_id", "media_type", "features")
  }

  /** STUB resize kernel for image rows: scales the payload byte count
    * proportionally to the pixel-count ratio and rewrites the metadata
    * dims — a real implementation decodes, resamples, re-encodes in the
    * same per-partition batch loop. Deterministic, so the Spark-side
    * plumbing (schema evolution, per-partition batching) is
    * oracle-checkable.
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(col("media_type") === "image")
      .select(col("media_id"), col("payload"), col("meta.width").as("w"), col("meta.height").as("h"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        // decoder/scaler init once per partition
        rows.map { case (id, payload, w, h) =>
          val newLen = math.max(1L,
            payload.length.toLong * (targetW.toLong * targetH) / (w.toLong * h)).toInt
          val out = java.util.Arrays.copyOf(payload, newLen) // stub re-encode
          (id, targetW, targetH, out)
        }
      }
      .toDF("media_id", "largeur", "hauteur", "payload")
  }

  /** Frame sampling for video rows: split the payload into `n` byte
    * slices (a real impl would seek keyframes) — exercises the
    * explode-wide-binary pattern. Offsets are integer-defined
    * (step = total ÷ n, frame i = bytes [i·step, i·step + max(step,1))),
    * so any engine can recompute the exact slices; trailing remainder
    * bytes are dropped, and payloads shorter than n repeat the head byte.
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val total = length(col("payload"))
    val step = floor(total / n).cast(IntegerType)
    media
      .filter(col("media_type") === "video")
      .select(
        col("media_id"),
        explode(
          transform(
            sequence(lit(0), lit(n - 1)),
            i => struct(
              i.as("frame_no"),
              substring(col("payload"), i * step + 1, greatest(step, lit(1))).as("frame_bytes")
            )
          )
        ).as("frame")
      )
      .select(col("media_id"), col("frame.frame_no").as("frame_no"), col("frame.frame_bytes").as("frame_bytes"))
  }
}
