package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * Two kernel tiers:
  *   - deterministic byte kernels (`fakeDecode`, stub resize) power the
  *     ORACLE-GATED catalog queries — the driver fixture's payloads are
  *     synthetic bytes, and these kernels are engine-reproducible from
  *     the raw bytes, so DuckDB can verify them exactly;
  *   - REAL image kernels (decode / resize / grid features) via the
  *     JDK's own ImageIO codecs (PNG/JPEG/BMP/GIF — no external
  *     library), spec'd with encode→decode round trips, plus WAV-PCM
  *     audio (pure header/byte arithmetic, no codec). Compressed
  *     audio/video decode stays out of scope: those codecs genuinely
  *     are not in this container.
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

  /** Centered byte-histogram feature for the ORACLE-GATED media
    * near-dup screen (m05): bucket the payload bytes mod `featDim`,
    * then center with EXACT integer arithmetic — c_j = featDim·S_j − ΣS
    * (cosine is scale-invariant, so the un-normalized integer form is
    * the centered mean up to a positive factor). Centering matters:
    * raw byte-sum features of text-like payloads all point near the
    * all-ones direction (natural cosines > 0.99 — no usable threshold);
    * centered, distinct payloads decorrelate (max natural cosine ≈ 0.97
    * on the fixture) while near-copies stay ≈ 1. Exact integers make
    * the vector — and every downstream dot product, which stays well
    * under 2^53 — bit-reproducible by ANY engine from the raw bytes in
    * any summation order, unlike [[fakeDecode]]'s float mean, whose
    * centering would be order-sensitive. Same per-partition batch loop
    * as [[extractFeatures]] (a real visual embedding would replace the
    * kernel, not the plumbing).
    */
  def centeredByteFeatures(media: DataFrame, featDim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val acc = new Array[Long](featDim)
        var i = 0
        while (i < payload.length) { acc(i % featDim) += (payload(i) & 0xff); i += 1 }
        val total = acc.sum
        (id, Array.tabulate(featDim)(j => (featDim * acc(j) - total).toDouble))
      })
      .toDF("media_id", "features")
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

  // ------------------------------------------------------------------
  // Real image kernels — the JDK ships PNG/JPEG/BMP/GIF codecs
  // (javax.imageio in java.desktop), so image decode does NOT need an
  // external library. The gated catalog queries (m01–m04) keep the
  // deterministic byte kernels above because the driver fixture's
  // payloads are synthetic bytes, not encoded images; the operators
  // below are the production path, spec'd with PNG encode→decode round
  // trips in MultimodalSpec. Compressed audio/video codecs remain out
  // of scope (not in the JDK); uncompressed WAV-PCM is handled below.
  // ------------------------------------------------------------------

  private def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode image rows and report their REAL dimensions (vs. the carried
    * metadata): the validation step of an ingest pipeline. Undecodable
    * payloads survive with decodable=false rather than failing the job —
    * at corpus scale a poison payload must never kill the stage.
    */
  def decodeImageMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(col("media_type") === "image")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // ImageIO plugin scan happens once per JVM; per-partition loop
        // amortizes stream/reader setup
        rows.map { case (id, p) =>
          readImage(p) match {
            case Some(img) => (id, true, img.getWidth, img.getHeight)
            case None      => (id, false, -1, -1)
          }
        }
      }
      .toDF("media_id", "decodable", "largeur", "hauteur")
  }

  /** Deterministic REAL-PNG fixture for the resize gate: one encoded
    * PNG per image-tier doc (doc_id % 3 = 0), four quadrants each
    * filled with a doc-keyed constant color — the engine-side golden
    * that makes the real codec path ORACLE-checkable. Constant regions
    * are invariant under any convex interpolation (bilinear included),
    * so after a resize the color sampled DEEP inside each quadrant has
    * a closed form SQL can state, while still requiring the real
    * decode → rescale → re-encode → decode chain (and the quadrant
    * layout pins the geometric mapping: a flip or transpose breaks the
    * hash). Same per-partition batch loop as every media kernel.
    */
  def syntheticQuadPng(
      docs: DataFrame, w: Int = 80, h: Int = 40, everyNth: Int = 1): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      // image-tier docs (%3), optionally every Nth of them: the codec
      // kernel is per-image identical, so a deterministic subsample
      // gates the same path at a fraction of the wall cost
      .filter(pmod(col("doc_id"), lit(3 * everyNth)) === 0)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
            img.setRGB(x, y, quadColor(id, q))
            x += 1
          }
          y += 1
        }
        (id, "image", encodePng(img))
      })
      .toDF("media_id", "media_type", "payload")
  }

  /** The quadrant color formula the oracle mirrors (q = 0 TL, 1 TR,
    * 2 BL, 3 BR): packed 0xRRGGBB.
    */
  private def quadColor(id: Long, q: Int): Int = {
    val r = ((7 * id + 37 * q + 11) % 256).toInt
    val g = ((17 * id + 23 * q + 5) % 256).toInt
    val b = ((13 * id + 41 * q + 3) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Decode each payload and sample one pixel DEEP inside each quadrant
    * (at ¼/¾ of the DECODED dimensions — far from the quadrant seams
    * where interpolation blends): the verification tail of the real
    * resize gate. One row per (media, quadrant) with the decoded dims
    * and the packed RGB actually found in the emitted bytes.
    */
  def decodeQuadSample(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        readImage(p).toSeq.flatMap { img =>
          val w = img.getWidth; val h = img.getHeight
          Seq(0, 1, 2, 3).map { q =>
            val x = if ((q & 1) == 0) w / 4 else 3 * w / 4
            val y = if ((q & 2) == 0) h / 4 else 3 * h / 4
            (id, q, w, h, img.getRGB(x, y) & 0xffffff)
          }
        }
      })
      .toDF("media_id", "quadrant", "largeur", "hauteur", "couleur")
  }

  /** INTERLEAVED multimodal documents — where the pack tier meets the
    * media tier. A multimodal training document is a SEQUENCE of
    * segments: text spans and media items. The trainer-facing form is
    * one token stream per document in which each media segment occupies
    * a placeholder RUN (a reserved token repeated for the media's token
    * budget — the "image patch tokens" convention) at its position in
    * the reading order, while the media bytes ride a parallel store
    * keyed by id; provenance is the (placeholder position ↔ media
    * fingerprint) correspondence. Packing such a stream needs NOTHING
    * new from [[graft.operators.Pack]] — placeholders are tokens — but
    * the round trip must reproduce BOTH the text (placeholder-stripped
    * stream hash) and the media SEQUENCE (each run's position, width
    * and payload fingerprint) after the store re-cut the stream on
    * sequence boundaries.
    *
    * Fixture shape (image-tier docs, doc_id % 3 = 0): an 8-token image
    * run spliced after ⌊n/3⌋ text tokens and a 4-token audio run after
    * ⌊2n/3⌋; the image payload is the text's first-half characters, the
    * audio its second half (deterministic, so the oracle states every
    * fingerprint in closed form). One row per doc: the interleaved
    * stream plus the two media payloads. Pure map, no exchange.
    */
  def interleaved(
      docs: DataFrame,
      imageTokens: Int = 8,
      audioTokens: Int = 4
  ): DataFrame = {
    import graft.functions.Text
    docs
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("text"), Text.tokens(col("text")).as("a"))
      // INTEGER division throughout (Column./ is floating division and
      // silently truncates slice widths off-by-one at n % 3 != 0)
      .withColumn("n", size(col("a")))
      .withColumn("t1", expr("n div 3"))
      .withColumn("t2", expr("(2 * n) div 3"))
      .select(
        col("doc_id"),
        concat(
          expr("slice(a, 1, t1)"),
          array_repeat(lit("<img>"), lit(imageTokens)),
          expr("slice(a, t1 + 1, t2 - t1)"),
          array_repeat(lit("<aud>"), lit(audioTokens)),
          expr("slice(a, t2 + 1, n - t2)")
        ).as("jetons"),
        col("t1").cast("long").as("debut_image"),
        (col("t2") + imageTokens).cast("long").as("debut_audio"),
        expr("substring(text, 1, length(text) div 2)").as("media_image"),
        expr("substring(text, length(text) div 2 + 1, length(text))").as("media_audio")
      )
  }

  /** The narrow per-doc media-payload projection of [[interleaved]]'s
    * corpus — (doc_id, media_image, media_audio) under the same row
    * filter, WITHOUT tokenizing or splicing anything. A maintenance
    * pass needs the interleaved token streams only for the entrant
    * slices it appends; the maintained store itself carries every live
    * doc's tokens, so a read-back report joins THIS projection for the
    * payload hashes instead of re-interleaving the whole corpus
    * (r18 verdict ask #7 — the p07 timed-path trim).
    */
  def mediaPayloads(docs: DataFrame): DataFrame =
    docs
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(
        col("doc_id"),
        expr("substring(text, 1, length(text) div 2)").as("media_image"),
        expr("substring(text, length(text) div 2 + 1, length(text))").as("media_audio"))

  /** Real image resize: decode → bilinear rescale → PNG re-encode, one
    * decoder per partition. Undecodable rows are dropped (they were
    * already flagged by [[decodeImageMeta]] upstream).
    */
  def resizeImagesReal(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(col("media_type") === "image")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, p) =>
          readImage(p).map { img =>
            val scaled = new java.awt.image.BufferedImage(
              targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = scaled.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, targetW, targetH, null)
            g.dispose()
            (id, targetW, targetH, encodePng(scaled))
          }
        }
      }
      .toDF("media_id", "largeur", "hauteur", "payload")
  }

  /** Real image features: mean grayscale over a grid×grid cell raster —
    * the classic cheap visual embedding (and the shape a real model
    * projection would replace). Output dim = grid².
    */
  def imageGridFeatures(media: DataFrame, grid: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(col("media_type") === "image")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, p) =>
          readImage(p).map { img =>
            val w = img.getWidth; val h = img.getHeight
            val acc = new Array[Double](grid * grid)
            val cnt = new Array[Long](grid * grid)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val gray =
                  (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0 / 255.0
                val cell = math.min(grid - 1, y * grid / h) * grid + math.min(grid - 1, x * grid / w)
                acc(cell) += gray; cnt(cell) += 1
                x += 1
              }
              y += 1
            }
            val feat = Array.tabulate(grid * grid)(i =>
              if (cnt(i) == 0) 0f else (acc(i) / cnt(i)).toFloat)
            (id, feat)
          }
        }
      }
      .toDF("media_id", "features")
  }

  // ------------------------------------------------------------------
  // Real audio kernels — RIFF/WAV PCM needs no codec at all: the header
  // is plain byte arithmetic and the samples are raw integers. Same
  // poison-payload contract as the image tier.
  // ------------------------------------------------------------------

  private case class WavInfo(
      channels: Int, sampleRate: Int, bitsPerSample: Int, dataOffset: Int, dataLen: Int) {
    def frames: Int = if (channels == 0 || bitsPerSample == 0) 0
      else dataLen / (channels * (bitsPerSample / 8))
    def durationMs: Int =
      if (sampleRate == 0) 0 else (frames.toLong * 1000 / sampleRate).toInt
  }

  /** Minimal RIFF/WAV chunk walk (little-endian): accepts PCM (format 1)
    * with a fmt chunk before data; anything else → None.
    */
  private def parseWav(p: Array[Byte]): Option[WavInfo] = {
    @inline def u16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    @inline def u32(i: Int): Int =
      (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) | ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)
    @inline def tag(i: Int, s: String): Boolean =
      i + 4 <= p.length && s.indices.forall(j => p(i + j) == s.charAt(j).toByte)
    if (p.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    while (off + 8 <= p.length) {
      val size = u32(off + 4)
      if (size < 0 || off + 8 + size > p.length) return None
      if (tag(off, "fmt ") && size >= 16) {
        if (u16(off + 8) != 1) return None // PCM only
        fmt = Some((u16(off + 10), u32(off + 12), u16(off + 22)))
      } else if (tag(off, "data")) {
        return fmt.map { case (ch, rate, bits) => WavInfo(ch, rate, bits, off + 8, size) }
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  /** True audio metadata for audio rows: decodability, channel count,
    * sample rate, PCM duration — the audio twin of [[decodeImageMeta]].
    */
  def decodeWavMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(col("media_type") === "audio")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        parseWav(p) match {
          case Some(w) => (id, true, w.channels, w.sampleRate, w.durationMs)
          case None    => (id, false, -1, -1, -1)
        }
      })
      .toDF("media_id", "decodable", "canaux", "sample_rate", "duree_ms")
  }

  /** RMS energy per time window over 16-bit PCM (channel-interleaved
    * samples pooled) — the classic cheap audio embedding; output dim =
    * `windows`. Non-PCM/undecodable rows are dropped.
    */
  def audioRmsFeatures(media: DataFrame, windows: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(col("media_type") === "audio")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        parseWav(p).filter(_.bitsPerSample == 16).map { w =>
          val nSamp = w.dataLen / 2
          val acc = new Array[Double](windows)
          val cnt = new Array[Long](windows)
          var i = 0
          while (i < nSamp) {
            val b = w.dataOffset + 2 * i
            val s = ((p(b) & 0xff) | (p(b + 1) << 8)).toShort / 32768.0
            val win = math.min(windows - 1, (i.toLong * windows / nSamp).toInt)
            acc(win) += s * s; cnt(win) += 1
            i += 1
          }
          val feat = Array.tabulate(windows)(j =>
            if (cnt(j) == 0) 0f else math.sqrt(acc(j) / cnt(j)).toFloat)
          (id, feat)
        }
      })
      .toDF("media_id", "features")
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
