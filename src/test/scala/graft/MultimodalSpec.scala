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

  // ---- real image kernels (JDK ImageIO) ------------------------------

  /** Solid-color PNG bytes (encoded on the driver with the same JDK
    * codec the executors decode with).
    */
  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def realMedia = Seq(
    (1L, "image", png(8, 6, 0xffffff)),         // white
    (2L, "image", png(16, 16, 0x000000)),       // black
    (3L, "image", "not an image".getBytes),     // poison payload
    (4L, "video", png(8, 8, 0x123456))          // wrong modality — ignored
  ).toDF("media_id", "media_type", "payload")

  test("real decode: ImageIO reads true dimensions; poison payloads flagged, not fatal") {
    val got = Multimodal.decodeImageMeta(realMedia).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getInt(2), r.getInt(3)))).toMap
    assert(got(1L) == ((true, 8, 6)))
    assert(got(2L) == ((true, 16, 16)))
    assert(got(3L) == ((false, -1, -1)))
    assert(!got.contains(4L))
  }

  test("real resize: decode -> bilinear rescale -> PNG re-encode round-trips") {
    val out = Multimodal.resizeImagesReal(realMedia, 4, 4).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](3)).toMap
    assert(out.keySet == Set(1L, 2L)) // poison row dropped
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out(1L)))
    assert(back.getWidth == 4 && back.getHeight == 4)
    assert((back.getRGB(2, 2) & 0xffffff) == 0xffffff, "white image must stay white")
  }

  /** 16-bit mono PCM WAV bytes: first half silence, second half a full
    * sine at the given amplitude.
    */
  private def wav(sampleRate: Int, nFrames: Int, amp: Double): Array[Byte] = {
    val dataLen = nFrames * 2
    val bos = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >> 16) & 0xffff) }
    bos.write("RIFF".getBytes); u32(36 + dataLen); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); u32(16); u16(1); u16(1); u32(sampleRate)
    u32(sampleRate * 2); u16(2); u16(16)
    bos.write("data".getBytes); u32(dataLen)
    (0 until nFrames).foreach { i =>
      val v =
        if (i < nFrames / 2) 0.0
        else amp * math.sin(2 * math.Pi * 440 * i / sampleRate)
      u16(((v * 32767).toInt).toShort & 0xffff)
    }
    bos.toByteArray
  }

  private def audioMedia = Seq(
    (10L, "audio", wav(8000, 8000, 0.5)), // 1 s: silence then sine
    (11L, "audio", "not audio".getBytes), // poison
    (12L, "image", wav(8000, 100, 0.1))   // wrong modality — ignored
  ).toDF("media_id", "media_type", "payload")

  test("real wav decode: channels, sample rate, duration; poison flagged not fatal") {
    val got = Multimodal.decodeWavMeta(audioMedia).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(got(10L) == ((true, 1, 8000, 1000)))
    assert(got(11L) == ((false, -1, -1, -1)))
    assert(!got.contains(12L))
  }

  test("real audio features: RMS separates the silent half from the sine half") {
    val f = Multimodal.audioRmsFeatures(audioMedia, windows = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f.keySet == Set(10L)) // poison row dropped
    val feat = f(10L)
    assert(feat.length == 4)
    assert(feat(0) < 0.01f && feat(1) < 0.01f, s"silent half must be ~0: $feat")
    // RMS of a 0.5-amplitude sine ≈ 0.5/sqrt(2) ≈ 0.354
    assert(feat(2) > 0.3f && feat(2) < 0.4f, s"sine half RMS off: $feat")
    assert(feat(3) > 0.3f && feat(3) < 0.4f, s"sine half RMS off: $feat")
  }

  test("real features: grid grayscale means separate black from white") {
    val f = Multimodal.imageGridFeatures(realMedia, grid = 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f(1L).length == 4 && f(2L).length == 4)
    assert(f(1L).forall(v => v > 0.99f), s"white image features: ${f(1L)}")
    assert(f(2L).forall(v => v < 0.01f), s"black image features: ${f(2L)}")
  }

  /** Gradient PNG parameterized by a seed — distinct seeds give
    * distinct pixel patterns, a near-copy perturbs one corner pixel.
    */
  private def gradientPng(seed: Int, perturbed: Boolean = false): Array[Byte] = {
    val w = 16; val h = 16
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // (seed%5, seed%3) is pairwise-distinct over seeds 0..11, so
        // every image gets its own (x, y) slope pair — no two distinct
        // gradients share a pattern up to brightness offset
        val g = (x * (seed % 5 + 2) * 7 + y * (seed % 3 + 2) * 11 + seed * 53) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    if (perturbed) img.setRGB(0, 0, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("production media near-dup: REAL grid features of decoded pixels feed the embedding screen (m05's path)") {
    // 12 distinct gradient images + a near-copy (one perturbed pixel)
    // of every third one — the m05 composition with the real decode
    // kernel in place of the oracle-gated byte kernel
    val rows = (0 until 12).map(i => (i.toLong, "image", gradientPng(i))) ++
      (0 until 12 by 3).map(i => (i + 1000L, "image", gradientPng(i, perturbed = true)))
    val media = rows.toDF("media_id", "media_type", "payload")
    val feats = Multimodal.imageGridFeatures(media, grid = 4)
    val pairs = graft.operators.Dedup
      .embeddingNearDup(feats, "media_id", "features",
        threshold = 0.999, nBits = 6, nTables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plantedPairs = (0 until 12 by 3).map(i => (i.toLong, i + 1000L)).toSet
    assert(plantedPairs.subsetOf(pairs),
      s"every planted near-copy must surface: got $pairs")
    // distinct gradients must NOT pair at this threshold
    assert(pairs == plantedPairs, s"spurious pairs: ${pairs -- plantedPairs}")
  }
}
