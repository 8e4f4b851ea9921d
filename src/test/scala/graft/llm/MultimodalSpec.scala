package graft.llm

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

class MultimodalSpec extends SparkSpec {

  /** PNG-encode a small grayscale image with the given row-major pixels. */
  private def png(w: Int, h: Int, pixels: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, pixels(y * w + x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("syntheticMedia: binary content column + typed metadata") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, sf0001))
    assert(media.schema("content").dataType == BinaryType)
    val types = media.select("media_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
  }

  test("ImageIoDecoder decodes known-pixel PNGs EXACTLY: grid averages " +
       "of the written luminances") {
    val dec = new Multimodal.ImageIoDecoder
    // 4×2 image, dims=8 → 2×4 grid → one pixel per cell: features are
    // exactly pixel/255 in row-major order
    val px = Array(0, 51, 102, 153, 204, 255, 10, 20)
    val (w, h, f) = dec.decodeImage(png(4, 2, px), 8)
    assert((w, h) == ((4, 2)))
    assert(f.toSeq == px.map(_ / 255.0).toSeq)
    // 4×4 image, dims=4 → 2×2 grid → each cell averages a 2×2 block
    val px2 = Array(
      10, 20, 30, 40,
      50, 60, 70, 80,
      90, 100, 110, 120,
      130, 140, 150, 160)
    val (_, _, f2) = dec.decodeImage(png(4, 4, px2), 4)
    assert(f2.toSeq == Seq((10 + 20 + 50 + 60) / 4.0 / 255.0,
                           (30 + 40 + 70 + 80) / 4.0 / 255.0,
                           (90 + 100 + 130 + 140) / 4.0 / 255.0,
                           (110 + 120 + 150 + 160) / 4.0 / 255.0))
  }

  test("ImageIoDecoder quarantines undecodable bytes as (0, 0, zeros) " +
       "instead of failing the partition") {
    val dec = new Multimodal.ImageIoDecoder
    for (bad <- Seq(null, Array.empty[Byte],
                    "not an image".getBytes("UTF-8"))) {
      val (w, h, f) = dec.decodeImage(bad, 8)
      assert((w, h) == ((0, 0)) && f.toSeq == Seq.fill(8)(0.0))
    }
  }

  test("decodeImages over synthetic PNGs: real javax.imageio decode, one " +
       "row per image, deterministic, luminance formula recovered") {
    val media =
      Multimodal.syntheticImageMedia(Tables.documents(spark, sf0001))
    val n = media.count()
    val decoded = Multimodal.decodeImages(media, dims = 8)
    assert(decoded.schema == Multimodal.decodedSchema)
    assert(decoded.count() == n)
    val r1 = decoded.orderBy("media_id").head()
    val r2 = Multimodal.decodeImages(media, dims = 8).orderBy("media_id").head()
    assert(r1 == r2, "decode must be deterministic")
    // media_id 0: 8×8, lum(p) = p % 256 → total = 0+1+..+63 = 2016;
    // uniform cells of (8/2)·(8/4) = 8 pixels
    assert(r1.getLong(0) == 0L && r1.getInt(1) == 8 && r1.getInt(2) == 8)
    val total = math.round(r1.getSeq[Double](3).sum * 8 * 255)
    assert(total == (0 until 64).sum,
           s"decoded luminance total must match the written pixels: $total")
  }

  test("resizeImages: fixed-raster output from REAL decoded pixels") {
    val media =
      Multimodal.syntheticImageMedia(Tables.documents(spark, sf0001))
    val resized = Multimodal.resizeImages(media, outW = 4, outH = 4)
    assert(resized.schema == Multimodal.resizedSchema)
    val r = resized.orderBy("media_id").head()
    assert(r.getInt(1) == 4 && r.getInt(2) == 4)
    assert(r.getSeq[Double](3).size == 16)
    // nearest-neighbor: every output pixel exists in the decoded 8×8 grid
    val full = Multimodal.decodeImages(media, dims = 64).orderBy("media_id")
      .head().getSeq[Double](3).toSet
    assert(r.getSeq[Double](3).forall(full.contains))
  }

  /** RIFF-encode PCM bytes via the JDK encoder (the real container). */
  private def wav(data: Array[Byte], bits: Int, channels: Int,
                  signed: Boolean, rate: Int = 8000): Array[Byte] = {
    val enc =
      if (signed) javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      else javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
    val frameBytes = channels * bits / 8
    val fmt = new javax.sound.sampled.AudioFormat(
      enc, rate.toFloat, bits, channels, frameBytes, rate.toFloat, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt,
      data.length.toLong / frameBytes)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("JavaSoundDecoder decodes known-sample WAVs EXACTLY: window " +
       "means over 8-bit unsigned mono PCM") {
    val dec = new Multimodal.JavaSoundDecoder
    // 16 frames, dims=8 → 2 frames per window: features are pair means
    val samples = Array(0, 10, 20, 30, 40, 50, 60, 70,
                        80, 90, 100, 110, 120, 130, 140, 250)
    val bytes = wav(samples.map(_.toByte), bits = 8, channels = 1,
                    signed = false)
    val (rate, n, f) = dec.decodeAudio(bytes, 8)
    assert(rate == 8000 && n == 16L)
    val want = samples.grouped(2)
      .map(p => (p(0) + p(1)) / 2.0 / 255.0).toSeq
    assert(f.toSeq == want)
  }

  test("JavaSoundDecoder: 16-bit signed stereo averages channels by " +
       "integer division and scales samples down by >> 8") {
    val dec = new Multimodal.JavaSoundDecoder
    // 2 frames × 2 channels, little-endian 16-bit signed:
    // frame 0: L = 0x2000 (8192), R = -0x2000 → unsigned 40960, 24576
    //   → amps 160, 96 → channel mean 128
    // frame 1: L = R = 0 → unsigned 32768 → amp 128 → mean 128
    def le(s: Short) = Array((s & 0xFF).toByte, ((s >> 8) & 0xFF).toByte)
    val data = (le(0x2000.toShort) ++ le((-0x2000).toShort) ++
                le(0.toShort) ++ le(0.toShort))
    val bytes = wav(data, bits = 16, channels = 2, signed = true)
    val (rate, n, f) = dec.decodeAudio(bytes, 2)
    assert(rate == 8000 && n == 2L)
    assert(f.toSeq == Seq(128 / 255.0, 128 / 255.0))
  }

  test("JavaSoundDecoder quarantines undecodable bytes as (0, 0, zeros)") {
    val dec = new Multimodal.JavaSoundDecoder
    for (bad <- Seq(null, Array.empty[Byte],
                    Array.tabulate[Byte](64)(_.toByte))) {
      val (rate, n, f) = dec.decodeAudio(bad, 4)
      assert(rate == 0 && n == 0L && f.toSeq == Seq(0.0, 0.0, 0.0, 0.0))
    }
  }

  test("decodeAudio over synthetic WAVs: the real javax.sound parse " +
       "recovers the generator formula's amplitude sums") {
    val media = Multimodal.syntheticWavMedia(
      Tables.documents(spark, sf0001).limit(20))
    val rows = Multimodal.decodeAudio(media, dims = 8)
      .orderBy("media_id").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val n = 256 + (id % 8).toInt * 128
      assert(r.getInt(1) == 8000 && r.getLong(2) == n.toLong)
      val feats = r.getSeq[Double](3)
      val winSize = n / 8
      val expected = (0 until 8).map { w =>
        (0 until winSize).map(j => (id * 31 + (w * winSize + j)) % 256)
          .sum.toDouble / winSize / 255.0
      }
      assert(feats == expected, s"media $id features diverge")
    }
  }

  test("StubDecoder (video placeholder) still deterministic behind " +
       "the same MediaDecoder seam") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, sf0001))
    val d1 = Multimodal.decodeImages(media, dims = 8,
                                     () => new Multimodal.StubDecoder)
      .orderBy("media_id").head()
    val d2 = Multimodal.decodeImages(media, dims = 8,
                                     () => new Multimodal.StubDecoder)
      .orderBy("media_id").head()
    assert(d1 == d2)
    assert(d1.getSeq[Double](3).size == 8)
  }

  test("decodeGifFrames: REAL multi-frame GIF decode, per-frame pooled " +
       "features match the pixel formula exactly") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 7L, 12L).toDF("doc_id")
    val media = Multimodal.syntheticGifMedia(ids)
    // frame counts come from the real reader, not metadata
    val got = Multimodal.decodeGifFrames(media, dims = 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
             ((r.getInt(2), r.getInt(3), r.getInt(4),
               r.getSeq[Double](5))))
      .toMap
    for (id <- Seq(0L, 1L, 7L, 12L)) {
      val w = 8 + (id % 5).toInt * 4
      val h = 8 + (id % 3).toInt * 8
      val nf = 2 + (id % 3).toInt
      assert((0 until nf).forall(f => got.contains((id, f))),
             s"id=$id must decode all $nf frames")
      for (f <- 0 until nf) {
        val (gn, gw, gh, feats) = got((id, f))
        assert((gn, gw, gh) == ((nf, w, h)))
        // exact expected pooled grid from the written formula
        val sums = new Array[Long](8); val counts = new Array[Long](8)
        for (y <- 0 until h; x <- 0 until w) {
          val c = (y * 2 / h) * 4 + x * 4 / w
          sums(c) += (id * 31 + f * 97 + y * w + x) % 256
          counts(c) += 1
        }
        val exp = (0 until 8).map(i => sums(i).toDouble / counts(i) / 255.0)
        assert(feats == exp, s"id=$id frame=$f pooled mismatch")
      }
    }
  }

  test("decodeGifFrames quarantines undecodable bytes as one " +
       "(frame_idx -1, width 0) row instead of failing the partition") {
    import spark.implicits._
    val junk = Seq(
      (1L, "video", "definitely not a gif".getBytes("UTF-8")),
      (2L, "video", Array.empty[Byte]),
      (3L, "image", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "media_type", "content")
    val out = Multimodal.decodeGifFrames(junk, dims = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(3))).sorted
    assert(out.toSeq == Seq((1L, -1, 0), (2L, -1, 0), (3L, -1, 0)))
  }

  test("sampleFrames: frame count = min(maxFrames, dur/step + 1)") {
    import spark.implicits._
    val media = Seq(
      (1L, "video", Array[Byte](1), null.asInstanceOf[Integer],
       null.asInstanceOf[Integer], 2500L),   // → 3 frames
      (2L, "video", Array[Byte](1), null.asInstanceOf[Integer],
       null.asInstanceOf[Integer], 99999L),  // → capped at 16
      (3L, "image", Array[Byte](1), null.asInstanceOf[Integer],
       null.asInstanceOf[Integer], 0L))      // filtered out
      .toDF("media_id", "media_type", "content",
            "meta_width", "meta_height", "meta_duration_ms")
    val frames = Multimodal.sampleFrames(media)
    val byId = frames.groupBy("media_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId == Map(1L -> 3L, 2L -> 16L))
    val ts = frames.filter(col("media_id") === 1).orderBy("frame_idx")
      .collect().map(_.getLong(2)).toSeq
    assert(ts == Seq(0L, 1000L, 2000L))
  }

  test("readBinaryMedia ingests REAL files via the binaryFile source: " +
       "glob prunes non-media, bytes decode to the exact written pixels") {
    val dirPath = java.nio.file.Files.createTempDirectory("binmedia")
    try {
      val px1 = Array(0, 255, 128, 64, 32, 16, 8, 4)       // 4×2
      val px2 = Array(10, 20, 30, 40, 50, 60, 70, 80)       // 4×2
      java.nio.file.Files.write(dirPath.resolve("a.png"), png(4, 2, px1))
      java.nio.file.Files.write(dirPath.resolve("b.png"), png(4, 2, px2))
      java.nio.file.Files.write(dirPath.resolve("notes.txt"),
                                "not media".getBytes("UTF-8"))

      val media = Multimodal.readBinaryMedia(spark, dirPath.toString,
                                             glob = "*.png")
      assert(media.schema("content").dataType == BinaryType)
      val rows = media.collect()
      assert(rows.length == 2, "glob must prune the txt file at listing")
      assert(rows.forall(_.getAs[String]("media_type") == "image"))
      assert(rows.map(_.getAs[Long]("media_id")).distinct.length == 2,
             "path-hash ids must be distinct")

      // decode through the standard image stage: features are exactly
      // pixel/255 for a 4×2 image pooled on the 2×4 grid
      val feats = Multimodal.decodeImages(media, dims = 8)
        .collect()
        .map(r => (r.getInt(1), r.getInt(2),
                   r.getSeq[Double](3).map(v => (v * 255.0).round.toInt)))
      assert(feats.forall { case (w, h, _) => w == 4 && h == 2 })
      assert(feats.map(_._3.toSeq).toSet ==
               Set(px1.toSeq, px2.toSeq))
    } finally {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(dirPath).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  test("imageAHash60: equal content keys hash identically through the " +
       "real PNG round-trip; distinct keys land far apart; perturbed " +
       "clones stay near") {
    import spark.implicits._
    val keyed = Seq(
      (1L, "fpA", false), (2L, "fpA", false),   // same content key
      (3L, "fpB", false),                       // different key
      (4L, "fpA", true)                         // perturbed clone of fpA
    ).toDF("media_id", "fp", "perturb")
    val h = Multimodal.imageAHash60(
        Multimodal.syntheticContentImages(keyed))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(h(1L) == h(2L), "identical keys must round-trip to one hash")
    assert(h.values.forall(_ >= 0L), "all rows decodable")
    val far = java.lang.Long.bitCount(h(1L) ^ h(3L))
    assert(far > 10, s"distinct keys should differ widely, got $far bits")
    val near = java.lang.Long.bitCount(h(1L) ^ h(4L))
    assert(near <= 3, s"a one-block perturbation must stay near: $near")
  }

  test("imageAHash60 quarantines undecodable and off-grid images as -1 " +
       "instead of failing the partition") {
    import spark.implicits._
    val junk = Seq(
      (1L, "image", "not a png".getBytes("UTF-8")),
      (2L, "image", Array.empty[Byte])
    ).toDF("media_id", "media_type", "content")
    val out = Multimodal.imageAHash60(junk).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> -1L, 2L -> -1L))
    // off-grid: a real 8x8 PNG is decodable but not hashable on the
    // 16x16 contract
    val docs = Tables.documents(spark, sf0001).limit(1)
    val off = Multimodal.imageAHash60(
      Multimodal.syntheticImageMedia(docs))
    assert(off.collect().forall(_.getLong(3) == -1L))
  }

  test("q164 planted perturbed clones surface with high recall and no " +
       "spurious pairs at Hamming <= 3") {
    val pairs = graft.operators.LlmQueries
      .q164ImageDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = pairs.filter { case (a, b, _) => b == a + 1000000L }
    val nPlantable = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 7 === 2).count()
    assert(planted.length >= (nPlantable * 85) / 100,
           s"recall too low: ${planted.length} of $nPlantable")
    assert(pairs.length == planted.length,
           s"random 60-bit hashes must not collide at <=3 bits: " +
             pairs.filterNot { case (a, b, _) => b == a + 1000000L }.toSeq)
  }
}
