package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * plus typed metadata, with decode / feature-extract / frame-sample stages
  * shaped as `mapPartitions` batch transforms.
  *
  * IMAGE decode is REAL: [[ImageIoDecoder]] reads PNG/BMP/JPEG through
  * `javax.imageio` (codecs every JDK ships) and average-pools grayscale
  * luminance into a fixed-length feature grid. Audio/video decode stays a
  * clearly-marked stub ([[StubDecoder]] — no audio/video codecs in this
  * container); both sit behind the same [[MediaDecoder]] seam.
  *
  * Scale notes: media blobs ride in their partition; decode is row-local
  * (no shuffle), and the decoder is initialized once per partition. Frame
  * sampling emits 0..n rows per input via the same mapPartitions (never
  * explode on a driver-built array).
  */
object Multimodal {

  /** Typed metadata carried alongside every blob. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta_width", IntegerType, nullable = true),
    StructField("meta_height", IntegerType, nullable = true),
    StructField("meta_duration_ms", LongType, nullable = true)))

  trait MediaDecoder extends Serializable {
    /** Returns (width, height, grayscale feature vector of length `dims`). */
    def decodeImage(bytes: Array[Byte], dims: Int): (Int, Int, Array[Double])
  }

  /** Real image decoder backed by `javax.imageio` (PNG/BMP/JPEG/GIF — the
    * codecs bundled with every JDK; no external libraries). Features are
    * grayscale luminance average-pooled over a gh×gw cell grid where
    * gh = ⌊√dims⌋ and gw = dims/gh (8 → 2×4, 64 → 8×8): cell (cy,cx)
    * covers pixels with ⌊y·gh/h⌋ = cy, ⌊x·gw/w⌋ = cx, and each feature is
    * mean(luminance)/255 ∈ [0,1]. Grayscale rasters use the sample value
    * directly (8-bit gray PNGs round-trip exactly); color images use
    * integer BT.601 luma ⌊(299R+587G+114B)/1000⌋ so results are
    * bit-stable across platforms. Undecodable/empty bytes yield
    * (0, 0, zeros) — width 0 marks the row for quarantine instead of
    * failing the whole partition.
    */
  /** ImageIO's default stream cache backs every read/write with a TEMP
    * FILE — for the tiny per-row images of a corpus pipeline that disk
    * round-trip dominates: measured 6× slower than the in-memory cache
    * (2.73 s vs 0.45 s per 5 000 small PNGs, single-threaded; worse under
    * 32 concurrent tasks contending on /tmp). Flip the JVM-wide switch
    * once, lazily, from every encode/decode site. Output is unaffected —
    * the cache only buffers stream bytes.
    */
  private lazy val imageIoMemoryCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  class ImageIoDecoder extends MediaDecoder {
    def decodeImage(bytes: Array[Byte], dims: Int): (Int, Int, Array[Double]) = {
      imageIoMemoryCache
      val gh = math.sqrt(dims.toDouble).toInt
      require(gh > 0 && dims % gh == 0,
              s"dims must factor as ⌊√dims⌋×(dims/⌊√dims⌋), got $dims")
      val gw = dims / gh
      val img =
        if (bytes == null || bytes.isEmpty) null
        else javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
      if (img == null) return (0, 0, new Array[Double](dims))
      val w = img.getWidth; val h = img.getHeight
      val sums = new Array[Long](dims)
      val counts = new Array[Long](dims)
      val raster = img.getRaster
      val gray = raster.getNumBands == 1
      var y = 0
      while (y < h) {
        val cy = y * gh / h
        var x = 0
        while (x < w) {
          val lum =
            if (gray) raster.getSample(x, y, 0)
            else {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xFF
              val g = (rgb >> 8) & 0xFF
              val b = rgb & 0xFF
              (299 * r + 587 * g + 114 * b) / 1000
            }
          val c = cy * gw + x * gw / w
          sums(c) += lum
          counts(c) += 1
          x += 1
        }
        y += 1
      }
      val feats = Array.tabulate(dims) { i =>
        if (counts(i) == 0) 0.0 else sums(i).toDouble / counts(i) / 255.0
      }
      (w, h, feats)
    }
  }

  /** STUB: deterministic fake decoder — "pixels" are a byte-content hash
    * walk. Retained ONLY for audio/video, where no codec ships with the
    * JDK; images go through [[ImageIoDecoder]].
    */
  class StubDecoder extends MediaDecoder {
    def decodeImage(bytes: Array[Byte], dims: Int): (Int, Int, Array[Double]) = {
      val n = if (bytes == null) 0 else bytes.length
      val w = 16 + (n % 16); val h = 16 + (n % 8)
      var z = 0x9E3779B97F4A7C15L * (n + 1)
      val feats = Array.fill(dims) {
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        (z >>> 11).toDouble / (1L << 53).toDouble
      }
      (w, h, feats)
    }
  }

  /** Ingest a directory of REAL media files as a media table via Spark's
    * built-in `binaryFile` source — the path a production corpus takes
    * from raw crawled files into the opaque-binary-column model. Each
    * file becomes one row: `media_id` = xxhash64 of its path (stable
    * across reruns), `media_type` from the extension, `content` = the
    * raw bytes, plus the source `media_path`/`media_bytes` for lineage.
    *
    * Scale notes: `binaryFile` splits at file granularity (a blob never
    * straddles partitions) and `pathGlobFilter` prunes non-media files at
    * listing time, before any byte is read. Spark caps rows at
    * `spark.sql.sources.binaryFile.maxLength` (2 GB default) — larger
    * assets belong in object storage with pointer columns, not inline.
    * Metadata dims stay null here; [[decodeImages]] fills width/height
    * from the actual pixels downstream.
    */
  def readBinaryMedia(spark: org.apache.spark.sql.SparkSession,
                      path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(
        xxhash64(col("path")).as("media_id"),
        when(lower(col("path")).rlike("\\.(png|jpe?g|bmp|gif)$"), lit("image"))
          .when(lower(col("path")).rlike("\\.(wav|mp3|flac|ogg)$"), lit("audio"))
          .when(lower(col("path")).rlike("\\.(mp4|mkv|webm|avi)$"), lit("video"))
          .otherwise(lit("binary")).as("media_type"),
        col("content"),
        lit(null).cast("int").as("meta_width"),
        lit(null).cast("int").as("meta_height"),
        lit(null).cast("long").as("meta_duration_ms"),
        col("path").as("media_path"),
        col("length").as("media_bytes"))

  /** Synthesize a deterministic media table from the documents table (the
    * container ships no real media): blob = UTF-8 bytes of the text. This
    * exercises the exact binary-column code paths a real corpus would.
    */
  def syntheticMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      lit(null).cast("int").as("meta_width"),
      lit(null).cast("int").as("meta_height"),
      (length(col("text")) * 40L).as("meta_duration_ms"))

  /** Synthesize REAL deterministic PNGs from the documents table — every
    * doc becomes an 8-bit grayscale image with luminance
    * `(media_id·31 + y·w + x) mod 256` at pixel (x,y), PNG-encoded via
    * `ImageIO.write`. Because PNG is lossless and the formula is pure
    * arithmetic, the decode→pool pipeline over these images is exactly
    * replayable in plain SQL (the q43 oracle). Sizes vary per doc
    * (w ∈ {8..24 step 4}, h ∈ {8,16,24}) to exercise non-uniform pooling.
    */
  def syntheticImageMedia(documents: DataFrame): DataFrame = {
    val enc = Encoders.row(mediaSchema)
    documents.select(col("doc_id")).mapPartitions { rows =>
      imageIoMemoryCache
      rows.map { r =>
        val id = r.getLong(0)
        val w = 8 + (id % 5).toInt * 4
        val h = 8 + (id % 3).toInt * 8
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, ((id * 31 + y * w + x) % 256).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, "image", bos.toByteArray, w, h, null)
      }
    }(enc)
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, false), nullable = false)))

  /** Decode + feature-extract: mapPartitions, decoder built once per
    * partition, one output row per image-typed input.
    */
  def decodeImages(media: DataFrame, dims: Int = 8,
                   mkDecoder: () => MediaDecoder = () => new ImageIoDecoder)
      : DataFrame = {
    val in = media.filter(col("media_type") === "image")
      .select(col("media_id").cast("long"), col("content"))
    val enc = Encoders.row(decodedSchema)
    in.mapPartitions { rows =>
      lazy val dec = mkDecoder()
      rows.map { r =>
        val (w, h, f) = dec.decodeImage(r.getAs[Array[Byte]](1), dims)
        Row(r.getLong(0), w, h, f.toSeq)
      }
    }(enc)
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("out_w", IntegerType, nullable = false),
    StructField("out_h", IntegerType, nullable = false),
    StructField("pixels", ArrayType(DoubleType, false), nullable = false)))

  /** Resize stage: decode (stub) then nearest-neighbor downsample the
    * feature grid to a fixed (outW × outH) raster — the canonical
    * model-input normalization step. Same mapPartitions shape; decoder and
    * resampler run row-local, once-per-partition init.
    */
  def resizeImages(media: DataFrame, outW: Int = 4, outH: Int = 4,
                   mkDecoder: () => MediaDecoder = () => new ImageIoDecoder)
      : DataFrame = {
    val in = media.filter(col("media_type") === "image")
      .select(col("media_id").cast("long"), col("content"))
    val enc = Encoders.row(resizedSchema)
    in.mapPartitions { rows =>
      lazy val dec = mkDecoder()
      rows.map { r =>
        val (w, h, feats) = dec.decodeImage(r.getAs[Array[Byte]](1), 64)
        // treat the 64-dim feature walk as an 8x8 raster; nearest-neighbor
        val grid = 8
        val out = Array.tabulate(outH * outW) { i =>
          val (oy, ox) = (i / outW, i % outW)
          val (sy, sx) = (oy * grid / outH, ox * grid / outW)
          feats(sy * grid + sx)
        }
        Row(r.getLong(0), outW, outH, out.toSeq)
      }
    }(enc)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("ts_ms", LongType, nullable = false)))

  /** Frame sampling for video rows: emits one row per sampled frame
    * (every `everyMs`ms of metadata duration, cap `maxFrames`) — 0..n
    * output rows per input row via the same mapPartitions shape.
    */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L,
                   maxFrames: Int = 16): DataFrame = {
    val in = media.filter(col("media_type") === "video")
      .select(col("media_id").cast("long"), col("meta_duration_ms").cast("long"))
    val enc = Encoders.row(frameSchema)
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val dur = if (r.isNullAt(1)) 0L else r.getLong(1)
        val n = math.min(maxFrames, (dur / everyMs).toInt + 1)
        (0 until n).iterator.map(i => Row(r.getLong(0), i, i * everyMs))
      }
    }(enc)
  }
}
