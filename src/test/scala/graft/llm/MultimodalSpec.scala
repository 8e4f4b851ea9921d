package graft.llm

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

class MultimodalSpec extends SparkSpec {

  test("syntheticMedia: binary content column + typed metadata") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, sf0001))
    assert(media.schema("content").dataType == BinaryType)
    val types = media.select("media_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
  }

  test("decodeImages: one row per image, declared schema, deterministic") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, sf0001))
    val nImages = media.filter(col("media_type") === "image").count()
    val decoded = Multimodal.decodeImages(media, dims = 8)
    assert(decoded.schema == Multimodal.decodedSchema)
    assert(decoded.count() == nImages)
    val r1 = decoded.orderBy("media_id").head()
    val r2 = Multimodal.decodeImages(media, dims = 8).orderBy("media_id").head()
    assert(r1 == r2, "stub decode must be deterministic")
    assert(r1.getSeq[Double](3).size == 8)
  }

  test("resizeImages: fixed-raster output, deterministic, values from source grid") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, sf0001))
    val resized = Multimodal.resizeImages(media, outW = 4, outH = 4)
    assert(resized.schema == Multimodal.resizedSchema)
    val r = resized.orderBy("media_id").head()
    assert(r.getInt(1) == 4 && r.getInt(2) == 4)
    assert(r.getSeq[Double](3).size == 16)
    // nearest-neighbor: every output pixel exists in the decoded grid
    val full = Multimodal.decodeImages(media, dims = 64).orderBy("media_id")
      .head().getSeq[Double](3).toSet
    assert(r.getSeq[Double](3).forall(full.contains))
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
}
