package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

class JsonlSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("explicit-schema JSONL round-trips values and types") {
    import spark.implicits._
    val dir = tmpDir("jsonl")
    val df = Seq((1L, "hello world", "en"), (2L, "hallo welt", "de"),
                 (3L, "with \"quotes\" and\ttabs", "en"))
      .toDF("doc_id", "text", "lang")
    Jsonl.writeJsonl(df, s"$dir/out")
    val back = Jsonl.readJsonl(spark, s"$dir/out", docSchema)
    assert(back.schema("doc_id").dataType == LongType)
    assert(back.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      df.orderBy("doc_id").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSeq)
  }

  test("compressed sink still reads back (zstd-style codec plumbing)") {
    import spark.implicits._
    val dir = tmpDir("jsonlz")
    val df = (1L to 100L).map(i => (i, s"doc number $i", "en"))
      .toDF("doc_id", "text", "lang")
    Jsonl.writeJsonl(df, s"$dir/out", compression = Some("gzip"))
    assert(Jsonl.readJsonl(spark, s"$dir/out", docSchema).count() == 100)
  }

  test("permissive read quarantines malformed lines, keeps good ones") {
    val dir = tmpDir("jsonlp")
    Files.writeString(Paths.get(dir, "mixed.jsonl"),
      """{"doc_id": 1, "text": "fine", "lang": "en"}
        |not json at all {{{
        |{"doc_id": 2, "text": "also fine", "lang": "de"}
        |""".stripMargin)
    val df = Jsonl.readJsonlPermissive(spark, s"$dir/mixed.jsonl", docSchema)
      .cache()
    val bad  = df.filter(col("_corrupt_record").isNotNull)
    val good = df.filter(col("_corrupt_record").isNull)
    assert(good.count() == 2 && bad.count() == 1)
    assert(bad.head().getAs[String]("_corrupt_record").contains("not json"))
    df.unpersist()
  }
}
