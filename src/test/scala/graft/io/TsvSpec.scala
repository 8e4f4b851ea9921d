package graft.io

import graft.SparkSpec
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

class TsvSpec extends SparkSpec {

  private def writeFixture(name: String, content: String): String = {
    val dir = tmpDir("tsv")
    Files.writeString(Paths.get(dir, name), content)
    s"$dir/$name"
  }

  test("S1: header + inferSchema types int and string columns") {
    val p = writeFixture("sst2.tsv",
      "sentence\tlabel\nit was great\t1\nawful film\t0\n")
    val df = Tsv.readTsvInfer(spark, p)
    assert(df.schema("label").dataType == IntegerType)
    assert(df.schema("sentence").dataType == StringType)
    assert(df.count() == 2)
    assert(df.orderBy("label").collect().map(_.getString(0)).toSeq ==
      Seq("awful film", "it was great"))
  }

  test("S2: quote/escape handles embedded quotes and tabs in quoted fields") {
    val p = writeFixture("qqp.tsv",
      "q1\tq2\tis_duplicate\n" +
        "\"has \"\"quoted\"\" bit\"\tplain\t0\n" +
        "\"tab\there\"\tother\t1\n")
    val df = Tsv.readTsvQuoted(spark, p)
    val rows = df.orderBy("is_duplicate").collect()
    assert(rows(0).getString(0) == "has \"quoted\" bit")
    assert(rows(1).getString(0) == "tab\there")
  }

  test("permissive read quarantines malformed rows instead of failing") {
    import org.apache.spark.sql.functions.col
    val p = writeFixture("bad.tsv",
      "id\tscore\ttext\n" +
        "1\t0.5\tgood row\n" +
        "2\tnot_a_number\tbad cast\n" +
        "3\t0.9\tanother good row\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType),
      StructField("text", StringType)))
    val df = Tsv.readTsvPermissive(spark, p, schema).cache()
    try {
      val good = df.filter(col("_corrupt_record").isNull)
      val bad  = df.filter(col("_corrupt_record").isNotNull)
      assert(good.count() == 2)
      assert(good.orderBy("id").collect().map(_.getLong(0)).toSeq ==
        Seq(1L, 3L))
      val quarantined = bad.collect()
      assert(quarantined.length == 1)
      assert(quarantined(0).getAs[String]("_corrupt_record")
        .contains("not_a_number"), "raw line preserved for quarantine")
    } finally { df.unpersist(); () }
  }

  test("S3: string-typed read leaves all columns as string") {
    val p = writeFixture("t.tsv", "a\tb\n1\t2\n")
    val df = Tsv.readTsvStrings(spark, p)
    assert(df.schema.fields.forall(_.dataType == StringType))
  }

  test("explicit-schema read is deterministic and skips the infer pass") {
    val p = writeFixture("s.tsv", "sentence\tlabel\nhello\t1\n")
    val schema = StructType(Seq(
      StructField("sentence", StringType), StructField("label", DoubleType)))
    val df = Tsv.readTsv(spark, p, schema)
    assert(df.schema == schema)
    assert(df.head().getDouble(1) == 1.0)
  }

  test("S4: CSV sink round-trips header and values") {
    val p = writeFixture("s.tsv", "sentence\tlabel\nhello world\t1\n")
    val df  = Tsv.readTsvInfer(spark, p)
    val out = tmpDir("csvout") + "/sink"
    Tsv.writeCsv(df, out)
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(out)
    assert(back.collect().toSeq == df.collect().toSeq)
  }

  test("S6: parquet sink round-trips exactly") {
    import spark.implicits._
    val df  = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val out = tmpDir("pqout") + "/sink"
    Tsv.writeParquet(df, out)
    assert(spark.read.parquet(out).orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
  }
}
