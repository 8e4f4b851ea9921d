package graft.io

import graft.SparkSpec
import org.apache.spark.sql.types._

class OrcSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("explicit-schema ORC round-trips values and types") {
    import spark.implicits._
    val dir = tmpDir("orc")
    val df = Seq((1L, "hello world", "en"), (2L, "hallo welt", "de"),
                 (3L, "unicode éèê and\ttabs", "fr"))
      .toDF("doc_id", "text", "lang")
    Orc.writeOrc(df, s"$dir/out")
    val back = Orc.readOrc(spark, s"$dir/out", docSchema)
    assert(back.schema("doc_id").dataType == LongType)
    assert(back.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      df.orderBy("doc_id").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSeq)
  }

  test("compressed ORC sink reads back; filters push to the scan") {
    import spark.implicits._
    val dir = tmpDir("orcz")
    val df = (1L to 200L).map(i => (i, s"doc number $i", "en"))
      .toDF("doc_id", "text", "lang")
    Orc.writeOrc(df, s"$dir/out", compression = Some("zstd"))
    val back = Orc.readOrcInfer(spark, s"$dir/out")
      .filter($"doc_id" > 150L).select("doc_id")
    assert(back.count() == 50)
    // the native reader must receive the pushed filter and pruned schema
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), " +
                           "GreaterThan(doc_id,150)]"),
           s"expected pushed filter in ORC scan:\n$plan")
  }
}
