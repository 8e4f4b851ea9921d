package graft.llm

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class TextPackingSpec extends SparkSpec {

  test("packing: every doc assigned once; no bin over capacity (except oversized singletons)") {
    val docs = Tables.documents(spark, sf0001)
    val capacity = 64
    val packed = TextPacking.packDocuments(docs, "doc_id", "text", capacity)
    assert(packed.count() == docs.count())
    assert(packed.select("doc_id").distinct().count() == docs.count())

    val binLoads = packed.groupBy("bin_id")
      .agg(sum("n_tokens").as("load"), count(lit(1)).as("k"))
    // multi-doc bins must respect capacity; only singleton bins may exceed
    val over = binLoads.filter(col("load") > capacity && col("k") > 1)
    assert(over.count() == 0, over.collect().mkString(","))
  }

  test("packing efficiency: first-fit keeps mean multi-doc bin fill above 50%") {
    val docs = Tables.documents(spark, sf0001).coalesce(2)
    val capacity = 256
    val packed = TextPacking.packDocuments(docs, "doc_id", "text", capacity)
    val loads = packed.groupBy("bin_id")
      .agg(sum("n_tokens").as("load"), count(lit(1)).as("k"))
      .filter(col("load") <= capacity) // exclude oversized singletons
      .select(avg("load")).head().getDouble(0)
    assert(loads > capacity * 0.5, s"mean fill $loads of $capacity")
  }

  test("oversized documents get dedicated bins") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.fill(100)("tok").mkString(" ")), // 100 tokens > capacity 32
      (2L, "a b c"), (3L, "d e f")).toDF("doc_id", "text")
    val packed = TextPacking.packDocuments(df.coalesce(1), "doc_id", "text", 32)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(packed(1L) != packed(2L))
    assert(packed(2L) == packed(3L), "small docs share a bin")
  }
}
