package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelevanceSpec extends SparkSpec {

  test("bm25 matches the hand-computed Okapi formula on a tiny corpus") {
    import spark.implicits._
    // 3 docs, 4 tokens each (avgdl = 4, dl/avgdl = 1 → length norm is
    // exactly 1 and the denominator simplifies to tf + k1)
    val docs = Seq(
      (1L, "spark spark data sql"),   // tf(spark)=2
      (2L, "spark rows and tables"),  // tf(spark)=1
      (3L, "plain text no hits")
    ).toDF("doc_id", "text")
    val out = Relevance.bm25Scores(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val k1 = 1.2
    val idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    def score(tf: Double) = idf * tf * (k1 + 1) / (tf + k1)
    assert(out.keySet == Set(1L, 2L), "only docs with hits appear")
    assert(math.abs(out(1L) - score(2)) < 1e-6)
    assert(math.abs(out(2L) - score(1)) < 1e-6)
    assert(out(1L) > out(2L), "higher tf must outrank at equal length")
  }

  test("length normalization: same tf in a longer doc scores lower") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark data"),
      (2L, "spark data and many many more filler tokens here now")
    ).toDF("doc_id", "text")
    val out = Relevance.bm25Scores(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(2L))
  }

  test("topRelevant selects the N best and plans the model side as " +
       "broadcast joins, never a corpus-side shuffle of stats") {
    import spark.implicits._
    val docs = (0 until 50).map { i =>
      (i.toLong, if (i < 5) "vector stream merge vector" else "plain filler text row")
    }.toDF("doc_id", "text")
    val top = Relevance.topRelevant(docs, "doc_id", "text",
                                    Seq("vector", "stream", "merge"),
                                    topN = 3)
    assert(top.count() == 3)
    assert(top.select("doc_id").collect().map(_.getLong(0)).toSet
             .subsetOf((0L until 5L).toSet))
    val plan = Relevance.bm25Scores(docs, "doc_id", "text", Seq("vector"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
             plan.contains("BroadcastNestedLoopJoin"),
           s"df/stats must broadcast:\n$plan")
  }
}
