package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PartitioningSpec extends SparkSpec {

  test("date-partitioned layout prunes partitions at the scan") {
    import spark.implicits._
    val out = tmpDir("part") + "/events_by_day"
    Tables.events(spark, sf0001)
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(out)

    val read = spark.read.parquet(out)
      .filter(col("day") === "2024-01-03")
    read.collect()
    val scan = read.queryExecution.executedPlan.toString
    val pf = scan.linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse("")
    assert(pf.contains("day"), s"expected partition filter on day: $scan")
    // pruned scan must touch fewer partition rows than the full table
    val prunedRows = read.count()
    val totalRows  = spark.read.parquet(out).count()
    assert(prunedRows > 0 && prunedRows < totalRows,
           s"$prunedRows vs $totalRows")
  }

  test("SQL-text surface: spark.sql over temp views matches the DataFrame plan") {
    Tables.lineitem(spark, sf0001).createOrReplaceTempView("lineitem_v")
    val viaSql = spark.sql(
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem_v GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val viaDf = Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(viaSql == viaDf)
  }

  test("malformed TSV rows are droppable by policy (DROPMALFORMED)") {
    import java.nio.file.{Files, Paths}
    val dir = tmpDir("badtsv")
    Files.writeString(Paths.get(dir, "bad.tsv"),
      "a\tb\n1\t2\nnot_an_int\t3\n4\t5\n")
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("b", IntegerType)))
    val strict = spark.read
      .option("sep", "\t").option("header", "true")
      .option("mode", "DROPMALFORMED")
      .schema(schema).csv(s"$dir/bad.tsv")
    // note: count() prunes all columns and skips parsing — malformed rows
    // only drop when columns are actually read, so assert on collect()
    val rows = strict.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getInt(0)).sorted.toSeq == Seq(1, 4))
  }
}
