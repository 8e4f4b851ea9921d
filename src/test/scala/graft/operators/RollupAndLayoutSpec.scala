package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cascading rollup maintenance (q260) and the layout-pruning audit
  * (q261): cascade ≡ direct at any cut (including mid-day), and the
  * z-order layout measurably prunes what the ingest layout cannot.
  */
class RollupAndLayoutSpec extends SparkSpec {

  private def canonDay(df: DataFrame): Set[(String, String, Long, Long)] =
    df.select(col("day").cast("string"), col("event_type"),
              col("n"), col("v_milli"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
                 r.getLong(3)))
      .toSet

  private lazy val direct = canonDay(
    Tables.events(spark, sf0001)
      .groupBy(date_trunc("day", col("ts")).as("day"),
               col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(floor(col("value") * 1000).cast("long")).as("v_milli")))

  test("q260: the hour→day cascade with the rolled delta equals the " +
       "direct day aggregation from raw") {
    assert(canonDay(TimeSeriesQueries
             .q260CascadeRollup(spark, sf0001)) == direct)
  }

  test("q260: a cut INSIDE a day still merges exactly (the split " +
       "day's standing and delta partials sum key-wise)") {
    val midDay = TimeSeriesQueries.cascadeDayRollup(
      spark, sf0001, lit("2024-01-20 12:00:00").cast("timestamp"))
    assert(canonDay(midDay) == direct)
    // and the split day genuinely exercised both legs
    val ev = Tables.events(spark, sf0001)
    val before = ev.filter(col("ts") >= lit("2024-01-20")
                             .cast("timestamp") &&
                           col("ts") < lit("2024-01-20 12:00:00")
                             .cast("timestamp")).count()
    val after = ev.filter(col("ts") >= lit("2024-01-20 12:00:00")
                            .cast("timestamp") &&
                          col("ts") < lit("2024-01-21")
                            .cast("timestamp")).count()
    assert(before > 0 && after > 0,
           "the mid-day cut must split a populated day")
  }

  test("q276: the retract-rolled day grain equals the net rebuild; " +
       "both correction behaviors are live") {
    val got = canonDay(TimeSeriesQueries.q276CascadeRetract(spark,
                                                            sf0001))
    val ev = Tables.events(spark, sf0001)
    val net = ev.filter(col("event_id") % 103 =!= 0)
      .withColumn("value",
        when(col("event_id") % 101 === 0, col("value") + 1)
          .otherwise(col("value")))
    val rebuilt = canonDay(
      net.groupBy(date_trunc("day", col("ts")).as("day"),
                  col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(floor(col("value") * 1000).cast("long"))
               .as("v_milli")))
    assert(got == rebuilt)
    val before = direct.map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    val shrunk = got.count(t => before((t._1, t._2))._1 > t._3)
    assert(shrunk > 0, "no cell lost a deleted event")
    val repriced = got.count(t => before((t._1, t._2))._1 == t._3 &&
                                  before((t._1, t._2))._2 != t._4)
    assert(repriced > 0,
           "no cell was re-priced by an update at equal count")
  }

  test("q272: compaction debt is visible and bounded — hybrid never " +
       "prunes better than ideal, and never worse than unclustered") {
    val rows = TimeSeriesQueries.q272LayoutDebt(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                 r.getLong(3), r.getLong(4)))
    val ideal = rows.filter(_._1 == "ideal").map(t => t._2 -> t._5).toMap
    val hybrid = rows.filter(_._1 == "hybrid")
    assert(ideal.nonEmpty && hybrid.nonEmpty)
    hybrid.foreach { case (_, q, _, _, ppm) =>
      assert(ppm >= ideal(q),
             s"hybrid cannot prune better than the re-clustered ideal" +
               s" at range $q")
      assert(ppm <= 1000000L)
    }
    assert(hybrid.map(_._5).sum > ideal.values.sum,
           "the appended days must show as measurable debt")
    // the append cut splits one file boundary at most
    val idealFiles = rows.find(_._1 == "ideal").get._4
    val hybridFiles = hybrid.head._4
    assert(hybridFiles >= idealFiles && hybridFiles <= idealFiles + 1)
  }

  test("q268: the STREAMED cascade lands the direct day grain, and " +
       "its intermediate hourly table equals the direct hourly grain") {
    val streamed = TimeSeriesQueries.q268StreamedCascade(spark, sf0001)
    assert(canonDay(streamed) == direct)
    // the final hourly artifact sits beside the day table (…/h29)
    val outPath = streamed.inputFiles.head.replaceAll("/d29/.*$", "")
    val hourly = spark.read.parquet(s"$outPath/h29")
      .select(col("hour").cast("string"), col("event_type"),
              col("n"), col("v_milli"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
                 r.getLong(3))).toSet
    val directHourly = TimeSeriesQueries
      .evHourly(Tables.events(spark, sf0001))
      .select(col("hour").cast("string"), col("event_type"),
              col("n"), col("v_milli"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
                 r.getLong(3))).toSet
    assert(hourly == directHourly,
           "the standing hourly grain must equal the direct hourly agg")
  }

  test("q261: z-order layout scans strictly fewer files than ingest " +
       "order over the predicate grid; file counts reconcile") {
    val rows = TimeSeriesQueries.q261LayoutPruning(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                 r.getLong(3)))
    val nat = rows.filter(_._1 == "natural")
    val zo = rows.filter(_._1 == "zorder")
    assert(nat.nonEmpty && zo.nonEmpty)
    // both layouts cut the same corpus into the same number of files
    val totals = rows.map(_._4).distinct
    assert(totals.length == 1, s"file totals diverged: $totals")
    val expectedFiles =
      (Tables.events(spark, sf0001).count() + 255) / 256
    assert(totals.head == expectedFiles,
           s"files_total ${totals.head} != ceil(rows/256) $expectedFiles")
    // per range: z-order never scans more; in aggregate strictly fewer
    val natByQ = nat.map(t => t._2 -> t._3).toMap
    zo.foreach { case (_, q, scanned, _) =>
      assert(scanned <= natByQ(q),
             s"z-order scanned more files than ingest order at range $q")
    }
    assert(zo.map(_._3).sum < nat.map(_._3).sum,
           "z-order must prune strictly better in aggregate")
    // ingest order is (near-)unprunable: every range touches ~all files
    assert(nat.map(_._3).min >= totals.head - 1,
           "ingest-order files should span the whole user domain")
  }
}
