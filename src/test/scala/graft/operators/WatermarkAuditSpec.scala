package graft.operators

import graft.SparkSpec

class WatermarkAuditSpec extends SparkSpec {

  test("watermarkAudit hand fixture: first arrival always accepted, " +
       "drops are window-granular (an event older than the watermark " +
       "survives if its WINDOW is still open), cross-bucket bases and " +
       "ingest ties resolve by (ingest_s, event_id)") {
    import spark.implicits._
    // (event_id, event_s, delay_s, ingest_s); wmLag 50, windows of 100
    val e = Seq(
      (1L, 1000L, 0L, 1000L),    // first arrival → wm floor → accepted
      (2L, 1200L, 10L, 1210L),   // accepted
      (3L, 1000L, 220L, 1220L),  // wm 1150 ≥ win_end 1100 → dropped
      (4L, 1090L, 140L, 1230L),  // same window as e3 → dropped
      (5L, 1151L, 89L, 1240L),   // event OLDER than wm 1150 but its
                                 //   window [1100,1200) is open → kept
      (6L, 1190L, 50L, 1240L),   // ingest tie with e5 → ordered by id
      (7L, 5000L, 2300L, 7300L), // next ingest-hour bucket: base max
                                 //   carries 1200 over → accepted
      (8L, 1100L, 6300L, 7400L)) // wm now 4950 → dropped
      .toDF("event_id", "event_s", "delay_s", "ingest_s")
    val out = TimeSeriesQueries.watermarkAudit(e, wmLagS = 50L,
                                               winS = 100L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
                 r.getLong(3)))
    assert(out.toSeq == Seq(
      (-1L, "accepted", 5L, 2300L),
      (-1L, "dropped_late", 3L, 6300L),
      (1000L, "accepted", 1L, 0L),
      (1000L, "dropped_late", 2L, 220L),
      (1100L, "accepted", 2L, 89L),
      (1100L, "dropped_late", 1L, 6300L),
      (1200L, "accepted", 1L, 10L),
      (5000L, "accepted", 1L, 2300L)), s"got ${out.toSeq}")
  }

  test("q241 on the events table equals a driver-side single-stream " +
       "replay of the arrival-order running max (two-phase form is " +
       "exact, not approximate)") {
    val arr = TimeSeriesQueries.q241Arrivals(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                 r.getLong(3)))
    // replay: sort by (ingest, id), carry the running max of event_s
    var runMax = 0L
    val verdicts = arr.sortBy(t => (t._4, t._1)).map {
      case (id, es, d, _) =>
        val wm = runMax - 900L
        val win = es / 3600L * 3600L
        val v = if (win + 3600L > wm) "accepted" else "dropped_late"
        runMax = math.max(runMax, es)
        (win, v, d)
    }
    val expected = verdicts.groupBy(t => (t._1, t._2))
      .map { case ((w, v), ts) => (w, v, ts.length.toLong,
                                   ts.map(_._3).max) }
      .toSet
    val got = TimeSeriesQueries.q241WatermarkAudit(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
                 r.getLong(3)))
      .filter(_._1 >= 0L).toSet
    assert(got == expected)
    // the synthetic tail must actually exercise both verdicts
    assert(got.exists(_._2 == "dropped_late") &&
             got.exists(_._2 == "accepted"))
  }
}
