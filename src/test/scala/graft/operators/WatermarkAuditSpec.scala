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

  test("q252 session funnel hand fixture: stages must occur strictly " +
       "after the previous stage's FIRST occurrence within one " +
       "session; cross-session and out-of-order stages never count") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    def ts(min: Int) = new java.sql.Timestamp(86400000L + min * 60000L)
    // user 1, one session: view→click→purchase in order → full
    // user 2, one session: click before view, purchase after view but
    //   no click after the view → counts as view-only
    // user 3, two sessions split by a 40-min gap: view in s1,
    //   click+purchase in s2 → neither converts past view
    // user 4, one session: view→purchase→click → view_click NOT
    //   reached before purchase; purchase precedes click → vc only
    val e = Seq(
      (1L, 1L, ts(0), "view"), (2L, 1L, ts(1), "click"),
      (3L, 1L, ts(2), "purchase"),
      (4L, 2L, ts(0), "click"), (5L, 2L, ts(1), "view"),
      (6L, 2L, ts(2), "purchase"),
      (7L, 3L, ts(0), "view"), (8L, 3L, ts(50), "click"),
      (9L, 3L, ts(51), "purchase"),
      (10L, 4L, ts(0), "view"), (11L, 4L, ts(1), "purchase"),
      (12L, 4L, ts(2), "click"))
      .toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("value", lit(0.0d)).withColumn("props", lit("{}"))
    // route through a temp view-backed Tables? q252 reads Tables
    // directly — exercise the core by replicating its tail on the
    // fixture via the same code path (sessionize + positional scan)
    val out = {
      val dirLess = e // shape matches events schema columns used
      // inline: reuse the production query body by temporarily
      // writing fixture parquet and pointing the query at it
      val d = tmpDir("q252fix")
      dirLess.select("event_id", "ts", "user_id", "event_type",
                     "value", "props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      TimeSeriesQueries.q252SessionFunnel(spark, d).collect()(0)
    }
    // sessions: u1:1, u2:1, u3:2, u4:1 → 5 total
    assert(out.getLong(0) == 5L, s"n_sessions ${out.getLong(0)}")
    // views: u1, u2, u3-s1, u4 → 4
    assert(out.getLong(1) == 4L, s"n_view ${out.getLong(1)}")
    // view→click: u1, u4 (click at pos 3 after view at pos 1) → 2
    assert(out.getLong(2) == 2L, s"n_view_click ${out.getLong(2)}")
    // full funnel: u1 only (u4's purchase precedes its click)
    assert(out.getLong(3) == 1L, s"n_full ${out.getLong(3)}")
    assert(out.getLong(4) == 4L * 1000000L / 5L &&
             out.getLong(5) == 2L * 1000000L / 5L &&
             out.getLong(6) == 1000000L / 5L)
  }

  test("q253 streaming funnel state machine ≡ q252 batch positional " +
       "scan on the events table") {
    val streamed = TimeSeriesQueries
      .queries("q253_streaming_funnel")(spark, sf0001)
      .collect().toSeq
    val batch = TimeSeriesQueries
      .queries("q252_session_funnel")(spark, sf0001)
      .collect().toSeq
    assert(streamed == batch,
           s"state machine diverged: $streamed vs $batch")
  }

  test("funnelSessionize state carry: a session spanning micro-batches " +
       "keeps its stage progress, a gap closes and emits, and the " +
       "timeout flushes the final session") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.{FunnelEvent, FunnelOut}
    import spark.implicits._
    val base = 48L * 3600000L
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    val input = MemoryStream[FunnelEvent]
    val q = EventStreams.funnelSessionize(input.toDF().as[FunnelEvent])
      .writeStream.format("memory").queryName("funnel_carry")
      .outputMode("append").start()
    try {
      // batch 1: the view arrives alone — state must carry the armed
      // stage across the batch boundary
      input.addData(FunnelEvent(ts(0), "view", 1L, 1L))
      q.processAllAvailable()
      // batch 2: click + purchase within the gap → same session
      // completes the funnel; nothing emitted yet (session open)
      input.addData(FunnelEvent(ts(5), "click", 1L, 2L),
                    FunnelEvent(ts(6), "purchase", 1L, 3L))
      q.processAllAvailable()
      assert(spark.table("funnel_carry").isEmpty)
      // batch 3: a >30-min gap event closes the stage-3 session
      input.addData(FunnelEvent(ts(60), "view", 1L, 4L))
      q.processAllAvailable()
      val afterGap = spark.table("funnel_carry").as[FunnelOut]
        .collect().toSeq
      assert(afterGap == Seq(FunnelOut(1L, 3)),
             s"cross-batch session must close at stage 3: $afterGap")
      // flush: advance the watermark far past last+gap (one event),
      // then trigger the timeout pass (a second event)
      input.addData(FunnelEvent(ts(3000), "flush", -1L, 5L))
      q.processAllAvailable()
      input.addData(FunnelEvent(ts(3001), "flush", -1L, 6L))
      q.processAllAvailable()
      val fin = spark.table("funnel_carry").as[FunnelOut]
        .collect().toSeq.filter(_.user_id == 1L)
      assert(fin == Seq(FunnelOut(1L, 3), FunnelOut(1L, 1)),
             s"timeout must flush the final view-only session: $fin")
    } finally q.stop()
  }

  test("the audit IS per-event-batch streaming: feeding arrivals one " +
       "micro-batch each through windowedCounts with the same 15-min " +
       "watermark reproduces the audit-accepted counts exactly") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // first 100 arrivals in ingest order, with their event types
    val arr = TimeSeriesQueries.q241Arrivals(spark, sf0001)
      .join(graft.sources.Tables.events(spark, sf0001)
              .select(col("event_id"), col("event_type")),
            Seq("event_id"))
      .select("event_id", "event_s", "ingest_s", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                 r.getString(3)))
      .sortBy(t => (t._3, t._1)).take(100)
    // audit replay over exactly this prefix (per-event watermark)
    var runMax = 0L
    val expected = arr.flatMap { case (_, es, _, tpe) =>
      val wm = runMax - 900L
      val win = es / 3600L * 3600L
      runMax = math.max(runMax, es)
      if (win + 3600L > wm) Some(((win, tpe), 1L)) else None
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    // stream the same prefix, ONE micro-batch per arrival — Spark's
    // per-batch watermark update then equals the audit's
    // strictly-earlier-arrival rule
    val input = MemoryStream[graft.streaming.EventStreams.Event]
    val q = graft.streaming.EventStreams
      .windowedCounts(input.toDF(), windowLen = "1 hour",
                      lateness = "15 minutes")
      .writeStream.format("memory").queryName("wm_audit_x")
      .outputMode("update").start()
    try {
      arr.foreach { case (id, es, _, tpe) =>
        input.addData(graft.streaming.EventStreams.Event(
          new java.sql.Timestamp(es * 1000L), tpe, id, 0.0))
        q.processAllAvailable()
      }
      // update-mode counts only grow per key: max = final
      val streamed = spark.table("wm_audit_x")
        .groupBy("window_start", "event_type").agg(max("n").as("n"))
        .collect()
        .map(r => ((r.getTimestamp(0).getTime / 1000L,
                    r.getString(1)), r.getLong(2))).toMap
      assert(streamed == expected,
             s"streamed=$streamed\nexpected=$expected")
    } finally q.stop()
  }
}
