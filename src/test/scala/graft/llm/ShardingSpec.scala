package graft.llm

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {

  test("shard assignment is balanced, gapless per shard, and content-stable") {
    val docs = Tables.documents(spark, sf0001)
    val n = docs.count()
    val out = Sharding.assignShards(docs, "doc_id", "text", nShards = 8)
      .cache()
    // every doc assigned exactly once, shards in range
    assert(out.count() == n)
    assert(out.agg(min("shard"), max("shard")).head() ==
      org.apache.spark.sql.Row(0L, 7L))
    // positions are 0..size-1 within each shard (gapless, no collisions)
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("cnt"), min("pos").as("lo"), max("pos").as("hi"))
      .collect()
    perShard.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == r.getLong(1) - 1,
             s"shard ${r.getLong(0)} positions not gapless: $r")
    }
    // rough balance: content hashing should not starve any shard
    val counts = perShard.map(_.getLong(1))
    assert(counts.min > counts.max / 4,
           s"shard imbalance: ${counts.toSeq}")
    // content-stable: shuffling the input rows changes nothing
    val shuffled = Sharding.assignShards(
      docs.repartition(13, col("lang")), "doc_id", "text", nShards = 8)
    assert(shuffled.select("doc_id", "shard", "pos").orderBy("doc_id")
             .collect().toSeq ==
           out.select("doc_id", "shard", "pos").orderBy("doc_id")
             .collect().toSeq)
    out.unpersist()
  }

  test("token offsets equal the single-window reference for any bucket count") {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, sf0001).select(
      col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).cast("long").as("toks"))
    // naive reference: one global running-sum window (fine at spec scale)
    val refW = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = toks
      .withColumn("global_offset", coalesce(sum("toks").over(refW), lit(0L)))
      .withColumn("shard_id", expr("global_offset div 4096L"))
      .orderBy("doc_id").collect().toSeq
    // the distributed form must agree exactly, at every bucket count —
    // including nBuckets > distinct ids (degenerate 1-row buckets) and
    // nBuckets = 1 (single bucket = the naive form)
    for (b <- Seq(1, 7, 32, 5000)) {
      val got = Sharding.tokenOffsets(toks, "doc_id", "toks",
                                      nBuckets = b, shardTokens = 4096L)
        .select("doc_id", "toks", "global_offset", "shard_id")
        .orderBy("doc_id").collect().toSeq
      assert(got == ref, s"nBuckets=$b diverged from the reference window")
    }
    // offsets are a prefix sum: last offset + last toks = corpus total
    val total = toks.agg(sum("toks")).head().getLong(0)
    val last  = ref.last
    assert(last.getLong(2) + last.getLong(1) == total)
  }

  test("token-offset plan: data-scale window is bucket-partitioned") {
    val toks = Tables.documents(spark, sf0001).select(
      col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).cast("long").as("toks"))
    val out = Sharding.tokenOffsets(toks, "doc_id", "toks",
                                    nBuckets = 32, shardTokens = 4096L)
    val plan = out.queryExecution.executedPlan.toString
    // the per-row running sum must be partitioned by __bucket (32-way
    // parallel sort), not a global single-partition window over the data
    assert(plan.contains("windowspecdefinition(__bucket"),
           s"expected a __bucket-partitioned window in:\n$plan")
    // the only global-ordered window is over the ≤nBuckets bases frame,
    // which reaches the join as a broadcast, not an exchange of the data
    assert(plan.contains("BroadcastHashJoin") ||
             plan.contains("BroadcastExchange"),
           s"bucket bases must broadcast:\n$plan")
  }

  test("sharded parquet write produces one sorted partition dir per shard") {
    val dir  = tmpDir("shards")
    val docs = Tables.documents(spark, sf0001).limit(500)
    Sharding.writeShardedParquet(docs, "doc_id", "text", nShards = 4,
                                 path = s"$dir/out")
    val dirs = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted.toSeq
    assert(dirs == Seq("shard=0", "shard=1", "shard=2", "shard=3"))
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 500)
    // partition pruning: a shard filter reads only that partition dir
    val pruned = back.filter(col("shard") === 2)
    assert(pruned.count() ==
             spark.read.parquet(s"$dir/out/shard=2").count())
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(shard#") ||
             scan.contains("PartitionFilters: [(shard#"),
           s"expected partition filter in scan:\n$scan")
    // within a shard, file order == pos order (sorted write)
    val s0 = spark.read.parquet(s"$dir/out/shard=0").select("pos").collect()
      .map(_.getLong(0)).toSeq
    assert(s0 == s0.sorted, "shard file must be written in pos order")
  }

  test("curriculumOrder equals the single-window reference; stages are " +
       "exhausted in order") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf0001).select(
      col("doc_id"), expr("least(n_chars div 400, 3)").as("stage"))
    // naive reference: the seeded key + ONE global (stage, key, id) window
    val keyed = docs
      .withColumn("sort_key",
                  conv(substring(md5(concat_ws(":", lit("t"),
                                               col("doc_id").cast("string"))
                                       .cast("binary")), 1, 15), 16, 10)
                    .cast("long"))
    val refW = Window.orderBy("stage", "sort_key", "doc_id")
    val ref = keyed
      .withColumn("global_rank",
                  (row_number().over(refW) - 1).cast("long"))
      .withColumn("batch_id", expr("global_rank div 50L"))
      .select("doc_id", "stage", "sort_key", "global_rank", "batch_id")
      .orderBy("doc_id").collect().toSeq
    // the staged distributed prefix sum must agree exactly at every
    // bucket count, including degenerate 1-row buckets and nBuckets = 1
    for (b <- Seq(1, 7, 32, 5000)) {
      val got = Sharding.curriculumOrder(docs, "doc_id", "stage",
                                         seed = "t", nBuckets = b,
                                         batchSize = 50L)
        .select("doc_id", "stage", "sort_key", "global_rank", "batch_id")
        .orderBy("doc_id").collect().toSeq
      assert(got == ref, s"nBuckets=$b diverged from the reference window")
    }
    // curriculum invariant: stage s is exhausted before s+1 begins
    val bounds = Sharding.curriculumOrder(docs, "doc_id", "stage",
                                          seed = "t", nBuckets = 32,
                                          batchSize = 50L)
      .groupBy("stage")
      .agg(min("global_rank").as("lo"), max("global_rank").as("hi"),
           count(lit(1)).as("n"))
      .orderBy("stage").collect()
    assert(bounds.length > 1, "fixture must span multiple stages")
    bounds.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"),
             s"stage overlap: $a vs $b")
    }
    // ranks are gapless overall
    assert(bounds.map(_.getAs[Long]("n")).sum ==
             bounds.last.getAs[Long]("hi") + 1)
  }

  test("lengthBatching equals the single-window per-band reference; batches respect capacity") {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, sf0001).select(
      col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).cast("long").as("toks"))
    // naive reference: plain per-band window over the seeded key
    val keyed = toks
      .withColumn("band", least(expr("toks div 64L"), lit(7L)).cast("int"))
      .withColumn("sort_key",
                  conv(substring(md5(concat_ws(":", lit("r9"),
                                               col("doc_id").cast("string"))
                                       .cast("binary")), 1, 15), 16, 10)
                    .cast("long"))
    val refW = Window.partitionBy("band").orderBy("sort_key", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = keyed
      .withColumn("__cum", coalesce(sum("toks").over(refW), lit(0L)))
      .withColumn("batch_id", expr("__cum div 2048L"))
      .select("doc_id", "toks", "band", "sort_key", "batch_id")
      .orderBy("doc_id").collect().toSeq
    for (b <- Seq(1, 4, 32, 5000)) {
      val got = Sharding.lengthBatching(toks, "doc_id", "toks",
                                        bandTokens = 64, nBands = 8,
                                        capacity = 2048L, seed = "r9",
                                        nBuckets = b)
        .select("doc_id", "toks", "band", "sort_key", "batch_id")
        .orderBy("doc_id").collect().toSeq
      assert(got == ref, s"nBuckets=$b diverged from the reference window")
    }
    // batch token sums: removing the straddling last doc of a batch
    // brings it under capacity (the prefix-cut invariant)
    val batches = Sharding.lengthBatching(toks, "doc_id", "toks",
                                          nBuckets = 32)
      .groupBy("band", "batch_id")
      .agg(sum("toks").as("total"), max("toks").as("biggest"))
      .collect()
    batches.foreach { r =>
      assert(r.getAs[Long]("total") - r.getAs[Long]("biggest") < 2048L,
             s"batch overfilled beyond one straddling doc: $r")
    }
    // bands are the documented token bands
    val bad = keyed.filter(
      col("band") =!= least(expr("toks div 64L"), lit(7L)).cast("int"))
    assert(bad.count() == 0)
  }

  test("lengthBatching plan: data-scale window is (band, bucket)-partitioned; bases broadcast") {
    val toks = Tables.documents(spark, sf0001).select(
      col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).cast("long").as("toks"))
    val plan = Sharding.lengthBatching(toks, "doc_id", "toks",
                                       nBuckets = 32)
      .queryExecution.executedPlan.toString
    // the per-row token cumsum parallelizes over hash sub-buckets within
    // each band — never a single-partition or per-band-only window
    assert(plan.contains("windowspecdefinition(band"),
           s"expected a (band, __bucket)-partitioned window in:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
             plan.contains("BroadcastExchange"),
           s"band/bucket bases must broadcast:\n$plan")
  }

  test("curriculumOrder plan: data-scale window is (stage, bucket)-" +
       "partitioned; bases broadcast") {
    val docs = Tables.documents(spark, sf0001).select(
      col("doc_id"), expr("least(n_chars div 400, 3)").as("stage"))
    val plan = Sharding.curriculumOrder(docs, "doc_id", "stage",
                                        seed = "t", nBuckets = 32,
                                        batchSize = 50L)
      .queryExecution.executedPlan.toString
    // the corpus-scale row_number parallelizes over (stage, hash-bucket)
    // — never a single-partition global window; only the ≤ stages×32-row
    // bases frame is globally ordered, and it broadcasts
    assert(plan.contains("windowspecdefinition(stage"),
           s"expected a (stage, __bucket)-partitioned window in:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
             plan.contains("BroadcastExchange"),
           s"stage/bucket bases must broadcast:\n$plan")
  }

  test("length-banded batching pads less than single-band (random) " +
       "batching at the same capacity") {
    val toks = Tables.documents(spark, sf0001).select(
      col("doc_id"),
      graft.llm.TextAnalysis.wsTokenCount(col("text")).cast("long")
        .as("toks"))
    def wastePpm(nBands: Int): Long = {
      val g = Sharding.lengthBatching(toks, "doc_id", "toks",
                                      bandTokens = 64, nBands = nBands,
                                      capacity = 2048L, seed = "r9",
                                      nBuckets = 32)
        .groupBy("band", "batch_id")
        .agg(count(lit(1)).as("n"), sum("toks").as("s"),
             max("toks").as("m"))
        .agg(sum(col("m") * col("n")).as("padded"), sum("s").as("real"))
        .head()
      val (padded, real) = (g.getLong(0), g.getLong(1))
      (padded - real) * 1000000L / padded
    }
    val banded = wastePpm(8); val random = wastePpm(1)
    assert(banded < random,
           s"banded waste $banded ppm must beat random $random ppm")
  }

  test("rendezvousShard matches an independent scalar argmax") {
    // independent JVM reference: md5("id:s") 60-bit prefix, argmax,
    // ties to the larger shard id (the struct-compare tiebreak)
    def ref(id: Long, n: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until n).map { s =>
        val d = md.digest(s"$id:$s".getBytes("UTF-8"))
        val w = java.lang.Long.parseLong(
          d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
        (w, s.toLong)
      }.max._2
    }
    val got = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
              Sharding.rendezvousShard(col("doc_id"), 7).as("s7"),
              Sharding.rendezvousShard(col("doc_id"), 16).as("s16"))
      .orderBy("doc_id").limit(200).collect()
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == ref(id, 7), s"n=7 mismatch for doc $id")
      assert(r.getLong(2) == ref(id, 16), s"n=16 mismatch for doc $id")
    }
  }

  test("rendezvous 16→17 re-shard: movers all land on the new shard, ~1/17 move, mod-hash moves most") {
    def h60(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    val a = Tables.documents(spark, sf0001).select(
      Sharding.rendezvousShard(col("doc_id"), 16).as("rdv_old"),
      Sharding.rendezvousShard(col("doc_id"), 17).as("rdv_new"),
      pmod(h60(col("doc_id").cast("string")), lit(16L)).as("mod_old"),
      pmod(h60(col("doc_id").cast("string")), lit(17L)).as("mod_new"))
      .cache()
    val n = a.count().toDouble
    // shards in range after the resize
    assert(a.agg(min("rdv_new"), max("rdv_new")).head() ==
      org.apache.spark.sql.Row(0L, 16L))
    // THE rendezvous property: a doc moves iff the NEW shard wins
    val movedElsewhere = a.filter(col("rdv_old") =!= col("rdv_new") &&
                                  col("rdv_new") =!= 16L).count()
    assert(movedElsewhere == 0L,
           s"$movedElsewhere movers did not land on the new shard")
    val rdvMoved = a.filter(col("rdv_old") =!= col("rdv_new")).count()
    assert(rdvMoved > 0 && rdvMoved / n < 2.0 / 17,
           s"rendezvous moved ${rdvMoved / n}, expected ~1/17")
    val modMoved = a.filter(col("mod_old") =!= col("mod_new")).count()
    assert(modMoved / n > 0.5,
           s"mod-hash moved only ${modMoved / n}, expected ~16/17")
    // balance survives the resize
    val loads = a.groupBy("rdv_new").count().collect().map(_.getLong(1))
    assert(loads.min > loads.max / 4, s"imbalance: ${loads.toSeq}")
    a.unpersist()
  }
}
