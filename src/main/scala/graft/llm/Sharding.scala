package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-shard assignment — the last step of corpus
  * assembly: route every document to one of `nShards` output shards and
  * give it a stable position within its shard, so a training run reads
  * identical shard files from any engine, cluster size, or rerun.
  *
  * Both the shard id and the in-shard order are CONTENT-keyed (md5 of the
  * text), not partition- or arrival-keyed: adding hardware, reordering
  * input splits, or regenerating upstream parquet cannot move a document
  * to a different shard or position (the [[QualityFilters.hashSampleFlag]]
  * stability argument).
  *
  * Scale shape: the in-shard position is a window partitioned BY SHARD —
  * one sort task per shard. That is only a problem if shards are sized
  * absurdly; real training shards target file-system-friendly sizes
  * (~0.5-2 GB), so `nShards ≈ corpus / 1 GB` gives thousands of
  * well-sized sort tasks at 100 TB, which is exactly the parallelism the
  * final write wants anyway.
  */
object Sharding {

  /** 60-bit md5-prefix of a string column as a non-negative long —
    * the scalar twin of [[graft.functions.PortableHash.hash60]]
    * (`('0x' || substr(md5(x),1,15))::BIGINT` in DuckDB).
    */
  private def md5Prefix60Scalar(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Rendezvous (highest-random-weight) shard of a key: the shard
    * `s ∈ [0, nShards)` maximizing `h(key ++ ":" ++ s)` under the
    * portable 60-bit md5 prefix.
    *
    * Why not `hash mod n`: growing a fleet from n to n+1 shards under
    * mod-hashing relocates ~n/(n+1) of the corpus (every key whose hash
    * changes residue). Under rendezvous hashing a key moves ONLY when
    * the NEW shard wins its argmax — so exactly ~1/(n+1) of keys move,
    * and every mover lands on the new shard (both properties pinned in
    * ShardingSpec). At 100 TB that is the difference between copying
    * ~94 TB and ~6 TB on a 16→17 re-shard.
    *
    * Scale shape: one row-local codegen'd pass — `transform` over a
    * literal shard sequence + `array_max` over (weight, shard) structs;
    * no shuffle, no join, no state. Cost is O(nShards) md5s per row,
    * fine for file-count-sized shard counts. (The fan-out alternative —
    * explode × nShards + a max window — would shuffle corpus × nShards
    * rows; never do that.) Ties (probability 2^-60 per pair) break to
    * the larger shard id identically in both engines (struct / list
    * lexicographic compare).
    */
  def rendezvousShard(key: Column, nShards: Int): Column = {
    require(nShards > 0, "nShards must be positive")
    val pairs = transform(
      sequence(lit(0L), lit(nShards - 1L)),
      s => struct(
        md5Prefix60Scalar(
          concat_ws(":", key.cast("string"), s.cast("string"))).as("w"),
        s.as("s")))
    array_max(pairs).getField("s")
  }

  /** The DuckDB twin of [[rendezvousShard]]: list compare is
    * lexicographic like Spark's struct compare, `[2]` is the 1-based
    * shard element.
    */
  private[graft] def rendezvousShardSql(key: String, nShards: Int): String =
    s"""list_max(list_transform(range(0, $nShards), s ->
       |  [('0x' || substr(md5(CAST($key AS VARCHAR) || ':' ||
       |      CAST(s AS VARCHAR)), 1, 15))::BIGINT, s]))[2]""".stripMargin

  /** Assign (shard, pos) to every row: shard = content-hash mod nShards,
    * pos = 0-based rank of the full md5 within the shard (ties broken by
    * id — identical texts keep distinct, stable slots).
    */
  def assignShards(df: DataFrame, idCol: String, textCol: String,
                   nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val w = Window.partitionBy("shard")
      .orderBy(col("__md5key"), col(idCol))
    df.select(col(idCol), col(textCol),
              md5(col(textCol).cast("binary")).as("__md5key"))
      .withColumn("shard",
                  pmod(md5Prefix60Scalar(col(textCol)), lit(nShards.toLong)))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__md5key")
  }

  /** Global token-offset assignment + token-boundary shard mapping — the
    * "concatenate the corpus into one token stream and cut it into
    * fixed-size training shards" step (every doc gets the offset of its
    * first token in the doc_id-ordered stream, and the shard whose token
    * range contains that offset).
    *
    * Scale shape: a global ordered prefix sum WITHOUT the single-partition
    * window anti-pattern — the classic two-phase distributed scan:
    *   1. value-determined range buckets over the id (width from a 1-row
    *      min/max agg, broadcast);
    *   2. per-bucket token sums (≤ `nBuckets` rows) prefix-scanned in one
    *      tiny window — bounded by construction, never data-scale;
    *   3. per-row offsets from an in-bucket window (partitioned BY BUCKET,
    *      so `nBuckets` parallel sort tasks) plus the broadcast bucket
    *      base.
    * At 100 TB: nBuckets ~ cluster parallelism; every data-scale operation
    * is one shuffle on the bucket key. Arithmetic is pure BIGINT (token
    * counts are ≤ corpus tokens ≈ 2.5e13 « 2^63), identical in any SQL
    * engine — the oracle replays it as one running-sum window.
    *
    * Returns `idCol, tokCol, global_offset, shard_id` where
    * `shard_id = global_offset div shardTokens`.
    */
  def tokenOffsets(df: DataFrame, idCol: String, tokCol: String,
                   nBuckets: Int, shardTokens: Long): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    require(shardTokens > 0, "shardTokens must be positive")
    val bounds = df.agg(min(col(idCol)).as("__lo"), max(col(idCol)).as("__hi"))
    // ceil-div keeps every id in [0, nBuckets) even when span < nBuckets
    val bucketed = df.crossJoin(broadcast(bounds))
      .withColumn("__width",
        expr(s"(__hi - __lo + ${nBuckets}L) div ${nBuckets}L"))
      .withColumn("__bucket", expr(s"($idCol - __lo) div __width"))
      .drop("__lo", "__hi", "__width")
    // phase 1+2: bucket partial sums, prefix-scanned over ≤ nBuckets rows
    val basesW = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = bucketed.groupBy("__bucket")
      .agg(sum(col(tokCol)).as("__btoks"))
      .withColumn("__base", coalesce(sum("__btoks").over(basesW), lit(0L)))
      .select("__bucket", "__base")
    // phase 3: in-bucket running sum + broadcast base
    val inBucketW = Window.partitionBy("__bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(bases), "__bucket")
      .withColumn("global_offset",
        col("__base") + coalesce(sum(col(tokCol)).over(inBucketW), lit(0L)))
      .withColumn("shard_id",
        expr(s"global_offset div ${shardTokens}L"))
      .drop("__bucket", "__base")
  }

  /** Deterministic seeded corpus shuffle + fixed-size batch assignment —
    * the training-order step: rank every document by the 60-bit
    * md5-prefix of `"seed:id"` (a reproducible pseudorandom permutation;
    * change the seed, get an independent order) and cut the ranked stream
    * into consecutive `batchSize` batches. Content-keyed like
    * [[assignShards]]: rerunning on different hardware, partitioning, or
    * engine yields byte-identical order.
    *
    * Scale shape: the same two-phase distributed prefix sum as
    * [[tokenOffsets]], counting ROWS instead of tokens, with range
    * buckets cut directly over the hash key — uniform by construction
    * (md5), so buckets balance without sampling and there is never a
    * single-partition window. At 100 TB: one shuffle on the bucket key,
    * `nBuckets` parallel in-bucket sorts, a ≤ `nBuckets`-row driver-side
    * window for the bases. Ties (a 60-bit collision) break by id, so the
    * rank is a total order. Returns `idCol, sort_key, global_rank
    * (0-based), batch_id = global_rank div batchSize`.
    */
  def seededOrder(df: DataFrame, idCol: String, seed: String,
                  nBuckets: Int, batchSize: Long): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    require(batchSize > 0, "batchSize must be positive")
    // ceil-div so bucket ids stay in [0, nBuckets) across the 2^60 range
    val width = ((1L << 60) + nBuckets - 1) / nBuckets
    val keyed = df.select(
      col(idCol),
      md5Prefix60Scalar(concat_ws(":", lit(seed), col(idCol).cast("string")))
        .as("sort_key"))
      .withColumn("__bucket", expr(s"sort_key div ${width}L"))
    val basesW = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = keyed.groupBy("__bucket")
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__base", coalesce(sum("__bn").over(basesW), lit(0L)))
      .select("__bucket", "__base")
    val inBucketW = Window.partitionBy("__bucket")
      .orderBy(col("sort_key"), col(idCol))
    keyed.join(broadcast(bases), "__bucket")
      .withColumn("global_rank",
                  col("__base") + row_number().over(inBucketW) - 1)
      .withColumn("batch_id", expr(s"global_rank div ${batchSize}L"))
      .drop("__bucket", "__base")
  }

  /** Curriculum training order — [[seededOrder]] with a leading STAGE
    * key: documents rank by (stage ascending, seeded 60-bit md5 key,
    * id), so stage 0 is exhausted before stage 1 begins while each
    * stage is internally a reproducible pseudorandom shuffle (the
    * "easy/high-quality first, random within difficulty" schedule of
    * curriculum pretraining). Content-keyed and engine-portable like
    * the other orders: the rank is a pure function of (stage, seed,
    * id), byte-identical across hardware, partitioning, and engines.
    *
    * Scale shape: the [[seededOrder]] two-phase distributed prefix sum
    * with bases keyed by (stage, hash-bucket) — the base table is
    * ≤ #stages × nBuckets rows prefix-scanned on the driver-scale
    * window, the in-bucket row_number windows stay parallel, and the
    * corpus shuffles ONCE on (stage, bucket). Never a single-partition
    * data-scale window.
    */
  def curriculumOrder(df: DataFrame, idCol: String, stageCol: String,
                      seed: String, nBuckets: Int,
                      batchSize: Long): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    require(batchSize > 0, "batchSize must be positive")
    val width = ((1L << 60) + nBuckets - 1) / nBuckets
    val keyed = df.select(
      col(idCol), col(stageCol).cast("long").as("stage"),
      md5Prefix60Scalar(concat_ws(":", lit(seed), col(idCol).cast("string")))
        .as("sort_key"))
      .withColumn("__bucket", expr(s"sort_key div ${width}L"))
    val basesW = Window.orderBy("stage", "__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = keyed.groupBy("stage", "__bucket")
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__base", coalesce(sum("__bn").over(basesW), lit(0L)))
      .select("stage", "__bucket", "__base")
    val inBucketW = Window.partitionBy("stage", "__bucket")
      .orderBy(col("sort_key"), col(idCol))
    keyed.join(broadcast(bases), Seq("stage", "__bucket"))
      .withColumn("global_rank",
                  col("__base") + row_number().over(inBucketW) - 1)
      .withColumn("batch_id", expr(s"global_rank div ${batchSize}L"))
      .drop("__bucket", "__base")
  }

  /** Length-grouped token-budget batching — the dynamic-batching step of
    * a padded-sequence training loader: group documents into length
    * BANDS (`band = min(toks div bandTokens, nBands-1)`, so batchmates
    * pad to similar lengths), pseudorandomly order each band by the
    * seeded 60-bit md5 key (reproducible shuffle, ties by id), and cut
    * each band's stream into batches of ≤ `capacity` tokens via an
    * exclusive running token sum: `batch_id = prefix div capacity`.
    *
    * Scale shape: [[seededOrder]]'s two-phase distributed prefix sum,
    * run per band — hash sub-buckets cut on the uniform sort key (never
    * a single-partition window), a ≤ nBands×nBuckets-row base table
    * broadcast back, one shuffle on (band, bucket). A batch can
    * straddle two sub-buckets only at the seam, which the base offsets
    * make exact — assignment is independent of partitioning and
    * cluster size.
    */
  def lengthBatching(df: DataFrame, idCol: String, tokCol: String,
                     bandTokens: Int = 64, nBands: Int = 8,
                     capacity: Long = 2048L, seed: String = "r9",
                     nBuckets: Int = 32): DataFrame = {
    require(bandTokens > 0 && nBands > 0 && capacity > 0 && nBuckets > 0,
            "bandTokens, nBands, capacity, nBuckets must be positive")
    val width = ((1L << 60) + nBuckets - 1) / nBuckets
    val keyed = df.select(
      col(idCol), col(tokCol),
      least(expr(s"$tokCol div ${bandTokens}L"), lit(nBands - 1L))
        .cast("int").as("band"),
      md5Prefix60Scalar(concat_ws(":", lit(seed), col(idCol).cast("string")))
        .as("sort_key"))
      .withColumn("__bucket", expr(s"sort_key div ${width}L"))
    val basesW = Window.partitionBy("band").orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = keyed.groupBy("band", "__bucket")
      .agg(sum(col(tokCol)).as("__btoks"))
      .withColumn("__base", coalesce(sum("__btoks").over(basesW), lit(0L)))
      .select("band", "__bucket", "__base")
    val inBucketW = Window.partitionBy("band", "__bucket")
      .orderBy(col("sort_key"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.join(broadcast(bases), Seq("band", "__bucket"))
      .withColumn("__off",
                  col("__base") +
                    coalesce(sum(col(tokCol)).over(inBucketW), lit(0L)))
      .withColumn("batch_id", expr(s"__off div ${capacity}L"))
      .drop("__bucket", "__base", "__off")
  }

  /** Write the sharded corpus as parquet partitioned by shard, each
    * shard's file sorted by `pos` — the layout a data loader streams
    * sequentially. One output file per shard (that is what `pos` is for);
    * size nShards to your file-size target, per the scale note above.
    */
  def writeShardedParquet(df: DataFrame, idCol: String, textCol: String,
                          nShards: Int, path: String): Unit =
    assignShards(df, idCol, textCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(path)
}
