package graft.llm

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persistence for the incremental-dedup and ANN indexes — the piece that
  * closes the daily-ingest contract: an index built from yesterday's corpus
  * must classify today's batch from DISK, in a fresh session, without
  * re-touching corpus text.
  *
  * Every index is written as a parquet table BUCKETED (and bucket-sorted)
  * by its join key, so the classify-time equi-join reads the corpus-scale
  * side shuffle-free: Spark's bucketed-scan planning aligns the join's
  * required distribution with the table's bucket spec and only the (small,
  * delta-sized) batch side exchanges. That is exactly the layout the
  * [[Dedup.MinhashIndex]] scaladoc promises for production.
  *
  * Tables are registered in the session catalog (metastore) because bucket
  * metadata lives there — a bare parquet directory loses the bucketing
  * contract. Pass `dir` to pin the data files to an external location
  * (e.g. the corpus lake); omit it for warehouse-managed storage.
  */
object IndexStore {

  /** Drop `table` AND its on-disk location. The drop alone is not enough
    * across sessions: the catalog is per-session (in-memory), so a fresh
    * JVM doesn't know yesterday's table, `DROP TABLE IF EXISTS` no-ops,
    * and the leftover warehouse/external directory makes the re-save
    * throw LOCATION_ALREADY_EXISTS — which is exactly the daily
    * index-rotation path (save under the same name, next day, new
    * process). Deleting the stale location restores save idempotence.
    */
  private[graft] def dropWithLocation(spark: SparkSession, table: String,
                                    dir: Option[String]): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = dir.getOrElse(
      spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
        "/" + table.toLowerCase(java.util.Locale.ROOT))
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  private def location(spark: SparkSession, table: String,
                       dir: Option[String]): String =
    dir.getOrElse(
      spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
        "/" + table.toLowerCase(java.util.Locale.ROOT))

  /** Overwrite-save `df` as a bucketed, bucket-sorted parquet table.
    * The pre-drop (metadata + location) makes re-saves idempotent even
    * from a fresh session — a stale table with different bucketing/path
    * can never half-merge with the new one. A small `_graft_index_spec`
    * descriptor (schema DDL + bucket spec) is written beside the data so
    * a LATER session can re-register the table with its bucketing intact
    * (see [[ensureRegistered]]).
    */
  private def writeBucketedTable(df: DataFrame, table: String,
                                 numBuckets: Int, keys: Seq[String],
                                 dir: Option[String]): Unit = {
    val spark = df.sparkSession
    dropWithLocation(spark, table, dir)
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
    dir.fold(w)(d => w.option("path", d)).saveAsTable(table)
    val loc = location(spark, table, dir)
    val spec = s"$numBuckets\n${keys.mkString(",")}\n${df.schema.toDDL}"
    val p = new org.apache.hadoop.fs.Path(loc, "_graft_index_spec")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(spec.getBytes("UTF-8")) finally out.close()
  }

  /** Re-register a persisted bucketed table in THIS session's catalog if
    * it isn't there — the catalog is per-session, so an index saved by
    * yesterday's JVM exists only as files + the `_graft_index_spec`
    * descriptor. Registration re-declares the bucket spec (CLUSTERED BY
    * … INTO n BUCKETS) over the existing LOCATION, so the loaded side
    * keeps its Exchange-free join property across sessions.
    */
  private def ensureRegistered(spark: SparkSession, table: String,
                               dir: Option[String]): Unit = {
    if (!spark.catalog.tableExists(table)) {
      val loc = location(spark, table, dir)
      val p = new org.apache.hadoop.fs.Path(loc, "_graft_index_spec")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(fs.exists(p),
              s"no persisted index at $loc (missing _graft_index_spec)")
      val in = fs.open(p)
      val spec =
        try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally in.close()
      val Array(nb, keys, ddl) = spec.split("\n", 3)
      val clustered =
        if (nb == "0") ""
        else {
          val keyList = keys.split(",").mkString(", ")
          s"CLUSTERED BY ($keyList) SORTED BY ($keyList) " +
            s"INTO $nb BUCKETS "
        }
      spark.sql(
        s"CREATE TABLE $table ($ddl) USING PARQUET " +
          clustered + s"LOCATION '$loc'")
    }
  }

  // ---------------------------------------------------------------- MinHash

  /** Persist a [[Dedup.MinhashIndex]] as two bucketed tables:
    * `{name}_buckets` bucketed by (band, bucket) — the candidate-join key —
    * and `{name}_shingles` bucketed by corpus_id — the verify-join key.
    */
  def saveMinhashIndex(index: Dedup.MinhashIndex, name: String,
                       numBuckets: Int = 32,
                       dir: Option[String] = None): Unit = {
    writeBucketedTable(index.buckets, s"${name}_buckets", numBuckets,
                       Seq("band", "bucket"), dir.map(d => s"$d/buckets"))
    writeBucketedTable(index.shingles, s"${name}_shingles", numBuckets,
                       Seq("corpus_id"), dir.map(d => s"$d/shingles"))
  }

  /** Load a persisted MinHash index; the returned frames carry the bucket
    * spec, so [[Dedup.minhashIncrementalPortable]] joins them without an
    * index-side Exchange. Works from a FRESH session: if the catalog
    * doesn't know the tables, they are re-registered from the on-disk
    * descriptor (pass the same `dir` given to save, if any).
    */
  def loadMinhashIndex(spark: SparkSession, name: String,
                       dir: Option[String] = None): Dedup.MinhashIndex = {
    ensureRegistered(spark, s"${name}_buckets", dir.map(d => s"$d/buckets"))
    ensureRegistered(spark, s"${name}_shingles",
                     dir.map(d => s"$d/shingles"))
    Dedup.MinhashIndex(spark.table(s"${name}_buckets"),
                       spark.table(s"${name}_shingles"))
  }

  // ------------------------------------------------------------ fingerprint

  /** Persist the exact-dedup (fp, corpus_id) index bucketed by fp — the
    * [[Dedup.exactIncremental]] join key.
    */
  def saveFingerprintIndex(index: DataFrame, name: String,
                           numBuckets: Int = 32,
                           dir: Option[String] = None): Unit =
    writeBucketedTable(index, name, numBuckets, Seq("fp"), dir)

  def loadFingerprintIndex(spark: SparkSession, name: String,
                           dir: Option[String] = None): DataFrame = {
    ensureRegistered(spark, name, dir)
    spark.table(name)
  }

  // -------------------------------------------------------------------- LSH

  /** Persist an ANN [[Similarity.lshIndex]] bucketed by its hyperplane
    * `bucket` key.
    */
  def saveLshIndex(index: DataFrame, name: String,
                   numBuckets: Int = 32,
                   dir: Option[String] = None): Unit =
    writeBucketedTable(index, name, numBuckets, Seq("bucket"), dir)

  def loadLshIndex(spark: SparkSession, name: String,
                   dir: Option[String] = None): DataFrame = {
    ensureRegistered(spark, name, dir)
    spark.table(name)
  }

  // -------------------------------------------------------------------- IVF

  /** Persist a small UNBUCKETED side table (IVF centroids, BM25 stats)
    * with a numBuckets=0 descriptor so a fresh session can re-register
    * it from disk like the bucketed tables.
    */
  private def savePlainTable(df: DataFrame, table: String,
                             dir: Option[String]): Unit = {
    val spark = df.sparkSession
    dropWithLocation(spark, table, dir)
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
    dir.fold(w)(d => w.option("path", d)).saveAsTable(table)
    val loc = location(spark, table, dir)
    val spec = s"0\n\n${df.schema.toDDL}"
    val p = new org.apache.hadoop.fs.Path(loc, "_graft_index_spec")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(spec.getBytes("UTF-8")) finally out.close()
  }

  /** Persist a [[Similarity.IvfIndex]]: the cell-assigned corpus bucketed
    * by `cell` (the probe-join key) and the tiny centroid table plain.
    */
  def saveIvfIndex(index: Similarity.IvfIndex, name: String,
                   numBuckets: Int = 16,
                   dir: Option[String] = None): Unit = {
    writeBucketedTable(index.assigned, s"${name}_assigned", numBuckets,
                       Seq("cell"), dir.map(d => s"$d/assigned"))
    savePlainTable(index.centroids, s"${name}_centroids",
                   dir.map(d => s"$d/centroids"))
  }

  def loadIvfIndex(spark: SparkSession, name: String,
                   dir: Option[String] = None): Similarity.IvfIndex = {
    ensureRegistered(spark, s"${name}_assigned",
                     dir.map(d => s"$d/assigned"))
    ensureRegistered(spark, s"${name}_centroids",
                     dir.map(d => s"$d/centroids"))
    Similarity.IvfIndex(spark.table(s"${name}_assigned"),
                        spark.table(s"${name}_centroids"))
  }

  // -------------------------------------------------------------------- PQ

  /** Persist a [[Similarity.PqIndex]]: codes bucketed by `corpus_id`
    * (the id-keyed upsert pattern every roll job probes), codebooks
    * plain (the IVF-centroid pattern). Subspace geometry is recovered
    * from the codebook shape on load, so the descriptor carries no
    * extra config.
    */
  def savePqIndex(index: Similarity.PqIndex, name: String,
                  numBuckets: Int = 16,
                  dir: Option[String] = None): Unit = {
    writeBucketedTable(index.codes, s"${name}_codes", numBuckets,
                       Seq("corpus_id"), dir.map(d => s"$d/codes"))
    savePlainTable(index.codebooks, s"${name}_codebooks",
                   dir.map(d => s"$d/codebooks"))
  }

  def loadPqIndex(spark: SparkSession, name: String,
                  dir: Option[String] = None): Similarity.PqIndex = {
    ensureRegistered(spark, s"${name}_codes", dir.map(d => s"$d/codes"))
    ensureRegistered(spark, s"${name}_codebooks",
                     dir.map(d => s"$d/codebooks"))
    val cb = spark.table(s"${name}_codebooks")
    val shape = cb.agg(
      org.apache.spark.sql.functions.max("sub"),
      org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.col("centroid")))).head()
    Similarity.PqIndex(spark.table(s"${name}_codes"), cb,
                       nSub = shape.getInt(0) + 1,
                       subDim = shape.getInt(1))
  }

  // ------------------------------------------------------------------- BM25

  /** Persist a [[Relevance.Bm25Index]]: postings bucketed AND sorted by
    * `token` (a query-term filter prunes parquet row groups via the
    * token min/max stats — scoring reads index slivers, never corpus
    * text) plus the one-row stats table plain (the IVF-centroid
    * pattern).
    */
  def saveBm25Index(index: Relevance.Bm25Index, name: String,
                    numBuckets: Int = 32,
                    dir: Option[String] = None): Unit = {
    writeBucketedTable(index.postings, s"${name}_postings", numBuckets,
                       Seq("token"), dir.map(d => s"$d/postings"))
    savePlainTable(index.stats, s"${name}_stats", dir.map(d => s"$d/stats"))
  }

  /** Positional postings ([[Relevance.positionalIndex]]), bucketed +
    * sorted by token exactly like the BM25 postings — phrase-term
    * filters prune row groups the same way.
    */
  def savePositionalIndex(index: DataFrame, name: String,
                          numBuckets: Int = 32,
                          dir: Option[String] = None): Unit =
    writeBucketedTable(index, s"${name}_positions", numBuckets,
                       Seq("token"), dir.map(d => s"$d/positions"))

  def loadPositionalIndex(spark: SparkSession, name: String,
                          dir: Option[String] = None): DataFrame = {
    ensureRegistered(spark, s"${name}_positions",
                     dir.map(d => s"$d/positions"))
    spark.table(s"${name}_positions")
  }

  def loadBm25Index(spark: SparkSession, name: String,
                    dir: Option[String] = None): Relevance.Bm25Index = {
    ensureRegistered(spark, s"${name}_postings",
                     dir.map(d => s"$d/postings"))
    ensureRegistered(spark, s"${name}_stats", dir.map(d => s"$d/stats"))
    Relevance.Bm25Index(spark.table(s"${name}_postings"),
                        spark.table(s"${name}_stats"))
  }

  /** Drop a persisted index's tables and their warehouse locations
    * (external `dir` data is left for the caller's lifecycle).
    */
  def drop(spark: SparkSession, name: String): Unit =
    Seq(name, s"${name}_buckets", s"${name}_shingles",
        s"${name}_assigned", s"${name}_centroids",
        s"${name}_postings", s"${name}_stats",
        s"${name}_codes", s"${name}_codebooks", s"${name}_positions")
      .foreach(t => dropWithLocation(spark, t, None))
}
