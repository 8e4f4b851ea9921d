package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers for the TESTDATA.md star schema.
  *
  * All scans are plain `spark.read.parquet` — DataSource V2 parquet with
  * predicate pushdown, column pruning, and (at cluster scale) partition
  * pruning all handled by Catalyst. Queries must select narrowly and filter
  * early so the pushed filters/ReadSchema stay tight at 100 TB.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")

  /** events.ts is parquet TIMESTAMP(NANOS); with
    * spark.sql.legacy.parquet.nanosAsLong=true (set in [[graft.Sessions]])
    * it scans as nanos-since-epoch LongType, converted here to a proper
    * TimestampType (microsecond precision — same truncation DuckDB applies
    * internally). Pure expression, stays in codegen.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integral `div`, not `/`: double division loses sub-µs exactness
        // for epoch nanos (~1.7e18 exceeds the 53-bit mantissa) — `div`
        // matches DuckDB's exact nano→micro truncation bit-for-bit
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // TIMESTAMP(MICROS, isAdjustedToUTC=false) scans as TIMESTAMP_NTZ
        // under Spark 4's default inferTimestampNTZ. Normalize to
        // session-zoned TimestampType (the session is pinned to UTC in
        // [[graft.Sessions]], so the cast is value-identical and matches
        // DuckDB's naive read); watermarks/windows reject NTZ event time.
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
