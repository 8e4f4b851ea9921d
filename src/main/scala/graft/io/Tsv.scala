package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** TSV/CSV sources and sinks (SURVEY.md §2.1 S1–S4, S6).
  *
  * Mirrors the reference's three load shapes:
  *  - S1: header + inferSchema (`sst2_test2.py:34-35`, `qnli_test.py:66-67`)
  *  - S2: header + inferSchema + quote/escape for embedded quotes
  *    (`qqp_test.py:25-31`)
  *  - S3: header only, everything string-typed, cast later
  *    (`transformers_test.py:63`)
  *
  * Scale notes: inferSchema costs an extra full pass over the data — at
  * 100 TB always prefer [[readTsv]] with an explicit schema (one pass,
  * deterministic types, no sampling drift). The inferring variants are kept
  * for reference parity. CSV scans split by file; for cluster-scale inputs
  * feed many files, not one giant one.
  */
object Tsv {

  /** S1-shape but with an explicit schema — the 100 TB-preferred reader. */
  def readTsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .schema(schema)
      .csv(path)

  /** S1: header + inferSchema (`sst2_test2.py:34-35`). */
  def readTsvInfer(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)

  /** S2: adds quote/escape so embedded `"` inside fields parses
    * (`qqp_test.py:25-31`, Univocity parser).
    */
  def readTsvQuoted(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("inferSchema", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)

  /** S3: header only — all columns StringType, caller casts
    * (`transformers_test.py:63`).
    */
  def readTsvStrings(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .csv(path)

  /** Production-hardened reader: explicit schema + PERMISSIVE mode with a
    * corrupt-record column. Rows that fail to parse (wrong arity, bad
    * casts) land with nulls plus the raw line in `_corrupt_record`
    * instead of killing the job — at 100 TB a handful of mangled lines
    * per shard is a certainty, and FAILFAST would turn each into a dead
    * pipeline. Callers split on `_corrupt_record IS NULL` to quarantine
    * the bad rows (TsvSpec shows the pattern).
    *
    * IMPORTANT: callers MUST `.cache()` the returned frame before any
    * query that filters or projects on `_corrupt_record`. Spark's CSV
    * column pruning short-circuits parsing when a query references only
    * the corrupt-record column (AnalysisException or misleading results
    * on an uncached frame); caching forces a full parse first. Not cached
    * here because the quarantine split is a two-consumer read — the
    * caller owns the persist/unpersist lifecycle.
    */
  def readTsvPermissive(spark: SparkSession, path: String,
                        schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record",
                                 org.apache.spark.sql.types.StringType)
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
  }

  /** S4: CSV sink with header (`sst2_test2.py:225-227`). Distributed write —
    * one file per partition; callers coalesce ONLY for tiny results.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** S6: parquet sink — distributed, not via driver collect
    * (replaces `transformers_test.py:377`'s pandas to_parquet).
    */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)
}
