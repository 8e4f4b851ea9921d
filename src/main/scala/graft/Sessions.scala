package graft

import org.apache.spark.sql.SparkSession

/** Single place every entrypoint (Verify / Bench / tests / apps) builds its
  * SparkSession, so semantics (UTC timezone, AQE, shuffle width) never depend
  * on the caller.
  *
  * Scale notes: `spark.sql.shuffle.partitions` is sized to the local core
  * count here; on a real cluster AQE coalesces/splits post-shuffle partitions
  * at runtime, so the static value is only an initial hint. Adaptive skew-join
  * handling is left enabled (default) for the 100 TB design point.
  */
object Sessions {
  def local(cpus: String, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      // The state-store maintenance interval is pinned JVM-wide by the
      // FIRST stateful query; a fixture that starts one outside
      // withRocksDbState's scoped conf would otherwise lock in the 60s
      // default and the maintenance thread races query teardown
      // (CANNOT_COMMIT / FileNotFoundException log noise). Set it at
      // session creation so every entrypoint gets the quiet interval
      // regardless of which query starts first (SparkSpec does the
      // same for test JVMs).
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "2h")
      // events.parquet stores TIMESTAMP(NANOS) which Spark 4 rejects by
      // default; read as long and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // InferFiltersFromGenerate adds `size(gen_input) > 0 AND
      // isnotnull(gen_input)` above every explode, and predicate pushdown
      // then substitutes the generator-input ALIAS with its full
      // expression tree below the projections — for HOF-built arrays
      // (token/gram/shingle pipelines) that re-evaluates the whole
      // interpreted lambda tree 2 extra times per row, measured 8× on the
      // decontamination gram explode. The empty-array skip it buys is
      // negligible at corpus scale; excluded engine-wide.
      .config("spark.sql.optimizer.excludedRules",
              "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
