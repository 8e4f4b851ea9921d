package graft.io

import org.apache.spark.sql.Dataset

/** S7/S8 — driver collect and console sinks (SURVEY.md §2.1).
  *
  * `show`/`describe` are the reference's eyeball-check surface
  * (`sst2_test2.py:45-47`, `qnli_test.py:117-118`); `collectRows` is the
  * explicit driver boundary — callers must only cross it with
  * already-aggregated (small) results. Nothing here belongs in a 100 TB
  * hot path; it exists so the engine's API surface matches the reference.
  */
object Console {

  /** S8: `df.show(n, truncate)` equivalent returning the rendered string
    * (testable; the reference prints to stdout).
    */
  def render(ds: Dataset[_], n: Int = 20, truncate: Int = 20): String = {
    val buf = new java.io.ByteArrayOutputStream()
    scala.Console.withOut(buf) { ds.show(n, truncate) }
    buf.toString("UTF-8")
  }

  def show(ds: Dataset[_], n: Int = 20, truncate: Int = 20): Unit =
    ds.show(n, truncate)

  /** S8: describe() — count/mean/stddev/min/max summary. */
  def describe(ds: Dataset[_], cols: String*): Dataset[_] =
    ds.describe(cols: _*)

  /** S7: the explicit driver-collect boundary. */
  def collectRows(ds: Dataset[_]): Array[_] = ds.collect()
}
