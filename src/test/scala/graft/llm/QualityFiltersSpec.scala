package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityFiltersSpec extends SparkSpec {

  test("repetition profile: duplicate lines and top-2-gram fractions on planted docs") {
    import spark.implicits._
    val docs = Seq(
      // 4 lines, "same line" 3× → dup_line_frac = 1 - 2/4 = 0.5
      (1L, "same line\nsame line\nsame line\nunique tail"),
      // no repetition at all
      (2L, "alpha beta\ngamma delta"),
      // "spam spam" 2-gram repeated heavily
      (3L, "spam spam spam spam spam spam"),
      (4L, ""),
      (5L, "one line only")).toDF("doc_id", "text")
    val out = QualityFilters.repetitionProfile(docs, "text")
      .select("doc_id", "dup_line_frac", "dup_line_char_frac",
              "top_2gram_char_frac")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap

    assert(out(1L)._1 == 0.5)
    // duplicate-line chars: 3 × len("same line")=9 → 27 of 27+11=38
    assert(math.abs(out(1L)._2 - 27.0 / 38.0) < 1e-3)
    assert(out(2L)._1 == 0.0 && out(2L)._2 == 0.0)
    // "spam spam" occurs 5× as a 2-gram, len 9, text len 29 → capped ≤ 1
    assert(out(3L)._3 == 1.0)
    assert(out(4L) == ((0.0, 0.0, 0.0)))
    assert(out(5L)._1 == 0.0)
  }

  test("PII masking replaces emails, URLs, IPs; counts match") {
    import spark.implicits._
    val df = Seq(
      "write to alice.smith+tag@sub.example.co.uk today",
      "docs at https://spark.apache.org/docs/latest?x=1 and http://a.b/c",
      "server 10.0.0.1 and 192.168.255.254 up",
      "no pii here at all").toDF("t")
    val masked = df.select(QualityFilters.maskPii(col("t")).as("m"))
      .collect().map(_.getString(0))
    assert(masked(0) == "write to <EMAIL> today")
    assert(masked(1) == "docs at <URL> and <URL>")
    assert(masked(2) == "server <IP> and <IP> up")
    assert(masked(3) == "no pii here at all")
    val (em, ur, ip) = QualityFilters.piiCounts(col("t"))
    val counts = df.select(em, ur, ip).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(counts.toSeq == Seq((1, 0, 0), (0, 2, 0), (0, 0, 2), (0, 0, 0)))
  }

  test("hash sampling is deterministic, content-stable, and near the target rate") {
    import spark.implicits._
    val df = (0L until 10000L).toDF("id")
    val kept = df.filter(QualityFilters.hashSampleFlag(col("id"), "3333"))
      .collect().map(_.getLong(0)).toSet
    // 0x3333/0x10000 ≈ 20%: binomial(10000, .2) stays well inside ±3%
    assert(kept.size > 1700 && kept.size < 2300, s"rate ${kept.size / 10000.0}")
    val kept2 = df.filter(QualityFilters.hashSampleFlag(col("id"), "3333"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == kept2)
    // membership is per-key content, not per-run: a disjoint frame keeps
    // exactly the overlapping keys
    val sub = (5000L until 15000L).toDF("id")
      .filter(QualityFilters.hashSampleFlag(col("id"), "3333"))
      .collect().map(_.getLong(0)).toSet
    assert((sub.filter(_ < 10000L)) == kept.filter(_ >= 5000L))
  }
}
