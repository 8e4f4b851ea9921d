package graft

/** Guards the driver contract: no silent key collisions when the query
  * maps merge, every oracle refers to a real query, every bench name
  * resolves, and query names stay unique and well-formed.
  */
class ContractSpec extends SparkSpec {
  import graft.operators._

  test("query maps merge without key collisions") {
    val parts = Seq(
      RelationalQueries.queries, ScalarQueries.queries,
      MlQueries.queries, LlmQueries.queries, TimeSeriesQueries.queries)
    assert(parts.map(_.size).sum == SparkEntry.queries.size,
           "duplicate query name across operator modules")
  }

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every benchQueries name resolves and is duplicate-free") {
    val missing = SparkEntry.benchQueries.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"bench names missing from queries: $missing")
    assert(SparkEntry.benchQueries.distinct.size ==
      SparkEntry.benchQueries.size)
  }

  test("query names follow the qNN_snake_case convention") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("q\\d+_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming names: $bad")
  }

  test("entry() smoke: flagship query yields rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q50-q53 pinned self-oracles: emitted for golden sf dirs after " +
       "the pipeline runs, omitted (rows-only) for unknown dirs") {
    // run ONE pipeline query against an unknown dir → the stashed dir
    // has no golden and the four entries must be absent
    val scratch = tmpDir("goldens")
    graft.sources.Tables.documents(spark, sf0001).limit(50)
      .write.mode("overwrite").parquet(s"$scratch/documents.parquet")
    MlQueries.queries("q53_batch_infer")(spark, scratch).count()
    assert(!MlQueries.oracleSql.contains("q53_batch_infer"),
           "unknown sf dir must fall back to the rows-only check")
    // run against the pinned sf0.001 dir → all four goldens emitted,
    // clearly labeled
    MlQueries.queries("q53_batch_infer")(spark, sf0001).count()
    val o = MlQueries.oracleSql
    Seq("q50_sst2_pipeline", "q51_qqp_pipeline", "q52_qnli_pipeline",
        "q53_batch_infer").foreach { q =>
      assert(o.contains(q), s"$q golden missing for sf0.001")
      assert(o(q).contains("pinned self-oracle"),
             s"$q golden must be labeled as a self-oracle")
    }
  }

  // Round-6 postmortem: a bare integer sum() in oracle SQL binds as
  // HUGEINT in DuckDB and hash-mismatches at the driver even when the
  // values are numerically identical (q103/q104/q108/q110/q111). The
  // local row compare coerces int128 to Python int and cannot see it —
  // only a DESCRIBE-level typecheck can. Cancels (not fails) where the
  // local python/duckdb harness is unavailable.
  test("oracle SQL binds with no driver-unhashable HUGEINT columns") {
    import scala.sys.process._
    val probe = Process(Seq("python3", "-c", "import duckdb")).!(
      ProcessLogger(_ => (), _ => ()))
    assume(probe == 0, "python3+duckdb not available in this environment")
    // Materialize the runtime-captured oracle literals (IVF centroids,
    // BPE merges) exactly as Verify would before dumping the JSON.
    Seq("q45_ann_ivf", "q88_semantic_dedup", "q101_bpe_tokens",
        "q59_pack_stats", "q148_ann_recall_multi", "q152_ivf_roll",
        "q160_semantic_decon_ivf", "q166_unigram_segment",
        "q168_pq_ann", "q169_pq_roll", "q170_tokenizer_compare",
        "q174_ivf_pq_ann", "q177_streaming_pq_encode",
        "q283_estate_erasure")
      .foreach(n => SparkEntry.queries(n)(spark, sf0001).count())
    val tmp = java.nio.file.Files.createTempFile("oracle_sql", ".json")
    java.nio.file.Files.writeString(tmp, Verify.oracleJson())
    val out = new StringBuilder
    val rc = Process(Seq("python3", "tools/compare_oracle.py",
                         "--typecheck", sf0001, tmp.toString)).!(
      ProcessLogger(l => out.append(l).append('\n'),
                    l => out.append(l).append('\n')))
    java.nio.file.Files.deleteIfExists(tmp)
    assert(rc == 0, s"oracle typecheck failed:\n$out")
  }
}
