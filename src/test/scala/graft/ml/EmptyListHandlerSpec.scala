package graft.ml

import graft.SparkSpec
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.sql.types._

class EmptyListHandlerSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq((1L, Seq("a", "b")), (2L, Seq.empty[String]))
      .toDF("id", "toks")
  }

  test("U5: transform fills empty arrays with the fill token") {
    val h = new EmptyListHandler()
      .setInputCol("toks").setOutputCol("out").setFillToken("unk")
    val rows = h.transform(fixture).orderBy("id").collect()
    assert(rows(0).getSeq[String](2) == Seq("a", "b"))
    assert(rows(1).getSeq[String](2) == Seq("unk"))
  }

  test("U5: transformSchema appends array<string> and rejects bad input") {
    val h = new EmptyListHandler().setInputCol("toks").setOutputCol("out")
    val out = h.transformSchema(fixture.schema)
    assert(out("out").dataType == ArrayType(StringType, true))
    val bad = StructType(Seq(StructField("toks", IntegerType)))
    intercept[IllegalArgumentException](h.transformSchema(bad))
  }

  test("U5: DefaultParams persistence round-trip standalone and in a PipelineModel") {
    val h = new EmptyListHandler()
      .setInputCol("toks").setOutputCol("out").setFillToken("zz")
    val p1 = tmpDir("elh") + "/m"
    h.write.overwrite().save(p1)
    val loaded = EmptyListHandler.load(p1)
    assert(loaded.getInputCol == "toks" && loaded.getFillToken == "zz")
    assert(loaded.transform(fixture).orderBy("id").collect().toSeq ==
      h.transform(fixture).orderBy("id").collect().toSeq)

    // S5 sink/source contract through Pipeline persistence
    val pm = new Pipeline().setStages(Array(h)).fit(fixture)
    val p2 = tmpDir("elhp") + "/pm"
    pm.write.overwrite().save(p2)
    val pmLoaded = PipelineModel.load(p2)
    assert(pmLoaded.transform(fixture).orderBy("id").collect().toSeq ==
      pm.transform(fixture).orderBy("id").collect().toSeq)
  }
}
