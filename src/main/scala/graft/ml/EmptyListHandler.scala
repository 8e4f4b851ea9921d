package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.{
  DefaultParamsReadable, DefaultParamsWritable, Identifiable
}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

/** U5 — the engine's custom-Transformer template (reference:
  * `qnli_test.py:23-49`, `EmptyListHandler(Transformer, HasInputCol,
  * HasOutputCol, DefaultParamsWritable, DefaultParamsReadable)`).
  *
  * Replaces an empty (or null) token array with `["unknown"]` so downstream
  * Word2Vec never sees a zero-length document. The U4 array-replace UDF of
  * the reference (`qnli_test.py:39-49`) is expressed here as a pure Catalyst
  * expression (`when(size(c) <= 0, array(lit))`) — null-safe, prunable, and
  * codegen-friendly; no UDF, so whole-stage codegen spans the transform.
  *
  * Persistence: `DefaultParamsWritable` + companion `DefaultParamsReadable`
  * give save/load round-trip inside a PipelineModel (tested in
  * EmptyListHandlerSpec).
  */
class EmptyListHandler(override val uid: String)
    extends Transformer with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("emptyListHandler"))

  final val inputCol: Param[String] =
    new Param[String](this, "inputCol", "input token array column")
  final val outputCol: Param[String] =
    new Param[String](this, "outputCol", "output token array column")
  final val fillToken: Param[String] =
    new Param[String](this, "fillToken", "token substituted for empty arrays")

  setDefault(fillToken -> "unknown")

  def setInputCol(v: String): this.type  = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setFillToken(v: String): this.type = set(fillToken, v)
  def getInputCol: String  = $(inputCol)
  def getOutputCol: String = $(outputCol)
  def getFillToken: String = $(fillToken)

  override def transform(ds: Dataset[_]): DataFrame = {
    transformSchema(ds.schema)
    val c = col($(inputCol))
    ds.withColumn(
      $(outputCol),
      when(c.isNull || size(c) === 0, array(lit($(fillToken)))).otherwise(c))
  }

  override def transformSchema(schema: StructType): StructType = {
    val in = schema($(inputCol))
    require(in.dataType.isInstanceOf[ArrayType] &&
              in.dataType.asInstanceOf[ArrayType].elementType == StringType,
            s"${$(inputCol)} must be array<string>, got ${in.dataType}")
    require(!schema.fieldNames.contains($(outputCol)),
            s"output column ${$(outputCol)} already exists")
    StructType(
      schema.fields :+
        StructField($(outputCol), ArrayType(StringType, true), nullable = false))
  }

  override def copy(extra: ParamMap): EmptyListHandler = defaultCopy(extra)
}

object EmptyListHandler extends DefaultParamsReadable[EmptyListHandler] {
  override def load(path: String): EmptyListHandler = super.load(path)
}
