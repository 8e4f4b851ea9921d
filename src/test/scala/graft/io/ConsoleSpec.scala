package graft.io

import graft.SparkSpec

class ConsoleSpec extends SparkSpec {

  test("S8: render produces the tabular show output") {
    import spark.implicits._
    val s = Console.render(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    assert(s.contains("| id|"))
    assert(s.contains("|  1|  a|"))
  }

  test("S8: describe yields count/mean/stddev/min/max rows") {
    import spark.implicits._
    val d = Console.describe(Seq(1.0, 2.0, 3.0).toDF("x"), "x")
    val stats = d.collect()
      .map(_.asInstanceOf[org.apache.spark.sql.Row].getString(0)).toSet
    assert(stats == Set("count", "mean", "stddev", "min", "max"))
  }

  test("S7: collectRows returns all rows to the driver") {
    import spark.implicits._
    assert(Console.collectRows(Seq(1, 2, 3).toDF("x")).length == 3)
  }
}
