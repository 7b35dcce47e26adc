package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** SQL-surface integration: injected/registered functions usable from
  * spark.sql text. */
class ExtensionsSpec extends AnyFunSuite with SparkFixture {

  test("GraftExtensions injects without error") {
    new GraftExtensions().apply(new SparkSessionExtensions) // builder wiring
  }

  test("graft_dot_f is callable from SQL after registration") {
    VectorFunctions.registerAll(spark)
    val v = spark.sql(
      "SELECT graft_dot_f(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(v == 1.5 * 2.0 + 2.0 * 3.0)
  }
}
