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

  test("RewriteDotProduct turns the portable HOF pattern into DotProductF") {
    import org.apache.spark.sql.{functions => F}
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet").limit(100)
    val portable = emb.select(
      F.col("vec_id"),
      VectorFunctions.dot(F.col("embedding"), F.col("embedding")).as("d"))
    val before = portable.queryExecution.optimizedPlan.toString
    assert(!before.toLowerCase.contains("dotproductf") && before.contains("aggregate"))
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = Seq(graft.plans.RewriteDotProduct)
      val rewritten = emb.select(
        F.col("vec_id"),
        VectorFunctions.dot(F.col("embedding"), F.col("embedding")).as("d"))
      assert(rewritten.queryExecution.optimizedPlan.toString.toLowerCase.contains("dotproductf"),
        "optimizer rule did not fire")
      // bit-identical results (same left-fold accumulation)
      val a = portable.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val b = rewritten.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(a == b)
    } finally spark.experimental.extraOptimizations = prev
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
