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
    import spark.implicits._
    // Typed source: primitive Array[Float] encodes as containsNull=false,
    // the only element shape the rewrite is allowed to fire on.
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet").limit(100)
      .select(F.col("vec_id"), F.col("embedding"))
      .as[(Long, Array[Float])].map(identity).toDF("vec_id", "embedding")
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

  test("RewriteDotProduct leaves nullable-element arrays alone") {
    import org.apache.spark.sql.{functions => F}
    // array(col, lit(null)) → containsNull=true: the HOF fold yields NULL
    // here while DotProductF would read garbage — the rule must not fire.
    val df = spark.range(3).select(
      F.array(F.col("id").cast("double"), F.lit(null).cast("double")).as("a"))
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = Seq(graft.plans.RewriteDotProduct)
      val q = df.select(VectorFunctions.dot(F.col("a"), F.col("a")).as("d"))
      assert(!q.queryExecution.optimizedPlan.toString.toLowerCase.contains("dotproductf"))
      assert(q.collect().forall(_.isNullAt(0)))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("DotProductF returns NULL on length mismatch (eval and codegen)") {
    VectorFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT graft_dot_f(array(CAST(1.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d").head()
    assert(r.isNullAt(0), "length mismatch must yield NULL, not a truncated dot")
  }

  test("graft_dot_f is callable from SQL after registration") {
    VectorFunctions.registerAll(spark)
    val v = spark.sql(
      "SELECT graft_dot_f(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(v == 1.5 * 2.0 + 2.0 * 3.0)
  }

  test("the full graft_* SQL surface is callable after registerAll") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT
        |  size(graft_shingles('a b c d', 3)) AS n_sh,
        |  size(graft_minhash_sigs(graft_shingles('a b c d', 3), 8)) AS n_sigs,
        |  graft_simhash('hello world') AS sh,
        |  graft_token_tf('x y x') AS tf,
        |  size(graft_winnow('abcdefghijklmnopqrstuvwxyz', 4, 5)) > 0 AS has_fp
        |""".stripMargin).head()
    assert(r.getInt(0) == 2)  // 4 tokens, 3-shingles -> 2
    assert(r.getInt(1) == 8)  // one signature per band
    assert(!r.isNullAt(2))
    val tf = r.getSeq[org.apache.spark.sql.Row](3)
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(tf == Map("x" -> 2L, "y" -> 1L))
    assert(r.getBoolean(4))
  }
}
