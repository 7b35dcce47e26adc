package graft

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

/** Co-located join via bucketed storage: both fact tables bucketed on the
  * join key with equal bucket counts → the join plans with NO Exchange on
  * either side (buckets are read pairwise). The write-once/reuse-forever
  * partitioning contract for 100 TB fact-fact joins. */
class BucketedJoinSpec extends AnyFunSuite with SparkFixture {

  test("bucketed fact-fact join runs without any shuffle exchange") {
    val orders = Tables.orders(spark, sf001)
    val lineitem = Tables.lineitem(spark, sf001)
    Bucketing.writeBucketed(orders, "b_orders", 8, "o_orderkey")
    Bucketing.writeBucketed(lineitem, "b_lineitem", 8, "l_orderkey")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), F.col("l_orderkey") === F.col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it is still correct
      val expected = lineitem.join(orders, F.col("l_orderkey") === F.col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
