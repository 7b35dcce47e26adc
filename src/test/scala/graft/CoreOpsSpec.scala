package graft

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftStream

/** Stateless core operators (reference: operators/map.rs, filter.rs,
  * filter_map.rs, flatten.rs, split.rs, cloned.rs; examples/
  * basic_operators.rs, split_streams.rs, cloned_streams.rs). */
class CoreOpsSpec extends AnyFunSuite with SparkFixture {

  private def nums = GraftStream(spark.range(0, 100).toDF("i"))

  test("map projects per row") {
    val out = nums.map(F.col("i"), (F.col("i") * 2).as("j")).toDF.collect()
    assert(out.length == 100)
    assert(out.forall(r => r.getLong(1) == r.getLong(0) * 2))
  }

  test("filter keeps matching rows and filterMap fuses") {
    assert(nums.filter(F.col("i") % 2 === 0).toDF.count() == 50)
    val fm = nums.filterMap(F.col("i") < 10, (F.col("i") + 1).as("j")).toDF.collect()
    assert(fm.map(_.getLong(0)).sorted.toSeq == (1L to 10L))
  }

  test("flatten explodes arrays, carrying kept columns") {
    val df = spark.range(0, 3).toDF("i")
      .withColumn("arr", F.array(F.col("i"), F.col("i") * 10))
    val out = GraftStream(df).flatten(F.col("arr"), "v", F.col("i")).toDF
    assert(out.count() == 6)
    assert(out.columns.toSeq == Seq("i", "v"))
  }

  test("split partitions rows; branches are disjoint and complete") {
    val (evens, odds) = nums.split(F.col("i") % 2 === 0)
    assert(evens.toDF.count() == 50 && odds.toDF.count() == 50)
    assert(evens.toDF.intersect(odds.toDF).count() == 0)
    assert(evens.union(odds).toDF.count() == 100)
  }

  test("cloned branches see the same rows") {
    val (a, b) = nums.cloned
    assert(a.toDF.exceptAll(b.toDF).count() == 0)
  }

  test("union merges by name") {
    val a = GraftStream(spark.range(0, 5).toDF("i").select(F.col("i"), F.lit("a").as("tag")))
    val b = GraftStream(spark.range(5, 8).toDF("i").select(F.lit("b").as("tag"), F.col("i")))
    assert(a.union(b).toDF.count() == 8) // unionByName handles column order
  }

  test("inspect is a pure pass-through") {
    val out = nums.inspect("m", F.count(F.lit(1)).as("n")).toDF
    assert(out.count() == 100)
  }

  test("inspectWith delivers observed metrics after the first action") {
    val (s, obs) = nums.inspectWith("core_obs", F.count(F.lit(1)).as("n"),
      F.sum(F.col("i")).as("total"))
    s.toDF.collect()
    val m = obs.get
    assert(m("n") == 100L && m("total") == 4950L)
  }

  test("materialize caches the plan for reuse; batch limitOutOfOrderness is a no-op") {
    val m = nums.mapColumn("j", F.col("i") * 3).materialize()
    assert(m.toDF.count() == 100)
    assert(m.toDF.storageLevel.useMemory)
    m.toDF.unpersist()
    val w = nums.mapColumn("ts", F.timestamp_seconds(F.col("i")))
      .limitOutOfOrderness("ts", "10 minutes") // batch: marker only
    assert(w.toDF.count() == 100)
  }

  test("keyLocal aggregation needs no explicit repartition") {
    val out = nums.mapColumn("k", F.col("i") % 3)
      .keyLocal(F.col("k")).agg(F.count(F.lit(1)).as("n")).toDF.collect()
    assert(out.map(_.getLong(1)).sum == 100)
  }

  test("keyDistribute hash-partitions on the key") {
    val keyed = nums.mapColumn("k", F.col("i") % 5).keyDistribute(F.col("k"))
    val out = keyed.agg(F.count(F.lit(1)).as("n")).toDF.collect()
    assert(out.length == 5 && out.forall(_.getLong(1) == 20))
  }

  test("langId classifies CJK text as zh (bare pattern, no \\b)") {
    import spark.implicits._
    val docs = Seq(
      (1, "这是一个中文文档，我们在这里写了很多的字。他说这不是问题。"),
      (2, "the quick brown fox jumps over the lazy dog and the cat"),
      (3, "der hund und die katze sind nicht auf der straße"),
      (4, "12345 67890 @@@ ###")).toDF("doc_id", "text")
    val out = docs.select(F.col("doc_id"),
      graft.functions.TextFunctions.langId(F.col("text")).as("lang"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == "zh", s"CJK doc must classify zh, got ${out(1)}")
    assert(out(2) == "en" && out(3) == "de" && out(4) == "und")
  }
}
