package graft

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Components
import graft.functions.TfIdf
import graft.operators.Sampling

/** Round-6 pipeline operators: connected-components dedup clustering,
  * deterministic sampling, TF-IDF keyword scoring. */
class PipelineOpsSpec extends AnyFunSuite with SparkFixture {

  test("connectedComponents labels every node with its component minimum") {
    import spark.implicits._
    // components: {1,2,3,4} (path), {10,11}, and a 6-node chain {20..25}
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L), (24L, 25L)
    ).toDF("doc_a", "doc_b")
    val got = Components.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L, 24L -> 20L, 25L -> 20L)
    assert(got == want)
  }

  test("connectedComponents fails fast instead of returning a partial clustering") {
    import spark.implicits._
    val chain = (0L until 6L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalArgumentException] {
      Components.connectedComponents(chain, maxIter = 2).collect()
    }
  }

  test("deterministic sample is repartition-stable and rate-plausible") {
    val ev = Tables.events(spark, sf001)
    val a = Sampling.deterministicSample(ev, "event_id", "40")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(ev.repartition(7), "event_id", "40")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample changed under repartitioning")
    val rate = a.size.toDouble / ev.count()
    assert(rate > 0.15 && rate < 0.35, s"expected ~25% of rows, got $rate")
  }

  test("stratifiedSample applies per-stratum rates and drops unknown strata") {
    val ev = Tables.events(spark, sf001)
    val out = Sampling.stratifiedSample(ev, "event_type", "event_id",
      Map("click" -> "ff", "view" -> "20"))
    val byType = out.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.keySet == Set("click", "view"))
    val clicks = ev.filter(F.col("event_type") === "click").count()
    assert(byType("click") > clicks * 9 / 10, "rate ff should keep ~all clicks")
    val views = ev.filter(F.col("event_type") === "view").count()
    assert(byType("view") < views / 2, "rate 20 should keep ~12.5% of views")
  }

  test("tfidf ranks a document's distinctive token above corpus-wide ones") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the dog sat on the log"),
      (2L, "the bird sat on the wire")
    ).toDF("doc_id", "text")
    val top = TfIdf.topKeywords(docs, 3L, k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // 'the/sat/on' appear everywhere (idf = ln(1) = 0); the unique nouns win
    assert(top(0L) == "cat" || top(0L) == "mat")
    assert(top(1L) == "dog" || top(1L) == "log")
    assert(top(2L) == "bird" || top(2L) == "wire")
  }
}
