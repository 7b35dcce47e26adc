package graft

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.{Ann, Pq}
import graft.functions.VectorFunctions

/** Recall gates for the APPROXIMATE ANN tiers against exact brute force —
  * the quality half of the ANN contract (the oracle queries pin hash-exact
  * determinism; these pin that the approximation is still a good ANN).
  * LSH has had a planted-near-dup recall spec since round 5; IVF and PQ
  * get the same protection here, on the sf0.1 embeddings (2000 vectors,
  * the bench corpus) so a probe/tie-break/rerank regression — exactly the
  * class of change round 12's IVF probe fix was — trips a hard assertion.
  *
  * Thresholds are measured-with-margin: see each test's `info` line for
  * the observed value on the current generator; the assert sits far enough
  * below to absorb data-refresh jitter but well above a broken variant
  * (a wrong probe set or rerank order collapses recall toward 1/cells or
  * the ADC floor, not a few points).
  */
class AnnRecallSpec extends AnyFunSuite with SparkFixture {

  private def sf01 = "/root/testdata/sf0.1"

  private def truthAt(k: Int): Map[Long, Set[Long]] = {
    val emb = spark.read.parquet(s"$sf01/embeddings.parquet")
    val q = emb.filter(F.col("vec_id") < 20)
    Ann.bruteTopK(emb, q, k = k, native = true).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  private def recallOf(result: Array[(Long, Long)], truth: Map[Long, Set[Long]], k: Int): Double = {
    val byQ = result.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val per = truth.map { case (q, t) => (byQ.getOrElse(q, Set.empty) & t).size.toDouble / k }
    per.sum / per.size
  }

  test("IVF recall@10 vs brute force stays above the gate") {
    VectorFunctions.registerAll(spark)
    val emb = spark.read.parquet(s"$sf01/embeddings.parquet")
    val q = emb.filter(F.col("vec_id") < 20)
    val truth = truthAt(10)
    assert(truth.size == 20, s"expected 20 query rows, got ${truth.size}")
    val ivf = Ann.ivfTopK(emb, q, k = 10, cells = 16, probes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val recall = recallOf(ivf, truth, 10)
    info(f"IVF recall@10 (cells=16, probes=4): $recall%.3f")
    // Measured 0.810 on the current generator; a broken probe set or cell
    // assignment collapses toward probes/cells = 0.25, far below the gate.
    assert(recall >= 0.75,
      f"IVF recall@10 dropped to $recall%.3f — probe selection or cell assignment regressed")
  }

  test("PQ+rerank recall@10 vs brute force stays above the gate") {
    VectorFunctions.registerAll(spark)
    val emb = spark.read.parquet(s"$sf01/embeddings.parquet")
    val q = emb.filter(F.col("vec_id") < 20)
    val truth = truthAt(10)
    val pq = Pq.topK(emb, q, k = 10) // production defaults, incl. rerank=200
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val recall = recallOf(pq, truth, 10)
    info(f"PQ recall@10 (subspaces=8, codebook=16, rerank=200): $recall%.3f")
    // Measured 0.805 at rerank=200 (0.510 at the old rerank=50 default —
    // the sweep that moved the default); ADC collapse lands near the
    // random-cut floor rerank/|corpus| = 0.1.
    assert(recall >= 0.70,
      f"PQ recall@10 dropped to $recall%.3f — ADC scoring or the rerank stage regressed")
  }
}
