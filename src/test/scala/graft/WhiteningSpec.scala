package graft

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.Whitening

/** PCA whitening pins: the Jacobi eigensolver on a hand case, the
  * defining covariance-identity property of the whitened cloud, and the
  * bit-exact refit the DECIMAL moment sums + fixed sweep order buy. */
class WhiteningSpec extends AnyFunSuite with SparkFixture {

  test("jacobiEigen: hand-computed 2x2 eigensystem, orthonormal vectors") {
    val (vals, vecs) = Whitening.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(vals.sorted.zip(Seq(1.0, 3.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 },
      s"eigvals ${vals.toSeq}")
    // Columns orthonormal.
    def dot(a: Int, b: Int) = vecs(0)(a) * vecs(0)(b) + vecs(1)(a) * vecs(1)(b)
    assert(math.abs(dot(0, 0) - 1) < 1e-12 && math.abs(dot(1, 1) - 1) < 1e-12)
    assert(math.abs(dot(0, 1)) < 1e-12)
  }

  test("whitened corpus has identity covariance and zero mean") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val model = Whitening.fit(emb)
    assert(model.eigvals.zip(model.eigvals.tail).forall { case (a, b) => a >= b },
      "eigenvalues must be descending")
    val y = Whitening.transform(emb, model).collect()
      .map(_.getSeq[Double](1).toArray)
    val n = y.length.toDouble
    val dim = y.head.length
    // Mean ~ 0 and covariance ~ I — the DEFINITION of whitening; eps on
    // well-conditioned data keeps the diagonal within float noise of 1.
    var i = 0
    while (i < dim) {
      val mu = y.map(_(i)).sum / n
      assert(math.abs(mu) < 1e-8, s"dim $i mean $mu")
      var j = i
      while (j < dim) {
        val cov = y.map(v => v(i) * v(j)).sum / n - 0.0
        val want = if (i == j) 1.0 else 0.0
        assert(math.abs(cov - want) < 1e-6, s"cov($i,$j) = $cov")
        j += 1
      }
      i += 1
    }
  }

  test("fitSampled: sample >= corpus degrades to the exact fit; bounded sample still whitens") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val full = Whitening.fit(emb)
    val same = Whitening.fitSampled(emb, sampleN = 1 << 20)
    assert(same.mean.toSeq == full.mean.toSeq &&
      same.w.map(_.toSeq).toSeq == full.w.map(_.toSeq).toSeq)
    // A 1024-vector sample fit (16x the dimension — covariance
    // estimation needs n >> dim; at n = 2·dim the smallest sample
    // eigenvalues collapse and their whitened variances explode, measured
    // 6.4 with 128) still roughly whitens the corpus.
    val m = Whitening.fitSampled(emb, sampleN = 1024)
    val y = Whitening.transform(emb, m).collect().map(_.getSeq[Double](1).toArray)
    val n = y.length.toDouble
    val worst = (0 until m.mean.length).map { i =>
      math.abs(y.map(v => v(i) * v(i)).sum / n - 1.0)
    }.max
    info(f"worst per-dim |var-1| with a 128-vector sample fit: $worst%.3f")
    assert(worst < 1.0, s"sample fit failed to whiten: worst |var-1| = $worst")
  }

  test("refit is bit-for-bit identical") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val a = Whitening.fit(emb)
    val b = Whitening.fit(emb)
    assert(a.mean.toSeq == b.mean.toSeq)
    assert(a.eigvals.toSeq == b.eigvals.toSeq)
    assert(a.w.map(_.toSeq).toSeq == b.w.map(_.toSeq).toSeq)
  }

  test("sampled refit is bit-for-bit identical (the registered gate's path)") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val a = Whitening.fitSampled(emb, sampleN = 4096)
    val b = Whitening.fitSampled(emb, sampleN = 4096)
    assert(a.mean.toSeq == b.mean.toSeq)
    assert(a.eigvals.toSeq == b.eigvals.toSeq)
    assert(a.w.map(_.toSeq).toSeq == b.w.map(_.toSeq).toSeq)
  }
}
