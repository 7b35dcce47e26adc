package graft.ann

import org.apache.spark.sql.{DataFrame, functions => F}

/** PCA whitening of an embedding corpus — the classic preprocessing for
  * the quantization/serving tier (Jégou & Chum ECCV 2012 showed PCA +
  * whitening fixes product-quantizer co-occurrence bias; Su et al. 2021
  * applied the same to sentence embeddings): rotate onto the principal
  * axes and scale each to unit variance, so downstream PQ/SQ8/IVF cells
  * see an isotropic cloud.
  *
  * Determinism contract (retrain = bit-for-bit): second moments and
  * means accumulate as DECIMAL(38,18) sums (order-free across any
  * partitioning), and the 64×64 eigendecomposition is a driver-side
  * cyclic Jacobi sweep with a fixed rotation order and threshold — no
  * randomness anywhere, so the model is a pure function of the data.
  *
  * Scale shape: ONE aggregation over the corpus for all dim·(dim+1)/2 +
  * dim moment cells (map-side combinable; the shuffle carries ≤ 4160
  * tiny rows at dim 64, never vectors), a driver-side O(dim³) eigen
  * solve (64³ ≈ 260k flops — trivially driver-bounded, the
  * trainCentroids state class), then a zero-shuffle projection scan with
  * the whitening matrix riding the closure.
  */
object Whitening {

  /** Trained model: per-dim mean, eigenvalues (descending), and the
    * whitening matrix W (rows = Λ^(−1/2)·Qᵀ) — y = W(x − μ). */
  final case class Model(mean: Array[Double], eigvals: Array[Double],
                         w: Array[Array[Double]]) extends Serializable

  /** Fit on an `embCol` of array<float|double>. `eps` regularizes
    * near-zero eigenvalues (the standard whitening guard). */
  def fit(emb: DataFrame, embCol: String = "embedding",
          eps: Double = 1e-9): Model = {
    val x = emb.select(F.col(embCol).cast("array<double>").as("x"))
      .filter(F.col("x").isNotNull)
    val pairs = x
      .select(F.col("x"), F.posexplode(F.col("x")).as(Seq("i", "xi")))
      // symmetric: GENERATE only the upper triangle (slice from i) —
      // half the exploded rows and decimal casts of a full j-explode.
      .select(F.col("i"), F.col("xi"),
        F.posexplode(F.slice(F.col("x"), F.col("i") + 1,
          F.size(F.col("x")) - F.col("i"))).as(Seq("dj", "xj")))
      .select(F.col("i"), (F.col("i") + F.col("dj")).as("j"),
        F.col("xi"), F.col("xj"))
      .groupBy("i", "j")
      .agg(F.sum((F.col("xi") * F.col("xj")).cast("decimal(38,18)")).as("sxx"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDecimal(2).doubleValue()))
    val m1 = x.select(F.posexplode(F.col("x")).as(Seq("i", "xi")))
      .groupBy("i")
      .agg(F.sum(F.col("xi").cast("decimal(38,18)")).as("sx"),
        F.count(F.lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getDecimal(1).doubleValue(), r.getLong(2)))
    require(m1.nonEmpty, "empty embedding corpus")
    val dim = m1.map(_._1).max + 1
    val n = m1.head._3.toDouble
    val mean = new Array[Double](dim)
    m1.foreach { case (i, sx, _) => mean(i) = sx / n }
    val c = Array.ofDim[Double](dim, dim)
    pairs.foreach { case (i, j, sxx) =>
      val cov = sxx / n - mean(i) * mean(j)
      c(i)(j) = cov; c(j)(i) = cov
    }
    val (vals, vecs) = jacobiEigen(c)
    // Sort eigenpairs by value DESC (ties: lower original index first).
    val order = vals.indices.sortBy(k => (-vals(k), k))
    val eig = order.map(vals(_)).toArray
    val w = Array.tabulate(dim, dim) { (r, cIdx) =>
      val k = order(r)
      vecs(cIdx)(k) / math.sqrt(math.max(eig(r), 0.0) + eps)
    }
    Model(mean, eig, w)
  }

  /** [[fit]] on a bounded md5-uniform sample — the 100 TB path (the
    * trainCentroids/ivfReindex sampling rule: ORDER BY md5(id) LIMIT n
    * is a TakeOrdered cut, sees shifted data, deterministic): covariance
    * estimation converges at O(dim/√n), so a few thousand vectors pin
    * the whitening matrix and the full corpus pays only the projection
    * scan. `sampleN` ≥ corpus degrades to the exact [[fit]]. */
  def fitSampled(emb: DataFrame, idCol: String = "vec_id",
                 embCol: String = "embedding", sampleN: Int = 4096,
                 eps: Double = 1e-9): Model = {
    require(sampleN >= 2, s"sampleN must be >= 2, got $sampleN")
    fit(emb.orderBy(F.md5(F.col(idCol).cast("string")).asc).limit(sampleN),
      embCol, eps)
  }

  /** Cyclic Jacobi for a symmetric matrix: returns (eigenvalues,
    * eigenvectors as COLUMNS). Fixed (p,q) sweep order and a fixed
    * convergence threshold — deterministic. */
  private[graft] def jacobiEigen(a0: Array[Array[Double]],
                               maxSweeps: Int = 64,
                               tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > tol) {
      off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val cth = 1.0 / math.sqrt(t * t + 1.0)
            val sth = t * cth
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = cth * akp - sth * akq
              a(k)(q) = sth * akp + cth * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = cth * apk - sth * aqk
              a(q)(k) = sth * apk + cth * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = cth * vkp - sth * vkq
              v(k)(q) = sth * vkp + cth * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { off = math.max(off, math.abs(a(i)(j))); j += 1 }
        i += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Project every vector: y = W(x − μ). Zero-shuffle scan; the model
    * rides the closure (dim² doubles — the broadcast-centroids class). */
  def transform(emb: DataFrame, model: Model, idCol: String = "vec_id",
                embCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val dim = model.mean.length
    emb.select(F.col(idCol).cast("long"),
        F.col(embCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (id, x) =>
        require(x.length == dim, s"vector $id has ${x.length} dims, model has $dim")
        val y = new Array[Double](dim)
        var r = 0
        while (r < dim) {
          var s = 0.0
          var i = 0
          while (i < dim) { s += model.w(r)(i) * (x(i) - model.mean(i)); i += 1 }
          y(r) = s
          r += 1
        }
        (id, y)
      }
      .toDF(idCol, "white")
  }
}
