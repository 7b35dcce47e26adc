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
    * near-zero eigenvalues (the standard whitening guard).
    *
    * Moment accumulation is ONE mapPartitions fold into per-partition
    * BigDecimal partials (each x_i·x_j product rounded to scale 18
    * half-up — the decimal(38,18) cast rule — then summed exactly), so
    * the result is order-free across any partitioning while the job
    * shuffles exactly numPartitions partial rows. The r17 shape
    * posexploded the upper triangle through a decimal hash-agg —
    * n·d·(d+1)/2 exchange-side rows (8.5M at sf0.1) for the same ≤ 2144
    * cells, 5 of the bench's 6 whitening seconds. */
  def fit(emb: DataFrame, embCol: String = "embedding",
          eps: Double = 1e-9): Model = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val spark = emb.sparkSession
    import spark.implicits._
    val xs = emb.select(F.col(embCol).cast("array<double>").as("x"))
      .filter(F.col("x").isNotNull)
      .as[Array[Double]]
    // (n, sum_x per dim, sum_xx upper triangle row-major) — BigDecimal
    // addition is exact, so the cross-partition combine order is free.
    val partials = xs.rdd.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val first = it.next()
        val d = first.length
        val s1 = Array.fill(d)(JBD.ZERO)
        val s2 = Array.fill(d * (d + 1) / 2)(JBD.ZERO)
        var n = 0L
        def add(x: Array[Double]): Unit = {
          require(x.length == d, s"vector has ${x.length} dims, expected $d")
          var i = 0
          var t = 0
          while (i < d) {
            s1(i) = s1(i).add(JBD.valueOf(x(i)).setScale(18, RoundingMode.HALF_UP))
            var j = i
            while (j < d) {
              s2(t) = s2(t).add(
                JBD.valueOf(x(i) * x(j)).setScale(18, RoundingMode.HALF_UP))
              t += 1; j += 1
            }
            i += 1
          }
          n += 1
        }
        add(first)
        it.foreach(add)
        Iterator.single((n, s1, s2))
      }
    }.collect()
    require(partials.nonEmpty, "empty embedding corpus")
    val dim = partials.head._2.length
    partials.foreach(p => require(p._2.length == dim,
      s"mixed dims across partitions: ${p._2.length} vs $dim"))
    val n = partials.map(_._1).sum.toDouble
    val s1 = Array.fill(dim)(JBD.ZERO)
    val s2 = Array.fill(dim * (dim + 1) / 2)(JBD.ZERO)
    partials.foreach { case (_, p1, p2) =>
      var i = 0
      while (i < dim) { s1(i) = s1(i).add(p1(i)); i += 1 }
      var t = 0
      while (t < s2.length) { s2(t) = s2(t).add(p2(t)); t += 1 }
    }
    val mean = Array.tabulate(dim)(i => s1(i).doubleValue() / n)
    val c = Array.ofDim[Double](dim, dim)
    var t = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val cov = s2(t).doubleValue() / n - mean(i) * mean(j)
        c(i)(j) = cov; c(j)(i) = cov
        t += 1; j += 1
      }
      i += 1
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
    // GlobalLimit leaves ONE partition; re-spread the bounded sample so
    // the moment fold parallelizes (the fold is order-free, so the
    // partitioning is free to change).
    fit(emb.orderBy(F.md5(F.col(idCol).cast("string")).asc).limit(sampleN)
      .repartition(emb.sparkSession.sparkContext.defaultParallelism),
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
