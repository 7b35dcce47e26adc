package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Connected components over a near-duplicate pair graph — the clustering
  * step of a dedup pipeline: LSH candidates → verified near-dup pairs →
  * components → one canonical survivor per component (the min id).
  *
  * Implementation: iterative min-label propagation. Each round every node
  * takes the minimum of its own label and its neighbors' labels — one
  * shuffle join + one aggregation per round, all map-side-combinable.
  * Labels decrease monotonically, so the label SUM is a convergence
  * certificate: unchanged sum ⇔ fixpoint. Rounds needed = eccentricity of
  * each component's min node; near-dup clusters are small and dense
  * (a handful of rounds). For adversarial graphs (long paths) at the
  * 100 TB tier, the standard upgrade is the large-star/small-star
  * alternation (Kiveris et al., "Connected Components in MapReduce"),
  * which converges in O(log² n) rounds with the same per-round join
  * shape; the propagation loop below is the right default for dedup
  * graphs, whose diameter is bounded by cluster size.
  */
object Components {

  /** (id, cluster_id) for every node of `edges`, where cluster_id is the
    * smallest node id in the component. Nodes appear only if they occur in
    * an edge (singleton docs are their own trivial cluster — join back
    * against the corpus for survivor selection). Fails fast if `maxIter`
    * rounds do not reach the fixpoint rather than returning a partial
    * clustering.
    *
    * Adaptive execution: a VERIFIED near-dup pair graph is a vanishing
    * fraction of the corpus (dup pairs, not documents), so when the edge
    * count is at most `smallGraphEdges` the clustering runs as a driver
    * union-find over one bounded collect — the same bounded-index-build
    * pattern as IVF centroid training, replacing a dozen iterative jobs
    * with one. Larger graphs (the 100 TB tier: billions of pairs) take
    * the distributed propagation loop. Both paths produce identical
    * labels (spec'd against each other). */
  def connectedComponents(edges: DataFrame, srcCol: String = "doc_a",
                          dstCol: String = "doc_b", maxIter: Int = 50,
                          smallGraphEdges: Long = 1000000L): DataFrame = {
    val pairs = edges
      .select(F.col(srcCol).cast("long").as("src"), F.col(dstCol).cast("long").as("dst"))
      .persist()
    val edgeCount = pairs.count()
    val out =
      if (edgeCount <= smallGraphEdges) unionFindLocal(pairs)
      else propagateDistributed(pairs, maxIter)
    pairs.unpersist()
    out
  }

  /** Bounded driver union-find (path compression + union by min label):
    * O(edges · α) on one core, one collect of at most `smallGraphEdges`
    * pairs of longs. */
  private def unionFindLocal(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val es = pairs.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // union by MIN root so the label is the component min
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val labels = parent.keys.toArray.sorted.map(id => (id, find(id)))
    spark.createDataset(labels.toSeq)
      .toDF("doc_id", "cluster_id")
      .repartition(spark.sparkContext.defaultParallelism)
  }

  /** Distributed min-label propagation (see object doc). */
  private def propagateDistributed(edges: DataFrame, maxIter: Int): DataFrame = {
    val sym = edges
      .union(edges.select(F.col("dst").as("src"), F.col("src").as("dst")))
      .persist()
    sym.count()

    def labelSum(labels: DataFrame): java.math.BigDecimal =
      labels.agg(F.sum(F.col("lbl").cast("decimal(38,0)")).as("s")).head().getDecimal(0)

    var labels = sym.select(F.col("src").as("id")).distinct()
      .select(F.col("id"), F.col("id").as("lbl"))
      .persist()
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // every node of sym has >= 1 neighbor, so the inner join keeps all ids
      val nbr = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(F.col("src").as("id"))
        .agg(F.min(F.col("lbl")).as("nlbl"))
      val next = labels.withColumnRenamed("lbl", "olbl")
        .join(nbr, "id")
        .select(F.col("id"), F.least(F.col("olbl"), F.col("nlbl")).as("lbl"))
        .persist()
      val s = labelSum(next)
      labels.unpersist()
      labels = next
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    sym.unpersist()
    labels.select(F.col("id").as("doc_id"), F.col("lbl").as("cluster_id"))
  }
}
