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
    // Drop null-id edges up front so BOTH paths see the same graph: the
    // driver union-find would crash decoding null into a primitive Long
    // while the distributed joins would silently drop the rows — same
    // input, crash vs divergent clustering depending only on edge count.
    val pairs = edges
      .select(F.col(srcCol).cast("long").as("src"), F.col(dstCol).cast("long").as("dst"))
      .filter(F.col("src").isNotNull && F.col("dst").isNotNull)
      .persist()
    try {
      val edgeCount = pairs.count()
      if (edgeCount <= smallGraphEdges) unionFindLocal(pairs)
      else propagateDistributed(pairs, maxIter)
    } finally pairs.unpersist() // incl. the non-convergence require path
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

  /** Connected components in O(log² n) rounds via the alternating
    * large-star / small-star operations (Kiveris et al., "Connected
    * Components in MapReduce and Beyond") — the adversarial-graph path:
    * min-label propagation needs O(diameter) rounds, so a long path
    * graph (a chain of near-identical shingled documents, say) degrades
    * it to hundreds of shuffles, while star contraction halves structure
    * every couple of rounds regardless of shape.
    *
    * Each round is two groupBy-min aggregations + joins over the current
    * edge set, all map-side combinable; the edge set only shrinks toward
    * the final star forest (every node → its component min). Output
    * matches [[connectedComponents]] exactly (property-tested against
    * union-find on random and pathological graphs). */
  def connectedComponentsStars(edges: DataFrame, srcCol: String = "doc_a",
                               dstCol: String = "doc_b", maxIter: Int = 40): DataFrame = {
    val spark = edges.sparkSession

    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.union(e.select(F.col("dst").as("src"), F.col("src").as("dst")))
      val m = nbrs.groupBy("src").agg(F.min("dst").as("md"))
        .select(F.col("src"), F.least(F.col("md"), F.col("src")).as("m"))
      nbrs.join(m, "src")
        .filter(F.col("dst") > F.col("src"))                 // v > u
        .select(F.col("dst").as("src"), F.col("m").as("dst")) // emit (v, m)
        .filter(F.col("src") =!= F.col("dst"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      // invariant from largeStar: every edge points bigger -> smaller
      val m = e.groupBy("src").agg(F.min("dst").as("m"))
      e.join(m, "src")
        .select(
          F.array(
            F.struct(F.col("dst").as("src"), F.col("m").as("dst")), // (v, m)
            F.struct(F.col("src").as("src"), F.col("m").as("dst"))  // (u, m)
          ).as("out"))
        .select(F.explode(F.col("out")).as("e"))
        .select(F.col("e.src").as("src"), F.col("e.dst").as("dst"))
        .filter(F.col("src") =!= F.col("dst"))
        .distinct()
    }

    def checksum(e: DataFrame): (Long, String) = {
      // hash sum through decimal(38): an order-independent set checksum
      // that cannot overflow under ANSI arithmetic
      val r = e.agg(F.count(F.lit(1)).as("n"),
        F.coalesce(F.sum(F.xxhash64(F.col("src"), F.col("dst")).cast("decimal(38,0)")),
          F.lit(java.math.BigDecimal.ZERO)).as("h")).head()
      (r.getLong(0), r.getDecimal(1).toPlainString)
    }

    // localCheckpoint (not persist): each round's plan references the
    // previous round's edge set several times, so without lineage
    // TRUNCATION the logical plan tree grows exponentially with rounds
    // (the data is fine — the plan itself OOMs the driver). On a cluster
    // with long chains, swap for a reliable checkpoint directory.
    var e = edges
      .select(F.col(srcCol).cast("long").as("src"), F.col(dstCol).cast("long").as("dst"))
      .filter(F.col("src") =!= F.col("dst"))
      .distinct()
      .localCheckpoint(true)
    var prev = checksum(e)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val c = checksum(next)
      e.unpersist()
      e = next
      converged = c == prev
      prev = c
      iter += 1
    }
    require(converged, s"connectedComponentsStars did not converge in $maxIter rounds")
    // e is a star forest: (v, center). Centers label themselves.
    e.select(F.col("src").as("doc_id"), F.col("dst").as("cluster_id"))
      .union(e.select(F.col("dst").as("doc_id"), F.col("dst").as("cluster_id")))
      .distinct()
  }

  /** The frontier graph of an incremental update: every new duplicate
    * pair projected onto CLUSTER LABELS — (seed(a), seed(b)) where
    * seed(x) is x's label in the persisted map, or x itself for a node
    * the map has never seen. Existing clusters are internally connected
    * by invariant, so connecting their labels is sufficient: the closure
    * of (history ∪ new) equals the closure of (label graph of new). The
    * output is at most |newEdges| rows — history EDGES are never read,
    * which is the whole point at 100 TB of accumulated pairs. Self-loop
    * label edges (both endpoints already in one cluster) are dropped;
    * they cannot change any label. */
  def reducedLabelEdges(newEdges: DataFrame, labelMap: DataFrame,
                        srcCol: String = "doc_a", dstCol: String = "doc_b"): DataFrame = {
    val m = labelMap.select(
      F.col("doc_id").cast("long").as("_n"), F.col("cluster_id").cast("long").as("_l"))
    val e = newEdges
      .select(F.col(srcCol).cast("long").as("src"), F.col(dstCol).cast("long").as("dst"))
      .filter(F.col("src").isNotNull && F.col("dst").isNotNull)
    e.join(m.withColumnRenamed("_n", "src").withColumnRenamed("_l", "_la"), Seq("src"), "left")
      .join(m.withColumnRenamed("_n", "dst").withColumnRenamed("_l", "_lb"), Seq("dst"), "left")
      .select(
        F.coalesce(F.col("_la"), F.col("src")).as("doc_a"),
        F.coalesce(F.col("_lb"), F.col("dst")).as("doc_b"))
      .filter(F.col("doc_a") =!= F.col("doc_b"))
      .distinct()
  }

  /** INCREMENTAL connected components under ingest — the living-corpus
    * lifecycle step: a persisted (doc_id, cluster_id) label map (from a
    * prior [[connectedComponents]] run or earlier incremental calls) is
    * updated with a shard's new duplicate pairs (e.g.
    * [[Dedup.incremental]] output) WITHOUT recomputing from scratch:
    *  1. seed the frontier — [[reducedLabelEdges]] projects the new pairs
    *     onto cluster labels (≤ |newEdges| rows; history edges unread);
    *  2. cluster the frontier — [[connectedComponents]] on that label
    *     graph only (touched clusters + genuinely new nodes);
    *  3. relabel — map rows whose label merged take the new component
    *     min via a broadcast-sized join on the OLD label (the map is
    *     rewritten by one id-keyed scan, no propagation over it), and
    *     new-edge nodes absent from the map append with their component
    *     label.
    * Labels stay the component-min doc id, so the updated map is
    * hash-equal to the batch closure over (history ∪ new) — the gate's
    * oracle — and a replay of the same shard is a no-op (every replayed
    * pair becomes a self-loop label edge and drops).
    *
    * Scale shape: the frontier clustering is duplication-of-the-shard
    * sized, never corpus-sized; the relabel is one scan of the map with
    * a broadcast of the merged-label table. At 100 TB the map is the
    * only big side and it moves zero times. */
  def incremental(newEdges: DataFrame, labelMap: DataFrame,
                  srcCol: String = "doc_a", dstCol: String = "doc_b"): DataFrame = {
    val red = reducedLabelEdges(newEdges, labelMap, srcCol, dstCol)
    val comp = connectedComponents(red) // (doc_id = label-node, cluster_id)
      .withColumnRenamed("doc_id", "_ln").withColumnRenamed("cluster_id", "_nl")
    val mapped = labelMap
      .select(F.col("doc_id").cast("long").as("doc_id"),
        F.col("cluster_id").cast("long").as("cluster_id"))
      .join(F.broadcast(comp), F.col("cluster_id") === F.col("_ln"), "left")
      .select(F.col("doc_id"),
        F.coalesce(F.col("_nl"), F.col("cluster_id")).as("cluster_id"))
    val newNodes = newEdges
      .select(F.col(srcCol).cast("long").as("doc_id"))
      .union(newEdges.select(F.col(dstCol).cast("long").as("doc_id")))
      .filter(F.col("doc_id").isNotNull)
      .distinct()
      .join(labelMap.select(F.col("doc_id").cast("long").as("doc_id")),
        Seq("doc_id"), "left_anti")
      .join(F.broadcast(comp), F.col("doc_id") === F.col("_ln"), "left")
      // a new node whose every edge was a self-loop after projection
      // cannot exist (its own seed is itself, so it appears in red
      // unless its only edges degenerated — which requires the OTHER
      // endpoint to map to the node itself, impossible for an unseen
      // node); coalesce is belt-and-braces for a (u, u) input pair
      .select(F.col("doc_id"),
        F.coalesce(F.col("_nl"), F.col("doc_id")).as("cluster_id"))
    mapped.unionByName(newNodes)
  }

  /** Distributed min-label propagation (see object doc). */
  private def propagateDistributed(edges: DataFrame, maxIter: Int): DataFrame = {
    val sym = edges
      .union(edges.select(F.col("dst").as("src"), F.col("src").as("dst")))
      .persist()
    sym.count()
    try propagateLoop(sym, maxIter)
    finally sym.unpersist() // incl. the non-convergence require path
  }

  private def propagateLoop(sym: DataFrame, maxIter: Int): DataFrame = {

    def labelSum(labels: DataFrame): java.math.BigDecimal =
      labels.agg(F.sum(F.col("lbl").cast("decimal(38,0)")).as("s")).head().getDecimal(0)

    // localCheckpoint truncates lineage: each round references the
    // previous label table twice, so the un-truncated plan tree doubles
    // per round (see connectedComponentsStars).
    var labels = sym.select(F.col("src").as("id")).distinct()
      .select(F.col("id"), F.col("id").as("lbl"))
      .localCheckpoint(true)
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
        .localCheckpoint(true)
      val s = labelSum(next)
      labels.unpersist()
      labels = next
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels.select(F.col("id").as("doc_id"), F.col("lbl").as("cluster_id"))
  }

  /** Corpus duplication report — the one-row summary every dedup run is
    * judged by before survivors are materialized: how many documents sit
    * in near-duplicate clusters, how many would be removed under
    * keep-one-per-cluster, the duplicate fraction of the corpus, and the
    * largest cluster (the boilerplate red flag). `clusters` is any
    * (doc_id, cluster_id) labeling (rows 59/82/150); singletons are
    * implicitly the unclustered remainder of `total`.
    *
    * Scale shape: one count per cluster (clusters-sized exchange), a
    * one-row fold, and a metadata-count cross join — nothing
    * corpus-sized moves. */
  def duplicationReport(clusters: DataFrame, total: DataFrame,
                        idCol: String = "doc_id"): DataFrame = {
    val sizes = clusters.groupBy(F.col("cluster_id"))
      .agg(F.count(F.lit(1)).as("sz"))
    val s = sizes.agg(
      F.sum("sz").as("n_clustered_docs"),
      F.count(F.lit(1)).as("n_clusters"),
      F.max("sz").as("max_cluster_size"))
    val n = total.agg(F.count(F.lit(1)).as("n_docs"))
    s.crossJoin(n).select(
      F.col("n_docs"), F.col("n_clustered_docs"), F.col("n_clusters"),
      (F.col("n_clustered_docs") - F.col("n_clusters")).as("n_duplicate_docs"),
      F.round((F.col("n_clustered_docs") - F.col("n_clusters")).cast("double") /
        F.col("n_docs").cast("double"), 6).as("dup_fraction"),
      F.col("max_cluster_size"))
  }
}
