package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Scoped lifetime for persisted index tables.
  *
  * The dedup/TF-IDF operators persist corpus-derived index tables
  * (signatures, fingerprints, term-frequency arrays) because several plan
  * branches read them. Left unreleased, those caches accumulate across
  * queries in a long-lived session — corpus-sized blocks pinned until
  * eviction. This object gives each operator a cache SCOPE:
  *
  *  - [[materialize]] / [[materializeCounted]] persist + eagerly
  *    materialize a table (the eager action stops a self-join's branches
  *    racing to compute the same plan without seeing each other's blocks)
  *    and TRACK the handle;
  *  - [[scoped]] runs an operator body, eagerly materializes its result
  *    via `localCheckpoint` (dedup/scoring outputs are orders of magnitude
  *    smaller than the corpus-sized indexes that produce them), then
  *    unpersists every cache the body tracked — in `finally`, so failures
  *    release too.
  *
  * Thread-safety: the tracked-handle stack is a plain (deliberately
  * NON-inheritable) ThreadLocal, so each thread — and each `scoped`
  * nesting level within it — has its own scope; two queries on different
  * session threads can never release each other's index caches. Plain
  * rather than `DynamicVariable` (round-9 ADVICE): DynamicVariable is
  * backed by InheritableThreadLocal, so a thread spawned INSIDE a scoped
  * body would inherit a reference to the live frame and could keep
  * appending to it after the scope exits — those handles would land in an
  * already-drained buffer and leak. With a plain ThreadLocal a spawned
  * thread starts at the empty stack and its handles fall back to the
  * global root list, freed by [[releaseAll]]. Handles registered on a
  * thread with no enclosing [[scoped]] go to the same root list.
  *
  * Durability: on a cluster the scoped checkpoint uses MEMORY_AND_DISK_2
  * (2-replica) blocks. `localCheckpoint` truncates lineage, so after the
  * scope exits (indexes released) a lost block has NO recompute path —
  * with the default single-replica level one executor loss would fail the
  * job on any cluster with preemption or churn. Two replicas make the
  * pinned result survive a single loss; the blocks are result-sized
  * (small), so the extra copy is noise next to the corpus-sized caches
  * being freed. In local mode ([[checkpointLevel]]) the level drops to
  * single-replica MEMORY_AND_DISK: there is no peer to copy to, and the
  * attempted replication serializes every block for nothing.
  * The checkpointed blocks live OUTSIDE the SQL cache manager
  * (`spark.catalog.cacheTable` registry stays empty — and note
  * `spark.catalog.clearCache()` does NOT free them); they are released by
  * the ContextCleaner once the returned frame is garbage.
  */
object CacheScope {

  /** Test-only plan recorder (ExplainAuditSpec, round 10): when non-null,
    * receives (kind, formatted plan) for every index table at materialize
    * time and for every scoped result BEFORE `localCheckpoint` replaces
    * its plan with a checkpoint scan — the hook that lets CI audit the
    * interesting INTERNAL plans the terminal frame no longer shows.
    * Null in production: the only cost is one volatile read per
    * materialize/scoped call. */
  @volatile private[graft] var planRecorder: (String, String) => Unit = null

  private def record(kind: String, df: DataFrame): Unit = {
    val r = planRecorder
    if (r != null)
      r(kind, df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
  }

  /** Stack of scope frames for the CURRENT thread; each frame collects the
    * handles materialized while it is innermost. The root (empty-stack)
    * case falls back to a global list so untracked callers still get
    * [[releaseAll]] semantics. */
  private val scopes =
    new ThreadLocal[List[scala.collection.mutable.ArrayBuffer[DataFrame]]] {
      override def initialValue(): List[scala.collection.mutable.ArrayBuffer[DataFrame]] = Nil
    }

  private val rootTracked = scala.collection.mutable.ArrayBuffer[DataFrame]()

  /** Persist + eagerly materialize an index table, tracking it for release
    * by the enclosing [[scoped]] (or an explicit [[releaseAll]]). */
  private[graft] def materialize(df: DataFrame): DataFrame = materializeCounted(df)._1

  /** Persist + TRACK without an eager action. Safe ONLY when the plan's
    * consumers are strictly sequential — e.g. the first consumer is a
    * broadcast-subquery job that completes before the main job's probe
    * side starts, so it alone populates the cache. Consumers that run
    * inside ONE job (a self-join's two build sides) race without the
    * eager action: use [[materialize]] there. (The race costs duplicated
    * computation, never wrong results — block-level cache puts are
    * atomic — but duplicated index builds are exactly what the cache is
    * for.) Saves one full pass over the cached table plus a job
    * round-trip.
    *
    * REGIME BOUNDARY (round-9 ADVICE): the "strictly sequential" premise
    * holds only while the aggregated consumer is planned as a broadcast
    * subquery. When that side outgrows
    * `spark.sql.autoBroadcastJoinThreshold` (e.g. a token-count table at
    * web-corpus vocabulary), AQE re-plans the join as sort-merge and BOTH
    * consumers run inside one job — the corpus fold races and can run
    * twice, defeating the cache at exactly the scale it targets (results
    * stay correct; block puts are atomic). Callers whose aggregated side
    * is not provably broadcast-sized should use [[materialize]] — one
    * extra pass is strictly cheaper than a racing double fold. Current
    * callers qualify unconditionally: UnigramLm.score's first consumer
    * is a driver-BLOCKING `first()` action, and TfIdf.bm25's is a
    * broadcast build whose aggregated output is ≤ |queryTerms| rows by
    * construction — neither can cross the regime boundary. */
  private[graft] def materializeLazy(df: DataFrame): DataFrame = {
    record("materialize_lazy", df)
    val p = df.persist()
    scopes.get() match {
      case frame :: _ => frame.synchronized(frame += p)
      case Nil => rootTracked.synchronized(rootTracked += p)
    }
    p
  }

  /** [[materialize]], returning the row count the eager action already
    * paid for — callers use it to skip their own sizing jobs. */
  private[graft] def materializeCounted(df: DataFrame): (DataFrame, Long) = {
    record("materialize", df)
    val p = df.persist()
    scopes.get() match {
      case frame :: _ => frame.synchronized(frame += p)
      case Nil => rootTracked.synchronized(rootTracked += p)
    }
    (p, p.count())
  }

  /** Run `body`, pin its (small) result with an eager 2-replica
    * `localCheckpoint`, and release every index cache `body` tracked in
    * THIS scope (inner scopes release their own; other threads are
    * untouched). The result is lineage-free: downstream consumers
    * (writes, joins, iterative algorithms) read materialized blocks,
    * never re-running the released pipeline. */
  def scoped(body: => DataFrame): DataFrame = {
    val frame = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val saved = scopes.get()
    try {
      scopes.set(frame :: saved)
      val result = body
      record("scoped", result)
      result.localCheckpoint(true, checkpointLevel(result.sparkSession.sparkContext.isLocal))
    } finally {
      scopes.set(saved)
      frame.synchronized {
        frame.foreach(_.unpersist(blocking = false))
        frame.clear()
      }
    }
  }

  /** Storage level for the scoped checkpoint. 2-replica only where a
    * second block manager exists: in local mode replication cannot succeed
    * (no peers) but still SERIALIZES every block for the attempted copy —
    * measured ~25% on the headline bench — and local survives no failure
    * the extra copy would cover anyway. */
  private[graft] def checkpointLevel(isLocal: Boolean): StorageLevel =
    if (isLocal) StorageLevel.MEMORY_AND_DISK else StorageLevel.MEMORY_AND_DISK_2

  /** Unpersist every handle tracked OUTSIDE any [[scoped]] body (the
    * session-level cleanup hook). Scoped handles are freed by their own
    * scope exit. */
  def releaseAll(): Unit = rootTracked.synchronized {
    rootTracked.foreach(_.unpersist(blocking = false))
    rootTracked.clear()
  }
}
