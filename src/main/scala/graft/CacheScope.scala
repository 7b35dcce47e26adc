package graft

import org.apache.spark.sql.DataFrame

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
  * The checkpointed result lives in block-manager blocks OUTSIDE the SQL
  * cache manager (`spark.catalog.cacheTable` registry stays empty) and is
  * freed by the ContextCleaner when the returned frame is garbage. Scopes
  * nest by suffix: an inner [[scoped]] releases only what was tracked
  * after it started.
  */
object CacheScope {

  private val tracked = scala.collection.mutable.ArrayBuffer[DataFrame]()

  private def mark(): Int = tracked.synchronized(tracked.length)

  /** Persist + eagerly materialize an index table, tracking it for release
    * by the enclosing [[scoped]] (or an explicit [[releaseAll]]). */
  private[graft] def materialize(df: DataFrame): DataFrame = materializeCounted(df)._1

  /** [[materialize]], returning the row count the eager action already
    * paid for — callers use it to skip their own sizing jobs. */
  private[graft] def materializeCounted(df: DataFrame): (DataFrame, Long) = {
    val p = df.persist()
    tracked.synchronized(tracked += p)
    (p, p.count())
  }

  /** Run `body`, pin its (small) result with an eager `localCheckpoint`,
    * and release every index cache `body` tracked. The result is
    * lineage-free: downstream consumers (writes, joins, iterative
    * algorithms) read materialized blocks, never re-running the released
    * pipeline. */
  def scoped(body: => DataFrame): DataFrame = {
    val m = mark()
    try body.localCheckpoint(true)
    finally releaseFrom(m)
  }

  /** Unpersist every tracked cache registered at or after `from`. */
  private def releaseFrom(from: Int): Unit = tracked.synchronized {
    tracked.drop(from).foreach(_.unpersist(blocking = false))
    tracked.remove(from, tracked.length - from)
  }

  /** Unpersist every tracked cache (session-level cleanup hook). */
  def releaseAll(): Unit = releaseFrom(0)
}
