package graft

import org.apache.spark.sql.DataFrame

/** Conditional scan spread (round 9; VERDICT r8 "what's wrong" #3).
  *
  * Heavy per-row folds (shingling, minhash, tokenize-and-count) need the
  * corpus spread across all cores, but the round-robin repartition that
  * guarantees it is a full shuffle of the corpus — at 100 TB an extra
  * corpus pass whose ONLY purpose is parallelism the scan already has
  * (thousands of splits >> cores). Repartition exactly when it can help:
  * when the input has fewer partitions than the session's default
  * parallelism (the small-file / local-bench regime). `rdd` conversion
  * here plans the query but runs no job.
  *
  * Not for exchanges that carry a REQUIRED distribution (e.g. the pinned
  * `repartition(p, col)` under a window) — those exist regardless of
  * partition count; this is only for parallelism-motivated spreads.
  *
  * Call it on SCANS (or other exchange-free plans), not on joined or
  * aggregated subtrees: the `rdd` partition probe plans job-free for a
  * bare scan, but on a plan that already contains exchanges AQE's
  * `toRdd` materializes those query stages as REAL jobs, which then run
  * AGAIN when the full query executes (exchange reuse does not span
  * separate executions) — measured round 9 as a doubled dedup aggregate
  * in q_pipeline.
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
