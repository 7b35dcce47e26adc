package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table helpers: persist a table hash-bucketed (and
  * bucket-sorted) on its join key so repeated fact-fact joins are
  * CO-LOCATED — Spark reads matching buckets pairwise and merge-joins with
  * NO exchange on either side. This is the storage-layout half of the
  * malstrom `key_distribute` contract: pay the partitioning once at write
  * time, reuse it for every downstream join/aggregation
  * (keyed/key_distribute.rs:15; BucketedJoinSpec proves the plan shape).
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keyCol: String,
                    sorted: Boolean = true): Unit =
    writeBucketedBy(df, table, buckets, Seq(keyCol), sorted)

  /** Multi-column variant: the bucket key must cover ALL of a downstream
    * join's keys for the bucketed side to stay exchange-free — Spark's
    * co-partitioning check (`requireAllClusterKeysForCoPartition`, default
    * on) rejects a partitioning on a strict subset of the join keys. */
  def writeBucketedBy(df: DataFrame, table: String, buckets: Int,
                      keyCols: Seq[String], sorted: Boolean = true): Unit = {
    // Pre-partition on the bucket key with numPartitions = numBuckets:
    // HashPartitioning's partition-id expression IS Spark's bucket-id
    // function (pmod(murmur3, n)), so each write task holds exactly one
    // bucket and emits ONE file — without this, every input partition
    // writes a file per bucket it touches (tasks × buckets files; 1024
    // tiny files at 32×32, measured as idle-wait-dominated write stages).
    val aligned = df.repartition(buckets, keyCols.map(org.apache.spark.sql.functions.col): _*)
    val w = aligned.write.mode(SaveMode.Overwrite).bucketBy(buckets, keyCols.head, keyCols.tail: _*)
    (if (sorted) w.sortBy(keyCols.head, keyCols.tail: _*) else w).saveAsTable(table)
  }
}
