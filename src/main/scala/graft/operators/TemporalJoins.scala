package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Temporal joins the built-in equi-join surface cannot express directly:
  * as-of (nearest-earlier match) and point-in-interval range joins.
  *
  * Both are composed from shuffle-friendly primitives instead of
  * inequality joins: an inequality join degenerates to a per-key cross
  * product (BroadcastNestedLoopJoin at worst), which is exactly what a
  * 100 TB event table cannot afford. The as-of join is ONE hash shuffle on
  * the key plus a running-window pass; the range join is ONE equi-join on
  * (key, time bucket) plus a residual filter.
  */
object TemporalJoins {

  /** Backward as-of join: for every left row, attach the single right row
    * with the same key and the greatest `rightTs` <= `leftTs` (inner
    * semantics — left rows with no earlier right row are dropped; pass the
    * result through a left join with the input to recover them if needed).
    *
    * Implementation: tag and union both inputs, then one running
    * `last(right_payload, ignoreNulls)` window per key ordered by
    * (ts, side, payload) — build rows sort before probe rows at equal
    * timestamps, so the match is inclusive, and the trailing payload sort
    * key makes the pick deterministic when several right rows share
    * (key, ts). This is a single hash exchange on `keys` and a streaming
    * window frame (no state beyond the running last): the classic
    * scale-out as-of, linear in |left| + |right|.
    *
    * Skew note (100 TB): a pathologically hot key serializes into one
    * task's sort. [[asofJoinSkewed]] is the hardened variant — it
    * range-partitions within the key by time bucket and carries each
    * bucket's last build row forward, so no task ever sorts more than one
    * (key, bucket) slice. Use it when one key can hold a large fraction
    * of the rows; this form is one shuffle cheaper when keys are well
    * distributed.
    *
    * Right payload columns (everything but the keys) come back prefixed
    * with `rightPrefix` to keep the output schema collision-free. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String = "ts", rightTs: String = "ts",
               rightPrefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val rPayload = right.columns.filterNot(keys.contains).toSeq
    val lStruct = F.struct(left.columns.toSeq.map(F.col): _*)
    val rStruct = F.struct(rPayload.map(c => F.col(c).as(s"$rightPrefix$c")): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    val probe = left.select(
      keys.map(F.col) ++ Seq(
        F.col(leftTs).as("__ts"), F.lit(1).as("__probe"),
        lStruct.as("__l"), F.lit(null).cast(rType).as("__r")): _*)
    val build = right.select(
      keys.map(F.col) ++ Seq(
        F.col(rightTs).as("__ts"), F.lit(0).as("__probe"),
        F.lit(null).cast(lType).as("__l"), rStruct.as("__r")): _*)

    val w = Window.partitionBy(keys.map(F.col): _*)
      .orderBy(F.col("__ts").asc, F.col("__probe").asc, F.col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    probe.unionByName(build)
      .withColumn("__match", F.last(F.col("__r"), ignoreNulls = true).over(w))
      .filter(F.col("__probe") === 1 && F.col("__match").isNotNull)
      .select(F.col("__l.*") +: rPayload.map(c =>
        F.col(s"__match.$rightPrefix$c").as(s"$rightPrefix$c")): _*)
  }

  /** Skew-hardened backward as-of join — same semantics and output as
    * [[asofJoin]], safe against hot keys.
    *
    * [[asofJoin]]'s single window partitions by `keys` alone: one
    * pathological key (the null-ish user, the monitoring heartbeat) pulls
    * its entire history into ONE task's sort. Here the window partitions
    * by (keys, time bucket) — a hot key spreads over as many tasks as it
    * spans `bucketSeconds` buckets — and cross-bucket matches are restored
    * with a boundary carry:
    *
    *  1. per (key, bucket): the running last build row, exactly
    *     [[asofJoin]]'s window but bucket-local;
    *  2. a carry table with ONE row per (key, bucket) — the greatest build
    *     row of each bucket, then a per-key running `last` over buckets
    *     shifted one back, i.e. "the last build row strictly before this
    *     bucket". Bucket-granularity rows, so the per-key window that
    *     would be the skew hazard runs on a table orders of magnitude
    *     smaller than the data;
    *  3. probe rows take their bucket-local match, falling back to the
    *     carry-in (`coalesce`) — the carry join is on (keys, bucket), the
    *     same partitioning the window just produced, so it reuses the
    *     exchange.
    *
    * Tie-breaking matches [[asofJoin]] bit for bit: the bucket-local
    * window uses the same (ts, side, payload) order, and the carry picks
    * `max(struct(ts, payload))` — the same greatest element (equal
    * timestamps can't straddle a bucket boundary, so the cross-bucket
    * side flag is irrelevant).
    *
    * Size `bucketSeconds` so the hottest key's per-bucket row count fits a
    * task sort comfortably (e.g. events/sec of the hot key x bucket
    * seconds ~ a few million). */
  def asofJoinSkewed(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String = "ts", rightTs: String = "ts",
                     rightPrefix: String = "r_",
                     bucketSeconds: Long = 3600L): DataFrame = {
    require(keys.nonEmpty, "asofJoinSkewed needs at least one key column")
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val bucketUs = bucketSeconds * 1000000L
    val rPayload = right.columns.filterNot(keys.contains).toSeq
    val lStruct = F.struct(left.columns.toSeq.map(F.col): _*)
    val rStruct = F.struct(rPayload.map(c => F.col(c).as(s"$rightPrefix$c")): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    def bucketOf(ts: org.apache.spark.sql.Column) =
      F.floor(F.unix_micros(ts) / bucketUs)

    val probe = left.select(
      keys.map(F.col) ++ Seq(
        F.col(leftTs).as("__ts"), F.lit(1).as("__probe"),
        lStruct.as("__l"), F.lit(null).cast(rType).as("__r"),
        bucketOf(F.col(leftTs)).as("__bucket")): _*)
    val build = right.select(
      keys.map(F.col) ++ Seq(
        F.col(rightTs).as("__ts"), F.lit(0).as("__probe"),
        F.lit(null).cast(lType).as("__l"), rStruct.as("__r"),
        bucketOf(F.col(rightTs)).as("__bucket")): _*)
    val u = probe.unionByName(build)

    val bucketKeys = keys :+ "__bucket"
    val wLocal = Window.partitionBy(bucketKeys.map(F.col): _*)
      .orderBy(F.col("__ts").asc, F.col("__probe").asc, F.col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Carry table: greatest build row per (key, bucket), then the running
    // last over STRICTLY EARLIER buckets per key. Rows here are one per
    // (key, bucket) — the per-key window is not a skew surface for DATA
    // rows. Residual ceiling: this window still serializes ONE task per
    // key over that key's ACTIVE-BUCKET sequence, so a single key would
    // need ~millions of non-empty buckets (e.g. >100 years of 1-hour
    // buckets) before the carry pass itself skews — raise `bucketSeconds`
    // if a deployment ever approaches that regime.
    val wCarry = Window.partitionBy(keys.map(F.col): _*)
      .orderBy(F.col("__bucket").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = u
      .groupBy(bucketKeys.map(F.col): _*)
      .agg(F.max(F.when(F.col("__probe") === 0,
        F.struct(F.col("__ts").as("ts"), F.col("__r").as("r")))).as("__lastb"))
      .withColumn("__carry", F.last(F.col("__lastb.r"), ignoreNulls = true).over(wCarry))
      .select((bucketKeys.map(F.col) :+ F.col("__carry")): _*)

    u.withColumn("__local", F.last(F.col("__r"), ignoreNulls = true).over(wLocal))
      .filter(F.col("__probe") === 1)
      .join(carry, bucketKeys, "left")
      .withColumn("__match", F.coalesce(F.col("__local"), F.col("__carry")))
      .filter(F.col("__match").isNotNull)
      .select(F.col("__l.*") +: rPayload.map(c =>
        F.col(s"__match.$rightPrefix$c").as(s"$rightPrefix$c")): _*)
  }

  /** Point-in-interval range join: every (point, interval) pair with equal
    * keys and `startCol <= pointTs < endCol` (start inclusive, end
    * exclusive).
    *
    * Implementation: intervals explode onto the fixed grid of
    * `bucketSeconds`-wide time buckets they overlap, points map to their
    * single containing bucket, and the match is an EQUI-join on
    * (keys, bucket) with the exact range predicate as a residual filter.
    * A point's bucket is unique, so no pair is emitted twice — no
    * distinct pass. Shuffle volume is |points| + |intervals| x
    * ceil(length/bucket): size `bucketSeconds` near the typical interval
    * length so each interval lands in ~2 buckets.
    *
    * Interval payload columns (everything but the keys) come back prefixed
    * with `intervalPrefix`. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                pointTs: String = "ts", startCol: String = "t0",
                endCol: String = "t1", bucketSeconds: Long = 3600L,
                intervalPrefix: String = "i_"): DataFrame = {
    require(keys.nonEmpty, "rangeJoin needs at least one key column")
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val bucketUs = bucketSeconds * 1000000L
    val iPayload = intervals.columns.filterNot(keys.contains).toSeq

    val p = points.withColumn("__bucket",
      F.floor(F.unix_micros(F.col(pointTs)) / bucketUs))
    // end is exclusive: an interval touching a bucket boundary exactly at
    // t1 does not cover that bucket, hence the (t1 - 1us) upper grid cell.
    // greatest() guards degenerate (empty) intervals from a descending
    // sequence; their pairs are killed by the residual filter anyway.
    val lo = F.floor(F.unix_micros(F.col(startCol)) / bucketUs)
    val hi = F.floor((F.unix_micros(F.col(endCol)) - 1) / bucketUs)
    val i = intervals
      .select(keys.map(F.col) ++ iPayload.map(c => F.col(c).as(s"$intervalPrefix$c")) :+
        F.explode(F.sequence(lo, F.greatest(lo, hi))).as("__bucket"): _*)

    p.join(i, keys :+ "__bucket")
      .filter(F.col(pointTs) >= F.col(s"$intervalPrefix$startCol") &&
        F.col(pointTs) < F.col(s"$intervalPrefix$endCol"))
      .drop("__bucket")
  }
}
