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
    * task's sort. The standard mitigation — range-partition within the
    * key by time and replicate the last build row of each range boundary
    * forward — composes on top of this operator; not needed at gate
    * scales.
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
