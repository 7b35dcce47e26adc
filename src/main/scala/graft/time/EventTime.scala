package graft.time

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** Event-time machinery — Spark-native re-expression of malstrom's
  * epoch/watermark subsystem (reference: malstrom-core/src/operators/time/).
  *
  * malstrom epochs ≡ watermark-delimited event-time windows: an `Epoch(t)`
  * control message asserts "no more records ≤ t". In Spark that assertion is
  * `withWatermark` (streaming) or trivially complete input (batch). Windowed
  * aggregations over epochs become `window()` aggregations.
  */
object EventTime {

  /** assign_timestamps.rs:17 — nominate the event-time column. */
  def assignTimestamps(df: DataFrame, ts: Column): DataFrame =
    df.withColumn("event_time", ts.cast("timestamp"))

  /** generate_epochs.rs:17 with limit_out_of_orderness (:134) — a real
    * watermark on streams; identity on batch (all epochs closed). */
  def generateEpochs(df: DataFrame, tsCol: String, maxOutOfOrderness: String): DataFrame =
    if (df.isStreaming) df.withWatermark(tsCol, maxOutOfOrderness) else df

  /** Tumbling event-time window aggregation (the epoch-aligned agg of
    * examples/event_time.rs). Works for batch and streaming alike. */
  def tumblingAgg(df: DataFrame, ts: Column, width: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty,
      "tumblingAgg needs at least one aggregate; for a bare windowed grouping pass count(lit(1))")
    df.groupBy(keys :+ F.window(ts, width): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** inspect_frontier.rs — the maximum event time observed, per key (or
    * globally with `keys = Nil`). */
  def frontier(df: DataFrame, ts: Column, keys: Seq[Column]): DataFrame =
    if (keys.isEmpty) df.agg(F.max(ts).as("frontier"))
    else df.groupBy(keys: _*).agg(F.max(ts).as("frontier"))

  /** Late-data side output: rows more than `bound` behind their key's
    * frontier (generate_epochs.rs late stream, batch-checkable form). */
  def lateData(df: DataFrame, ts: Column, keys: Seq[Column], bound: String): DataFrame = {
    val w = Window.partitionBy(keys: _*)
    df.withColumn("__frontier", F.max(ts).over(w))
      .filter(ts < F.col("__frontier") - F.expr(s"INTERVAL $bound"))
      .drop("__frontier")
  }
}
