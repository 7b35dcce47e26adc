package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** Kafka-shaped connector over files — same topic/partition/offset
  * semantics as malstrom-kafka (reference: malstrom-kafka/src/source.rs,
  * sink.rs), minus the broker (no kafka jar ships in this container).
  *
  * Layout: `<root>/topic=<name>/` parquet partitioned by `partition`, rows
  * `(partition int, offset long, key string, value string, ts timestamp)`.
  * Offsets are dense per partition (0-based, assigned at write time with a
  * per-partition `row_number` — one shuffle on `partition`, exactly how a
  * broker serializes appends). Reads support per-partition starting offsets
  * (the resume contract of malstrom-kafka's offset state), which arrive at
  * the scan as a pushed-down predicate.
  *
  * On a real cluster this object is swapped for Spark's `kafka` format; the
  * public API (topic, partitions, offsets) is identical by construction.
  */
object KafkaShim {

  val schemaDDL = "partition INT, offset BIGINT, key STRING, value STRING, ts TIMESTAMP"

  private def topicPath(root: String, topic: String) = s"$root/topic=$topic"

  /** Write a batch into the topic. `df` needs (partition, key, value, ts)
    * plus an explicit deterministic `orderBy` for offset order.
    *
    *  - `SaveMode.Overwrite` (default): replace the topic, offsets dense
    *    from 0 per partition — the deterministic re-materialization used
    *    by the correctness queries.
    *  - `SaveMode.Append`: broker semantics — new records get offsets
    *    AFTER each partition's existing high-water mark. */
  def write(
      df: DataFrame,
      root: String,
      topic: String,
      orderCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val spark = df.sparkSession
    val w = Window.partitionBy("partition").orderBy(orderCols.map(F.col): _*)
    val fresh = df.select(
      F.col("partition").cast("int").as("partition"),
      (F.row_number().over(w).cast("long") - 1L).as("offset"),
      F.col("key").cast("string").as("key"),
      F.col("value").cast("string").as("value"),
      F.col("ts").cast("timestamp").as("ts"))
    val exists = new java.io.File(topicPath(root, topic)).exists()
    val shifted =
      if (mode == SaveMode.Append && exists) {
        val base = endOffsets(spark, root, topic)
          .select(F.col("partition"), (F.col("end_offset") + 1L).as("base"))
        fresh
          .join(F.broadcast(base), Seq("partition"), "left")
          .withColumn("offset", F.col("offset") + F.coalesce(F.col("base"), F.lit(0L)))
          .drop("base")
      } else fresh
    shifted.write.mode(mode)
      .partitionBy("partition")
      .parquet(topicPath(root, topic))
  }

  /** Batch read from `startingOffsets` (exclusive lower bounds per
    * partition; missing partition = from 0). */
  def read(
      spark: SparkSession,
      root: String,
      topic: String,
      startingOffsets: Map[Int, Long] = Map.empty): DataFrame = {
    val df = spark.read.schema(schemaDDL).parquet(topicPath(root, topic))
    if (startingOffsets.isEmpty) df
    else {
      val bounds = F.map(
        startingOffsets.toSeq.flatMap { case (p, o) => Seq(F.lit(p), F.lit(o)) }: _*)
      df.filter(F.col("offset") >= F.coalesce(
        F.element_at(bounds, F.col("partition")), F.lit(0L)))
    }
  }

  /** Streaming read (file-stream over the topic directory). */
  def readStream(spark: SparkSession, root: String, topic: String): DataFrame =
    spark.readStream.schema(schemaDDL).parquet(topicPath(root, topic))

  /** Committed high-water mark per partition — the connector's offset
    * state (malstrom-kafka keeps this in snapshot state). */
  def endOffsets(spark: SparkSession, root: String, topic: String): DataFrame =
    read(spark, root, topic)
      .groupBy("partition")
      .agg(F.max("offset").as("end_offset"), F.count(F.lit(1)).as("n"))
}
