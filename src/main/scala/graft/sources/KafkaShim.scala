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
    // Hadoop FS, not java.io.File: on hdfs:// or s3a:// roots a local-FS
    // existence probe is always false, which would silently skip the
    // high-water-mark shift and hand appended records duplicate offsets.
    val tp = new org.apache.hadoop.fs.Path(topicPath(root, topic))
    val exists = tp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(tp)
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

  /** Batch read from `startingOffsets` (INCLUSIVE lower bounds per
    * partition — offset o reads o itself onward, matching Kafka's
    * `startingOffsets` contract; a resuming caller passes
    * last-committed + 1. Missing partition = from 0). */
  def read(
      spark: SparkSession,
      root: String,
      topic: String,
      startingOffsets: Map[Int, Long] = Map.empty): DataFrame = {
    // Directory-partitioned parquet appends the partition column last;
    // re-project to the canonical broker column order (drop-in contract).
    val df = spark.read.schema(schemaDDL).parquet(topicPath(root, topic))
      .select("partition", "offset", "key", "value", "ts")
    if (startingOffsets.isEmpty) df
    else {
      val bounds = F.map(
        startingOffsets.toSeq.flatMap { case (p, o) => Seq(F.lit(p), F.lit(o)) }: _*)
      df.filter(F.col("offset") >= F.coalesce(
        F.element_at(bounds, F.col("partition")), F.lit(0L)))
    }
  }

  /** Streaming read (file-stream over the topic directory). Same
    * partition-column re-projection as [[read]]: directory discovery moves
    * `partition` to the end of the schema, and the drop-in contract is the
    * canonical broker column ORDER, not just the column set. */
  def readStream(spark: SparkSession, root: String, topic: String): DataFrame =
    spark.readStream.schema(schemaDDL).parquet(topicPath(root, topic))
      .select("partition", "offset", "key", "value", "ts")

  /** True when Spark's real Kafka connector is on the classpath (the
    * spark-sql-kafka-0-10 jar does not ship in this container). */
  private[graft] def kafkaJarPresent: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  /** Kafka `startingOffsets` JSON for a topic (inclusive per-partition
    * offsets — identical contract to [[read]]'s map).
    *
    * `allPartitions`: the topic's full partition set when known. Spark's
    * Kafka source REQUIRES every TopicPartition to appear once any
    * specific offset is given, while the file shim defaults absent
    * partitions to "from 0" — so unlisted partitions are filled with -2
    * (the connector's `earliest` sentinel) to keep the two paths
    * behaviorally identical. Without `allPartitions` a partial map is
    * emitted as-is, and the broker will reject it — callers resuming a
    * subset of partitions against a real broker must pass the set. */
  private[graft] def brokerStartingOffsetsJson(
      topic: String, startingOffsets: Map[Int, Long],
      allPartitions: Set[Int] = Set.empty): String =
    if (startingOffsets.isEmpty) "earliest"
    else {
      val filled = startingOffsets ++
        (allPartitions -- startingOffsets.keySet).map(_ -> -2L)
      val parts = filled.toSeq.sortBy(_._1)
        .map { case (p, o) => s""""$p": $o""" }.mkString(", ")
      s"""{"$topic": {$parts}}"""
    }

  /** Batch read dispatching on the environment: with a broker address AND
    * the kafka jar present, go through Spark's native `format("kafka")`
    * (malstrom-kafka/src/source.rs's true broker path), projected to the
    * shim's exact schema; otherwise fall back to the file shim. The
    * offset contract (inclusive lower bounds) is identical either way. */
  def readAuto(
      spark: SparkSession,
      root: String,
      topic: String,
      startingOffsets: Map[Int, Long] = Map.empty,
      bootstrapServers: Option[String] = None,
      allPartitions: Set[Int] = Set.empty): DataFrame =
    bootstrapServers match {
      case Some(servers) if kafkaJarPresent =>
        fromBrokerSchema(spark.read.format("kafka")
          .option("kafka.bootstrap.servers", servers)
          .option("subscribe", topic)
          .option("startingOffsets",
            brokerStartingOffsetsJson(topic, startingOffsets, allPartitions))
          .load())
      case _ => read(spark, root, topic, startingOffsets)
    }

  /** Project a DataFrame with spark-sql-kafka-0-10's documented source
    * schema (key/value BINARY, topic STRING, partition INT, offset LONG,
    * timestamp TIMESTAMP, timestampType INT) onto the shim's
    * [[schemaDDL]]. Split out of [[readAuto]] so KafkaContractSpec can
    * prove the swap-in mapping against the documented broker schema
    * without a broker on the classpath. */
  private[graft] def fromBrokerSchema(df: DataFrame): DataFrame =
    df.select(
      F.col("partition").cast("int").as("partition"),
      F.col("offset").cast("long").as("offset"),
      F.col("key").cast("string").as("key"),
      F.col("value").cast("string").as("value"),
      F.col("timestamp").cast("timestamp").as("ts"))

  /** Committed high-water mark per partition — the connector's offset
    * state (malstrom-kafka keeps this in snapshot state). */
  def endOffsets(spark: SparkSession, root: String, topic: String): DataFrame =
    read(spark, root, topic)
      .groupBy("partition")
      .agg(F.max("offset").as("end_offset"), F.count(F.lit(1)).as("n"))
}
