package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, KeyValueGroupedDataset, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Offline streaming-state RESCALE: move a stopped query's keyed state to a
  * different shuffle-partition count — the Spark-native answer to the
  * reference's live state redistribution (malstrom-core/src/keyed/
  * distributed/message_router/{interrogate,collect,normal}.rs, where
  * workers migrate key ranges between themselves mid-job).
  *
  * Spark pins a stateful operator's state-store layout to the shuffle
  * partition count in force at the FIRST micro-batch of a checkpoint;
  * changing `spark.sql.shuffle.partitions` on restart is silently ignored
  * for state placement (StreamingSpec's rescale-restart test pins this).
  * Structured Streaming has no live migration, but it has the two halves
  * of an offline one:
  *
  *  1. the State Data Source reader (`format("statestore")`) exposes every
  *     (key, state) pair of a checkpoint as a DataFrame — partition-layout
  *     free, just rows;
  *  2. `flatMapGroupsWithState(..., initialState = ...)` seeds a FRESH
  *     query — and therefore a fresh checkpoint, laid out at the NEW
  *     partition count — from exactly such pairs.
  *
  * So the migration is: stop the query → [[StateRescale.readState]] the old
  * checkpoint → restart the SAME logic against a NEW checkpoint dir with
  * the new `spark.sql.shuffle.partitions` and
  * `initialState = ` the read state (StatefulExec.stream's `initialState`
  * hook). Keys hash-route to the new layout in one shuffle; processing
  * resumes with no state loss. The source stream's OFFSET progress is the
  * caller's to carry over (for replayable sources, resume from the offsets
  * recorded in the old checkpoint's `offsets/` log — [[lastCommittedOffsets]]
  * surfaces them).
  *
  * Scale shape: the read is a parquet-like columnar scan of the state
  * files (no driver materialization), the re-seed is one hash exchange of
  * |keys| rows. For a 100 TB-keyed corpus this is a bounded batch job, not
  * a replay of history.
  */
object StateRescale {

  /** Raw (key, value, partition_id) rows of a stopped query's state store.
    * `operatorId`/`storeName`/`batchId` follow the State Data Source
    * options; defaults read the latest snapshot of operator 0's default
    * store — the layout [[graft.operators.StatefulExec.stream]] writes. */
  def readState(spark: SparkSession, checkpointDir: String,
                operatorId: Int = 0): DataFrame =
    spark.read.format("statestore")
      .option("operatorId", operatorId)
      .load(checkpointDir)

  /** The typed (key, state) pairs of a flatMapGroupsWithState checkpoint —
    * the input `initialState` wants. The state source returns structs; a
    * single-field struct (primitive K or S) unwraps to the value itself,
    * a multi-field struct stays a struct and decodes via the encoder. */
  def keyedState[K: Encoder, S: Encoder](
      spark: SparkSession, checkpointDir: String,
      operatorId: Int = 0): Dataset[(K, S)] = {
    implicit val ksEnc: Encoder[(K, S)] =
      org.apache.spark.sql.Encoders.tuple(
        implicitly[Encoder[K]], implicitly[Encoder[S]])
    val raw = readState(spark, checkpointDir, operatorId)
    import org.apache.spark.sql.types.StructType
    def unwrap(col: String): org.apache.spark.sql.Column = {
      var path = col
      var dt = raw.schema(col).dataType.asInstanceOf[StructType]
      // fMGWS value structs nest the user state under `groupState` next to
      // engine bookkeeping (timeoutTimestamp) — descend past it first.
      dt.fields.find(_.name == "groupState").foreach { gs =>
        path = s"$path.groupState"
        dt = gs.dataType.asInstanceOf[StructType]
      }
      // A single-field struct is a serialized PRIMITIVE (groupByKey on a
      // Long keys as {"value": long}) — unwrap one level so the tuple
      // encoder sees the primitive. (A one-field user case class would
      // unwrap too; such callers use [[readState]] and project by hand.)
      if (dt.fields.length == 1) F.col(s"$path.${dt.fields.head.name}")
      else F.col(path)
    }
    raw.select(unwrap("key").as("_1"), unwrap("value").as("_2")).as[(K, S)]
  }

  /** [[keyedState]] grouped for `initialState` — call under the NEW
    * `spark.sql.shuffle.partitions`; the grouping is what hash-routes every
    * key into the new layout. */
  def initialStateFrom[K: Encoder, S: Encoder](
      spark: SparkSession, checkpointDir: String,
      operatorId: Int = 0): KeyValueGroupedDataset[K, S] =
    keyedState[K, S](spark, checkpointDir, operatorId)
      .groupByKey(_._1).mapValues(_._2)

  /** The number of state partitions a checkpoint is pinned to — `state/
    * <operatorId>/<partitionId>/` directory fan-out. The before/after
    * witness that a migration actually changed the layout. */
  def statePartitionCount(checkpointDir: String, operatorId: Int = 0): Int = {
    val d = new java.io.File(s"$checkpointDir/state/$operatorId")
    Option(d.listFiles()).map(_.count { f =>
      f.isDirectory && f.getName.forall(_.isDigit)
    }).getOrElse(0)
  }

  /** The source offsets the old checkpoint had committed — what a caller
    * resumes a replayable source from after migrating state to the new
    * checkpoint. Returns the raw JSON lines of the newest entry in the
    * `offsets/` log (one per source). */
  def lastCommittedOffsets(checkpointDir: String): Seq[String] = {
    val dir = new java.io.File(s"$checkpointDir/offsets")
    val newest = Option(dir.listFiles()).toSeq.flatten
      .filter(_.getName.forall(_.isDigit))
      .sortBy(_.getName.toLong).lastOption
    newest.toSeq.flatMap { f =>
      val lines = java.nio.file.Files.readAllLines(f.toPath)
      // line 0 is the version header ("v1"), line 1 the metadata JSON;
      // the per-source offset JSONs follow.
      lines.toArray(Array.empty[String]).drop(2).toSeq
    }
  }
}
