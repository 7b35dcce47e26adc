package graft.sinks

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, Row, SaveMode}

/** Sink adapters — Spark-native re-expression of malstrom's sink API
  * (reference: malstrom-core/src/operators/sink.rs, sinks/).
  */
trait GraftSink extends Serializable {
  def write(df: DataFrame): Unit
}

/** sinks/stdout.rs — print up to `limit` rows (diagnostics only). */
final case class StdoutSink(limit: Int = 20, truncate: Boolean = false) extends GraftSink {
  override def write(df: DataFrame): Unit = df.show(limit, truncate)
}

/** sinks/vec_sink.rs — collect into a driver-side buffer. TEST-ONLY by
  * design (malstrom's VecSink is, too): the one deliberate `collect()` in
  * the codebase, never part of an operator path. */
final class VecSink extends GraftSink {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
  override def write(df: DataFrame): Unit = buf ++= df.collect()
  def rows: Seq[Row] = buf.toSeq
  def clear(): Unit = buf.clear()
}

/** Plain file sink, no state (examples/file_sink_stateless.rs). */
final case class FileSink(path: String, format: String = "parquet") extends GraftSink {
  override def write(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).format(format).save(path)
}

/** sinks/stateful.rs — exactly-once-style sink: parquet write + a commit
  * manifest carrying an epoch id. A re-run with the same epoch is a no-op
  * (idempotent replay, the batch analogue of malstrom's snapshot-consistent
  * sink state); streaming gets the same property from `foreachBatch` +
  * `batchId` (see graft.streaming.StreamingOps.exactlyOnceSink).
  */
final case class StatefulParquetSink(path: String) extends GraftSink {
  private def manifest = Paths.get(path, "_graft_commit.json")

  def committedEpoch: Option[Long] =
    if (Files.exists(manifest))
      Some(new String(Files.readAllBytes(manifest)).replaceAll("[^0-9]", "").toLong)
    else None

  override def write(df: DataFrame): Unit = write(df, epoch = 0L)

  def write(df: DataFrame, epoch: Long): Unit = {
    if (committedEpoch.contains(epoch)) return // replay → no-op
    df.write.mode(SaveMode.Overwrite).parquet(path)
    Files.write(
      manifest,
      s"""{"epoch": $epoch}""".getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
}
