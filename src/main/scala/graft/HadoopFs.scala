package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** ONE place that resolves a path to its Hadoop filesystem with the
  * SESSION's configuration. Every driver-side filesystem touchpoint in
  * this repo (sink commit manifests, checkpoint introspection, the
  * exactly-once `_SUCCESS` probe) must go through here: a bare
  * `new Configuration()` misses `spark.hadoop.*` overrides (fs.defaultFS,
  * object-store credentials), and a `java.io.File` probe on an
  * hdfs://-or-s3a path silently answers against the driver's LOCAL disk
  * — both bug classes were found (and re-found) in separate files before
  * this helper existed. */
object HadoopFs {

  def sessionConf(): Configuration =
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** The path's filesystem under the session conf, plus the parsed path. */
  def get(path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(sessionConf()), p)
  }
}
