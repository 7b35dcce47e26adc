package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Deterministic, engine-replicable sampling for training-data pipelines.
  *
  * Spark's `sample()` draws from a seeded RNG whose stream depends on
  * partitioning — rerun the pipeline with different parallelism and the
  * sample changes. These samplers instead keep a row iff the md5 hex of
  * its id falls below a threshold prefix: a pure per-row predicate —
  * stable under repartitioning and rescaling, pushes into the scan, needs
  * no shuffle, and any engine with md5 reproduces the exact subset (the
  * DuckDB oracle does, byte for byte). Lowercase fixed-width hex compares
  * lexicographically as the uniform number it encodes, so a threshold
  * prefix of `'20'` keeps 32/256 of rows, `'80'` half, and rates compose
  * to any 1/256 granularity (extend the prefix for finer steps).
  */
object Sampling {

  /** Keep predicate: md5(id) below the hex threshold prefix. */
  def keep(idCol: Column, hexThreshold: String): Column =
    F.md5(idCol.cast("string")) < F.lit(hexThreshold)

  /** Uniform deterministic sample at a fixed hex-threshold rate. */
  def deterministicSample(df: DataFrame, idCol: String, hexThreshold: String): DataFrame =
    df.filter(keep(F.col(idCol), hexThreshold))

  /** Deterministic k-fold assignment: fold = (first two md5 hex digits of
    * the id) mod k — the train/val/test split primitive. Same stability
    * contract as the samplers (pure per-row predicate, repartition- and
    * rescale-stable, engine-replicable); folds are uniform to within the
    * 256-mod-k remainder bias (k=5 → ±0.2%). */
  def foldAssign(idCol: Column, k: Int): Column = {
    require(k >= 2 && k <= 256, s"need 2 <= k <= 256, got $k")
    F.conv(F.substring(F.md5(idCol.cast("string")), 1, 2), 16, 10)
      .cast("long") % k
  }

  /** Per-stratum deterministic sample: each stratum value keeps rows under
    * its own threshold; strata absent from `rates` are dropped. The whole
    * thing is one CASE filter — no shuffle, no per-stratum pass, and the
    * scan prunes rows before anything downstream sees them. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       rates: Map[String, String]): DataFrame = {
    require(rates.nonEmpty, "stratifiedSample needs at least one stratum rate")
    val threshold = rates.foldLeft(F.lit(null).cast("string")) {
      case (acc, (stratum, hex)) =>
        F.when(F.col(stratumCol) === stratum, F.lit(hex)).otherwise(acc)
    }
    df.filter(F.md5(F.col(idCol).cast("string")) < threshold)
  }
}
