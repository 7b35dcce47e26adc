package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global row index: append a 0..N-1 LONG position over a
  * total order given by `sortCols` — a distributed `row_number()` with NO
  * single-partition global window (range partition on the sort key +
  * in-partition sort + `zipWithIndex`, whose only driver state is one
  * per-partition-count array).
  *
  * The ONE implementation of this subtle ordering-and-schema contract;
  * [[graft.ann.Ann.densify]] (dense id re-keying) and
  * [[Sampling.shuffleShard]] (training-order shuffle) both build on it —
  * two inline copies of the repartitionByRange/sortWithinPartitions/
  * zipWithIndex/schema-append sequence had already started to drift.
  *
  * `sortCols` must be a TOTAL order (add a unique id as tie-break);
  * equal sort keys would otherwise get partition-layout-dependent
  * positions and break the determinism contract both callers advertise. */
object GlobalIndex {

  def appendIndex(df: DataFrame, sortCols: Seq[Column], outCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val withIdx = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    val schema = StructType(
      sorted.schema.fields :+ StructField(outCol, LongType, nullable = false))
    spark.createDataFrame(withIdx, schema)
  }
}
