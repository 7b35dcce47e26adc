package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Column-level data profiling: per column, the row/null/distinct counts
  * and (as canonical strings) the min/max — the DESCRIBE/profile surface
  * every ingest pipeline runs before trusting a new table, and the data
  * contract a corpus refresh diffs against.
  *
  * Scale shape: ONE corpus scan. All per-column aggregates evaluate in a
  * single aggregation (Spark plans the multiple COUNT DISTINCTs through
  * one Expand — one pass, one exchange of a single aggregate row per
  * partition), and the per-column rows are unpivoted from that ONE
  * result row driver-side — no per-column scans, no N-pass loop.
  *
  * Determinism: counts are exact longs; min/max compare with Spark's
  * binary UTF8/long ordering, which is DuckDB's default collation too,
  * and are CAST to string canonically on both engines. Callers profile
  * integral/string columns (the oracle-parity caveat: float formatting
  * differs cross-engine, so cast such columns first).
  */
object Profile {

  /** (col_name, n_rows, n_nulls, n_distinct, min_v, max_v) per requested
    * column (defaults to every column). n_distinct counts non-null
    * values; min/max are null (not "null") on an all-null column. */
  def profile(df: DataFrame, cols: Seq[String] = Seq.empty): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    require(names.nonEmpty, "no columns to profile")
    // the unpivot builds a stack() EXPRESSION STRING from these names —
    // restrict to plain identifiers so a quoted/backticked name cannot
    // smuggle syntax into the parsed expression
    names.foreach(c => require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"profile requires plain identifier column names, got '$c' — rename first"))
    val aggs = names.flatMap { c =>
      Seq(
        F.count(F.lit(1)).as(s"__rows_$c"),
        F.count(F.col(c)).as(s"__nn_$c"),
        F.count_distinct(F.col(c)).as(s"__nd_$c"),
        F.min(F.col(c)).cast("string").as(s"__min_$c"),
        F.max(F.col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single result row into per-column rows: a stack() over
    // the aggregate row, not another scan
    val stacked = names.map { c =>
      s"'$c', __rows_$c, __rows_$c - __nn_$c, __nd_$c, __min_$c, __max_$c"
    }.mkString(", ")
    one.select(F.expr(
      s"stack(${names.length}, $stacked) AS (col_name, n_rows, n_nulls, n_distinct, min_v, max_v)"))
  }
}
