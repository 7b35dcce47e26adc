package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.StringType

/** Column-level data profiling: per column, the row/null/distinct counts
  * and (as canonical strings) the min/max — the DESCRIBE/profile surface
  * every ingest pipeline runs before trusting a new table, and the data
  * contract a corpus refresh diffs against.
  *
  * Scale shape: ONE corpus scan. All per-column aggregates evaluate in a
  * single aggregation (Spark plans the multiple COUNT DISTINCTs through
  * one Expand), and the per-column rows are unpivoted from that ONE
  * result row — no per-column scans. The distinct count of a STRING
  * column runs over `sha2(col, 256)`, not the raw value: the Expand
  * rewrite shuffles (gid, value) pairs, so counting distinct raw text
  * would shuffle near the whole corpus where the 64-char hash is
  * fixed-width (the same collision-free-equality assumption as
  * Dedup.exact, mirrored with sha256() in the oracle). MIN/MAX partials
  * emit one value per partition regardless of type. The unpivot is a
  * typed explode-of-structs with index-based internal aliases, so ANY
  * column name profiles — no identifier restriction, no expression
  * strings.
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
    // backtick-quoted resolution: a bare F.col("a.b") would parse the
    // dot as a struct accessor — quoting (with `` escaping) makes any
    // column name, dots and spaces included, resolve as itself
    def qc(c: String) = F.col("`" + c.replace("`", "``") + "`")
    def distinctOf(c: String) = df.schema(c).dataType match {
      // fixed-width hash through the count-distinct Expand, never raw text
      case StringType => F.count_distinct(F.sha2(qc(c), 256))
      case _          => F.count_distinct(qc(c))
    }
    val aggs =
      F.count(F.lit(1)).as("__rows") +: names.zipWithIndex.flatMap { case (c, i) =>
        Seq(
          F.count(qc(c)).as(s"__nn_$i"),
          distinctOf(c).as(s"__nd_$i"),
          F.min(qc(c)).cast("string").as(s"__min_$i"),
          F.max(qc(c)).cast("string").as(s"__max_$i"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // typed unpivot of the single aggregate row: explode an array of
    // structs — no expression strings, so arbitrary column names work
    val structs = names.zipWithIndex.map { case (c, i) =>
      F.struct(
        F.lit(c).as("col_name"),
        F.col("__rows").as("n_rows"),
        (F.col("__rows") - F.col(s"__nn_$i")).as("n_nulls"),
        F.col(s"__nd_$i").as("n_distinct"),
        F.col(s"__min_$i").as("min_v"),
        F.col(s"__max_$i").as("max_v"))
    }
    one.select(F.explode(F.array(structs: _*)).as("p")).select("p.*")
  }
}
