package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Filter-funnel attrition report — the per-stage yield accounting every
  * production cleaning pipeline logs (and the first thing anyone asks of
  * a new filter: "how much does each stage cost me?"). Given an ordered
  * list of (stage name, keep predicate), emits one row per stage with
  * the documents ENTERING it (survivors of all prior stages) and the
  * documents LEAVING it (survivors including it) — i.e. the funnel the
  * dashboards draw.
  *
  * Stages compose by conjunction of their predicates in order, so the
  * whole report is ONE corpus scan + ONE map-side-combinable global
  * aggregation (a handful of conditional sums), then a row-per-stage
  * unpivot of that single aggregate row — no per-stage jobs, no shuffle
  * of data rows, corpus-size-independent output. Predicates are plain
  * Columns: row-local signals inline (quality, language, length), and
  * corpus-relative signals (a dedup-survivor flag) are computed by the
  * caller as a column first — the funnel does not care where a flag
  * came from.
  *
  * Output: (stage_idx, stage, n_in, n_out), stage_idx 1-based in the
  * given order. */
object Funnel {

  def report(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    // prefix conjunctions: survivors after stage i = AND of stages 1..i
    val prefixes = stages.map(_._2).scanLeft(F.lit(true))(_ && _).tail
    val sums =
      F.count(F.lit(1)).as("_s0") +:
        prefixes.zipWithIndex.map { case (p, i) =>
          F.sum(F.when(p, 1L).otherwise(0L)).as(s"_s${i + 1}")
        }
    val one = graft.Spread(df).agg(sums.head, sums.tail: _*)
    val rows = stages.zipWithIndex.map { case ((name, _), i) =>
      F.struct(
        F.lit(i + 1).cast("long").as("stage_idx"),
        F.lit(name).as("stage"),
        F.col(s"_s$i").cast("long").as("n_in"),
        F.col(s"_s${i + 1}").cast("long").as("n_out"))
    }
    one.select(F.explode(F.array(rows: _*)).as("_r")).select(F.col("_r.*"))
  }
}
