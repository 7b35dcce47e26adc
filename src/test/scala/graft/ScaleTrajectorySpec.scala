package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Sub-linearity assertion over the measured two-point scale trajectory
  * (round 9; VERDICT r8 task #7; re-measured round 10 after the
  * one-digest KM minhash rewrite). No sf1 dataset exists in this
  * container, so the scale claim is pinned on the 10x step that does:
  * docs/scale_trajectory_r10.json holds the full headline suite measured
  * at sf0.01 AND sf0.1 with the same code, box, and methodology for both
  * engines (Spark best-of-3 cold-cache after JIT warmup; DuckDB
  * best-of-3).
  *
  * Per query we fit the power-law growth exponent from the two points:
  * e = log10(t(sf0.1) / t(sf0.01)), so e = 1 is exactly linear in data
  * volume, e < 1 is sub-linear (fixed overhead amortizing, per-byte work
  * scaling with cores), e > 1 is the super-linear red flag the audit
  * exists to catch (a plan whose shuffle or buffering grows faster than
  * its input — the thing that kills a 100 TB run). Pure-JVM spec: no
  * Spark session, just the checked-in measurements.
  */
class ScaleTrajectorySpec extends AnyFunSuite {

  private lazy val root = {
    val m = new ObjectMapper()
    m.readTree(new java.io.File("docs/scale_trajectory_r10.json"))
  }

  private def queries(engine: String, sf: String): Map[String, Double] =
    root.path(engine).path(sf).path("queries").properties().asScala
      .filter(!_.getValue.isNull)
      .map(e => e.getKey -> e.getValue.asDouble()).toMap

  test("every headline query grows sub-linearly across the measured 10x step") {
    val lo = queries("spark", "sf0.01")
    val hi = queries("spark", "sf0.1")
    assert(lo.keySet == hi.keySet && lo.size >= 20,
      s"trajectory file incomplete: ${lo.size} vs ${hi.size} queries")
    val exponents = lo.keys.map { q =>
      q -> math.log10(hi(q) / lo(q))
    }.toMap
    val violations = exponents.filter { case (_, e) => e >= 1.0 }
    assert(violations.isEmpty,
      s"super-linear growth (exponent >= 1) detected: $violations")
    // and the headroom is real, not a rounding artifact: the worst
    // exponent stays clearly below linear
    val worst = exponents.maxBy(_._2)
    assert(worst._2 < 0.8, s"worst growth exponent too close to linear: $worst")
  }

  test("aggregate Spark growth for 10x data is far below the single-node engine's") {
    val sparkGrowth = root.path("spark").path("sf0.1").path("total").asDouble() /
      root.path("spark").path("sf0.01").path("total").asDouble()
    val duckGrowth = root.path("duckdb").path("sf0.1").path("total").asDouble() /
      root.path("duckdb").path("sf0.01").path("total").asDouble()
    assert(sparkGrowth < 2.0,
      s"aggregate Spark growth $sparkGrowth for 10x data should be < 2x")
    assert(duckGrowth > 2.0 * sparkGrowth,
      s"single-node growth $duckGrowth no longer dominates Spark's $sparkGrowth — " +
        "the crossover argument needs re-measuring")
  }
}
