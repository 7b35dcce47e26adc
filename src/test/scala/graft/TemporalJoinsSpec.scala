package graft

import java.sql.Timestamp

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

/** As-of and range joins ([[graft.operators.TemporalJoins]]): semantics on
  * hand-built cases (tie inclusion, boundary in/exclusivity, multi-bucket
  * intervals) and shape (no cross-product join in the plan). */
class TemporalJoinsSpec extends AnyFunSuite with SparkFixture {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the nearest earlier row per key, inclusive on equal ts") {
    import spark.implicits._
    val probe = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3"), // before any build row for key 2
      (3L, ts("2024-01-01 09:00:00"), "p4")  // key with no build rows at all
    ).toDF("k", "ts", "tag")
    val build = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 12:00:00"), 20.0), // equal-ts: must match p2
      (1L, ts("2024-01-01 11:00:00"), 30.0),
      (2L, ts("2024-01-01 10:00:00"), 40.0)
    ).toDF("k", "ts", "v")

    val out = TemporalJoins.asofJoin(probe, build, Seq("k")).collect()
      .map(r => (r.getAs[String]("tag"), r.getAs[Double]("r_v"))).toMap
    assert(out == Map("p1" -> 10.0, "p2" -> 20.0))
  }

  test("asofJoin matches a brute-force max-earlier computation on events") {
    val ev = Tables.events(spark, sf001)
    val p = ev.filter(F.col("event_type") === "purchase")
      .select(F.col("event_id").as("pid"), F.col("user_id"), F.col("ts"))
    val c = ev.filter(F.col("event_type") === "click")
      .select(F.col("user_id"), F.col("event_id"), F.col("ts"), F.col("value"))

    val fast = TemporalJoins.asofJoin(p, c, Seq("user_id"))
      .select(F.col("pid"), F.col("r_event_id").as("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

    // brute force: inequality join + argmax(click ts) per purchase
    val brute = p.join(c.withColumnRenamed("ts", "cts"), Seq("user_id"))
      .filter(F.col("cts") <= F.col("ts"))
      .withColumn("rn", F.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("pid")
          .orderBy(F.col("cts").desc, F.col("event_id").desc)))
      .filter(F.col("rn") === 1)
      .select(F.col("pid"), F.col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

    assert(fast.nonEmpty && fast == brute)
  }

  test("asofJoin plans one key shuffle + window, no nested-loop join") {
    import spark.implicits._
    val probe = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("k", "ts", "tag")
    val build = Seq((1L, ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "ts", "v")
    val plan = TemporalJoins.asofJoin(probe, build, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"as-of degenerated to a cross product:\n$plan")
    assert(plan.contains("Window"), s"expected a window pass:\n$plan")
  }

  test("rangeJoin: start inclusive, end exclusive, multi-bucket intervals") {
    import spark.implicits._
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L), // == t0     -> in
      (1L, ts("2024-01-01 11:59:59"), 101L), // < t1      -> in
      (1L, ts("2024-01-01 12:00:00"), 102L), // == t1     -> out (exclusive)
      (1L, ts("2024-01-01 09:59:59"), 103L), // < t0      -> out
      (2L, ts("2024-01-01 10:30:00"), 104L)  // wrong key -> out
    ).toDF("k", "ts", "pid")
    // 2-hour interval with a 1-hour bucket: spans buckets 10 and 11
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"), 7L)
    ).toDF("k", "t0", "t1", "iid")

    val out = TemporalJoins.rangeJoin(points, intervals, Seq("k"),
        bucketSeconds = 3600L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(out == Set(100L, 101L))
  }

  test("rangeJoin emits each qualifying pair exactly once and matches brute force") {
    val ev = Tables.events(spark, sf001)
    val errors = ev.filter(F.col("event_type") === "error")
      .select(F.col("user_id"), F.col("event_id").as("err_id"),
        F.col("ts").as("t0"), (F.col("ts") + F.expr("INTERVAL 1 HOUR")).as("t1"))
    val clicks = ev.filter(F.col("event_type") === "click")
      .select(F.col("event_id").as("click_id"), F.col("user_id"), F.col("ts"))

    val fast = TemporalJoins.rangeJoin(clicks, errors, Seq("user_id"),
        bucketSeconds = 3600L)
      .select("i_err_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = errors.join(clicks, Seq("user_id"))
      .filter(F.col("ts") >= F.col("t0") && F.col("ts") < F.col("t1"))
      .select("err_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    assert(fast.length == fast.distinct.length, "duplicate pairs emitted")
    assert(fast.toSet == brute.toSet && fast.nonEmpty)
  }

  test("asofJoinSkewed == asofJoin under a 50%-hot key (property)") {
    import spark.implicits._
    // One key holds half of all rows on both sides; timestamps collide
    // across and within keys to exercise every tie-break path.
    val rng = new scala.util.Random(42)
    def key(i: Int): Long = if (rng.nextBoolean()) 7L else 1L + rng.nextInt(20)
    def when(i: Int): Timestamp =
      new Timestamp(1704100000000L + rng.nextInt(400) * 90000L) // ~90s grid, collisions
    val probe = (1 to 800).map(i => (key(i), when(i), s"p$i")).toDF("k", "ts", "tag")
    val build = (1 to 800).map(i => (key(i), when(i), rng.nextInt(50).toDouble))
      .toDF("k", "ts", "v")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("tag", "r_v").collect().map(r => (r.getString(0), r.getDouble(1)))
        .sortBy(identity[(String, Double)]).toSeq
    val plain = canon(TemporalJoins.asofJoin(probe, build, Seq("k")))
    // Three regimes: normal buckets; one giant bucket (degenerates to the
    // plain window, carry unused); 1-second buckets (nearly every match
    // crosses a boundary — the carry path does all the work).
    Seq(3600L, 10000000L, 1L).foreach { bs =>
      val skewed = canon(TemporalJoins.asofJoinSkewed(probe, build, Seq("k"),
        bucketSeconds = bs))
      assert(plain.nonEmpty && skewed == plain,
        s"skew-hardened variant diverged at bucketSeconds=$bs: " +
          s"${skewed.size} vs ${plain.size} rows")
    }
  }

  test("asofJoinSkewed spreads the hot key: no window slice over ~2x the mean") {
    import spark.implicits._
    // 50% of rows on one key over a 40-hour span with 1-hour buckets: the
    // plain window sorts all hot rows in ONE task; the skewed window's
    // largest (key, bucket) slice must stay near the mean slice size.
    val rng = new scala.util.Random(7)
    val n = 4000
    val rows = (1 to n).map { i =>
      val k = if (i % 2 == 0) 7L else 1L + rng.nextInt(40)
      (k, new Timestamp(1704100000000L + rng.nextInt(144000) * 1000L), i.toDouble)
    }.toDF("k", "ts", "v")
    val hotSlices = rows.filter(F.col("k") === 7L).groupBy(
      F.floor(F.unix_micros(F.col("ts")) / (3600L * 1000000L)).as("b"))
      .count().select("count").as[Long].collect()
    val hot = hotSlices.sum
    assert(hot >= n / 2, s"test setup: hot key should hold half the rows, got $hot")
    // The plain window sorts all `hot` rows in one task; after bucketing,
    // the hot key's largest slice must sit near its per-bucket mean — the
    // sort that was O(hot) is now O(hot / buckets-spanned).
    val meanSlice = hot.toDouble / hotSlices.length
    assert(hotSlices.max <= (2.0 * meanSlice).ceil.toLong,
      s"largest hot-key bucket slice ${hotSlices.max} exceeds 2x its mean $meanSlice")
    assert(hotSlices.max <= hot / 10,
      s"bucketing failed to spread the hot key: max slice ${hotSlices.max} of $hot rows")
  }
}
