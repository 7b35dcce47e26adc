package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftStream
import graft.operators.{StatefulExec, StatefulLogic}

case class KV(k: Long, v: Long, seq: Long)
case class RunOut(k: Long, seq: Long, total: Long)

/** Stateful operators, batch mode (reference: operators/stateful_map.rs:12,
  * stateful_op.rs, ttl_map.rs:16; examples/stateful_programs.rs). */
class StatefulSpec extends AnyFunSuite with SparkFixture {

  private def kvDs = {
    import spark.implicits._
    (0L until 60L).map(i => KV(i % 3, i, i)).toDS()
  }

  test("StatefulExec.batch folds per key in order") {
    import spark.implicits._
    val logic = new StatefulLogic[Long, KV, Long, RunOut] {
      def zero = 0L
      def update(k: Long, v: KV, s: Long): (Long, IterableOnce[RunOut]) = {
        val s2 = s + v.v
        (s2, Iterator.single(RunOut(k, v.seq, s2)))
      }
    }
    val out = StatefulExec.batch[Long, KV, Long, RunOut](
      kvDs, _.k, Ordering.by(_.seq), logic).collect()
    assert(out.length == 60)
    // running total must equal the window-function formulation
    val expected = kvDs.toDF()
      .withColumn("total", F.sum("v").over(
        Window.partitionBy("k").orderBy("seq")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "seq", "total").as[RunOut].collect()
    assert(out.sortBy(o => (o.k, o.seq)).toSeq == expected.sortBy(o => (o.k, o.seq)).toSeq)
  }

  test("StatefulExec.batch streams a hot key without buffering it") {
    import spark.implicits._
    // One key owns half the rows — the 100 TB skew shape. The fold must
    // stream the sorted run (the secondary sort keeps state O(1) per task;
    // the old toVector.sorted path materialized the whole key group).
    val n = 50000L
    // odd i keys at n+i so no singleton collides with the hot key 7
    val hot = (0L until n).map(i => KV(if (i % 2 == 0) 7L else n + i, i, i)).toDS()
    val logic = new StatefulLogic[Long, KV, Long, RunOut] {
      def zero = 0L
      def update(k: Long, v: KV, s: Long): (Long, IterableOnce[RunOut]) =
        (s + 1, Iterator.single(RunOut(k, v.seq, s + 1)))
    }
    val out = StatefulExec.batch[Long, KV, Long, RunOut](
      hot, _.k, Ordering.by(_.seq), logic)
    // the hot key's running count must climb monotonically in seq order
    val hotRows = out.filter(_.k == 7L).collect().sortBy(_.seq)
    assert(hotRows.length == n / 2)
    assert(hotRows.map(_.total).toSeq == (1L to n / 2).toSeq,
      "hot-key fold lost order or state across the sorted run")
    assert(out.filter(_.k != 7L).count() == n / 2) // singleton keys intact
  }

  test("statefulProject matches a manual running sum") {
    val df = kvDs.toDF()
    val out = GraftStream(df)
      .keyDistribute(F.col("k"))
      .statefulProject(Seq(F.col("seq")), "rt" -> (fr => F.sum("v").over(fr)))
      .toDF.orderBy("k", "seq").collect()
    val perKey = out.groupBy(_.getLong(0))
    perKey.foreach { case (_, rows) =>
      var acc = 0L
      rows.sortBy(_.getLong(1)).foreach { r =>
        acc += r.getLong(1) // v == seq in this fixture
        assert(r.getLong(3) == acc)
      }
    }
  }

  test("sessionize splits on gaps larger than the TTL") {
    import spark.implicits._
    // key 1: events at t=0s,10s,100s (gap>60s at the 3rd) → sessions 0,0,1
    val rows = Seq(
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0)), 1L),
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(10)), 2L),
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(100)), 3L))
      .toDF("k", "ts", "id")
    val out = GraftStream(rows)
      .keyDistribute(F.col("k"))
      .sessionize(F.col("ts"), Seq(F.col("ts"), F.col("id")), "60 SECOND")
      .toDF.orderBy("id").collect()
    assert(out.map(_.getLong(3)).toSeq == Seq(0L, 0L, 1L))
  }

  test("StatelessExec runs custom 0..n record logic") {
    import spark.implicits._
    import graft.operators.{StatelessExec, StatelessLogic}
    val logic = new StatelessLogic[Long, Long] {
      def onData(v: Long): IterableOnce[Long] =
        if (v % 2 == 0) Iterator(v, v * 10) else Iterator.empty
    }
    val out = StatelessExec.run(spark.range(0, 10).as[Long], logic).collect().sorted
    assert(out.toSeq == Seq(0L, 0L, 2L, 4L, 6L, 8L, 20L, 40L, 60L, 80L))
  }

  test("rendezvous hashing moves only a fraction of keys on membership change") {
    import graft.keyed.Partitioners
    val keys = (0 until 1000).map(i => s"key$i")
    val before = keys.map(k => k -> Partitioners.rendezvousSelect(k, Seq("a", "b", "c", "d")))
    val after = keys.map(k => k -> Partitioners.rendezvousSelect(k, Seq("a", "b", "c", "d", "e")))
    val moved = before.zip(after).count { case ((_, x), (_, y)) => x != y }
    // adding 1 of 5 workers should move ~1/5 of keys; assert well under half
    assert(moved > 0 && moved < 400, s"moved $moved of 1000")
    // and every moved key must have moved TO the new worker
    assert(before.zip(after).forall { case ((_, x), (_, y)) => x == y || y == "e" })
  }

  test("rescale invariance: results identical across partition counts") {
    val df = kvDs.toDF()
    def agg(parts: Int) = GraftStream(df)
      .keyDistribute(parts, F.col("k"))
      .agg(F.count(F.lit(1)).as("n"), F.sum("v").as("s"))
      .toDF.orderBy("k").collect().toSeq
    assert(agg(2) == agg(7) && agg(7) == agg(13))
  }
}
