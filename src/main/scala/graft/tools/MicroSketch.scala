package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Dev probe (VERDICT r19 #3): attribute q_percentile_sketch's wall —
  * scan, md5 key projection, the local sort the Partial WindowGroupLimit
  * forces, and the exchange+final cut — and A/B candidate cuts. */
object MicroSketch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(mk: => DataFrame): Unit = {
      var best = Long.MaxValue
      var out = 0L
      var i = 0
      while (i < reps) {
        val t0 = System.nanoTime()
        val d = mk
        out = d.select(F.xxhash64(d.columns.map(F.col): _*).as("h"))
          .agg(F.expr("bit_xor(h)")).collect().length.toLong
        val el = System.nanoTime() - t0
        if (el < best) best = el
        spark.catalog.clearCache()
        i += 1
      }
      println(f"MICRO $label%-28s best=${best / 1e6}%9.1f ms rows=$out")
    }

    val ev = graft.Tables.events(spark, dir)
    time("scan_only")(ev.select("event_type", "value"))
    time("scan_md5") {
      ev.filter(F.col("value").isNotNull)
        .select(F.col("event_type"), F.col("value"),
          F.md5(F.col("event_id").cast("string")).as("qs_key"))
    }
    time("bottomk_window") {
      graft.functions.Sketches.bottomKSample(
        ev, Seq("event_type"), "value", "event_id")
    }
    time("gate_current") {
      graft.SparkEntry.queries("q_percentile_sketch")(spark, dir)
    }
    spark.stop()
  }
}
