package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session, local[4]). */
trait SparkFixture { self: AnyFunSuite =>
  lazy val spark: SparkSession = SparkFixture.session
  def sf001 = "/root/testdata/sf0.001"
}

object SparkFixture {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      // local[4, 2]: 4 threads, task maxFailures = 2 — a failed task is
      // retried once before the job aborts, which is what a real cluster
      // does and what FaultToleranceSpec exercises. For every other spec
      // tasks never fail, so the retry budget changes nothing.
      .master("local[4, 2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
