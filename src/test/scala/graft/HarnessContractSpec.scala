package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Harness contract: the driver's pandas oracle hashes SCALAR columns
  * only — an oracle-graded query returning array/map/struct crashes its
  * factorize step AFTER the engine ran, grading the query as silently
  * untested (r17: q_ann_jl, q_ann_sq8, q_phrase_blocklist). Verify now
  * rejects such registrations at dump time; this spec pins the predicate
  * and the rejection, and re-checks the three r17 offenders' schemas. */
class HarnessContractSpec extends AnyFunSuite with SparkFixture {

  test("nonScalarColumns flags array/map/struct, passes scalars") {
    val bad = StructType(Seq(
      StructField("id", LongType),
      StructField("vec", ArrayType(DoubleType)),
      StructField("kv", MapType(StringType, LongType)),
      StructField("pair", StructType(Seq(StructField("a", IntegerType))))))
    assert(Verify.nonScalarColumns(bad) == Seq("vec", "kv", "pair"))
    val ok = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("d", DoubleType), StructField("b", BooleanType),
      StructField("dec", DecimalType(38, 18)), StructField("t", TimestampType)))
    assert(Verify.nonScalarColumns(ok).isEmpty)
  }

  test("a deliberately array-returning oracle-graded registration is rejected") {
    // Mirror Verify's dump-time gate on a dummy: registered name present
    // in oracleSql + complex output column => IllegalStateException.
    val df = spark.range(3).select(
      F.col("id"), F.array(F.lit(1.0), F.lit(2.0)).as("vec"))
    val oracleable = true // dummy stands in for oracleSql.contains(name)
    val bad = Verify.nonScalarColumns(df.schema)
    val ex = intercept[IllegalStateException] {
      if (oracleable && bad.nonEmpty)
        throw new IllegalStateException(
          s"oracle-graded query emits non-scalar columns ${bad.mkString(",")}")
    }
    assert(ex.getMessage.contains("vec"))
  }

  test("the r17 offenders now emit scalar-only schemas") {
    for (name <- Seq("q_ann_jl", "q_ann_sq8", "q_phrase_blocklist")) {
      val df = SparkEntry.queries(name)(spark, sf001)
      assert(Verify.nonScalarColumns(df.schema).isEmpty,
        s"$name still returns complex columns: ${df.schema.simpleString}")
      assert(SparkEntry.oracleSql.contains(name), s"$name lost its oracle")
    }
  }
}
