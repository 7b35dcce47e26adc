package graft

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** r21 collision hardening (VERDICT r20 wrong-#1): line-granular dedup
  * keys line identity on a 128-bit pair of independent xxhash64s. This
  * spec PLANTS a first-hash collision between two DISTINCT lines (mocked
  * hashes, via the package-private *Hashed entry points — engineering a
  * real xxhash64 collision pair is infeasible) and proves:
  *   - dedupLines no longer deletes the non-duplicate line, while true
  *     duplicates still dedup;
  *   - stripBoilerplate no longer strips a non-boilerplate line whose
  *     hash collides with a boilerplate one;
  *   - the production path (real hashes) is unchanged on normal data.
  */
class LineHashCollisionSpec extends AnyFunSuite with SparkFixture {

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private val linesSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("idx", IntegerType),
    StructField("line", StringType),
    StructField("lh", LongType),
    StructField("lh2", LongType)))

  private def hashedFrame(rows: Seq[(Long, Int, String, Long, Long)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, idx, l, h1, h2) => Row(id, idx, l, h1, h2) }, 2),
      linesSchema)

  test("dedupLines: distinct lines colliding on the first hash both survive") {
    // doc 1: "alpha" (first), "dup" (first)
    // doc 2: "beta" COLLIDES with "alpha" on lh but differs on lh2 —
    //        under the old single-hash key it was deleted; "dup" is a
    //        true duplicate and must still be removed.
    val lines = hashedFrame(Seq(
      (1L, 0, "alpha", 100L, 1L),
      (1L, 1, "dup", 300L, 3L),
      (2L, 0, "beta", 100L, 2L), // planted collision: same lh, different lh2
      (2L, 1, "dup", 300L, 3L)))
    val out = Dedup.dedupLinesHashed(lines, "doc_id")
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(3)).toSeq == Seq("alpha\ndup", "beta"))
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 1L)) // only "dup" removed
  }

  test("dedupLines: identical pair-hashes still dedup (keep-first order)") {
    val lines = hashedFrame(Seq(
      (1L, 0, "x", 7L, 70L),
      (2L, 0, "x", 7L, 70L),
      (2L, 1, "y", 8L, 80L)))
    val out = Dedup.dedupLinesHashed(lines, "doc_id")
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(3)).toSeq == Seq("x", "y"))
  }

  test("stripBoilerplate: a line colliding with boilerplate is NOT stripped") {
    // "banner" occurs in docs 1..3 (df=3, boilerplate at minDocs=3);
    // "victim" (doc 4) collides with "banner" on lh only — the old key
    // merged their dfs and stripped it.
    val lines = hashedFrame(Seq(
      (1L, 0, "banner", 500L, 5L), (1L, 1, "body1", 601L, 61L),
      (2L, 0, "banner", 500L, 5L), (2L, 1, "body2", 602L, 62L),
      (3L, 0, "banner", 500L, 5L), (3L, 1, "body3", 603L, 63L),
      (4L, 0, "victim", 500L, 9L), (4L, 1, "body4", 604L, 64L)))
    val out = Dedup.stripBoilerplateHashed(lines, "doc_id", minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(3)).toSeq ==
      Seq("body1", "body2", "body3", "victim\nbody4"))
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L, 1L, 0L))
  }

  test("production path: real hashes, plain duplicate corpus behaves as before") {
    import spark.implicits._
    val docs = Seq(
      (1L, "keep me\nshared footer"),
      (2L, "unique body\nshared footer"),
      (3L, "another\nshared footer")).toDF("doc_id", "text")
    val dl = Dedup.dedupLines(docs).orderBy("doc_id").collect()
    assert(dl.map(_.getString(3)).toSeq ==
      Seq("keep me\nshared footer", "unique body", "another"))
    val sb = Dedup.stripBoilerplate(docs, minDocs = 3).orderBy("doc_id").collect()
    assert(sb.map(_.getString(3)).toSeq ==
      Seq("keep me", "unique body", "another"))
  }
}
