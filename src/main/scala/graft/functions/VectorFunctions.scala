package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.expressions.DotProductF

/** Vector (embedding) Column functions for similarity search.
  *
  * Two tiers:
  *  - portable formulations built from higher-order functions
  *    (`zip_with` + `aggregate`) — exact left-fold in double precision,
  *    reproducible by any engine (the oracle's formulation);
  *  - [[dotF]], a native codegen Catalyst expression ([[DotProductF]]),
  *    the hot path for ANN/LSH at scale.
  * Both produce bit-identical doubles (same accumulation order), so they
  * are interchangeable without breaking oracle hash equality.
  */
object VectorFunctions {

  /** Register the native dot as a SQL function (`graft_dot_f`) for
    * spark.sql users. Column-API callers go through [[dotF]] directly. */
  def registerAll(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot_f", exprs => DotProductF(exprs.head, exprs(1)), "built-in")

  /** Native codegen dot product over array<float|double> columns. */
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductF(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Portable dot product: left fold in double precision. */
  def dot(a: Column, b: Column): Column =
    F.aggregate(
      F.zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      F.lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = F.sqrt(dot(a, a))

  /** Cosine similarity in double precision (portable formulation). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine via the native dot (bit-identical to [[cosine]], faster). */
  def cosineF(a: Column, b: Column): Column =
    dotF(a, b) / (F.sqrt(dotF(a, a)) * F.sqrt(dotF(b, b)))

  /** Nibble value (0-15) of a single lowercase hex character column. */
  def hexNibble(c: Column): Column = {
    val a = F.ascii(c)
    F.when(a >= 97, a - 87).otherwise(a - 48)
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * first md5 nibble of "plane_dim", centered → [-0.9375, 0.9375].
    * Replicable in any engine with md5 + ascii, and computed plan-side by
    * [[planeWeightValue]] (identical by md5 determinism). */
  def planeWeight(plane: Int, dim: Column): Column = {
    val hexCh = F.substring(
      F.md5(F.concat(F.lit(s"${plane}_"), dim.cast("string"))), 1, 1)
    (hexNibble(hexCh).cast("double") - 7.5) / 8.0
  }

  /** Plan-time value of [[planeWeight]] — same md5, same arithmetic. */
  def planeWeightValue(plane: Int, dim: Int): Double = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"${plane}_$dim".getBytes(StandardCharsets.UTF_8))
    val nibble = (d(0) >> 4) & 0xf // first hex char of the digest
    (nibble.toDouble - 7.5) / 8.0
  }

  /** Random-hyperplane LSH signature with `planes` bits over an
    * array<float> embedding of dimension `dim`:
    * bit p = (emb · w(p+offset)) >= 0. The weight vectors are plan-time
    * constant arrays, so each bit is one codegen'd [[DotProductF]] — no
    * per-row hashing. `offset` selects an independent plane family.
    *
    * A `dim` that mismatches the real embedding width yields a NULL
    * signature (the dot product is NULL on length mismatch, and the
    * NULL propagates through concat), so such rows match NOTHING in the
    * bucket join. The old `otherwise("0")` turned every mismatched row
    * into the SAME all-zeros signature — one bucket holding the whole
    * corpus, silently degenerating "never all-pairs" LSH into a full
    * cross product. Empty results are a visible misconfiguration;
    * a quadratic blow-up at 100 TB is an outage. */
  def lshSignature(emb: Column, planes: Int, dim: Int, offset: Int = 0): Column = {
    val bits = (0 until planes).map { p =>
      val w = (0 until dim).map(d => planeWeightValue(p + offset, d))
      val contrib = dotF(emb, F.typedlit(w))
      F.when(contrib >= 0, F.lit("1")).when(contrib < 0, F.lit("0"))
      // no otherwise: NULL dot (length mismatch / null emb) → NULL bit
    }
    F.concat(bits: _*)
  }

  /** `tables` independent LSH signatures of `bits` bits each (disjoint
    * plane families) — the multi-table LSH index: a candidate matches if
    * its signature equals the query's in ANY table. */
  def lshTableSignatures(emb: Column, bits: Int, tables: Int, dim: Int): Column =
    F.array((0 until tables).map(t => lshSignature(emb, bits, dim, t * bits)): _*)

  /** Deterministic ±1 sign for (plane, dim): the [[planeWeightValue]]
    * nibble's high bit — a fair coin under md5 uniformity, replicable in
    * SQL by the same CASE. */
  def planeSignValue(plane: Int, dim: Int): Double =
    if (planeWeightValue(plane, dim) >= 0.0625) 1.0 else -1.0

  /** Johnson–Lindenstrauss random projection to `k` dimensions (the
    * Achlioptas ±1 construction: y_p = (emb · s_p) / √k with s_p a
    * deterministic md5-derived sign vector — the same plane family as
    * [[lshSignature]], so the projection needs NO stored matrix and any
    * engine reproduces it). Preserves pairwise distances within the JL
    * distortion bound in expectation; the cheap first stage before an
    * exact rerank when even SQ8 vectors are too wide to shuffle. Each
    * output coordinate is one codegen'd [[dotF]] over a plan-time
    * constant array — zero shuffle, scan-only. √k via the IEEE
    * correctly-rounded sqrt (identical in any engine — unlike exp/ln,
    * no round-6 hedge needed on the divisor itself). */
  def jlProject(emb: Column, k: Int, dim: Int, offset: Int = 0): Column = {
    require(k >= 1 && dim >= 1, s"need k, dim >= 1, got k=$k dim=$dim")
    F.array((0 until k).map { p =>
      val s = (0 until dim).map(d => planeSignValue(p + offset, d))
      dotF(emb, F.typedlit(s)) / F.sqrt(F.lit(k.toDouble))
    }: _*)
  }
}
