package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.functions.expressions.DotProductF

/** Vector (embedding) Column functions for similarity search.
  *
  * Two tiers:
  *  - portable formulations built from higher-order functions
  *    (`zip_with` + `aggregate`) — exact left-fold in double precision,
  *    reproducible by any engine (the oracle path);
  *  - [[dotF]], a native codegen Catalyst expression ([[DotProductF]])
  *    registered via [[registerAll]] — the hot path for ANN at scale.
  * Both produce bit-identical doubles (same accumulation order).
  */
object VectorFunctions {

  /** Register native expressions on the session's FunctionRegistry.
    * Idempotent; called by GraftExtensions and by SparkEntry. */
  def registerAll(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot_f", exprs => DotProductF(exprs.head, exprs(1)), "built-in")

  /** Native codegen dot product over array<float> (requires registerAll). */
  def dotF(a: Column, b: Column): Column = F.call_function("graft_dot_f", a, b)

  /** Portable dot product: left fold in double precision. */
  def dot(a: Column, b: Column): Column =
    F.aggregate(
      F.zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      F.lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = F.sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
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
    * Replicable in any engine with md5 + ascii — used by LSH bucketing so
    * an oracle can recompute bucket signatures exactly. */
  def planeWeight(plane: Int, dim: Column): Column = {
    val hexCh = F.substring(
      F.md5(F.concat(F.lit(s"${plane}_"), dim.cast("string"))), 1, 1)
    (hexNibble(hexCh).cast("double") - 7.5) / 8.0
  }

  /** Random-hyperplane LSH signature with `planes` bits over an
    * array<float> embedding: bit p = (Σ_d emb[d] * w(p+offset,d)) >= 0.
    * Pure Catalyst expressions; exact oracle replication possible.
    * `offset` selects an independent plane family (per LSH table). */
  def lshSignature(emb: Column, planes: Int, offset: Int = 0): Column = {
    val bits = (0 until planes).map { p =>
      val contrib = F.aggregate(
        F.zip_with(
          emb,
          F.sequence(F.lit(0), F.size(emb) - 1),
          (x, d) => x.cast("double") * planeWeight(p + offset, d)),
        F.lit(0.0),
        (acc, v) => acc + v)
      F.when(contrib >= 0, F.lit("1")).otherwise(F.lit("0"))
    }
    F.concat(bits: _*)
  }

  /** `tables` independent LSH signatures of `bits` bits each (disjoint
    * plane families) — the multi-table LSH index: a candidate matches if
    * its signature equals the query's in ANY table. */
  def lshTableSignatures(emb: Column, bits: Int, tables: Int): Column =
    F.array((0 until tables).map(t => lshSignature(emb, bits, t * bits)): _*)
}
