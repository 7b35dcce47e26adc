package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All `bands` minhash band signatures of a shingle array, in ONE pass
  * and ONE digest per shingle.
  *
  * Per shingle: h = md5(shingle); hi = first 8 digest bytes big-endian,
  * lo = last 8 bytes big-endian. Band b's 64-bit hash is the
  * Kirsch–Mitzenmacher mix `v_b = lo + b * hi (mod 2^64)`, and the band
  * signature is `min over shingles of v_b`, emitted as 16 lowercase hex
  * chars (fixed-width hex means string MIN = unsigned numeric MIN, which
  * is what the oracle computes). Bit-identical to the SQL composition
  *   min(lower(lpad(to_hex((lo + b*hi) % 2^64), 16, '0')))
  * with lo/hi parsed from substr(md5(shingle), 17, 16) / (…, 1, 16) —
  * mirrored in OracleSql.minhashCtes and Dedup.minhashSignatures.
  *
  * Why one digest, not one per band: the previous scheme digested
  * `md5(b + "|" + shingle)` per band — bands× the MD5 compressions, and
  * the bench's single largest CPU stage. The KM mix derives all band
  * hashes from one digest with two multiply-adds each; KM double hashing
  * is the standard trick for simulating k independent hash functions from
  * two (Kirsch & Mitzenmacher, ESA 2006) and preserves the MinHash
  * collision property in practice.
  *
  * Why an expression and not explode+groupBy: the aggregation is per-ROW
  * (per document), so running it inside the projection removes the
  * shingle fan-out (docs × shingles rows through the codegen pipeline),
  * the partial/final aggregation machinery, and the groupBy(id) SHUFFLE
  * entirely — at 100 TB the signature build becomes a pure scan.
  *
  * Codegen (r12): `doGenCode` emits a direct static call (result null
  * for empty shingle arrays, reflected into `ev.isNull`) so the
  * signature-build stage stays inside whole-stage codegen.
  *
  * Empty/short inputs: an empty shingle array yields NULL (the caller
  * filters those docs out — explode would have dropped them).
  * Min over duplicate shingles is idempotent, so the raw (non-distinct)
  * shingle stream is fine.
  *
  * Reference: the minhash construction matches Dedup.minhashSignatures
  * (see malstrom's dedup examples for the WHAT; the one-pass one-digest
  * band fold is the Spark-native HOW).
  */
case class MinhashSigsExpr(child: Expression, bands: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinhashSigsExpr.sigs(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.expressions.MinhashSigsExpr$$.MODULE$$.sigs($c, $bands);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MinhashSigsExpr =
    copy(child = newChild)
}

object MinhashSigsExpr {

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(v: Long): UTF8String = {
    val out = new Array[Byte](16)
    var i = 0
    while (i < 16) {
      out(i) = hexDigits(((v >>> ((15 - i) * 4)) & 0xfL).toInt).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  // One digest instance per executor thread, not per row: getInstance is
  // a provider lookup + allocation, measurable on a per-document scan.
  private val mdLocal = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** The shared fold — called per row from both interpreted eval and
    * generated code. Returns null for an empty shingle array. */
  def sigs(arr: ArrayData, bands: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val md = mdLocal.get()
    // One digest per shingle into a reusable scratch buffer (md.digest()
    // would allocate 16 bytes per call), then 2 multiply-adds per band.
    // Java long overflow wraps = the mod-2^64 the oracle computes in
    // HUGEINT; unsigned compare = the oracle's fixed-width hex string MIN.
    val scratch = new Array[Byte](16)
    val mins = new Array[Long](bands)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(arr.getUTF8String(i).getBytes)
      md.digest(scratch, 0, 16)
      var hi = 0L
      var lo = 0L
      var j = 0
      while (j < 8) { hi = (hi << 8) | (scratch(j) & 0xffL); j += 1 }
      while (j < 16) { lo = (lo << 8) | (scratch(j) & 0xffL); j += 1 }
      var b = 0
      var v = lo
      while (b < bands) {
        if (i == 0 || java.lang.Long.compareUnsigned(v, mins(b)) < 0) mins(b) = v
        v += hi
        b += 1
      }
      i += 1
    }
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) { out(b) = hex(mins(b)); b += 1 }
    new GenericArrayData(out)
  }
}
