package graft.functions.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All `bands` minhash band signatures of a shingle array, in ONE pass.
  *
  * Band b's signature is `min over shingles of md5hex(b + "|" + shingle)`
  * — bit-identical to the Column composition
  * `groupBy(id).agg(min(md5(concat(lit(s"$b|"), shingle))) …)` the dedup
  * oracles mirror in SQL (lowercase fixed-width hex means the string MIN
  * is the byte-wise unsigned MIN of the raw digest, which is what this
  * computes; only the winning digest per band is hex-encoded).
  *
  * Why an expression and not explode+groupBy: the aggregation is per-ROW
  * (per document), so running it inside the projection removes the
  * shingle fan-out (docs × shingles rows through the codegen pipeline),
  * the partial/final aggregation machinery, and the groupBy(id) SHUFFLE
  * entirely — at 100 TB the signature build becomes a pure scan. It also
  * reuses one `MessageDigest` per document instead of
  * commons-codec's per-call `MessageDigest.getInstance` inside Spark's
  * `md5()` (shingles × bands instantiations).
  *
  * Empty/short inputs: an empty shingle array yields NULL (the caller
  * filters those docs out — explode would have dropped them).
  * Min over duplicate shingles is idempotent, so the raw (non-distinct)
  * shingle stream is fine.
  *
  * Reference: the minhash construction matches Dedup.minhashSignatures
  * (see malstrom's dedup examples for the WHAT; the one-pass band fold is
  * the Spark-native HOW).
  */
case class MinhashSigsExpr(child: Expression, bands: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  // "b|" prefixes, precomputed once per expression instance.
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(bands)(b => s"$b|".getBytes(StandardCharsets.UTF_8))

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val md = MessageDigest.getInstance("MD5")
    // Zero-alloc digest loop: `md.digest()` allocates a 16-byte array per
    // call — shingles x bands allocations per document, which at bench
    // scale is tens of millions of short-lived arrays and measurable GC /
    // allocation-stall time on the signature-build stage. Instead every
    // digest lands in one reusable scratch buffer; a candidate only gets
    // copied into its band's (preallocated) min slot when it actually
    // wins, which after the first few shingles is rare.
    val scratch = new Array[Byte](16)
    val mins = Array.fill(bands)(new Array[Byte](16))
    val seen = new Array[Boolean](bands)
    var i = 0
    while (i < n) {
      val sBytes = arr.getUTF8String(i).getBytes
      var b = 0
      while (b < bands) {
        md.reset()
        md.update(prefixes(b))
        md.update(sBytes)
        md.digest(scratch, 0, 16)
        if (!seen(b) || unsignedLess(scratch, mins(b))) {
          System.arraycopy(scratch, 0, mins(b), 0, 16)
          seen(b) = true
        }
        b += 1
      }
      i += 1
    }
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) { out(b) = hex(mins(b)); b += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigsExpr =
    copy(child = newChild)
}
