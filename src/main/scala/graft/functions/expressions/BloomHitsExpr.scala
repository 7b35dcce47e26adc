package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Bloom-bitset probe count: how many shingles of `child` (array<string>,
  * pre-distincted by the caller) test POSITIVE against the `mBits`-bit
  * Bloom bitset `words`, where a shingle is positive iff all `kHashes`
  * probe bits are set.
  *
  * Probe positions are md5-derived, not seed-random, so they are fully
  * deterministic and cross-engine reproducible: probe `j` of a shingle is
  * hex digest chars `[8j, 8j+8)` parsed as an unsigned 32-bit value, mod
  * `mBits` — the same `('0x' || substr(md5(s), 8j+1, 8))::UBIGINT % mBits`
  * convention the DuckDB oracle computes (OracleSql.q_contamination_bloom),
  * which is what lets the oracle replicate the operator bit-for-bit,
  * Bloom false positives included.
  *
  * One digest per shingle: the probes are SLICED from the single 16-byte
  * md5, not re-digested per probe (`kHashes * 8 <= 32` hex chars — the
  * caller's require). The earlier filter/transform higher-order-function
  * form of this test was CodegenFallback (all Catalyst lambda functions
  * are) and dropped the whole 100 TB corpus scan stage onto the
  * interpreted path; this expression keeps it inside whole-stage codegen,
  * with the bitset carried as a codegen reference object
  * ([[PqEncodeExpr]]-style `addReferenceObj` callback — one direct,
  * non-reflective call per row).
  *
  * Null: only when the shingle array itself is null (docs too short to
  * shingle); an array with no positive shingles yields 0, which the
  * caller's `>= minHits` filter drops, matching the oracle's
  * HAVING-based flag set.
  *
  * Reference: decontamination semantics per malstrom's dedup examples
  * (the WHAT); the literal-bitset zero-join scan is the Spark-native
  * scale HOW — see Dedup.bloomContamination.
  */
case class BloomHitsExpr(child: Expression, words: Array[Long],
                         mBits: Int, kHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  /** Shared per-row probe count — called from interpreted eval and
    * generated code. */
  def hits(arr: ArrayData): Int = {
    val h = BloomHitsExpr.mdLocal.get()
    val md = h.md
    val scratch = h.scratch
    val n = arr.numElements()
    var count = 0
    var i = 0
    while (i < n) {
      md.reset()
      md.update(arr.getUTF8String(i).getBytes)
      md.digest(scratch, 0, 16)
      // Probe j = digest bytes [4j, 4j+4) big-endian (== hex chars
      // [8j, 8j+8) parsed as unsigned) mod mBits.
      var all = true
      var j = 0
      while (all && j < kHashes) {
        var v = 0L
        var b = 0
        while (b < 4) { v = (v << 8) | (scratch(j * 4 + b) & 0xffL); b += 1 }
        val p = (v % mBits).toInt
        if ((words(p >>> 6) & (1L << (p & 63))) == 0L) all = false
        j += 1
      }
      if (all) count += 1
      i += 1
    }
    count
  }

  override def nullSafeEval(input: Any): Any =
    hits(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomHits", this, classOf[BloomHitsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.hits($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomHitsExpr =
    copy(child = newChild)
}

object BloomHitsExpr {
  // One digest + one 16-byte digest buffer per executor thread, not per
  // row (provider lookup and buffer allocation are both measurable on a
  // per-document scan; the scratch lives here for the same reason the
  // digest does).
  private final class Scratch {
    val md: MessageDigest = MessageDigest.getInstance("MD5")
    val scratch: Array[Byte] = new Array[Byte](16)
  }
  private val mdLocal = ThreadLocal.withInitial[Scratch](() => new Scratch)
}
