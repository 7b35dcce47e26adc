package graft.functions.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of the UTF-8 text, level 6 — the input to the
  * compression-ratio quality heuristic (Dolma, Soldaini et al. 2024,
  * ships a gzip-ratio filter; the intuition is Shannon's: templated/
  * repetitive boilerplate compresses far better than natural prose, and
  * random noise worse). One Deflater per executor thread, reset per row
  * (allocation-free steady state); raw DEFLATE (nowrap) so the size is
  * the stream itself, no header constant.
  *
  * Engine-internal by design: the byte count depends on the JDK's zlib,
  * so the gate is rows-only — the spec pins the ORDERING property the
  * filter actually uses (repetitive < prose < noise-ish), determinism,
  * and the exact-round-trip sanity. NULL for null text. */
case class DeflateSizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    DeflateSizeExpr.size(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.DeflateSizeExpr$$.MODULE$$.size($c);")

  override protected def withNewChildInternal(newChild: Expression): DeflateSizeExpr =
    copy(child = newChild)
}

object DeflateSizeExpr {

  private final class Scratch {
    val deflater = new Deflater(6, /* nowrap = */ true)
    var buf: Array[Byte] = new Array[Byte](1 << 16)
  }
  private val local = ThreadLocal.withInitial[Scratch](() => new Scratch)

  /** The shared per-row compression — both execution paths. */
  def size(input: UTF8String): Long = {
    val s = local.get()
    val d = s.deflater
    d.reset()
    val bytes = input.getBytes
    d.setInput(bytes)
    d.finish()
    var total = 0L
    while (!d.finished()) {
      val n = d.deflate(s.buf)
      total += n
      if (n == 0 && !d.finished()) return total // defensive: cannot stall
    }
    total
  }
}
