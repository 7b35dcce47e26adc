package graft.functions.expressions

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All registrable dot-suffixes of a lowercased host name, most specific
  * first: `"a.b.example.com"` → `["a.b.example.com", "b.example.com",
  * "example.com"]`. Suffixes keep at least TWO labels — a bare TLD is
  * never emitted, so a blocklist typo like `"com"` cannot nuke a crawl.
  * Empty array for empty or single-label hosts.
  *
  * This is the per-row half of domain-blocklist matching (a URL is
  * blocked iff ANY suffix appears in the list — how UT1-style lists are
  * specified: an `example.com` entry covers every subdomain). A
  * `transform(sequence(...))` Column composition computes the same array
  * but is CodegenFallback (all Catalyst higher-order functions are) and
  * would drop the corpus scan to the interpreted path; this expression
  * keeps the stage in whole-stage codegen (the [[ShingleExpr]] pattern).
  */
case class HostSuffixesExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HostSuffixesExpr.suffixes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.HostSuffixesExpr$$.MODULE$$.suffixes($c);")

  override protected def withNewChildInternal(newChild: Expression): HostSuffixesExpr =
    copy(child = newChild)
}

object HostSuffixesExpr {

  /** The shared per-row fold — called from interpreted eval and generated
    * code. Lowercases (host names are case-insensitive; the blocklist is
    * lowercase by contract) and ignores empty labels from stray dots. */
  def suffixes(input: UTF8String): GenericArrayData = {
    val host0 = input.toString.toLowerCase(Locale.ROOT)
    // strip a single trailing '.' (the absolute-FQDN root marker): a
    // dot-terminated host would emit only dot-terminated suffixes, which
    // can never equal a normalized blocklist entry
    val host = if (host0.endsWith(".")) host0.substring(0, host0.length - 1) else host0
    // label start positions: 0 and every index after a '.'
    val n = host.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val starts = new scala.collection.mutable.ArrayBuffer[Int](8)
    starts += 0
    var i = 0
    while (i < n) {
      if (host.charAt(i) == '.' && i + 1 < n) starts += (i + 1)
      i += 1
    }
    // a suffix starting at label j spans labels j..last; keep those with
    // >= 2 labels, i.e. every start except the last label's
    val out = new scala.collection.mutable.ArrayBuffer[Any](starts.length)
    var j = 0
    while (j < starts.length - 1) {
      val s = host.substring(starts(j))
      if (s.nonEmpty && !s.startsWith(".")) out += UTF8String.fromString(s)
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}
