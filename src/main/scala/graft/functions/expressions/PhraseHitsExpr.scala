package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-phrase blocklist matching in ONE text pass — Aho & Corasick
  * (CACM 1975), the automaton behind the C4 "bad words" filter step
  * (Raffel et al. 2020 filter against the public phrase blocklist): the
  * distinct blocklist phrases occurring as substrings of `child`,
  * emitted sorted.
  *
  * Why an automaton and not P `contains()` predicates: the published
  * blocklists run to hundreds/thousands of phrases; P scans make the
  * filter O(P·len) per document — at 100 TB the step becomes its own
  * corpus-sized job per phrase. The automaton is O(len + hits)
  * REGARDLESS of P: goto/fail links simulate all phrases concurrently,
  * one state transition per character. The trie ships with the plan and
  * builds once per executor (lazy), the [[BloomHitsExpr]] reference-
  * object pattern keeps the scan inside whole-stage codegen.
  *
  * Semantics are plain substring containment on the input as given —
  * callers pass `lower(text)` and lowercase phrases for the
  * case-insensitive policy (enforced here), so the DuckDB oracle is the
  * literal `contains(lower(text), phrase)` per phrase. Matches may
  * overlap and nest; each phrase reports at most once.
  *
  * Null: only when the text itself is null. A clean document yields an
  * empty array (blocked = false downstream).
  */
case class PhraseHitsExpr(child: Expression, phrases: Array[String])
    extends UnaryExpression {

  require(phrases.nonEmpty, "empty blocklist")
  require(phrases.forall(p => p.nonEmpty && p == p.toLowerCase(java.util.Locale.ROOT)),
    "phrases must be non-empty and lowercase (the case-insensitive policy)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  // Built once per (deserialized) expression instance — per executor, not
  // per row. Sorted order makes pattern index = output order.
  @transient private lazy val ac = PhraseHitsExpr.build(phrases.distinct.sorted)

  /** Shared per-row automaton run — interpreted eval and generated code. */
  def matches(text: UTF8String): GenericArrayData = {
    val a = ac
    val s = text.toString
    val hit = new Array[Boolean](a.patterns.length)
    var state = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      var st = state
      var next = a.step(st, c)
      while (next < 0 && st != 0) { st = a.fail(st); next = a.step(st, c) }
      state = if (next >= 0) next else 0
      var out = state
      while (out != 0) {
        val p = a.outPattern(out)
        if (p >= 0) hit(p) = true
        out = a.outLink(out)
      }
      i += 1
    }
    val found = new scala.collection.mutable.ArrayBuffer[Any]()
    var p = 0
    while (p < hit.length) {
      if (hit(p)) found += UTF8String.fromString(a.patterns(p))
      p += 1
    }
    new GenericArrayData(found.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    matches(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseHits", this, classOf[PhraseHitsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.matches($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseHitsExpr =
    copy(child = newChild)
}

object PhraseHitsExpr {

  /** The built automaton: per-state goto map, fail link, and an output
    * chain — `outPattern(s)` is the pattern ENDING at state s (or -1),
    * `outLink(s)` the next state in the suffix-output chain (0 ends).
    * The dedicated chain (instead of walking fail links per char) keeps
    * the per-character work at one transition plus only REAL outputs. */
  final class Automaton(val patterns: Array[String],
                        gotoMaps: Array[java.util.HashMap[Character, Integer]],
                        failArr: Array[Int],
                        outPatternArr: Array[Int],
                        outLinkArr: Array[Int]) extends Serializable {
    def step(state: Int, c: Char): Int = {
      val n = gotoMaps(state).get(c)
      if (n == null) -1 else n.intValue()
    }
    def fail(state: Int): Int = failArr(state)
    def outPattern(state: Int): Int = outPatternArr(state)
    def outLink(state: Int): Int = outLinkArr(state)
  }

  def build(patterns: Array[String]): Automaton = {
    val gotos = new scala.collection.mutable.ArrayBuffer[java.util.HashMap[Character, Integer]]()
    val outP = new scala.collection.mutable.ArrayBuffer[Int]()
    gotos += new java.util.HashMap(); outP += -1
    // Trie
    patterns.zipWithIndex.foreach { case (pat, pi) =>
      var st = 0
      pat.foreach { c =>
        val m = gotos(st)
        val nxt = m.get(c)
        if (nxt == null) {
          gotos += new java.util.HashMap(); outP += -1
          m.put(c, gotos.length - 1)
          st = gotos.length - 1
        } else st = nxt.intValue()
      }
      outP(st) = pi
    }
    val n = gotos.length
    val fail = new Array[Int](n)
    val outLink = new Array[Int](n)
    // BFS fail links (root's children fail to root).
    val queue = new java.util.ArrayDeque[Integer]()
    gotos(0).forEach((_, v) => queue.add(v))
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      gotos(u).forEach { (c, v0) =>
        val v = v0.intValue()
        queue.add(v0)
        var f = fail(u)
        var t = gotos(f).get(c)
        while (t == null && f != 0) { f = fail(f); t = gotos(f).get(c) }
        val fv = if (t != null && t.intValue() != v) t.intValue() else 0
        fail(v) = fv
        // Output chain: nearest suffix state that IS an output, else its
        // own chain — precomputed so matching never walks silent links.
        outLink(v) = if (outP(fv) >= 0) fv else outLink(fv)
      }
    }
    new Automaton(patterns, gotos.toArray, fail, outP.toArray, outLink)
  }
}
