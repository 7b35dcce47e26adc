package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded bottom-k-by-rank-key aggregate — the SORT-FREE state of the
  * KMV/quantile sample (reference semantics: malstrom's keyed stateful
  * fold, malstrom-core/src/operators/stateful_op.rs; the bottom-k sample
  * contract itself is Sketches.bottomKSample's).
  *
  * Input: ONE struct-typed child whose FIRST field is a non-null STRING
  * rank key (md5 hex in every current caller). State: a TreeMap of the
  * k smallest keys seen → their full struct rows. Output: the state as
  * an `array<struct>` in ascending key order — a deterministic FUNCTION
  * of the input set, independent of partitioning and arrival order
  * (distinct keys by contract; a replayed identical key overwrites its
  * own slot, the mergeBottomK idempotence rule).
  *
  * Why not `row_number() OVER (...) <= k`: the Partial WindowGroupLimit
  * Spark plans for that cut still requires a FULL LOCAL SORT of every
  * map partition before it (O(n log n) per task, all row widths), where
  * this aggregate streams rows through a capped heap — O(n log k), no
  * sort node at all, and the exchange carries at most tasks × groups × k
  * pre-combined rows. At 100 TB the sort is the difference between a
  * spillable wide sort per task and a 256-entry map.
  *
  * Key comparisons are UTF8String byte order — identical to Spark's
  * binary string sort and DuckDB's varchar compare on ASCII hex, so the
  * result is hash-exact against the window formulation and the SQL
  * oracle. Ties (duplicate keys) collapse to the LAST-seen row; callers
  * guarantee distinct keys (md5 of distinct ids).
  *
  * PRECONDITION (ADVICE r20): the rank key must be NON-NULL. Rows whose
  * key evaluates to NULL are dropped here, whereas the pinned
  * `row_number() OVER (ORDER BY key)` window reference sorts NULLs
  * FIRST ascending — a nullable-key caller would diverge from the
  * window formulation (and the SQL oracle). Every caller keys on
  * md5(...) of a non-null column, which cannot be null; a new caller
  * with a nullable key must coalesce it explicitly first.
  */
case class BottomKByKeyAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[UTF8String, UnsafeRow]]
  with UnaryLike[Expression] {

  require(k >= 1, s"bottom-k needs k >= 1, got $k")

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if s.nonEmpty &&
          s.head.dataType == org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bottom_k_by_key needs struct<rankKey: string, ...>, got $other")
    }

  override def createAggregationBuffer(): java.util.TreeMap[UTF8String, UnsafeRow] =
    new java.util.TreeMap[UTF8String, UnsafeRow]()

  private def insert(buf: java.util.TreeMap[UTF8String, UnsafeRow],
                     key: UTF8String, row: UnsafeRow): Unit = {
    if (buf.size < k || key.compareTo(buf.lastKey()) < 0 || buf.containsKey(key)) {
      buf.put(key, row)
      if (buf.size > k) buf.remove(buf.lastKey())
    }
  }

  override def update(buf: java.util.TreeMap[UTF8String, UnsafeRow],
                      input: InternalRow): java.util.TreeMap[UTF8String, UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      val key = row.getUTF8String(0)
      if (key != null &&
          (buf.size < k || key.compareTo(buf.lastKey()) < 0 || buf.containsKey(key))) {
        // copy BEFORE keying: eval may return a row backed by reused
        // buffers; the copied UnsafeRow owns its bytes, and the key is
        // read back out of the copy so it shares that stable backing
        val stable = toUnsafe(row).copy()
        insert(buf, stable.getUTF8String(0), stable)
      }
    }
    buf
  }

  override def merge(a: java.util.TreeMap[UTF8String, UnsafeRow],
                     b: java.util.TreeMap[UTF8String, UnsafeRow])
      : java.util.TreeMap[UTF8String, UnsafeRow] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      insert(a, e.getKey, e.getValue)
    }
    a
  }

  override def eval(buf: java.util.TreeMap[UTF8String, UnsafeRow]): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    val it = buf.values().iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeMap[UTF8String, UnsafeRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.values().iterator()
    while (it.hasNext) {
      val row = it.next()
      val bytes = row.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[UTF8String, UnsafeRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(structType.length)
      row.pointTo(arr, len)
      buf.put(row.getUTF8String(0), row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByKeyAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByKeyAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomKByKeyAgg =
    copy(child = newChild)
  override def prettyName: String = "bottom_k_by_key"
}
