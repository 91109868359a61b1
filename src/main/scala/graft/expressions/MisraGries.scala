package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `mg_sketch(key, m)` — Misra–Gries frequent-items sketch over a
  * string key column: a bounded-memory (≤ m counters) single-pass
  * summary whose survivor set is GUARANTEED to contain every key with
  * true count > n/(m+1), with per-key undercount ≤ n/(m+1). Partial
  * buffers merge by keywise sum followed by the (m+1)-th-largest
  * subtraction, which preserves the guarantee across any merge tree
  * (the classic mergeable-summaries construction — Agarwal et al.,
  * PODS'12) — so partial aggregation ships ONE ≤m-entry map per
  * partition instead of shuffling the full key cardinality.
  *
  * The 100 TB shape this enables: heavy-hitter detection (top domains,
  * top tokens, hot keys) as map-side sketch -> single tiny merge ->
  * broadcast the ≤m candidates back for an exact re-count of ONLY
  * those keys. Total shuffle: p × m map entries + the candidate rows —
  * never a full-cardinality groupBy. The candidate ESTIMATES are
  * merge-order-dependent (inherent to MG); the guaranteed-superset
  * property is not, which is why the exact re-verify pass downstream
  * is the deterministic, oracle-checkable surface.
  *
  * Output: map<string,long> of surviving keys -> estimated counts
  * (undercounts; see above for the deterministic usage pattern).
  */
case class MisraGriesAgg(
    child: Expression, m: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(m >= 1, s"mg_sketch: m must be >= 1, got $m")

  // fail non-string keys at ANALYSIS, not as a ClassCastException deep
  // inside update() on the first executor row
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"mg_sketch requires a STRING key column, got ${other.catalogString}")
    }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](m * 2)

  // decrement-all step: subtract `dec` from every counter, evict <= 0.
  // O(current size), amortized O(1) per input (each unit of decrement
  // pays for one unit of prior increment).
  private def decrementAll(buf: java.util.HashMap[String, Long], dec: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - dec
      if (nv <= 0) it.remove() else e.setValue(nv)
    }
  }

  override def update(buf: java.util.HashMap[String, Long],
                      row: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(row)
    if (v != null) {
      // UTF8String may be backed by a reused buffer — copy via toString
      val k = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(k)
      if (cur != 0L || buf.containsKey(k)) buf.put(k, cur + 1)
      else if (buf.size < m) buf.put(k, 1L)
      else decrementAll(buf, 1L)
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Long],
                     b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, cur + e.getValue)
    }
    if (a.size > m) {
      // subtract the (m+1)-th largest count from all, evict <= 0 —
      // at most m survivors, error bounds add across the merge tree
      val counts = new Array[Long](a.size)
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val dec = counts(a.size - m - 1) // (m+1)-th largest
      decrementAll(a, dec)
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    // deterministic layout for the map literal: sorted by key
    val keys = buf.keySet().toArray(new Array[String](buf.size))
    java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]])
    new ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        keys.map(k => UTF8String.fromString(k): Any)),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        keys.map(k => buf.get(k): Any)))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val entries = new Array[(Array[Byte], Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      entries(i) = (kb, e.getValue)
      bytes += 4 + kb.length + 8
      i += 1
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(entries.length)
    entries.foreach { case (kb, c) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashMap[String, Long](math.max(m * 2, n * 2))
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      buf.put(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = cs.head)
  override def prettyName: String = "mg_sketch"
}

object MisraGries {
  def mg_sketch(key: Column, m: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(key), m).toAggregateExpression())
}
