package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `vector_avg(vec)` — element-wise mean of `array<float>` vectors as
  * `array<double>`, rounded to `scale` decimals (rounding at the edge
  * absorbs merge-order ulp noise so results are run-stable).
  *
  * A TypedImperativeAggregate with a primitive double buffer
  * (dim sums + count): partial aggregation ships one (dim+1)-double
  * buffer per group per partition instead of dim exploded rows — the
  * shuffle for a k-cell centroid update is k x (dim+1) doubles
  * regardless of corpus size. The mutable-buffer aggregate pattern
  * HLL/sketch aggregates use (SURVEY §4 candidate, realized here for
  * IVF training).
  */
case class VectorAvgAgg(
    child: Expression, dim: Int, scale: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Array[Double] = new Array[Double](dim + 1)

  override def update(buf: Array[Double], row: InternalRow): Array[Double] = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(dim, arr.numElements())
      var j = 0
      while (j < n) { buf(j) += arr.getFloat(j); j += 1 }
      buf(dim) += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var j = 0
    while (j <= dim) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = {
    val n = buf(dim)
    if (n == 0) null
    else {
      val out = new Array[Any](dim)
      var j = 0
      while (j < dim) {
        val m = buf(j) / n
        // BigDecimal(NaN/Inf) throws; pass non-finite means through raw —
        // they carry no ulp noise for the rounding to absorb anyway
        out(j) = if (java.lang.Double.isFinite(m))
          BigDecimal(m).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
        else m
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate((dim + 1) * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(dim + 1)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorAvgAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorAvgAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): VectorAvgAgg =
    copy(child = cs.head)
  override def prettyName: String = "vector_avg"
}

object VectorAvg {
  def vector_avg(vec: Column, dim: Int, scale: Int = 6): Column =
    ColumnBridge.column(
      VectorAvgAgg(ColumnBridge.expression(vec), dim, scale).toAggregateExpression())
}
