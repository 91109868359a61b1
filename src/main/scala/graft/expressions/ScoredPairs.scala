package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `scored_pairs(rows_a, rows_b, same_group)`: the pair-scoring kernel
  * of [[graft.operators.Dedup.embeddingPairs]] as a table generator.
  *
  * Each input is an array of `struct<id:long, v:array<float>,
  * nm:double>` — one triangle-block sub-group's rows, with the norm
  * (`vec_norm`) precomputed per row. One call scores EVERY candidate
  * pair between the two groups (all i<j index pairs when `same_group`,
  * the full cross product otherwise) and emits only the survivors
  * `(id_a, id_b, cos)` with `id_a < id_b` and `cos > minCos`.
  *
  * Why a generator and not a join: the candidate pair table is
  * quadratic (sf10: 2.0G pairs from 200K rows), and a pair-per-row
  * join pays the whole per-row machinery — joined-row glue, array
  * accessor dispatch, codegen consume chain — once per PAIR (~600ns/
  * pair measured, 6x the arithmetic). Here the group's ids/vectors/
  * norms are unpacked to primitive arrays ONCE per call (~1K rows) and
  * the i x j loop runs on float[] directly, so the per-pair cost is the
  * dot product itself; per-row overhead exists only for the ~1%
  * emitted survivors. Group size is bounded by embeddingPairs'
  * `cellCap`, so the unpacked arrays are a few hundred KB regardless
  * of corpus size — the memory contract survives any scale.
  *
  * Bit-parity contract (pinned by NativeExprParitySpec and the sf10
  * checksum harness `graft.ProfD05`): the dot fold is ascending-index
  * double accumulation over the common prefix — operation-for-
  * operation [[DotProduct]]/[[CosineSim]] — `cos = dot/(nm_a*nm_b)`
  * matches the decomposed kernel exactly (multiplication is bitwise
  * commutative, so orientation never matters), rounding replicates
  * Spark's `round(x, 6)` for doubles (HALF_UP via BigDecimal, NaN and
  * infinities passed through), and the survivor test replicates
  * Catalyst's double comparison (NaN greatest, `Double.compare`).
  */
case class ScoredPairs(rowsA: Expression, rowsB: Expression,
                       sameGroup: Expression, minCos: Double)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(rowsA, rowsB, sameGroup)

  override def elementSchema: StructType = StructType(Seq(
    StructField("id_a", LongType),
    StructField("id_b", LongType),
    StructField("cos", DoubleType)))

  private def unpack(arr: ArrayData)
      : (Array[Long], Array[Array[Float]], Array[Double]) = {
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Float]](n)
    val nms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val st = arr.getStruct(i, 3)
      ids(i) = st.getLong(0)
      vecs(i) = if (st.isNullAt(1)) null else st.getArray(1).toFloatArray()
      nms(i) = if (st.isNullAt(2)) Double.NaN else st.getDouble(2)
      i += 1
    }
    (ids, vecs, nms)
  }

  @transient private lazy val preGate: Double = minCos - 1e-6

  /** Spark's round(x, 6) for DoubleType: HALF_UP through BigDecimal,
    * non-finite values unchanged (BigDecimal.valueOf would throw). */
  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val a = rowsA.eval(input).asInstanceOf[ArrayData]
    val b = rowsB.eval(input).asInstanceOf[ArrayData]
    val sameEv = sameGroup.eval(input)
    if (a == null || b == null || sameEv == null) return Iterator.empty
    val same = sameEv.asInstanceOf[Boolean]
    val (idsA, vecsA, nmsA) = unpack(a)
    val (idsB, vecsB, nmsB) = if (same) (idsA, vecsA, nmsA) else unpack(b)

    new Iterator[InternalRow] {
      private var i = 0
      private var j = if (same) 1 else 0
      private var nextRow: InternalRow = null

      @annotation.tailrec
      private def advance(): Unit = {
        if (i >= idsA.length) return
        if (j >= idsB.length) {
          i += 1; j = if (same) i + 1 else 0
          advance()
        } else {
          val va = vecsA(i); val vb = vecsB(j)
          j += 1
          // same-group duplicate ids: the join form's strict id_a<id_b
          // drops them (a row can never pair with an equal id; an id's
          // hash group is a function of the id, so equal ids only ever
          // meet same-group)
          if (same && idsA(i) == idsB(j - 1)) advance()
          else if (va != null && vb != null) {
            val n = math.min(va.length, vb.length)
            var dot = 0.0
            var k = 0
            while (k < n) { dot += va(k).toDouble * vb(k).toDouble; k += 1 }
            val raw = dot / (nmsA(i) * nmsB(j - 1))
            // margin prefilter: HALF_UP to 6 decimals moves a finite
            // value by < 1e-6, so raw below minCos - 1e-6 can never
            // round above minCos — the BigDecimal rounding (an
            // allocation per call) runs only for the ~1% of pairs near
            // or past the threshold. NaN falls through: Catalyst's
            // double ordering treats it as greatest, so the exact test
            // below must see it.
            if (raw >= preGate || java.lang.Double.isNaN(raw)) {
              val cos = round6(raw)
              if (java.lang.Double.compare(cos, minCos) > 0) {
                val ia = idsA(i); val ib = idsB(j - 1)
                nextRow = new GenericInternalRow(Array[Any](
                  math.min(ia, ib), math.max(ia, ib), cos))
              } else advance()
            } else advance()
          } else advance()
        }
      }

      override def hasNext: Boolean = {
        if (nextRow == null) advance()
        nextRow != null
      }
      override def next(): InternalRow = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRow; nextRow = null; r
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ScoredPairs =
    copy(rowsA = newChildren(0), rowsB = newChildren(1),
      sameGroup = newChildren(2))
  override def prettyName: String = "scored_pairs"
}

object ScoredPairs {
  def apply(rowsA: Column, rowsB: Column, sameGroup: Column,
            minCos: Double): Column =
    ColumnBridge.column(ScoredPairs(ColumnBridge.expression(rowsA),
      ColumnBridge.expression(rowsB), ColumnBridge.expression(sameGroup),
      minCos))
}
