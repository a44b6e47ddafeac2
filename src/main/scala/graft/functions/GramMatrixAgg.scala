package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Upper-triangle gram (second-moment) matrix as ONE aggregate:
  * `gram_matrix_agg(qv)` over a group of quantized long vectors yields
  * every cell (i, j, n, g) with 1 ≤ i ≤ j ≤ maxDim, where
  * g = Σ_rows qv[i]·qv[j] (over rows long enough to have both) and
  * n = count of rows with size ≥ j — bit-identical to the explode +
  * groupBy((i,j)) formulation it replaces (UnitSuite pins the equality).
  *
  * Why not the explode: the triangle explode materializes d(d+1)/2
  * interpreted structs PER ROW (10.4 M allocations at sf0.1, measured as
  * the whole cost of the key — the aggregation itself is map-side
  * combined either way). Here the per-row work is the bare d²/2 long
  * multiply-adds into a flat buffer, the partial each partition ships is
  * one buffer (d²/2 longs + d counts — the same d²-bounded shuffle), and
  * merge is element-wise add. This is the standard scalable XᵀX shape:
  * per-partition dense accumulation, tree-merge of d² partials.
  *
  * Accumulation is in Long via Math.addExact/multiplyExact: a cell that
  * would pass 2⁶³ THROWS instead of silently wrapping — matching the
  * loud-failure behavior of the DECIMAL(38)-sum + ANSI BIGINT cast the
  * explode version had (Σ qi·qj beyond 2⁶³ is unrepresentable in the
  * op's public BIGINT output either way; what must never happen is a
  * silently corrupted matrix). Null vector rows are skipped; null
  * ELEMENTS (impossible for the quantize producer, which is
  * CAST(ROUND(..))) would contribute 0 to g while still counting toward
  * n, matching SUM-skips-null + COUNT(1) semantics.
  *
  * Buffer layout: [dim, cnt(1..dim), tri(g packed (j-1)j/2 + i-1)],
  * grown on demand when a longer row arrives.
  */
case class GramMatrixAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramMatrixAgg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("g", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "gram_matrix_agg"

  override def createAggregationBuffer(): GramMatrixAgg.Buf =
    new GramMatrixAgg.Buf(0, Array.emptyLongArray, Array.emptyLongArray)

  override def update(buf: GramMatrixAgg.Buf, input: InternalRow): GramMatrixAgg.Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val s = arr.numElements()
    if (s == 0) return buf
    if (s > buf.dim) buf.grow(s)
    val q = new Array[Long](s)
    var k = 0
    while (k < s) { q(k) = if (arr.isNullAt(k)) 0L else arr.getLong(k); k += 1 }
    var j = 0
    while (j < s) {
      buf.cnt(j) += 1L
      val base = j * (j + 1) / 2
      val qj = q(j)
      var i = 0
      while (i <= j) {
        buf.tri(base + i) =
          Math.addExact(buf.tri(base + i), Math.multiplyExact(q(i), qj))
        i += 1
      }
      j += 1
    }
    buf
  }

  override def merge(buf: GramMatrixAgg.Buf, other: GramMatrixAgg.Buf): GramMatrixAgg.Buf = {
    if (other.dim > buf.dim) buf.grow(other.dim)
    var k = 0
    while (k < other.dim) { buf.cnt(k) += other.cnt(k); k += 1 }
    k = 0
    val t = other.dim * (other.dim + 1) / 2
    while (k < t) { buf.tri(k) = Math.addExact(buf.tri(k), other.tri(k)); k += 1 }
    buf
  }

  override def eval(buf: GramMatrixAgg.Buf): Any = {
    val rows = new Array[Any](buf.dim * (buf.dim + 1) / 2)
    var out = 0
    var i = 1
    while (i <= buf.dim) {
      var j = i
      while (j <= buf.dim) {
        rows(out) = InternalRow(i, j, buf.cnt(j - 1), buf.tri((j - 1) * j / 2 + i - 1))
        out += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: GramMatrixAgg.Buf): Array[Byte] = {
    val t = buf.dim * (buf.dim + 1) / 2
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * (buf.dim + t))
    bb.putInt(buf.dim)
    var k = 0
    while (k < buf.dim) { bb.putLong(buf.cnt(k)); k += 1 }
    k = 0
    while (k < t) { bb.putLong(buf.tri(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramMatrixAgg.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val dim = bb.getInt
    val cnt = Array.fill(dim)(bb.getLong)
    val tri = Array.fill(dim * (dim + 1) / 2)(bb.getLong)
    new GramMatrixAgg.Buf(dim, cnt, tri)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object GramMatrixAgg {
  /** Mutable accumulation state; `grow` preserves the triangle packing
    * ((j-1)j/2 + i-1 is prefix-stable as dim grows).
    */
  final class Buf(var dim: Int, var cnt: Array[Long], var tri: Array[Long]) {
    def grow(newDim: Int): Unit = {
      cnt = java.util.Arrays.copyOf(cnt, newDim)
      tri = java.util.Arrays.copyOf(tri, newDim * (newDim + 1) / 2)
      dim = newDim
    }
  }

  /** Register as `gram_matrix_agg(longArray)` (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_matrix_agg",
      exprs => GramMatrixAgg(exprs.head),
      "scala_udf")
}
