package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native quantized vector-sum accumulator:
  * `quant_vec_sum(v)` over rows of `array<double>` returns the
  * `array<long>` with element i = Σ_rows round(v[i]·1e6) — the same
  * away-from-zero [[QuantOuterProduct.q]] rounding contract, i.e.
  * bit-identical to `sum(CAST(round(v[i]·1e6, 0) AS BIGINT))` grouped
  * per dimension, in any accumulation order.
  *
  * This replaces the centroid-phase posexplode idiom (explode n·d
  * (dim, q) struct rows → shuffle on (group, dim) → re-collect the d
  * dims per group) that every iterative family pays per round
  * (grid-Lloyd, Harmony correction, PQ codebooks — the r7 cold-path
  * cost): ONE long[d] buffer per group per partition, map-side
  * partial merge, 8·d bytes per group on the exchange, and the
  * second (re-collect) shuffle disappears entirely. At cluster scale
  * the exchange drops from O(n·d) rows to O(groups·partitions)
  * array partials.
  */
final class QuantVecSumBuffer {
  var sums: Array[Long] = null // lazily sized d on first row
}

case class QuantVecSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantVecSumBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "quant_vec_sum"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${t.sql}")
    }

  override def createAggregationBuffer(): QuantVecSumBuffer = new QuantVecSumBuffer

  override def update(buf: QuantVecSumBuffer, input: InternalRow): QuantVecSumBuffer = {
    val a = child.eval(input)
    if (a != null) {
      val v = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
      val d = v.length
      if (buf.sums == null) buf.sums = new Array[Long](d)
      require(buf.sums.length == d,
        s"$prettyName: ragged input — expected d=${buf.sums.length}, row has d=$d")
      var i = 0
      while (i < d) { buf.sums(i) += QuantOuterProduct.q(v(i) * 1e6); i += 1 }
    }
    buf
  }

  override def merge(buf: QuantVecSumBuffer, other: QuantVecSumBuffer): QuantVecSumBuffer = {
    if (other.sums != null) {
      if (buf.sums == null) buf.sums = other.sums.clone()
      else {
        require(buf.sums.length == other.sums.length, s"$prettyName: ragged partials")
        var i = 0
        while (i < buf.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
      }
    }
    buf
  }

  override def eval(buf: QuantVecSumBuffer): Any =
    new GenericArrayData(if (buf.sums == null) Array.empty[Long] else buf.sums)

  override def serialize(buf: QuantVecSumBuffer): Array[Byte] = {
    val n = if (buf.sums == null) 0 else buf.sums.length
    val bb = ByteBuffer.allocate(4 + n * 8)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QuantVecSumBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new QuantVecSumBuffer
    if (n > 0) {
      buf.sums = new Array[Long](n)
      var i = 0
      while (i < n) { buf.sums(i) = bb.getLong; i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): QuantVecSum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantVecSum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): QuantVecSum =
    copy(child = newChild)
}
