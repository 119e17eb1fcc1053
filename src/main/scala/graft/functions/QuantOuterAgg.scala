package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native quantized outer-product accumulator:
  * `quant_outer(v)` over rows of `array<double>` returns the flattened
  * d×d `array<long>` with element i·d+j = Σ_rows round(v[i]·v[j]·1e6)
  * (round = away-from-zero on the binary double, exactly Spark SQL's
  * `CAST(round(x·1e6, 0) AS BIGINT)` and DuckDB's C `round` — the
  * established cross-engine quantization contract).
  *
  * This replaces the flatten-posexplode outer-product idiom of the
  * Gram/covariance passes (pca_embeddings, cca_project, cca_grams):
  * that plan generates n·d² struct rows through a hash aggregate
  * (100M rows at sf0.1, d=64 — it was the #1 and #2 cost in the r6
  * bench at ~8 s each), where this aggregate keeps ONE long[d²]
  * buffer per partition, partial-merges map-side, and ships 32 KiB
  * per partition on the exchange. O(n·d²) multiplies either way —
  * the explode's constant factor (struct alloc + shuffle write +
  * hash probe per element) is what goes away. At 100 TB the explode
  * shape is quadratically worse in exchanged bytes; this one is
  * corpus-scan bound.
  */
final class QuantOuterBuffer {
  var sums: Array[Long] = null // lazily sized d² on first row
}

case class QuantOuterProduct(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantOuterBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "quant_outer"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${t.sql}")
    }

  override def createAggregationBuffer(): QuantOuterBuffer = new QuantOuterBuffer

  override def update(buf: QuantOuterBuffer, input: InternalRow): QuantOuterBuffer = {
    val a = child.eval(input)
    if (a != null) {
      val v = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
      val d = v.length
      if (buf.sums == null) buf.sums = new Array[Long](d * d)
      require(buf.sums.length == d * d,
        s"$prettyName: ragged input — expected d²=${buf.sums.length}, row has d=$d")
      var i = 0
      while (i < d) {
        val vi = v(i)
        val base = i * d
        var j = 0
        while (j < d) {
          buf.sums(base + j) += QuantOuterProduct.q(vi * v(j) * 1e6)
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: QuantOuterBuffer, other: QuantOuterBuffer): QuantOuterBuffer = {
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

  override def eval(buf: QuantOuterBuffer): Any =
    new GenericArrayData(if (buf.sums == null) Array.empty[Long] else buf.sums)

  override def serialize(buf: QuantOuterBuffer): Array[Byte] = {
    val n = if (buf.sums == null) 0 else buf.sums.length
    val bb = ByteBuffer.allocate(4 + n * 8)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QuantOuterBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new QuantOuterBuffer
    if (n > 0) {
      buf.sums = new Array[Long](n)
      var i = 0
      while (i < n) { buf.sums(i) = bb.getLong; i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): QuantOuterProduct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantOuterProduct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): QuantOuterProduct =
    copy(child = newChild)
}

object QuantOuterProduct {
  /** Away-from-zero integer rounding on the BINARY double — bit-exact
    * with both Spark SQL round(x, 0) (BigDecimal HALF_UP over the
    * shortest decimal repr) and DuckDB/C round: the three agree for
    * every non-half binary value (the shortest repr never crosses the
    * .5 boundary) and on exact halves all round away from zero. The
    * naive floor(x + 0.5) is NOT safe — x + 0.5 can round UP to the
    * next half in FP for x just below it. |x| here is ≲1e9 ≪ 2^52, so
    * x − floor(x) is exact. */
  def q(x: Double): Long = {
    val f = Math.floor(x)
    val d = x - f
    val r = if (d > 0.5) f + 1.0
            else if (d < 0.5) f
            else if (x >= 0) f + 1.0 else f
    r.toLong
  }
}
