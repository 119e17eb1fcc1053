package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary with capacity k: at most k
  * counters; when a new item arrives with all counters taken, every
  * counter pays one (the classic decrement step, generalized to
  * subtract-the-(k+1)th-largest for mergeability). Estimates are
  * UNDER-counts with error ≤ N/(k+1) — every item with true frequency
  * above N/(k+1) is guaranteed present. When the true distinct count
  * never exceeds k the summary is EXACT (the property the oracle query
  * exercises). State is O(k) per group, partial-merge capable.
  */
final class MGBuffer(val k: Int) {
  val counts = new java.util.LinkedHashMap[UTF8String, java.lang.Long]()

  def add(item: UTF8String, w: Long): Unit = {
    val cur = counts.get(item)
    if (cur != null) counts.put(item, cur + w)
    // defensive copy: eval-time UTF8Strings may alias reused row memory
    else counts.put(item.clone(), java.lang.Long.valueOf(w))
    if (counts.size > k) shrink()
  }

  /** Subtract the (k+1)-th largest count from every counter and drop
    * the non-positive ones — the mergeable Misra-Gries reduction
    * (Agarwal et al., "Mergeable Summaries"). */
  private def shrink(): Unit = {
    val vals = new Array[Long](counts.size)
    var i = 0
    val it0 = counts.values.iterator
    while (it0.hasNext) { vals(i) = it0.next(); i += 1 }
    java.util.Arrays.sort(vals)
    val cut = vals(vals.length - (k + 1)) // (k+1)-th largest
    val it = counts.entrySet.iterator
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - cut
      if (nv <= 0) it.remove() else e.setValue(nv)
    }
  }

  /** Entries ordered by (count desc, item asc — binary UTF8 order,
    * matching the oracle's string collation on ASCII). */
  def sorted: Array[(UTF8String, Long)] = {
    val out = new Array[(UTF8String, Long)](counts.size)
    var i = 0
    val it = counts.entrySet.iterator
    while (it.hasNext) { val e = it.next(); out(i) = (e.getKey, e.getValue.longValue); i += 1 }
    java.util.Arrays.sort(out, new java.util.Comparator[(UTF8String, Long)] {
      override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else a._1.compareTo(b._1)
      }
    })
    out
  }
}

/** `approx_heavy_hitters(item, k)` — aggregate returning
  * `array<struct<item:string, est_count:long>>` ordered by (est_count
  * desc, item asc): the scale path for "top frequent values per group"
  * when exact counting would shuffle the full value set. The exchange
  * carries ≤ k counters per group per partition (ObjectHashAggregate
  * partial-merge), vs. a full (group, value) count-shuffle whose width
  * is the value cardinality. */
case class ApproxHeavyHitters(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] with UnaryLike[Expression]
  with ImplicitCastInputTypes {

  require(k > 0, s"approx_heavy_hitters requires k > 0, got $k")

  override def inputTypes = Seq(StringType)
  override def prettyName: String = "approx_heavy_hitters"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est_count", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String], 1L)
    buf
  }

  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
    val it = other.counts.entrySet.iterator
    while (it.hasNext) { val e = it.next(); buf.add(e.getKey, e.getValue) }
    buf
  }

  override def eval(buf: MGBuffer): Any = {
    val rows: Array[Any] = buf.sorted.map { case (item, c) =>
      InternalRow(item, c)
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: MGBuffer): Array[Byte] = {
    var bytes = 4
    val it0 = buf.counts.keySet.iterator
    while (it0.hasNext) bytes += 4 + it0.next().numBytes + 8
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.counts.size)
    val it = buf.counts.entrySet.iterator
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      bb.putInt(b.length); bb.put(b); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MGBuffer(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.add(UTF8String.fromBytes(b), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ApproxHeavyHitters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ApproxHeavyHitters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): ApproxHeavyHitters =
    copy(child = newChild)

  override def defaultResult: Option[org.apache.spark.sql.catalyst.expressions.Literal] =
    Some(org.apache.spark.sql.catalyst.expressions.Literal.create(
      ArrayData.toArrayData(Array.empty[Any]), dataType))
}
