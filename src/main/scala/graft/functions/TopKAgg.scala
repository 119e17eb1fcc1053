package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a size-k binary heap whose root is the WORST
  * kept element under (score desc, id asc), so an incoming candidate
  * only touches the heap when it beats the current floor. O(n log k)
  * per partition, O(k) state — the partial-aggregable shape that lets
  * top-k run map-side and ship k rows per group per partition instead
  * of sorting the full scored set through one window shuffle.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // "worse": lower score, ties broken by LARGER id (so the floor is the
  // element row_number()-over-(score desc, id asc) would rank last).
  // java.lang.Double.compare gives the total order Spark's sort uses:
  // NaN greater than everything (NaN-first under DESC), never the
  // primitive-< trap where NaN compares false both ways and an admitted
  // NaN can neither be evicted nor block admission correctly.
  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }

  private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      swap(i, m); i = m
    }
  }

  def insert(s0: Double, id: Long): Unit = {
    // normalize -0.0 to 0.0: Spark's sort sees normalized floats
    // (NormalizeFloatingNumbers), so the window tie-break never
    // distinguishes the two zeros and neither may we
    val s = if (s0 == 0.0d) 0.0d else s0
    if (size < k) {
      scores(size) = s; ids(size) = id; size += 1; siftUp(size - 1)
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id; siftDown()
    }
  }

  /** (id, score) pairs ordered by (score desc, id asc) under the same
    * total order as `worse` (NaN first, like Spark's DESC sort). */
  def sorted: Array[(Long, Double)] = {
    val out = new Array[(Long, Double)](size)
    var i = 0
    while (i < size) { out(i) = (ids(i), scores(i)); i += 1 }
    java.util.Arrays.sort(out, new java.util.Comparator[(Long, Double)] {
      override def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = java.lang.Double.compare(b._2, a._2)
        if (c != 0) c else java.lang.Long.compare(a._1, b._1)
      }
    })
    out
  }
}

/** Native top-k-by-score aggregate: `topk_by(score, id, k)` returns
  * `array<struct<id:long, score:double>>` ordered by (score desc,
  * id asc) — deterministic, ties resolved exactly like
  * `row_number() OVER (ORDER BY score DESC, id ASC)`. Partial-merge
  * capable (ObjectHashAggregate), so the planner keeps aggregation
  * map-side and the exchange carries ≤ k entries per group per
  * partition — replacing the rank-window pattern whose single shuffle
  * sorts EVERY scored row (the round-1 kNN bottleneck: 25M rows through
  * one window exchange at sf0.1; quadratically worse at corpus scale).
  */
case class TopKByScore(
    left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression]
  with ImplicitCastInputTypes {

  require(k > 0, s"topk_by requires k > 0, got $k")

  // Analysis-time contract: score coerces to double, id to long (so an
  // int id or float score widens via an inserted Cast instead of hitting
  // update()'s asInstanceOf as an executor ClassCastException; an
  // incompatible type fails analysis).
  // (return type inferred: AbstractDataType is private[sql], but
  // Seq[DataType] conforms to the declared Seq[AbstractDataType])
  override def inputTypes = Seq(DoubleType, LongType)

  override def prettyName: String = "topk_by"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null)
      buf.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows: Array[Any] = buf.sorted.map { case (id, s) =>
      InternalRow(id, s)
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(left = newLeft, right = newRight)

  override def defaultResult: Option[org.apache.spark.sql.catalyst.expressions.Literal] =
    Some(org.apache.spark.sql.catalyst.expressions.Literal.create(
      ArrayData.toArrayData(Array.empty[Any]), dataType))
}
