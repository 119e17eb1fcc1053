package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: deflate(text).length / text.length
  * over the UTF-8 bytes, fixed level. The standard cheap boilerplate /
  * repetition screen in corpus curation (RefinedWeb/Dolma-style gzip
  * filters): heavily templated or repeated text compresses far below
  * natural prose (~0.4-0.6), while high-entropy noise sits near (or
  * just above) 1.0. Deterministic for a fixed level and JDK zlib; one
  * pass per document, no shuffle, stays inside whole-stage codegen.
  * Empty text → 1.0 (nothing to compress, nothing saved).
  */
case class DeflateRatio(child: Expression, level: Int)
    extends UnaryExpression {
  require(level >= 1 && level <= 9, s"deflate_ratio level must be 1..9, got $level")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got ${t.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    DeflateRatio.ratio(input.asInstanceOf[UTF8String].getBytes, level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateRatio$$.MODULE$$.ratio($c.getBytes(), $level);")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {
  /** deflate(bytes).length / bytes.length at the given level; 1.0 for
    * empty input. Raw deflate (nowrap) — no gzip header noise, so short
    * strings aren't dominated by framing overhead. */
  def ratio(bytes: Array[Byte], level: Int): Double = {
    val n = bytes.length
    if (n == 0) return 1.0
    val deflater = new java.util.zip.Deflater(level, true)
    try {
      deflater.setInput(bytes)
      deflater.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!deflater.finished()) total += deflater.deflate(buf)
      total.toDouble / n
    } finally deflater.end()
  }

  def column(c: Column, level: Int = 6): Column =
    GraftGlue.column(DeflateRatio(GraftGlue.expression(c), level))
}
