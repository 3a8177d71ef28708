package graft.ops

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Character-class census in ONE byte walk:
  * (n_chars, n_alpha, n_digit, n_ws) — the inputs of every TextOps ratio.
  * The composed formulation builds THREE regexp_replace copies of the
  * string per row (one per class) plus length() walks; this expression
  * replaces them with a single pass and zero allocation.
  *
  * Semantics pinned to the regex twins ([[TextOps.alphaRatioComposed]]
  * etc., CharClassSpec): [A-Za-z] / [0-9] / Java `\s` (= space \t \n \x0B
  * \f \r) are all single-byte ASCII classes, so a byte < 0x80 decides
  * membership directly and multibyte characters can never match — exactly
  * the regex behavior. n_chars counts CODEPOINTS (every byte that is not
  * a UTF-8 continuation byte), matching Spark's length().
  *
  * Codegen: the walk lives in the static [[CharClassCounts.compute]];
  * doGenCode emits a call to it, so the surrounding projection stays
  * inside whole-stage codegen (measured vs the CodegenFallback build in
  * BENCH/CODEGEN.md) while eval and the generated path share ONE body.
  */
case class CharClassCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CharClassCounts.schema

  override protected def nullSafeEval(input: Any): Any =
    CharClassCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.CharClassCounts.compute($c)")

  override protected def withNewChildInternal(c: Expression): CharClassCounts =
    copy(child = c)
  override def prettyName: String = "char_class_counts"
}

object CharClassCounts {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_ws", IntegerType, nullable = false)))

  /** One-walk census body shared by eval and the generated code (called
    * via the Scala static forwarder from Janino).
    */
  def compute(s: UTF8String): InternalRow = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var chars, alpha, digit, ws = 0
    var i = 0
    while (i < len) {
      val b = Platform.getByte(base, off + i)
      if ((b & 0xC0) != 0x80) chars += 1 // not a continuation byte
      if (b >= 'A' && b <= 'Z' || b >= 'a' && b <= 'z') alpha += 1
      else if (b >= '0' && b <= '9') digit += 1
      else if (b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
        b == '\f' || b == '\r') ws += 1
      i += 1
    }
    InternalRow(chars, alpha, digit, ws)
  }
}
