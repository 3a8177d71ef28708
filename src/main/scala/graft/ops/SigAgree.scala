package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Number of agreeing positions between two minhash signatures
  * (array<bigint>) — the LSH candidate joins' `est_jaccard` numerator.
  * Bit-identical (NativeExprsSpec) to the composed form
  * `size(filter(zip_with(a, b, (x, y) => x === y), v => v))`, which
  * evaluates an interpreted lambda per position PER CANDIDATE PAIR —
  * the round-1 HOF tax exactly where pair volume peaks. zip_with's
  * semantics reproduced: unequal lengths pad with null and a null
  * comparison is not counted, so the count runs over the shared prefix;
  * null ELEMENTS likewise don't count.
  *
  * Codegen: static [[SigAgree.compute]] shared by eval and doGenCode.
  */
case class SigAgree(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType

  // the SQL-registered form accepts arbitrary expressions: compute()
  // reads 8-byte elements, so a non-bigint array (e.g. the natural
  // array(1,2,3) int literal) must fail ANALYSIS rather than return
  // garbage agreement counts from misaligned reads
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigAgree.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.SigAgree.compute($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigAgree =
    copy(left = l, right = r)
  override def prettyName: String = "sig_agree"
}

object SigAgree {
  /** Column API: agreeing-position count of two array<bigint> columns. */
  def sig_agree(a: Column, b: Column): Column =
    ColumnBridge.column(SigAgree(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** The composed-builtins twin — the semantic definition the native
    * expression must match (NativeExprsSpec pins bit-identity).
    */
  private[graft] def sigAgreeComposed(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    size(filter(zip_with(a, b, (x, y) => x === y), v => v))
  }

  /** One-loop body shared by eval and the generated code. */
  def compute(x: ArrayData, y: ArrayData): Int = {
    val n = math.min(x.numElements(), y.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
        agree += 1
      i += 1
    }
    agree
  }
}
