package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity in ONE walk of both arrays. Bit-identical (pinned by
  * NativeExprsSpec) to the composed form in
  * [[Similarity.cosineComposed]] — three aggregate/zip_with folds
  * (dot(a,b), dot(a,a), dot(b,b)) of interpreted lambdas per row pair.
  * All three partial sums accumulate in the same element order with the
  * same double arithmetic, so the IEEE result matches exactly.
  *
  * Composed-form null semantics replicated: zip_with pads unequal lengths
  * with nulls and a null element nulls the fold -> unequal lengths or any
  * null element yield NULL. One deliberate improvement: a zero norm (or
  * empty vectors) yields NaN — the ANSI-mode composed division THROWS
  * DIVIDE_BY_ZERO there, which is hostile mid-pipeline; NaN compares
  * false against any similarity threshold, so degenerate vectors simply
  * never become candidates.
  *
  * Codegen: the walk lives in the static [[CosineSim.compute]] (boxed
  * Double, null on mismatch); doGenCode calls it so the rerank-join
  * projections stay inside whole-stage codegen (A/B in BENCH/CODEGEN.md).
  */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // analysis-time guard for the SQL-registered form: compute() reads
  // float/double elements per side (mixed widths allowed — each side's
  // reader is chosen independently), so anything else must fail analysis
  // instead of ClassCastException-ing at first eval
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<FLOAT|DOUBLE> arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val lFloat = isFloat(left)
  private lazy val rFloat = isFloat(right)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      lFloat, rFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("cosRes")
      s"""
         |java.lang.Double $res =
         |  graft.ops.CosineSim.compute($a, $b, $lFloat, $rFloat);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

object CosineSim {
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** One-walk body shared by eval and the generated code. Boxed so the
    * composed twin's null contract (unequal lengths / null elements)
    * survives the static call.
    */
  def compute(x: ArrayData, y: ArrayData,
              lFloat: Boolean, rFloat: Boolean): java.lang.Double = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rFloat) y.getFloat(i).toDouble else y.getDouble(i)
      ab += xv * yv
      aa += xv * xv
      bb += yv * yv
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }
}
