package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash over an array of feature hashes (e.g. word shingles):
  * each feature votes on all 64 bit positions; the signature takes the
  * sign of each vote sum. Near-duplicate documents differ in few bits
  * (Charikar 2002, public algorithm).
  *
  * Implemented as a native Catalyst Expression (not a Scala UDF): null
  * handling and input traversal stay inside the expression. Codegen: the
  * vote loop lives in the static [[SimHash64.compute]]; doGenCode calls
  * it so the signature projection stays inside whole-stage codegen
  * (A/B in BENCH/CODEGEN.md).
  */
case class SimHash64(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType

  // analysis-time guard for the SQL-registered form: compute() reads
  // 8-byte elements, so a non-bigint array must fail analysis instead of
  // voting on misaligned getLong reads (the plain `inputTypes` member
  // this replaces was dead — UnaryExpression doesn't mix in
  // ExpectsInputTypes, so nothing ever consulted it)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an ARRAY<BIGINT> argument, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Column API: simhash of an array<bigint> of feature hashes. */
  def simhash(features: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(features)))

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(
      a.bitwiseXOR(b))

  /** Vote-loop body shared by eval and the generated code. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
