package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH signature (cosine LSH, Charikar 2002) as ONE
  * native loop per row. Bit-identical (pinned by NativeExprsSpec) to the
  * composed form in [[Similarity.rhpSignatureComposed]], which evaluates
  * `planes * dim` interpreted lambdas with a full xxhash64 chain each:
  * component j of plane p is +1/-1 from the parity of
  * xxhash64(seed: long, p: int, j: int) (Spark hash chain, seed 42); bit p
  * of the signature is set iff the plane's dot product is >= 0. The
  * chain prefix hashInt(p, hashLong(seed, 42)) is plan-time constant; the
  * per-element tail is a single XXH64.hashInt. Summation order matches the
  * composed fold exactly (same IEEE doubles).
  *
  * A null ELEMENT nulls every plane's fold in the composed form, so every
  * bit takes the otherwise(0L) branch -> signature 0; replicated here. A
  * null ARRAY yields null (the composed form yields 0L for that degenerate
  * case; callers treat both as "no bucket").
  *
  * Codegen: the loop lives in the static [[RhpSignature.compute]]; the
  * plan-time prefix table rides into the generated code as a reference
  * object (A/B in BENCH/CODEGEN.md).
  */
case class RhpSignature(child: Expression, planes: Int, seed: Long)
  extends UnaryExpression {
  require(planes >= 1 && planes < 64, "planes must be in [1, 63]")

  override def dataType: DataType = LongType

  // analysis-time guard for the SQL-registered form: compute() reads
  // float/double elements (and `isFloat` below blindly casts the child
  // type to ArrayType), so anything else must fail analysis instead of
  // ClassCastException-ing at first eval
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | org.apache.spark.sql.types.DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an ARRAY<FLOAT> or ARRAY<DOUBLE> argument, " +
            s"got ${other.sql}")
    }

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // hash-chain prefix per plane, fixed at plan time
  private lazy val prefix: Array[Long] =
    Array.tabulate(planes)(p => XXH64.hashInt(p, XXH64.hashLong(seed, 42L)))

  override protected def nullSafeEval(input: Any): Any =
    RhpSignature.compute(input.asInstanceOf[ArrayData], prefix, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val prefixRef = ctx.addReferenceObj("rhpPrefix", prefix, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.ops.RhpSignature.compute($c, $prefixRef, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): RhpSignature =
    copy(child = newChild)
  override def prettyName: String = "rhp_signature"
}

object RhpSignature {
  /** Column API: 64-bit RHP-LSH bucket signature of a float/double array. */
  def rhp_signature(vec: Column, planes: Int, seed: Long): Column =
    ColumnBridge.column(RhpSignature(ColumnBridge.expression(vec), planes, seed))

  /** Driver-side signature of one in-memory vector — the same prefix
    * derivation and compute body as the expression (bit-identical), for
    * per-query probes where launching a Spark job over a single vector
    * would be pure scheduler latency.
    */
  def computeDriver(vec: Seq[Float], planes: Int, seed: Long): Long =
    compute(new GenericArrayData(vec.toArray),
      Array.tabulate(planes)(p => XXH64.hashInt(p, XXH64.hashLong(seed, 42L))),
      isFloat = true)

  /** One-loop body shared by eval and the generated code. */
  def compute(arr: ArrayData, prefix: Array[Long], isFloat: Boolean): Long = {
    val planes = prefix.length
    val n = arr.numElements()
    // composed-form quirk: sequence(0, size-1) on an EMPTY array yields
    // the descending [0,-1], zip_with pads with null x -> null folds ->
    // every bit 0. An empty vector has no meaningful bucket anyway.
    if (n == 0) return 0L
    val dots = new Array[Double](planes)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return 0L
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      var p = 0
      while (p < planes) {
        val h = XXH64.hashInt(i, prefix(p))
        dots(p) += (if ((h & 1L) == 0L) x else -x)
        p += 1
      }
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < planes) {
      if (dots(p) >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}
