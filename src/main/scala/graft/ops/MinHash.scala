package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a native Catalyst expression: for each shingle
  * hash, the p-th permutation is a splitmix64 finalizer of
  * (hash XOR seed_p) with golden-gamma odd seeds, min-reduced per
  * permutation — one tight JVM loop per row, ~perms*n integer mixes, no
  * per-element boxing.
  *
  * This is the standard minhash construction, NOT a twin of any
  * composed-builtins formula: an HOF equivalent (e.g.
  * `transform(0..perms, p -> array_min(transform(shingles, mix_p)))`)
  * would pay `perms * n` interpreted lambdas per row (Spark's HOFs don't
  * participate in codegen) and, with a different per-permutation mix,
  * would produce DIFFERENT signature values — do not write oracles from
  * a formula; the semantics are pinned by the fuzzed LSH recall/agreement
  * properties (OpsSpec, StreamingPipelineSpec's signature-kernel oracle,
  * which calls this same expression). Signature values are part of every
  * persisted index's layout contract (seeds are frozen).
  *
  * Codegen: the loop lives in the static [[MinHash64.compute]]; the
  * plan-time seed table rides into the generated code as a reference
  * object, so the signature projection stays inside whole-stage codegen
  * (A/B in BENCH/CODEGEN.md).
  */
case class MinHash64(child: Expression, perms: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // the SQL-registered form accepts arbitrary expressions: compute()
  // reads 8-byte elements, so a non-bigint array (the natural
  // array(1,2,3) int literal) must fail ANALYSIS rather than hash
  // garbage from misaligned getLong reads (same hazard class SigAgree
  // documents)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an ARRAY<BIGINT> argument, got ${other.sql}")
    }

  // golden-gamma odd constants per permutation, fixed at plan time
  private lazy val seeds: Array[Long] =
    Array.tabulate(perms)(p => 0x9E3779B97F4A7C15L * (2L * p + 1L))

  override protected def nullSafeEval(input: Any): Any =
    MinHash64.compute(input.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.ops.MinHash64.compute($c, $seedsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)
  override def prettyName: String = "minhash64"
}

object MinHash64 {
  /** Column API: minhash signature (array<bigint>, length `perms`) of an
    * array<bigint> of shingle hashes.
    */
  def minhash(shingleHashes: Column, perms: Int = 32): Column =
    ColumnBridge.column(MinHash64(ColumnBridge.expression(shingleHashes), perms))

  @inline private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** One-loop body shared by eval and the generated code. */
  def compute(arr: ArrayData, seeds: Array[Long]): ArrayData = {
    val perms = seeds.length
    val mins = Array.fill(perms)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var p = 0
        while (p < perms) {
          val v = mix(h ^ seeds(p))
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
