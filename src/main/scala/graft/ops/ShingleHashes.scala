package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Word k-shingle hashes as ONE native pass over the string bytes.
  *
  * Bit-identical to the composed-builtins formulation (pinned by
  * NativeExprsSpec):
  * {{{
  *   when(size(split(text," ")) < k, array(xxhash64(text)))
  *     .otherwise(transform(sequence(0, n-k),
  *       i => xxhash64(concat_ws(" ", slice(split(text," "), i+1, k)))))
  * }}}
  * which evaluates ~n interpreted lambdas each allocating a slice array
  * and a concatenated string. The identity that makes the native form
  * allocation-free: `split` on the single-char separator " " partitions
  * the bytes at every 0x20, so re-joining k consecutive words with " "
  * reproduces EXACTLY the original byte slice [start(i), end(i+k-1)) —
  * the shingle hash is xxhash64 (seed 42, same as Spark's) over a slice
  * of the input UTF8String. 0x20 never occurs inside a multi-byte UTF-8
  * sequence, so the byte scan is unicode-safe.
  */
case class ShingleHashes(child: Expression, k: Int)
  extends UnaryExpression {
  require(k >= 1, "shingle width k must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.ShingleHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  /** Column API: array<bigint> of word k-shingle hashes of a string. */
  def shingle_hashes(text: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), k))

  /** One-pass body shared by eval and the generated code (codegen keeps
    * the shingle projection inside whole-stage codegen; BENCH/CODEGEN.md).
    */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var nWords = 1
    var i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == 0x20) nWords += 1
      i += 1
    }
    if (nWords < k)
      return new GenericArrayData(
        Array(XXH64.hashUnsafeBytes(base, off, len, 42L)))
    // starts(w) = byte index of word w; sentinel len+1 makes the shared
    // end formula e = starts(j+k)-1 (drop the separating space) hold for
    // the final window too
    val starts = new Array[Int](nWords + 1)
    var w = 1
    i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == 0x20) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(nWords) = len + 1
    val out = new Array[Long](nWords - k + 1)
    var j = 0
    while (j < out.length) {
      val b = starts(j)
      val e = starts(j + k) - 1
      out(j) = XXH64.hashUnsafeBytes(base, off + b, e - b, 42L)
      j += 1
    }
    new GenericArrayData(out)
  }
}
