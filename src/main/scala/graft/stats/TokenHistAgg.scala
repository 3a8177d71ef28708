package graft.stats

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fixed-width histogram of token ids over `array<int>` rows — the
  * drift sketch for the TOKEN-ID distribution itself (the KLL sketch in
  * the suite covers scalar columns like n_tok; this covers the payload).
  * Vocabulary range [0, vocab) maps linearly onto `bins` buckets;
  * out-of-range ids clamp to the edge buckets, null elements are skipped
  * (they have their own row-level check).
  *
  * The buffer is a bins-length long vector; update walks each token array
  * once, merge is element-wise add — a commutative monoid like every
  * other sketch in the suite, so Spark plans map-side partials and ships
  * one ~0.5 KB vector per (partition, source), never rows.
  */
case class TokenHistAgg(
    child: Expression,
    bins: Int,
    vocab: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(bins >= 2 && vocab >= 1)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins)

  // bin = floor(t * bins / vocab), precomputed: a 64-bit divide per token
  // dominates the update loop at ~200 tokens/row; the LUT (4B * vocab,
  // one per operator instance) turns it into an array read and is exact
  private lazy val binLut: Array[Int] =
    Array.tabulate(vocab)(t => (t.toLong * bins / vocab).toInt)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val lut = binLut
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val t = arr.getInt(i)
          val bin =
            if (t < 0) 0
            else if (t >= vocab) bins - 1
            else lut(t)
          buf(bin) += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bins) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * bins)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bins)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): TokenHistAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TokenHistAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): TokenHistAgg =
    copy(child = newChild)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "token_hist_agg"
}

object TokenHistAgg {
  /** Column API: `df.agg(token_hist(col("tokens"), 64, vocab))`. */
  def token_hist(tokens: Column, bins: Int, vocab: Int): Column =
    ColumnBridge.column(
      TokenHistAgg(ColumnBridge.expression(tokens), bins, vocab).toAggregateExpression())

  def add(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length)
    val out = a.clone()
    var i = 0
    while (i < out.length) { out(i) += b(i); i += 1 }
    out
  }
}
