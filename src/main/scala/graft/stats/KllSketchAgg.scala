package graft.stats

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** KLL quantile sketch aggregate (datasketches-java, bundled with Spark).
  *
  * The scale-out analog of the reference's stats-bearing types: where the
  * reference tracks only min/max per scalar (types.clj:125-136), a KLL
  * sketch carries the whole distribution with bounded error and — like the
  * reference's merge — composes as a commutative monoid, so partial
  * per-partition sketches merge into exact-lineage global ones. Used for
  * the distribution-drift (PSI/KS) constraint checks.
  *
  * Mergeable partial aggregation: Spark plans this as
  * ObjectHashAggregateExec with map-side partials, so at cluster scale each
  * executor ships one ~KB sketch per group, never rows.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      buf.update(v match {
        case d: java.lang.Double  => d.doubleValue()
        case f: java.lang.Float   => f.toDouble
        case l: java.lang.Long    => l.toDouble
        case i: java.lang.Integer => i.toDouble
        case s: java.lang.Short   => s.toDouble
        case b: java.lang.Byte    => b.toDouble
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case other => other.toString.toDouble
      })
    }
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"
}

object KllSketchAgg {
  /** Column API: `df.agg(kll_sketch(col("n_tok")))` -> binary sketch. */
  def kll_sketch(c: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllSketchAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  def fromBytes(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  def mergeBytes(sketches: Iterable[Array[Byte]], k: Int = 200): KllDoublesSketch = {
    val acc = KllDoublesSketch.newHeapInstance(k)
    sketches.foreach(b => acc.merge(fromBytes(b)))
    acc
  }
}
