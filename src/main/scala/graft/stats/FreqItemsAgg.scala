package graft.stats

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy-hitters) sketch aggregate over a string column —
  * the Misra-Gries-family ItemsSketch from datasketches-java (bundled
  * with Spark). This is the 100-TB path for vocabulary profiling: the
  * exact top-k (q38's shape) shuffles one row per DISTINCT (group, word)
  * — at web scale that exchange is the corpus vocabulary itself — while
  * the sketch ships ONE bounded buffer (~maxMapSize entries) per
  * (partition, group), like every other sketch in the suite. The trade is
  * bounded rank error on items near the purge threshold; items with
  * frequency above ~N/maxMapSize survive exactly (Misra-Gries guarantee),
  * so a generously-sized map returns the exact head. FreqSketchSpec pins
  * sketch top-k == exact top-k on the graded corpus.
  *
  * Returns array<struct<word, est, lb, ub>> sorted by estimate DESC then
  * word ASC (deterministic), restricted to NO_FALSE_NEGATIVES frequent
  * items: every true heavy hitter appears; lb/ub bound its true count.
  */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
    with UnaryLike[Expression] {
  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    "maxMapSize must be a power of 2 >= 8")

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] =
    a.merge(b)

  override def eval(buf: ItemsSketch[String]): Any = {
    val rows = buf.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .map(r => InternalRow(UTF8String.fromString(r.getItem),
        r.getEstimate, r.getLowerBound, r.getUpperBound))
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(new ArrayOfStringsSerDe())
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsAgg =
    copy(child = newChild)

  override def dataType: DataType = FreqItemsAgg.schema
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items_agg"
}

object FreqItemsAgg {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("word", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)

  /** Column API: `df.groupBy(g).agg(freq_items(col("word"), 4096))`. */
  def freq_items(word: Column, maxMapSize: Int): Column =
    ColumnBridge.column(
      FreqItemsAgg(ColumnBridge.expression(word), maxMapSize)
        .toAggregateExpression())
}
