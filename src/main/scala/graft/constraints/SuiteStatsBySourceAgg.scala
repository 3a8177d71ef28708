package graft.constraints

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** [[SuiteStatsAgg]] keyed by source INSIDE one global aggregate, so the
  * whole per-source stats table can ride a `df.observe(...)` CollectMetrics
  * node on the violations scan — the suite's two full-data passes (stats
  * groupBy + violations filter) collapse into ONE. At 100 TB that halves
  * the dominant cost, the table scan; the observe aggregation is the same
  * map-side-partial monoid (per-task buffers merged by an accumulator, KBs
  * on the wire, never rows).
  *
  * The buffer is a hash map source -> [[SuiteStatsAgg.Buf]]; per-row update
  * and buffer eval are the SAME code as the groupBy aggregate
  * ([[SuiteStatsAgg.updateRow]]/[[SuiteStatsAgg.evalBuf]]), so the two
  * paths cannot drift. Memory is O(#sources): right for partition-like
  * source cardinality (the table's layout key). For unbounded/high-card
  * grouping keys use the classic groupBy path instead — a map-per-task
  * with millions of keys belongs in a real aggregation exchange.
  *
  * Output: array<struct<source, stats>>, sorted by source (nulls first)
  * for deterministic row order.
  */
case class SuiteStatsBySourceAgg(
    source: Expression,
    docId: Expression,
    tokens: Expression,
    nTok: Expression,
    vocab: Int,
    minNtokCfg: Int,
    maxNtokCfg: Int,
    bins: Int,
    kllK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Option[String], SuiteStatsAgg.Buf]] {
  import SuiteStatsAgg.Buf

  override def children: Seq[Expression] = Seq(source, docId, tokens, nTok)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SuiteStatsBySourceAgg =
    copy(source = c(0), docId = c(1), tokens = c(2), nTok = c(3))

  override def createAggregationBuffer(): mutable.HashMap[Option[String], Buf] =
    mutable.HashMap.empty

  private lazy val binLut: Array[Int] =
    Array.tabulate(vocab)(t => (t.toLong * bins / vocab).toInt)

  override def update(
      m: mutable.HashMap[Option[String], Buf],
      input: InternalRow): mutable.HashMap[Option[String], Buf] = {
    val s = Option(source.eval(input).asInstanceOf[UTF8String]).map(_.toString)
    val buf = m.getOrElseUpdate(s, new Buf(bins, kllK))
    SuiteStatsAgg.updateRow(buf,
      docId.eval(input).asInstanceOf[UTF8String],
      nTok.eval(input).asInstanceOf[Integer],
      tokens.eval(input),
      vocab, minNtokCfg, maxNtokCfg, bins, binLut)
    m
  }

  override def merge(
      a: mutable.HashMap[Option[String], Buf],
      b: mutable.HashMap[Option[String], Buf]): mutable.HashMap[Option[String], Buf] = {
    b.foreach { case (s, buf) =>
      a.get(s) match {
        case Some(mine) => mine.mergeIn(buf)
        case None       => a(s) = buf
      }
    }
    a
  }

  override def eval(m: mutable.HashMap[Option[String], Buf]): Any =
    new GenericArrayData(
      m.toSeq.sortBy(_._1).map { case (s, buf) =>
        InternalRow(
          s.map(UTF8String.fromString).orNull,
          SuiteStatsAgg.evalBuf(buf))
      }.toArray[Any])

  override def serialize(m: mutable.HashMap[Option[String], Buf]): Array[Byte] = {
    val entries = m.toSeq.map { case (s, buf) =>
      (s.map(_.getBytes("UTF-8")), buf.toBytes)
    }
    val size = 4 + entries.map { case (sb, bb) =>
      1 + sb.map(_.length + 4).getOrElse(0) + 4 + bb.length
    }.sum
    val out = java.nio.ByteBuffer.allocate(size)
    out.putInt(entries.size)
    entries.foreach { case (sb, bb) =>
      sb match {
        case Some(b) => out.put(1.toByte); out.putInt(b.length); out.put(b)
        case None    => out.put(0.toByte)
      }
      out.putInt(bb.length); out.put(bb)
    }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Option[String], Buf] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val m = mutable.HashMap.empty[Option[String], Buf]
    val n = in.getInt()
    var i = 0
    while (i < n) {
      val s = if (in.get() == 1) {
        val len = in.getInt(); val b = new Array[Byte](len); in.get(b)
        Some(new String(b, "UTF-8"))
      } else None
      val blen = in.getInt(); val bb = new Array[Byte](blen); in.get(bb)
      m(s) = SuiteStatsAgg.Buf.fromBytes(bb, bins, kllK)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): SuiteStatsBySourceAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SuiteStatsBySourceAgg =
    copy(inputAggBufferOffset = o)

  override def dataType: DataType = SuiteStatsBySourceAgg.dataTypeDef
  override def nullable: Boolean = false
  override def prettyName: String = "suite_stats_by_source"
}

object SuiteStatsBySourceAgg {
  val dataTypeDef: ArrayType = ArrayType(StructType(Seq(
    StructField("source", StringType, nullable = true),
    StructField("stats", SuiteStatsAgg.schema, nullable = false))),
    containsNull = false)

  def suite_stats_by_source(source: Column, docId: Column, tokens: Column,
                            nTok: Column, cfg: Validator.SuiteConfig): Column =
    ColumnBridge.column(SuiteStatsBySourceAgg(
      ColumnBridge.expression(source), ColumnBridge.expression(docId),
      ColumnBridge.expression(tokens), ColumnBridge.expression(nTok),
      cfg.vocabSize, cfg.minNtok, cfg.maxNtok,
      cfg.tokenHistBins, cfg.kllK).toAggregateExpression())
}
