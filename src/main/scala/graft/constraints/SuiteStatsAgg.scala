package graft.constraints

import org.apache.datasketches.hll.{HllSketch, Union => HllUnion}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ALL per-source suite statistics in ONE aggregate — the reference's
  * extract-then-merge monoid (core.clj:22-27) in its literal Spark form:
  * `update` extracts one row into the stat buffer (a single walk of the
  * token array computes size/nulls/min/max, the vocab histogram, and the
  * violation flags), `merge` combines buffers (counters add, min/max
  * fold, HLL union, KLL merge, histogram vector-add).
  *
  * Why fused instead of 16 composed aggregate expressions (kept as
  * [[Validator.sourceStatsComposed]], the semantic oracle pinned by
  * SuiteStatsSpec): the composed plan walks each token array TWICE
  * (TokenStats + TokenHistAgg) and evaluates each flag separately; at
  * saturation the second walk alone costs ~25% of suite throughput. One
  * buffer per (partition, source) means the partial shuffle still ships
  * KBs per input split, never rows.
  *
  * Flag semantics mirror [[Validator.rowFlags]] + the coalesce defaults in
  * the composed aggregation exactly:
  *  - ntok_mismatch: null n_tok or null tokens counts as a mismatch
  *    (coalesce(flag, TRUE));
  *  - null_token / oov_token: null input does NOT count (coalesce FALSE);
  *  - ntok_bounds: null n_tok counts (coalesce TRUE).
  */
case class SuiteStatsAgg(
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
  extends TypedImperativeAggregate[SuiteStatsAgg.Buf] {
  import SuiteStatsAgg.Buf

  override def children: Seq[Expression] = Seq(docId, tokens, nTok)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SuiteStatsAgg =
    copy(docId = c(0), tokens = c(1), nTok = c(2))

  override def createAggregationBuffer(): Buf = new Buf(bins, kllK)

  private lazy val binLut: Array[Int] =
    Array.tabulate(vocab)(t => (t.toLong * bins / vocab).toInt)

  override def update(buf: Buf, input: InternalRow): Buf = {
    SuiteStatsAgg.updateRow(buf,
      docId.eval(input).asInstanceOf[UTF8String],
      nTok.eval(input).asInstanceOf[Integer],
      tokens.eval(input),
      vocab, minNtokCfg, maxNtokCfg, bins, binLut)
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = a.mergeIn(b)

  override def eval(buf: Buf): Any = SuiteStatsAgg.evalBuf(buf)

  override def serialize(buf: Buf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Buf = Buf.fromBytes(bytes, bins, kllK)

  override def withNewMutableAggBufferOffset(o: Int): SuiteStatsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SuiteStatsAgg =
    copy(inputAggBufferOffset = o)

  override def dataType: DataType = SuiteStatsAgg.schema
  override def nullable: Boolean = false
  override def prettyName: String = "suite_stats_agg"
}

object SuiteStatsAgg {

  /** Field layout of the produced struct — matches the composed
    * [[Validator.sourceStatsComposed]] column-for-column (minus the
    * grouping key).
    */
  val schema: StructType = StructType(Seq(
    StructField("n_rows", LongType, nullable = false),
    StructField("n_ntok_mismatch", LongType, nullable = false),
    StructField("n_null_token", LongType, nullable = false),
    StructField("n_oov_token", LongType, nullable = false),
    StructField("n_ntok_bounds", LongType, nullable = false),
    StructField("n_null_docid", LongType, nullable = false),
    StructField("min_ntok", IntegerType, nullable = true),
    StructField("max_ntok", IntegerType, nullable = true),
    StructField("min_token", IntegerType, nullable = true),
    StructField("max_token", IntegerType, nullable = true),
    StructField("min_docid_len", IntegerType, nullable = true),
    StructField("max_docid_len", IntegerType, nullable = true),
    StructField("approx_distinct_docid", LongType, nullable = false),
    StructField("hll_docid", BinaryType, nullable = false),
    StructField("kll_ntok", BinaryType, nullable = false),
    StructField("hist_token", ArrayType(LongType, containsNull = false), nullable = false)))

  /** One row folded into a buffer — the single fused walk (shared with
    * [[SuiteStatsBySourceAgg]] so the one-scan path is update-identical).
    */
  private[constraints] def updateRow(
      buf: Buf, d: UTF8String, nt: Integer, arrRaw: Any,
      vocab: Int, minNtokCfg: Int, maxNtokCfg: Int,
      bins: Int, binLut: Array[Int]): Unit = {
    buf.nRows += 1

    if (d == null) buf.nNullDocid += 1
    else {
      buf.hll.update(d.getBytes)
      val len = d.numChars()
      if (!buf.seenDLen || len < buf.minDLen) buf.minDLen = len
      if (!buf.seenDLen || len > buf.maxDLen) buf.maxDLen = len
      buf.seenDLen = true
    }

    if (nt != null) {
      val v = nt.intValue()
      buf.kll.update(v.toDouble)
      if (!buf.seenNtok || v < buf.minNtok) buf.minNtok = v
      if (!buf.seenNtok || v > buf.maxNtok) buf.maxNtok = v
      buf.seenNtok = true
      if (v < minNtokCfg || v > maxNtokCfg) buf.nBounds += 1
    } else buf.nBounds += 1 // coalesce(flag, TRUE)

    if (arrRaw == null) {
      buf.nMismatch += 1 // token stats null -> flag null -> coalesce TRUE
    } else {
      val arr = arrRaw.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var nNull = 0
      var mn = Int.MaxValue
      var mx = Int.MinValue
      var seen = false
      val lut = binLut
      val hist = buf.hist
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) nNull += 1
        else {
          val t = arr.getInt(i)
          if (t < mn) mn = t
          if (t > mx) mx = t
          seen = true
          val bin = if (t < 0) 0 else if (t >= vocab) bins - 1 else lut(t)
          hist(bin) += 1
        }
        i += 1
      }
      if (nt == null || nt.intValue() != n) buf.nMismatch += 1
      if (nNull > 0) buf.nNullTok += 1
      if (seen && (mn < 0 || mx >= vocab)) buf.nOov += 1
      if (seen) {
        if (!buf.seenTok || mn < buf.minTok) buf.minTok = mn
        if (!buf.seenTok || mx > buf.maxTok) buf.maxTok = mx
        buf.seenTok = true
      }
    }
  }

  /** Buffer -> stats struct (shared with [[SuiteStatsBySourceAgg]]). */
  private[constraints] def evalBuf(buf: Buf): InternalRow = {
    def optI(seen: Boolean, v: Int): Any = if (seen) Int.box(v) else null
    InternalRow(
      buf.nRows, buf.nMismatch, buf.nNullTok, buf.nOov, buf.nBounds,
      buf.nNullDocid,
      optI(buf.seenNtok, buf.minNtok), optI(buf.seenNtok, buf.maxNtok),
      optI(buf.seenTok, buf.minTok), optI(buf.seenTok, buf.maxTok),
      optI(buf.seenDLen, buf.minDLen), optI(buf.seenDLen, buf.maxDLen),
      // Math.round matches hll_sketch_estimate (which returns a rounded
      // long); the buffer mirrors hll_sketch_agg's exact structure
      // (HllSketch(12, HLL_8) + Union at merge), so the sketch bytes —
      // and hence this estimate — are bit-equal to the composed plan's
      math.round(buf.hll.getEstimate),
      buf.hll.toUpdatableByteArray,
      buf.kll.toByteArray,
      new GenericArrayData(buf.hist))
  }

  def suite_stats(docId: Column, tokens: Column, nTok: Column,
                  cfg: Validator.SuiteConfig): Column =
    ColumnBridge.column(SuiteStatsAgg(
      ColumnBridge.expression(docId), ColumnBridge.expression(tokens),
      ColumnBridge.expression(nTok),
      cfg.vocabSize, cfg.minNtok, cfg.maxNtok,
      cfg.tokenHistBins, cfg.kllK).toAggregateExpression())

  /** Aggregation buffer: plain counters + the three mergeable sketches.
    * The HLL buffer is a directly-updated HllSketch with Union applied
    * only at merge — the exact structure of Spark's hll_sketch_agg, so
    * the fused estimate is bit-equal to the composed plan's.
    */
  final class Buf(bins: Int, kllK: Int) {
    var nRows, nMismatch, nNullTok, nOov, nBounds, nNullDocid = 0L
    var minNtok, maxNtok, minTok, maxTok, minDLen, maxDLen = 0
    var seenNtok, seenTok, seenDLen = false
    var hll = new HllSketch(12, org.apache.datasketches.hll.TgtHllType.HLL_8)
    var kll: KllDoublesSketch = KllDoublesSketch.newHeapInstance(kllK)
    val hist = new Array[Long](bins)

    def mergeIn(b: Buf): Buf = {
      nRows += b.nRows; nMismatch += b.nMismatch; nNullTok += b.nNullTok
      nOov += b.nOov; nBounds += b.nBounds; nNullDocid += b.nNullDocid
      if (b.seenNtok) {
        if (!seenNtok || b.minNtok < minNtok) minNtok = b.minNtok
        if (!seenNtok || b.maxNtok > maxNtok) maxNtok = b.maxNtok
        seenNtok = true
      }
      if (b.seenTok) {
        if (!seenTok || b.minTok < minTok) minTok = b.minTok
        if (!seenTok || b.maxTok > maxTok) maxTok = b.maxTok
        seenTok = true
      }
      if (b.seenDLen) {
        if (!seenDLen || b.minDLen < minDLen) minDLen = b.minDLen
        if (!seenDLen || b.maxDLen > maxDLen) maxDLen = b.maxDLen
        seenDLen = true
      }
      val u = new HllUnion(12)
      u.update(hll); u.update(b.hll)
      hll = u.getResult(org.apache.datasketches.hll.TgtHllType.HLL_8)
      kll.merge(b.kll)
      var i = 0
      while (i < hist.length) { hist(i) += b.hist(i); i += 1 }
      this
    }

    def toBytes: Array[Byte] = {
      val hllB = hll.toUpdatableByteArray
      val kllB = kll.toByteArray
      val bb = java.nio.ByteBuffer.allocate(
        6 * 8 + 6 * 4 + 3 + 4 + hist.length * 8 + 4 + hllB.length + 4 + kllB.length)
      bb.putLong(nRows).putLong(nMismatch).putLong(nNullTok)
        .putLong(nOov).putLong(nBounds).putLong(nNullDocid)
      bb.putInt(minNtok).putInt(maxNtok).putInt(minTok).putInt(maxTok)
        .putInt(minDLen).putInt(maxDLen)
      bb.put(if (seenNtok) 1.toByte else 0.toByte)
      bb.put(if (seenTok) 1.toByte else 0.toByte)
      bb.put(if (seenDLen) 1.toByte else 0.toByte)
      bb.putInt(hist.length); hist.foreach(bb.putLong)
      bb.putInt(hllB.length); bb.put(hllB)
      bb.putInt(kllB.length); bb.put(kllB)
      bb.array()
    }
  }

  object Buf {
    def fromBytes(bytes: Array[Byte], bins: Int, kllK: Int): Buf = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val b = new Buf(bins, kllK)
      b.nRows = bb.getLong(); b.nMismatch = bb.getLong(); b.nNullTok = bb.getLong()
      b.nOov = bb.getLong(); b.nBounds = bb.getLong(); b.nNullDocid = bb.getLong()
      b.minNtok = bb.getInt(); b.maxNtok = bb.getInt(); b.minTok = bb.getInt()
      b.maxTok = bb.getInt(); b.minDLen = bb.getInt(); b.maxDLen = bb.getInt()
      b.seenNtok = bb.get() == 1; b.seenTok = bb.get() == 1; b.seenDLen = bb.get() == 1
      val hl = bb.getInt()
      var i = 0
      while (i < hl) { b.hist(i) = bb.getLong(); i += 1 }
      val hllLen = bb.getInt(); val hllB = new Array[Byte](hllLen); bb.get(hllB)
      b.hll = HllSketch.heapify(hllB)
      val kllLen = bb.getInt(); val kllB = new Array[Byte](kllLen); bb.get(kllB)
      b.kll = KllDoublesSketch.heapify(Memory.wrap(kllB))
      b
    }
  }
}
