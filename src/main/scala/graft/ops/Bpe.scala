package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Subword tokenizer: byte-pair-encoding merge training + native-expression
  * apply (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of
  * Rare Words with Subword Units" — a public algorithm; no reference-repo
  * counterpart, the reference stops at whole-string types). This closes
  * the engine's own input contract: the north-rule table carries
  * `tokens array<int>`, and until now only the `tokenCountBpeIsh` stand-in
  * ([[TextOps]]) acknowledged that somebody upstream must produce them.
  *
  * Semantics (pinned by BpeSpec + the q55 DuckDB replay):
  *   - pre-tokenize on single spaces; empty words are skipped;
  *   - a word starts as its per-character symbols (no end-of-word marker —
  *     GPT-2-style pre-tokenized words rather than subword-nmt's `</w>`);
  *   - training round r: count ALL adjacent symbol pairs (overlapping
  *     occurrences included) weighted by word frequency, pick the max
  *     count with the deterministic tie-break (count DESC, left ASC,
  *     right ASC), then merge every left-to-right NON-overlapping
  *     occurrence in every word; stop early when no pairs remain;
  *   - apply: repeatedly merge the lowest-rank pair present (all LTR
  *     non-overlapping occurrences), which for any trained word
  *     reproduces the training-time segmentation exactly: once rank r is
  *     exhausted it can never reappear (merges only create longer, newer
  *     symbols), so lowest-present-first equals rank-order replay;
  *   - ids: base characters sorted ascending get 0..nBase-1, merge r's
  *     output symbol gets nBase + r (first-wins if two merges ever
  *     produced the same string — unreachable under global rank order,
  *     kept as a guard); characters unseen in training encode as
  *     [[Bpe.UnkId]].
  *
  * Scale shape: training is ONE distributed explode+groupBy word count
  * (map-side partial agg; the shuffle carries (word, count) pairs, never
  * documents) capped at `maxWords` most-frequent words before the collect
  * — the Zipf tail beyond ~10^6 distinct words contributes a vanishing
  * share of pair mass, the standard corpus-tokenizer trade (HF/subword-nmt
  * train from exactly such a capped word-count table). The greedy merge
  * loop then runs driver-side over that vocab-sized table (seconds for
  * 10^6 words x 10^4 merges), and apply ships as a codegen'd expression
  * whose merge/vocab tables ride the plan as reference objects with a
  * per-thread word memo (corpus word frequency makes the memo hit rate
  * ~= 1 - distinct/total).
  */
object Bpe {

  /** Id for symbols outside the trained vocabulary (characters the
    * training corpus never saw). Deliberately NOT a vocab slot: downstream
    * consumers must decide whether to drop or re-train, and a silent
    * id-0 alias would corrupt token statistics.
    */
  val UnkId: Int = -1

  /** A trained tokenizer: `merges(r)` is round r's (left, right) pair;
    * `vocab` maps symbol string -> id; `nBase` is the base-alphabet size
    * (merge r's symbol has id nBase + r, modulo first-wins dedup).
    */
  final case class Model(merges: IndexedSeq[(String, String)],
                         vocab: Map[String, Int], nBase: Int) {
    /** Executor-side lookup tables, built once per deserialized model. */
    @transient lazy val runtime: BpeRuntime = new BpeRuntime(this)
  }

  /** Greedy merge training over a (word, count) table — the driver-side
    * core, unit-testable without Spark. Deterministic: ties on pair count
    * break (left ASC, right ASC); input order never matters because every
    * round's counts are re-derived from the full table.
    */
  def trainFromCounts(words: Seq[(String, Long)], numMerges: Int): Model = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val segs = new Array[Array[String]](words.size)
    val cnts = new Array[Long](words.size)
    var i = 0
    words.foreach { case (w, c) =>
      // CODEPOINT symbols, never UTF-16 units: the q55 oracle's word[i]
      // split and Spark's own string ops count codepoints, and a split
      // surrogate pair would seed the alphabet with malformed symbols
      segs(i) = NgramWalk.codePointStrings(w)
      cnts(i) = c
      i += 1
    }
    val merges = IndexedSeq.newBuilder[(String, String)]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      // count ALL adjacent pairs (overlap included), weighted by word count
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < segs.length) {
        val sy = segs(wi)
        var k = 0
        while (k < sy.length - 1) {
          val p = (sy(k), sy(k + 1))
          pairCounts.merge(p, cnts(wi), _ + _)
          k += 1
        }
        wi += 1
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        var best: (String, String) = null
        var bestC = -1L
        pairCounts.forEach { (p, c) =>
          // tie-break in CODEPOINT order (= the oracle's byte order);
          // String's own < is UTF-16 order, which misranks astral chars
          if (c > bestC || (c == bestC && {
            val l = NgramWalk.compareCodePoints(p._1, best._1)
            l < 0 || (l == 0 && NgramWalk.compareCodePoints(p._2, best._2) < 0)
          })) {
            best = p; bestC = c
          }
        }
        merges += best
        wi = 0
        while (wi < segs.length) {
          segs(wi) = mergeAll(segs(wi), best._1, best._2)
          wi += 1
        }
        r += 1
      }
    }
    val ms = merges.result()
    val base = words.iterator.flatMap(w => NgramWalk.codePointStrings(w._1))
      .toArray.distinct
      .sortWith(NgramWalk.compareCodePoints(_, _) < 0)
    val vocab = scala.collection.mutable.LinkedHashMap[String, Int]()
    base.zipWithIndex.foreach { case (s, id) => vocab(s) = id }
    ms.zipWithIndex.foreach { case ((l, rr), rank) =>
      val sym = l + rr
      if (!vocab.contains(sym)) vocab(sym) = base.length + rank
    }
    Model(ms, vocab.toMap, base.length)
  }

  /** Merge every left-to-right NON-overlapping occurrence of (l, r). */
  private[ops] def mergeAll(sy: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var k = 0
    while (k < sy.length) {
      if (k + 1 < sy.length && sy(k) == l && sy(k + 1) == r) {
        out += (l + r); k += 2
      } else {
        out += sy(k); k += 1
      }
    }
    out.result()
  }

  /** Distributed training entry: one explode+groupBy word-count pass
    * (map-side combine), capped to the `maxWords` most frequent words
    * (ties by word ASC) BEFORE the driver collect, then
    * [[trainFromCounts]]. NULL texts contribute nothing.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 1 << 20): Model = {
    val counts = df
      .filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords) // cap enforced INSIDE the plan, never after collect
      .collect()
      .map(row => (row.getString(0), row.getLong(1)))
      .toSeq
    trainFromCounts(counts, numMerges)
  }

  /** `array<int>` token ids for a text column under a trained model. */
  def encode(text: Column, model: Model): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(text), model))

  /** Driver-side single-string encode (the oracle-parity surface BpeSpec
    * pins the expression against).
    */
  def encodeString(text: String, model: Model): Array[Int] =
    BpeEncode.computeIds(text, model.runtime)
}

/** Executor-side tables: merge ranks keyed by the (l, r) PAIR (the
  * pre-round-7 shape joined `l + NUL + r` into one string key, making
  * distinct pairs that contain raw NULs collide — web corpora do carry
  * control bytes; ADVICE r06), vocab symbol -> id, and a per-thread
  * word -> ids memo (bounded; corpus word reuse makes the hit rate high,
  * and the memo never crosses threads).
  */
final class BpeRuntime(model: Bpe.Model) extends Serializable {
  val ranks = new java.util.HashMap[(String, String), Integer]()
  val pairs = new Array[(String, String)](model.merges.length)
  model.merges.zipWithIndex.foreach { case ((l, r), i) =>
    pairs(i) = (l, r)
    ranks.put(pairs(i), i)
  }
  val vocab = new java.util.HashMap[String, Integer]()
  model.vocab.foreach { case (s, id) => vocab.put(s, id) }

  private val MemoCap = 1 << 16
  // ThreadLocal is not Serializable — rebuilt (empty) per deserialized copy
  @transient private lazy val memo =
    ThreadLocal.withInitial[java.util.HashMap[String, Array[Int]]](() =>
      new java.util.HashMap[String, Array[Int]]())

  def encodeWord(w: String): Array[Int] = {
    val m = memo.get()
    val hit = m.get(w)
    if (hit != null) return hit
    var sy = NgramWalk.codePointStrings(w)
    var done = false
    while (!done && sy.length > 1) {
      var bestRank = Int.MaxValue
      var k = 0
      while (k < sy.length - 1) {
        val rk = ranks.get((sy(k), sy(k + 1)))
        if (rk != null && rk < bestRank) bestRank = rk
        k += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (l, r) = pairs(bestRank)
        sy = Bpe.mergeAll(sy, l, r)
      }
    }
    val ids = new Array[Int](sy.length)
    var i = 0
    while (i < sy.length) {
      val id = vocab.get(sy(i))
      ids(i) = if (id == null) Bpe.UnkId else id.intValue()
      i += 1
    }
    if (m.size < MemoCap) m.put(w, ids)
    ids
  }
}

/** Native tokenize: text -> array<int> under a trained [[Bpe.Model]].
  * One walk per document plus the per-word memo; the HOF-composed
  * alternative (transform over split) would interpret a lambda per word
  * per doc (round-1 tax). Codegen via the static-compute pattern with the
  * runtime tables as a plan reference object.
  */
case class BpeEncode(child: Expression, model: Bpe.Model)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a STRING argument, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.compute(input.asInstanceOf[UTF8String], model.runtime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rtRef = ctx.addReferenceObj("bpeRuntime", model.runtime,
      classOf[BpeRuntime].getName)
    defineCodeGen(ctx, ev, c => s"graft.ops.BpeEncode.compute($c, $rtRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
  override def prettyName: String = "bpe_encode"
  // productIterator includes the model — without this, every explain()
  // would dump the full merge/vocab tables into the plan string
  override def toString: String =
    s"bpe_encode($child, model[${model.merges.length} merges, ${model.vocab.size} syms])"
}

object BpeEncode {
  /** Shared by eval and generated code. */
  def compute(text: UTF8String, rt: BpeRuntime): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(computeIds(text.toString, rt))

  def computeIds(s: String, rt: BpeRuntime): Array[Int] = {
    val out = Array.newBuilder[Int]
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) out ++= rt.encodeWord(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    out.result()
  }
}
