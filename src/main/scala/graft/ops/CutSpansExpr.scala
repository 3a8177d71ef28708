package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Remove every word whose 0-based position falls inside any
  * (span_start, span_words) range — ONE byte walk per row.
  *
  * Semantics pinned bit-identical (CutSpansSpec) to the composed HOF twin
  *   concat_ws(" ", filter(split(text, " "), (w, i) =>
  *     !exists(spans, s => i >= start && i < start + words)))
  * which evaluates an interpreted lambda per word x span (the round-1
  * measured 2.6-9x HOF tax). Here the spans are merged into disjoint
  * intervals once per row and the text is walked once: words are the
  * byte runs between single ' ' separators (split keeps empty words for
  * consecutive spaces; concat_ws re-joins with single spaces — both
  * reproduced exactly), kept words are copied out verbatim.
  *
  * Null contract matches the twin under the caller's
  * `when(spans.isNull, text)` guard: evaluated only with non-null spans;
  * a null text yields "" (split(null) -> null, concat_ws skips null).
  * Null span ELEMENTS are skipped (cover nothing) rather than NPE-ing;
  * malformed span types are rejected at analysis (checkInputDataTypes).
  *
  * Codegen: the walk lives in the static [[CutSpans.compute]]; doGenCode
  * reproduces the asymmetric null contract around a call to it, keeping
  * the cut projection inside whole-stage codegen (A/B in
  * BENCH/CODEGEN.md) with eval and codegen sharing ONE body.
  */
case class CutSpans(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = StringType
  // eval returns the (possibly null) text verbatim when spans is null —
  // the result can only be null when BOTH inputs can be
  override def nullable: Boolean = left.nullable && right.nullable

  // the SQL-registered form accepts arbitrary expressions: reject
  // non-string text / non-array<struct<long,long>> spans at ANALYSIS time
  // instead of ClassCastException-ing per row in eval (int-typed span
  // fields were a silent caller hazard — only the DupSpans.cutSpans API
  // enforced the shape)
  override def checkInputDataTypes(): TypeCheckResult = {
    val spansOk = right.dataType match {
      case ArrayType(st: StructType, _) =>
        st.fields.length == 2 && st.fields.forall(_.dataType == LongType)
      case _ => false
    }
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING text argument, got ${left.dataType.sql}")
    else if (!spansOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires spans of type ARRAY<STRUCT<BIGINT, BIGINT>>, " +
          s"got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val spansV = right.eval(input)
    val textV = left.eval(input)
    if (spansV == null) {
      // guarded by when(spans.isNull, ...) in the API; mirror passthrough
      return textV
    }
    if (textV == null) return UTF8String.EMPTY_UTF8
    CutSpans.compute(textV.asInstanceOf[UTF8String],
      spansV.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val spansGen = right.genCode(ctx)
    val textGen = left.genCode(ctx)
    val utf8 = classOf[UTF8String].getName
    ev.copy(code =
      code"""
            |${spansGen.code}
            |${textGen.code}
            |boolean ${ev.isNull} = false;
            |$utf8 ${ev.value} = null;
            |if (${spansGen.isNull}) {
            |  ${ev.isNull} = ${textGen.isNull};
            |  ${ev.value} = ${textGen.value};
            |} else if (${textGen.isNull}) {
            |  ${ev.value} = $utf8.EMPTY_UTF8;
            |} else {
            |  ${ev.value} =
            |    graft.ops.CutSpans.compute(${textGen.value}, ${spansGen.value});
            |}
          """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CutSpans =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cut_spans"
}

object CutSpans {

  /** One-walk cut body shared by eval and the generated code: merge the
    * spans into disjoint sorted intervals, then copy the uncovered words
    * out in a single byte pass. Inputs must be non-null (the expression
    * handles the null contract); null span ELEMENTS cover nothing.
    */
  def compute(s: UTF8String, spans: ArrayData): UTF8String = {
    val nSpans = spans.numElements()

    // merge spans into disjoint sorted [start, end) intervals over word idx
    var merged: Array[Long] = null // packed pairs: start0,end0,start1,end1...
    var nMerged = 0
    if (nSpans > 0) {
      val iv = new Array[Long](nSpans * 2)
      // null span elements are skipped (treated as covering nothing) —
      // the graceful analog of the null-safe HOF twin, instead of an NPE
      var nIv = 0
      var i = 0
      while (i < nSpans) {
        if (!spans.isNullAt(i)) {
          val row = spans.getStruct(i, 2)
          // null FIELDS are skipped like null elements: the fields are
          // nullable BIGINTs, so analysis can't reject them, and getLong
          // on a null slot reads 0 — a silently wrong cut interval
          // (round-4 ADVICE). (The composed HOF twin instead nulls the
          // word predicate, dropping EVERY word — CutSpansSpec pins
          // bit-identity on well-formed spans only.)
          if (!row.isNullAt(0) && !row.isNullAt(1)) {
            val st = row.getLong(0)
            iv(2 * nIv) = st
            iv(2 * nIv + 1) = st + row.getLong(1)
            nIv += 1
          }
        }
        i += 1
      }
      // insertion sort of pairs by start (span counts are small)
      i = 1
      while (i < nIv) {
        val st = iv(2 * i); val en = iv(2 * i + 1)
        var j = i - 1
        while (j >= 0 && iv(2 * j) > st) {
          iv(2 * (j + 1)) = iv(2 * j); iv(2 * (j + 1) + 1) = iv(2 * j + 1)
          j -= 1
        }
        iv(2 * (j + 1)) = st; iv(2 * (j + 1) + 1) = en
        i += 1
      }
      merged = new Array[Long](nIv * 2)
      i = 0
      while (i < nIv) {
        val st = iv(2 * i); val en = iv(2 * i + 1)
        if (nMerged > 0 && st <= merged(2 * (nMerged - 1) + 1)) {
          if (en > merged(2 * (nMerged - 1) + 1)) merged(2 * (nMerged - 1) + 1) = en
        } else {
          merged(2 * nMerged) = st; merged(2 * nMerged + 1) = en
          nMerged += 1
        }
        i += 1
      }
    }

    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    val out = new Array[Byte](len)
    var outLen = 0
    var keptAny = false
    var wordIdx = 0L
    var wordStart = 0
    var p = 0 // pointer into merged intervals
    var i = 0
    while (i <= len) {
      if (i == len || Platform.getByte(base, off + i) == ' ') {
        // word [wordStart, i)
        while (p < nMerged && merged(2 * p + 1) <= wordIdx) p += 1
        val covered = p < nMerged && merged(2 * p) <= wordIdx
        if (!covered) {
          if (keptAny) { out(outLen) = ' '; outLen += 1 }
          Platform.copyMemory(base, off + wordStart,
            out, Platform.BYTE_ARRAY_OFFSET + outLen, i - wordStart)
          outLen += i - wordStart
          keptAny = true
        }
        wordIdx += 1
        wordStart = i + 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, outLen)
  }
}
