package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class DupSpansSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  def spans(rows: (Long, String)*): Set[(Long, Long, Long)] =
    DupSpans.dupSpans(rows.toDF("doc_id", "text"), "text", "doc_id",
        windowWords = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  // 8 unique filler words + a 6-word phrase shared verbatim
  val phrase = "alpha bravo charlie delta echo foxtrot"

  test("a shared phrase surfaces as one maximal span per doc, full phrase length") {
    val s = spans(
      1L -> s"one two three $phrase four five six",
      2L -> s"$phrase seven eight nine ten eleven twelve")
    // phrase = 6 words -> 3 consecutive 4-windows -> span_words = 3+3 = 6
    assert(s == Set((1L, 3L, 6L), (2L, 0L, 6L)))
  }

  test("unique text yields no spans; within-doc repetition is also a duplicate") {
    assert(spans(1L -> "every word here is used exactly once only").isEmpty)
    val s = spans(3L -> s"$phrase middle words between $phrase")
    // both phrase copies duplicated (positions 0..2 and 9..11 as 4-windows)
    assert(s.map(t => (t._2, t._3)) == Set((0L, 6L), (9L, 6L)))
  }

  test("duplicated docs shorter than the window span the DOC's length, not the window's") {
    // ShingleHashes fallback: < 4 words -> one whole-text hash at pos 0;
    // the span must report the 2-word doc, not a phantom 4-word region
    val s = spans(1L -> "hello world", 2L -> "hello world")
    assert(s == Set((1L, 0L, 2L), (2L, 0L, 2L)))
  }

  test("adjacent duplicated runs merge into one maximal island") {
    // two docs sharing a 10-word block -> one span of 10, not several
    val block = "p q r s t u v w x y"
    val s = spans(1L -> s"$block zz1 zz2", 2L -> s"zz3 zz4 $block")
    assert(s == Set((1L, 0L, 10L), (2L, 2L, 10L)))
  }
}
