package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class QualityFilterSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  val rules = QualityFilter.Rules(minChars = 10, maxChars = 80,
    minAlphaRatio = 0.5, maxDigitRatio = 0.3, maxRepetitionRatio = 0.4)

  def reasons(text: String): (Boolean, Set[String]) = {
    val r = QualityFilter.annotate(Seq((1L, text)).toDF("doc_id", "text"),
      "text", rules).select("keep", "reasons").collect()(0)
    (r.getBoolean(0), r.getSeq[String](1).toSet)
  }

  test("each rule fires on its planted violation and only there") {
    assert(reasons("a clean sentence about the weather today") == (true, Set()))
    assert(reasons("tiny") == (false, Set("too_short")))
    assert(reasons("alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima mike november") == (false, Set("too_long")))
    assert(reasons("!!! ??? ... ;;; ***") == (false, Set("low_alpha")))
    assert(reasons("order 12345 total 99887 code 5544332211")._2.contains("digit_heavy"))
    // 12 words, one 3-shingle repeated heavily -> repetition above 0.4
    assert(reasons("go go go go go go go go go go go go") ==
      (false, Set("repetitive")))
  }

  test("null text fails as null_text alone") {
    val r = QualityFilter.annotate(
        Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"),
        "text", rules).select("keep", "reasons").collect()(0)
    assert(!r.getBoolean(0) && r.getSeq[String](1) == Seq("null_text"))
  }

  test("repetitionRatio: distinct/total shingle math, 0 for short texts") {
    def rr(t: String): Double =
      Seq(Tuple1(t)).toDF("t")
        .select(QualityFilter.repetitionRatio(org.apache.spark.sql.functions.col("t")))
        .collect()(0).getDouble(0)
    assert(rr("one two") == 0.0) // single whole-text shingle
    assert(rr("a b c d") == 0.0) // 2 distinct shingles of 2
    assert(math.abs(rr("x y x y x y x") - (1.0 - 2.0 / 5.0)) < 1e-9)
    // shingles: "x y x","y x y","x y x","y x y","x y x" -> 2 distinct of 5
  }

  test("lang allowlist rule joins the set only when configured") {
    val withLang = rules.copy(langAllow = Seq("en"))
    val r = QualityFilter.annotate(
        Seq((1L, "el que la de los verdes campos")).toDF("doc_id", "text"),
        "text", withLang).select("reasons").collect()(0)
    assert(r.getSeq[String](0).contains("lang"))
  }

  test("filter returns exactly the keep side with original columns") {
    val df = Seq((1L, "a clean sentence about the weather today"),
      (2L, "tiny")).toDF("doc_id", "text")
    val kept = QualityFilter.filter(df, "text", rules)
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
