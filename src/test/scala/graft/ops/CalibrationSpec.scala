package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class CalibrationSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  def report(p: Double, rows: (String, Long)*): Map[String, (Long, Long, Long)] =
    Calibration.thresholdReport(rows.toDF("source", "score"),
        "source", "score", p)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("hand-checked thresholds: distinct scores, ties, p = 0") {
    val a = (1L to 10L).map("a" -> _)
    // ceil(0.3 * 10) = 3 -> threshold 3, kept = scores 3..10 = 8
    assert(report(0.3, a: _*) == Map("a" -> (3L, 10L, 8L)))
    // all-tied group: trimming never splits a score class -> all kept
    val ties = Seq.fill(4)("t" -> 5L)
    assert(report(0.5, ties: _*) == Map("t" -> (5L, 4L, 4L)))
    // p = 0 keeps everything from the minimum up
    assert(report(0.0, a: _*) == Map("a" -> (1L, 10L, 10L)))
    // per-group independence: b's short docs don't move a's threshold
    val b = Seq("b" -> 1L, "b" -> 1L, "b" -> 100L)
    val both = report(0.3, (a ++ b): _*)
    assert(both("a") == (3L, 10L, 8L))
    assert(both("b") == (1L, 3L, 3L)) // ceil(0.9)=1 -> min score kept
  }

  test("NULL score and NULL group rows are dropped, not bucketed") {
    val df = Seq(
      (Some("a"), Some(1L)), (Some("a"), Some(2L)), (Some("a"), None),
      (None, Some(7L))
    ).toDF("source", "score")
    val rep = Calibration.thresholdReport(df, "source", "score", 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rep.toSeq == Seq(("a", 1L, 2L))) // n_docs counts only scored rows
    val kept = Calibration.filterCalibrated(df, "source", "score", 0.5)
      .collect()
    assert(kept.forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
  }

  test("filterCalibrated matches the report's n_kept and keeps column order") {
    val rng = new graft.SeededRng(11L)
    val docs = (0L until 300L).map { i =>
      (i, s"src${rng.nextInt(4)}", 10L + rng.nextInt(40).toLong)
    }.toDF("doc_id", "source", "score")
    val rep = Calibration.thresholdReport(docs, "source", "score", 0.2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val kept = Calibration.filterCalibrated(docs, "source", "score", 0.2)
    assert(kept.columns.toSeq == Seq("doc_id", "source", "score"))
    val bySrc = kept.groupBy("source").agg(count(lit(1)).as("n"),
        min("score").as("lo"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rep.foreach { case (src, (thr, nKept)) =>
      assert(bySrc(src)._1 == nKept, s"$src kept count")
      assert(bySrc(src)._2 >= thr, s"$src kept a below-threshold score")
    }
    // brute-force oracle: per source, smallest score whose cumulative
    // count reaches ceil(p * n); kept = scores >= it
    val brute = docs.collect().map(r => (r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (src, rows) =>
        val scores = rows.map(_._2).sorted
        val need = math.ceil(0.2 * scores.length).toLong
        val thr = scores.zipWithIndex
          .collectFirst { case (s, i) if i + 1 >= need => s }.get
        src -> (thr, scores.count(_ >= thr).toLong)
      }
    assert(rep == brute)
  }
}
