package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins the native one-walk [[CharClassCounts]] ratios bit-identical to
  * their regex twins (the semantic definition the DuckDB oracles also
  * compute), including unicode, empty, and all-whitespace edges.
  */
class CharClassSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def both(texts: Seq[String]): Unit = {
    val df = texts.toDF("t")
    val rows = df.select(
        TextOps.alphaRatio(col("t")), TextOps.alphaRatioComposed(col("t")),
        TextOps.digitRatio(col("t")), TextOps.digitRatioComposed(col("t")),
        TextOps.whitespaceRatio(col("t")), TextOps.whitespaceRatioComposed(col("t")))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getDouble(0) == r.getDouble(1), s"alpha on '$t'")
      assert(r.getDouble(2) == r.getDouble(3), s"digit on '$t'")
      assert(r.getDouble(4) == r.getDouble(5), s"ws on '$t'")
    }
  }

  test("edges: empty, all-space, unicode, tabs/newlines, mixed") {
    both(Seq("", "   ", "\t\n\r\f", "héllo wörld 123", "日本語テキスト",
      "a1 b2\tc3\n", "ALLCAPS", "0123456789", "émoji 🙂 mix 42"))
  }

  test("fuzz: seeded random byte-soup strings match the regex twins") {
    val rng = new graft.SeededRng(31L)
    val pool = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++
      Seq(' ', '\t', '\n', '.', ',', '!', 'é', 'ß', '中', '\r', '\f', '')
    val texts = Seq.fill(200)(
      Seq.fill(rng.nextInt(60))(pool(rng.nextInt(pool.size))).mkString)
    both(texts)
  }
}
