package graft.stats

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class SketchSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("KLL aggregate over a known distribution returns accurate quantiles") {
    val df = spark.range(0, 100001).select(col("id").cast("double").as("v"))
    val bytes = df.agg(KllSketchAgg.kll_sketch(col("v")).as("s"))
      .collect()(0).getAs[Array[Byte]]("s")
    val sk = KllSketchAgg.fromBytes(bytes)
    assert(sk.getN == 100001L)
    assert(math.abs(sk.getQuantile(0.5) - 50000.0) < 2000.0)
    assert(math.abs(sk.getQuantile(0.99) - 99000.0) < 2000.0)
    assert(sk.getMinItem == 0.0 && sk.getMaxItem == 100000.0)
  }

  test("token histogram: distributed agg equals local counting; repartition-invariant (monoid)") {
    val vocab = 1000
    val bins = 16
    val rows = (0 until 500).map(i => Seq(i % vocab, (i * 7) % vocab, vocab - 1, -5, vocab + 3))
    val df = rows.toDF("tokens").selectExpr("cast(tokens as array<int>) as tokens")
    def histOf(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.agg(TokenHistAgg.token_hist(col("tokens"), bins, vocab)).collect()(0).getSeq[Long](0)
    val one = histOf(df.coalesce(1))
    val many = histOf(df.repartition(8))
    assert(one == many)
    // local ground truth with the same clamped binning
    val expected = new Array[Long](bins)
    rows.flatten.foreach { t =>
      val bin = if (t < 0) 0 else if (t >= vocab) bins - 1 else (t.toLong * bins / vocab).toInt
      expected(bin) += 1
    }
    assert(one == expected.toSeq)
    // psiCounts: self vs self is 0; concentrated vs uniform is large
    assert(Drift.psiCounts(expected, expected) == 0.0)
    val concentrated = new Array[Long](bins); concentrated(bins - 1) = 2500
    assert(Drift.psiCounts(expected, concentrated) > 1.0)
    // ksCounts (exact categorical KS, q53's semantics): self is 0,
    // disjoint mass is 1, hand-checked mid case, empty side is 0
    assert(Drift.ksCounts(expected, expected) == 0.0)
    val early = new Array[Long](bins); early(0) = 2500
    assert(Drift.ksCounts(early, concentrated) == 1.0)
    // a = [3,1], b = [1,3]: CDFs .75/.25 then 1/1 -> ks = 0.5
    assert(Drift.ksCounts(Array(3L, 1L), Array(1L, 3L)) == 0.5)
    assert(Drift.ksCounts(new Array[Long](bins), concentrated) == 0.0)
  }

  test("KLL partial sketches merge to the same answer as one global sketch (monoid)") {
    val parts = (0 until 4).map { p =>
      spark.range(p * 25000L, (p + 1) * 25000L)
        .select(col("id").cast("double").as("v"))
        .agg(KllSketchAgg.kll_sketch(col("v"))).collect()(0).getAs[Array[Byte]](0)
    }
    val merged = KllSketchAgg.mergeBytes(parts)
    assert(merged.getN == 100000L)
    assert(math.abs(merged.getQuantile(0.5) - 50000.0) < 2500.0)
    // commutative: reverse merge order gives the same rank estimates
    val mergedRev = KllSketchAgg.mergeBytes(parts.reverse)
    (1 to 9).foreach { d =>
      assert(math.abs(merged.getQuantile(d / 10.0) - mergedRev.getQuantile(d / 10.0))
        < 3000.0)
    }
  }

  test("KLL works per group (grouped aggregation)") {
    val df = spark.range(0, 20000)
      .select((col("id") % 2).cast("string").as("g"), col("id").cast("double").as("v"))
    val rows = df.groupBy("g").agg(KllSketchAgg.kll_sketch(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> KllSketchAgg.fromBytes(r.getAs[Array[Byte]]("s"))).toMap
    assert(rows("0").getN == 10000L && rows("1").getN == 10000L)
  }

  test("PSI/KS: identical distributions ~0, shifted distributions large") {
    def sketchOf(offset: Double) = {
      val sk = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200)
      (0 until 50000).foreach(i => sk.update(offset + (i % 1000)))
      sk
    }
    val a = sketchOf(0.0); val b = sketchOf(0.0); val c = sketchOf(800.0)
    assert(Drift.psi(a, b) < 0.01)
    assert(Drift.ks(a, b) < 0.02)
    assert(Drift.psi(a, c) > 0.25)
    assert(Drift.ks(a, c) > 0.3)
  }
}
