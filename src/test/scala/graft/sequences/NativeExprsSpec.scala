package graft.sequences

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class NativeExprsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("GenTokens is bit-identical to the composed transform/xxhash64 formula") {
    val seed = 42L
    val vocab = 50000
    val df = spark.range(0, 2000)
      .withColumn("n", (pmod(col("id"), lit(100)) + 1).cast("int"))
    val composed = transform(
      sequence(lit(1), col("n")),
      i => pmod(xxhash64(col("id"), lit(seed), lit(7), i), lit(vocab)).cast("int"))
    val mismatches = df
      .withColumn("a", composed)
      .withColumn("b", GenTokens.gen_tokens(col("id"), col("n"), seed, vocab))
      .filter(!(col("a") <=> col("b")))
      .count()
    assert(mismatches == 0)
  }

  test("TokenStats equals the composed size/exists/min/max expressions") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1, 2, 3)),
        |  (array(5)),
        |  (array(CAST(null AS INT), 7, -2)),
        |  (array(CAST(null AS INT))),
        |  (array())
        |AS t(tokens)""".stripMargin)
    val rows = df.select(
      TokenStats.token_stats(col("tokens")).as("ts"),
      size(col("tokens")).as("n"),
      size(filter(col("tokens"), t => t.isNull)).as("n_null"),
      array_min(col("tokens")).as("mn"),
      array_max(col("tokens")).as("mx")).collect()
    rows.foreach { r =>
      val ts = r.getStruct(0)
      assert(ts.getInt(0) == r.getInt(1))
      assert(ts.getInt(1) == r.getInt(2))
      assert(Option(ts.get(2)) == Option(r.get(3)))
      assert(Option(ts.get(3)) == Option(r.get(4)))
    }
  }
}
