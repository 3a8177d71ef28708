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

  test("ShingleHashes is bit-identical to the composed split/slice/concat_ws/xxhash64 formula") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b", "a b c", "a b c d",
      "one",
      "",
      " leading space", "trailing space ", "double  space  inside",
      "   ", // only spaces: 4 empty words
      "unicode éèê words café 中文 mixed in text",
      "tab\tis not a separator here",
      "punct, marks! and? stuff; here: ok"
    ) ++ (0 until 500).map(i => s"synthetic doc $i with shared boilerplate words " * (i % 5 + 1))
    for (k <- Seq(1, 2, 3, 5)) {
      val mism = texts.toDF("text")
        .withColumn("a", graft.ops.TextOps.shinglesComposed(col("text"), k))
        .withColumn("b", graft.ops.TextOps.shingles(col("text"), k))
        .filter(!(col("a") <=> col("b")))
        .count()
      assert(mism == 0, s"k=$k")
    }
  }

  test("fuzz: ShingleHashes bit-identity on random unicode/spacing strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val alphabet = "ab 字é\t.x  " // multi-space runs, tabs, CJK, accents
    val texts = (0 until 800).map { _ =>
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    for (k <- Seq(2, 3)) {
      val mism = texts.toDF("text")
        .withColumn("a", graft.ops.TextOps.shinglesComposed(col("text"), k))
        .withColumn("b", graft.ops.TextOps.shingles(col("text"), k))
        .filter(!(col("a") <=> col("b")))
        .count()
      assert(mism == 0, s"k=$k")
    }
  }

  test("RhpSignature is bit-identical to the composed zip_with/aggregate formula") {
    import spark.implicits._
    val vecs: Seq[Seq[Float]] =
      (0 until 300).map(i => (0 until 32).map(j =>
        math.sin(i * 31 + j).toFloat)) ++
      Seq(Seq.empty[Float], Seq(0.0f), Seq(-0.0f, 0.0f))
    for ((planes, seed) <- Seq((8, 7L), (16, 7L), (12, 99L))) {
      val mism = vecs.toDF("v")
        .withColumn("a", graft.ops.Similarity.rhpSignatureComposed(col("v"), planes, seed))
        .withColumn("b", graft.ops.Similarity.rhpSignature(col("v"), planes, seed))
        .filter(!(col("a") <=> col("b")))
        .count()
      assert(mism == 0, s"planes=$planes seed=$seed")
    }
  }

  test("CosineSim is bit-identical to the composed dot/norm formula") {
    import spark.implicits._
    val pairs: Seq[(Seq[Float], Seq[Float])] =
      (0 until 200).map { i =>
        ((0 until 24).map(j => math.sin(i * 7 + j).toFloat),
         (0 until 24).map(j => math.cos(i * 3 + j).toFloat))
      }
    val df = pairs.toDF("a", "b")
    val mism = df
      .withColumn("x", graft.ops.Similarity.cosineComposed(col("a"), col("b")))
      .withColumn("y", graft.ops.Similarity.cosine(col("a"), col("b")))
      .filter(!(col("x") <=> col("y")))
      .count()
    assert(mism == 0)
    // degenerate inputs: the ANSI composed form THROWS DIVIDE_BY_ZERO on a
    // zero norm; the native form is total — null for unequal lengths/null
    // elements, NaN for zero norms (never a candidate above any threshold)
    val deg = Seq(
      (Seq(1f, 2f), Seq(1f, 2f, 3f)),
      (Seq.empty[Float], Seq.empty[Float]),
      (Seq(0f, 0f), Seq(1f, 1f))).toDF("a", "b")
      .select(graft.ops.Similarity.cosine(col("a"), col("b")).as("c")).collect()
    assert(deg(0).isNullAt(0))
    assert(deg(1).getDouble(0).isNaN)
    assert(deg(2).getDouble(0).isNaN)
  }

  test("SigAgree is bit-identical to the composed zip_with/filter/size formula") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val rows: Seq[(Seq[Long], Seq[Long])] = (0 until 200).map { _ =>
      val n = 1 + rng.nextInt(40)
      val m = if (rng.nextBoolean()) n else 1 + rng.nextInt(40) // unequal too
      val a = Seq.fill(n)(rng.nextInt(6).toLong)
      val b = Seq.fill(m)(rng.nextInt(6).toLong)
      (a, b)
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq.empty[Long], Seq.empty[Long]))
    val df = rows.toDF("a", "b")
    val mism = df
      .withColumn("x", graft.ops.SigAgree.sigAgreeComposed(col("a"), col("b")))
      .withColumn("y", graft.ops.SigAgree.sig_agree(col("a"), col("b")))
      .filter(!(col("x") <=> col("y")))
      .count()
    assert(mism == 0)
    // null elements agree with nothing (zip_with's null comparison is
    // dropped by the filter in the composed form)
    val nulls = Seq((Seq(Some(1L), None, Some(3L)), Seq(Some(1L), None, Some(3L))))
      .toDF("a", "b")
    val both = nulls.select(
      graft.ops.SigAgree.sig_agree(col("a"), col("b")).as("y"),
      graft.ops.SigAgree.sigAgreeComposed(col("a"), col("b")).as("x"))
      .collect()(0)
    assert(both.getInt(0) == 2 && both.getInt(1) == 2)
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
