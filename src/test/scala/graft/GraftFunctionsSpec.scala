package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-registered native functions must agree with the Column API
  * (same expressions underneath) and compose inside spark.sql text.
  */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SharedSpark.spark
    GraftFunctions.register(s)
    s
  }

  test("scalar functions callable from SQL, equal to the Column API") {
    import spark.implicits._
    Seq(("a brown fox jumps over dogs", Seq(1, 2, 3), 3))
      .toDF("text", "tokens", "n_tok")
      .selectExpr("text", "cast(tokens as array<int>) as tokens", "n_tok")
      .createOrReplaceTempView("gf_docs")

    val row = spark.sql(
      """SELECT token_stats(tokens).n AS n,
        |       size(shingle_hashes(text, 3)) AS n_shingles,
        |       size(minhash64(shingle_hashes(text, 3), 16)) AS n_mh,
        |       simhash64(shingle_hashes(text, 3)) AS sh,
        |       violation_mask(tokens, n_tok, 50000, 1, 10) AS mask
        |FROM gf_docs""".stripMargin).collect()(0)
    assert(row.getInt(0) == 3)
    assert(row.getInt(1) == 4) // 6 words -> 4 trigram shingles
    assert(row.getInt(2) == 16)
    assert(row.getInt(4) == 0) // clean row

    val viaColumns = spark.table("gf_docs").select(
      graft.ops.SimHash64.simhash(graft.ops.TextOps.shingles(col("text"), 3)))
      .collect()(0).getLong(0)
    assert(row.getLong(3) == viaColumns)
  }

  test("cosine and RHP signature from SQL match the Column API") {
    import spark.implicits._
    Seq((Seq(1f, 2f, 3f), Seq(3f, 2f, 1f))).toDF("a", "b")
      .createOrReplaceTempView("gf_vecs")
    val sql = spark.sql(
      "SELECT cosine_sim(a, b) AS c, rhp_signature(a, 8, 7L) AS s FROM gf_vecs")
      .collect()(0)
    val col0 = spark.table("gf_vecs").select(
      graft.ops.Similarity.cosine(col("a"), col("b")),
      graft.ops.Similarity.rhpSignature(col("a"), 8, 7L)).collect()(0)
    assert(sql.getDouble(0) == col0.getDouble(0))
    assert(sql.getLong(1) == col0.getLong(1))
  }

  test("aggregate functions work in SQL GROUP BY") {
    import spark.implicits._
    (0 until 100).map(i => (i % 3, Seq(i % 50, (i * 7) % 50), i % 50))
      .toDF("g", "tokens", "v")
      .selectExpr("g", "cast(tokens as array<int>) as tokens", "v")
      .createOrReplaceTempView("gf_agg")
    val rows = spark.sql(
      """SELECT g, token_hist_agg(tokens, 5, 50) AS hist,
        |       kll_sketch_agg2(v, 200) AS kll
        |FROM gf_agg GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val hist = r.getAs[scala.collection.Seq[Long]]("hist")
      assert(hist.length == 5 && hist.sum > 0)
      val sk = graft.stats.KllSketchAgg.fromBytes(r.getAs[Array[Byte]]("kll"))
      assert(sk.getN > 0)
    }
  }

  test("cut_spans callable from SQL") {
    val out = spark.sql(
      """SELECT cut_spans('a b c d e',
        |  array(named_struct('span_start', 1L, 'span_words', 2L))) AS cut"""
        .stripMargin).collect()(0).getString(0)
    assert(out == "a d e")
  }

  test("sig_agree callable from SQL") {
    val n = spark.sql(
      "SELECT sig_agree(array(1L, 2L, 3L, 4L), array(1L, 9L, 3L, 4L)) AS n")
      .collect()(0).getInt(0)
    assert(n == 3)
    // the natural int-literal form must fail analysis, not misread bytes
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT sig_agree(array(1, 2, 3), array(1, 2, 3))"))
    assert(e.getMessage.toLowerCase.contains("sig_agree") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("remaining natives reject mistyped arrays at analysis") {
    // round-4 ADVICE: sig_agree/cut_spans gained guards but the other
    // SQL-registered natives still read raw 8/4-byte slots — the natural
    // int-literal (or string) forms must fail ANALYSIS, not compute
    // garbage from misaligned reads
    for (bad <- Seq(
        "SELECT minhash64(array(1, 2, 3), 16)",          // int array
        "SELECT minhash64('abc', 16)",                   // not an array
        "SELECT simhash64(array(1, 2, 3))",              // int array
        "SELECT simhash64(42L)",                         // not an array
        "SELECT rhp_signature(array(1L, 2L), 8, 7L)",    // long array (wants float/double)
        "SELECT rhp_signature('abc', 8, 7L)",            // not an array
        "SELECT cosine_sim(array(1L, 2L), array(1L, 2L))",      // long arrays
        "SELECT cosine_sim(array(1.0F, 2.0F), array('a', 'b'))" // one side bad
      )) {
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(bad))
      assert(e.getMessage.toLowerCase.contains("requires") ||
        e.getMessage.toLowerCase.contains("data type mismatch"), bad)
    }
    // the valid widths still pass: float AND double vectors, mixed sides
    val ok = spark.sql(
      """SELECT cosine_sim(array(1.0F, 2.0F), array(1.0D, 2.0D)) AS c,
        |       rhp_signature(array(1.0D, 2.0D), 8, 7L) AS s""".stripMargin)
      .collect()(0)
    assert(math.abs(ok.getDouble(0) - 1.0) < 1e-12)
  }
}
