package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class ChunkingSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  def chunksOf(text: String, chunk: Int = 8, stride: Int = 6)
      : Seq[(Long, Long, String)] =
    Chunking.chunk(Seq(1L -> text).toDF("doc_id", "text"),
        "text", "doc_id", chunk, stride)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)

  def words(n: Int): String = (0 until n).map(i => s"w$i").mkString(" ")

  test("hand-checked: aligned, right-aligned tail, short doc, exact fit") {
    // n=20, chunk=8, stride=6 -> starts 0, 6, 12 (exact fit of the last)
    assert(chunksOf(words(20)) == Seq(
      (0L, 8L, (0 until 8).map(i => s"w$i").mkString(" ")),
      (1L, 8L, (6 until 14).map(i => s"w$i").mkString(" ")),
      (2L, 8L, (12 until 20).map(i => s"w$i").mkString(" "))))
    // n=10 -> starts 0 and RIGHT-ALIGNED 2 (naive 6 would orphan a
    // 4-word tail); every chunk full width
    assert(chunksOf(words(10)).map(c => (c._1, c._2)) ==
      Seq((0L, 8L), (1L, 8L)))
    assert(chunksOf(words(10))(1)._3 ==
      (2 until 10).map(i => s"w$i").mkString(" "))
    // n == chunk and n < chunk -> one chunk, the doc itself
    assert(chunksOf(words(8)) == Seq((0L, 8L, words(8))))
    assert(chunksOf("a b c") == Seq((0L, 3L, "a b c")))
  }

  test("every word position is covered and chunk starts strictly increase") {
    for (n <- Seq(1, 7, 8, 9, 15, 16, 23, 50); (c, s) <- Seq((8, 6), (8, 8), (5, 1))) {
      val got = chunksOf(words(n), c, s)
      val covered = got.flatMap { case (_, w, t) =>
        val first = t.split(" ").head.drop(1).toInt
        first until (first + w.toInt)
      }.toSet
      assert(covered == (0 until n).toSet, s"n=$n chunk=$c stride=$s")
      assert(got.map(_._1) == got.indices.map(_.toLong), "contiguous idx")
      // full-width invariant: only a doc shorter than the chunk may
      // emit a sub-width chunk
      if (n >= c) assert(got.forall(_._2 == c.toLong), s"n=$n sub-width")
    }
  }

  test("NULL text emits no chunks; bad params are refused") {
    val df = Seq((1L, "a b c"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Chunking.chunk(df, "text", "doc_id", 2, 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
    intercept[IllegalArgumentException](Chunking.chunk(df, "text", "doc_id", 0, 1))
    intercept[IllegalArgumentException](Chunking.chunk(df, "text", "doc_id", 4, 5))
  }
}
