package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class PackingSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  def pack(rows: Seq[(String, Long, Long)], budget: Int) =
    Packing.packGreedy(rows.toDF("src", "id", "len"), "src", "id", "len", budget)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getSeq[Long](4).toList))
      .sortBy(t => (t._1, t._2)).toList

  test("greedy first-fit in id order: exact pack layout") {
    // budget 10, lens in id order: 4,4,4 -> [4,4],[4]; 10 -> exact fit;
    // 3,3,3,3 -> [3,3,3],[3]
    val rows = Seq(
      ("a", 1L, 4L), ("a", 2L, 4L), ("a", 3L, 4L),
      ("b", 1L, 10L),
      ("c", 1L, 3L), ("c", 2L, 3L), ("c", 3L, 3L), ("c", 4L, 3L))
    assert(pack(rows, 10) == List(
      ("a", 0L, 2L, 8L, List(1L, 2L)), ("a", 1L, 1L, 4L, List(3L)),
      ("b", 0L, 1L, 10L, List(1L)),
      ("c", 0L, 3L, 9L, List(1L, 2L, 3L)), ("c", 1L, 1L, 3L, List(4L))))
  }

  test("oversized sequences get singleton packs, never dropped") {
    val rows = Seq(("a", 1L, 25L), ("a", 2L, 5L), ("a", 3L, 25L))
    assert(pack(rows, 10) == List(
      ("a", 0L, 1L, 25L, List(1L)),
      ("a", 1L, 1L, 5L, List(2L)),
      ("a", 2L, 1L, 25L, List(3L))))
  }

  test("invariants on a seeded random corpus: budget respected, order kept, nothing lost") {
    val rng = new graft.SeededRng(99L)
    val rows = (0L until 500L).map(i => (s"s${i % 4}", i, 1L + rng.nextLong(300)))
    val packs = pack(rows, 512)
    // every id exactly once
    assert(packs.flatMap(_._5).sorted == rows.map(_._2).sorted.toList)
    packs.groupBy(_._1).foreach { case (g, ps) =>
      // pack ids contiguous from 0; ids ascending across packs (in-order)
      assert(ps.map(_._2) == ps.indices.map(_.toLong).toList)
      val idsInOrder = ps.sortBy(_._2).flatMap(_._5)
      assert(idsInOrder == idsInOrder.sorted, g)
      // budget respected except singletons; totals consistent
      ps.foreach { case (_, _, n, total, ids) =>
        assert(n == ids.length)
        assert(total <= 512 || n == 1)
      }
      // greediness: a pack's first overflow really would not have fit
      val lens = rows.filter(_._1 == g).map(t => t._2 -> t._3).toMap
      ps.sortBy(_._2).sliding(2).foreach {
        case Seq((_, _, _, total, _), (_, _, _, _, nextIds)) =>
          assert(total + lens(nextIds.head) > 512)
        case _ => ()
      }
    }
  }
}
