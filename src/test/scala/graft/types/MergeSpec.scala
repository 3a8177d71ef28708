package graft.types

import org.scalatest.funsuite.AnyFunSuite
import Goldens._
import JValue._

/** Strict-merge goldens ported from the reference's merge_test.clj. */
class MergeSpec extends AnyFunSuite {
  private def m(a: SchemaType, b: SchemaType) = StrictMerge.mergeTwo(a, b)
  private def et(v: JValue) = mergeExtract(v)

  // --- extraction goldens the rest of the suite builds on ------------------

  test("canonical scalar extraction (merge_test.clj:50-56)") {
    assert(et(JNull) == scalarTypes("null"))
    assert(et(JBool(true)) == scalarTypes("bool"))
    assert(et(JStr("Hello")) == scalarTypes("str"))
    assert(et(JInt(6)) == scalarTypes("int"))
    assert(et(JStr("2013-01-01")) == scalarTypes("date"))
    assert(et(JReal(3.14)) == scalarTypes("real"))
  }

  val collTypes: Map[String, SchemaType] = Map(
    // goldens merge_test.clj:77-84
    "empty"  -> CollT.nothing,
    "single" -> coll(str(6)),
    "mixed"  -> coll(union(NullT, BoolT, str(5), int(6, 6), date, RealT(10.209, 10.209))),
    "nested" -> coll(coll(int(1, 9))),
    "mixed-nested" -> coll(union(coll(str(6)), coll(int(2, 9)), coll(NullT))),
    "nested-mixed" -> coll(coll(union(int(1, 1), str(3), NullT))),
    "mixed-nested-mixed" -> coll(union(
      coll(union(int(1, 1), str(3), NullT)),
      coll(union(int(1, 1), str(3))),
      coll(union(date, str(3), NullT)))),
    "empty-nested" -> coll(union(
      coll(union(CollT.nothing, int(5, 5))),
      coll(CollT.nothing)))
  )

  test("canonical collection extraction (merge_test.clj:428-436)") {
    collectionExpressions.foreach { case (name, expr) =>
      assert(et(expr) == collTypes(name), s"collection '$name'")
    }
  }

  val docTypes: Map[String, SchemaType] = Map(
    // goldens merge_test.clj:111-144
    "scalars" -> doc("a" -> str(6), "name" -> str(7), "c" -> int(25, 25),
      "b" -> NullT, "f" -> RealT(10.4, 10.4), "d" -> BoolT, "e" -> date),
    "flat-collection" -> doc("a" -> coll(str(5)), "name" -> str(15)),
    "flat-mixed-collection" -> doc(
      "a" -> coll(union(str(5), int(25, 25), NullT, RealT(10.4, 10.4))),
      "name" -> str(21)),
    "flat-nested-collection" -> doc(
      "a" -> coll(union(coll(date), int(25, 46))), "name" -> str(22)),
    "flat-nested-mixed-collection" -> doc(
      "a" -> coll(union(coll(union(str(5), date)), int(25, 46))),
      "name" -> str(28)),
    "subdoc" -> doc(
      "a" -> doc("a-collection" -> coll(StrT(5, 11))), "name" -> str(6)),
    "coll-subdoc" -> doc(
      "a" -> coll(union(
        doc("a" -> coll(int(1, 3)), "b" -> str(16)),
        doc("a" -> union(
          coll(union(NullT, int(7, 8))),
          coll(int(1, 6)),
          coll(str(5)))))),
      "name" -> str(11))
  )

  test("canonical document extraction (merge_test.clj:104-144)") {
    documentExpressions.foreach { case (name, expr) =>
      assert(et(expr) == docTypes(name), s"document '$name'")
    }
  }

  // --- 36-case scalar x scalar cross product (merge_test.clj:237-282) ------

  test("scalar-scalar cross product: same kind collapses, else 2-branch union") {
    val kinds = scalarTypes.keys.toSeq
    for (l <- kinds; r <- kinds) {
      val (lt, rt) = (scalarTypes(l), scalarTypes(r))
      val expected = if (l == r) rt else union(lt, rt)
      assert(m(lt, rt) == expected, s"$l + $r")
    }
  }

  // --- scalar vs doc/coll/union (merge_test.clj:284-301) -------------------

  test("scalar + document / collection -> union of the two") {
    assert(m(scalarTypes("bool"), docTypes("scalars")) ==
      union(BoolT, docTypes("scalars")))
    assert(m(scalarTypes("bool"), collTypes("single")) ==
      union(BoolT, collTypes("single")))
  }

  test("scalar + union absorbs (merge_test.clj:292-301)") {
    assert(m(NullT, union(BoolT, str(5))) == union(NullT, BoolT, str(5)))
    assert(m(NullT, union(NullT, str(5))) == union(str(5), NullT))
    assert(m(union(NullT, str(5)), NullT) == union(str(5), NullT))
  }

  // --- documents (merge_test.clj:304-424) ----------------------------------

  test("document + incongruent document -> union (merge_test.clj:335-340)") {
    assert(m(et(obj("a" -> arr(7, 8, JNull))),
             et(obj("a" -> arr(1, 2, 3), "b" -> "not-a-collection"))) ==
      union(
        doc("a" -> coll(union(NullT, int(7, 8)))),
        doc("a" -> coll(int(1, 3)), "b" -> str(16))))
  }

  val congruent1: SchemaType = et(obj(
    "a" -> "12", "b" -> "same type",
    "c" -> arr("one", 2, "fire", true),
    "d" -> obj("a" -> "ten", "b" -> "same type",
      "c" -> arr("hi", "how are you", "bye"),
      "d" -> obj("inside" -> "insider")),
    "e" -> arr(1, 2, 3)))
  val congruent2: SchemaType = et(obj(
    "a" -> 12, "b" -> "this",
    "c" -> arr(1, 2, 3),
    "d" -> obj("a" -> 10, "b" -> "that",
      "c" -> arr("hi", "how are you", "bye"),
      "d" -> obj("inside" -> "insider")),
    "e" -> JNull))

  test("congruent documents merge per key (merge_test.clj:364-372)") {
    assert(m(congruent1, congruent2) == doc(
      "a" -> union(str(2), int(12, 12)),
      "c" -> union(
        coll(union(BoolT, StrT(3, 4), int(2, 2))),
        coll(int(1, 3))),
      "b" -> StrT(4, 9),
      "d" -> doc(
        "a" -> union(str(3), int(10, 10)),
        "c" -> coll(StrT(2, 11)),
        "b" -> StrT(4, 9),
        "d" -> doc("inside" -> str(7))),
      "e" -> union(NullT, coll(int(1, 3)))))
    assert(m(congruent1, congruent1) == congruent1)
  }

  val aDocType: SchemaType = et(obj("a" -> 1, "b" -> "b"))

  test("document + union cases (merge_test.clj:395-424)") {
    // union with no docs: doc joins the union
    assert(m(aDocType, union(int(1, 1), str(1))) ==
      union(doc("a" -> int(1, 1), "b" -> str(1)), int(1, 1), str(1)))
    // all docs incongruent: doc added as another branch
    assert(m(aDocType, union(int(1, 1),
        doc("a" -> int(1, 1)),
        doc("a" -> int(1, 1), "b" -> str(1), "c" -> NullT))) ==
      union(
        doc("a" -> int(1, 1), "b" -> str(1)),
        int(1, 1),
        doc("a" -> int(1, 1)),
        doc("a" -> int(1, 1), "c" -> NullT, "b" -> str(1))))
    // exactly one congruent doc: merge into it
    assert(m(aDocType, union(int(1, 1), doc("a" -> str(1), "b" -> int(1, 1)))) ==
      union(
        doc("a" -> union(int(1, 1), str(1)), "b" -> union(str(1), int(1, 1))),
        int(1, 1)))
    // equal doc already present: no-op
    val u = union(int(1, 1), doc("a" -> int(1, 1), "b" -> str(1)))
    assert(m(aDocType, u) == u)
  }

  // --- collections (merge_test.clj:438-476) --------------------------------

  val collOfStr: SchemaType = et(arr("5", "6"))
  val collOfNum: SchemaType = et(arr(5, 6))
  val collOfNull: SchemaType = et(arr(JNull, JNull))

  test("collection merge cases (merge_test.clj:446-476)") {
    assert(m(collOfStr, NullT) == union(NullT, coll(str(1))))
    assert(m(collOfStr, aDocType) == union(aDocType, coll(str(1))))
    assert(m(collOfStr, collOfStr) == collOfStr)
    assert(m(collOfNum, collOfStr) == union(coll(int(5, 6)), coll(str(1))))
    val u = union(collOfStr, collOfNull)
    assert(m(collOfStr, u) == union(coll(NullT), coll(str(1))))
    assert(m(collOfNum, u) == union(coll(NullT), coll(int(5, 6)), coll(str(1))))
  }

  // --- unions (merge_test.clj:480-534) --------------------------------------

  test("order independence + canonical union (merge_test.clj:480-496)") {
    val someTypes = Seq[JValue]("hello", "hello", 5, "hi", 5, arr(4, 5, 6),
      arr(7, 8, 9), "hi", arr(7, 8, 9), 42, obj("a" -> "crazy"),
      obj("a" -> "hello")).map(et)
    val merged = StrictMerge.mergeAll(someTypes)
    val reversed = StrictMerge.mergeAll(someTypes.reverse)
    assert(merged == reversed)
    assert(merged == union(
      int(5, 42), StrT(2, 5),
      doc("a" -> str(5)),
      coll(int(4, 9))))
  }

  test("union + union (merge_test.clj:498-534)") {
    val u1 = StrictMerge.mergeAll(Seq[JValue]("hello", 5, JNull,
      obj("a" -> "crazy"), obj("a" -> "hello"),
      obj("a" -> "hello", "b" -> 5),
      obj("a" -> "hello", "b" -> true),
      obj("a" -> 10, "c" -> 10)).map(et))
    val u2 = StrictMerge.mergeAll(Seq[JValue]("hello", 5, JNull,
      obj("a" -> "crazy"), obj("a" -> "hello"),
      obj("a" -> JNull, "b" -> JNull),
      obj("a" -> JNull, "b" -> JNull),
      obj("x" -> "x", "y" -> "y")).map(et))
    assert(m(u1, u2) == union(
      NullT, str(5), int(5, 5),
      doc("y" -> str(1), "x" -> str(1)),
      doc("a" -> str(5)),
      doc("a" -> union(NullT, str(5)),
          "b" -> union(NullT, BoolT, int(5, 5))),
      doc("a" -> int(10, 10), "c" -> int(10, 10))))
  }

  // --- scalar metadata sanity (merge_test.clj:540-594) ----------------------

  test("ranged metadata merges (merge_test.clj:540-553)") {
    assert(m(IntT(20, 40), IntT(21, 41)) == IntT(20, 41))
    assert(m(IntT(20, 40), IntT(25, 30)) == IntT(20, 40))
    assert(m(IntT(20, 40), IntT(15, 20)) == IntT(15, 40))
    assert(m(IntT(25, 30), IntT(15, 20)) == IntT(15, 30))
    assert(StrictMerge.mergeAll(Seq(IntT(20, 40), IntT(21, 41), IntT(25, 30),
      IntT(15, 20))) == IntT(15, 41))
  }

  test("metadata within documents/collections/unions (merge_test.clj:555-594)") {
    assert(m(et(obj("a" -> "2c")), et(obj("a" -> "4chs"))) ==
      doc("a" -> StrT(2, 4)))
    assert(m(et(obj("a" -> arr(23))), et(obj("a" -> arr(24)))) ==
      doc("a" -> coll(IntT(23, 24))))
    assert(m(et(arr(1)), et(arr(1, 2))) == coll(int(1, 2)))
    assert(m(et(arr(1, "a")), et(arr(2, "asdf"))) ==
      coll(union(StrT(1, 4), int(1, 2))))
    // no heterogeneous merging of scalar into collection
    assert(m(coll(IntT(4, 4)), IntT(4, 4)) ==
      union(IntT(4, 4), coll(IntT(4, 4))))
    // union metadata merges per branch
    assert(m(union(int(1, 1), str(1)), union(int(2, 2), StrT(2, 2))) ==
      union(int(1, 2), StrT(1, 2)))
    assert(m(union(str(3), IntT(-1, -1)), StrT(6, 6)) ==
      union(IntT(-1, -1), StrT(3, 6)))
  }
}
