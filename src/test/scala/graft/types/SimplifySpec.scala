package graft.types

import org.scalatest.funsuite.AnyFunSuite
import Goldens._
import JValue._

/** Lenient-merge goldens ported from the reference's simplify_test.clj. */
class SimplifySpec extends AnyFunSuite {
  private def m(a: SchemaType, b: SchemaType) = SimplifyMerge.mergeTwo(a, b)
  private def et(v: JValue) = simplifyExtract(v)

  val collTypes: Map[String, SchemaType] = Map(
    // goldens simplify_test.clj:74-81 — nested collections unify
    "empty"  -> CollT.nothing,
    "single" -> coll(str(6)),
    "mixed"  -> coll(union(NullT, BoolT, str(5), int(6, 6), RealT(10.209, 10.209), date)),
    "nested" -> coll(coll(int(1, 9))),
    "mixed-nested" -> coll(coll(union(NullT, int(2, 9), str(6)))),
    "nested-mixed" -> coll(coll(union(NullT, int(1, 1), str(3)))),
    "mixed-nested-mixed" -> coll(coll(union(NullT, int(1, 1), str(3), date))),
    "empty-nested" -> coll(coll(union(int(5, 5), CollT.nothing)))
  )

  test("canonical collection extraction under simplify (simplify_test.clj:385-393)") {
    collectionExpressions.foreach { case (name, expr) =>
      assert(et(expr) == collTypes(name), s"collection '$name'")
    }
  }

  // NB: the simplify corpus tweaks two document fixtures
  // (simplify_test.clj:89-91): flat-mixed-collection drops 10.4, nested
  // collections hold only dates.
  val simplifyDocumentExpressions: Map[String, JObj] =
    documentExpressions ++ Map(
      "flat-mixed-collection" -> obj("name" -> "flat-mixed-collection",
        "a" -> arr("item1", 25, JNull)),
      "flat-nested-mixed-collection" -> obj(
        "name" -> "flat-nested-mixed-collection",
        "a" -> arr(34, 25, 46, arr("2013-01-01", "2013-01-02", "2013-01-03")))
    )

  val docTypes: Map[String, SchemaType] = Map(
    // goldens simplify_test.clj:109-115
    "scalars" -> doc("a" -> str(6), "name" -> str(7), "c" -> int(25, 25),
      "b" -> NullT, "f" -> RealT(10.4, 10.4), "d" -> BoolT, "e" -> date),
    "flat-collection" -> doc("a" -> coll(str(5)), "name" -> str(15)),
    "flat-mixed-collection" -> doc(
      "a" -> coll(union(NullT, str(5), int(25, 25))), "name" -> str(21)),
    "flat-nested-collection" -> doc(
      "a" -> coll(union(int(25, 46), coll(date))), "name" -> str(22)),
    "flat-nested-mixed-collection" -> doc(
      "a" -> coll(union(int(25, 46), coll(date))), "name" -> str(28)),
    "subdoc" -> doc(
      "a" -> doc("a-collection" -> coll(StrT(5, 11))), "name" -> str(6)),
    "coll-subdoc" -> doc(
      "a" -> coll(doc(
        "b" -> str(16),
        "a" -> coll(union(NullT, int(1, 8), str(5))))),
      "name" -> str(11))
  )

  test("canonical document extraction under simplify (simplify_test.clj:100-115)") {
    simplifyDocumentExpressions.foreach { case (name, expr) =>
      assert(et(expr) == docTypes(name), s"document '$name'")
    }
  }

  test("scalar-scalar cross product unchanged under simplify (simplify_test.clj:208-253)") {
    val kinds = scalarTypes.keys.toSeq
    for (l <- kinds; r <- kinds) {
      val (lt, rt) = (scalarTypes(l), scalarTypes(r))
      val expected = if (l == r) rt else union(lt, rt)
      assert(m(lt, rt) == expected, s"$l + $r")
    }
  }

  test("scalar + union (simplify_test.clj:264-273)") {
    assert(m(NullT, union(BoolT, str(5))) == union(NullT, BoolT, str(5)))
    assert(m(NullT, union(NullT, str(5))) == union(str(5), NullT))
    assert(m(union(NullT, str(5)), NullT) == union(str(5), NullT))
  }

  test("incongruent documents merge into one (simplify_test.clj:287-298)") {
    assert(m(et(obj("a" -> arr(7, 8, JNull))),
             et(obj("a" -> arr(1, 2, 3), "b" -> "not-a-collection"))) ==
      doc("b" -> str(16), "a" -> coll(union(NullT, int(1, 8)))))
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

  test("congruent documents (simplify_test.clj:322-331)") {
    assert(m(congruent1, congruent2) == doc(
      "a" -> union(str(2), int(12, 12)),
      "c" -> coll(union(BoolT, int(1, 3), StrT(3, 4))),
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

  test("document + union cases (simplify_test.clj:355-381)") {
    assert(m(aDocType, union(int(1, 1), str(1))) ==
      union(doc("a" -> int(1, 1), "b" -> str(1)), int(1, 1), str(1)))
    // ALL documents in the union merge together under simplify
    assert(m(aDocType, union(int(1, 1),
        doc("a" -> int(1, 1)),
        doc("a" -> int(1, 1), "b" -> str(1), "c" -> NullT))) ==
      union(int(1, 1),
        doc("a" -> int(1, 1), "c" -> NullT, "b" -> str(1))))
    assert(m(aDocType, union(int(1, 1), doc("a" -> str(1), "b" -> int(1, 1)))) ==
      union(
        doc("a" -> union(int(1, 1), str(1)), "b" -> union(str(1), int(1, 1))),
        int(1, 1)))
    val u = union(int(1, 1), doc("a" -> int(1, 1), "b" -> str(1)))
    assert(m(aDocType, u) == u)
  }

  val collOfStr: SchemaType = et(arr("five", "six"))
  val collOfNum: SchemaType = et(arr(5, 6))
  val collOfNull: SchemaType = et(arr(JNull, JNull))

  test("collection merge cases (simplify_test.clj:403-427)") {
    assert(m(collOfStr, NullT) == union(NullT, coll(StrT(3, 4))))
    assert(m(collOfStr, aDocType) == union(aDocType, coll(StrT(3, 4))))
    assert(m(collOfStr, collOfStr) == collOfStr)
    // collections always unify under simplify
    assert(m(collOfNum, collOfStr) == coll(union(StrT(3, 4), int(5, 6))))
    // "union"-of-two-colls built with the simplify reducer is itself a coll
    val unionOfCollStrNull = SimplifyMerge.turnIntoUnion(Seq(collOfStr, collOfNull)).get
    assert(m(collOfStr, unionOfCollStrNull) ==
      coll(union(NullT, StrT(3, 4))))
    assert(m(collOfNum, unionOfCollStrNull) ==
      coll(union(NullT, StrT(3, 4), int(5, 6))))
  }

  test("order independence (simplify_test.clj:433-449)") {
    val someTypes = Seq[JValue]("hello", "hello", 5, "hi", 5, arr(4, 5, 6),
      arr(7, 8, 9), "hi", arr(7, 8, 9), 42, obj("a" -> "crazy"),
      obj("a" -> "hello")).map(et)
    val merged = SimplifyMerge.mergeAll(someTypes)
    assert(merged == SimplifyMerge.mergeAll(someTypes.reverse))
    assert(merged == union(
      int(5, 42), StrT(2, 5),
      doc("a" -> str(5)),
      coll(int(4, 9))))
  }

  test("union + union merges all documents into one (simplify_test.clj:451-481)") {
    val u1 = SimplifyMerge.mergeAll(Seq[JValue]("hello", 5, JNull, 10.5,
      obj("a" -> "crazy"), obj("a" -> "hello"),
      obj("a" -> "hello", "b" -> 5),
      obj("a" -> "hello", "b" -> true),
      obj("a" -> 10.10, "c" -> 10)).map(et))
    val u2 = SimplifyMerge.mergeAll(Seq[JValue]("hello", 5, JNull,
      obj("a" -> "crazy"), obj("a" -> "hello"),
      obj("a" -> JNull, "b" -> JNull),
      obj("a" -> JNull, "b" -> JNull),
      obj("x" -> "x", "y" -> "y")).map(et))
    assert(m(u1, u2) == union(
      NullT, int(5, 5), str(5), RealT(10.5, 10.5),
      doc(
        "c" -> int(10, 10),
        "x" -> str(1), "y" -> str(1),
        "b" -> union(BoolT, NullT, int(5, 5)),
        "a" -> union(NullT, str(5), RealT(10.1, 10.1)))))
  }

  test("empty union + document -> document (simplify_test.clj:483-487)") {
    assert(m(UnionT(Set.empty), aDocType) == aDocType)
  }
}
