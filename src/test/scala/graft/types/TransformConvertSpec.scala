package graft.types

import org.scalatest.funsuite.AnyFunSuite
import Goldens._
import JValue._

import graft.export.AvroExport

/** Transform + converter + Avro-export goldens (transform_test.clj,
  * data_converters_test.clj, export/avro.clj).
  */
class TransformConvertSpec extends AnyFunSuite {
  private def met(v: JValue) = mergeExtract(v)
  private def set(v: JValue) = simplifyExtract(v)

  test("translatability matrix (transform_test.clj:11-55)") {
    // NOT translatable
    assert(!Transform.translatableToTableSchema(met(JInt(5))))
    assert(!Transform.translatableToTableSchema(met(JStr("hello"))))
    assert(!Transform.translatableToTableSchema(met(JReal(5.5))))
    assert(!Transform.translatableToTableSchema(met(JNull)))
    assert(!Transform.translatableToTableSchema(met(arr())))
    assert(!Transform.translatableToTableSchema(met(obj())))
    assert(!Transform.translatableToTableSchema(met(arr(1, 2, 3))))
    assert(!Transform.translatableToTableSchema(
      met(obj("p1" -> "hello", "nested" -> obj("n1" -> "nested")))))
    assert(!Transform.translatableToTableSchema(
      met(obj("p1" -> "hello", "coll" -> arr(JNull, 5, "hello")))))
    assert(!Transform.translatableToTableSchema(
      SimplifyMerge.mergeTwo(
        met(obj("p1" -> 10, "nested" -> obj("n1" -> 5))),
        met(obj("p1" -> "hello", "nested" -> obj("n1" -> "nested"))))))
    assert(!Transform.translatableToTableSchema(
      StrictMerge.mergeTwo(
        met(obj("p1" -> 10, "p2" -> obj("n1" -> 5, "n2" -> 3))),
        met(obj("p1" -> "hello", "p2" -> "bye")))))
    // translatable
    assert(Transform.translatableToTableSchema(met(obj("col1" -> "hello"))))
    assert(Transform.translatableToTableSchema(
      met(obj("col1" -> "hello", "col2" -> 10, "col3" -> 5.5, "col4" -> JNull))))
    assert(Transform.translatableToTableSchema(
      SimplifyMerge.mergeTwo(
        set(obj("col1" -> 10, "col2" -> "10.5")),
        set(obj("col1" -> "hello", "col2" -> 12.8)))))
  }

  test("tablification via widening lattice (transform_test.clj:57-86)") {
    assert(Transform.dbTablify(met(obj("col1" -> "hello"))) ==
      Some(doc("col1" -> str(5))))
    assert(Transform.dbTablify(
      met(obj("col1" -> "hello", "col2" -> 10, "col3" -> 5.5, "col4" -> JNull))) ==
      Some(doc("col4" -> NullT, "col1" -> str(5),
        "col3" -> RealT(5.5, 5.5), "col2" -> int(10, 10))))
    // unions collapse to the wider branch INSTANCE (metadata of that branch)
    assert(Transform.dbTablify(
      SimplifyMerge.mergeTwo(
        set(obj("col1" -> 10, "col2" -> "10.5")),
        set(obj("col1" -> "hello", "col2" -> 12.8)))) ==
      Some(doc("col1" -> str(5), "col2" -> str(4))))
    assert(Transform.dbTablify(
      SimplifyMerge.mergeAll(Seq(
        set(obj("col1" -> JNull, "col2" -> JNull, "col3" -> JNull,
          "col4" -> JNull, "col5" -> JNull)),
        set(obj("col1" -> true, "col2" -> true, "col3" -> true, "col4" -> true)),
        set(obj("col1" -> 1, "col2" -> 1, "col3" -> 1)),
        set(obj("col1" -> 5.5, "col2" -> 5.5)),
        set(obj("col1" -> "hi"))))) ==
      Some(doc("col4" -> BoolT, "col5" -> NullT, "col1" -> str(2),
        "col3" -> int(1, 1), "col2" -> RealT(5.5, 5.5))))
  }

  test("cast converters (data_converters_test.clj:14-53)") {
    import Converters._
    // :null
    for (v <- Seq[JValue](JNull, true, false, 5, 5.5, "hello!"))
      assert(toNull(v) == JNull)
    // :bool
    assert(toBool(JNull) == JNull)
    assert(toBool(JBool(true)) == JBool(true))
    assert(toBool(JBool(false)) == JBool(false))
    assert(toBool(JInt(5)) == JBool(true))
    assert(toBool(JReal(5.5)) == JBool(true))
    assert(toBool(JStr("hello!")) == JBool(true))
    // :int — round HALF UP
    assert(toInteger(JNull) == JNull)
    assert(toInteger(JBool(true)) == JInt(1))
    assert(toInteger(JBool(false)) == JInt(0))
    assert(toInteger(JInt(5)) == JInt(5))
    assert(toInteger(JReal(5.5)) == JInt(6))
    assert(toInteger(JReal(5.4)) == JInt(5))
    assert(toInteger(JStr("hello!")) == JNull)
    // :real
    assert(toReal(JNull) == JNull)
    assert(toReal(JBool(true)) == JReal(1.0))
    assert(toReal(JBool(false)) == JReal(0.0))
    assert(toReal(JInt(5)) == JReal(5.0))
    assert(toReal(JReal(5.5)) == JReal(5.5))
    assert(toReal(JStr("hello!")) == JNull)
    // :str
    assert(toStr(JNull) == JNull)
    assert(toStr(JBool(true)) == JStr("true"))
    assert(toStr(JInt(5)) == JStr("5"))
    assert(toStr(JReal(5.5)) == JStr("5.5"))
    assert(toStr(JStr("hello!")) == JStr("hello!"))
  }

  test("converter plan derives per-field converters from a document type") {
    val d = doc("a" -> int(1, 5), "b" -> str(3), "c" -> BoolT)
    val plan = Converters.makeTypeConverters(d)
    assert(plan("a")(JReal(2.5)) == JInt(3))
    assert(plan("b")(JInt(7)) == JStr("7"))
    assert(plan("c")(JStr("x")) == JBool(true))
  }

  test("avro export emits valid schemas for every shape (export/avro.clj:9-41)") {
    val t = doc(
      "a" -> int(1, 5),
      "b" -> str(3),
      "c" -> RealT(1.0, 2.0),
      "d" -> BoolT,
      "e" -> coll(union(int(1, 1), str(1))),
      "f" -> doc("inner" -> NullT))
    val json = AvroExport.toAvro(t)
    val parsed = AvroExport.validate(json)
    assert(parsed.getType == org.apache.avro.Schema.Type.RECORD)
    assert(parsed.getField("a").schema().getType == org.apache.avro.Schema.Type.LONG)
    assert(parsed.getField("c").schema().getType == org.apache.avro.Schema.Type.FLOAT)
    assert(parsed.getField("e").schema().getType == org.apache.avro.Schema.Type.ARRAY)
    assert(parsed.getField("e").schema().getElementType.getType ==
      org.apache.avro.Schema.Type.UNION)
  }
}
