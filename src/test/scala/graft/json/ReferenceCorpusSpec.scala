package graft.json

import org.scalatest.funsuite.AnyFunSuite

import graft.types._
import graft.types.JValue._

/** Fidelity tests against the reference's OWN fixture files, read at
  * runtime from the read-only checkout (nothing is copied into this
  * repo). Skipped gracefully if the reference tree is absent.
  *
  *  - parser_test.clj:6-20: multiply-escaped nested JSON revives to the
  *    exact golden structures;
  *  - twitter_test.clj:11-29 + extract_test.clj:289-296: the 92-tweet
  *    firehose sample (heterogeneous delete-records vs tweet-records,
  *    unicode escapes) extracts and merges without throwing, and the
  *    merged strict type is a Union of the two record shapes.
  */
class ReferenceCorpusSpec extends AnyFunSuite {

  private val refRoot = "/root/reference/test/jsonschema"

  private def slurp(path: String): Option[String] = {
    val f = new java.io.File(path)
    if (f.isFile) Some(scala.io.Source.fromFile(f, "UTF-8").mkString) else None
  }

  test("nested-escaped-json.js revives to the reference golden (parser_test.clj:6-13)") {
    assume(slurp(s"$refRoot/nested-escaped-json.js").isDefined, "reference not present")
    val line = slurp(s"$refRoot/nested-escaped-json.js").get.trim
    val parsed = JsonParser.parseJsonLine(line)
    assert(parsed.isRight, parsed)
    val expected = JValue.obj("level1" -> JValue.obj(
      "level2_0" -> JValue.arr(
        JValue.obj("level3_i0_p0_key" -> JInt(1), "level3_i1_p1_key" -> JInt(10)),
        JValue.obj("level3_i1_p0_key" -> JInt(2), "level3_i1_p1_key" -> JInt(20)),
        JValue.obj("level3_i2_p0_key" -> JInt(3), "level3_i2_p1_key" -> JInt(1))),
      "level2_1" -> JInt(18824),
      "level2_2" -> JInt(906463)))
    assert(parsed.toOption.get == expected)
  }

  test("nested-escaped-json2.js revives to the reference golden (parser_test.clj:15-21)") {
    assume(slurp(s"$refRoot/nested-escaped-json2.js").isDefined, "reference not present")
    val line = slurp(s"$refRoot/nested-escaped-json2.js").get.trim
    val parsed = JsonParser.parseJsonLine(line)
    assert(parsed.isRight, parsed)
    val expected = JValue.obj("level1" -> JValue.obj(
      "level2_0" -> JInt(1),
      "level2_1" -> JInt(0),
      "level2_2" -> JValue.arr(
        JValue.obj("level2_i0_p0_key" -> JInt(1), "level2_i1_p0_key" -> JInt(1)))))
    assert(parsed.toOption.get == expected)
  }

  test("92-tweet firehose sample extracts + merges without throwing (twitter_test.clj)") {
    assume(slurp(s"$refRoot/type_system/tweets.js").isDefined, "reference not present")
    val content = slurp(s"$refRoot/type_system/tweets.js").get
    // the reference parses the whole file as one JSON array (cheshire
    // parse-string of the slurped file), then extracts per element
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(content)
    val tweets = JsonParser.fromJackson(node) match {
      case JArr(items) => items
      case other => fail(s"tweets.js did not parse to an array: ${other.getClass}")
    }
    assert(tweets.nonEmpty)

    val extractor = TypeExtractor.merging()
    val types = tweets.map(extractor.extract)
    val merged = types.reduce(StrictMerge.mergeTwo)

    // the corpus mixes {"delete": {...}} records with full tweet records
    // -> the strict merged type is a Union whose members include a
    // doc with only the "delete" property and a doc with tweet fields
    merged match {
      case UnionT(members) =>
        val keysets = members.collect { case DocT(m) => m.keySet }
        assert(keysets.exists(_ == Set("delete")), s"no delete-record shape in $keysets")
        assert(keysets.exists(ks => ks.contains("text") && ks.contains("user")),
          s"no tweet shape in $keysets")
      case other => fail(s"expected a Union of record shapes, got ${SchemaType.render(other)}")
    }

    // lenient policy collapses the same corpus to ONE unifying document
    val simplifier = TypeExtractor.simplifying()
    val simplified = tweets.map(simplifier.extract).reduce(SimplifyMerge.mergeTwo)
    simplified match {
      case DocT(m) =>
        assert(m.keySet.contains("delete") && m.keySet.contains("text"))
      case other => fail(s"expected one unified document, got ${SchemaType.render(other)}")
    }
  }
}
