package graft.ingest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Spark 4 VariantType is the built-in runtime twin of the engine's
  * dynamic-JSON value model (SURVEY §1.4): `parse_json` covers the
  * semi-structured VALUE side while our TypeExtractor covers the
  * stats-bearing SCHEMA side. This spec pins that the two agree on the
  * events.props corpus.
  */
class VariantSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("parse_json variant ingestion agrees with the engine's inference on props") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // variant path: every props line parses; k is extractable as bigint
    val variant = ev.select(parse_json(col("props")).as("v"))
      .select(variant_get(col("v"), "$.k", "bigint").as("k"))
    val nViaVariant = variant.agg(
      count(lit(1)).as("n"), min("k").as("mn"), max("k").as("mx")).collect()(0)

    // engine path: distributed schema inference over the same strings
    import spark.implicits._
    val res = JsonSchemaInference.infer(ev.select(col("props").as[String]))
    assert(res.failed == 0)
    assert(res.seen == nViaVariant.getLong(0))
    res.schema match {
      case Some(graft.types.DocT(fields)) =>
        val k = fields("k").asInstanceOf[graft.types.IntT]
        assert(k.min == BigInt(nViaVariant.getLong(1)))
        assert(k.max == BigInt(nViaVariant.getLong(2)))
      case other => fail(s"expected a doc schema, got $other")
    }
  }
}
