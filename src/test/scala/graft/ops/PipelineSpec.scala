package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** End-to-end training-data pipeline over one synthetic corpus: quality
  * gate -> PII scrub -> exact dedup -> near-dup clusters -> keep canonical
  * -> decontaminate vs eval -> pack. Each stage is unit-tested on its own;
  * this spec guards the COMPOSITION (schemas line up, stages agree on
  * conventions like keep-min-id) against regressions.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("quality -> redact -> dedup -> clusters -> decontaminate -> pack composes") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (1L, s"$base one"),                       // near-dup cluster {1,2,3}
      (2L, s"$base two"),
      (3L, s"$base one"),                       // exact dup of 1
      (4L, "completely different words about mountains and snow and wind here"),
      (5L, "tiny"),                             // fails quality (too short)
      (6L, "mail me at a@b.com please for the full catalog of rare maps " +
        "and charts held in the archive reading room"),
      (10L, s"$base one")                       // the eval doc: contained in 1/3
    ).toDF("doc_id", "text")
      .withColumn("source", when(col("doc_id") < 10, "train").otherwise("eval"))

    // 1. quality gate (default rules: minChars 50 drops doc 5)
    val rules = QualityFilter.Rules(minChars = 50, maxRepetitionRatio = 0.9)
    val clean = QualityFilter.filter(docs, "text", rules)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L, 4L, 6L, 10L))

    // 2. PII scrub rewrites doc 6's email and nothing else
    val scrubbed = Redaction.annotate(clean, "text")
      .withColumn("text", col("text_redacted"))
    assert(scrubbed.agg(sum("n_email")).collect()(0).getLong(0) == 1L)
    assert(scrubbed.filter(col("text").contains("a@b.com")).count() == 0)

    val train = scrubbed.filter(col("source") === "train")
    val eval = scrubbed.filter(col("source") === "eval")

    // 3. exact dedup keeps min id per content (doc 3 drops, identical to 1)
    val exact = Dedup.dropExactDuplicates(train, "text", "doc_id")
    assert(exact.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 4L, 6L))

    // 4. near-dup pairs -> clusters; {1,2} cluster survives exact dedup
    val pairs = Dedup.ngramJaccard(exact,
        Dedup.minhashCandidates(exact, "text", "doc_id", bands = 16,
          minJaccard = 0.2).select("id_a", "id_b"),
        "text", "doc_id").filter(col("jaccard") >= 0.5)
    val clusters = Components.connectedComponents(pairs, "id_a", "id_b")
    val canonical = exact.join(
      clusters.filter(col("id") =!= col("component")).select(col("id").as("doc_id")),
      Seq("doc_id"), "left_anti")
    assert(canonical.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 4L, 6L)) // 2 folded into cluster min 1

    // 5. decontaminate: eval doc 10 is contained in kept train doc 1
    val contam = Decontamination.containmentPairs(canonical, eval,
      "text", "doc_id", minContainment = 0.8)
    assert(contam.select("train_id", "eval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 10L)))
    val decontaminated = canonical.join(
      contam.select(col("train_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    assert(decontaminated.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(4L, 6L))

    // 6. pack what survived
    val packed = Packing.packGreedy(
      decontaminated.withColumn("len", length(col("text"))),
      "source", "doc_id", "len", budget = 200)
    val packs = packed.collect().map(r => (r.getLong(1), r.getSeq[Long](4).toList))
    assert(packs.toSeq == Seq((0L, List(4L, 6L))))
  }
}
