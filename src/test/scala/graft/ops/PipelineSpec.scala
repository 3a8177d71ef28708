package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** End-to-end training-data pipeline over one synthetic corpus, exercising
  * the SHIPPED composition ([[Pipeline.run]] — the same code `Main
  * pipeline` drives): quality gate -> PII scrub -> exact dedup -> near-dup
  * clusters -> keep canonical -> decontaminate vs eval -> pack. Each stage
  * is unit-tested on its own; this spec guards the cross-op conventions
  * (schemas, keep-min-id) through the real wiring.
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

    val res = Pipeline.run(docs, Pipeline.Config(
      evalSources = Seq("eval"),
      rules = QualityFilter.Rules(minChars = 50, maxRepetitionRatio = 0.9),
      jaccardThreshold = 0.5,
      budget = 200))
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet

    // 1. quality gate dropped doc 5 (too short); everything else scrubbed
    assert(ids(res.scrubbed) == Set(1L, 2L, 3L, 4L, 6L, 10L))

    // 2. PII scrub rewrote doc 6's email
    assert(res.scrubbed.agg(sum("n_email")).collect()(0).getLong(0) == 1L)
    assert(res.scrubbed.filter(col("text").contains("a@b.com")).count() == 0)

    // 3. exact dedup kept min id per content (doc 3 identical to 1)
    assert(ids(res.exact) == Set(1L, 2L, 4L, 6L))

    // 4. near-dup cluster {1,2} folded to its min id
    assert(ids(res.canonical) == Set(1L, 4L, 6L))

    // 5. decontamination removed doc 1 (contains the eval doc)
    assert(res.pairs.count() >= 1) // the {1,2} near-dup pair was found
    assert(ids(res.kept) == Set(4L, 6L))

    // 6. the survivors packed into one budget-respecting pack
    val packs = res.packed.collect()
      .map(r => (r.getLong(1), r.getSeq[Long](4).toList))
    assert(packs.toSeq == Seq((0L, List(4L, 6L))))

    // 7. unpersist releases EVERY table the run pinned — including the
    // miner's signature table via its Cached handle (round-2 left it
    // cached with no way to release short of clearCache())
    res.unpersist()
    val uncached = org.apache.spark.storage.StorageLevel.NONE
    assert(res.scrubbed.storageLevel == uncached)
    assert(res.exact.storageLevel == uncached)
    assert(res.kept.storageLevel == uncached)
    res.miner.handles.foreach(f => assert(f.storageLevel == uncached,
      "miner signature table still cached after Result.unpersist()"))
  }
}
