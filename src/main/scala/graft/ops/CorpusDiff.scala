package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the dataset-versioning op a production
  * training pipeline iterates with: given two snapshots of a documents
  * table, report which documents were `added`, `removed`, or `changed`
  * between them. Unchanged documents are EXCLUDED from the output by
  * design: at 100 TB the diff is the small artifact (a recipe tweak
  * touches a sliver of the corpus), so emitting the unchanged majority
  * would defeat the point — callers wanting the full classification
  * anti-join the diff against either snapshot.
  *
  * Payload-free: each side is projected to (id, h1, h2) — the same
  * 128-bit content key as exact dedup (two INDEPENDENT xxhash64 chains,
  * salt literal FIRST; see [[Dedup]]) — so text never enters the join
  * exchange and "changed" means the 128-bit keys differ (false-equal
  * odds 2^-128 per pair; at any corpus scale the expected error is
  * immaterial, same argument as the dedup key).
  *
  * Contract: `idCol` identifies a document within a snapshot (one row
  * per id; NULL-id rows are dropped — no identity, no diffable row). A
  * NULL text hashes like any other value (xxhash64 skips null children,
  * yielding a stable constant), so NULL -> NULL reads unchanged and
  * NULL -> "x" reads changed, which is the honest answer.
  *
  * 100-TB posture: two narrow projections + ONE id-keyed full-outer
  * join of 24-byte rows (co-partitioned hash exchange on the id; full
  * outer cannot broadcast, and shouldn't — both sides are
  * corpus-sized), then a codegen'd status CASE + filter. Shuffle bytes
  * are ~48/doc regardless of document size.
  */
object CorpusDiff {

  /** The diff of `before` -> `after`: (id, status) rows with status in
    * {added, removed, changed}; unchanged ids are absent. The output id
    * column keeps `idCol`'s name.
    */
  def diff(before: DataFrame, after: DataFrame, idCol: String,
           textCol: String): DataFrame = {
    def keyed(df: DataFrame, tag: String): DataFrame = df
      .filter(col(idCol).isNotNull)
      .select(col(idCol),
        xxhash64(col(textCol)).as(s"__h1$tag"),
        Dedup.contentHash2(col(textCol)).as(s"__h2$tag"))
    keyed(before, "b")
      .join(keyed(after, "a"), Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__h1b").isNull, lit("added"))
          .when(col("__h1a").isNull, lit("removed"))
          .when(col("__h1b") =!= col("__h1a") ||
            col("__h2b") =!= col("__h2a"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col(idCol), col("status"))
  }
}
