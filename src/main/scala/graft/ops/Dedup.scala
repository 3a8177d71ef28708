package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora. All are expressed as
  * declarative plans (hash aggregates + explode/band joins) so Catalyst
  * keeps partial aggregation map-side and AQE handles skew; nothing
  * collects to the driver.
  */
object Dedup {

  /** Exact duplicate groups by full content: (key, n, keep_id, drop_ids).
    * `keep` picks the minimum id as the canonical representative.
    */
  def exactGroups(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(text.as("dup_text"))
      .agg(count(lit(1)).as("n"), min(id).as("keep_id"),
        sort_array(collect_list(id)).as("all_ids"))
      .filter(col("n") > 1)

  /** Exact dedup keeping the minimum id per content hash. Grouping by a
    * 64-bit content hash (not the text itself) keeps shuffle rows narrow;
    * at corpus scale the collision probability is negligible and a
    * verification re-check can compare texts within groups.
    */
  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(xxhash64(col(textCol)))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature: `perms` independent min-hashes over the shingle
    * set (standard construction). Delegates to the native [[MinHash64]]
    * expression — one tight loop per row instead of perms*n interpreted
    * lambda evaluations. Returns array<bigint> of length `perms`.
    */
  def minhashSignature(shingleHashes: Column, perms: Int = 32): Column =
    MinHash64.minhash(shingleHashes, perms)

  /** LSH banding: split the signature into `bands` bands of equal width
    * and hash each band; two docs sharing ANY band hash are candidates.
    * Returns the input with an exploded (band, band_hash) pair per row —
    * group on these to find candidate buckets.
    */
  def lshBands(sig: Column, bands: Int, perms: Int): Column = {
    val rowsPerBand = perms / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(concat_ws(",",
          slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))).cast("string")).as("band_hash")))
  }

  /** Near-duplicate candidate pairs via MinHash+LSH over word shingles.
    * Pipeline: shingle -> minhash -> band -> self-join within buckets ->
    * exact-Jaccard rerank on the signatures. The band groupBy is the only
    * shuffle of full signatures; the pair join is bucket-local.
    */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        shingleK: Int = 3, perms: Int = 32, bands: Int = 8,
                        minJaccard: Double = 0.5, maxBucket: Int = 64,
                        materialize: Boolean = true): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
        minhashSignature(TextOps.shingles(col(textCol), shingleK), perms).as("sig"))
      .withColumn("bandinfo", explode(lshBands(col("sig"), bands, perms)))
      .select(col("id"), col("sig"),
        col("bandinfo.band").as("band"), col("bandinfo.band_hash").as("band_hash"))

    // giant-bucket pruning (standard LSH practice): a band hash shared by
    // B docs generates B^2/2 pairs — degenerate buckets (boilerplate
    // shingles) would dominate the join without finding near-dups. One
    // window pass over the (band, band_hash) shuffle does it — no second
    // scan + agg + join.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("band_hash"))
    val bucketed = sigs
      .withColumn("__bsz", count(lit(1)).over(w))
      .filter(col("__bsz") <= maxBucket)
      .drop("__bsz")
    // the signature table is ~perms longs + an id per doc — a tiny
    // fraction of the corpus. Materializing it means the text is
    // shingled+minhashed ONCE; without it each side of the self-join
    // re-reads and re-hashes the full corpus.
    val pruned =
      if (materialize)
        bucketed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else bucketed

    // bucket-local pair generation: same (band, band_hash), id < id2;
    // est_jaccard is computed INSIDE the join and only narrow columns
    // survive into the pair-dedup shuffle
    val l = pruned.alias("l")
    val r = pruned.alias("r")
    val agree = size(filter(zip_with(col("l.sig"), col("r.sig"),
      (a, b) => a === b), x => x))
    l.join(r,
        col("l.band") === col("r.band") &&
          col("l.band_hash") === col("r.band_hash") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        (agree / lit(perms.toDouble)).as("est_jaccard"))
      .filter(col("est_jaccard") >= minJaccard)
      .dropDuplicates("id_a", "id_b")
  }

  /** SimHash near-duplicate candidates: signature per doc, then pairs
    * within identical signature prefixes (cheap blocking) filtered by
    * Hamming distance.
    */
  def simhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        maxHamming: Int = 6, prefixBits: Int = 16,
                        materialize: Boolean = true): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
      SimHash64.simhash(TextOps.shingles(col(textCol), 3)).as("sig"))
    val blocked = sigs.withColumn("block",
      shiftrightunsigned(col("sig"), 64 - prefixBits))
    val withBlock =
      if (materialize)
        blocked.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else blocked
    val l = withBlock.alias("l"); val r = withBlock.alias("r")
    l.join(r, col("l.block") === col("r.block") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        SimHash64.hamming(col("l.sig"), col("r.sig")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for given candidate id pairs
    * (rerank step after LSH blocking).
    */
  def ngramJaccard(df: DataFrame, pairs: DataFrame, textCol: String,
                   idCol: String, k: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(TextOps.shingles(col(textCol), k)).as("sh"))
    pairs
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))) /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding near-duplicates: cosine >= threshold among candidate pairs
    * blocked by random-hyperplane LSH (see [[Similarity.rhpSignature]]).
    */
  def embeddingNearDups(df: DataFrame, vecCol: String, idCol: String,
                        threshold: Double = 0.95, planes: Int = 16,
                        seed: Long = 7L, materialize: Boolean = true): DataFrame = {
    val blocked = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("block", Similarity.rhpSignature(col("v"), planes, seed))
    val sigs =
      if (materialize)
        blocked.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else blocked
    val l = sigs.alias("l"); val r = sigs.alias("r")
    l.join(r, col("l.block") === col("r.block") && col("l.id") < col("r.id"))
      .withColumn("cosine", Similarity.cosine(col("l.v"), col("r.v")))
      .filter(col("cosine") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), col("cosine"))
  }
}
