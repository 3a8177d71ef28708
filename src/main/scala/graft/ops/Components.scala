package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected pair list — the cluster-forming
  * step of a dedup pipeline (near-dup PAIRS from [[Dedup]] become dedup
  * GROUPS; the canonical representative is the minimum id, matching
  * [[Dedup.exactGroups]]' keep-min convention).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14), which
  * converges in O(log^2 n) rounds regardless of graph diameter — the
  * right choice at corpus scale where a naive min-label propagation needs
  * diameter rounds (a chain of borderline near-dups can be arbitrarily
  * long). Each round is two hash-shuffles of the (long, long) edge list —
  * no driver-side state, no collect; per-round frames are persisted and
  * lineage-truncated so the plan does not grow with the iteration count.
  * `reliableCheckpoint = true` uses `checkpoint()` (requires
  * `spark.sparkContext.setCheckpointDir`) — the durable truncation for
  * long cluster runs where an executor loss must not recompute the whole
  * round history; the default `localCheckpoint` keeps blocks on
  * executors (fast, fine for a single box or short jobs).
  */
object Components {

  /** (id, component) for every id appearing in a non-self pair (self-pairs
    * (a, a) are dropped by canonicalization — a node with no real edge
    * belongs to no component), where component is the minimum id of the
    * connected component. Ids must be integral (cast to long); map string
    * keys through a dictionary first.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 50,
                          reliableCheckpoint: Boolean = false): DataFrame = {
    def truncate(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(eager = true)
      else df.localCheckpoint(true)
    // reliable checkpoints are NOT reclaimed by the ContextCleaner
    // (cleanCheckpoints defaults false) and survive application exit —
    // without explicit deletion a 30-round run leaves 30 full edge-list
    // copies in the checkpoint dir. Each round deletes the round it
    // superseded AFTER the new checkpoint has materialized (eager=true);
    // the FINAL round's files back the returned frame and stay (the
    // caller owns the checkpoint dir's lifecycle).
    def checkpointFile(df: DataFrame): Option[String] =
      if (reliableCheckpoint)
        org.apache.spark.sql.graftbridge.RddBridge.checkpointFile(df)
      else None
    def deleteCheckpoint(path: Option[String]): Unit =
      path.foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(pairs.sparkSession.sparkContext.hadoopConfiguration)
          .delete(hp, true)
      }
    def canon(df: DataFrame): DataFrame =
      df.filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct()

    // convergence: the canonical edge set is unchanged (count + an
    // order-invariant hash-sum; a collision masking a real change would
    // need a 64-bit coincidence across the whole edge set). The sum runs
    // in decimal(38,0): ANSI mode is on and a long sum of hashes throws
    // on overflow.
    def sig(df: DataFrame): (Long, BigInt) = {
      val r = df.agg(count(lit(1)).as("n"),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")).as("h"))
        .collect()(0)
      (r.getLong(0),
        if (r.isNullAt(1)) BigInt(0) else BigInt(r.getDecimal(1).toBigInteger))
    }

    var edges = truncate(canon(pairs.select(
        col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))))
    var edgesSig = sig(edges) // carried across rounds: one action per round

    var it = 0
    var converged = edgesSig._1 == 0L
    while (!converged && it < maxIter) {
      // large-star: every node attaches its strictly-larger neighbors to
      // the minimum of its neighborhood (including itself)
      val nbrs = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy(col("u"))
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val ls = canon(nbrs.filter(col("v") > col("u"))
        .join(mins, "u")
        .select(col("v").as("u"), col("m").as("v")))

      // small-star: every node attaches its smaller-or-equal neighborhood
      // (and itself) to that neighborhood's minimum. ls is canonical
      // (u > v), so the grouping is directly by u.
      val mins2 = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
      val ss = canon(
        ls.join(mins2, "u").select(col("v").as("u"), col("m").as("v"))
          .union(mins2.select(col("u"), col("m").as("v"))))
        .persist(StorageLevel.MEMORY_AND_DISK)

      val ssSig = sig(ss)
      converged = ssSig == edgesSig
      edgesSig = ssSig
      // superseded rounds: dropping the `edges` reference is what frees a
      // localCheckpoint'd frame — its blocks belong to the checkpointed
      // RDD and are reclaimed by the ContextCleaner once unreachable
      // (Dataset.unpersist would be a no-op on it); ss's explicit cache is
      // released here, and a superseded RELIABLE checkpoint's files are
      // deleted explicitly (the cleaner never touches them)
      val superseded = checkpointFile(edges)
      edges = truncate(ss)
      ss.unpersist()
      deleteCheckpoint(superseded)
      it += 1
    }
    require(converged || it < maxIter,
      s"connectedComponents did not converge in $maxIter rounds")

    // converged edges form stars (non-root, root): the assignment is the
    // star edges plus a self-assignment for each root
    edges.select(col("u").as("id"), col("v").as("component"))
      .union(edges.select(col("v").as("id"), col("v").as("component")))
      .distinct()
  }

  /** Cluster summary over near-dup pairs: (component, n_docs, min_doc,
    * max_doc), one row per component. Every component has >= 2 members
    * because membership comes from the pair list and self-pairs are
    * dropped by canonicalization — ids appearing ONLY as (a, a) rows do
    * not join any component (singletons are not clusters). The convenience
    * composition used by the dedup pipeline and the q33 driver query.
    */
  def dupClusters(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .groupBy(col("component"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        min(col("id")).as("min_doc"), max(col("id")).as("max_doc"))
}
