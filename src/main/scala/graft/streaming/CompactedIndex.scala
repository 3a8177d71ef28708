package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Replay-safe base+delta layout for the streaming pipelines' persisted
  * indexes (content-hash and banded-signature). The round-4 layout grew
  * one `batch_id=N` partition per micro-batch FOREVER — at 10^5 batches
  * every probe paid a 10^5-directory listing (round-4 VERDICT: unbounded
  * small-files growth). Here deltas are periodically folded into a
  * compacted BASE generation while preserving the two replay guarantees
  * the flat layout had:
  *
  *  - append idempotence: deltas stay dynamic-overwrite `batch_id=N`
  *    partitions, so a replayed append rewrites itself;
  *  - self-exclusion: a replay that crashed after its index append must
  *    not meet its own batch when probing. The CURRENT batch is NEVER
  *    folded (compaction at the end of batch N folds only batch_ids <= N-1
  *    into the base), so excluding `batch_id = N` from the delta read
  *    keeps working after any number of compactions.
  *
  * Layout under `root`:
  * {{{
  *   root/deltas/batch_id=N/[sub=.../]        one partition per batch
  *   root/base/gen-N/[sub=.../]               compacted generations
  *   root/base/gen-N/_GRAFT_COMMITTED         marker: generation is live
  * }}}
  * A generation named `gen-N` covers every batch_id <= N-1 (its
  * WATERMARK — encoded in the name, no pointer content to parse). The
  * live generation is the highest-numbered COMMITTED one; commit is the
  * creation of the empty marker file, the LAST step of a compaction.
  * A probe reads base(live) ∪ deltas(batch_id > watermark), minus the
  * excluded batch.
  *
  * Crash anywhere is safe BY EXISTENCE, never by file content: a
  * generation without its marker is invisible (a crashed fold is
  * re-overwritten or garbage-collected by a later prune — an earlier
  * design flipped a mutable CURRENT pointer file, whose non-atomic
  * truncate-then-write could corrupt the index permanently); a replayed
  * compaction of an already-committed generation is a no-op (its deltas
  * are already below the watermark); stale delta partitions left by a
  * crashed prune are filtered by the watermark and swept by the next
  * prune. Retention keeps the TWO highest committed generations AND the
  * just-folded deltas for one extra cycle, so an external reader that
  * resolved the live generation (or the old watermark) just before a
  * commit can still finish reading everything its plan references.
  *
  * `batch_id` leads the delta partitioning (sub-keys nest under it) so
  * the delta count needs ONE directory listing; in the base, batch_id is
  * a plain data column and only the sub-keys partition.
  */
private[graft] object CompactedIndex {

  def deltasPath(root: String) = s"$root/deltas"
  def basePath(root: String) = s"$root/base"

  /** Marker whose EXISTENCE inside a generation dir commits it (shared
    * with [[StreamingValidator]]'s stats generations).
    */
  private[streaming] val Marker = "_GRAFT_COMMITTED"

  /** (live generation dir name if any, highest batch_id folded into it). */
  final case class State(gen: Option[String], watermark: Long)

  /** Numbers of committed `gen-N` dirs under `dir`, ascending (shared
    * generation-commit machinery — [[StreamingValidator]] uses the same
    * protocol for its stats state).
    */
  private[streaming] def committedGenNumbers(fs: FileSystem, dir: String): Seq[Long] = {
    val base = fs.makeQualified(new Path(dir))
    if (!fs.exists(base)) Nil
    else fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen-") &&
        fs.exists(new Path(s.getPath, Marker)))
      .map(_.getPath.getName.stripPrefix("gen-").toLong)
      .sorted
  }

  /** Commit `gen-N` under `dir` by creating its marker (the LAST step of
    * a generation write).
    */
  private[streaming] def commitGen(fs: FileSystem, dir: String, n: Long): Unit =
    fs.create(new Path(s"$dir/gen-$n/$Marker"), true).close()

  /** Retention shared by every generation layout: keep the two newest
    * COMMITTED generations (an external reader that resolved the live one
    * just before a commit can still finish), delete older committed ones
    * and dead UNCOMMITTED orphans (crashed folds numbered below the
    * running batch — their writer is gone, they can never commit; keying
    * retention on COMMIT state means an orphan can't displace a real
    * generation from the window).
    */
  private[streaming] def pruneGens(fs: FileSystem, dir: String, batchId: Long): Unit = {
    val committed = committedGenNumbers(fs, dir)
    val keep = committed.takeRight(2).map(n => s"gen-$n").toSet
    fs.listStatus(new Path(dir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen-"))
      .foreach { s =>
        val name = s.getPath.getName
        val n = name.stripPrefix("gen-").toLong
        val isCommitted = committed.contains(n)
        if ((isCommitted && !keep.contains(name)) || (!isCommitted && n < batchId))
          fs.delete(s.getPath, true)
      }
  }

  private def committedGens(fs: FileSystem, root: String): Seq[Long] =
    committedGenNumbers(fs, basePath(root))

  def readState(fs: FileSystem, root: String): State =
    committedGens(fs, root).lastOption match {
      case None => State(None, -1L)
      case Some(n) => State(Some(s"gen-$n"), n - 1)
    }

  /** A pre-round-5 FLAT index (batch_id= / sub= partitions directly under
    * the root) must fail LOUDLY: the base+delta reader would otherwise
    * silently see an empty index and a resumed deployment would stop
    * deduplicating against its prior corpus.
    */
  private def rejectLegacyLayout(fs: FileSystem, root: String): Unit = {
    val p = fs.makeQualified(new Path(root))
    if (fs.exists(p) && fs.listStatus(p).exists { s =>
        val n = s.getPath.getName
        s.isDirectory && n.contains("=")
      })
      sys.error(s"$root holds a pre-compaction FLAT index layout " +
        "(partition dirs at the root). Rebuild the state, or move the " +
        s"partitions under $root/deltas/ to migrate.")
  }

  /** True iff any delta partition holds an actual FILE. A bare
    * `batch_id=` dir left by a crashed prune (children are deleted before
    * the dir) or an empty-batch append must not count: feeding a file-less
    * tree to `spark.read.parquet` fails schema inference, and the probe
    * runs at the START of a batch — a wedge no replay could clear.
    */
  private def deltasHaveFiles(fs: FileSystem, root: String): Boolean = {
    val p = fs.makeQualified(new Path(deltasPath(root)))
    if (!fs.exists(p)) return false
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val n = it.next().getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) return true
    }
    false
  }

  /** True iff the index has any content (deltas or a committed base). */
  def nonEmpty(fs: FileSystem, root: String): Boolean = {
    rejectLegacyLayout(fs, root)
    deltasHaveFiles(fs, root) || committedGens(fs, root).nonEmpty
  }

  /** The index contents visible to batch `excludeBatchId`'s probe. None
    * when the index is empty. batch_id is cast to long on both sides
    * (delta partition-value inference yields int).
    */
  def read(spark: SparkSession, fs: FileSystem, root: String,
           excludeBatchId: Long): Option[DataFrame] = {
    rejectLegacyLayout(fs, root)
    val st = readState(fs, root)
    val deltas =
      if (!deltasHaveFiles(fs, root)) None
      else Some(spark.read.parquet(deltasPath(root))
        .withColumn("batch_id", col("batch_id").cast("long"))
        .filter(col("batch_id") > st.watermark))
    val base = st.gen.map(g =>
      spark.read.parquet(s"${basePath(root)}/$g")
        .withColumn("batch_id", col("batch_id").cast("long")))
    val all = (base, deltas) match {
      case (Some(b), Some(d)) => Some(d.unionByName(b))
      case (b, d) => b.orElse(d)
    }
    // the base never contains the excluded batch (only batch_ids <= an
    // older watermark are folded), so one filter over the union is exact
    all.map(_.filter(col("batch_id") =!= excludeBatchId))
  }

  /** Idempotent per-batch append: a dynamic-overwrite `batch_id=N`
    * partition (sub-keys nested under it).
    */
  def append(df: DataFrame, root: String, batchId: Long,
             subPartitionCols: Seq[String]): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id" +: subPartitionCols: _*)
      .parquet(deltasPath(root))

  private def deltaBatchIds(fs: FileSystem, root: String): Seq[Long] = {
    val p = fs.makeQualified(new Path(deltasPath(root)))
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)
  }

  /** Fold deltas older than the running batch into a new base generation
    * once more than `maxDeltas` have accumulated since the watermark.
    * Called at the END of batch `batchId`, AFTER its append; the running
    * batch's own delta is never folded (see self-exclusion above). The
    * new generation is written fully, then committed by its marker, then
    * folded deltas and dead generations are pruned (every deletion is
    * safe to crash out of).
    */
  def maybeCompact(spark: SparkSession, fs: FileSystem, root: String,
                   batchId: Long, maxDeltas: Int,
                   subPartitionCols: Seq[String]): Unit = {
    val st = readState(fs, root)
    val foldable = deltaBatchIds(fs, root)
      .filter(id => id > st.watermark && id < batchId)
    if (foldable.size <= maxDeltas) return

    val deltasToFold = spark.read.parquet(deltasPath(root))
      .withColumn("batch_id", col("batch_id").cast("long"))
      .filter(col("batch_id") > st.watermark && col("batch_id") < batchId)
    val folded = st.gen match {
      case None => deltasToFold
      case Some(g) => deltasToFold.unionByName(
        spark.read.parquet(s"${basePath(root)}/$g")
          .withColumn("batch_id", col("batch_id").cast("long")))
    }
    val genDir = s"${basePath(root)}/gen-$batchId"
    val writer = folded.write.mode("overwrite")
    (if (subPartitionCols.nonEmpty) writer.partitionBy(subPartitionCols: _*)
     else writer).parquet(genDir)
    // the commit: marker existence IS the committed state (created after
    // the data is fully written; overwrite above wipes any stale marker
    // from a crashed earlier attempt first)
    commitGen(fs, basePath(root), batchId)

    // prune AFTER the commit — but only deltas already covered by the
    // PREVIOUS watermark. The just-folded deltas stay one grace cycle:
    // an external reader (the index()/hashIndex() inspection surfaces)
    // that resolved the OLD watermark just before this commit still has
    // base(old) ∪ deltas(> old watermark) in flight — deleting the
    // just-folded partitions under it would FileNotFound mid-scan. New
    // probes read the new watermark and never touch them; the next fold
    // sweeps them. Listing stays bounded at ~2x the fold threshold.
    deltaBatchIds(fs, root).filter(_ <= st.watermark).foreach { id =>
      fs.delete(new Path(s"${deltasPath(root)}/batch_id=$id"), true)
    }
    pruneGens(fs, basePath(root), batchId)
  }
}
