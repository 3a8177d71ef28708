package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, concat_ws, floor, length, lit, substring_index}

/** Sequence packing: greedy first-fit-in-order packing of token sequences
  * into a fixed context budget — the step that turns a filtered corpus
  * into dense training batches (padding waste = budget - total_len per
  * pack).
  *
  * Semantics (deterministic): within each group, sequences in ascending id
  * order accumulate into the current pack until the next one would
  * overflow `budget`, which starts a new pack; a sequence longer than the
  * budget gets a singleton (oversized) pack rather than being dropped —
  * filtering is the caller's policy decision.
  *
  * Execution shape: `flatMapSortedGroups` per group key — one streaming
  * pass per group with O(1) state (the open pack), never materializing a
  * group in memory. Packing is inherently sequential WITHIN a pack run;
  * distribution comes from the grouping key. At corpus scale the natural
  * key is (source, id-range bucket): packs never cross buckets, each
  * bucket packs independently, and the boundary waste is at most one
  * underfull pack per bucket.
  */
object Packing {

  /** The corpus-scale grouping key "(source)#(id-range bucket)": ids in
    * [b*idsPerBucket, (b+1)*idsPerBucket) pack together, so parallelism is
    * #sources x #occupied-buckets instead of #sources (keying by source
    * alone streams an entire source through ONE task at 100 TB). Contiguous
    * id ranges — not a hash — keep the in-order greedy semantics intact
    * within each bucket; the boundary cost is at most one underfull pack
    * per bucket, bounded and deterministic. Needs no data statistics:
    * pick idsPerBucket so a bucket's sequences sum to a few hundred MB.
    * `byCol` must be non-null; recover the parts with [[parseBucketKey]]
    * (which parses from the RIGHT, so a source containing '#' round-trips).
    */
  def bucketKey(byCol: Column, idCol: Column, idsPerBucket: Long): Column = {
    require(idsPerBucket > 0, "idsPerBucket must be positive")
    concat_ws("#", byCol.cast("string"),
      floor(idCol.cast("long") / idsPerBucket).cast("long").cast("string"))
  }

  /** (source, bucket) back out of a [[bucketKey]] group. The bucket
    * digits follow the LAST '#', so parsing from the right is exact even
    * when the source value itself contains '#' (a left split would
    * truncate it and throw on the long cast under ANSI mode).
    */
  def parseBucketKey(group: Column): (Column, Column) = {
    val bucket = substring_index(group, "#", -1)
    val source = group.substr(lit(1), length(group) - length(bucket) - 1)
    (source, bucket.cast("long"))
  }

  /** One pack per output row: (group, pack_id, n_seqs, total_len, seq_ids).
    * `pack_id` is the 0-based pack index within the group.
    */
  def packGreedy(df: DataFrame, byCol: String, idCol: String,
                 lenCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._

    df.select(col(byCol).cast("string").as("g"),
        col(idCol).cast("long").as("id"), col(lenCol).cast("long").as("len"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("id")) { (g, rows) =>
        new Iterator[(String, Long, Long, Long, Seq[Long])] {
          private var packId = -1L
          private var pending: Option[(Long, Long)] = None // (id, len) overflowing the open pack
          def hasNext: Boolean = pending.nonEmpty || rows.hasNext
          def next(): (String, Long, Long, Long, Seq[Long]) = {
            packId += 1
            val ids = Seq.newBuilder[Long]
            var total = 0L
            var n = 0L
            var open = true
            while (open && (pending.nonEmpty || rows.hasNext)) {
              val (id, len) = pending.getOrElse {
                val r = rows.next(); (r._2, r._3)
              }
              pending = None
              if (n == 0L || total + len <= budget) {
                ids += id; total += len; n += 1
                // an oversized sequence fills its singleton pack
                if (total >= budget) open = false
              } else {
                pending = Some((id, len)) // starts the next pack
                open = false
              }
            }
            (g, packId, n, total, ids.result())
          }
        }
      }
      .toDF("group", "pack_id", "n_seqs", "total_len", "seq_ids")
  }
}
