package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Ivf, SimHash64, Similarity, TextOps}

/** Scratch diagnostics for tuning the graded ANN/near-dup probe settings
  * on the fixed corpus. Not part of the library surface.
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- simhash: hamming of the 25 truth pairs
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sigs = docs.select(col("doc_id"),
        SimHash64.simhash(TextOps.shingles(col("text"), 3)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = Dedup.ngramJaccard(docs,
      Dedup.minhashCandidates(docs, "text", "doc_id", bands = 16, minJaccard = 0.2)
        .select(col("id_a"), col("id_b")),
      "text", "doc_id").filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    println(s"truth pairs: ${truth.length}")
    truth.foreach { case (a, b) =>
      val h = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
      def shared(blocks: Int): Int = {
        val w = 64 / blocks
        val m = if (w == 64) -1L else (1L << w) - 1
        (0 until blocks).count { blk =>
          ((sigs(a) >>> (blk * w)) & m) == ((sigs(b) >>> (blk * w)) & m)
        }
      }
      println(f"pair ($a%4d,$b%4d) hamming=$h%2d shared4=${shared(4)} shared8=${shared(8)}")
    }

    // ---- lsh ann: hamming of true top-10 sigs vs query sig, per (planes, seed)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    val rest = emb.filter(col("vec_id") =!= 0)
    val top10 = Similarity.bruteTopK(rest, "embedding", "vec_id", query, 10)
      .collect().map(_.getLong(0))
    println(s"true top10: ${top10.mkString(",")}")
    // simhash multi-table mask simulation: min tables covering all pairs
    val diffs = truth.map { case (a, b) => sigs(a) ^ sigs(b) }
    for (seed <- 1L to 12L) {
      val masksByTable = Dedup.blockMasks(4, 16, seed)
      val neededTables = diffs.map { d =>
        val idx = masksByTable.indexWhere(ms => ms.exists(m => (d & m) == 0L))
        if (idx < 0) 99 else idx
      }
      println(s"maskSeed=$seed worstPairNeedsTable=${neededTables.max} (99 = some pair unfound in 16 tables)")
    }

    // seed table: maxHam per seed at planes=8 (cross-SF intersection)
    val hamBySeed = (1L to 40L).map { seed =>
      val planes = 8
      val qArr = array(query.map(v => lit(v)): _*)
      val qsig = spark.range(1)
        .select(Similarity.rhpSignature(qArr, planes, seed)).collect()(0).getLong(0)
      val s = rest.filter(col("vec_id").isin(top10.map(Long.box): _*))
        .select(col("vec_id"),
          Similarity.rhpSignature(col("embedding"), planes, seed).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      seed -> top10.map(id => java.lang.Long.bitCount(s(id) ^ qsig)).max
    }
    println("planes=8 seed->maxHam: " + hamBySeed.map { case (s, m) => s"$s:$m" }.mkString(" "))

    // ---- ivf: probe-rank table per seed at nlist=16
    val rankBySeed = (1L to 20L).map { seed =>
      val index = Ivf.build(rest, "embedding", "vec_id", nlist = 16, seed = seed)
      val order = Ivf.probeCells(index.centroids, query, 16)
      val cellOf = index.assigned.filter(col("vec_id").isin(top10.map(Long.box): _*))
        .select("vec_id", "__cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      seed -> top10.map(id => order.indexOf(cellOf(id))).max
    }
    println("nlist=16 seed->maxRank: " + rankBySeed.map { case (s, m) => s"$s:$m" }.mkString(" "))
    spark.stop()
  }
}
