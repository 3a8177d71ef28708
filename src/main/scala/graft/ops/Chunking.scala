package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the SPLITTING complement to
  * [[Packing]]'s combining: a document longer than the training context
  * becomes overlapping fixed-width chunks (the standard
  * stride-tokenization shape), short documents pass through as one
  * chunk. Downstream, [[Packing]] packs the chunks.
  *
  * Chunk rule (full-width convention): a doc of n words emits chunks at
  * starts `0, stride, 2*stride, ...` while a full `chunkWords`-wide
  * window fits, plus a final RIGHT-ALIGNED chunk at `n - chunkWords` —
  * so every chunk of a long doc is exactly `chunkWords` wide and the
  * tail is never orphaned into a sliver the previous chunk already
  * contains (the naive "every k*stride start" rule emits such
  * contained-duplicate tails). A doc with n <= chunkWords emits itself
  * as chunk 0. Start arithmetic is pure integers (the one double
  * division is floor'd and exact: |a/b - N| >= 1/b dwarfs the 2^-53
  * rounding), so a DuckDB oracle reproduces the chunk set bit-for-bit.
  *
  * 100-TB posture: one projection computes the per-doc start count
  * (codegen'd `sequence`, no HOF lambda), `posexplode` emits
  * (doc, chunk_idx) rows map-side, and the slice happens where the
  * document lives — NO exchange anywhere; output partitioning inherits
  * the scan. Output size ~= corpus * (1 + overlap fraction).
  *
  * NULL text emits no chunks (nothing to train on); callers route those
  * through an explicit policy.
  */
object Chunking {

  /** (idCol, chunk_idx, n_chunk_words, chunk_text) — see the chunk rule
    * above.
    */
  def chunk(df: DataFrame, textCol: String, idCol: String,
            chunkWords: Int = 512, strideWords: Int = 384): DataFrame = {
    require(chunkWords >= 1, s"chunkWords must be >= 1: $chunkWords")
    require(strideWords >= 1 && strideWords <= chunkWords,
      s"strideWords must be in [1, chunkWords]: $strideWords")
    val words = split(col(textCol), " ")
    val n = size(words).cast("long")
    // last stride index: ceil((n - chunk) / stride) = floor((n - chunk
    // + stride - 1) / stride), clamped at 0 for short docs
    val kMax = greatest(lit(0L),
      floor((n - chunkWords + strideWords - 1) / strideWords).cast("long"))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), words.as("__w"), n.as("__n"),
        // sequence(0, kMax) step 1: the element IS the chunk index
        explode(sequence(lit(0L), kMax)).as("chunk_idx"))
      .withColumn("__start", greatest(lit(0L),
        least(col("chunk_idx") * strideWords, col("__n") - chunkWords)))
      .select(col(idCol), col("chunk_idx"),
        least(lit(chunkWords.toLong), col("__n") - col("__start"))
          .as("n_chunk_words"),
        array_join(slice(col("__w"), (col("__start") + 1).cast("int"),
          lit(chunkWords)), " ").as("chunk_text"))
  }
}
