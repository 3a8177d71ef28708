package graft

import graft.types._

/** Single-threaded extract+merge fold rate over reference-shaped records
  * — the ported reference algorithm itself (A1-A8), measured to ground
  * BENCH/BASELINE.md's comparison: `sbt -batch "Test/runMain graft.RefFoldBench"`.
  */
object RefFoldBench {
  def main(args: Array[String]): Unit = {
    val n = 100000
    // records shaped like the tokenized table row as a JSON document
    val records: IndexedSeq[JValue] = (0 until n).map { i =>
      JValue.obj(
        "doc_id" -> JStr(f"doc$i%012x"),
        "tokens" -> JArr((0 until 180).map(j => JInt(BigInt((i * 31 + j) % 50000))).toVector),
        "n_tok" -> JInt(BigInt(180)),
        "source" -> JStr(if (i % 10 < 8) "web" else "books"))
    }
    val extractor = TypeExtractor.merging()
    // warm-up + 3 measured runs
    (0 until 4).foreach { run =>
      val t0 = System.nanoTime()
      val merged = records.iterator.map(extractor.extract)
        .reduce(StrictMerge.mergeTwo)
      val secs = (System.nanoTime() - t0) / 1e9
      if (run > 0)
        println(f"run $run: $n records in $secs%.2f s -> ${n / secs}%.0f rec/s/core (${SchemaType.render(merged).take(60)}...)")
    }
  }
}
