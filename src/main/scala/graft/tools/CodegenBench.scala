package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the native-expression codegen question (VERDICT r03
  * "What's wrong" #4): every native expression is CodegenFallback, which
  * breaks whole-stage codegen for its projection. This tool isolates the
  * three hottest PROJECTION-side expressions — char_class_counts (q12/q36
  * quality path), cosine_sim (rerank joins / ANN), cut_spans (pipeline
  * cut stage) — on deterministic synthesized inputs big enough to swamp
  * job overhead. Run it at a fallback build and at a doGenCode build; the
  * deltas are the measured fallback tax (recorded in BENCH/CODEGEN.md).
  *
  * Inputs are written to parquet ONCE (outside every timer), so each
  * timed region is exactly one scan + one projection + one tiny agg.
  *
  * Usage: runMain graft.tools.CodegenBench [runs]
  */
object CodegenBench {
  def main(args: Array[String]): Unit = {
    val runs = if (args.nonEmpty) args(0).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      // fail LOUDLY if an expression's generated code doesn't compile —
      // a silent Janino fallback would quietly measure the interpreted
      // path and make the A/B meaningless
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fs = new org.apache.hadoop.fs.Path("target")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(p: String): Boolean =
      fs.exists(fs.makeQualified(new org.apache.hadoop.fs.Path(s"$p/_SUCCESS")))

    def best(name: String, rows: Long)(f: => Any): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val out = f
        ((System.nanoTime() - t0) / 1e9, out)
      }
      val b = ts.map(_._1).min
      println(f"$name%-22s best=${b}%6.2fs  rows/s=${rows / b}%11.0f  out=${ts.last._2}")
    }

    // --- corpus for the text expressions: sf0.1 docs x 200 salted copies
    val docsPath = "target/codegenbench-docs"
    val nDocs = 1000000L
    if (!exists(docsPath)) {
      spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .crossJoin(spark.range(0, 200).select(col("id").as("copy")))
        .select((col("doc_id") * 200 + col("copy")).as("doc_id"),
          concat(col("text"), lit(" salt"), col("copy").cast("string")).as("text"))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(docsPath)
    }
    def docs = spark.read.parquet(docsPath)

    // --- vectors for cosine: 8M deterministic float[64] pairs
    val vecPath = "target/codegenbench-vecs"
    val nVecs = 8000000L
    if (!exists(vecPath)) {
      def vec(salt: Int) = transform(sequence(lit(0), lit(63)),
        j => (pmod(xxhash64(col("id"), j, lit(salt)), lit(1000)).cast("double")
          / 500.0 - 1.0).cast("float"))
      spark.range(0, nVecs).select(col("id"), vec(1).as("va"), vec(2).as("vb"))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(vecPath)
    }
    def vecs = spark.read.parquet(vecPath)

    // --- spans for cut_spans: mined once, persisted outside the timer
    val spans = graft.ops.DupSpans.dupSpansKeepFirst(docs, "text", "doc_id")
      .persist()
    spans.count()

    // warm JIT/codegen cache once per shape, then measure
    best("char_class_counts", nDocs)(
      docs.select(graft.ops.TextOps.charClassCounts(col("text")).as("c"))
        .agg(sum(col("c.n_alpha"))).collect()(0).getLong(0))
    best("cosine_sim", nVecs)(
      vecs.select(graft.ops.CosineSim.cosine_sim(col("va"), col("vb")).as("c"))
        .agg(sum(col("c"))).collect()(0).getDouble(0))
    best("cut_spans", nDocs)(
      graft.ops.DupSpans.cutSpans(docs, "text", "doc_id", spans)
        .agg(sum(length(col("text_cut")))).collect()(0).getLong(0))

    // the candidate-mining projections (q19/q20/q21/q33's signature
    // stage). Checksums are decimal-summed: a raw sum of longs overflows
    // under ANSI.
    def decSum(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(38,0)"))
    best("shingle_hashes", nDocs)(
      docs.select(graft.ops.ShingleHashes.shingle_hashes(col("text"), 3).as("sh"))
        .agg(decSum(element_at(col("sh"), 1)), sum(size(col("sh"))))
        .collect()(0).get(1))
    best("shingle_minhash", nDocs)(
      docs.select(graft.ops.MinHash64.minhash(
          graft.ops.ShingleHashes.shingle_hashes(col("text"), 3), 32).as("sig"))
        .agg(decSum(element_at(col("sig"), 1))).collect()(0).get(0))
    best("shingle_simhash", nDocs)(
      docs.select(graft.ops.SimHash64.simhash(
          graft.ops.ShingleHashes.shingle_hashes(col("text"), 3)).as("sig"))
        .agg(decSum(col("sig"))).collect()(0).get(0))
    best("rhp_signature", nVecs)(
      vecs.select(graft.ops.RhpSignature.rhp_signature(col("va"), 8, 7L).as("sig"))
        .agg(decSum(col("sig"))).collect()(0).get(0))

    // the IVF assignment projection at the q30 shape (nlist=16, dim=64) —
    // the last per-row probe-path expression still on CodegenFallback
    // after round 4 (VERDICT r04 #7)
    val cents: Array[Array[Float]] = Array.tabulate(16)(c =>
      Array.tabulate(64)(j =>
        (((c * 64L + j) * 2654435761L % 1000) / 500.0 - 1.0).toFloat))
    best("nearest_cell", nVecs)(
      vecs.select(graft.ops.Ivf.nearestCell(col("va"), cents).as("c"))
        .agg(sum(col("c"))).collect()(0).getLong(0))

    spans.unpersist()
    spark.stop()
  }
}
