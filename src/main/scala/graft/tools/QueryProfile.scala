package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.Queries

/** Per-job breakdown of a battery query: runs selected queries under the
  * exact Bench session configuration, recording every Spark job's wall
  * time and description, so optimization effort goes where the seconds
  * are (guide §1). Also dumps `explain("formatted")` per query when a
  * plans output dir is given. Diagnostic only — not part of the driver
  * contract.
  *
  * Usage: runMain graft.tools.QueryProfile q19_minhash_lsh[,q33_...] \
  *   [runs] [plansDir] [suffix]
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProfile q1[,q2...] [runs] [plansDir] [suffix]")
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val runs = if (args.length > 1) args(1).toInt else 2
    val plansDir = if (args.length > 2) Some(args(2)) else None
    val suffix = if (args.length > 3) args(3) else ""
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class JobRec(id: Int, desc: String, start: Long, var end: Long)
    val jobs = new ConcurrentLinkedQueue[JobRec]()
    val byId = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val r = JobRec(js.jobId, desc, js.time, -1L)
        jobs.add(r); byId.put(js.jobId, r)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val r = byId.get(je.jobId)
        if (r != null) r.end = je.time
      }
    })

    val defs = Queries.defs.toMap
    val known = defs.keySet
    val bad = names.filterNot(known)
    require(bad.isEmpty, s"unknown queries: ${bad.mkString(",")}")

    // q40 needs its index (built outside the timed region, like Bench)
    if (names.contains("q40_incremental_dedup"))
      Queries.ensureQ40Index(spark, sfDir)

    // warm readers once
    try spark.read.parquet(s"$sfDir/nation.parquet").count()
    catch { case _: Throwable => }

    for (name <- names) {
      val d = defs(name)
      plansDir.foreach { pd =>
        val f = new java.io.File(pd); f.mkdirs()
        val txt = d.fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val out = new java.io.PrintWriter(s"$pd/$name$suffix.txt")
        try out.println(txt) finally out.close()
      }
      for (run <- 1 to runs) {
        jobs.clear(); byId.clear()
        val t0 = System.nanoTime()
        val n = d.fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // let listener events drain (listenerBus is private[spark])
        Thread.sleep(200)
        import scala.jdk.CollectionConverters._
        val recs = jobs.asScala.toSeq.sortBy(_.id)
        println(f"== $name run $run: wall=$wall%.3f s, rows=$n, jobs=${recs.size}")
        recs.foreach { r =>
          val dur = if (r.end > 0) (r.end - r.start) / 1e3 else -1.0
          println(f"   job ${r.id}%4d ${dur}%8.3f s  ${r.desc.take(100)}")
        }
        val gaps = {
          // time not covered by any job (driver-side planning etc.)
          val covered = recs.filter(_.end > 0).map(r => (r.start, r.end))
            .sortBy(_._1)
          var merged = List.empty[(Long, Long)]
          for ((s, e) <- covered) merged = merged match {
            case (ms, me) :: rest if s <= me =>
              (ms, math.max(me, e)) :: rest
            case _ => (s, e) :: merged
          }
          merged.map { case (s, e) => e - s }.sum / 1e3
        }
        println(f"   [job-covered ${gaps}%.3f s; driver/planning gap ${wall - gaps}%.3f s]")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
