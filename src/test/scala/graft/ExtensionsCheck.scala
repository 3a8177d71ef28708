package graft

import org.apache.spark.sql.SparkSession

/** Drive for the cluster injection path — run in a FRESH JVM so the
  * builder creates the first session and honors spark.sql.extensions
  * (shared-session specs can't exercise this):
  * `sbt -batch "Test/runMain graft.ExtensionsCheck"`.
  */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = spark.sql(
      """SELECT size(minhash64(shingle_hashes('a b c d e', 2), 8)) AS mh,
        |       token_stats(array(1, 2, 3)).max AS mx,
        |       violation_mask(array(5), 2, 10, 1, 4) AS mask""".stripMargin)
      .collect()(0)
    assert(r.getInt(0) == 8, r)
    assert(r.getInt(1) == 3, r)
    assert(r.getInt(2) == 1, r) // ntok_mismatch bit: n_tok=2 vs size=1
    println(s"EXTENSIONS OK: $r")
    spark.stop()
  }
}
