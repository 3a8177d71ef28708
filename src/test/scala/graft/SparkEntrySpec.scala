package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: every query runs at sf0.001 and the flagship
  * entry returns verdict rows. (Exact value checks against DuckDB run in
  * the driver's oracle gate and in scripts/check_oracle.py.)
  */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns >0 verdict rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every queries entry executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sfDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracle names are a subset of query names with aligned columns promised") {
    val qNames = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qNames))
    assert(SparkEntry.oracleSql.size >= 18)
  }
}
