package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class RedactionSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  def run(text: String): (String, Map[String, Long]) = {
    val r = Redaction.annotate(Seq((1L, text)).toDF("id", "text"), "text")
      .collect()(0)
    (r.getAs[String]("text_redacted"),
      Redaction.patterns.map { case (n, _, _) =>
        n -> r.getAs[Long](s"n_$n") }.toMap)
  }

  test("each class is scrubbed and counted") {
    val (red, n) = run("mail a@b.com or b.c@d.org, call +1 555-123 4567, " +
      "host 10.0.0.1, id 123-45-6789")
    assert(red == "mail <EMAIL> or <EMAIL>, call <PHONE>, " +
      "host <IP>, id <ID>")
    assert(n == Map("email" -> 2L, "phone" -> 1L, "ipv4" -> 1L, "ssn_like" -> 1L))
  }

  test("application order: an email's digits never half-match as a phone") {
    val (red, n) = run("reach 12345678901@example.com today")
    assert(red == "reach <EMAIL> today")
    assert(n("email") == 1L && n("phone") == 0L)
  }

  test("ipv4 beats phone on dotted quads; clean text is untouched") {
    val (red, n) = run("server 192.168.001.255 up")
    assert(red == "server <IP> up" && n("ipv4") == 1L && n("phone") == 0L)
    val (clean, cn) = run("just ordinary words here")
    assert(clean == "just ordinary words here" && cn.values.sum == 0L)
  }
}
