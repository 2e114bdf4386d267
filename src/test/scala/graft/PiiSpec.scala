package graft

import org.apache.spark.sql.functions._

import graft.queries.Pii

/** PII scrub: exact detection/redaction on hand-built strings (the
  * oracle checks aggregate sums; this pins the per-string behavior),
  * dialect-portability hazards, and non-vacuity of the injected
  * correctness query. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def scrubOne(s: String): (Int, Int, Int, String) = {
    val r = Pii.scrub(Seq(s).toDF("text"), "text")
      .select("n_email", "n_phone", "n_ip", "redacted").collect().head
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))
  }

  test("each class detects and redacts exactly") {
    assert(scrubOne("mail bob.smith+x@sub.example.org today") ===
      ((1, 0, 0, "mail [EMAIL] today")))
    assert(scrubOne("call +1-555-0042 now") === ((0, 1, 0, "call [PHONE] now")))
    assert(scrubOne("+44 123 4567 and +123-456-789") ===
      ((0, 2, 0, "[PHONE] and [PHONE]")))
    assert(scrubOne("from 10.12.200.7 today") === ((0, 0, 1, "from [IP] today")))
    assert(scrubOne("all: a@b.co, +1-555-0001, 192.168.0.1") ===
      ((1, 1, 1, "all: [EMAIL], [PHONE], [IP]")))
  }

  test("near-misses stay untouched") {
    // bare long number (order id), version string, @handle without TLD,
    // year — none should redact
    val cases = Seq("order 123456789", "v1.2.3 notes", "ping @alice ok",
      "in 2024 we shipped")
    cases.foreach { s =>
      val (e, p, i, red) = scrubOne(s)
      assert((e, p, i) === ((0, 0, 0)), s"false positive on: $s")
      assert(red === s)
    }
  }

  test("replacement order cannot cascade: markers are not re-matched") {
    // an email whose domain embeds a dotted quad redacts ONCE as email
    // (the email pass consumes it first) and the marker survives the
    // later ip pass untouched; DETECTION counts run on the raw text, so
    // the embedded quad still counts as an ip sighting
    val (e, _, i, red) = scrubOne("x user@10.0.0.1.net y")
    assert(e === 1 && i === 1, s"counts e=$e i=$i")
    assert(red === "x [EMAIL] y", s"got $red")
  }

  test("the correctness query is non-vacuous: every class detects its injection") {
    val out = Pii.piiScrub(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("email", "phone", "ip", "clean"))
    assert(out("email").getAs[Long]("sum_email") >= out("email").getAs[Long]("n_docs"))
    assert(out("phone").getAs[Long]("sum_phone") >= out("phone").getAs[Long]("n_docs"))
    assert(out("ip").getAs[Long]("sum_ip") >= out("ip").getAs[Long]("n_docs"))
    // redaction shortened every injected class (variable match → fixed marker)
    Seq("email", "phone", "ip").foreach { c =>
      assert(out(c).getAs[Long]("sum_len_after") < out(c).getAs[Long]("sum_len_before"), c)
    }
    // clean rows untouched
    assert(out("clean").getAs[Long]("sum_len_after") ===
      out("clean").getAs[Long]("sum_len_before"))
  }
}
