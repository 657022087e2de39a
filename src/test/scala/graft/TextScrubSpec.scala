package graft

import org.apache.spark.sql.functions._

import graft.functions.TextScrub

/** PII redaction behavior on crafted rows (the synthetic corpus
  * contains no digits/addresses, so this is spec-gated like the
  * multimodal codecs). */
class TextScrubSpec extends SparkSpec {

  import spark.implicits._

  private def scrubOne(s: String): String =
    Seq(s).toDF("text").select(TextScrub.scrub(col("text")).as("t")).head().getString(0)

  test("redacts emails, IPs, phones, and digit runs with typed tokens") {
    assert(
      scrubOne("mail me at jane.doe+spam@example.co.uk today") ==
        "mail me at [EMAIL] today")
    assert(
      scrubOne("server 10.0.255.7 and 192.168.1.1 down") ==
        "server [IP] and [IP] down")
    assert(
      scrubOne("call +1-555-867-5309 now") == "call [PHONE] now")
    assert(
      scrubOne("call (555) 867 5309 now") == "call [PHONE] now")
    assert(
      scrubOne("ph: 555.867.5309") == "ph: [PHONE]")
    assert(
      scrubOne("acct 12345678901 ok") == "acct [NUMBER] ok")
  }

  test("precedence: emails and IPs are not re-chewed as phones/digit runs") {
    assert(
      scrubOne("a1234567@host.com 1.2.3.4") == "[EMAIL] [IP]")
    // short digits untouched
    assert(scrubOne("top 100 of 2024") == "top 100 of 2024")
  }

  test("scrub is idempotent") {
    val once =
      scrubOne("jane@x.io 10.0.0.1 +44 20 7946 0958 99999999")
    assert(scrubOne(once) == once)
    assert(once == "[EMAIL] [IP] [PHONE] [NUMBER]")
  }

  test("piiCounts audits per category with the same precedence") {
    val r = Seq("a@b.co c@d.org 1.2.3.4 busy 88888888")
      .toDF("text")
      .select(TextScrub.piiCounts(col("text")): _*)
      .head()
    assert(r.getInt(0) == 2, "emails")
    assert(r.getInt(1) == 1, "ips")
    assert(r.getInt(2) == 0, "phones")
    assert(r.getInt(3) == 1, "digit runs")
  }

  test("corpus pass-through: the synthetic documents contain no PII") {
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val changed = docs
      .filter(TextScrub.scrub(col("text")) =!= col("text"))
      .count()
    assert(changed == 0)
  }
}
