package graft

import org.apache.spark.sql.functions._
import graft.ext.PipelineOps

/** Redaction behaviour on constructed rows (the synthetic corpus carries
  * no PII, so the stage is law-tested here instead of driver-queried). */
class PiiScrubSpec extends SparkSpec {

  import spark.implicits._

  private def scrub(rows: (Long, String)*) =
    PipelineOps.scrubPii(rows.toSeq.toDF("doc_id", "text"))
      .select("doc_id", "text", "n_emails", "n_ips", "n_phones")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap

  test("emails are replaced and counted") {
    val out = scrub(1L -> "contact a.smith+x@sub.example.co for details")
    assert(out(1L) == ("contact <EMAIL> for details", 1, 0, 0))
  }

  test("dotted-quad IPs are replaced, version strings survive") {
    val out = scrub(
      1L -> "host 10.0.255.1 responded",
      2L -> "upgrade to version 2.3.1 now")
    assert(out(1L) == ("host <IP> responded", 0, 1, 0))
    assert(out(2L) == ("upgrade to version 2.3.1 now", 0, 0, 0))
  }

  test("phone-like digit runs are replaced") {
    val out = scrub(1L -> "call +1 (555) 867-5309 x99")
    assert(out(1L)._1.contains("<PHONE>"))
    assert(out(1L)._4 == 1)
  }

  test("an email is not double-counted as a phone or IP") {
    val out = scrub(1L -> "mail 12345678@example.com ok")
    assert(out(1L) == ("mail <EMAIL> ok", 1, 0, 0))
  }

  test("mixed document: all three categories, counts independent") {
    val out = scrub(1L ->
      "from bob@corp.io at 192.168.0.7 dial 555-123-4567 end")
    assert(out(1L) == ("from <EMAIL> at <IP> dial <PHONE> end", 1, 1, 1))
  }

  test("clean corpus text passes through untouched") {
    val docs = Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val changed = PipelineOps.scrubPii(docs)
      .select(col("doc_id"), col("text"),
        (col("n_emails") + col("n_ips") + col("n_phones")).as("hits"))
      .filter(col("hits") > 0)
    assert(changed.isEmpty, "synthetic corpus must contain no PII")
  }
}
