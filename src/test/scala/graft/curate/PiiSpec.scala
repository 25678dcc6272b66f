package graft.curate

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("pii stats count injected emails/phones/ips exactly") {
    val frame = Seq(
      (1L, "write bob.smith@corp.example.org or call 555-0142 now"),
      (2L, "two mails a@b.io c%d@e-f.co one ip 192.168.1.254 end"),
      (3L, "nothing sensitive here, just words and 1234 numbers"),
      (4L, "555-0000 555-9999 10.0.0.1 127.0.0.1 x@y.zz")
    ).toDF("id", "text")
    val got = Pii.piiStatsOver(frame, "id", "text").collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_email"), r.getAs[Long]("n_phone"),
          r.getAs[Long]("n_ipv4"), r.getAs[Int]("has_pii")))).toMap
    assert(got(1L) == ((1L, 1L, 0L, 1)))
    assert(got(2L) == ((2L, 0L, 1L, 1)))
    assert(got(3L) == ((0L, 0L, 0L, 0)))
    assert(got(4L) == ((1L, 2L, 2L, 1)))
  }

  test("pii redaction replaces every match with its typed placeholder") {
    val frame = Seq(
      (1L, "mail a@b.co then 555-1234 from 10.1.2.3 done")
    ).toDF("id", "text")
    val r = Pii.piiRedactOver(frame, "id", "text").collect().head
    assert(r.getAs[String]("clean_text") ==
      "mail <EMAIL> then <PHONE> from <IP> done")
    assert(r.getAs[Long]("n_redacted") == 3L)
  }

  test("redacted output re-scans clean (idempotence on the corpus entry)") {
    // the redacted contact card must carry no residual matches — the
    // gate a pipeline asserts before text leaves curation
    val redacted = Pii.piiRedact(spark, sf)
    val rescan = Pii.piiStatsOver(redacted, "c_custkey", "clean_text")
      .agg(sum(col("n_email") + col("n_phone") + col("n_ipv4"))).collect().head
    assert(rescan.getLong(0) == 0L)
  }

  test("word-salad documents carry no PII (stats over the real corpus)") {
    val n = Pii.piiStatsOver(
      graft.core.Tables.documents(spark, sf), "doc_id", "text")
      .filter(col("has_pii") === 1).count()
    assert(n == 0L)
  }
}
