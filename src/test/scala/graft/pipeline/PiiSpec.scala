package graft.pipeline

import graft.SparkSpec

class PiiSpec extends SparkSpec {

  import spark.implicits._

  private def redactOne(text: String) =
    Pii.redact(Seq((1L, text)).toDF("doc_id", "text")).collect().head

  test("each rule redacts its shape and counts hits") {
    val r = redactOne(
      "mail bob.smith+x@corp.example.org from 10.0.42.7 id 123-45-6789 tel 555-0142 end")
    assert(r.getAs[String]("redacted_text") ===
      "mail <EMAIL> from <IP> id <SSN> tel <PHONE> end")
    assert(r.getAs[Long]("n_email") === 1L)
    assert(r.getAs[Long]("n_ipv4") === 1L)
    assert(r.getAs[Long]("n_ssn") === 1L)
    assert(r.getAs[Long]("n_phone") === 1L)
  }

  test("rule order: SSN shape wins over the looser phone shape") {
    val r = redactOne("ref 123-45-6789 only")
    assert(r.getAs[String]("redacted_text") === "ref <SSN> only")
    assert(r.getAs[Long]("n_ssn") === 1L)
    // phone counts on the post-SSN text: the 45-6789 tail is gone
    assert(r.getAs[Long]("n_phone") === 0L)
  }

  test("clean text passes through untouched with zero counts") {
    val r = redactOne("no personal data in this sentence at all")
    assert(r.getAs[String]("redacted_text") ===
      "no personal data in this sentence at all")
    assert(r.getAs[Long]("n_email") === 0L)
    assert(r.getAs[Long]("n_ipv4") === 0L)
  }

  test("multiple hits of one rule all redact") {
    val r = redactOne("a@b.co and c@d.org plus 1.2.3.4 5.6.7.8")
    assert(r.getAs[Long]("n_email") === 2L)
    assert(r.getAs[Long]("n_ipv4") === 2L)
    assert(r.getAs[String]("redacted_text") ===
      "<EMAIL> and <EMAIL> plus <IP> <IP>")
  }

  test("original text column is preserved") {
    val r = redactOne("write to a@b.co now")
    assert(r.getAs[String]("text") === "write to a@b.co now")
  }

  test("k-anonymity: combos below k vanish, survivors carry group_n") {
    val df = Seq(
      (1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"),
      (4L, "en", "b"), (5L, "en", "b"),
      (6L, "fr", "a"))
      .toDF("doc_id", "lang", "source")
    val kept = Pii.kAnonymitySuppress(df, Seq("lang", "source"), k = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("group_n")))
      .toSet
    assert(kept === Set(
      (1L, 3L), (2L, 3L), (3L, 3L), (4L, 2L), (5L, 2L)))
  }

  test("k-anonymity: k=1 keeps everything; null combos group together") {
    val df = Seq[(Long, String, String)](
      (1L, null, "a"), (2L, null, "a"), (3L, "en", "a"))
      .toDF("doc_id", "lang", "source")
    assert(Pii.kAnonymitySuppress(df, Seq("lang", "source"), 1).count() === 3L)
    // the two null-lang rows form one anonymity set of 2
    val kept2 = Pii.kAnonymitySuppress(df, Seq("lang", "source"), 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 === Set(1L, 2L))
  }
}
