package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.redactPii(col("t")))
      .collect()(0).getString(0)

  test("redactPii replaces each PII type and leaves clean text unchanged") {
    assert(redactOne("mail a.b+c@ex-ample.org now") == "mail <EMAIL> now")
    assert(redactOne("call 555-1234 or 555-9999") == "call <PHONE> or <PHONE>")
    assert(redactOne("host 192.168.0.1 up") == "host <IP> up")
    assert(redactOne("no pii here at all") == "no pii here at all")
  }

  test("redactPii order: the email eats its own digits before phone/ip run") {
    // digits inside an address must not survive as a phone/ip fragment
    assert(redactOne("x 555-1234@mail.com y") == "x <EMAIL> y")
  }

  test("piiCount counts all matches of one type") {
    val n = Seq("a@b.co c@d.org 1.2.3.4").toDF("t")
      .select(TextFunctions.piiCount(col("t"), TextFunctions.EMAIL_RE))
      .collect()(0).getLong(0)
    assert(n == 2)
  }
}
