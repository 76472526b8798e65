package graft

import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Unit edges for the HTML-stripping and URL-canonicalization functions —
  * the query-level oracles prove engine parity on the fixture; these pin
  * the semantics on adversarial inputs the fixture can't synthesize.
  */
class TextCleanSpec extends SparkSpec {

  private def one(input: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String = {
    import spark.implicits._
    Seq(input).toDF("s").select(f(col("s")).as("r")).collect().head.getString(0)
  }

  test("stripHtml: tags stripped, entities decoded, short lines dropped") {
    val html = "<html><body><nav><a href=\"/\">Home</a></nav>\n" +
      "<p>This content line is comfortably longer than twenty chars &amp; has <b>bold</b> &lt;tags&gt;</p>\n" +
      "<footer>&copy; 2026</footer></body></html>"
    val out = one(html, TextFunctions.stripHtml(_))
    assert(out ===
      "This content line is comfortably longer than twenty chars & has bold <tags>")
  }

  test("stripHtml: a document that is ALL boilerplate strips to empty") {
    val out = one("<nav><a href=\"/\">Home</a> | <a>About</a></nav>",
      TextFunctions.stripHtml(_))
    assert(out === "")
  }

  test("canonicalUrl: host case, default port, fragment, tracking params collapse") {
    for (raw <- Seq(
      "HTTPS://WWW.Example.COM:443/a/b?utm_source=x&utm_medium=y#frag",
      "https://www.example.com/a/b?ref=home",
      "https://www.EXAMPLE.com:443/a/b#other"))
      assert(one(raw, TextFunctions.canonicalUrl(_)) ===
        "https://www.example.com/a/b", raw)
  }

  test("canonicalUrl: non-default ports and real params survive; path case kept") {
    assert(one("http://Example.com:8080/Api?page=2&utm_source=x",
        TextFunctions.canonicalUrl(_)) ===
      "http://example.com:8080/Api?page=2")
    assert(one("http://example.com:80/x?utm_a=1&page=2",
        TextFunctions.canonicalUrl(_)) ===
      "http://example.com/x?page=2")
    assert(one("https://example.com/plain", TextFunctions.canonicalUrl(_)) ===
      "https://example.com/plain")
  }
}
