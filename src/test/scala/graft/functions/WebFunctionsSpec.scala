package graft.functions

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class WebFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(WebFunctions.htmlToText(col("h"))).head().getString(0)

  test("htmlToText strips script/style WITH content, comments, and tags") {
    extract("<html><head><style>p { x: 1 }</style>" +
      "<script>if (a < b && c) { go('x'); }</script></head>" +
      "<body><!-- note --><h1 class=\"t\">Hello</h1><p>world</p></body></html>") shouldBe
      "Hello world"
  }

  test("htmlToText decodes entities with ampersand last") {
    extract("<p>Tom &amp; Jerry &lt;3 &quot;q&quot; &#39;s&#39;&nbsp;end</p>") shouldBe
      "Tom & Jerry <3 \"q\" 's' end"
    // &amp;lt; is a LITERAL "&lt;" in the source text — must survive as
    // text, not double-decode into "<"
    extract("<p>&amp;lt;tag&amp;gt;</p>") shouldBe "&lt;tag&gt;"
  }

  test("htmlToText collapses whitespace and trims") {
    extract("  <p>a\n\n b\t\tc</p>  ") shouldBe "a b c"
  }

  test("urlNormalize strips fragment + tracking params, lowercases scheme+authority") {
    def norm(u: String): String =
      Seq(u).toDF("u").select(WebFunctions.urlNormalize(col("u"))).head().getString(0)
    norm("HTTPS://WWW.Ex.COM/Path/A?id=1&utm_source=n&Keep=Case&gclid=g#frag") shouldBe
      "https://www.ex.com/Path/A?id=1&Keep=Case"
    norm("http://a.com/p?utm_only=x") shouldBe "http://a.com/p"
    norm("http://a.com/p?utm_a=1&utm_b=2") shouldBe "http://a.com/p"
    norm("http://A.com/CaseKept") shouldBe "http://a.com/CaseKept"
  }

  test("urlNormalize is anchored: href/xref params and path segments survive, ref= is stripped") {
    def norm(u: String): String =
      Seq(u).toDF("u").select(WebFunctions.urlNormalize(col("u"))).head().getString(0)
    // the r8 verdict defect: unanchored `ref=` ate the tail of `href=`
    norm("http://a.com/p?href=https://x.com&a=1") shouldBe
      "http://a.com/p?href=https://x.com&a=1"
    norm("http://a.com/p?href=KeepMe&ref=sr_1&Keep=1") shouldBe
      "http://a.com/p?href=KeepMe&Keep=1"
    norm("http://a.com/p?xref=7&ref=x") shouldBe "http://a.com/p?xref=7"
    norm("http://a.com/p?ref=x&b=2") shouldBe "http://a.com/p?b=2"
    // amazon-style path segment: not a query param, untouched
    norm("http://a.com/dp/B01/ref=sr_1_1?a=1") shouldBe
      "http://a.com/dp/B01/ref=sr_1_1?a=1"
    // consecutive stripped params collapse their separators
    norm("http://a.com/p?utm_a=1&ref=x&utm_b=2&Keep=1") shouldBe
      "http://a.com/p?Keep=1"
  }

  test("urlHost and urlDomain strip credentials/port and take the last two labels") {
    val r = Seq("HTTPS://user:pw@Sub.Shop.Example.COM:8443/x?y=1")
      .toDF("u")
      .select(WebFunctions.urlHost(col("u")), WebFunctions.urlDomain(col("u")))
      .head()
    r.getString(0) shouldBe "sub.shop.example.com"
    r.getString(1) shouldBe "example.com"
  }
}
