package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{TextFunctions => T}

class TextFunctionsSpec extends SparkSpec {

  private def one(text: String, c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(c).head().get(0)
  }

  test("tokens: empty and blank text tokenize to zero") {
    one("", T.tokenCount(col("text"))) shouldBe 0
    one("   ", T.tokenCount(col("text"))) shouldBe 0
    one("a b  c", T.tokenCount(col("text"))) shouldBe 3
    one("  padded words ", T.tokenCount(col("text"))) shouldBe 2
  }

  test("subwordCount: GPT-2-style pre-tokenizer segments") {
    one("", T.subwordCount(col("text"))) shouldBe 0
    // "Hello", " world" -> 2 segments; punctuation separate
    one("Hello world", T.subwordCount(col("text"))) shouldBe 2
    one("Hello, world!", T.subwordCount(col("text"))) shouldBe 4
    // contraction suffix is its own segment: "don" + "'t"
    one("don't", T.subwordCount(col("text"))) shouldBe 2
    // digit runs split from letters: "x" + "42"
    one("x42", T.subwordCount(col("text"))) shouldBe 2
  }

  test("charShingles: n-grams of normalized text, short text is empty") {
    one("ab", T.charShingles(col("text"), 3)) shouldBe Seq()
    one("abcd", T.charShingles(col("text"), 3)) shouldBe Seq("abc", "bcd")
  }

  test("charShingles collapses whitespace and lowercases") {
    one("A  B", T.charShingles(col("text"), 3)) shouldBe Seq("a b")
    one("A  Bc", T.charShingles(col("text"), 3)) shouldBe Seq("a b", " bc")
  }

  test("wordNgrams") {
    one("a b c d", T.wordNgrams(col("text"), 3)) shouldBe Seq("a b c", "b c d")
    one("a b", T.wordNgrams(col("text"), 3)) shouldBe Seq()
  }

  test("punctRatio and stopwordRatio") {
    one("", T.punctRatio(col("text"))) shouldBe 0.0
    one("ab,.", T.punctRatio(col("text"))) shouldBe 0.5
    one("the cat", T.stopwordRatio(col("text"))) shouldBe 0.5
    one("", T.stopwordRatio(col("text"))) shouldBe 0.0
  }

  test("langId marker heuristic") {
    one("the cat and the dog is here", T.langId(col("text"))) shouldBe "en"
    one("der Hund und die Katze ist gut", T.langId(col("text"))) shouldBe "de"
    one("le chat et les chiens", T.langId(col("text"))) shouldBe "fr"
    one("el gato y los perros", T.langId(col("text"))) shouldBe "es"
    one("xyzzy plugh", T.langId(col("text"))) shouldBe "und"
  }

  test("fingerprint is order- and duplicate-invariant") {
    val a = one("beta alpha beta", T.fingerprint(col("text")))
    val b = one("alpha  beta", T.fingerprint(col("text")))
    a shouldBe b
    val c = one("alpha gamma", T.fingerprint(col("text")))
    a should not be c
  }

  test("qualityScore in [0,1] and favors natural prose") {
    val prose = "the quick brown fox jumps over the lazy dog and it is a fine day for running in the sun"
    val spam = "buy!!! now!!! click;;; here:::"
    val p = one(prose, T.qualityScore(col("text"))).asInstanceOf[Double]
    val s = one(spam, T.qualityScore(col("text"))).asInstanceOf[Double]
    p should be > s
    p should (be >= 0.0 and be <= 1.0)
    s should (be >= 0.0 and be <= 1.0)
  }

  test("typeTokenRatio: repetition low, all-unique 1.0, empty 0.0") {
    one("a a a a", T.typeTokenRatio(col("text"))) shouldBe 0.25
    one("each word once here", T.typeTokenRatio(col("text"))) shouldBe 1.0
    one("", T.typeTokenRatio(col("text"))) shouldBe 0.0
  }

  test("gopherPass: word-count and mean-word-length bounds") {
    val fifty = (1 to 50).map(i => s"word$i").mkString(" ")
    one(fifty, T.gopherPass(col("text"))) shouldBe true
    one("too few words", T.gopherPass(col("text"))) shouldBe false
    // 50 single-char words: mean word length 1 < 3 → fail
    one(Seq.fill(50)("a").mkString(" "), T.gopherPass(col("text"))) shouldBe false
    one("", T.gopherPass(col("text"))) shouldBe false
  }

  private def rep(text: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(T.normTokens(col("text")).as("toks"))
      .select(f(col("toks"))).head().get(0)
  }

  test("dupNgramFractionOfTokens: repeated phrases, not unigrams") {
    // "a b a b a" → 2-grams: [a b, b a, a b, b a] → 2 dup / 4
    rep("a b a b a", t => T.dupNgramFractionOfTokens(t, 2)) shouldBe 0.5
    // all distinct bigrams
    rep("a b c d", t => T.dupNgramFractionOfTokens(t, 2)) shouldBe 0.0
    // shorter than n → 0, not NaN
    rep("a", t => T.dupNgramFractionOfTokens(t, 2)) shouldBe 0.0
    rep("", t => T.dupNgramFractionOfTokens(t, 2)) shouldBe 0.0
  }

  test("topTokenFractionOfTokens: most frequent token's share") {
    rep("x x x y", T.topTokenFractionOfTokens) shouldBe 0.75
    rep("a b c d", T.topTokenFractionOfTokens) shouldBe 0.25
    rep("", T.topTokenFractionOfTokens) shouldBe 0.0
  }

  test("repetitionStats equals the HOF reference forms on random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "spam", "spam", "the")
    val docs = ((0 until 60).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    } :+ (100L, "") :+ (101L, "solo")).toDF("doc_id", "text")
    val base = docs.select(col("doc_id"), T.normTokens(col("text")).as("ts"))
    val native = base.select(col("doc_id"), T.repetitionStats(col("ts")).as("r"))
      .select(col("doc_id"), col("r.dup2_frac"), col("r.dup3_frac"),
        col("r.top_token_frac"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val hof = base.select(col("doc_id"),
      T.dupNgramFractionOfTokens(col("ts"), 2),
      T.dupNgramFractionOfTokens(col("ts"), 3),
      T.topTokenFractionOfTokens(col("ts")))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    native shouldBe hof // bit-equal: exact int counts, one division each
  }

  test("redactPii scrubs email, ssn, phone (both forms), ipv4") {
    val in = "mail a.user+tag@mail.example.org ssn 123-45-6789 " +
      "call (415) 555-0123 or 415-555-0123 from 192.168.1.10 end"
    one(in, T.redactPii(col("text"))) shouldBe
      "mail <email> ssn <ssn> call <phone> or <phone> from <ipv4> end"
    // no PII → unchanged
    one("just words here", T.redactPii(col("text"))) shouldBe "just words here"
    // a 3-2-4 ssn is not double-counted as a phone; ip octets never
    // combine into a phone shape
    one("ip 10.255.0.254 stays", T.redactPii(col("text"))) shouldBe "ip <ipv4> stays"
  }

  test("piiCounts counts each span under exactly one type") {
    import spark.implicits._
    val in = "a@b.co and c@d.org ssn 111-22-3333 tel 555-123-4567 ip 8.8.8.8"
    val r = Seq(in).toDF("text").select(T.piiCounts(col("text")): _*).head()
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) shouldBe ((2, 1, 1, 1))
  }
}
