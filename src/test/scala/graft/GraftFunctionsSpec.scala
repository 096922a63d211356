package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

class GraftFunctionsSpec extends SparkSpec {

  private lazy val registered: SparkSession = { GraftFunctions.register(spark); spark }

  test("graft_cosine / graft_hamming64 from SQL") {
    val r = registered.sql(
      """SELECT graft_cosine(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS c,
         graft_hamming64(5L, 9L) AS h""").head()
    r.getDouble(0) shouldBe 1.0 +- 1e-12
    r.getInt(1) shouldBe 2
  }

  test("graft_sq_dist from SQL") {
    registered.sql(
      """SELECT graft_sq_dist(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS d""")
      .head().getDouble(0) shouldBe 25.0 +- 1e-12
  }

  test("graft_simhash64 SQL matches the column API, both kernels") {
    import spark.implicits._
    val toks = Seq("alpha", "beta", "gamma")
    val fromCol = Seq(toks).toDF("t")
      .select(V.simhash64(col("t")), V.simhash64(col("t"), "md5"))
      .head()
    val fromSql = registered.sql(
      """SELECT graft_simhash64(array('alpha','beta','gamma')),
         graft_simhash64(array('alpha','beta','gamma'), 'md5')""").head()
    fromSql.getLong(0) shouldBe fromCol.getLong(0)
    fromSql.getLong(1) shouldBe fromCol.getLong(1)
  }

  test("graft_shingle_hashes + graft_jaccard_sorted + minhash from SQL") {
    val r = registered.sql(
      """SELECT size(graft_shingle_hashes('abcdef', 3)) AS n,
         graft_jaccard_sorted(graft_shingle_hashes('abcdef', 3),
                              graft_shingle_hashes('abcdef', 3)) AS j,
         size(graft_minhash_signature(graft_shingle_hashes('abcdef', 3), 8)) AS k
      """).head()
    r.getInt(0) shouldBe 4
    r.getDouble(1) shouldBe 1.0
    r.getInt(2) shouldBe 8
  }

  test("text functions from SQL") {
    val r = registered.sql(
      """SELECT graft_token_count('one two three') AS n,
         graft_lang_id('the cat and the dog is here') AS lang,
         graft_type_token_ratio('a a b b') AS ttr,
         graft_gopher_pass('too short') AS pass""").head()
    r.getInt(0) shouldBe 3
    r.getString(1) shouldBe "en"
    r.getDouble(2) shouldBe 0.5
    r.getBoolean(3) shouldBe false
    val r2 = registered.sql(
      """SELECT graft_redact_pii('mail a@b.co ip 10.0.0.1') AS scrubbed,
         graft_dup_ngram_fraction('a b a b a', 2) AS dup2,
         graft_top_token_fraction('x x x y') AS top""").head()
    r2.getString(0) shouldBe "mail <email> ip <ipv4>"
    r2.getDouble(1) shouldBe 0.5
    r2.getDouble(2) shouldBe 0.75
    val r3 = registered.sql(
      """SELECT graft_bpe_count('the scan table') AS n_bpe,
         graft_bpe_count_bytes('the scan table') AS n_bytes,
         graft_bpe_ids('the scan table') AS ids""").head()
    r3.getInt(0) shouldBe
      new graft.functions.Bpe.Encoder(graft.functions.Bpe.defaultMerges)
        .countText("the scan table")
    val bEnc = new graft.functions.Bpe.Encoder(
      graft.functions.Bpe.defaultByteMerges, byteLevel = true,
      vocab = graft.functions.Bpe.defaultByteVocab)
    r3.getInt(1) shouldBe bEnc.countText("the scan table")
    r3.getSeq[Int](2) shouldBe bEnc.encodeIds("the scan table").toSeq
    // SQL-side round trip: decode(ids(text)) == text, losslessly
    registered.sql(
      "SELECT graft_bpe_decode(graft_bpe_ids('the café — scan 42!')) AS t")
      .head().getString(0) shouldBe "the café — scan 42!"
  }

  test("graft_repetition_stats and graft_zvalue2 from SQL") {
    val r = registered.sql(
      """SELECT graft_repetition_stats('a b a b a').dup2_frac AS dup2,
         graft_repetition_stats('x x x y').top_token_frac AS top,
         graft_zvalue2(0, 0.0, 64.0, 0, 0.0, 64.0) AS z00,
         graft_zvalue2(63, 0.0, 64.0, 63, 0.0, 64.0) AS zmax""").head()
    r.getDouble(0) shouldBe 0.5
    r.getDouble(1) shouldBe 0.75
    r.getLong(2) shouldBe 0L
    // 63/64 of the range buckets to 0xFC00; interleaving the two top
    // bytes-of-16 gives the expected Morton prefix — just assert
    // symmetry + monotonicity here
    r.getLong(3) should be > 0L
  }

  test("graft_zvaluen and SQ8 pack/unpack round-trip from SQL") {
    val r = registered.sql(
      """SELECT graft_zvaluen(0, 0.0, 16.0, 0, 0.0, 16.0, 0, 0.0, 16.0) AS z0,
         graft_zvaluen(NULL, 0.0, 16.0, 3, 0.0, 16.0, 3, 0.0, 16.0) AS znull,
         graft_unpack_sq8(graft_pack_sq8(array(127, -127, 0)), 2.0) AS v""").head()
    r.getLong(0) shouldBe 0L
    r.isNullAt(1) shouldBe true // NULL key -> NULL z, same as the column API
    r.getSeq[Double](2) shouldBe Seq(2.0, -2.0, 0.0)
  }

  test("web functions from SQL") {
    val r = registered.sql(
      """SELECT graft_html_to_text('<p>Hi &amp; bye</p>') AS t,
         graft_url_normalize('HTTP://A.COM/P?utm_x=1&id=2#f') AS u,
         graft_url_domain('https://a.b.example.com/x') AS d""").head()
    r.getString(0) shouldBe "Hi & bye"
    r.getString(1) shouldBe "http://a.com/P?id=2"
    r.getString(2) shouldBe "example.com"
  }

  test("literal-argument validation rejects non-literal widths") {
    // a foldable expression (length('xx')) is fine; a column reference is not
    registered.sql("SELECT size(graft_shingle_hashes('abc', length('xx')))")
      .head().getInt(0) shouldBe 2
    val e = intercept[Exception] {
      registered.sql(
        "SELECT graft_shingle_hashes('abc', n) FROM (SELECT 2 AS n)").head()
    }
    e.getMessage should include("literal")
  }

  test("spark.sql.extensions path registers the same surface on a fresh session") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      s2.sql("SELECT graft_cosine(array(3.0D, 0.0D), array(1.0D, 0.0D))")
        .head().getDouble(0) shouldBe 1.0 +- 1e-12
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
