package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UnicodeNormSpec extends SparkSpec {
  import UnicodeNorm._

  private def one(s: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(f(col("t"))).head().getString(0)
  }

  test("nfc composes decomposed sequences; precomposed and ASCII pass through") {
    one("café", nfc) shouldBe "café"
    one("über", nfc) shouldBe "über"
    one("café", nfc) shouldBe "café" // already NFC
    one("plain ascii!", nfc) shouldBe "plain ascii!"
    // char count shrinks exactly by the composed marks
    one("éé", nfc).length shouldBe 2
  }

  test("stripAccents folds marks from BOTH decomposed and precomposed forms") {
    one("café", stripAccents) shouldBe "cafe"
    one("café", stripAccents) shouldBe "cafe"
    one("noël über", stripAccents) shouldBe "noel uber"
    // ß carries no combining mark — folding must NOT invent 'ss'
    one("straße", stripAccents) shouldBe "straße"
    one("plain", stripAccents) shouldBe "plain"
  }

  test("null propagates and the SQL surface resolves") {
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("t")
      .select(nfc(col("t")), stripAccents(col("t"))).head()
    r.isNullAt(0) shouldBe true
    r.isNullAt(1) shouldBe true
    graft.GraftFunctions.register(spark)
    Seq("café").toDF("t").createOrReplaceTempView("un_t")
    spark.sql("SELECT graft_strip_accents(graft_nfc(t)) FROM un_t")
      .head().getString(0) shouldBe "cafe"
  }

  test("normalization before hashing: the dedup motivation holds") {
    import spark.implicits._
    // same visible text, different codepoints: raw digests differ, NFC
    // digests agree — the reason this pass belongs before dedup
    val df = Seq((1L, "café"), (2L, "café")).toDF("id", "t")
    df.select(md5(col("t"))).distinct().count() shouldBe 2
    df.select(md5(nfc(col("t")))).distinct().count() shouldBe 1
  }
}
