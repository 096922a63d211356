package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  test("merge loop: lowest rank first, all occurrences, left-to-right") {
    val enc = new Bpe.Encoder(Seq(("a", "b"), ("ab", "c"), ("x", "x")))
    enc.encodeSegment("abc").toSeq shouldBe Seq("abc")
    enc.encodeSegment("ababc").toSeq shouldBe Seq("ab", "abc")
    // merge-all is left-to-right non-overlapping: xxxxx -> [xx, xx, x]
    enc.encodeSegment("xxxxx").toSeq shouldBe Seq("xx", "xx", "x")
    enc.encodeSegment("q").toSeq shouldBe Seq("q")
    enc.encodeSegment("zzz").toSeq shouldBe Seq("z", "z", "z") // no rule
    enc.countSegment("ababc") shouldBe 2
  }

  test("countText pre-tokenizes with the GPT-2-style pattern") {
    // rules only inside segments: 'ab' split across " a" and "b..." never merges
    val enc = new Bpe.Encoder(Seq(("a", "b")))
    enc.countText("ab ab") shouldBe 3 // [ab][ ab] -> "ab" + " ","ab"...
  }

  test("bundled fixture parses; merge components are formed before use") {
    val merges = Bpe.defaultMerges
    merges.size should be > 50
    // training-order invariant: every multi-char component of rule r is
    // the output of an earlier rule (this is what makes rank-order
    // application equivalent to the min-rank loop, and the SQL oracle
    // depends on it)
    val formed = scala.collection.mutable.Set.empty[String]
    merges.foreach { case (a, b) =>
      Seq(a, b).foreach { c =>
        if (c.length > 1) assert(formed.contains(c),
          s"component '$c' used before being formed")
      }
      formed += (a + b)
    }
  }

  test("bpeCount column: null-safe, empty is 0, matches encoder") {
    import spark.implicits._
    val df = Seq(Some("the scan scan table"), Some(""), None)
      .toDF("text")
    val got = df.select(Bpe.bpeCount(col("text")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    val enc = new Bpe.Encoder(Bpe.defaultMerges)
    got(0) shouldBe Some(enc.countText("the scan scan table"))
    got(1) shouldBe Some(0)
    got(2) shouldBe None
    // real BPE compresses: count is <= character count and >= segment count
    val n = got(0).get
    n should be <= "the scan scan table".length
    n should be >= 4
  }
}
