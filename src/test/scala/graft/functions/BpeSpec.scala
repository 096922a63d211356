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

  test("bytes-to-unicode mapping matches the GPT-2 table invariants") {
    val m = Bpe.byteToUnicode
    m should have length 256
    m.distinct should have length 256 // bijection
    // printable latin-1 identity ranges
    (33 to 126).foreach(b => m(b).toInt shouldBe b)
    (161 to 172).foreach(b => m(b).toInt shouldBe b)
    (174 to 255).foreach(b => m(b).toInt shouldBe b)
    // the GPT-2 landmarks: space -> Ġ (U+0120), newline -> Ċ (U+010A),
    // tab -> ĉ (U+0109), NUL -> Ā (U+0100), soft hyphen (173) -> U+0143
    m(32) shouldBe 'Ġ'
    m(10) shouldBe 'Ċ'
    m(9) shouldBe 'ĉ'
    m(0) shouldBe 'Ā'
    m(173) shouldBe 'Ń'
    // round-trips through the inverse
    (0 until 256).foreach(b => (Bpe.unicodeToByte(m(b)) & 0xff) shouldBe b)
  }

  test("byte-level encoder: initial symbols are UTF-8 bytes through the mapping") {
    val enc = new Bpe.Encoder(Seq(("never", "applies")), byteLevel = true)
    // ASCII: one symbol per byte == per char
    enc.encodeSegment("ab").toSeq shouldBe Seq("a", "b")
    // leading space becomes Ġ — the signature GPT-2 shape
    enc.encodeSegment(" ab").toSeq shouldBe Seq("Ġ", "a", "b")
    // non-ASCII: 'é' (U+00E9) is 2 UTF-8 bytes 0xC3 0xA9 -> 'Ã','©'
    enc.encodeSegment("é").toSeq shouldBe Seq("Ã", "©")
    // '€' (U+20AC) is 3 bytes E2 82 AC -> 'â' (0xE2), then mapped 0x82
    // (excluded: 289 + 0x82 - 127 = 292 = 'Ĥ'), then '¬' (0xAC)
    enc.encodeSegment("€").toSeq shouldBe Seq("â", "Ĥ", "¬")
    // supplementary plane: '😀' (U+1F600) is 4 bytes F0 9F 98 80
    enc.encodeSegment("😀").length shouldBe 4
    // byte-level counts exceed char-level on non-ASCII text
    val charEnc = new Bpe.Encoder(Seq(("never", "applies")))
    enc.countText("café crème") should be > charEnc.countText("café crème")
  }

  test("byte-level merges apply across the mapped alphabet") {
    // rule over mapped symbols: merge Ġ+t (space-prefixed 't'), then Ġt+h
    val enc = new Bpe.Encoder(
      Seq(("Ġ", "t"), ("Ġt", "h")), byteLevel = true)
    enc.encodeSegment(" the").toSeq shouldBe Seq("Ġth", "e")
    enc.countText("a the") shouldBe 3 // [a] + [ the] -> "a", "Ġth", "e"
  }

  test("byte-level fixture: real GPT-2 format, formed-before-use, collapse guard") {
    val merges = Bpe.defaultByteMerges
    merges.size should be > 50
    val formed = scala.collection.mutable.Set.empty[String]
    merges.foreach { case (a, b) =>
      Seq(a, b).foreach { c =>
        if (c.length > 1) assert(formed.contains(c),
          s"component '$c' used before being formed")
      }
      formed += (a + b)
    }
    // symbols stay inside the bytes→unicode alphabet
    val alphabet = Bpe.byteToUnicode.toSet
    merges.foreach { case (a, b) =>
      (a + b).foreach(ch => alphabet should contain(ch))
    }
    // the fixture must NOT memorize the corpus: corpus-like text keeps
    // some multi-token segments (3 segments here must exceed 3 tokens —
    // guards against retraining to full collapse, which would degenerate
    // n_bpe_bytes == n_segments and test nothing)
    val enc = new Bpe.Encoder(merges, byteLevel = true)
    enc.countText(" the streaming aggregation") should be > 3
  }

  test("vocab: parse, encodeIds, missing symbol throws") {
    val vocab = Bpe.parseVocab("""{"a": 0, "b": 1, "ab": 2}""")
    vocab shouldBe Map("a" -> 0, "b" -> 1, "ab" -> 2)
    val enc = new Bpe.Encoder(Seq(("a", "b")), byteLevel = false, vocab = vocab)
    enc.encodeIds("abab").toSeq shouldBe Seq(2, 2)
    // ' ' is outside this toy vocab — a merges/vocab mismatch must throw
    intercept[NoSuchElementException](enc.encodeIds("a b"))
    intercept[IllegalArgumentException](
      new Bpe.Encoder(Seq(("a", "b"))).encodeIds("ab"))
  }

  test("bundled byte vocab pairs with the byte merges") {
    val in = getClass.getResourceAsStream("/graft/bpe/vocab_byte.json")
    in should not be null
    val vocab = Bpe.parseVocab(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
    in.close()
    vocab.size shouldBe 256 + Bpe.defaultByteMerges.size
    // every byte symbol is id 0-255 in byte order
    (0 until 256).foreach { b =>
      vocab(String.valueOf(Bpe.byteToUnicode(b))) shouldBe b
    }
    val enc = new Bpe.Encoder(Bpe.defaultByteMerges, byteLevel = true, vocab = vocab)
    val ids = enc.encodeIds(" the parquet scan")
    ids.length shouldBe enc.countText(" the parquet scan")
    all(ids) should be >= 0
    all(ids) should be < vocab.size
  }

  test("broadcast encoder path matches the expression path") {
    import spark.implicits._
    val df = Seq("the scan scan table", " café", "").toDF("text")
    val bc = Bpe.broadcastEncoder(spark, Bpe.defaultByteMerges, byteLevel = true)
    val got = df.select(
      Bpe.bpeCount(col("text"), bc).as("a"),
      Bpe.bpeCountBytes(col("text")).as("b")).collect()
    got.foreach(r => r.getInt(0) shouldBe r.getInt(1))
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
