package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.WordPieceTokenizer

class WordPieceSpec extends SparkSpec {

  private val US = "\u001f"
  private val RS = "\u001e"

  test("Segmenter takes the longest start match, then continuations") {
    val seg = new WordPiece.Segmenter(
      startV = Set("u", "n", "un", "f", "s"),
      contV = Set("n", "i", "t", "e", "d", "it", "ited"))
    // "united": start "un" (longest), then cont "ited" (beats "it"/"i")
    seg.segmentWord("united") shouldBe (2L, Seq("un", "ited").mkString(US))
    // greedy is NOT optimal — that's the WordPiece contract: "fun"
    // takes start "f", cont "n"? no: pos 1 cont tries "un"… not in
    // contV, so "u"? also absent → single-char UNK fallback
    seg.segmentWord("fun") shouldBe (3L, Seq("f", "u", "n").mkString(US))
  }

  test("Segmenter falls back to single chars on vocabulary misses") {
    val seg = new WordPiece.Segmenter(Set("a"), Set.empty)
    // 'x' at start and everything after position 1 miss the vocab
    seg.segmentWord("xab") shouldBe (3L, Seq("x", "a", "b").mkString(US))
    seg.segmentWord("") shouldBe (0L, "")
  }

  test("encode is lossless: stripping separators reproduces the words") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "internationalization and localization"),
      (3L, "a b c"),
      (4L, "  "), // whitespace-only → filtered (no tokens)
      (5L, "repeated repeated repeated words words")).toDF("doc_id", "text")
    val (sv, cv) = WordPieceTokenizer.seedVocab(docs, "text",
      maxPieceLen = 4, vocabSize = 50)
    val got = WordPieceTokenizer.encode(docs, "doc_id", "text", sv, cv)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    got.map(_._1).toSet shouldBe Set(1L, 2L, 3L, 5L)
    got.foreach { case (id, n, pieces) =>
      val words = docs.filter(col("doc_id") === id)
        .head().getString(1).trim.toLowerCase.split("\\s+").toSeq
      pieces.split(RS, -1).toSeq.map(_.replace(US, "")) shouldBe words
      n shouldBe (pieces.count(c => c == US.head || c == RS.head) + 1
        ) // n_pieces = separators + 1 across the doc
    }
  }

  test("seed vocab makes frequent substrings single pieces") {
    import spark.implicits._
    // "tion" dominates the corpus interior → becomes a continuation
    // piece, so "nation" segments in 2-3 pieces, not 6
    val docs = (0L until 30L)
      .map(i => (i, "nation station creation relation nation"))
      .toDF("doc_id", "text")
    val (sv, cv) = WordPieceTokenizer.seedVocab(docs, "text",
      maxPieceLen = 4, vocabSize = 30)
    cv should contain ("tion")
    val n = WordPieceTokenizer.encode(docs, "doc_id", "text", sv, cv)
      .filter(col("doc_id") === 0).head().getLong(1)
    // 5 words, each ≤ 3 pieces once "tion"/"atio"-family pieces land
    n should be <= 15L
  }

  test("encode is deterministic across runs") {
    import spark.implicits._
    val docs = (0L until 40L)
      .map(i => (i, s"some shared corpus text with suffix ${i % 7}"))
      .toDF("doc_id", "text")
    val (sv, cv) = WordPieceTokenizer.seedVocab(docs, "text", 4, 100)
    def run() = WordPieceTokenizer.encode(docs, "doc_id", "text", sv, cv)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    run() shouldBe run()
  }
}
