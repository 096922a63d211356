package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Unigram

class UnigramTokenizerSpec extends SparkSpec {

  test("Segmenter: Viterbi picks the max-score split, ties to fewer pieces") {
    // vocab: "ab"=-1, "abc"=-3, "c"=-1, "a"=-2, "b"=-2 (micro-nats scaled
    // small for readability — integers are integers)
    val seg = new Unigram.Segmenter(Map(
      "ab" -> -1L, "abc" -> -3L, "c" -> -1L, "a" -> -2L, "b" -> -2L))
    // "abc": ab+c = -2 beats abc = -3 and a+b+c = -5
    seg.segmentWord("abc") shouldBe ((-2L, 2L))
    // "ababc": ab+ab+c = -3
    seg.segmentWord("ababc") shouldBe ((-3L, 3L))
    // tie-break: with "xy" = -4 and x=y=-2, "xy" (1 piece) wins the tie
    val seg2 = new Unigram.Segmenter(Map("xy" -> -4L, "x" -> -2L, "y" -> -2L))
    seg2.segmentWord("xy") shouldBe ((-4L, 1L))
    // unknown chars fall back to the UNK score, so everything segments
    val (lp, np) = seg.segmentWord("azb")
    np shouldBe 3L
    lp shouldBe (-2L + Unigram.UnkMicroNats + -2L)
    seg.segmentWord("") shouldBe ((0L, 0L))
  }

  /** Sequential reference of the whole chain: same seed-vocab heuristic,
    * same integer Viterbi — independent code path from the operator.
    */
  private def reference(docs: Seq[(Long, String)], maxLen: Int, vocabSize: Int)
      : Map[Long, (Long, Double)] = {
    def norm(t: String): Seq[String] = {
      val tr = t.toLowerCase.trim
      if (tr.isEmpty) Seq.empty else tr.split("\\s+").toSeq
    }
    val words = docs.flatMap { case (_, t) => norm(t) }
    val cnt = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for (w <- words; i <- 0 until w.length;
         l <- 1 to math.min(maxLen, w.length - i))
      cnt(w.substring(i, i + l)) += 1
    val multi = cnt.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c * (p.length - 1), p) }.take(vocabSize)
    val sel = cnt.toSeq.filter(_._1.length == 1) ++ multi
    val total = sel.map(_._2).sum.toDouble
    val voc = sel.map { case (p, c) =>
      p -> math.round(math.log(c / total) * 1e6)
    }.toMap
    val seg = new Unigram.Segmenter(voc)
    docs.collect { case (id, t) if norm(t).nonEmpty =>
      val scores = norm(t).map(seg.segmentWord)
      id -> ((scores.map(_._2).sum, scores.map(_._1).sum / 1e6))
    }.toMap
  }

  test("seedVocab + score match the sequential reference on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val wordGen = Gen.listOfN(6, Gen.oneOf("ab", "abab", "cab", "dada", "x"))
    val docGen = Gen.listOfN(12, wordGen)
    (1 to 3).foreach { it =>
      val raw = docGen(Gen.Parameters.default, Seed(6100L + it)).get
      val docs = raw.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.mkString(" "))
      }
      val df = docs.toDF("doc_id", "text").repartition(4)
      val vocab = UnigramTokenizer.seedVocab(df, "text",
        maxPieceLen = 3, vocabSize = 8)
      val got = UnigramTokenizer.score(df, "doc_id", "text", vocab)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      val want = reference(docs, maxLen = 3, vocabSize = 8)
      withClue(s"seed=${6100 + it}") {
        got.keySet shouldBe want.keySet
        want.foreach { case (id, (n, lp)) =>
          got(id)._1 shouldBe n
          got(id)._2 shouldBe lp +- 1e-12
        }
      }
    }
  }

  test("score excludes null-text and token-free docs") {
    import spark.implicits._
    val df = Seq((1L, "ab ab"), (2L, null.asInstanceOf[String]), (3L, "  "))
      .toDF("doc_id", "text")
    val vocab = UnigramTokenizer.seedVocab(df, "text", 3, 8)
    UnigramTokenizer.score(df, "doc_id", "text", vocab)
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(1L)
  }
}
