package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomSpec extends SparkSpec {

  test("bloom: zero false negatives, bounded false positives") {
    import spark.implicits._
    val members = (0L until 2000L).map(i => i * 2654435761L + 17L)
    val df = members.toDF("h")
    // 16 bits/elem, k=4 → theoretical fpp ~0.24 %
    val numWords = ((members.size * 16 + 63) / 64)
    val words = Bloom.build(df, "h", numWords, k = 4)

    val neg = df.filter(!Bloom.mightContain(col("h"), words, 4)).count()
    neg shouldBe 0L // never a false negative

    val probes = (0L until 20000L).map(i => i * 6364136223846793005L + 999L)
      .filterNot(members.toSet)
    val fp = probes.toDF("h")
      .filter(Bloom.mightContain(col("h"), words, 4)).count()
    assert(fp.toDouble / probes.size < 0.01,
      s"false-positive rate ${fp.toDouble / probes.size} above 1%")
  }

  test("bloom: negative hashes probe safely under ANSI arithmetic") {
    import spark.implicits._
    val df = Seq(Long.MinValue, -1L, Long.MaxValue, 0L).toDF("h")
    val words = Bloom.build(df, "h", numWords = 4, k = 3)
    df.filter(!Bloom.mightContain(col("h"), words, 3)).count() shouldBe 0L
  }

  test("decontaminateBloom equals the exact decontaminate answer") {
    import spark.implicits._
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "alpha beta gamma delta something entirely different here"),
      (12L, "no overlap with anything else at all whatsoever now"),
      (13L, "unique words only in this particular document body text"))
      .toDF("doc_id", "text")
    val bench = Seq(
      (1L, "alpha beta gamma delta iota"),
      (2L, "completely fresh evaluation sentence material"))
      .toDF("doc_id", "text")
    val exact = graft.operators.TrainingData
      .decontaminate(docs, "doc_id", "text", bench, "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloomed = graft.operators.TrainingData
      .decontaminateBloom(docs, "doc_id", "text", bench, "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    bloomed shouldBe exact
    exact.map(_._1) shouldBe Set(10L, 11L) // the 4-gram "alpha beta gamma delta"
  }
}
