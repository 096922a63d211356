package graft.operators

import graft.SparkSpec

class ClassifierSpec extends SparkSpec {

  /** In-memory reference NB over already-tokenized docs — the same
    * add-one-smoothed math, computed sequentially. */
  private def referenceNb(docs: Seq[(Long, Seq[String], Boolean)])
      : Map[Long, (Boolean, Long, Double, Boolean)] = {
    val withToks = docs.filter(_._2.nonEmpty)
    val cPos = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val cNeg = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    withToks.foreach { case (_, ts, lab) =>
      ts.foreach(t => if (lab) cPos(t) += 1 else cNeg(t) += 1)
    }
    val vocab = (cPos.keySet ++ cNeg.keySet).toSeq
    val tPos = cPos.values.sum; val tNeg = cNeg.values.sum; val v = vocab.size
    val dPos = withToks.count(_._3); val dNeg = withToks.size - dPos
    val prior = math.log((dPos + 1).toDouble / (dNeg + 1).toDouble)
    withToks.map { case (id, ts, lab) =>
      val s = prior + ts.map { t =>
        math.log((cPos(t) + 1).toDouble / (tPos + v).toDouble) -
          math.log((cNeg(t) + 1).toDouble / (tNeg + v).toDouble)
      }.sum
      id -> ((lab, ts.size.toLong, s, s > 0))
    }.toMap
  }

  test("naiveBayesQuality: matches a sequential NB on a mixed corpus") {
    import spark.implicits._
    // two gopher-passing docs (>= 50 words, avg len in [3,10]) built from
    // a "fluent" vocabulary, three failing docs from a "spammy" one, plus
    // a null and an empty doc (both excluded: no tokens to score)
    val fluent = Seq("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dogs")
    val posA = (0 until 56).map(i => fluent(i % fluent.size)).mkString(" ")
    val posB = (0 until 64).map(i => fluent((i * 3) % fluent.size)).mkString(" ")
    val negA = "buy cheap pills zzz qqq"
    val negB = "zzz zzz click here now"
    val negC = "the fox buy zzz"
    val docs = Seq(
      (1L, posA), (2L, posB), (3L, negA), (4L, negB), (5L, negC),
      (6L, null.asInstanceOf[String]), (7L, "   "))
      .toDF("doc_id", "text")

    val out = Classifier.naiveBayesQuality(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap

    val expected = referenceNb(Seq(
      (1L, posA.split(" ").toSeq, true), (2L, posB.split(" ").toSeq, true),
      (3L, negA.split(" ").toSeq, false), (4L, negB.split(" ").toSeq, false),
      (5L, negC.split(" ").toSeq, false)))

    out.keySet shouldBe expected.keySet
    expected.foreach { case (id, (lab, n, s, pred)) =>
      val (olab, on, os, opred) = out(id)
      olab shouldBe lab
      on shouldBe n
      os shouldBe s +- 1e-9
      opred shouldBe pred
    }
    // the weak labels are learnable here: the classifier reproduces them
    out.foreach { case (id, (lab, _, _, pred)) => pred shouldBe lab }
  }

  test("nbTrain/nbScore: parquet-persisted model scores a batch exactly like the full run") {
    import spark.implicits._
    val fluent = Seq("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dogs")
    val docs = (1L to 20L).map { i =>
      if (i % 2 == 0) (i, (0 until 56).map(j => fluent((j + i.toInt) % fluent.size)).mkString(" "))
      else (i, s"buy cheap pills zzz qqq spam$i")
    }.toDF("doc_id", "text")

    val dir = java.nio.file.Files.createTempDirectory("nb-model").toString
    Classifier.nbTrain(docs, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/model")
    val model = spark.read.parquet(s"$dir/model")
    // model is vocabulary-sized: terms + exactly one null metadata row
    model.filter($"term".isNull).count() shouldBe 1L

    val batch = docs.filter($"doc_id" > 15L)
    val scored = Classifier.nbScore(batch, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    val full = Classifier.naiveBayesQuality(docs, "doc_id", "text")
      .filter($"doc_id" > 15L)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    scored.keySet shouldBe full.keySet
    full.foreach { case (id, (lab, n, s, pred)) =>
      val (olab, on, os, opred) = scored(id)
      olab shouldBe lab; on shouldBe n; os shouldBe s +- 1e-12; opred shouldBe pred
    }
  }

  test("naiveBayesQuality: single-class corpus stays defined via smoothing") {
    import spark.implicits._
    val docs = Seq((1L, "short spam"), (2L, "more spam here"))
      .toDF("doc_id", "text")
    val out = Classifier.naiveBayesQuality(docs, "doc_id", "text").collect()
    out.length shouldBe 2
    // all-negative corpus: prior ln(1/3) < 0 and every llr < 0
    out.foreach { r =>
      r.getBoolean(1) shouldBe false
      r.getDouble(3) should be < 0.0
      r.getBoolean(4) shouldBe false
    }
  }
}
