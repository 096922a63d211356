package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  test("temperatureMixture flattens domain shares toward small domains") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 900 of "big", 100 of "small": raw shares 90/10; alpha=0.5 weights
    // sqrt(900):sqrt(100) = 3:1 → sample shares 75/25
    val docs = ((1L to 900L).map(i => (i, "big")) ++
      (901L to 1000L).map(i => (i, "small"))).toDF("doc_id", "lang")
    val kept = Sampling.temperatureMixture(docs, "lang", "doc_id",
      alpha = 0.5, targetFraction = 0.5)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ~500 rows total, big:small ≈ 3:1 (md5-bucket noise is a few %)
    val total = kept.values.sum.toDouble
    total should (be > 400.0 and be < 600.0)
    val smallShare = kept("small") / total
    smallShare should (be > 0.18 and be < 0.32) // vs 0.10 raw share
    // determinism: same input → identical sample
    val again = Sampling.temperatureMixture(docs, "lang", "doc_id", 0.5, 0.5)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    Sampling.temperatureMixture(docs, "lang", "doc_id", 0.5, 0.5)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet shouldBe again
  }

  test("temperatureMixture accepts a non-string domain column") {
    import spark.implicits._
    // integer source-id domain: same 900/100 split as the string case —
    // must sample, not ClassCastException on the domain read
    val docs = ((1L to 900L).map(i => (i, 7)) ++
      (901L to 1000L).map(i => (i, 42))).toDF("doc_id", "source")
    val kept = Sampling.temperatureMixture(docs, "source", "doc_id",
      alpha = 0.5, targetFraction = 0.5)
      .groupBy("source").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = kept.values.sum.toDouble
    total should (be > 400.0 and be < 600.0)
    (kept(42) / total) should (be > 0.18 and be < 0.32)
  }

  private lazy val rows = {
    import spark.implicits._
    (0L until 1000L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("id", "lang")
  }

  test("mixturePlan: weights normalize over present sources, epoch cap, shortfall") {
    import spark.implicits._
    // web: 100 tokens avail; books: 10 avail but asked for 50% of a
    // 200-token budget -> needs 10 epochs, capped at 2 -> shortfall 80;
    // "missing" carries weight but is absent (drops from normalization);
    // unlisted "junk" gets weight 0
    val docs = Seq(
      ("web", "t " * 50), ("web", "t " * 50),
      ("books", "t " * 10),
      ("junk", "t " * 30))
      .toDF("source", "text")
    val plan = Sampling.mixturePlan(docs, "source",
      graft.functions.TextFunctions.tokenCount(col("text")),
      weights = Map("web" -> 0.25, "books" -> 0.25, "missing" -> 0.5),
      tokenBudget = 200L, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
          r.getDouble(5), r.getLong(6), r.getLong(7)))).toMap
    // norm over present = 0.25 + 0.25 = 0.5 -> web/books each 0.5
    plan("web") shouldBe ((2L, 100L, 0.5, 100L, 1.0, 100L, 0L))
    plan("books") shouldBe ((1L, 10L, 0.5, 100L, 2.0, 20L, 80L))
    plan("junk") shouldBe ((1L, 30L, 0.0, 0L, 0.0, 0L, 0L))
    plan.keySet shouldBe Set("web", "books", "junk")
  }

  test("applyMixturePlan: full epochs + deterministic fractional remainder") {
    import spark.implicits._
    val docs = ((0L until 100L).map(i => (i, "web")) ++
      (100L until 200L).map(i => (i, "books")) ++
      (200L until 210L).map(i => (i, "junk")) ++
      Seq((210L, null.asInstanceOf[String]))).toDF("doc_id", "source")
    val plan = Seq(("web", 2.5), ("books", 0.25), ("junk", 0.0))
      .toDF("source", "rate")
    val out = Sampling.applyMixturePlan(docs, "source", "doc_id", plan)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // web: 2 full epochs × 100 + ~25% fractional third copies
    bySrc("web").toDouble should be(250.0 +- 30.0)
    bySrc("web") should be >= 200L
    // books: pure fractional — and EXACTLY mixtureSample's selection
    val frac = out.filter(col("source") === "books")
    frac.collect().map(_.getAs[Int]("epoch_idx")).toSet shouldBe Set(0)
    frac.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe
      Sampling.mixtureSample(docs.filter(col("source") === "books"),
        "source", "doc_id", Map("books" -> 0.25), 0.0)
        .collect().map(_.getLong(0)).toSet
    // rate 0 and plan-absent (NULL source) emit nothing
    bySrc.keySet shouldBe Set("web", "books")
    // web epoch indexes: every doc has epochs 0 and 1; 2 only fractionally
    val webEpochs = out.filter(col("source") === "web")
      .groupBy("doc_id").agg(collect_set("epoch_idx").as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSet).toMap
    webEpochs.values.foreach { e =>
      e should contain allOf (0, 1)
      e.subsetOf(Set(0, 1, 2)) shouldBe true
    }
    // determinism: layout-independent materialization
    val again = Sampling.applyMixturePlan(docs.repartition(7), "source",
      "doc_id", plan).groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe again
  }

  test("applyMixturePlan rejects a plan with duplicate source rows") {
    import spark.implicits._
    val docs = Seq((1L, "web")).toDF("doc_id", "source")
    val plan = Seq(("web", 1.0), ("web", 2.0)).toDF("source", "rate")
    val e = intercept[IllegalArgumentException] {
      Sampling.applyMixturePlan(docs, "source", "doc_id", plan)
    }
    e.getMessage should include("duplicate")
  }

  test("applyMixturePlan is shuffle-free — broadcast plan join + generator") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, "web")).toDF("doc_id", "source")
    val plan = Seq(("web", 1.5)).toDF("source", "rate")
    val exec = Sampling.applyMixturePlan(docs, "source", "doc_id", plan)
      .queryExecution.executedPlan.toString
    // the only exchange allowed is the broadcast of the plan side
    exec should not include "ShuffleExchange"
    exec should include("Generate")
  }

  test("hashSample is deterministic and layout-independent") {
    val a = Sampling.hashSample(rows, "id", 0.25).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(rows.repartition(7), "id", 0.25)
      .collect().map(_.getLong(0)).toSet
    a shouldBe b                       // same ids regardless of partitioning
    a.size.toDouble should be(250.0 +- 60.0) // ~fraction of 1000
  }

  test("hashSample edge fractions") {
    Sampling.hashSample(rows, "id", 0.0).count() shouldBe 0L
    Sampling.hashSample(rows, "id", 1.0).count() shouldBe 1000L
  }

  test("hashSample is a pure filter — no shuffle") {
    val plan = Sampling.hashSample(rows, "id", 0.5)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("mixtureSample: per-group fractions, nested samples, pure filter") {
    val mixed = Sampling.mixtureSample(rows, "lang", "id",
      Map("en" -> 1.0), defaultFraction = 0.25)
    val got = mixed.collect().map(_.getLong(0)).toSet
    // every en row kept
    rows.filter(col("lang") === "en").collect().map(_.getLong(0))
      .forall(got.contains) shouldBe true
    // de rows: exactly the 25% hash sample → subset of the 50% sample
    val de50 = Sampling.mixtureSample(rows, "lang", "id",
      Map("en" -> 1.0), defaultFraction = 0.5).collect().map(_.getLong(0)).toSet
    got.subsetOf(de50) shouldBe true
    mixed.queryExecution.executedPlan.toString should not include "Exchange"
  }

  test("stratifiedSample takes exactly n per stratum, deterministically") {
    val s1 = Sampling.stratifiedSample(rows, Seq("lang"), "id", 10).collect()
    val s2 = Sampling.stratifiedSample(rows.repartition(5), Seq("lang"), "id", 10)
      .collect()
    s1.map(r => (r.getLong(0), r.getString(1))).toSet shouldBe
      s2.map(r => (r.getLong(0), r.getString(1))).toSet
    s1.groupBy(_.getString(1)).view.mapValues(_.length).toMap shouldBe
      Map("en" -> 10, "de" -> 10)
  }

  test("stratifiedSample quota larger than stratum returns the whole stratum") {
    import spark.implicits._
    val tiny = Seq((1L, "en"), (2L, "en"), (3L, "fr")).toDF("id", "lang")
    Sampling.stratifiedSample(tiny, Seq("lang"), "id", 10).count() shouldBe 3L
  }

  test("stratifiedSample matches the window formulation, without a window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val sampled = Sampling.stratifiedSample(rows, Seq("lang"), "id", 7)
    // no per-stratum window: stratum size must never bound a task
    sampled.queryExecution.executedPlan.toString should not include "Window"
    val viaWindow = rows.filter(col("id").isNotNull)
      .withColumn("__rn", row_number().over(Window.partitionBy(col("lang"))
        .orderBy(md5(col("id").cast("string")), col("id"))))
      .filter(col("__rn") <= 7).drop("__rn")
    sampled.collect().map(r => (r.getLong(0), r.getString(1))).toSet shouldBe
      viaWindow.collect().map(r => (r.getLong(0), r.getString(1))).toSet
  }

  test("stratifiedSample keeps a NULL stratum as a real group") {
    import spark.implicits._
    val df = Seq((1L, Option("en")), (2L, Option.empty[String]),
      (3L, Option.empty[String]), (4L, Option.empty[String])).toDF("id", "lang")
    val got = Sampling.stratifiedSample(df, Seq("lang"), "id", 2)
      .collect().map(r => Option(r.getString(1)))
    got.count(_.isEmpty) shouldBe 2 // quota applies inside the null stratum
    got.count(_.contains("en")) shouldBe 1
  }

  test("capPerGroup keeps the n best per group, window-free") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // group "a": scores 0..9 (cap keeps 7..9); "b": 3 rows, all kept;
    // tie on score 5 in "a" broken toward the lower id
    val df = ((0L until 10L).map(i => (i, "a", i.toDouble)) ++
      Seq((100L, "a", 5.0)) ++
      (200L until 203L).map(i => (i, "b", 1.0))).toDF("id", "g", "s")
    val capped = Sampling.capPerGroup(df, Seq("g"), "id", col("s"), 3)
    capped.queryExecution.executedPlan.toString should not include "Window"
    val viaWindow = df
      .withColumn("__rn", row_number().over(Window.partitionBy(col("g"))
        .orderBy(col("s").desc, col("id"))))
      .filter(col("__rn") <= 3).drop("__rn")
    capped.collect().map(r => (r.getLong(0), r.getString(1))).toSet shouldBe
      viaWindow.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // tie check: id 5 (score 5.0) and 100 (score 5.0) both lose to 7/8/9
    val aIds = capped.filter(col("g") === "a").collect().map(_.getLong(0)).toSet
    aIds shouldBe Set(7L, 8L, 9L)
  }

  // two disjoint vocabularies: "wiki-like" docs vs "spam-like" docs
  private lazy val dsirDocs = {
    import spark.implicits._
    val wiki = (0L until 20L).map(i =>
      (i, s"the quick study of history shows pattern ${i % 3} in science"))
    val spam = (20L until 40L).map(i =>
      (i, s"buy cheap deal now click offer ${i % 3} win prize money"))
    val short = Seq((40L, "one"), (41L, ""))
    (wiki ++ spam ++ short).toDF("doc_id", "text")
  }

  test("importanceWeights ranks target-like docs above off-domain docs") {
    // target = 5 wiki docs; every wiki doc must outweigh every spam doc
    val target = dsirDocs.filter(col("doc_id") < 5)
    val w = Sampling.importanceWeights(dsirDocs, target, "doc_id", "text",
      numBuckets = 128)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val wikiMin = (0L until 20L).map(w).min
    val spamMax = (20L until 40L).map(w).max
    wikiMin should be > spamMax
    // featureless docs (one token / empty) carry the empty-product weight
    w(40L) shouldBe 0.0
    w(41L) shouldBe 0.0
    // every doc re-enters the output exactly once
    w.size shouldBe 42
  }

  test("importanceResampleTopK selects the k highest-weight docs, deterministically") {
    val target = dsirDocs.filter(col("doc_id") < 5)
    val top = Sampling.importanceResampleTopK(dsirDocs, target,
      "doc_id", "text", numBuckets = 128, k = 20)
      .collect().map(_.getLong(0)).toSet
    // contract: exactly the k docs that lead the weights output under
    // the same (rounded weight desc, id) order
    val expected = Sampling.importanceWeights(dsirDocs, target,
      "doc_id", "text", numBuckets = 128)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
      .sortBy { case (id, w) =>
        (-math.round(w * 1e6) / 1e6, id)
      }.take(20).map(_._1).toSet
    top shouldBe expected
    // no spam doc outranks the weight-0 floor into the resample
    top.intersect((20L until 40L).toSet) shouldBe empty
    // re-run is bit-identical (content-hash features, no RNG)
    Sampling.importanceResampleTopK(dsirDocs, target,
      "doc_id", "text", numBuckets = 128, k = 20)
      .collect().map(_.getLong(0)).toSet shouldBe top
  }

  test("dsirScore against a persisted model equals the one-shot run on contained docs") {
    val target = dsirDocs.filter(col("doc_id") < 5)
    val full = Sampling.importanceWeights(dsirDocs, target, "doc_id", "text",
      numBuckets = 128)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // round-trip the model through parquet like a real pipeline would
    val dir = java.nio.file.Files.createTempDirectory("dsir_model").toString
    Sampling.dsirTrain(dsirDocs, target, "doc_id", "text", 128)
      .write.mode("overwrite").parquet(dir)
    val model = spark.read.parquet(dir)
    val batch = dsirDocs.filter(col("doc_id") >= 30)
    val got = Sampling.dsirScore(batch, "doc_id", "text", model, 128)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    got.keySet shouldBe (30L until 42L).toSet
    got.foreach { case (id, w) => w shouldBe (full(id) +- 1e-9) }
  }

  test("dsirScore falls back to the model's unseen-bucket default") {
    import spark.implicits._
    val target = dsirDocs.filter(col("doc_id") < 5)
    // full 16-bit bucket space: the ~420 training features leave the
    // space sparse, so the alien grams' buckets miss the model
    val B = 65536
    val model = Sampling.dsirTrain(dsirDocs, target, "doc_id", "text", B)
    val alien = Seq((99L, "zq xv qqj vvk zzt")).toDF("doc_id", "text")
    // precondition (deterministic md5 data): no alien bucket is trained
    val trained = model.filter(col("b").isNotNull)
      .collect().map(_.getLong(0)).toSet
    val alienGrams = Seq("zq xv", "xv qqj", "qqj vvk", "vvk zzt")
    def bucket(g: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.take(4), 16).toLong % B
    }
    alienGrams.map(bucket).toSet.intersect(trained) shouldBe empty
    val row = Sampling.dsirScore(alien, "doc_id", "text", model, B).head()
    row.getLong(1) shouldBe 4 // 4 bigrams scored
    // all-miss score = n_feats × default ln((R+B)/(T+B)), positive (R > T)
    val dflt = model.filter(col("b").isNull).head().getDouble(1)
    dflt should be > 0.0
    row.getDouble(2) shouldBe (4 * dflt +- 1e-9)
  }

  test("importanceWeights matches a sequential reference on a tiny corpus") {
    import spark.implicits._
    // 4 docs, small bucket space to force collisions through the same
    // md5 kernel the operator uses
    val docs = Seq((1L, "a b c"), (2L, "b c d"), (3L, "x y"), (4L, "a b"))
      .toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") === 1)
    val B = 16
    def bucket(g: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (Integer.parseInt(hex.take(4), 16) % B)
    }
    def grams(t: String): Seq[String] = {
      val toks = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val all = Map(1L -> "a b c", 2L -> "b c d", 3L -> "x y", 4L -> "a b")
    val tCnt = grams(all(1L)).groupBy(bucket).map { case (k, v) => k -> v.size }
    val rCnt = all.values.flatMap(grams).groupBy(bucket)
      .map { case (k, v) => k -> v.size }
    val tTot = tCnt.values.sum.toDouble
    val rTot = rCnt.values.sum.toDouble
    def lw(id: Long): Double = grams(all(id)).map { g =>
      val b = bucket(g)
      math.log((tCnt.getOrElse(b, 0) + 1d) / (tTot + B)) -
        math.log((rCnt(b) + 1d) / (rTot + B))
    }.sum
    val got = Sampling.importanceWeights(docs, target, "doc_id", "text", B)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    all.keys.foreach { id =>
      got(id) shouldBe (lw(id) +- 1e-9)
    }
  }

  test("kCenterSelect covers every cluster before densifying any") {
    import spark.implicits._
    // three tight clusters far apart; greedy farthest-point must pick
    // one representative per cluster for t=3, regardless of sizes
    val rnd = new scala.util.Random(7)
    def around(c: Seq[Double]) = c.map(_ + rnd.nextDouble() * 0.01)
    val a = (0L until 5L).map(i => i -> around(Seq(10.0, 0.0, 0.0, 0.0)))
    val b = (10L until 14L).map(i => i -> around(Seq(0.0, 10.0, 0.0, 0.0)))
    val c = (20L until 23L).map(i => i -> around(Seq(0.0, 0.0, 10.0, 0.0)))
    val df = (a ++ b ++ c).toDF("vec_id", "v")
    val got = Sampling.kCenterSelect(df, "vec_id", "v", t = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got.length shouldBe 12
    // the coreset: rows assigned to themselves at distance 0
    val centers = got.filter(t => t._1 == t._2)
    centers.length shouldBe 3
    centers.foreach(_._3 shouldBe 0.0)
    // one center per cluster, and every row assigned within its cluster
    def cluster(id: Long) = id / 10
    centers.map(t => cluster(t._1)).toSet shouldBe Set(0L, 1L, 2L)
    got.foreach { case (id, cid, d) =>
      cluster(cid) shouldBe cluster(id)
      d should be < 0.01 // within-cluster jitter only
    }
    // seed is the lowest id
    centers.map(_._1) should contain(0L)
  }

  test("kCenterAssign against a persisted coreset equals kCenterSelect's own assignment") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val pts = (0L until 30L).map(i => i -> Seq.fill(4)(rnd.nextDouble()))
    val df = pts.toDF("vec_id", "v")
    val dir = java.nio.file.Files.createTempDirectory("kcenter").toString
    Sampling.kCenterCenters(df, "vec_id", "v", t = 4)
      .write.mode("overwrite").parquet(dir)
    val centers = spark.read.parquet(dir)
    // ord is part of the model: 1..t, center 1 is the lowest id
    centers.collect().map(_.getInt(0)).sorted shouldBe (1 to 4)
    val fromModel = Sampling.kCenterAssign(df, "vec_id", "v", centers)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val direct = Sampling.kCenterSelect(df, "vec_id", "v", t = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    fromModel shouldBe direct
    // a batch the traversal never saw routes into the frozen regions
    val extra = Seq((100L, pts(3)._2.map(_ + 0.001))).toDF("vec_id", "v")
    val routed = Sampling.kCenterAssign(extra, "vec_id", "v", centers)
      .collect()
    routed.length shouldBe 1
    routed(0).getLong(1) shouldBe direct.find(_._1 == 3L).get._2
  }

  test("kCenterExtend grows a frozen coreset only where the batch under-covers") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    def around(c: Seq[Double]) = c.map(_ + rnd.nextDouble() * 0.01)
    // frozen coreset over two clusters
    val a = (0L until 5L).map(i => i -> around(Seq(10.0, 0.0, 0.0, 0.0)))
    val b = (10L until 14L).map(i => i -> around(Seq(0.0, 10.0, 0.0, 0.0)))
    val frozen = Sampling.kCenterCenters(
      (a ++ b).toDF("vec_id", "v"), "vec_id", "v", t = 2)
    frozen.collect().length shouldBe 2
    // the batch: a NEW far cluster + more points inside cluster a
    val c = (20L until 23L).map(i => i -> around(Seq(0.0, 0.0, 10.0, 0.0)))
    val near = (30L until 33L).map(i => i -> around(Seq(10.0, 0.0, 0.0, 0.0)))
    val ext = Sampling.kCenterExtend(
      (c ++ near).toDF("vec_id", "v"), "vec_id", "v", frozen, tExtra = 1)
    val rows = ext.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
    rows.length shouldBe 3
    // frozen rows pass through byte-identical, in their original order
    rows.take(2).map(r => (r._1, r._2)).toSeq shouldBe
      frozen.collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
    // the one added center is from the UNCOVERED cluster (greedy fills
    // the worst-covered region first), with the next ord
    rows(2)._1 shouldBe 3
    (rows(2)._2 / 10) shouldBe 2L
    // assignment routes every corpus row within its geometric cluster
    // (ids 30+ sit in cluster a's region)
    def cluster(id: Long): Long = if (id >= 30) 0L else id / 10
    val all = (a ++ b ++ c ++ near).toDF("vec_id", "v")
    Sampling.kCenterAssign(all, "vec_id", "v", ext).collect().foreach { r =>
      cluster(r.getLong(1)) shouldBe cluster(r.getLong(0))
    }
    // a batch that coincides exactly with existing centers adds nothing
    val dup = frozen.select(col("center_id").as("vec_id"),
      col("centroid").as("v"))
    Sampling.kCenterExtend(dup, "vec_id", "v", frozen, tExtra = 3)
      .count() shouldBe 2
  }

  test("kCenter traversal stops when every row coincides with a chosen center") {
    import spark.implicits._
    // 3 distinct vectors, t = 5: rounds past the third would only re-pick
    // already-chosen points (farthest min-distance 0) — the persisted
    // coreset must stay distinct (r11 ADVICE)
    val df = Seq(
      0L -> Seq(0.0, 0.0), 1L -> Seq(10.0, 0.0), 2L -> Seq(0.0, 10.0),
      3L -> Seq(0.0, 0.0) // duplicate vector of id 0
    ).toDF("vec_id", "v")
    val centers = Sampling.kCenterCenters(df, "vec_id", "v", t = 5).collect()
    centers.length shouldBe 3
    centers.map(_.getLong(1)).distinct.length shouldBe 3
    centers.map(_.getInt(0)).sorted shouldBe (1 to 3)
    // assignment still covers every row, duplicates at distance 0
    val got = Sampling.kCenterSelect(df, "vec_id", "v", t = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    got.keySet shouldBe Set(0L, 1L, 2L, 3L)
    got(3L) shouldBe 0.0
  }

  test("native nearest-center assignment (>100 centers) equals the scalar argmin rule") {
    import spark.implicits._
    // above NativeAssignAbove the assignment goes through the single
    // NearestCenter expression node instead of t HOF subtrees — must be
    // bit-exact with the round-6 earliest-tie fold
    val t = Sampling.NativeAssignAbove + 20
    val rnd = new scala.util.Random(41)
    val ctrs = (0 until t).map { i =>
      (i + 1, (1000L + i), Seq.fill(4)(rnd.nextDouble()))
    }
    val centersDf = ctrs.toDF("ord", "center_id", "centroid")
    val pts = (0L until 50L).map(i => i -> Seq.fill(4)(rnd.nextDouble()))
    // two rows exactly on a centroid (force 0-distance + tie discipline)
    val df = (pts :+ (900L -> ctrs(7)._3) :+ (901L -> ctrs(42)._3))
      .toDF("vec_id", "v")
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def d2(a: Seq[Double], b: Seq[Double]) =
      r6(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val want = (pts :+ (900L -> ctrs(7)._3) :+ (901L -> ctrs(42)._3))
      .map { case (id, v) =>
        val (d, i) = ctrs.map(c => d2(v, c._3)).zipWithIndex
          .minBy { case (d, i) => (d, i) } // earliest center on ties
        id -> ((ctrs(i)._2, d))
      }.toMap
    val got = Sampling.kCenterAssign(df, "vec_id", "v", centersDf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    got shouldBe want
    got(900L) shouldBe ((ctrs(7)._2, 0.0))
    got(901L) shouldBe ((ctrs(42)._2, 0.0))
  }

  test("kCenterSelect matches a sequential farthest-point reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val pts = (0L until 40L).map(i => i -> Seq.fill(4)(rnd.nextDouble()))
    val df = pts.toDF("vec_id", "v")
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def d2(a: Seq[Double], b: Seq[Double]) =
      r6(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val all = pts.toMap
    var chosen = Vector(0L)
    (2 to 5).foreach { _ =>
      val next = pts
        .map { case (id, v) => (chosen.map(c => d2(v, all(c))).min, id) }
        .maxBy { case (d, id) => (d, -id) }._2
      chosen = chosen :+ next
    }
    val want = pts.map { case (id, v) =>
      val (d, ci) = chosen.zipWithIndex
        .map { case (c, i) => (d2(v, all(c)), i) }
        .minBy { case (d, i) => (d, i) }
      id -> (chosen(ci), d)
    }.toMap
    val got = Sampling.kCenterSelect(df, "vec_id", "v", t = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    got shouldBe want
  }

  test("kCenterParCenters: deterministic, covers clusters, radius within greedy bound") {
    import spark.implicits._
    // the kCenterSelect fixture: three tight clusters far apart
    val rnd = new scala.util.Random(7)
    def around(c: Seq[Double]) = c.map(_ + rnd.nextDouble() * 0.01)
    val a = (0L until 5L).map(i => i -> around(Seq(10.0, 0.0, 0.0, 0.0)))
    val b = (10L until 14L).map(i => i -> around(Seq(0.0, 10.0, 0.0, 0.0)))
    val c = (20L until 23L).map(i => i -> around(Seq(0.0, 0.0, 10.0, 0.0)))
    val df = (a ++ b ++ c).toDF("vec_id", "v")
    val centers = Sampling.kCenterParCenters(df, "vec_id", "v", t = 3,
      rounds = 3, oversample = 2.0)
    // derandomized md5 sampling: a second run is bit-identical
    Sampling.kCenterParCenters(df, "vec_id", "v", t = 3,
        rounds = 3, oversample = 2.0)
      .collect().map(_.toSeq).toSeq shouldBe
      centers.collect().map(_.toSeq).toSeq
    val rows = centers.collect()
    rows.map(_.getInt(0)).toSeq shouldBe (1 to rows.length) // ord 1..m
    rows.head.getLong(1) shouldBe 0L // the corpus seed (lowest id)
    // covering radius vs the exact greedy yardstick: on a clustered
    // fixture the d2-proportional sampling must surface every cluster,
    // so the reduced coreset covers within 2x greedy's radius
    def radius(ctr: org.apache.spark.sql.DataFrame): Double =
      Sampling.kCenterAssign(df, "vec_id", "v", ctr)
        .agg(org.apache.spark.sql.functions.max(col("d2"))).head.getDouble(0)
    val greedyR = radius(Sampling.kCenterCenters(df, "vec_id", "v", t = 3))
    val parR = radius(centers)
    parR should be <= math.max(2.0 * greedyR, 1e-4)
    // and with one center per cluster, assignment stays within-cluster
    if (rows.length == 3)
      parR should be < 0.01
  }

  test("kCenterParCenters: duplicate-vector corpus stops early, composes with assign") {
    import spark.implicits._
    // 2 distinct vectors over 20 rows: the candidate pool and the
    // reduction both exhaust at 2 centers no matter t
    val df = (0L until 20L).map(i =>
      i -> (if (i % 2 == 0) Seq(1.0, 0.0) else Seq(0.0, 1.0)))
      .toDF("vec_id", "v")
    val ctr = Sampling.kCenterParCenters(df, "vec_id", "v", t = 10,
      rounds = 4, oversample = 3.0)
    ctr.count() shouldBe 2
    val assigned = Sampling.kCenterAssign(df, "vec_id", "v", ctr)
    assigned.agg(org.apache.spark.sql.functions.max(col("d2")))
      .head.getDouble(0) shouldBe 0.0
  }
}
