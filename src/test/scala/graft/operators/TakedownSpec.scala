package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Takedown.Store

/** The corpus-level takedown orchestrator ([[Takedown.forget]]): one
  * call walks EVERY registered persisted store through its existing
  * delete face. Each store's post-forget state is checked against the
  * strongest available yardstick — rebuild-over-survivors for the
  * index stores, retrain-over-survivors for the count-form models,
  * the documented owner-forgetting contract for CDC, the re-closure
  * rebuild for cluster state — plus the orchestration-level contracts:
  * unknown kinds refuse BEFORE any store mutates, a failing store does
  * not stop the rest, and failures are loud (or reported, under
  * bestEffort).
  */
class TakedownSpec extends SparkSpec {

  // 12 docs; victims are ids % 3 == 1 (1, 4, 7, 10). Texts long enough
  // for 5-token shingles and 3-gram decontam probes; 0/6 and 3/9 are
  // near-dup pairs so the dedup-ish stores have structure to lose.
  private def corpus: DataFrame = {
    import spark.implicits._
    def t(seed: Int): String =
      (0 until 30).map(i => s"w${(i * 5 + seed) % 17}x").mkString(" ")
    Seq(
      (0L, t(1)), (1L, t(2)), (2L, t(3)),
      (3L, t(4)), (4L, t(5)), (5L, t(6)),
      (6L, t(1)), (7L, t(8)), (8L, t(9)),
      (9L, t(4)), (10L, t(11)), (11L, t(12))
    ).toDF("doc_id", "text")
  }
  private val victimPred = col("doc_id") % 3 === 1
  private def victims: DataFrame =
    corpus.filter(victimPred).select(col("doc_id").as("id"), col("text"))
  private def survivors: DataFrame = corpus.filter(!victimPred)

  private def vecs: DataFrame = {
    import spark.implicits._
    (0L to 11L).map(i =>
      (i, Seq(math.cos(i * 0.5), math.sin(i * 0.5), 0.1 * i, 1.0)))
      .toDF("vec_id", "embedding")
  }

  // a triangle-rich little graph: victims 1, 4, 7 sit in triangles
  private def edges: DataFrame = {
    import spark.implicits._
    Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L), (2L, 4L),
      (5L, 6L), (6L, 7L), (5L, 7L), (8L, 9L), (9L, 3L), (8L, 3L))
      .toDF("src", "dst")
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"takedown-$tag").toString

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString(""))

  test("unknown kinds refuse loudly BEFORE any store is touched") {
    val nb = tmp("unknown") + "/nb"
    Classifier.nbModelWrite(corpus, "doc_id", "text", nb)
    val before = sorted(
      Classifier.nbScoreFromModel(corpus, "doc_id", "text", nb))
    val e = intercept[IllegalArgumentException] {
      Takedown.forget(victims,
        Seq(Store("nb_model", nb), Store("no_such_kind", "/tmp/x")))
    }
    e.getMessage should include("unknown store kind")
    e.getMessage should include("no_such_kind")
    e.getMessage should include("nb_model") // the registered-kinds list
    // the VALID store was not mutated: validation precedes any apply
    sorted(Classifier.nbScoreFromModel(corpus, "doc_id", "text", nb)) shouldBe
      before
  }

  test("id_text stores demand the text column upfront") {
    val nb = tmp("notext") + "/nb"
    Classifier.nbModelWrite(corpus, "doc_id", "text", nb)
    intercept[IllegalArgumentException] {
      Takedown.forget(victims.select("id"), Seq(Store("nb_model", nb)))
    }.getMessage should include("exact")
    intercept[IllegalArgumentException] {
      Takedown.forget(victims, Seq.empty)
    }.getMessage should include("no stores registered")
    // the vacuous-proof twin: an empty audit/compactAll must refuse too
    intercept[IllegalArgumentException] {
      Takedown.assertForgotten(victims, Seq.empty)
    }.getMessage should include("no stores registered")
    intercept[IllegalArgumentException] {
      Takedown.compactAll(spark, Seq.empty)
    }.getMessage should include("no stores registered")
    // a known kind missing a REQUIRED opt refuses upfront — before any
    // other store mutates (the statically-knowable misconfiguration)
    val before2 = sorted(
      Classifier.nbScoreFromModel(corpus, "doc_id", "text", nb))
    intercept[IllegalArgumentException] {
      Takedown.forget(victims, Seq(
        Store("nb_model", nb, Map("idCol" -> "doc_id")),
        Store("table", "/tmp/whatever", Map("idCol" -> "doc_id"))))
    }.getMessage should include("partitionCol")
    sorted(Classifier.nbScoreFromModel(corpus, "doc_id", "text", nb)) shouldBe
      before2
  }

  test("one orchestrated forget hits every registered store kind") {
    val base = tmp("all")
    val docs = corpus
    // ---- build the full store surface
    Classifier.nbModelWrite(docs, "doc_id", "text", s"$base/nb")
    Sampling.dsirStoreWrite(docs, docs.filter(col("doc_id") < 3),
      "doc_id", "text", s"$base/dsir", numBuckets = 64)
    TrainingData.bm25IndexWrite(docs, "doc_id", "text", s"$base/bm25",
      nBuckets = 4)
    TrainingData.decontamIndexWrite(docs, "doc_id", "text", s"$base/dc",
      n = 3, nBuckets = 8)
    TrainingData.containmentIndexWrite(docs, "doc_id", "text",
      s"$base/ct", shingleN = 12)
    Dedup.jaccardPrefixIndexWrite(docs, "doc_id", "text", s"$base/jp",
      shingleN = 5, threshold = 0.5)
    Similarity.ivfWriteIndex(vecs, "vec_id", "embedding", dim = 4,
      path = s"$base/ivf", nBits = 2, lloydIters = 0)
    Embeddings.kmeansModelWrite(vecs, "vec_id", "embedding",
      dim = 4, k = 2, iters = 2, s"$base/km")
    Embeddings.pqModelWrite(vecs, "vec_id", "embedding",
      dim = 4, m = 2, k = 2, iters = 2, s"$base/pq")
    Graph.trianglesIndexWrite(edges, "src", "dst", s"$base/tri")
    docs.select(col("doc_id"), (col("doc_id") % 2).as("p"), col("text"))
      .write.partitionBy("p").parquet(s"$base/tbl")
    // cdc state in the stream's batch layout (two committed batches)
    def writeBatch(df: DataFrame, path: String, b: Long): Unit =
      df.withColumn("batch_id", lit(b))
        .write.mode("append").partitionBy("batch_id").parquet(path)
    val cdc0 = TrainingData.cdcIndex(docs.filter(col("doc_id") < 6),
      "doc_id", "text", w = 4, maskBits = 3)
    writeBatch(cdc0, s"$base/cdc", 0L)
    writeBatch(TrainingData.cdcIndexDelta(docs.filter(col("doc_id") >= 6),
      "doc_id", "text", w = 4, maskBits = 3, cdc0), s"$base/cdc", 1L)
    // cluster state in the stream's layout: labels = closure over pairs
    import spark.implicits._
    val pairs0 = Seq((1L, 2L), (2L, 3L), (5L, 6L), (4L, 8L))
      .toDF("id_a", "id_b")
    writeBatch(pairs0, s"$base/cs/pairs", 0L)
    writeBatch(Dedup.connectedComponents(pairs0, "id_a", "id_b"),
      s"$base/cs/labels", 0L)
    writeBatch(docs.select(col("doc_id").as("id")), s"$base/cs/index", 0L)

    val allStores = Seq(
      Store("nb_model", s"$base/nb", Map("idCol" -> "doc_id")),
      Store("dsir", s"$base/dsir", Map("idCol" -> "doc_id")),
      Store("bm25", s"$base/bm25", Map("idCol" -> "doc_id")),
      Store("decontam", s"$base/dc", Map("idCol" -> "doc_id")),
      Store("containment", s"$base/ct", Map("idCol" -> "doc_id")),
      Store("jaccard_prefix", s"$base/jp", Map("idCol" -> "doc_id")),
      Store("ivf", s"$base/ivf", Map("idCol" -> "vec_id")),
      Store("kmeans_model", s"$base/km", Map("idCol" -> "vec_id")),
      Store("pq_model", s"$base/pq", Map("idCol" -> "vec_id")),
      Store("triangles", s"$base/tri"),
      Store("table", s"$base/tbl",
        Map("idCol" -> "doc_id", "partitionCol" -> "p")),
      Store("cdc_state", s"$base/cdc", Map("idCol" -> "doc_id")),
      Store("cluster_state", s"$base/cs", Map("idCol" -> "id")))

    // ---- negative control: BEFORE the takedown, every store's audit
    // probe sees at least one requested id (so clean-after isn't an
    // audit that can't see anything)
    val before = Takedown.audit(victims, allStores)
    before.filter(col("status") =!= "held").count() shouldBe 0L

    // ---- ONE takedown request across the whole surface
    val outcomes = Takedown.forget(victims, allStores)
    outcomes.filter(col("status") =!= "deleted").count() shouldBe 0L
    outcomes.count() shouldBe 13L

    // ---- and PROVE it: no store's read face can still see the ids
    Takedown.assertForgotten(victims, allStores)

    // ---- every store now answers as rebuilt/retrained over survivors
    // nb: exact unlearning == retrain
    sorted(Classifier.nbScoreFromModel(survivors, "doc_id", "text",
      s"$base/nb").select(col("doc_id"), col("label"),
      col("n_tokens_scored"), round(col("nb_score"), 6), col("predicted_pass"))) shouldBe
      sorted(Classifier.naiveBayesQuality(survivors, "doc_id", "text")
        .select(col("doc_id"), col("label"), col("n_tokens_scored"),
          round(col("nb_score"), 6), col("predicted_pass")))
    // dsir: exact unlearning == retrain (victims leave both roles)
    sorted(Sampling.dsirStoreScore(survivors, "doc_id", "text",
      s"$base/dsir").select(col("doc_id"), col("n_feats"),
      round(col("logw"), 6))) shouldBe
      sorted(Sampling.importanceWeights(survivors,
        survivors.filter(col("doc_id") < 3), "doc_id", "text", 64)
        .select(col("doc_id"), col("n_feats"), round(col("logw"), 6)))
    // index stores: probe-after-delete == probe of a REBUILD on survivors
    val rb = tmp("rebuild")
    TrainingData.bm25IndexWrite(survivors, "doc_id", "text", s"$rb/bm25",
      nBuckets = 4)
    val q = Seq("w1x", "w7x", "zzz")
    sorted(TrainingData.bm25FromIndex(spark, s"$base/bm25", "doc_id", q)) shouldBe
      sorted(TrainingData.bm25FromIndex(spark, s"$rb/bm25", "doc_id", q))
    TrainingData.decontamIndexWrite(survivors, "doc_id", "text",
      s"$rb/dc", n = 3, nBuckets = 8)
    val eval = corpus.limit(2)
    sorted(TrainingData.decontaminateFromIndex(eval, "text",
      s"$base/dc", "doc_id")) shouldBe
      sorted(TrainingData.decontaminateFromIndex(eval, "text",
        s"$rb/dc", "doc_id"))
    TrainingData.containmentIndexWrite(survivors, "doc_id", "text",
      s"$rb/ct", shingleN = 12)
    val ev2 = corpus.limit(2)
      .select(col("doc_id").as("eval_id"), col("text"))
    sorted(TrainingData.decontaminateContainmentFromIndex(ev2, "eval_id",
      "text", s"$base/ct", "doc_id", threshold = 0.3)) shouldBe
      sorted(TrainingData.decontaminateContainmentFromIndex(ev2, "eval_id",
        "text", s"$rb/ct", "doc_id", threshold = 0.3))
    Dedup.jaccardPrefixIndexWrite(survivors, "doc_id", "text", s"$rb/jp",
      shingleN = 5, threshold = 0.5)
    val newDocs = Seq((100L, corpus.filter(col("doc_id") === 0L)
      .head().getString(1))).toDF("doc_id", "text")
    sorted(Dedup.jaccardJoinPrefixIncremental(newDocs, "doc_id", "text",
      s"$base/jp", threshold = 0.5)) shouldBe
      sorted(Dedup.jaccardJoinPrefixIncremental(newDocs, "doc_id", "text",
        s"$rb/jp", threshold = 0.5))
    // ivf: tombstones hide victims from every probe (cells are
    // data-independent at lloydIters = 0, so rebuild compares equal)
    Similarity.ivfWriteIndex(vecs.filter(col("vec_id") % 3 =!= 1),
      "vec_id", "embedding", dim = 4, path = s"$rb/ivf", nBits = 2,
      lloydIters = 0)
    val qv = Seq(1.0, 0.1, 0.2, 1.0)
    sorted(Similarity.ivfTopKFromIndex(spark, s"$base/ivf", "vec_id", qv,
      k = 12, nProbe = 4)) shouldBe
      sorted(Similarity.ivfTopKFromIndex(spark, s"$rb/ivf", "vec_id", qv,
        k = 12, nProbe = 4))
    // kmeans_model: forget fences the victim-trained centroids (no
    // read face serves them), and its compact retrains over survivors
    intercept[IllegalArgumentException] {
      Embeddings.kmeansModelCentroids(spark, s"$base/km")
    }.getMessage should include("VICTIM-STALE")
    Embeddings.kmeansModelCompact(spark, s"$base/km")
    sorted(Embeddings.kmeansModelCentroids(spark, s"$base/km")) shouldBe
      sorted(Embeddings.kmeansTrain(vecs.filter(col("vec_id") % 3 =!= 1),
        "vec_id", "embedding", dim = 4, k = 2, iters = 2))
    // pq_model: same fence + retrain protocol over the codebooks
    intercept[IllegalArgumentException] {
      Embeddings.pqModelCodebooks(spark, s"$base/pq")
    }.getMessage should include("VICTIM-STALE")
    Embeddings.pqModelCompact(spark, s"$base/pq")
    sorted(Embeddings.pqModelCodebooks(spark, s"$base/pq")) shouldBe
      sorted(Embeddings.pqTrain(vecs.filter(col("vec_id") % 3 =!= 1),
        "vec_id", "embedding", dim = 4, m = 2, k = 2, iters = 2))
    // triangles: node forget == rebuild over non-incident edges
    Graph.trianglesIndexWrite(
      edges.filter(col("src") % 3 =!= 1 && col("dst") % 3 =!= 1),
      "src", "dst", s"$rb/tri")
    sorted(Graph.trianglesFromIndex(spark, s"$base/tri")) shouldBe
      sorted(Graph.trianglesFromIndex(spark, s"$rb/tri"))
    // table: victim rows physically gone, survivors intact
    val tbl = spark.read.parquet(s"$base/tbl")
    tbl.filter(victimPred).count() shouldBe 0L
    tbl.count() shouldBe survivors.count()
    // cdc: owner-forgetting — after physical compaction the index holds
    // exactly the full index minus victim-owned rows
    graft.streaming.StreamingOps.compactCdcIndex(spark, s"$base/cdc",
      includeLatest = true)
    val cdcAll = TrainingData.cdcIndex(docs, "doc_id", "text",
      w = 4, maskBits = 3)
    sorted(spark.read.parquet(s"$base/cdc")
      .select("chunk_md5", "doc_id", "chunk_idx")) shouldBe
      sorted(cdcAll.filter(col("doc_id") % 3 =!= 1))
    // cluster state: labels re-closed over surviving pairs — {1,2,3}
    // loses its representative (re-elect 2), {4,8} loses its bridge
    // (8 orphans), {5,6} untouched
    sorted(graft.streaming.StreamingOps.currentClusterLabels(spark,
      s"$base/cs/labels")) shouldBe
      sorted(Dedup.connectedComponents(
        pairs0.filter(col("id_a") % 3 =!= 1 && col("id_b") % 3 =!= 1),
        "id_a", "id_b"))
  }

  test("compactAll runs every compaction face; table kind is a noop") {
    val base = tmp("compact")
    Classifier.nbModelWrite(corpus, "doc_id", "text", s"$base/nb")
    Similarity.ivfWriteIndex(vecs, "vec_id", "embedding", dim = 4,
      path = s"$base/ivf", nBits = 2, lloydIters = 0)
    corpus.select(col("doc_id"), (col("doc_id") % 2).as("p"), col("text"))
      .write.partitionBy("p").parquet(s"$base/tbl")
    val stores = Seq(
      Store("nb_model", s"$base/nb", Map("idCol" -> "doc_id")),
      Store("ivf", s"$base/ivf", Map("idCol" -> "vec_id")),
      Store("table", s"$base/tbl",
        Map("idCol" -> "doc_id", "partitionCol" -> "p")))
    Takedown.forget(victims, stores)
    val out = Takedown.compactAll(spark, stores)
      .collect().map(r => (r.getString(0), r.getString(2))).toSeq
    out should contain(("nb_model", "compacted"))
    out should contain(("ivf", "compacted"))
    out should contain(("table", "noop"))
    // physical: victim evidence left the ledger and the cells
    import spark.implicits._
    spark.read.parquet(s"$base/nb/members")
      .filter(col("id") % 3 === 1).count() shouldBe 0L
    spark.read.parquet(s"$base/ivf/cells")
      .filter(col("vec_id") % 3 === 1).count() shouldBe 0L
    // all tombstones applied and GC'd (the directory may remain as an
    // empty overwrite artifact; pending ROWS are what must be gone)
    Similarity.readParquetIfAny(spark, s"$base/ivf/tombstones")
      .map(_.count()).getOrElse(0L) shouldBe 0L
    // the audit holds after physical removal too, and a bogus path
    // audits as failed (NOT clean), which assertForgotten refuses
    Takedown.assertForgotten(victims, stores)
    val bogus = Seq(Store("bm25", s"$base/no-such-index"))
    Takedown.audit(victims, bogus).head().getString(2) shouldBe "failed"
    intercept[IllegalStateException] {
      Takedown.assertForgotten(victims, bogus)
    }.getMessage should include("NOT proven")
    // unknown kinds refuse here too
    intercept[IllegalArgumentException] {
      Takedown.compactAll(spark, Seq(Store("nope", "/tmp/x")))
    }.getMessage should include("unknown store kind")
    // a failing store is loud and does not stop the rest: a crashed
    // REBUILD leaves a rebuild-typed marker compaction must refuse
    Classifier.nbModelWrite(corpus, "doc_id", "text", s"$base/nb2")
    Classifier.nbModelDelete(victims, "id", "text", s"$base/nb2")
    intercept[RuntimeException] {
      AtomicBatches.withRebuildMarker(spark, s"$base/nb2") {
        throw new RuntimeException("simulated mid-rebuild crash")
      }
    }
    val out2 = Takedown.compactAll(spark,
      Seq(Store("nb_model", s"$base/nb2"),
        Store("nb_model", s"$base/nb")), bestEffort = true)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    out2 should contain((s"$base/nb2", "failed"))
    out2 should contain((s"$base/nb", "compacted"))
    intercept[IllegalStateException] {
      Takedown.compactAll(spark, Seq(Store("nb_model", s"$base/nb2")))
    }.getMessage should include("INCOMPLETE")
  }

  test("forgetCompactAssert: one fused walk == forget + compactAll + " +
      "assertForgotten, with per-store failure reporting") {
    import spark.implicits._
    // two identical store surfaces from one corpus: fused walk on A,
    // the three phase-barriered calls on B — read faces must agree
    def build(base: String): Seq[Store] = {
      Classifier.nbModelWrite(corpus, "doc_id", "text", s"$base/nb")
      Similarity.ivfWriteIndex(vecs, "vec_id", "embedding", dim = 4,
        path = s"$base/ivf", nBits = 2, lloydIters = 0)
      corpus.select(col("doc_id"), (col("doc_id") % 2).as("p"), col("text"))
        .write.partitionBy("p").parquet(s"$base/tbl")
      Seq(
        Store("nb_model", s"$base/nb", Map("idCol" -> "doc_id")),
        Store("ivf", s"$base/ivf", Map("idCol" -> "vec_id")),
        Store("table", s"$base/tbl",
          Map("idCol" -> "doc_id", "partitionCol" -> "p")))
    }
    val a = tmp("fusedA"); val b = tmp("fusedB")
    val storesA = build(a); val storesB = build(b)
    val vAll = victims.unionByName(
      vecs.filter(col("vec_id") % 3 === 1)
        .select(col("vec_id").as("id"), lit(null).cast("string").as("text")))

    val fused = Takedown.forgetCompactAssert(vAll, storesA)
    fused.count() shouldBe 3L
    fused.filter(col("status") =!= "purged").count() shouldBe 0L

    Takedown.forget(vAll, storesB)
    Takedown.compactAll(spark, storesB)
    Takedown.assertForgotten(vAll, storesB)

    // identical post-state on every read face
    sorted(Classifier.nbScoreFromModel(survivors, "doc_id", "text",
      s"$a/nb").select(col("doc_id"), round(col("nb_score"), 6))) shouldBe
      sorted(Classifier.nbScoreFromModel(survivors, "doc_id", "text",
        s"$b/nb").select(col("doc_id"), round(col("nb_score"), 6)))
    sorted(spark.read.parquet(s"$a/ivf/cells").select("vec_id")) shouldBe
      sorted(spark.read.parquet(s"$b/ivf/cells").select("vec_id"))
    sorted(spark.read.parquet(s"$a/tbl").select("doc_id")) shouldBe
      sorted(spark.read.parquet(s"$b/tbl").select("doc_id"))
    // physical removal happened inside the fused chain (compact ran)
    spark.read.parquet(s"$a/nb/members")
      .filter(col("id") % 3 === 1).count() shouldBe 0L
    // and the fused audit is not vacuous: it proves against the store's
    // own probe (assertForgotten on the fused surface agrees)
    Takedown.assertForgotten(vAll, storesA)

    // failure semantics: a broken store fails its OWN chain; the rest
    // still run to completion (attempt-all), and the loud raise lists it
    val nbC = tmp("fusedC") + "/nb"
    Classifier.nbModelWrite(corpus, "doc_id", "text", nbC)
    val out = Takedown.forgetCompactAssert(vAll, Seq(
      Store("nb_model", nbC, Map("idCol" -> "doc_id")),
      Store("bm25", tmp("fusedD") + "/no-such-index")), bestEffort = true)
      .collect().map(r => (r.getString(0), r.getString(2))).toSeq
    out should contain(("nb_model", "purged"))
    out.find(_._1 == "bm25").get._2 shouldBe "failed"
    intercept[IllegalStateException] {
      Takedown.forgetCompactAssert(vAll, Seq(
        Store("bm25", tmp("fusedE") + "/nope")))
    }.getMessage should include("INCOMPLETE")
  }

  test("duplicate store roots refuse upfront — concurrent walks must " +
      "be independent") {
    val nb = tmp("dup") + "/nb"
    Classifier.nbModelWrite(corpus, "doc_id", "text", nb)
    val before = sorted(
      Classifier.nbScoreFromModel(corpus, "doc_id", "text", nb))
    // the same root twice was a harmless re-delivery when the walk was
    // sequential; concurrent, the two faces race the same batch/_MAINT
    // directories — statically knowable, so it refuses before mutating
    intercept[IllegalArgumentException] {
      Takedown.forget(victims, Seq(
        Store("nb_model", nb, Map("idCol" -> "doc_id")),
        Store("nb_model", nb + "/", Map("idCol" -> "doc_id"))))
    }.getMessage should include("more than once")
    // a cluster_state SUB-path colliding with another store's root is
    // the same race wearing a different kind
    intercept[IllegalArgumentException] {
      Takedown.compactAll(spark, Seq(
        Store("cluster_state", "/tmp/td-dup-cs"),
        Store("bm25", "/tmp/td-dup-cs/labels")))
    }.getMessage should include("more than once")
    // a store NESTED inside another's root pollutes the outer store's
    // recursive scans (a table kind would sweep the inner store's files
    // into its rewrite) — refused upfront too
    intercept[IllegalArgumentException] {
      Takedown.forget(victims, Seq(
        Store("table", "/tmp/td-nest",
          Map("idCol" -> "doc_id", "partitionCol" -> "p")),
        Store("nb_model", "/tmp/td-nest/nb", Map("idCol" -> "doc_id"))))
    }.getMessage should include("nested")
    sorted(Classifier.nbScoreFromModel(corpus, "doc_id", "text", nb)) shouldBe
      before
  }

  test("syntactic path aliases cannot evade the duplicate/nested root " +
      "guards; cluster_state's own root is guarded even with all " +
      "sub-paths overridden") {
    val nb = tmp("alias") + "/nb"
    Classifier.nbModelWrite(corpus, "doc_id", "text", nb)
    // 'a//b', './x' segments and a second trailing form all collapse to
    // the same normalized root — the concurrent-walk race they would
    // smuggle in is the exact one the guard exists to refuse
    intercept[IllegalArgumentException] {
      Takedown.forget(victims, Seq(
        Store("nb_model", nb, Map("idCol" -> "doc_id")),
        Store("nb_model", nb.replace("/nb", "//./nb/"),
          Map("idCol" -> "doc_id"))))
    }.getMessage should include("more than once")
    // an aliased NESTED root refuses too
    intercept[IllegalArgumentException] {
      Takedown.forget(victims, Seq(
        Store("table", "/tmp/td-alias-nest",
          Map("idCol" -> "doc_id", "partitionCol" -> "p")),
        Store("nb_model", "/tmp/td-alias-nest//inner/./nb",
          Map("idCol" -> "doc_id"))))
    }.getMessage should include("nested")
    // cluster_state with ALL THREE sub-paths overridden elsewhere: its
    // st.path is still a guarded prefix — a second store rooted exactly
    // there must refuse (a future cluster_state face reading its root
    // directly must not silently share it)
    intercept[IllegalArgumentException] {
      Takedown.compactAll(spark, Seq(
        Store("cluster_state", "/tmp/td-alias-cs", Map(
          "indexPath" -> "/tmp/td-alias-elsewhere/index",
          "pairsPath" -> "/tmp/td-alias-elsewhere/pairs",
          "labelsPath" -> "/tmp/td-alias-elsewhere/labels")),
        Store("nb_model", "/tmp/td-alias-cs", Map("idCol" -> "doc_id"))))
    }.getMessage should include("more than once")
    // ...while its DEFAULT sub-paths (nested inside its own root by
    // design) do not self-trip the nested check
    Takedown.audit(victims, Seq(
      Store("nb_model", nb, Map("idCol" -> "doc_id")),
      Store("cluster_state", "/tmp/td-alias-cs-absent")))
      .count() shouldBe 2L
    // scheme'd and scheme-less forms of ONE local directory collapse
    // too — "file:///x", "file:/x" and "/x" are the same root
    Seq(s"file://$nb", s"file:$nb").foreach { alias =>
      intercept[IllegalArgumentException] {
        Takedown.forget(victims, Seq(
          Store("nb_model", nb, Map("idCol" -> "doc_id")),
          Store("nb_model", alias, Map("idCol" -> "doc_id"))))
      }.getMessage should include("more than once")
    }
  }

  test("inParallel reports EVERY failing raw thunk: later failures " +
      "ride as suppressed on the first") {
    val boom1 = new RuntimeException("store A broken")
    val boom2 = new RuntimeException("store B broken")
    val e = intercept[RuntimeException] {
      Takedown.inParallel(Seq(1, 2, 3)) {
        case 1 => throw boom1
        case 2 => throw boom2
        case n => n
      }
    }
    e.getMessage shouldBe "store A broken"
    e.getSuppressed.map(_.getMessage).toSeq shouldBe Seq("store B broken")
    // sharing one exception instance must not trip self-suppression
    val shared = new RuntimeException("shared")
    intercept[RuntimeException] {
      Takedown.inParallel(Seq(1, 2))(_ => throw shared)
    }.getSuppressed shouldBe empty
  }

  test("table takedown consumes a LARGE victim frame as a join, " +
      "never a literal id list") {
    import spark.implicits._
    val base = tmp("bigvictims")
    spark.range(60000).select(col("id").as("doc_id"),
      (col("id") % 8).as("p"),
      concat(lit("t"), col("id")).as("text"))
      .write.partitionBy("p").parquet(s"$base/tbl")
    // 50k victim ids — an `isin`-literal plan would be pathological
    // here (a 50k-term predicate tree), a driver OOM at millions
    val bigVictims = spark.range(50000).select(col("id"))
    // the seam the delete executes: both sides must be broadcast joins
    // against the victim frame, with no inlined literal list (50k longs
    // ≈ 400 KB — far inside the default 10 MB broadcast threshold)
    val v = bigVictims.select(col("id").cast("long").as("__vid"))
    val (matches, keep) =
      graft.tables.Tables.victimDeletePlans("doc_id", v, 50000L)
    Seq(matches, keep).foreach { side =>
      val plan = side(spark.read.parquet(s"$base/tbl"))
        .queryExecution.executedPlan.toString
      plan should include("BroadcastHashJoin")
      (plan should not).include(" IN (")
    }
    // beyond broadcast range the hint is DROPPED: the optimizer plans a
    // shuffle join instead of materializing the victim set on the
    // driver (gate exercised by shrinking the session threshold so the
    // same 50k-id frame counts as beyond-range)
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(thresholdKey)
    val store = Seq(Store("table", s"$base/tbl",
      Map("idCol" -> "doc_id", "partitionCol" -> "p")))
    try {
      spark.conf.set(thresholdKey, "1024") // 1 KB → max 128 hinted ids
      val (m2, k2) =
        graft.tables.Tables.victimDeletePlans("doc_id", v, 50000L)
      Seq(m2, k2).foreach { side =>
        val plan = side(spark.read.parquet(s"$base/tbl"))
          .queryExecution.executedPlan.toString
        (plan should not).include("BroadcastHashJoin")
        (plan should not).include(" IN (")
      }
      // and the real orchestrated path deletes ROW-EXACTLY in the
      // shuffle-join regime (the executed delete below runs with the
      // shrunk threshold, i.e. the beyond-broadcast plan)
      Takedown.forget(bigVictims, store)
    } finally spark.conf.set(thresholdKey, saved)
    val tbl = spark.read.parquet(s"$base/tbl")
    tbl.count() shouldBe 10000L
    tbl.filter(col("doc_id") < 50000).count() shouldBe 0L
    Takedown.assertForgotten(bigVictims, store)
  }

  test("an id arriving with two distinct non-null texts refuses " +
      "upfront, before any store mutates") {
    val nb = tmp("conflict") + "/nb"
    Classifier.nbModelWrite(corpus, "doc_id", "text", nb)
    val before = sorted(
      Classifier.nbScoreFromModel(corpus, "doc_id", "text", nb))
    val conflicted = victims.union(
      victims.limit(1).withColumn("text", lit("a different text")))
    val e = intercept[IllegalArgumentException] {
      Takedown.forget(conflicted,
        Seq(Store("nb_model", nb, Map("idCol" -> "doc_id"))))
    }
    e.getMessage should include("more than one distinct")
    sorted(Classifier.nbScoreFromModel(corpus, "doc_id", "text", nb)) shouldBe
      before
  }

  test("id_text store still holding a NULL-text victim id reports " +
      "partial, never a silent deleted") {
    import spark.implicits._
    val base = tmp("nulltext")
    Classifier.nbModelWrite(corpus, "doc_id", "text", s"$base/nb")
    val store = Seq(Store("nb_model", s"$base/nb", Map("idCol" -> "doc_id")))
    // victim 1 rides with its exact text (unlearnable); victim 4
    // arrives text-less — the nb face cannot subtract its counts
    val vmix = victims.filter(col("id") === 1L)
      .union(Seq((4L, null.asInstanceOf[String])).toDF("id", "text"))
    val e = intercept[IllegalStateException] {
      Takedown.forget(vmix, store)
    }
    e.getMessage should include("NULL")
    // bestEffort reports the outcome row as partial (forget RAN — id 1
    // left the model — but the row must not claim the store is clean)
    val out = Takedown.forget(vmix, store, bestEffort = true)
    out.head().getString(2) shouldBe "partial"
    Takedown.audit(vmix.filter(col("id") === 1L), store)
      .head().getString(2) shouldBe "clean"
    Takedown.audit(vmix, store).head().getString(2) shouldBe "held"
    // carrying the exact text completes the takedown and clears partial
    val full = victims.filter(col("id") === 1L || col("id") === 4L)
    Takedown.forget(full, store)
      .head().getString(2) shouldBe "deleted"
    Takedown.assertForgotten(full, store)
  }

  test("outcome rows keep registry order under the concurrent walk") {
    // callers zip outcomes against their registry (and humans read the
    // report top-to-bottom) — concurrency must not shuffle the rows
    val base = tmp("order")
    val paths = (0 until 6).map(i => s"$base/nb$i")
    paths.foreach(p => Classifier.nbModelWrite(corpus, "doc_id", "text", p))
    val stores = paths.map(p =>
      Store("nb_model", p, Map("idCol" -> "doc_id")))
    Takedown.forget(victims, stores)
      .collect().map(_.getString(1)).toSeq shouldBe paths
    Takedown.audit(victims, stores)
      .collect().map(_.getString(1)).toSeq shouldBe paths
    Takedown.compactAll(spark, stores)
      .collect().map(_.getString(1)).toSeq shouldBe paths
  }

  test("a failing store does not stop the rest; failures are loud") {
    val base = tmp("fail")
    Classifier.nbModelWrite(corpus, "doc_id", "text", s"$base/nb")
    val stores = Seq(
      Store("bm25", s"$base/not-an-index", Map("idCol" -> "doc_id")),
      Store("nb_model", s"$base/nb", Map("idCol" -> "doc_id")))
    val e = intercept[IllegalStateException] {
      Takedown.forget(victims, stores)
    }
    e.getMessage should include("INCOMPLETE")
    e.getMessage should include("not-an-index")
    // the healthy store WAS processed despite the earlier failure
    sorted(Classifier.nbScoreFromModel(survivors, "doc_id", "text",
      s"$base/nb").select(col("doc_id"), round(col("nb_score"), 6))) shouldBe
      sorted(Classifier.naiveBayesQuality(survivors, "doc_id", "text")
        .select(col("doc_id"), round(col("nb_score"), 6)))
    // bestEffort: same attempt-all, reported instead of thrown
    // (the nb store tolerates re-delivery: double-delete is a no-op)
    val out = Takedown.forget(victims, stores, bestEffort = true)
      .collect().map(r => (r.getString(0), r.getString(2))).toSeq
    out should contain(("bm25", "failed"))
    out should contain(("nb_model", "deleted"))
  }
}
