package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private lazy val vecs = {
    import spark.implicits._
    // unit-ish vectors at varying angles from e1
    Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.99, 0.14, 0.0, 0.0)),
      (2L, Seq(0.7, 0.7, 0.0, 0.0)),
      (3L, Seq(0.0, 1.0, 0.0, 0.0)),
      (4L, Seq(-1.0, 0.0, 0.0, 0.0)),
      (5L, Seq(0.9, -0.43, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
  }

  test("bruteForceTopK ranks by cosine desc and limits to k") {
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val r = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 3)
      .collect().map(_.getLong(0))
    r.head shouldBe 0L      // the query vector itself
    r.length shouldBe 3
    r(1) shouldBe 1L        // closest neighbor
  }

  test("annTopK with wide probe matches brute force top result") {
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val ann = Similarity.annTopK(vecs, "vec_id", "embedding", q, k = 3,
      dim = 4, nBits = 8, probeHamming = 8) // probe all buckets = exact
    ann.collect().map(_.getLong(0)).toSeq shouldBe
      Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 3)
        .collect().map(_.getLong(0)).toSeq
  }

  test("ivfTopK with all cells probed equals brute force") {
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val ivf = Similarity.ivfTopK(vecs, "vec_id", "embedding", q, k = 3,
      dim = 4, nBits = 2, nProbe = 4) // 2^2 cells, probe all
    ivf.collect().map(_.getLong(0)).toSeq shouldBe
      Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 3)
        .collect().map(_.getLong(0)).toSeq
  }

  test("ivfTopK with narrow probe still finds the query's own cell") {
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val r = Similarity.ivfTopK(vecs, "vec_id", "embedding", q, k = 1,
      dim = 4, nBits = 2, nProbe = 1).collect()
    r.head.getLong(0) shouldBe 0L
  }

  test("ivfTopK Lloyd training: all cells probed still equals brute force") {
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    // after training, cells are indices 0..m-1; probing them all must
    // remain exhaustive regardless of how reassignment moved vectors
    val ivf = Similarity.ivfTopK(vecs, "vec_id", "embedding", q, k = 3,
      dim = 4, nBits = 2, nProbe = 4, lloydIters = 2)
    ivf.collect().map(_.getLong(0)).toSeq shouldBe
      Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 3)
        .collect().map(_.getLong(0)).toSeq
  }

  test("ivfTopK Lloyd training adapts cells: one probe finds a cluster LSH splits") {
    import spark.implicits._
    // two tight clusters around +e1 and +e2, each straddling a random
    // hyperplane: raw LSH cells cut through the clusters, but one k-means
    // iteration pulls each cluster into a single cell
    val cluster1 = (0L until 20L).map(i =>
      (i, Seq(1.0, 0.002 * i - 0.02, 0.001 * i, 0.0)))
    val cluster2 = (20L until 40L).map(i =>
      (i, Seq(0.002 * i - 0.06, 1.0, 0.0, 0.001 * i)))
    val df = (cluster1 ++ cluster2).toDF("vec_id", "embedding")
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val trained = Similarity.ivfTopK(df, "vec_id", "embedding", q, k = 10,
      dim = 4, nBits = 3, nProbe = 1, lloydIters = 2)
      .collect().map(_.getLong(0)).toSet
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    // one trained probe recovers the full exact top-10 (all in cluster 1)
    trained shouldBe exact
  }

  test("neighborsWithinBuckets returns at most k per id, ranked") {
    val r = Similarity.neighborsWithinBuckets(vecs, "vec_id", "embedding",
      dim = 4, k = 2, nBits = 2)
    val byA = r.collect().groupBy(_.getAs[Long]("id_a"))
    byA.values.foreach { rowsOfA =>
      rowsOfA.length should be <= 2
      rowsOfA.map(_.getAs[Int]("rank")).sorted shouldBe (1 to rowsOfA.length)
    }
  }

  test("neighborsWithinBuckets cosines are never better than brute force") {
    // spot-verify vs the exact answer: each reported neighbor's cosine is
    // a genuine pairwise cosine, so an id's rank-1 within-bucket neighbor
    // cannot beat its true (global) best neighbor
    val r = Similarity.neighborsWithinBuckets(vecs, "vec_id", "embedding",
      dim = 4, k = 1, nBits = 2).collect()
    r should not be empty
    r.foreach { row =>
      val id = row.getAs[Long]("id_a")
      val q = vecs.filter(col("vec_id") === id)
        .select(col("embedding")).head().getSeq[Double](0)
      val best = Similarity.bruteForceTopK(
        vecs.filter(col("vec_id") =!= id), "vec_id", "embedding", q, 1)
        .head().getDouble(1)
      row.getAs[Double]("cosine") should be <= best + 1e-9
    }
  }

  test("persisted LSH index: bucket filter prunes partitions before any file read") {
    // the documented 100 TB ANN story: write the corpus partitioned by
    // its hyperplane bucket, and a probe's bucket predicate prunes whole
    // directories (PartitionFilters), not rows
    import graft.functions.{VectorFunctions => V}
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-annidx").toString
    val bucketed = vecs.select(col("vec_id"), col("embedding"),
      V.hyperplaneLshBucket(col("embedding"), 2, 4).as("bucket"))
    graft.tables.Tables.writePartitioned(bucketed, s"$dir/idx", Seq("bucket"))
    val probe = spark.read.parquet(s"$dir/idx").filter(col("bucket") === 1L)
    val scan = probe.queryExecution.executedPlan.toString
    scan should include("PartitionFilters")
    scan should include("bucket")
    // and the probe still returns exactly the rows of that bucket
    probe.count() shouldBe bucketed.filter(col("bucket") === 1L).count()
  }

  test("persisted trained-IVF index: probe prunes cell partitions, matches direct") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfidx").toString
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    Similarity.ivfWriteIndex(vecs, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1)
    // centroids table is driver-small: <= 2^nBits rows
    spark.read.parquet(s"$dir/centroids").count() should be <= 4L
    val fromIdx = Similarity.ivfTopKFromIndex(spark, dir, "vec_id", q,
      k = 3, nProbe = 4)
    // probing all cells from the index equals the direct trained path
    fromIdx.collect().map(_.getLong(0)).toSeq shouldBe
      Similarity.ivfTopK(vecs, "vec_id", "embedding", q, k = 3,
        dim = 4, nBits = 2, nProbe = 4, lloydIters = 1)
        .collect().map(_.getLong(0)).toSeq
    // a narrow probe prunes whole cell directories before any file read
    val narrow = Similarity.ivfTopKFromIndex(spark, dir, "vec_id", q,
      k = 1, nProbe = 1)
    val scan = narrow.queryExecution.executedPlan.toString
    scan should include("PartitionFilters")
    scan should include("cell")
    narrow.collect().head.getLong(0) shouldBe 0L
  }

  test("IVF-SQ8 index: same probe results as flat, ~4x smaller on real embeddings") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfsq8-t").toString
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    Similarity.ivfWriteIndex(vecs, "vec_id", "embedding", dim = 4,
      path = s"$dir/flat", nBits = 2, lloydIters = 1)
    Similarity.ivfWriteIndexSQ8(vecs, "vec_id", "embedding", dim = 4,
      path = s"$dir/sq8", nBits = 2, lloydIters = 1)
    // identical probe plan and, on this corpus, identical results —
    // quantization error is far below the fixture's cosine gaps
    val sq = Similarity.ivfTopKFromIndexSQ8(spark, s"$dir/sq8", "vec_id", q,
      k = 3, nProbe = 4)
    sq.collect().map(_.getLong(0)).toSeq shouldBe
      Similarity.ivfTopKFromIndex(spark, s"$dir/flat", "vec_id", q,
        k = 3, nProbe = 4).collect().map(_.getLong(0)).toSeq
    // partition pruning survives quantization
    val scan = Similarity.ivfTopKFromIndexSQ8(spark, s"$dir/sq8", "vec_id", q,
      k = 1, nProbe = 1).queryExecution.executedPlan.toString
    scan should include("PartitionFilters")
    scan should include("cell")
    // the size claim needs real float32 vectors (the 6-row fixture is
    // all parquet footer): 500 × 64-float rows from the test dataset.
    // nBits=2 keeps 4 cells → ~125 rows per file, so per-file footer
    // overhead (~1 KB, constant) doesn't mask the payload ratio the way
    // it would at 16 tiny cells; at production file sizes footers vanish
    // entirely and the ratio is the logical 4×.
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
    Similarity.ivfWriteIndex(emb, "vec_id", "embedding", dim = 64,
      path = s"$dir/eflat", nBits = 2, lloydIters = 0)
    Similarity.ivfWriteIndexSQ8(emb, "vec_id", "embedding", dim = 64,
      path = s"$dir/esq8", nBits = 2, lloydIters = 0)
    def cellBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.startsWith("part-")) f.length else 0L
      walk(new java.io.File(s"$p/cells"))
    }
    val ratio = cellBytes(s"$dir/eflat").toDouble / cellBytes(s"$dir/esq8")
    // the VECTOR payload is exactly 4× (256 B float32 → 64 B codes);
    // parquet's per-row binary length prefix, the 4 B scale, and the
    // shared id column cap the measured file-level ratio at ~3.2× for
    // dim=64 (it approaches 4× as dim grows)
    ratio should be >= 3.0
  }

  test("IVF-PQ index: layout, pruned probe, ADC ranking, deep compression") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-t").toString
    Similarity.ivfWriteIndexPQ(vecs, "vec_id", "embedding", dim = 4,
      path = s"$dir/pq", nBits = 2, lloydIters = 1, m = 2, codebookK = 3,
      pqIters = 2)
    // layout: m·k codebook rows, codes are exactly m packed bytes
    spark.read.parquet(s"$dir/pq/pqmodel").count() shouldBe 6
    spark.read.parquet(s"$dir/pq/cells").collect()
      .foreach(r => r.getAs[Array[Byte]]("codes").length shouldBe 2)
    // ADC probe: the e1-adjacent rows outrank the orthogonal/opposite
    // ones even from the reconstructed codes
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val got = Similarity.ivfTopKFromIndexPQ(spark, s"$dir/pq", "vec_id", q,
      k = 3, nProbe = 4).collect().map(_.getLong(0)).toSet
    got should contain(0L)
    got should not contain 4L // the antipode can never rank top-3
    // partition pruning survives PQ storage
    val scan = Similarity.ivfTopKFromIndexPQ(spark, s"$dir/pq", "vec_id", q,
      k = 1, nProbe = 1).queryExecution.executedPlan.toString
    scan should include("PartitionFilters")
    scan should include("cell")
    // deep-compression claim on real float32 embeddings (same fixture
    // discipline as the SQ8 size test): m=8 codes = 8 B/vector vs
    // 256 B float32 — the id column, parquet binary length prefixes,
    // and footers cap the measured file-level ratio well below the
    // 32× payload ratio, but it must clear SQ8's ~3.2× by a wide margin
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
    Similarity.ivfWriteIndex(emb, "vec_id", "embedding", dim = 64,
      path = s"$dir/eflat", nBits = 2, lloydIters = 0)
    Similarity.ivfWriteIndexPQ(emb, "vec_id", "embedding", dim = 64,
      path = s"$dir/epq", nBits = 2, lloydIters = 0, m = 8, codebookK = 16,
      pqIters = 1)
    def cellBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.startsWith("part-")) f.length else 0L
      walk(new java.io.File(s"$p/cells"))
    }
    val ratio = cellBytes(s"$dir/eflat").toDouble / cellBytes(s"$dir/epq")
    ratio should be >= 8.0
  }

  test("filtered probe: in-cell predicate returns k rows from the FILTERED subset") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivffilt").toString
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    Similarity.ivfWriteIndexSQ8(vecs, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1)
    // predicate keeps the odd ids only; the unfiltered top-1 (id 0, the
    // query itself) is excluded, so a POST-filter of the unfiltered
    // top-2 would return fewer than 2 rows — the in-cell filter must
    // still return exactly k=2, equal to brute force over the subset
    val got = Similarity.ivfTopKFromIndexSQ8(spark, dir, "vec_id", q,
      k = 2, nProbe = 4, rowFilter = _.filter(col("vec_id") % 2 === 1))
      .collect().map(_.getLong(0)).toSeq
    got shouldBe Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", q, 2)
      .collect().map(_.getLong(0)).toSeq
    got.length shouldBe 2
    all(got.map(_ % 2)) shouldBe 1L
    // allowed-id frame shape (metadata predicate route): semi-join
    // against a broadcast id list gives the same result
    import spark.implicits._
    val allowed = Seq(1L, 3L, 5L).toDF("vec_id")
    Similarity.ivfTopKFromIndexSQ8(spark, dir, "vec_id", q, k = 2,
      nProbe = 4, rowFilter =
        _.join(broadcast(allowed), Seq("vec_id"), "left_semi"))
      .collect().map(_.getLong(0)).toSeq shouldBe got
    // the join face honors the same filter: per-query results equal the
    // filtered point probes
    val queries = vecs.filter(col("vec_id") < 2)
    val joined = Similarity.ivfTopKJoinSQ8(queries, "vec_id", "embedding",
      dir, "vec_id", k = 2, nProbe = 4,
      rowFilter = _.filter(col("vec_id") % 2 === 1))
      .collect().groupBy(_.getLong(0))
    queries.collect().map(r => (r.getLong(0), r.getSeq[Double](1))).foreach {
      case (qid, qv) =>
        joined(qid).sortBy(_.getInt(3)).map(_.getLong(1)).toSeq shouldBe
          Similarity.ivfTopKFromIndexSQ8(spark, dir, "vec_id", qv, k = 2,
            nProbe = 4, rowFilter = _.filter(col("vec_id") % 2 === 1))
            .collect().map(_.getLong(0)).toSeq
    }
  }

  test("ivfAppendPQ: frozen-model encode, appended rows visible to probes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-app").toString
    val base = vecs.filter(col("vec_id") < 4)
    val delta = vecs.filter(col("vec_id") >= 4)
    Similarity.ivfWriteIndexPQ(base, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1, m = 2, codebookK = 3,
      pqIters = 2)
    Similarity.ivfAppendPQ(delta, "vec_id", "embedding", dir)
    val cells = spark.read.parquet(s"$dir/cells")
    cells.count() shouldBe 6
    // frozen-model contract: stored appended codes equal a fresh encode
    // of the same rows against the persisted model, byte for byte
    val model = spark.read.parquet(s"$dir/pqmodel")
    val direct = Embeddings.pqEncode(delta, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val stored = cells.filter(col("vec_id") >= 4).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Array[Byte]]("codes").map(_.toInt).toList).toMap
    stored shouldBe direct
    // appended rows are reachable by an exhaustive probe
    val ids = Similarity.ivfTopKFromIndexPQ(spark, dir, "vec_id",
      Seq(1.0, 0.0, 0.0, 0.0), k = 6, nProbe = 4)
      .collect().map(_.getLong(0)).toSet
    ids should contain allOf (4L, 5L)
  }

  test("PQ refine tier: SQ8 re-rank of the ADC shortlist, appends keep the tier") {
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpqr").toString
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    Similarity.ivfWriteIndexPQ(emb, "vec_id", "embedding", dim = 64,
      path = s"$dir/r", nBits = 4, lloydIters = 0, m = 16, codebookK = 32,
      pqIters = 1, kernel = "md5", withRefine = true)
    // the cells carry BOTH tiers: m-byte codes + SQ8 payload
    val cells = spark.read.parquet(s"$dir/r/cells")
    cells.schema.fieldNames should contain allOf ("codes", "q", "scale")
    // with every cell probed and the whole corpus shortlisted, the
    // refine probe degenerates to the SQ8 rank — which on this corpus
    // matches the exact brute-force order (the ivfTopKFromIndexSQ8
    // fidelity)
    val n = emb.count().toInt
    val refined = Similarity.ivfTopKFromIndexPQRefine(spark, s"$dir/r",
      "vec_id", q, k = 5, nProbe = 16, refineFactor = n)
      .collect().map(_.getLong(0)).toSeq
    refined shouldBe Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      q, 5).collect().map(_.getLong(0)).toSeq
    // a NARROW shortlist can only contain ADC-ranked survivors: the
    // refine output is always a subset of the shortlist
    val shortIds = Similarity.ivfTopKFromIndexPQ(spark, s"$dir/r",
      "vec_id", q, k = 10, nProbe = 2).collect().map(_.getLong(0)).toSet
    val narrow = Similarity.ivfTopKFromIndexPQRefine(spark, s"$dir/r",
      "vec_id", q, k = 5, nProbe = 2, refineFactor = 2)
      .collect().map(_.getLong(0)).toSet
    narrow.subsetOf(shortIds) shouldBe true
    // append sniffs the refine tier from the cells schema and keeps it
    Similarity.ivfAppendPQ(
      emb.select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
        .limit(3), "vec_id", "embedding", s"$dir/r")
    val appended = spark.read.parquet(s"$dir/r/cells")
      .filter(col("vec_id") >= 100000)
    appended.count() shouldBe 3
    appended.schema.fieldNames should contain allOf ("codes", "q", "scale")
    appended.filter(col("q").isNull || col("scale").isNull).count() shouldBe 0
    // a plain (no-refine) index refuses the refine probe loudly
    Similarity.ivfWriteIndexPQ(emb.limit(50), "vec_id", "embedding",
      dim = 64, path = s"$dir/plain", nBits = 4, lloydIters = 0, m = 16,
      codebookK = 32, pqIters = 1, kernel = "md5")
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfTopKFromIndexPQRefine(spark, s"$dir/plain", "vec_id",
        q, k = 5)
    }
    err.getMessage should include("withRefine")
  }

  test("ivfPqTopKJoin: per-query results equal per-query point probes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpqj").toString
    Similarity.ivfWriteIndexPQ(vecs, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1, m = 2, codebookK = 3,
      pqIters = 2)
    val joined = Similarity.ivfPqTopKJoin(vecs, "vec_id", "embedding", dir,
      "vec_id", k = 3, nProbe = 4)
      .collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Long]("id"), r.getAs[Double]("cosine"))).toSeq)
      .toMap
    joined.keySet shouldBe (0L to 5L).toSet
    vecs.collect().foreach { row =>
      val id = row.getLong(0)
      val q = row.getSeq[Double](1)
      val point = Similarity.ivfTopKFromIndexPQ(spark, dir, "vec_id", q,
        k = 3, nProbe = 4).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      joined(id) shouldBe point
    }
  }

  test("ivfTopKJoin: per-query results equal per-query ivfTopKFromIndex probes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfjoin").toString
    Similarity.ivfWriteIndex(vecs, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1)
    // the corpus itself as the query batch — every row probed at once
    val joined = Similarity.ivfTopKJoin(vecs, "vec_id", "embedding", dir,
      "vec_id", k = 3, nProbe = 4)
      .collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Long]("id"), r.getAs[Double]("cosine"))).toSeq)
      .toMap
    joined.keySet shouldBe (0L to 5L).toSet
    vecs.collect().foreach { row =>
      val id = row.getLong(0)
      val q = row.getSeq[Double](1)
      val point = Similarity.ivfTopKFromIndex(spark, dir, "vec_id", q,
        k = 3, nProbe = 4).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      joined(id) shouldBe point
    }
  }

  test("ivfTopKJoin shuffle branch (broadcastQueries=false) matches broadcast branch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfjoin-sh").toString
    Similarity.ivfWriteIndex(vecs, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1)
    def run(bcast: Boolean) =
      Similarity.ivfTopKJoin(vecs, "vec_id", "embedding", dir, "vec_id",
        k = 3, nProbe = 4, broadcastQueries = bcast)
        .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    run(false) shouldBe run(true)
    // at scale (auto-broadcast off — the 100 TB regime where neither side
    // fits a broadcast) the false branch really does shuffle on cell
    // while the true branch's explicit hint still broadcasts
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      run(false) shouldBe run(true)
      val shufflePlan = Similarity.ivfTopKJoin(vecs, "vec_id", "embedding",
        dir, "vec_id", k = 3, nProbe = 4, broadcastQueries = false)
        .queryExecution.executedPlan.toString
      shufflePlan should not include "BroadcastHashJoin"
      val bcastPlan = Similarity.ivfTopKJoin(vecs, "vec_id", "embedding",
        dir, "vec_id", k = 3, nProbe = 4, broadcastQueries = true)
        .queryExecution.executedPlan.toString
      bcastPlan should include("BroadcastHashJoin")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ivfTopKJoin excludeSelf drops the query's own corpus row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfjoin-xs").toString
    Similarity.ivfWriteIndex(vecs, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1)
    val r = Similarity.ivfTopKJoin(vecs, "vec_id", "embedding", dir,
      "vec_id", k = 3, nProbe = 4, excludeSelf = true).collect()
    r should not be empty
    r.foreach { row =>
      row.getAs[Long]("id") should not be row.getAs[Long]("q_id")
    }
    // rank-1 neighbor of id 0 is its nearest OTHER vector (id 1)
    r.filter(w => w.getAs[Long]("q_id") == 0L && w.getAs[Int]("rank") == 1)
      .head.getAs[Long]("id") shouldBe 1L
  }

  test("ivfTopKJoinSQ8 matches the flat join on this corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfjoin-sq").toString
    Similarity.ivfWriteIndex(vecs, "vec_id", "embedding", dim = 4,
      path = s"$dir/flat", nBits = 2, lloydIters = 1)
    Similarity.ivfWriteIndexSQ8(vecs, "vec_id", "embedding", dim = 4,
      path = s"$dir/sq8", nBits = 2, lloydIters = 1)
    // quantization error is far below the fixture's cosine gaps, so the
    // returned id sets and ranks agree (cosines differ in late decimals)
    def ids(r: org.apache.spark.sql.DataFrame) =
      r.orderBy("q_id", "rank").collect()
        .map(w => (w.getAs[Long]("q_id"), w.getAs[Long]("id"),
          w.getAs[Int]("rank"))).toSeq
    ids(Similarity.ivfTopKJoinSQ8(vecs, "vec_id", "embedding", s"$dir/sq8",
      "vec_id", k = 3, nProbe = 4)) shouldBe
      ids(Similarity.ivfTopKJoin(vecs, "vec_id", "embedding", s"$dir/flat",
        "vec_id", k = 3, nProbe = 4))
  }

  test("ivfPqTopKJoin narrow probe prunes cell partitions before any file read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-pr").toString
    Similarity.ivfWriteIndexPQ(vecs, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1, m = 2, codebookK = 3,
      pqIters = 2)
    import spark.implicits._
    val oneQ = Seq((0L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val narrow = Similarity.ivfPqTopKJoin(oneQ, "vec_id", "embedding", dir,
      "vec_id", k = 1, nProbe = 1)
    val scan = narrow.queryExecution.executedPlan.toString
    scan should include("PartitionFilters")
    scan should include("cell")
    narrow.collect().head.getAs[Long]("id") shouldBe 0L
  }

  test("ivfTopKJoin narrow probe prunes cell partitions before any file read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfjoin-pr").toString
    Similarity.ivfWriteIndex(vecs, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1)
    import spark.implicits._
    val oneQ = Seq((0L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val narrow = Similarity.ivfTopKJoin(oneQ, "vec_id", "embedding", dir,
      "vec_id", k = 1, nProbe = 1)
    val scan = narrow.queryExecution.executedPlan.toString
    scan should include("PartitionFilters")
    scan should include("cell")
    narrow.collect().head.getAs[Long]("id") shouldBe 0L
  }

  test("ivfAppend: appended rows are findable and assignments match a rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfapp").toString
    import spark.implicits._
    val base = vecs.filter(col("vec_id") <= 3L)
    val extra = Seq(
      (6L, Seq(1.0, 0.01, 0.0, 0.0)),   // hugs e1 — lands in 0's cell
      (7L, Seq(0.01, 1.0, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    Similarity.ivfWriteIndex(base, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1)
    Similarity.ivfAppend(extra, "vec_id", "embedding", dir)
    // appended vector findable under the narrowest probe: its cell is the
    // one whose centroid is nearest e1 — the same cell the e1 query probes
    val r = Similarity.ivfTopKFromIndex(spark, dir,
      "vec_id", Seq(1.0, 0.005, 0.0, 0.0), k = 2, nProbe = 1)
      .collect().map(_.getLong(0)).toSet
    r should contain(6L)
    // frozen-quantizer assignment = nearest-centroid rule: every appended
    // row's stored cell is the argmax-cosine centroid of the ORIGINAL index
    val cents = spark.read.parquet(s"$dir/centroids")
      .collect().map(w => w.getLong(0) -> w.getSeq[Double](1))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val d = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (d == 0.0) 0.0 else dot / d
    }
    val stored = spark.read.parquet(s"$dir/cells")
      .filter(col("vec_id") >= 6L)
      // partition-column discovery infers cell as int — cast for getLong
      .select(col("vec_id"), col("cell").cast("long")).collect()
      .map(w => w.getLong(0) -> w.getLong(1)).toMap
    stored.keySet shouldBe Set(6L, 7L)
    extra.collect().foreach { row =>
      val expect = cents.maxBy { case (_, c) => cos(c, row.getSeq[Double](1)) }._1
      stored(row.getLong(0)) shouldBe expect
    }
  }

  test("ivfAppend then probe equals full rebuild then probe (exhaustive probe)") {
    // append freezes the quantizer while a rebuild retrains it, so cell
    // BOUNDARIES differ — but an exhaustive probe is assignment-blind:
    // both index states must rank the identical row set identically
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfapp-rb").toString
    import spark.implicits._
    val base = vecs.filter(col("vec_id") <= 3L)
    val extra = Seq(
      (6L, Seq(1.0, 0.01, 0.0, 0.0)),
      (7L, Seq(0.01, 1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    Similarity.ivfWriteIndex(base, "vec_id", "embedding", dim = 4,
      path = s"$dir/app", nBits = 2, lloydIters = 1)
    Similarity.ivfAppend(extra, "vec_id", "embedding", s"$dir/app")
    Similarity.ivfWriteIndex(base.unionByName(extra), "vec_id", "embedding",
      dim = 4, path = s"$dir/rebuild", nBits = 2, lloydIters = 1)
    val q = Seq(1.0, 0.005, 0.0, 0.0)
    Similarity.ivfTopKFromIndex(spark, s"$dir/app", "vec_id", q,
      k = 6, nProbe = 4).collect().map(_.toSeq).toSeq shouldBe
      Similarity.ivfTopKFromIndex(spark, s"$dir/rebuild", "vec_id", q,
        k = 6, nProbe = 4).collect().map(_.toSeq).toSeq
  }

  test("ivfAppendSQ8: appended rows probe identically to a built SQ8 index") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfapp-sq").toString
    import spark.implicits._
    val base = vecs.filter(col("vec_id") <= 3L)
    val extra = Seq(
      (6L, Seq(1.0, 0.01, 0.0, 0.0)),
      (7L, Seq(0.01, 1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    Similarity.ivfWriteIndexSQ8(base, "vec_id", "embedding", dim = 4,
      path = s"$dir/app", nBits = 2, lloydIters = 1)
    Similarity.ivfAppendSQ8(extra, "vec_id", "embedding", s"$dir/app")
    // flat twin with the same frozen quantizer and the same rows
    Similarity.ivfWriteIndex(base, "vec_id", "embedding", dim = 4,
      path = s"$dir/flat", nBits = 2, lloydIters = 1)
    Similarity.ivfAppend(extra, "vec_id", "embedding", s"$dir/flat")
    // query near the APPENDED vector 6, far from everything else — its
    // cosine gaps dwarf quantization error (a query equidistant from 0
    // and 6 would legitimately reorder that near-tie under int8)
    val q = Seq(1.0, 0.012, 0.0, 0.0)
    Similarity.ivfTopKFromIndexSQ8(spark, s"$dir/app", "vec_id", q,
      k = 6, nProbe = 4).collect().map(_.getLong(0)).toSeq shouldBe
      Similarity.ivfTopKFromIndex(spark, s"$dir/flat", "vec_id", q,
        k = 6, nProbe = 4).collect().map(_.getLong(0)).toSeq
    // schema parity: appended rows carry the same (scale, q) shape the
    // build writes — a probe cannot tell them apart
    val cells = spark.read.parquet(s"$dir/app/cells")
    cells.columns.toSet shouldBe Set("vec_id", "scale", "q", "cell")
    cells.count() shouldBe 6
  }

  test("ivfAppend is not confused by an unrelated input column named v") {
    // the ADVICE-flagged lateral-alias hazard: assignment must read the
    // embedding column, never an input column that happens to be named "v"
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfapp-v").toString
    import spark.implicits._
    val base = vecs.filter(col("vec_id") <= 3L)
    Similarity.ivfWriteIndex(base, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1)
    val decoy = Seq((8L, Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 0.0, 0.0, 1.0)))
      .toDF("vec_id", "embedding", "v")
    Similarity.ivfAppend(decoy, "vec_id", "embedding", dir)
    val cents = spark.read.parquet(s"$dir/centroids")
      .collect().map(w => w.getLong(0) -> w.getSeq[Double](1))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val d = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (d == 0.0) 0.0 else dot / d
    }
    val expect = cents.maxBy { case (_, c) => cos(c, Seq(1.0, 0.0, 0.0, 0.0)) }._1
    spark.read.parquet(s"$dir/cells").filter(col("vec_id") === 8L)
      .head().getAs[Long]("cell") shouldBe expect
  }

  test("marginMine pairs matched vectors and deflates dense-region impostors") {
    import spark.implicits._
    // three src vectors, each with one true match in dst; dst also has
    // a dense decoy cluster near src 0 — raw cosine alone would pair
    // src 0 with any decoy, the margin normalizes it away
    val src = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)),
      (4L, Seq(0.0, 0.0, 1.0, 0.0))).toDF("vec_id", "v")
    val dst = Seq(
      (101L, Seq(0.99, 0.14, 0.0, 0.0)),   // match for 0
      (103L, Seq(0.14, 0.99, 0.0, 0.0)),   // match for 2
      (105L, Seq(0.0, 0.14, 0.99, 0.0)),   // match for 4
      (107L, Seq(0.97, 0.24, 0.0, 0.0)),   // decoys crowding src 0's
      (109L, Seq(0.97, 0.23, 0.01, 0.0))   // region
    ).toDF("vec_id", "v")
    val fwd = Similarity.knnJoinExactBipartite(src, "vec_id", "v",
      dst, "vec_id", "v", dim = 4, k = 3)
    // the bipartite face emits the ivf-join shape
    fwd.columns.toSeq shouldBe Seq("q_id", "id", "cosine", "rank")
    val bwd = Similarity.knnJoinExactBipartite(dst, "vec_id", "v",
      src, "vec_id", "v", dim = 4, k = 3)
    val mined = Similarity.marginMine(fwd, bwd, threshold = 1.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // mutual-best: each src pairs with its true match, decoys lose —
    // src 0's neighborhood is dense (101/107/109 all close), so the
    // margin denominator discounts the crowd
    mined(0L) shouldBe 101L
    mined(2L) shouldBe 103L
    mined(4L) shouldBe 105L
    mined.size shouldBe 3
    // margins of matched isolated pairs exceed the crowded pair's
    val margins = Similarity.marginMine(fwd, bwd, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    margins(2L) should be > margins(0L)
  }

  test("marginMine composes with the persisted-index joins (the corpus-scale path)") {
    import spark.implicits._
    // the documented scale composition: directional top-k lists from
    // ivfTopKJoinSQ8 against each side's persisted index — at wide
    // probes on this corpus the lists equal the exact ones, so the
    // mined pairs must match the exact-face output bit-for-bit
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(120).localCheckpoint(true)
    val src = emb.filter(col("vec_id") % 2 === 0)
    val dst = emb.filter(col("vec_id") % 2 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-btm").toString
    Similarity.ivfWriteIndexSQ8(src, "vec_id", "embedding", dim = 64,
      path = s"$dir/src", nBits = 2, lloydIters = 1)
    Similarity.ivfWriteIndexSQ8(dst, "vec_id", "embedding", dim = 64,
      path = s"$dir/dst", nBits = 2, lloydIters = 1)
    val fwd = Similarity.ivfTopKJoinSQ8(src, "vec_id", "embedding",
      s"$dir/dst", "vec_id", k = 4, nProbe = 4)
    val bwd = Similarity.ivfTopKJoinSQ8(dst, "vec_id", "embedding",
      s"$dir/src", "vec_id", k = 4, nProbe = 4)
    def mined(f: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      Similarity.marginMine(f, b, threshold = 1.0)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val viaIndex = mined(fwd, bwd)
    val exact = mined(
      Similarity.knnJoinExactBipartite(src, "vec_id", "embedding",
        dst, "vec_id", "embedding", dim = 64, k = 4),
      Similarity.knnJoinExactBipartite(dst, "vec_id", "embedding",
        src, "vec_id", "embedding", dim = 64, k = 4))
    viaIndex should not be empty
    // identical PAIRS; margins agree to the SQ8 fidelity (cosines are
    // computed on dequantized vectors, ≤ scale/254 per component, so
    // values drift in the 4th decimal while the ranking holds)
    viaIndex.keySet shouldBe exact.keySet
    exact.foreach { case (pair, m) =>
      viaIndex(pair) shouldBe (m +- 0.01)
    }
  }

  test("knnOutlierScores: the isolated vector scores most outlying") {
    import spark.implicits._
    // a tight cluster around e1 plus one isolated vector near -e1: its
    // 2nd neighbor is far (low cosine), the cluster's are close
    val rnd = new scala.util.Random(17)
    val cluster = (0L until 6L).map(i =>
      i -> Seq(1.0 + rnd.nextDouble() * 0.01, rnd.nextDouble() * 0.01, 0.0, 0.0))
    val df = (cluster :+ (9L -> Seq(-1.0, 0.05, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val got = Similarity.knnOutlierScores(df, "vec_id", "embedding",
      dim = 4, k = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.size shouldBe 7
    val worst = got.minBy(_._2)
    worst._1 shouldBe 9L
    cluster.foreach { case (id, _) => got(id) should be > 0.99 }
  }

  test("knnJoinExact: per-id top-k equals bruteForceTopK per id") {
    val r = Similarity.knnJoinExact(vecs, "vec_id", "embedding", dim = 4, k = 2)
      .collect()
      .groupBy(_.getAs[Long]("id_a"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("id_b")).toSeq)
      .toMap
    r.keySet shouldBe (0L to 5L).toSet
    vecs.collect().foreach { row =>
      val id = row.getLong(0)
      val q = row.getSeq[Double](1)
      val expect = Similarity.bruteForceTopK(
        vecs.filter(col("vec_id") =!= id), "vec_id", "embedding", q, 2)
        .collect().map(_.getLong(0)).toSeq
      r(id) shouldBe expect
    }
  }

  test("knnJoinExact plan is one narrow pass — no join rows, no shuffle") {
    val plan = Similarity.knnJoinExact(vecs, "vec_id", "embedding", dim = 4, k = 2)
      .queryExecution.executedPlan.toString
    plan should include("MapPartitions")
    plan should not include "Exchange"
    plan should not include "Join"
  }

  test("neighborsWithinBuckets top-k reuses the bucket join partitioning") {
    // the (bucket, id) window must NOT reshuffle by id: each id lives in
    // one bucket, so hash(bucket) from the shuffled join already clusters
    // the window's keys. With broadcast disabled (the at-scale shape),
    // every Exchange in the plan partitions on bucket alone.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Similarity.neighborsWithinBuckets(vecs, "vec_id", "embedding",
        dim = 4, k = 2, nBits = 2).queryExecution.executedPlan.toString
      plan should include("Window")
      val partitionings = "hashpartitioning\\(([^)]*)\\)".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      partitionings should not be empty
      partitionings.foreach { keys =>
        keys should include("bucket")
        keys should not include "id_a"
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ivfPqTopKJoinRefine equals the point refine probe per query") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpqjr").toString
    Similarity.ivfWriteIndexPQ(vecs, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 0, m = 2, codebookK = 4,
      pqIters = 1, kernel = "md5", withRefine = true)
    val joined = Similarity.ivfPqTopKJoinRefine(vecs, "vec_id", "embedding",
      dir, "vec_id", k = 2, nProbe = 4, refineFactor = 2)
      .collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(w => (w.getAs[Long]("id"), w.getAs[Double]("cosine"))).toSeq)
      .toMap
    joined.keySet shouldBe (0L to 5L).toSet
    // with every cell probed, each query's joined answer must equal the
    // single-vector refine probe over the same index
    vecs.collect().foreach { row =>
      val q = row.getSeq[Double](1)
      val point = Similarity.ivfTopKFromIndexPQRefine(spark, dir, "vec_id",
        q, k = 2, nProbe = 4, refineFactor = 2)
        .collect().map(w => (w.getLong(0), w.getDouble(1))).toSeq
      joined(row.getLong(0)) shouldBe point
    }
  }

  test("ivfPqTopKJoinRefine fails loudly without the refine tier") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpqjr-no").toString
    Similarity.ivfWriteIndexPQ(vecs, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 0, m = 2, codebookK = 4,
      pqIters = 1, kernel = "md5", withRefine = false)
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKJoinRefine(vecs, "vec_id", "embedding", dir,
        "vec_id", k = 2)
    }
    e.getMessage should include("withRefine")
  }

  test("ivfPqTopKJoinRefine excludeSelf drops only the self match") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpqjr-xs").toString
    Similarity.ivfWriteIndexPQ(vecs, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 0, m = 2, codebookK = 4,
      pqIters = 1, kernel = "md5", withRefine = true)
    val r = Similarity.ivfPqTopKJoinRefine(vecs, "vec_id", "embedding",
      dir, "vec_id", k = 3, nProbe = 4, refineFactor = 2,
      excludeSelf = true).collect()
    r.foreach(w => w.getAs[Long]("id") should not be w.getAs[Long]("q_id"))
    r.map(_.getAs[Long]("q_id")).distinct.length shouldBe 6
  }

  test("marginMine canonicalizes an asymmetrically-scored pair to its higher cosine") {
    import spark.implicits._
    // the quantized-index shape: the two directions score (0, 10) with
    // different cosines (each against the OTHER side's quantization)
    val fwd = Seq((0L, 10L, 0.90, 1), (0L, 11L, 0.50, 2),
      (2L, 11L, 0.60, 1)).toDF("q_id", "id", "cosine", "rank")
    val bwd = Seq((10L, 0L, 0.88, 1), (11L, 2L, 0.60, 1))
      .toDF("q_id", "id", "cosine", "rank")
    val r = Similarity.marginMine(fwd, bwd, threshold = 0.0)
      .collect().map(w => (w.getLong(0), w.getLong(1)) -> w.getDouble(2)).toMap
    // pair (0, 10) seen at 0.90 forward and 0.88 backward: higher wins
    r((0L, 10L)) shouldBe 0.90
  }
}
