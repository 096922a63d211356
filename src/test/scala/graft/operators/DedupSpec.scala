package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog in the morning sun", "a"),
      (2L, "the quick brown fox jumps over the lazy dog in the morning sun", "a"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog in the evening sun", "a"), // near dup of 1
      (4L, "completely unrelated text about databases and distributed query engines", "a"),
      (5L, "another unique document mentioning spark catalyst and tungsten internals", "b")
    ).toDF("doc_id", "text", "source")
  }

  test("exact dedup: one survivor per content, min id kept, dup counted") {
    val r = Dedup.exact(docs, "doc_id", Seq("text")).collect()
    r.length shouldBe 4
    val dupRow = r.find(_.getAs[Long]("dup_count") == 2L).get
    dupRow.getAs[Long]("keep_id") shouldBe 1L
  }

  test("exact dedup: null-vs-position does not collide across columns") {
    import spark.implicits._
    // concat_ws would silently skip NULLs, making ("a", null, "b") and
    // ("a", "b", null) identical; the per-column sentinel keeps them apart
    val rows = Seq(
      (1L, Some("a"), Option.empty[String], Some("b")),
      (2L, Some("a"), Some("b"), Option.empty[String]),
      (3L, Some("a"), Option.empty[String], Some("b")) // true dup of 1
    ).toDF("id", "c1", "c2", "c3")
    val r = Dedup.exact(rows, "id", Seq("c1", "c2", "c3")).collect()
    r.length shouldBe 2
    r.find(_.getAs[Long]("dup_count") == 2L).get.getAs[Long]("keep_id") shouldBe 1L
  }

  test("exact dedup: null content and empty content are distinct groups") {
    import spark.implicits._
    val rows = Seq((1L, Option.empty[String]), (2L, Some("")), (3L, Option.empty[String]))
      .toDF("id", "text")
    val r = Dedup.exact(rows, "id", Seq("text")).collect()
    r.length shouldBe 2
    r.find(_.getAs[Long]("dup_count") == 2L).get.getAs[Long]("keep_id") shouldBe 1L
  }

  test("exactSurvivors keeps min-id rows only") {
    val ids = Dedup.exactSurvivors(docs, "doc_id", Seq("text"))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    ids shouldBe Array(1L, 3L, 4L, 5L)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated pairs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
        numHashes = 16, bands = 8, shingleN = 5, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L))
    // near-dup 1~3 shares most shingles
    pairs should contain((1L, 3L))
    pairs.exists { case (a, b) => b == 4L || b == 5L || a == 4L || a == 5L } shouldBe false
  }

  test("jaccardJoinPrefix equals the brute-force exact pair set (recall 1.0)") {
    import graft.functions.ArrayOps
    // brute-force truth: every pair's merge-walk Jaccard over the SAME
    // shingle space, no pruning at all
    val sh = docs.select(col("doc_id"),
      ArrayOps.shingleHashes(
        regexp_replace(trim(lower(col("text"))), "\\s+", " "), 5).as("sh"))
    val a = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    def pairsAt(t: Double) = a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        ArrayOps.jaccardSortedLong(col("sh_a"), col("sh_b")).as("j"))
      .filter(col("j") >= t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // a LOW threshold stresses recall (long prefixes, many candidates)
    // and a high one stresses the pruning arithmetic (short prefixes)
    for (t <- Seq(0.2, 0.5, 0.9)) {
      Dedup.jaccardJoinPrefix(docs, "doc_id", "text",
        shingleN = 5, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet shouldBe pairsAt(t)
    }
    // and the expected semantic content at 0.5: exact dup + near dup
    val got = Dedup.jaccardJoinPrefix(docs, "doc_id", "text", 5, 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got should contain((1L, 2L))
    got should contain((1L, 3L))
  }

  test("jaccardJoinPrefixBipartite equals the brute-force cross-frame pair set") {
    import spark.implicits._
    import graft.functions.ArrayOps
    val left = docs.filter(col("doc_id") <= 2 || col("doc_id") === 4)
    val right = docs.filter(col("doc_id") === 3 || col("doc_id") === 5)
    def shOf(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      ArrayOps.shingleHashes(
        regexp_replace(trim(lower(col("text"))), "\\s+", " "), 5).as("sh"))
    def cross(t: Double) = shOf(left)
      .select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      .crossJoin(shOf(right)
        .select(col("doc_id").as("id_b"), col("sh").as("sh_b")))
      .select(col("id_a"), col("id_b"),
        ArrayOps.jaccardSortedLong(col("sh_a"), col("sh_b")).as("j"))
      .filter(col("j") >= t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    for (t <- Seq(0.2, 0.5, 0.9)) {
      Dedup.jaccardJoinPrefixBipartite(left, right, "doc_id", "text",
        shingleN = 5, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet shouldBe cross(t)
    }
    // cross pairs ONLY: the near-dup (1, 3) crosses the split and must
    // appear; the exact dup (1, 2) is internal to the left frame and
    // must NOT
    val got = Dedup.jaccardJoinPrefixBipartite(left, right, "doc_id",
      "text", 5, 0.5).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got should contain((1L, 3L))
    got.exists { case (a, b) => a == 1L && b == 2L } shouldBe false
  }

  test("prefix index: incremental probe equals the full join's new-involving subset") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog in the morning sun"),
      (2L, "completely unrelated text about databases and distributed query engines"),
      (3L, "another unique document mentioning spark catalyst and tungsten internals"))
      .toDF("doc_id", "text")
    // batch 1 carries a near-dup of the corpus AND a doc of entirely
    // NEW vocabulary (exercises the unseen-token df=0 frozen-order path)
    val batch1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog in the evening sun"),
      (11L, "zebras gallop across windy plains chasing golden butterflies at dawn"))
      .toDF("doc_id", "text")
    // batch 2 duplicates the corpus exactly and near-dups batch 1's
    // new-vocabulary doc — both must surface through the frozen index
    val batch2 = Seq(
      (20L, "the quick brown fox jumps over the lazy dog in the morning sun"),
      (21L, "zebras gallop across windy plains chasing golden butterflies at dusk"))
      .toDF("doc_id", "text")
    val t = 0.3
    def fullNewInvolving(union: org.apache.spark.sql.DataFrame,
        newMin: Long) =
      Dedup.jaccardJoinPrefix(union, "doc_id", "text", 5, t)
        .filter(col("id_b") >= newMin) // id_a < id_b: new-involving ⇔ id_b new
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val dir = java.nio.file.Files.createTempDirectory("jpidx").toString
    Dedup.jaccardPrefixIndexWrite(corpus, "doc_id", "text", dir,
      shingleN = 5, threshold = t)
    val inc1 = Dedup.jaccardJoinPrefixIncremental(batch1, "doc_id", "text",
        dir, t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    inc1 shouldBe fullNewInvolving(corpus.union(batch1), 10L)
    inc1.map(p => (p._1, p._2)) should contain((1L, 10L))
    // append batch 1 (frozen order — the df table is untouched), then
    // batch 2 must see corpus AND batch-1 docs, including the pair
    // between two docs of post-freeze vocabulary
    Dedup.jaccardPrefixIndexAppend(batch1, "doc_id", "text", dir)
    val inc2 = Dedup.jaccardJoinPrefixIncremental(batch2, "doc_id", "text",
        dir, t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    inc2 shouldBe fullNewInvolving(corpus.union(batch1).union(batch2), 20L)
    inc2.map(p => (p._1, p._2)) should contain((1L, 20L))   // exact dup of corpus
    inc2.map(p => (p._1, p._2)) should contain((11L, 21L))  // both post-freeze vocab
    // probing below the build threshold would silently lose pairs
    // (stored prefixes too short) — it must fail loudly instead
    val e = intercept[IllegalArgumentException] {
      Dedup.jaccardJoinPrefixIncremental(batch2, "doc_id", "text", dir, 0.2)
    }
    e.getMessage should include("build threshold")
    // probing ABOVE the build threshold is safe (longer-than-needed
    // prefixes only add candidates; verify is exact)
    Dedup.jaccardJoinPrefixIncremental(batch2, "doc_id", "text", dir, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet shouldBe fullNewInvolving(
        corpus.union(batch1).union(batch2), 20L).filter(_._3 >= 0.9)
  }

  test("simhash finds near duplicates within hamming bound") {
    val pairs = Dedup.simhash(docs, "doc_id", "text", maxHamming = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L))
    pairs should not contain ((1L, 4L))
  }

  test("simhash chunk blocking is pigeonhole-complete: equals all-pairs hamming") {
    import spark.implicits._
    import graft.functions.{TextFunctions => T, VectorFunctions => V}
    for (kernel <- Seq("xxhash", "md5"); maxHamming <- Seq(3, 8)) {
      val blocked = Dedup.simhash(docs, "doc_id", "text",
          maxHamming = maxHamming, kernel = kernel)
        .select("id_a", "id_b", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val sigs = docs
        .select(col("doc_id"), T.normTokens(col("text")).as("t"))
        .select(col("doc_id"), V.simhash64(col("t"), kernel).as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val allPairs = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb) if h <= maxHamming
      } yield (ia, ib, h)).toSet
      blocked shouldBe allPairs
    }
  }

  test("connectedComponents: chains collapse transitively, min id labels") {
    import spark.implicits._
    // component {1,2,3,4,5} as a path (diameter 4 → needs several
    // propagation rounds), component {10,11}, and pair order mixed
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (11L, 10L))
      .toDF("id_a", "id_b")
    val r = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    r shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L)
  }

  test("incrementalExact dedups the new batch within itself and vs existing digests") {
    import spark.implicits._
    val existingDocs = Seq((1L, "already ingested text"), (2L, "old news")).toDF("doc_id", "text")
    val existing = Dedup.exact(existingDocs, "doc_id", Seq("text")).select("content_hash")
    val fresh = Seq(
      (10L, "brand new content"),
      (11L, "brand new content"),      // within-batch dup of 10
      (12L, "already ingested text"),  // collides with existing corpus
      (13L, "another novel doc")
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalExact(fresh, "doc_id", Seq("text"), existing)
      .collect().map(_.getLong(0)).toSet
    kept shouldBe Set(10L, 13L)
  }

  test("minhashLshIncremental: new-vs-index and new-vs-new pairs, no existing pairs") {
    import spark.implicits._
    val existing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog in the morning sun"),
      (2L, "the quick brown fox jumps over the lazy dog in the morning sun"), // dup of 1 (already known)
      (3L, "completely unrelated text about databases and query engines")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "the quick brown fox jumps over the lazy dog in the morning sun"), // dup of 1 AND 2
      (11L, "another brand new document about spark catalyst internals"),
      (12L, "another brand new document about spark catalyst internals")       // dup of 11
    ).toDF("doc_id", "text")
    val index = Dedup.minhashIndex(existing, "doc_id", "text",
      numHashes = 16, bands = 8, shingleN = 5)
    val pairs = Dedup.minhashLshIncremental(fresh, "doc_id", "text", index,
        numHashes = 16, bands = 8, shingleN = 5, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((1L, 10L), (2L, 10L), (11L, 12L)) // no (1,2): prior run owns it
  }

  test("simhashIncremental equals full simhash restricted to new-involving pairs") {
    import spark.implicits._
    val existing = docs.filter(col("doc_id") <= 3)
    val fresh = docs.filter(col("doc_id") > 3)
    for (kernel <- Seq("xxhash", "md5")) {
      val index = Dedup.simhashIndex(existing, "doc_id", "text",
        maxHamming = 8, kernel = kernel)
      val inc = Dedup.simhashIncremental(fresh, "doc_id", "text", index,
          maxHamming = 8, kernel = kernel)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val newIds = fresh.select("doc_id").collect().map(_.getLong(0)).toSet
      val full = Dedup.simhash(docs, "doc_id", "text",
          maxHamming = 8, kernel = kernel)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        .filter(p => newIds.contains(p._1) || newIds.contains(p._2))
      inc shouldBe full
    }
  }

  test("embeddingCosineIncremental equals full LSH restricted to new-involving pairs") {
    import spark.implicits._
    val dim = 4
    def vec(seed: Int): Seq[Double] =
      Seq.tabulate(dim)(j => math.sin(seed * 13 + j).abs + 0.1)
    val rows = (0L to 11L).map(i =>
      (i, if (i % 3 == 0) vec(1) else vec(i.toInt))).toDF("vec_id", "embedding")
    val existing = rows.filter(col("vec_id") < 6)
    val fresh = rows.filter(col("vec_id") >= 6)
    val index = Dedup.embeddingIndex(existing, "vec_id", "embedding",
      dim = dim, nBits = 4, kernel = "md5")
    val inc = Dedup.embeddingCosineIncremental(fresh, "vec_id", "embedding",
        index, dim = dim, nBits = 4, threshold = 0.95, kernel = "md5")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.embeddingCosine(rows, "vec_id", "embedding",
        dim = dim, nBits = 4, threshold = 0.95, kernel = "md5")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => p._1 >= 6 || p._2 >= 6)
    inc shouldBe full
    inc should contain((0L, 6L)) // cross-batch: identical vectors collide
  }

  test("null text yields no near-dup pairs (and no NPE) in minhash and simhash") {
    import spark.implicits._
    val withNulls = Seq(
      (1L, Some("the quick brown fox jumps over the lazy dog every day")),
      (2L, Some("the quick brown fox jumps over the lazy dog every day")),
      (3L, Option.empty[String]),
      (4L, Option.empty[String])
    ).toDF("doc_id", "text")
    val mh = Dedup.minhashLsh(withNulls, "doc_id", "text",
        numHashes = 16, bands = 8, shingleN = 5, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    mh.toSet shouldBe Set((1L, 2L))
    val sh = Dedup.simhash(withNulls, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    sh.toSet shouldBe Set((1L, 2L)) // null-text docs never pair
  }

  test("nearDupSurvivors keeps min id per cluster and all unpaired docs") {
    import spark.implicits._
    val corpus = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("doc_id")
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val kept = Dedup.nearDupSurvivors(corpus, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    kept shouldBe Set(1L, 4L, 9L) // cluster {1,2,3}→1, {4,5}→4, loner 9
  }

  test("ngram jaccard blocked: respects blocks and threshold") {
    val r = Dedup.ngramJaccardBlocked(docs, "doc_id", "text", Seq("source"),
        n = 3, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairSet = r.map(t => (t._1, t._2)).toSet
    pairSet should contain((1L, 2L))
    r.find(t => (t._1, t._2) == ((1L, 2L))).get._3 shouldBe 1.0 +- 1e-9
    pairSet should contain((1L, 3L))
    // doc 5 is in block b — never paired with block a docs
    pairSet.exists { case (a, b) => a == 5L || b == 5L } shouldBe false
  }

  test("deleteFromLabels: re-election, component split, orphan drop, untouched pass-through") {
    import spark.implicits._
    // components over pairs: {1,2,3} (1-2, 2-3: 2 bridges), {4,5},
    // {7,8} (untouched), loner 9 never labeled
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (7L, 8L))
      .toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs, "id_a", "id_b")
    def del(vs: Long*): Map[Long, Long] =
      Dedup.deleteFromLabels(labels, pairs, vs.toDF("doc_id"), "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // delete the representative 4: 5 re-elects itself... as a singleton
    // it drops out entirely (a rebuild over survivors never labels it);
    // untouched components byte-identical
    del(4L) shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L)
    // delete the BRIDGE 2: the component splits; 1 and 3 lose their only
    // pairs and both drop out (orphans) — no stale 1-3 cluster survives
    del(2L) shouldBe Map(4L -> 4L, 5L -> 4L, 7L -> 7L, 8L -> 7L)
    // delete a representative with surviving structure: {1,2,3} minus 1
    // re-closes to {2,3} under the re-elected min 2
    del(1L) shouldBe Map(2L -> 2L, 3L -> 2L, 4L -> 4L, 5L -> 4L,
      7L -> 7L, 8L -> 7L)
    // deleting an unlabeled doc is a no-op
    del(9L) shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 4L, 7L -> 7L, 8L -> 7L)
    // multi-victim across components
    del(1L, 5L) shouldBe Map(2L -> 2L, 3L -> 2L, 7L -> 7L, 8L -> 7L)
    // survivors view after takedown: victims gone, survivors re-elected
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 7L, 8L, 9L).toDF("doc_id")
    Dedup.survivorsFromLabels(docs.filter(col("doc_id") =!= 1L), "doc_id",
        Dedup.deleteFromLabels(labels, pairs, Seq(1L).toDF("doc_id"),
          "doc_id"))
      .collect().map(_.getLong(0)).toSet shouldBe Set(2L, 4L, 7L, 9L)
  }

  test("embedding cosine dedup via hyperplane LSH") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.999, 0.01, 0.0, 0.0)),  // near dup of 1
      (3L, Seq(0.0, 1.0, 0.0, 0.0)),
      (4L, Seq(0.0, 0.0, 1.0, 0.0))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingCosine(vecs, "vec_id", "embedding", dim = 4,
        nBits = 4, threshold = 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L))
    pairs should not contain ((1L, 3L))
  }
}
