package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, max, min}
import org.apache.spark.sql.types._
import graft.SparkSpec

class TablesSpec extends SparkSpec {

  test("loadFormat reads csv and json with explicit schemas (no inference scan)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sources").toString
    val src = Seq(("k1", "v1", 1), ("k2", "v2", 2)).toDF("key", "value", "num")
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    src.write.mode("overwrite").json(s"$dir/json")

    val schema = StructType(Seq(
      StructField("key", StringType), StructField("value", StringType),
      StructField("num", IntegerType)))

    val csv = Tables.loadFormat(spark, s"$dir/csv", "csv", Some(schema),
      Map("header" -> "true"))
    csv.orderBy("num").collect().map(_.toSeq) shouldBe
      Array(Seq("k1", "v1", 1), Seq("k2", "v2", 2))

    val json = Tables.loadFormat(spark, s"$dir/json", "json", Some(schema))
    json.orderBy("num").collect().map(_.toSeq) shouldBe
      Array(Seq("k1", "v1", 1), Seq("k2", "v2", 2))
  }

  test("binaryFile source reads whole files with glob pruning before content") {
    val dir = Files.createTempDirectory("graft-bin").toString
    Files.write(java.nio.file.Paths.get(s"$dir/a.png"), Array[Byte](1, 2, 3))
    Files.write(java.nio.file.Paths.get(s"$dir/b.png"), Array[Byte](4, 5))
    Files.write(java.nio.file.Paths.get(s"$dir/skip.txt"), Array[Byte](9))
    val df = Tables.loadBinaryFiles(spark, dir, Some("*.png"))
    val rows = df.select("path", "length", "content").collect()
    rows should have length 2 // txt pruned by glob, not read
    rows.map(_.getAs[Long]("length")).sorted shouldBe Array(2L, 3L)
    rows.find(_.getAs[String]("path").endsWith("a.png"))
      .get.getAs[Array[Byte]]("content") shouldBe Array[Byte](1, 2, 3)
  }

  test("text source reads lines, wholetext reads one row per file") {
    val dir = Files.createTempDirectory("graft-text").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/d.txt"), "line one\nline two\n")
    Tables.loadText(spark, dir).count() shouldBe 2
    val whole = Tables.loadText(spark, dir, wholeFile = true).collect()
    whole should have length 1
    whole.head.getString(0) shouldBe "line one\nline two\n"
  }

  test("writeClustered produces non-overlapping key ranges per file") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-clustered").toString
    val df = (1 to 2000).map(i => ((i * 733) % 2000, s"row$i")).toDF("k", "payload")
    Tables.writeClustered(df, s"$dir/t", Seq("k"), numFiles = 4)
    val parts = new java.io.File(s"$dir/t").listFiles()
      .filter(f => f.getName.startsWith("part-")).map(_.getPath)
    parts.length shouldBe 4
    val ranges = parts.map { p =>
      val r = spark.read.parquet(p).agg(min("k"), max("k")).head()
      (r.getInt(0), r.getInt(1))
    }.sortBy(_._1)
    // each file covers a slice disjoint from the next → min/max stats prune
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => hi should be < lo2
      case _ =>
    }
  }

  test("writeZOrdered bounds per-file ranges on BOTH columns; lex clustering only on the first") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-zorder").toString
    // a 64×64 grid visited in a scattered order
    val df = (0 until 4096).map { i =>
      val j = (i * 733) % 4096; (j / 64, j % 64, s"row$i")
    }.toDF("a", "b", "payload")
    def fileSpans(path: String, c: String): Seq[Int] =
      new java.io.File(path).listFiles()
        .filter(_.getName.startsWith("part-")).map(_.getPath).toSeq
        .map { p =>
          val r = spark.read.parquet(p).agg(min(col(c)), max(col(c))).head()
          r.getInt(1) - r.getInt(0)
        }
    Tables.writeClustered(df, s"$dir/lex", Seq("a", "b"), numFiles = 16)
    Tables.writeZOrdered(df, s"$dir/z", "a", 0.0, 64.0, "b", 0.0, 64.0,
      numFiles = 16)
    // lexicographic: every non-boundary file spans b's whole 0..63 range
    val lexB = fileSpans(s"$dir/lex", "b")
    lexB.max should be >= 60
    // z-order: each of the 16 files covers ONE 16×16 tile of the plane —
    // both coordinates bounded at a quarter of their range
    fileSpans(s"$dir/z", "a").max should be <= 16
    fileSpans(s"$dir/z", "b").max should be <= 16
    // and the data round-trips
    spark.read.parquet(s"$dir/z").count() shouldBe 4096L
  }

  test("zValueN tiles the 3-d cube; writeZOrderedN round-trips") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-zorder3").toString
    // a 16×16×16 cube visited in a scattered order
    val df = (0 until 4096).map { i =>
      val j = (i * 733) % 4096; (j / 256, (j / 16) % 16, j % 16, s"row$i")
    }.toDF("a", "b", "c", "payload")
    // Deterministic form of the clustering claim (file-level spans
    // depend on RangePartitioner SAMPLING, whose boundaries wobble a few
    // codes run-to-run): splitting the z range into 8 exact-count blocks
    // must give 8 octants — every coordinate bounded at HALF its range.
    // 16 values over [0,16) at 16 bits → bucket = v·4096, data bits at
    // z positions 36..47, so 512-code blocks are z >> 45.
    import org.apache.spark.sql.functions.{expr, max => smax, min => smin}
    val z = df.select(col("a"), col("b"), col("c"),
      Tables.zValueN(Seq((col("a"), 0.0, 16.0), (col("b"), 0.0, 16.0),
        (col("c"), 0.0, 16.0))).as("z"))
    val blocks = z.groupBy(expr("z div CAST(pow(2, 45) AS BIGINT)").as("blk"))
      .agg(smax("a") - smin("a"), smax("b") - smin("b"),
        smax("c") - smin("c"), org.apache.spark.sql.functions.count(col("*")))
      .collect()
    blocks.length shouldBe 8
    blocks.foreach { r =>
      r.getInt(1) should be <= 7; r.getInt(2) should be <= 7
      r.getInt(3) should be <= 7; r.getLong(4) shouldBe 512L
    }
    // and the physical write round-trips through the same key
    Tables.writeZOrderedN(df, s"$dir/z",
      Seq(("a", 0.0, 16.0), ("b", 0.0, 16.0), ("c", 0.0, 16.0)),
      numFiles = 8)
    spark.read.parquet(s"$dir/z").count() shouldBe 4096L
    new java.io.File(s"$dir/z").listFiles()
      .count(_.getName.startsWith("part-")) shouldBe 8
  }

  test("z keys: NULL in any column yields NULL z; non-null values never collide with the edge") {
    import spark.implicits._
    val df = Seq(
      (Some(0), Some(0)),       // genuine lo-edge → z = 0
      (None: Option[Int], Some(3)), // NULL a → NULL z, NOT bucket 0
      (Some(3), None: Option[Int])  // NULL b → NULL z
    ).toDF("a", "b")
    val z2 = df.select(Tables.zValue2(col("a"), 0.0, 16.0,
      col("b"), 0.0, 16.0).as("z")).collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getLong(0)))
    z2 shouldBe Array(Some(0L), None, None)
    val zn = df.select(Tables.zValueN(Seq(
      (col("a"), 0.0, 16.0), (col("b"), 0.0, 16.0))).as("z"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    zn shouldBe Array(Some(0L), None, None)
  }

  test("deleteMatching rewrites only affected partitions; emptied ones vanish") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-del").toString
    // p=a has user 7 among others; p=b has ONLY user 7; p=c is untouched
    val df = Seq(
      ("a", 7L, "x1"), ("a", 8L, "x2"), ("a", 9L, "x3"),
      ("b", 7L, "y1"), ("b", 7L, "y2"),
      ("c", 1L, "z1"), ("c", 2L, "z2")
    ).toDF("p", "user_id", "payload")
    Tables.writePartitioned(df, s"$dir/t", Seq("p"))
    def files(part: String) = new java.io.File(s"$dir/t/p=$part").listFiles()
      .filter(_.getName.startsWith("part-")).map(f => f.getName -> f.lastModified).toSet
    val cBefore = files("c")
    val deleted = Tables.deleteMatching(spark, s"$dir/t", "p",
      org.apache.spark.sql.functions.col("user_id") === 7L)
    deleted shouldBe 3L
    val left = spark.read.parquet(s"$dir/t")
    left.filter(org.apache.spark.sql.functions.col("user_id") === 7L).count() shouldBe 0L
    left.count() shouldBe 4L
    // the all-deleted partition directory is gone
    new java.io.File(s"$dir/t/p=b").exists() shouldBe false
    // the untouched partition's files were never rewritten
    files("c") shouldBe cBefore
    // no-match delete is a no-op returning 0
    Tables.deleteMatching(spark, s"$dir/t", "p",
      org.apache.spark.sql.functions.col("user_id") === 999L) shouldBe 0L
    spark.read.parquet(s"$dir/t").count() shouldBe 4L
    // partition values with path-escaped characters still empty cleanly
    val df2 = Seq(("x y:z", 7L, "e1"), ("plain", 1L, "e2")).toDF("p", "user_id", "payload")
    Tables.writePartitioned(df2, s"$dir/t2", Seq("p"))
    Tables.deleteMatching(spark, s"$dir/t2", "p",
      org.apache.spark.sql.functions.col("user_id") === 7L) shouldBe 1L
    spark.read.parquet(s"$dir/t2").count() shouldBe 1L
    new java.io.File(s"$dir/t2").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("p=")) shouldBe 1
  }

  test("large-fraction deletes stage-and-swap; small fractions keep the " +
      "checkpointed dynamic overwrite") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val dir = Files.createTempDirectory("graft-del-staged").toString
    // 8 partitions × 100 rows; within a partition id%16 alternates, so
    // a `id % 16 < 8` predicate deletes exactly half of it
    Tables.writePartitioned(spark.range(800)
      .select((col("id") % 8).as("p"), col("id")), s"$dir/t", Seq("p"))
    def files(part: Int) = new java.io.File(s"$dir/t/p=$part").listFiles()
      .filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified).toSet
    val untouchedBefore = (6 to 7).map(files)
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    // touches 6 of 8 partitions (0-4 half-deleted, 5 emptied) → ≥ 0.5
    // of the table: the STAGED path, with NO checkpoint of the kept set
    val pred = (col("p") <= 4 && col("id") % 16 < 8) || col("p") === 5
    val (deleted, staged) = Tables.deleteRewriteDetail(spark, s"$dir/t",
      "p", d => d.filter(coalesce(pred, lit(false))),
      d => d.filter(!coalesce(pred, lit(false))), stagedFraction = 0.5)
    staged shouldBe true
    deleted shouldBe 350L
    // storage asserted: the staged path registered no localCheckpoint
    // (the kept set went straight to _staged files, never the cache)
    spark.sparkContext.getPersistentRDDs.keySet shouldBe persistedBefore
    val left = spark.read.parquet(s"$dir/t")
    left.count() shouldBe 450L
    left.filter(coalesce(pred, lit(false))).count() shouldBe 0L
    new java.io.File(s"$dir/t/p=5").exists() shouldBe false // emptied
    new java.io.File(s"$dir/t/_staged").exists() shouldBe false // cleaned
    (6 to 7).map(files) shouldBe untouchedBefore // never rewritten
    // a 1-of-8-partition delete stays on the checkpointed overwrite
    val (d2, staged2) = Tables.deleteRewriteDetail(spark, s"$dir/t", "p",
      d => d.filter(col("p") === 7 && col("id") % 16 < 8),
      d => d.filter(!(col("p") === 7 && col("id") % 16 < 8)),
      stagedFraction = 0.5)
    staged2 shouldBe false
    d2 shouldBe 50L
    spark.read.parquet(s"$dir/t").count() shouldBe 400L
  }

  test("property: the staged swap and the checkpointed overwrite are " +
      "observationally equivalent on the same table and predicate") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    // the two strategies must be interchangeable — a caller tuning
    // stagedFraction can never change WHAT a delete computes, only how
    // the rewrite is staged. Forced via the seam: fraction 0 always
    // stages, fraction > 1 never does.
    for (seed <- 1 to 4) {
      val dir = Files.createTempDirectory(s"graft-del-eq$seed").toString
      val nParts = 3 + seed // 4..7 partitions
      val rows = spark.range(200 + 37 * seed).select(
        (col("id") % nParts).as("p"), col("id"),
        concat(lit("v"), col("id") * seed).as("payload"))
      Seq("a", "b").foreach(t =>
        Tables.writePartitioned(rows.toDF(), s"$dir/$t", Seq("p")))
      // a predicate that fully empties partition 0 and thins the rest
      val pred = col("p") === 0 || col("id") % (2 + seed) === 1
      val (dStaged, s1) = Tables.deleteRewriteDetail(spark, s"$dir/a",
        "p", d => d.filter(pred), d => d.filter(!pred),
        stagedFraction = 0.0)
      val (dCp, s2) = Tables.deleteRewriteDetail(spark, s"$dir/b",
        "p", d => d.filter(pred), d => d.filter(!pred),
        stagedFraction = 2.0)
      s1 shouldBe true
      s2 shouldBe false
      dStaged shouldBe dCp
      val read = (t: String) => spark.read.parquet(s"$dir/$t")
        .collect().map(_.toSeq).toSeq.sortBy(_.mkString(""))
      read("a") shouldBe read("b")
      // identical partition-directory sets too (emptied dirs gone on
      // both paths)
      val dirs = (t: String) => new java.io.File(s"$dir/$t").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("p="))
        .map(_.getName).toSet
      dirs("a") shouldBe dirs("b")
    }
  }

  test("timestamp partition values swap by their ON-DISK directory " +
      "names (value formatting must not be load-bearing)") {
    import org.apache.spark.sql.functions.{col, expr}
    val dir = Files.createTempDirectory("graft-del-tsp").toString
    // Spark writes 'ts=2020-01-01 00%3A00%3A00' — String.valueOf of the
    // collected java.sql.Timestamp renders '...00:00:00.0', so a
    // name-CONSTRUCTED swap would miss every directory and silently
    // delete nothing; the file-derived names make this exact
    spark.range(300).select(
      expr("timestamp '2020-01-01 00:00:00' + make_interval(0,0,0,0," +
        "id div 100,0,0)").as("ts"), col("id"))
      .write.partitionBy("ts").parquet(s"$dir/t")
    // majority (2 of 3 hours; one emptied) → staged swap
    val pred = col("ts") < expr("timestamp '2020-01-01 01:00:00'") ||
      (col("ts") < expr("timestamp '2020-01-01 02:00:00'") &&
        col("id") % 2 === 0)
    val (d, staged) = Tables.deleteRewriteDetail(spark, s"$dir/t", "ts",
      dd => dd.filter(pred), dd => dd.filter(!pred), stagedFraction = 0.5)
    staged shouldBe true
    d shouldBe 150L
    val left = spark.read.parquet(s"$dir/t")
    left.count() shouldBe 150L
    left.filter(pred).count() shouldBe 0L
    // the emptied hour's directory really left the disk
    new java.io.File(s"$dir/t").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("ts=")) shouldBe 2
    // minority (1 of 2 remaining) → checkpointed overwrite, emptied-dir
    // deletion also by on-disk name
    val pred2 = col("ts") < expr("timestamp '2020-01-01 02:00:00'")
    val (d2, staged2) = Tables.deleteRewriteDetail(spark, s"$dir/t", "ts",
      dd => dd.filter(pred2), dd => dd.filter(!pred2),
      stagedFraction = 0.9)
    staged2 shouldBe false
    d2 shouldBe 50L
    new java.io.File(s"$dir/t").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("ts=")) shouldBe 1
    spark.read.parquet(s"$dir/t").count() shouldBe 100L
  }

  test("NULL partition values are rewritten, not silently skipped, in " +
      "both rewrite strategies") {
    import org.apache.spark.sql.functions.{col, expr, lit, when}
    val dir = Files.createTempDirectory("graft-del-nullp").toString
    // ids 0-99 land in the NULL partition (__HIVE_DEFAULT_PARTITION__),
    // 100-199 in p=1, 200-299 in p=2. `isin` never matches NULL, so
    // without the explicit arm the null group's matches would be
    // COUNTED as deleted yet never rewritten
    spark.range(300).select(
      when(col("id") < 100, lit(null).cast("long"))
        .otherwise(expr("id div 100")).as("p"), col("id"))
      .write.partitionBy("p").parquet(s"$dir/t")
    // 1-of-3 partitions (the NULL one) → checkpointed dynamic overwrite
    val pred1 = col("p").isNull && col("id") % 2 === 0
    val (d1, s1) = Tables.deleteRewriteDetail(spark, s"$dir/t", "p",
      d => d.filter(pred1), d => d.filter(!pred1), stagedFraction = 0.9)
    s1 shouldBe false
    d1 shouldBe 50L
    spark.read.parquet(s"$dir/t").filter(col("p").isNull)
      .count() shouldBe 50L
    // 2-of-3 incl. NULL (which empties) → staged swap
    val pred2 = col("p").isNull || (col("p") === 1 && col("id") % 2 === 0)
    val (d2, s2) = Tables.deleteRewriteDetail(spark, s"$dir/t", "p",
      d => d.filter(pred2), d => d.filter(!pred2), stagedFraction = 0.5)
    s2 shouldBe true
    d2 shouldBe 100L
    val left = spark.read.parquet(s"$dir/t")
    left.filter(col("p").isNull).count() shouldBe 0L
    new java.io.File(s"$dir/t/p=__HIVE_DEFAULT_PARTITION__")
      .exists() shouldBe false
    left.count() shouldBe 150L
  }

  test("a crashed staged swap recovers mechanically before the next " +
      "rewrite: deleted-not-renamed partitions rename in, unswapped " +
      "stages discard") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val dir = Files.createTempDirectory("graft-del-recover").toString
    Seq((0, "old0"), (1, "old1"), (2, "old2")).toDF("p", "v")
      .write.partitionBy("p").parquet(s"$dir/t")
    // simulate the crash window by hand: the staged write completed
    // (p=0 and p=1 have staged twins), p=0's live dir was deleted but
    // not yet renamed, p=1 was never swapped
    Seq((0, "new0"), (1, "new1")).toDF("p", "v")
      .write.partitionBy("p").parquet(s"$dir/t/_staged")
    val fs = new org.apache.hadoop.fs.Path(s"$dir/t")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/t/p=0"), true)
    // any next rewrite recovers first (here: a no-match delete)
    Tables.deleteMatching(spark, s"$dir/t", "p", lit(false)) shouldBe 0L
    val rows = spark.read.parquet(s"$dir/t").select("p", "v")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    rows shouldBe Set((0, "new0"), (1, "old1"), (2, "old2"))
    new java.io.File(s"$dir/t/_staged").exists() shouldBe false
  }

  test("deleteMatching keeps NULL-predicate rows (delete means strictly TRUE)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-delnull").toString
    // partition a holds a row whose email is NULL: `email = 'gone'` is
    // NULL there, not false — a bare !predicate filter would silently
    // drop it alongside the real match (the r8 ADVICE data-loss finding)
    val df = Seq(
      ("a", Some("gone"), 1L), ("a", None, 2L), ("a", Some("stay"), 3L),
      ("b", Some("other"), 4L)
    ).toDF("p", "email", "id")
    Tables.writePartitioned(df, s"$dir/t", Seq("p"))
    val deleted = Tables.deleteMatching(spark, s"$dir/t", "p",
      org.apache.spark.sql.functions.col("email") === "gone")
    deleted shouldBe 1L
    val left = spark.read.parquet(s"$dir/t")
    left.count() shouldBe 3L
    // the NULL-email row survived the rewrite of its partition
    left.filter(org.apache.spark.sql.functions.col("email").isNull)
      .count() shouldBe 1L
  }

  test("property: zValueN matches a sequential Morton reference incl. clamp and NULLs") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // values straddle the declared ranges so clamping paths execute;
    // ~10% NULLs exercise the contract
    val rows = (1 to 400).map { i =>
      def v(): Option[Double] =
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextDouble() * 30 - 5)
      (i.toLong, v(), v(), v())
    }
    val ranges = Seq((0.0, 16.0), (2.0, 18.0), (-4.0, 12.0))
    val bits = 16
    def ref(vs: Seq[Option[Double]]): Option[Long] =
      if (vs.exists(_.isEmpty)) None
      else Some {
        val n = vs.size
        vs.zipWithIndex.map { case (Some(x), j) =>
          val (lo, hi) = ranges(j)
          val raw = math.floor((x - lo) / (hi - lo) * (1L << bits).toDouble).toLong
          val bk = math.min((1L << bits) - 1, math.max(0L, raw))
          (0 until bits).map(k => ((bk >> k) & 1L) << (k * n + (n - 1 - j))).sum
        }.sum
      }
    val got = rows.toDF("id", "a", "b", "c")
      .select(col("id"), Tables.zValueN(Seq(
        (col("a"), 0.0, 16.0), (col("b"), 2.0, 18.0), (col("c"), -4.0, 12.0)))
        .as("z"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    rows.foreach { case (id, a, b, c) =>
      got(id) shouldBe ref(Seq(a, b, c))
    }
  }

  test("compact rewrites many small files into the computed file count") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact").toString
    (1 to 1000).toDF("v").repartition(40).write.parquet(s"$dir/t")
    def fileCount = new java.io.File(s"$dir/t").listFiles()
      .count(_.getName.startsWith("part-"))
    fileCount shouldBe 40
    Tables.compact(spark, s"$dir/t", s"$dir/tmp", rowsPerFile = 250)
    fileCount shouldBe 4
    spark.read.parquet(s"$dir/t").count() shouldBe 1000L
  }

  test("events loader normalizes the nanosecond timestamp column") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.schema("ts").dataType shouldBe TimestampType
    ev.count() shouldBe 1000
  }
}
