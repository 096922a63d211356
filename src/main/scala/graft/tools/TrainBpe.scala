package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{Bpe, TextFunctions}

/** Trains the bundled byte-level BPE fixture (merges_byte.txt +
  * vocab_byte.json) on the synthetic documents corpus, in the real GPT-2
  * file format: `#version: 0.2` header, one `a b` rule per line over the
  * [[Bpe.byteToUnicode]] alphabet, and a `{"token": id}` vocab whose
  * first 256 ids are the byte alphabet in byte order (ids 256+i follow
  * merge order) — the same layout `loadMergesFile`/`loadVocabFile`
  * accept for production tokenizers.
  *
  * Training is the textbook Sennrich et al. 2016 loop over DISTINCT
  * pre-token segments weighted by corpus frequency. Segment counting is
  * distributed (explode + groupBy); the merge loop itself runs on the
  * driver over the distinct-segment table — fixture-building tooling,
  * not a pipeline operator.
  *
  * Usage: runMain graft.tools.TrainBpe <sfDir> <outDir> [nMerges]
  */
object TrainBpe {

  /** Pure training loop, exposed for tests: (segment, freq) pairs →
    * merge rules in rank order. Ties break on (count desc, pair asc) so
    * the fixture is reproducible run-to-run.
    */
  def train(segFreqs: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    // each distinct segment as its mutable symbol sequence + weight
    val words: Array[(Array[String], Long)] = segFreqs.map { case (seg, f) =>
      (seg.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => String.valueOf(Bpe.byteToUnicode(b & 0xff))), f)
    }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var active = words
    var iter = 0
    while (iter < nMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      active.foreach { case (w, f) =>
        var i = 0
        while (i < w.length - 1) {
          val k = (w(i), w(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) iter = nMerges
      else {
        val (pair, _) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += pair
        val (a, b) = pair
        val ab = a + b
        active = active.map { case (w, f) =>
          if (w.length < 2) (w, f)
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
            var j = 0
            while (j < w.length) {
              if (j < w.length - 1 && w(j) == a && w(j + 1) == b) { out += ab; j += 2 }
              else { out += w(j); j += 1 }
            }
            (out.toArray, f)
          }
        }
        iter += 1
      }
    }
    merges.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("/tmp/bpe_out")
    val nMerges = args.lift(2).map(_.toInt).getOrElse(300)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val segFreqs = graft.tables.Tables.documents(spark, sfDir)
      .select(explode(regexp_extract_all(
        col("text"), lit(TextFunctions.subwordPattern), lit(0))).as("g"))
      .groupBy("g").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    val merges = train(segFreqs, nMerges)

    val dir = new java.io.File(outDir)
    dir.mkdirs()
    val mw = new java.io.PrintWriter(new java.io.File(dir, "merges_byte.txt"), "UTF-8")
    try {
      mw.println("#version: 0.2")
      merges.foreach { case (a, b) => mw.println(s"$a $b") }
    } finally mw.close()

    val vocab: Seq[(String, Int)] =
      Bpe.byteToUnicode.zipWithIndex.map { case (c, b) => (String.valueOf(c), b) }.toSeq ++
        merges.zipWithIndex.map { case ((a, b), i) => (a + b, 256 + i) }
    val vw = new java.io.PrintWriter(new java.io.File(dir, "vocab_byte.json"), "UTF-8")
    try {
      import org.json4s.JsonDSL._
      vw.print(org.json4s.jackson.JsonMethods.compact(
        org.json4s.JObject(vocab.map { case (k, v) => k -> org.json4s.JInt(v) }.toList)))
    } finally vw.close()

    println(s"wrote ${merges.size} merges + ${vocab.size}-entry vocab to $outDir")
    spark.stop()
  }
}
