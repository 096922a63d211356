package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graft.Bridge
import graft.functions.{ArrayOps, TextFunctions => T, VectorFunctions => V}

/** SQL surface for graft's custom functions: every native expression and
  * key column composition, callable from `spark.sql(...)` as
  * `graft_*`. Two registration paths, same builders:
  *
  *  - `GraftFunctions.register(spark)` — into a live session;
  *  - `spark.sql.extensions=graft.GraftExtensions` (or
  *    `builder.withExtensions(new GraftExtensions)`) — at session build,
  *    the standard plugin mechanism for a Spark-native library.
  *
  * A DataFrame-API user never needs these; they exist so `spark.sql`
  * users (the reference's operators work from SQL consoles too) get the
  * full operator surface — LSH signatures, quality scores, similarity
  * kernels — without touching Scala.
  */
object GraftFunctions {

  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal integer")
    e.eval() match {
      case i: Int  => i
      case l: Long =>
        require(l >= Int.MinValue && l <= Int.MaxValue,
          s"$what out of int range: $l") // silent narrowing would corrupt widths
        l.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be a literal integer, got $other")
    }
  }

  private def litDouble(e: Expression, what: String): Double = {
    require(e.foldable, s"$what must be a literal number")
    e.eval() match {
      case d: Double => d
      case f: Float  => f.toDouble
      case i: Int    => i.toDouble
      case l: Long   => l.toDouble
      case d: java.math.BigDecimal => d.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$what must be a literal number, got $other")
    }
  }

  private def litStr(e: Expression, what: String): String = {
    require(e.foldable, s"$what must be a literal string")
    e.eval() match {
      case s: UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$what must be a literal string, got $other")
    }
  }

  private def arity(ch: Seq[Expression], ns: Int*): Unit =
    require(ns.contains(ch.size),
      s"expected ${ns.mkString(" or ")} arguments, got ${ch.size}")

  /** Column-composition builder: lift child expressions to Columns, run
    * the library's column function, drop back to a REAL Catalyst tree
    * (the lazy ColumnNode wrapper would survive into the physical plan
    * unconverted when returned from a registry builder).
    */
  private def viaColumns(f: Seq[Column] => Column)(ch: Seq[Expression]): Expression =
    Bridge.resolvedExpression(f(ch.map(Bridge.column)))

  /** Evaluate `e` ONCE and pass it to `f` as a lambda variable: a HOF
    * lambda body that references a non-attribute outer expression
    * re-evaluates it per element (the codebase's documented trap), and
    * the SQL registry hands builders raw expressions, not projected
    * attributes. `transform` over a one-element array makes the value an
    * attribute-like lambda variable for everything `f` builds.
    */
  private def bindOnce(e: Column, f: Column => Column): Column = {
    import org.apache.spark.sql.functions.{array, element_at, transform}
    element_at(transform(array(e), f), 1)
  }

  /** name → (builder, usage) — single source for both registration paths. */
  val builders: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("graft_cosine",
      { ch => arity(ch, 2); viaColumns(c => V.cosine(c(0), c(1)))(ch) },
      "cosine similarity of two numeric arrays (double math)"),
    ("graft_sq_dist",
      { ch => arity(ch, 2); viaColumns(c => V.sqDist(c(0), c(1)))(ch) },
      "squared Euclidean distance of two numeric arrays (the PQ/k-center metric)"),
    ("graft_hamming64",
      { ch => arity(ch, 2); viaColumns(c => V.hamming64(c(0), c(1)))(ch) },
      "Hamming distance between two 64-bit signatures"),
    ("graft_intersect_count",
      { ch => arity(ch, 2); ArrayOps.SortedLongIntersectCount(ch(0), ch(1)) },
      "|a ∩ b| of two sorted distinct bigint arrays"),
    ("graft_jaccard_sorted",
      { ch => arity(ch, 2); viaColumns(c => ArrayOps.jaccardSortedLong(c(0), c(1)))(ch) },
      "Jaccard similarity of two sorted distinct bigint arrays"),
    ("graft_shingle_hashes",
      { ch => arity(ch, 2); ArrayOps.ShingleHashes(ch(0), litInt(ch(1), "shingle width")) },
      "sorted distinct xxhash64 of every n-char window"),
    ("graft_word_ngram_hashes",
      { ch => arity(ch, 2); ArrayOps.WordNgramHashes(ch(0), litInt(ch(1), "ngram width")) },
      "sorted distinct xxhash64 of word n-grams of a token array"),
    ("graft_minhash_signature",
      { ch => arity(ch, 2); ArrayOps.MinHashSignature(ch(0), litInt(ch(1), "k")) },
      "k-permutation MinHash signature of pre-hashed set elements"),
    ("graft_simhash64",
      { ch =>
        arity(ch, 1, 2)
        val kernel = if (ch.size == 2) litStr(ch(1), "kernel") else "xxhash"
        ArrayOps.SimHash64(ch(0), kernel)
      },
      "64-bit SimHash of a token array; kernel 'xxhash' (default) or 'md5'"),
    ("graft_hyperplane_bucket",
      { ch =>
        arity(ch, 3, 4)
        val kernel = if (ch.size == 4) litStr(ch(3), "kernel") else "xxhash"
        viaColumns(c => V.hyperplaneLshBucket(c(0),
          litInt(ch(1), "nBits"), litInt(ch(2), "dim"), kernel))(ch)
      },
      "random-hyperplane LSH bucket of an embedding"),
    ("graft_token_count",
      { ch => arity(ch, 1); viaColumns(c => T.tokenCount(c(0)))(ch) },
      "whitespace token count"),
    ("graft_subword_count",
      { ch => arity(ch, 1); viaColumns(c => T.subwordCount(c(0)))(ch) },
      "GPT-2-style pre-tokenizer segment count (BPE estimate)"),
    ("graft_bpe_count",
      { ch => arity(ch, 1)
        graft.functions.Bpe.BpeCount(ch(0), graft.functions.Bpe.defaultMerges) },
      "real merge-loop BPE token count (bundled merges fixture)"),
    ("graft_bpe_count_bytes",
      { ch => arity(ch, 1)
        graft.functions.Bpe.BpeCount(ch(0), graft.functions.Bpe.defaultByteMerges,
          byteLevel = true) },
      "byte-level (GPT-2 bytes-to-unicode) BPE token count"),
    ("graft_bpe_ids",
      { ch => arity(ch, 1)
        graft.functions.Bpe.BpeIds(ch(0), graft.functions.Bpe.defaultByteMerges,
          graft.functions.Bpe.defaultByteVocab, byteLevel = true) },
      "byte-level BPE token ids (bundled merges+vocab pair)"),
    ("graft_bpe_decode",
      { ch => arity(ch, 1)
        graft.functions.Bpe.BpeDecode(ch(0), graft.functions.Bpe.defaultByteMerges,
          graft.functions.Bpe.defaultByteVocab, byteLevel = true) },
      "lossless byte-level decode of BPE token ids back to text"),
    ("graft_quality_score",
      { ch => arity(ch, 1); viaColumns(c => T.qualityScore(c(0)))(ch) },
      "composite text quality score in [0,1]"),
    ("graft_lang_id",
      { ch => arity(ch, 1); viaColumns(c => T.langId(c(0)))(ch) },
      "marker-token language id (en/de/fr/es/und)"),
    ("graft_fingerprint",
      { ch => arity(ch, 1); viaColumns(c => T.fingerprint(c(0)))(ch) },
      "order-invariant document fingerprint (md5 of sorted token set)"),
    ("graft_type_token_ratio",
      { ch => arity(ch, 1); viaColumns(c => T.typeTokenRatio(c(0)))(ch) },
      "distinct/total token ratio (repetition signal)"),
    ("graft_gopher_pass",
      { ch => arity(ch, 1); viaColumns(c => T.gopherPass(c(0)))(ch) },
      "Gopher-style structural quality gate"),
    ("graft_redact_pii",
      { ch => arity(ch, 1); viaColumns(c => T.redactPii(c(0)))(ch) },
      "scrub email/SSN/phone/IPv4 spans to <type> placeholders"),
    ("graft_dup_ngram_fraction",
      { ch => arity(ch, 2)
        viaColumns(c => bindOnce(T.normTokens(c(0)),
          ts => T.dupNgramFractionOfTokens(ts, litInt(ch(1), "n"))))(ch) },
      "fraction of word n-gram occurrences that repeat an earlier gram"),
    ("graft_top_token_fraction",
      { ch => arity(ch, 1)
        viaColumns(c => bindOnce(T.normTokens(c(0)),
          ts => T.topTokenFractionOfTokens(ts)))(ch) },
      "share of tokens equal to the single most frequent token"),
    ("graft_repetition_stats",
      { ch => arity(ch, 1)
        viaColumns(c => T.repetitionStats(T.normTokens(c(0))))(ch) },
      "struct(dup2_frac, dup3_frac, top_token_frac) in one O(tokens) pass"),
    ("graft_zvalue2",
      { ch => arity(ch, 6)
        viaColumns(c => graft.tables.Tables.zValue2(
          c(0), litDouble(ch(1), "aLo"), litDouble(ch(2), "aHi"),
          c(3), litDouble(ch(4), "bLo"), litDouble(ch(5), "bHi")))(ch) },
      "Morton (Z-order) key of two min-max-bucketed numeric columns"),
    ("graft_zvaluen",
      { ch =>
        if (ch.size < 6 || ch.size % 3 != 0)
          throw new IllegalArgumentException(
            "graft_zvaluen takes (col, lo, hi) triples — at least two")
        viaColumns { c =>
          graft.tables.Tables.zValueN(ch.indices.by(3).map(i =>
            (c(i), litDouble(ch(i + 1), s"lo#${i / 3}"),
              litDouble(ch(i + 2), s"hi#${i / 3}"))).toSeq)
        }(ch)
      },
      "N-column Morton key from (col, lo, hi) triples (floor(48/n) bits each)"),
    ("graft_html_to_text",
      { ch => arity(ch, 1)
        viaColumns(c => graft.functions.WebFunctions.htmlToText(c(0)))(ch) },
      "visible text of an HTML fragment (script/style/comment-aware, entity decode)"),
    ("graft_url_normalize",
      { ch => arity(ch, 1)
        viaColumns(c => graft.functions.WebFunctions.urlNormalize(c(0)))(ch) },
      "canonical URL: fragment + tracking params stripped, scheme/authority lowercased"),
    ("graft_url_host",
      { ch => arity(ch, 1)
        viaColumns(c => graft.functions.WebFunctions.urlHost(c(0)))(ch) },
      "lowercased host of a URL (credentials/port stripped)"),
    ("graft_url_domain",
      { ch => arity(ch, 1)
        viaColumns(c => graft.functions.WebFunctions.urlDomain(c(0)))(ch) },
      "registered domain (last two host labels)"),
    ("graft_pack_sq8",
      // integral arrays coerce via the cast; non-array / non-castable
      // input fails analysis (PackSQ8.checkInputDataTypes), never
      // reaching ArrayData.getInt at the wrong element width
      { ch => arity(ch, 1)
        viaColumns(c => graft.functions.Sq8.packSq8(
          c(0).cast("array<int>")))(ch) },
      "pack int8 quantization codes (array<int> in [-128,127]) into binary"),
    ("graft_unpack_sq8",
      { ch => arity(ch, 2)
        viaColumns(c => graft.functions.Sq8.unpackSq8(c(0), c(1).cast("double")))(ch) },
      "dequantize packed SQ8 codes with a per-row scale to array<double>"),
    // the sketch AGGREGATES (QuantileSketch.sketchAgg/sketchMerge) are
    // Aggregators, exposed through the Column API like topKByScore /
    // vectorCentroid; the scalar extraction is registrable here
    ("graft_sketch_quantile",
      { ch => arity(ch, 2)
        viaColumns(c => graft.functions.QuantileSketch.sketchQuantile(
          c(0), litDouble(ch(1), "q")))(ch) },
      "quantile estimate from a mergeable quantile-sketch struct"),
    // the KMV theta-sketch AGGREGATES (ThetaSketch.thetaSketch /
    // thetaUnion) are Aggregators, exposed through the Column API; the
    // scalar set-algebra estimators are registrable here
    // the sketch is a struct(k, vs) carrying its build-time k, so the
    // estimators take no k argument — a mismatched pair raises
    ("graft_theta_estimate",
      { ch => arity(ch, 1)
        viaColumns(c => graft.functions.ThetaSketch.thetaEstimate(c(0)))(ch) },
      "distinct-count estimate of a KMV theta sketch (exact below its k)"),
    ("graft_theta_jaccard",
      { ch => arity(ch, 2)
        viaColumns(c => graft.functions.ThetaSketch.thetaJaccard(
          c(0), c(1)))(ch) },
      "Jaccard estimate of two KMV theta sketches"),
    ("graft_theta_intersect",
      { ch => arity(ch, 2)
        viaColumns(c => graft.functions.ThetaSketch.thetaIntersect(
          c(0), c(1)))(ch) },
      "|A ∩ B| estimate of two KMV theta sketches"),
    ("graft_theta_anotb",
      { ch => arity(ch, 2)
        viaColumns(c => graft.functions.ThetaSketch.thetaANotB(
          c(0), c(1)))(ch) },
      "|A \\ B| estimate of two KMV theta sketches (clamped at 0)"),
    ("graft_nfc",
      { ch => arity(ch, 1); graft.functions.UnicodeNorm.NfcNormalize(ch(0)) },
      "Unicode NFC canonical composition (crawl-ingest canonicalization)"),
    ("graft_strip_accents",
      { ch => arity(ch, 1); graft.functions.UnicodeNorm.StripAccents(ch(0)) },
      "accent folding: NFD-decompose then drop combining marks"))

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(GraftFunctions.getClass.getName, null, name, usage, "")

  /** Register every graft function into a live session. Idempotent. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b, usage) =>
      Bridge.registerFunction(spark, name, info(name, usage), b)
    }

  /** The `SparkSessionExtensions` hook body — shared by
    * [[GraftExtensions]] so config-based and programmatic registration
    * stay identical.
    */
  def inject(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, b, usage) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), b))
    }
}

/** `spark.sql.extensions=graft.GraftExtensions` — the standard way to
  * ship a Spark-native library's SQL surface (same mechanism Delta/
  * Iceberg use). Also usable as `builder.withExtensions(new
  * GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
