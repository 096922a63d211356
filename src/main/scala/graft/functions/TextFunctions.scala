package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM training-data pipelines.
  *
  * Everything here composes built-in `org.apache.spark.sql.functions`
  * (codegen'd, null-safe), never Scala UDFs — at 100 TB these run inside
  * whole-stage codegen on the scan projection with zero extra passes.
  *
  * The reference engine's only string ops are upper/reverse/concat
  * (reference src/transformations directory); this module is the
  * north-star text-analysis extension (BASELINE.json).
  */
object TextFunctions {

  /** Whitespace tokenization of trimmed text. `split` on empty string
    * yields Array("") — guard so blank text tokenizes to an empty array.
    */
  def tokens(text: Column): Column = {
    val t = trim(text)
    when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** GPT-2-style pre-tokenizer segment pattern: contractions, letter
    * runs, digit runs, punctuation runs (each with an optional leading
    * space), whitespace runs. Kept RE2-compatible (no lookahead) so SQL
    * engines replicate it byte-for-byte.
    */
  val subwordPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-ish token-count estimate for data budgeting: counts GPT-2
    * pre-tokenizer segments (every BPE token boundary is also a
    * pre-token boundary, so this lower-bounds the true BPE count;
    * English text runs ~1.3 BPE tokens per segment). Codegen'd
    * regexp_count — no UDF.
    */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit(subwordPattern))

  /** Lowercased whitespace tokens — canonical form for dedup/fingerprints. */
  def normTokens(text: Column): Column = tokens(lower(text))

  /** Character n-grams ("shingles") of the whitespace-normalized,
    * lowercased text — the standard MinHash input unit.
    *
    * Built from n shifted char arrays zipped with `concat`, NOT
    * `transform(sequence(...), i => norm.substr(i, n))`: a lambda body
    * that references an outer expression re-evaluates it PER ELEMENT
    * (the regexp normalization would run len× per row — measured 10×
    * slower at sf0.1). Here every lambda touches only lambda variables;
    * the shifted arrays are plain per-row arguments.
    */
  def charShingles(text: Column, n: Int): Column =
    charShinglesOfChars(normChars(text), n)

  /** Normalized text as a char array — compute this ONCE in its own
    * projection (`.select(normChars(...).as("chars")).select(
    * charShinglesOfChars(col("chars"), n))`) when shingling large data:
    * the n-gram builders reference their input n+1 times, and an
    * attribute reference is free while re-evaluating the regex chain per
    * slice is not. (CollapseProject keeps the boundary: it never inlines
    * a non-cheap expression referenced more than once.)
    */
  def normChars(text: Column): Column =
    split(regexp_replace(trim(lower(text)), "\\s+", " "), "")

  /** Shingles from a pre-split char array: n shifted slices zipped with
    * `concat`. Every lambda touches only lambda variables — a lambda body
    * that references an outer expression re-evaluates it PER ELEMENT
    * (the earlier `transform(sequence, i => norm.substr(i, n))` form ran
    * the regex normalization len× per row; measured 10× slower at sf0.1).
    */
  def charShinglesOfChars(chars: Column, n: Int): Column = {
    val m = size(chars) - (n - 1) // shingle count (may be <= 0)
    val parts = (0 until n).map(k => slice(chars, lit(k + 1), greatest(m, lit(0))))
    val joined = parts.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, y)))
    when(m <= 0, array().cast("array<string>"))
      .otherwise(array_distinct(joined))
  }

  /** Word n-grams over normalized tokens. */
  def wordNgrams(text: Column, n: Int): Column =
    wordNgramsOfTokens(normTokens(text), n)

  /** N-grams from a pre-tokenized array — same shifted-slice construction
    * (and the same per-element re-evaluation trap) as
    * [[charShinglesOfChars]].
    */
  def wordNgramsOfTokens(ts: Column, n: Int): Column =
    array_distinct(wordNgramsAllOfTokens(ts, n))

  /** Punctuation character ratio (explicit class, locale-free). */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    val noPunct = length(regexp_replace(text, "[.,!?;:'\"()\\[\\]-]", ""))
    when(n === 0, lit(0.0)).otherwise((n - noPunct).cast("double") / n.cast("double"))
  }

  private val StopwordsEn = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "that", "for", "on", "with", "as")

  /** Fraction of tokens that are (English) stopwords — a standard quality
    * signal: natural prose sits around 0.2–0.5, keyword spam near 0.
    */
  def stopwordRatio(text: Column): Column = {
    val ts = normTokens(text)
    val stops = filter(ts, t => t.isin(StopwordsEn: _*))
    when(size(ts) === 0, lit(0.0))
      .otherwise(size(stops).cast("double") / size(ts).cast("double"))
  }

  def avgWordLen(text: Column): Column = {
    val ts = normTokens(text)
    when(size(ts) === 0, lit(0.0))
      .otherwise(aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(ts).cast("double"))
  }

  /** Composite quality score in [0,1]: length signal, stopword signal,
    * penalty for punctuation spam. Deterministic and SQL-expressible so
    * the DuckDB oracle can replicate it exactly.
    */
  def qualityScore(text: Column): Column = {
    val lenSig = least(length(text).cast("double") / 500.0, lit(1.0))
    val stopSig = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punctPen = greatest(lit(1.0) - punctRatio(text) * 5.0, lit(0.0))
    round((lenSig * 0.4 + stopSig * 0.4 + punctPen * 0.2), 6)
  }

  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "de" -> Seq(" der ", " und ", " die ", " ist "),
    "fr" -> Seq(" le ", " et ", " les ", " est "),
    "es" -> Seq(" el ", " y ", " los ", " es "))

  private def occurrences(hay: Column, needle: String): Column =
    ((length(hay) - length(replace(hay, lit(needle), lit("")))) /
      lit(needle.length)).cast("int")

  /** Marker-token language ID heuristic: count per-language stopword
    * occurrences in the padded lowercase text, argmax with 'und'
    * (undetermined) when nothing matches. An n-gram-frequency model needs
    * external tables; marker tokens are the standard lightweight fallback
    * and replicate exactly in the SQL oracle.
    */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scores = LangMarkers.map { case (lang, ms) =>
      lang -> ms.map(occurrences(padded, _)).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in LangMarkers order) reaching the max wins — the
    // SQL oracle replicates this as a CASE chain in the same order
    scores.reverse.foldLeft(lit("und"): Column) { case (acc, (lang, s)) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Document fingerprint: md5 of the sorted distinct normalized token
    * set — word-order- and whitespace-invariant, so near-identical docs
    * that only shuffle words collide. Cheap first-pass dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(normTokens(text))), " "))

  /** Type-token ratio (distinct tokens / total tokens) — the standard
    * repetition signal: template spam and keyword stuffing sit near 0,
    * natural prose higher.
    */
  def typeTokenRatio(text: Column): Column = {
    val ts = normTokens(text)
    when(size(ts) === 0, lit(0.0))
      .otherwise(size(array_distinct(ts)).cast("double") / size(ts).cast("double"))
  }

  /** Word n-grams WITH repeats (no dedup) — the input unit for repetition
    * metrics, where duplicate grams are the signal, not noise.
    */
  def wordNgramsAllOfTokens(ts: Column, n: Int): Column = {
    val m = size(ts) - (n - 1)
    val parts = (0 until n).map(k => slice(ts, lit(k + 1), greatest(m, lit(0))))
    val joined = parts.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
    when(m <= 0, array().cast("array<string>")).otherwise(joined)
  }

  /** Fraction of word n-gram OCCURRENCES that are repeats of an earlier
    * gram: `(total - distinct) / total` (Rae et al. 2021 §A1.1 "duplicate
    * n-gram fraction"). Template spam repeats whole phrases, so this
    * catches what [[typeTokenRatio]] (unigrams) misses.
    *
    * Takes a pre-split token array: compute `normTokens` ONCE in its own
    * projection — the gram builder references its input n+1 times, and a
    * lambda body that references a non-attribute outer expression
    * re-evaluates it per element.
    */
  def dupNgramFractionOfTokens(ts: Column, n: Int): Column = {
    val gs = wordNgramsAllOfTokens(ts, n)
    when(size(gs) === 0, lit(0.0))
      .otherwise((size(gs) - size(array_distinct(gs))).cast("double") /
        size(gs).cast("double"))
  }

  /** Fraction of tokens equal to the single most frequent token (Gopher's
    * "top unigram fraction" repetition signal). O(tokens × distinct) per
    * row via nested HOFs — fine for document-length rows; a corpus-scale
    * variant would explode + groupBy instead. The inner lambda touches
    * only lambda variables and the token-array ATTRIBUTE, so nothing
    * non-trivial re-evaluates per element — pass a pre-split token array
    * column, not an expression.
    */
  def topTokenFractionOfTokens(ts: Column): Column = {
    val counts = transform(array_distinct(ts), u => size(filter(ts, t => t === u)))
    when(size(ts) === 0, lit(0.0))
      .otherwise(array_max(counts).cast("double") / size(ts).cast("double"))
  }

  /** One-pass native form of the three repetition signals
    * ([[dupNgramFractionOfTokens]] ×2 + [[topTokenFractionOfTokens]]):
    * O(tokens) with per-row hash sets instead of the HOF forms'
    * O(tokens × distinct) nested scans — same values bit-for-bit (exact
    * integer counts, one final double division each), asserted against
    * the HOF forms in TextFunctionsSpec. Use this on the hot path; the
    * HOF forms remain the SQL-shaped reference.
    */
  def repetitionStats(ts: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(RepetitionStats(
      org.apache.spark.sql.graft.Bridge.expression(ts)))

  case class RepetitionStats(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    override def dataType: org.apache.spark.sql.types.DataType = StructType(Seq(
      StructField("dup2_frac", DoubleType, nullable = false),
      StructField("dup3_frac", DoubleType, nullable = false),
      StructField("top_token_frac", DoubleType, nullable = false)))

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = arr.numElements()
      val toks = new Array[String](n)
      var i = 0
      while (i < n) {
        toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).toString
        i += 1
      }
      def dupFrac(g: Int): Double = {
        val total = n - g + 1
        if (total <= 0) 0.0
        else {
          val seen = new java.util.HashSet[String](total * 2)
          val sb = new java.lang.StringBuilder
          var j = 0
          var dups = 0
          while (j < total) {
            sb.setLength(0)
            var k = 0
            while (k < g) {
              if (k > 0) sb.append('\u0000')
              sb.append(toks(j + k))
              k += 1
            }
            if (!seen.add(sb.toString)) dups += 1
            j += 1
          }
          dups.toDouble / total.toDouble
        }
      }
      val top = if (n == 0) 0.0 else {
        val counts = new java.util.HashMap[String, Int](n * 2)
        var j = 0
        var max = 0
        while (j < n) {
          val c = counts.merge(toks(j), 1, (a, b) => a + b)
          if (c > max) max = c
          j += 1
        }
        max.toDouble / n.toDouble
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](dupFrac(2), dupFrac(3), top))
    }

    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression)
        : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = c)
  }

  /** PII patterns, applied in this order. RE2-safe (no lookaround, ASCII
    * `\b`) so DuckDB/Trino-class engines replicate the scrub
    * byte-for-byte. Email runs first so its digit runs can't also feed
    * the phone/IP patterns.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    // two top-level alternatives: `\b` before `\(` can never match (both
    // sides non-word), so the parenthesized form anchors on `\(` itself
    "phone" -> "\\(\\d{3}\\)[ .-]?\\d{3}[ .-]\\d{4}\\b|\\b\\d{3}[ .-]\\d{3}[ .-]\\d{4}\\b",
    "ipv4" -> "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b")

  /** Redact PII spans with `<type>` placeholders — the standard scrub
    * pass before training-data release. Sequential `regexp_replace`
    * chain, codegen'd, one pass per pattern.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (t, (name, p)) =>
      regexp_replace(t, p, s"<$name>")
    }

  /** Count of PII matches by type, counted sequentially on the
    * progressively redacted text (so one span never counts under two
    * types — matching [[redactPii]]'s replacement order exactly).
    * Returns the per-type counts in [[piiPatterns]] order.
    */
  def piiCounts(text: Column): Seq[Column] = {
    val (counts, _) = piiPatterns.foldLeft((Seq.empty[Column], text)) {
      case ((acc, t), (name, p)) =>
        (acc :+ regexp_count(t, lit(p)).as(s"n_$name"),
          regexp_replace(t, p, s"<$name>"))
    }
    counts
  }

  /** Gopher-style structural quality gate (Rae et al. 2021 §A1.1 subset
    * that needs no external tables): word count within bounds and mean
    * word length within bounds. Composes with [[qualityScore]] /
    * [[typeTokenRatio]] for the full filter chain.
    */
  def gopherPass(text: Column, minWords: Int = 50, maxWords: Int = 100000,
      minAvgLen: Double = 3.0, maxAvgLen: Double = 10.0): Column =
    tokenCount(text).between(minWords, maxWords) &&
      avgWordLen(text).between(minAvgLen, maxAvgLen)
}
