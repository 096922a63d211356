package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** WORDPIECE tokenizer (Schuster & Nakajima 2012; the BERT tokenizer's
  * inference rule) — the third mainstream subword family next to
  * [[Bpe]] and [[Unigram]]: each whitespace word segments greedily,
  * longest-match-first, with one vocabulary for word-START positions and
  * one for CONTINUATION positions (the "##" convention, kept as two
  * sets instead of a string prefix).
  *
  * Greedy matching is pure string arithmetic — no floats anywhere — so
  * the segmentation is trivially bit-replicable by any engine (the
  * DuckDB oracle replays it as a recursive CTE). A position with no
  * vocabulary match consumes one character (the UNK-as-itself fallback),
  * so every word segments deterministically.
  *
  * The reference pipeline has no tokenizer (stateless per-message
  * transforms, `src/processor.js`); this is LLM-training-data surface.
  */
object WordPiece {

  /** Greedy longest-match word segmenter over start/continuation piece
    * sets. Serializable: seed vocabularies are hundreds of entries and
    * ride into tasks with the expression (broadcast a handle for
    * 100k-piece production vocabs, like [[Bpe.BpeCountBroadcast]]).
    */
  final class Segmenter(val startV: Set[String], val contV: Set[String])
      extends Serializable {
    @transient private lazy val maxStart =
      if (startV.isEmpty) 1 else startV.iterator.map(_.length).max
    @transient private lazy val maxCont =
      if (contV.isEmpty) 1 else contV.iterator.map(_.length).max

    /** (piece count, pieces joined by the U+001F separator) of the greedy
      * segmentation.
      *
      * The match length is bounded by the LONGEST PIECE IN THIS VOCAB
      * (maxStart/maxCont above). Any fixed-length replay of the walk —
      * like the `text_wordpiece` DuckDB oracle, which hardcodes
      * `least(4, …)` to mirror `seedVocab(maxPieceLen = 4)` — is only
      * equivalent when its bound ≥ the vocab's true max piece length; a
      * trained or user-supplied vocabulary with longer pieces needs the
      * replay bound derived from the same vocabulary, not the seed
      * parameter.
      */
    def segmentWord(w: String): (Long, String) = {
      val sb = new java.lang.StringBuilder
      var pos = 0
      var n = 0L
      var first = true
      while (pos < w.length) {
        val vocab = if (first) startV else contV
        var l = math.min(if (first) maxStart else maxCont, w.length - pos)
        while (l > 1 && !vocab.contains(w.substring(pos, pos + l))) l -= 1
        // l == 1 falls through as the single-char (or UNK) fallback
        if (!first) sb.append('\u001f')
        sb.append(w, pos, pos + l)
        pos += l
        n += 1
        first = false
      }
      (n, sb.toString)
    }
  }

  /** Per-doc WordPiece encode of a TOKEN ARRAY column (feed it
    * [[TextFunctions.normTokens]], so tokenization is Spark's own):
    * struct(n_pieces, pieces) where `pieces` joins each word's piece
    * list with U+001F and the words with U+001E — a digest of it IS the
    * segmentation, checkable cross-engine.
    *
    * Words repeat heavily across a corpus, so each task memoizes
    * per-word results in a bounded per-thread cache (the [[Unigram]] /
    * [[Bpe]] segment-LRU discipline).
    */
  case class WordPieceEncode(child: Expression, startV: Set[String],
      contV: Set[String]) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("n_pieces", LongType, nullable = false),
      StructField("pieces", StringType, nullable = false)))

    @transient private lazy val seg = new Segmenter(startV, contV)
    @transient private lazy val cache =
      new ThreadLocal[java.util.LinkedHashMap[String, (Long, String)]] {
        override def initialValue() =
          new java.util.LinkedHashMap[String, (Long, String)](1024, 0.75f, true) {
            override def removeEldestEntry(
                e: java.util.Map.Entry[String, (Long, String)]): Boolean =
              size() > 65536
          }
      }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val c = cache.get()
      val sb = new java.lang.StringBuilder
      var n = 0L
      var i = 0
      var firstWord = true
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val w = arr.getUTF8String(i).toString
          var r = c.get(w)
          if (r == null) { r = seg.segmentWord(w); c.put(w, r) }
          if (!firstWord) sb.append('\u001e')
          sb.append(r._2)
          n += r._1
          firstWord = false
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](n, UTF8String.fromString(sb.toString)))
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def wordpieceEncode(tokens: Column, startV: Set[String],
      contV: Set[String]): Column =
    Bridge.column(WordPieceEncode(Bridge.expression(tokens), startV, contV))
}
