package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** SentencePiece-style UNIGRAM LM tokenizer (Kudo 2018) — the other
  * mainstream subword family next to [[Bpe]]: a piece vocabulary with
  * log-probabilities; each whitespace word segments into the piece
  * sequence maximizing total log-prob (Viterbi over word positions).
  *
  * All scores are INTEGER MICRO-NATS (`round(ln(p) * 1e6)`): the DP
  * sums, comparisons, and per-doc totals are exact 64-bit integer
  * arithmetic — order-free, tie-break well-defined (max log-prob, then
  * fewest pieces), and bit-replicable by any engine including the
  * DuckDB oracle's recursive-CTE Viterbi. Characters absent from the
  * vocabulary fall back to a constant-score UNK single-char piece, so
  * every word segments.
  *
  * The reference pipeline has no tokenizer (stateless per-message
  * transforms, `src/processor.js`); this is LLM-training-data surface.
  */
object Unigram {

  /** UNK single-char fallback score: ~e^-23 — below any real piece in
    * any realistic corpus, so it never outcompetes vocabulary pieces.
    */
  val UnkMicroNats: Long = -23000000L

  /** Integer-Viterbi word segmenter over a micro-nat piece vocabulary.
    * Serializable: the vocab map rides into tasks with the expression
    * (seed vocabularies are hundreds of entries; broadcast a handle for
    * 100k-piece production vocabs, like [[Bpe.BpeCountBroadcast]]).
    */
  final class Segmenter(val vocab: Map[String, Long],
      val unkMicro: Long = UnkMicroNats) extends Serializable {
    @transient private lazy val maxLen =
      if (vocab.isEmpty) 1 else math.max(1, vocab.keysIterator.map(_.length).max)

    /** (total micro-nats, piece count) of the best segmentation. */
    def segmentWord(w: String): (Long, Long) = {
      val n = w.length
      if (n == 0) return (0L, 0L)
      val NEG = Long.MinValue
      val dp = Array.fill(n + 1)(NEG)
      val np = new Array[Long](n + 1)
      dp(0) = 0L
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - maxLen)
        while (j < i) {
          if (dp(j) != NEG) {
            val lp = vocab.get(w.substring(j, i)) match {
              case Some(p) => p
              case None => if (i - j == 1) unkMicro else NEG
            }
            if (lp != NEG) {
              val cand = dp(j) + lp
              if (cand > dp(i) || (cand == dp(i) && np(j) + 1 < np(i))) {
                dp(i) = cand
                np(i) = np(j) + 1
              }
            }
          }
          j += 1
        }
        i += 1
      }
      (dp(n), np(n))
    }
  }

  /** Per-doc unigram score of a TOKEN ARRAY column (feed it
    * [[TextFunctions.normTokens]], so tokenization is Spark's own):
    * struct(lp_micro, n_pieces) summed over the doc's token instances.
    * Integer sums — deterministic under any partitioning / order.
    *
    * Words repeat heavily across a corpus, so each task memoizes
    * per-word results in a bounded per-thread cache (same discipline as
    * [[Bpe]]'s segment LRU).
    */
  case class UnigramScore(child: Expression, vocab: Map[String, Long],
      unkMicro: Long) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("lp_micro", LongType, nullable = false),
      StructField("n_pieces", LongType, nullable = false)))

    @transient private lazy val seg = new Segmenter(vocab, unkMicro)
    // ThreadLocal: a CodegenFallback expression instance is shared across
    // tasks in one executor JVM; per-thread maps need no locks
    @transient private lazy val cache =
      new ThreadLocal[java.util.LinkedHashMap[String, (Long, Long)]] {
        override def initialValue() =
          new java.util.LinkedHashMap[String, (Long, Long)](1024, 0.75f, true) {
            override def removeEldestEntry(
                e: java.util.Map.Entry[String, (Long, Long)]): Boolean =
              size() > 65536
          }
      }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val c = cache.get()
      var lp = 0L
      var np = 0L
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val w = arr.getUTF8String(i).toString
          var r = c.get(w)
          if (r == null) { r = seg.segmentWord(w); c.put(w, r) }
          lp += r._1
          np += r._2
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](lp, np))
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def unigramScore(tokens: Column, vocab: Map[String, Long],
      unkMicro: Long = UnkMicroNats): Column =
    Bridge.column(UnigramScore(Bridge.expression(tokens), vocab, unkMicro))
}
