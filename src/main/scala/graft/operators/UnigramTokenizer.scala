package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T, Unigram}

/** Corpus-seeded unigram tokenizer (the SentencePiece family next to the
  * BPE family in [[graft.tools.TrainBpe]]): build a piece vocabulary
  * from corpus substring frequencies, then Viterbi-segment every doc
  * against it. The seed heuristic is SentencePiece's starting point
  * (all single characters + the highest-value multi-char substrings,
  * valued by `count × (len−1)` — the EM prune iterations an external
  * trainer would run on top are out of scope; the seed already
  * tokenizes, and the scoring path is exactly what a TRAINED
  * SentencePiece model needs at inference scale).
  *
  * Scale shape: substring candidates explode scan-side (bounded —
  * `maxPieceLen` per position), one token-keyed count aggregation
  * (map-side combined), a TakeOrdered top-k for the multi-char
  * selection; only the SELECTED vocab (≤ alphabet + `vocabSize` rows)
  * is collected — the bounded-collect discipline of
  * [[Sampling.temperatureMixture]]. Scoring is one narrow projection
  * (native integer-Viterbi expression with a per-task word cache,
  * [[Unigram.UnigramScore]]) — no shuffle at all until the caller
  * aggregates.
  */
object UnigramTokenizer {

  /** Frequency-seeded micro-nat vocabulary: all single characters plus
    * the top `vocabSize` substrings of length 2..`maxPieceLen` by
    * `count × (len−1)` (ties by piece string), scored
    * `round(ln(count / selectedTotal) × 1e6)`.
    */
  def seedVocab(docs: DataFrame, textCol: String,
      maxPieceLen: Int = 4, vocabSize: Int = 200): Map[String, Long] = {
    require(maxPieceLen >= 1, "maxPieceLen >= 1")
    require(vocabSize >= 0, "vocabSize >= 0")
    // substring counting runs over DISTINCT words weighted by their
    // multiplicity (the BPE distinct-segment discipline) — identical
    // counts to per-instance enumeration at a fraction of the explode
    // volume; lambdas touch only ATTRIBUTES, so nothing re-evaluates
    val words = docs.filter(col(textCol).isNotNull)
      .select(explode(T.normTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("__m"))
    val counts = words
      .select(col("__m"), explode(flatten(transform(
        sequence(lit(1), length(col("w"))),
        i => transform(
          sequence(lit(1), least(lit(maxPieceLen), length(col("w")) - i + 1)),
          l => col("w").substr(i, l))))).as("p"))
      .groupBy("p").agg(sum("__m").as("cnt"))
    val singles = counts.filter(length(col("p")) === 1)
    val multi = counts.filter(length(col("p")) > 1)
      .orderBy((col("cnt") * (length(col("p")) - 1)).desc, col("p").asc)
      .limit(vocabSize)
    // bounded collect: <= alphabet size + vocabSize rows
    val sel = singles.unionByName(multi)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val total = sel.map(_._2).sum.toDouble
    sel.map { case (p, c) =>
      p -> math.round(math.log(c.toDouble / total) * 1e6)
    }.toMap
  }

  /** Score every doc against a micro-nat `vocab`: one row per doc with
    * ≥1 token — `(id, n_pieces, logprob)` where `logprob` is the summed
    * best-segmentation log-prob in nats (micro-exact: the division by
    * 1e6 is the only floating step, applied to an exact integer sum).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      vocab: Map[String, Long],
      unkMicro: Long = Unigram.UnkMicroNats): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), T.normTokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol),
        Unigram.unigramScore(col("__toks"), vocab, unkMicro).as("__s"))
      .select(col(idCol),
        col("__s.n_pieces").as("n_pieces"),
        (col("__s.lp_micro") / 1000000.0).as("logprob"))
}
