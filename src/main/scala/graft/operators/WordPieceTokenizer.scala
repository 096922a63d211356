package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T, WordPiece}

/** Corpus-seeded WordPiece tokenizer (the greedy longest-match family
  * next to [[UnigramTokenizer]]'s Viterbi and [[graft.tools.TrainBpe]]'s
  * merge loop): build start/continuation piece vocabularies from
  * position-split substring frequencies, then greedily segment every
  * doc. The seed heuristic mirrors [[UnigramTokenizer.seedVocab]] —
  * all single characters (split by position kind) plus the top
  * `vocabSize` multi-char pieces by `count × (len−1)`; a real WordPiece
  * trainer's likelihood-driven selection would run on top, and the
  * scoring path here is exactly what a TRAINED vocabulary needs at
  * inference scale.
  *
  * Scale shape: substring candidates explode scan-side (bounded —
  * `maxPieceLen` per position), ONE (piece, kind)-keyed count
  * aggregation (map-side combined), a TakeOrdered top-k for the
  * multi-char selection; only the SELECTED vocab is collected (bounded:
  * ≤ 2×alphabet + `vocabSize` rows). Encoding is one narrow projection
  * (native greedy expression with a per-task word cache,
  * [[WordPiece.WordPieceEncode]]) — no shuffle until the caller
  * aggregates.
  */
object WordPieceTokenizer {

  /** Frequency-seeded start/continuation vocabularies: all single chars
    * observed at each position kind, plus the top `vocabSize` multi-char
    * (piece, kind) pairs by `count × (len−1)` (ties by piece then kind —
    * start before continuation).
    */
  def seedVocab(docs: DataFrame, textCol: String,
      maxPieceLen: Int = 4, vocabSize: Int = 200)
      : (Set[String], Set[String]) = {
    require(maxPieceLen >= 1, "maxPieceLen >= 1")
    require(vocabSize >= 0, "vocabSize >= 0")
    // substring counting runs over DISTINCT words weighted by their
    // multiplicity (the BPE distinct-segment discipline) — identical
    // counts to per-instance enumeration at a fraction of the explode
    // volume; per distinct word, every substring of length
    // 1..maxPieceLen, tagged 0 = word start (i == 1), 1 = continuation —
    // lambdas touch only ATTRIBUTES, so nothing re-evaluates per element
    val words = docs.filter(col(textCol).isNotNull)
      .select(explode(T.normTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("__m"))
    val counts = words
      .select(col("__m"), explode(flatten(transform(
        sequence(lit(1), length(col("w"))),
        i => transform(
          sequence(lit(1), least(lit(maxPieceLen), length(col("w")) - i + 1)),
          l => struct(col("w").substr(i, l).as("p"),
            when(i === 1, 0).otherwise(1).as("k")))))).as("pk"))
      .select(col("pk.p").as("p"), col("pk.k").as("k"), col("__m"))
      .groupBy("p", "k").agg(sum("__m").as("cnt"))
    val singles = counts.filter(length(col("p")) === 1)
    val multi = counts.filter(length(col("p")) > 1)
      .orderBy((col("cnt") * (length(col("p")) - 1)).desc,
        col("p").asc, col("k").asc)
      .limit(vocabSize)
    // bounded collect: <= 2×alphabet + vocabSize rows
    val sel = singles.select("p", "k").unionByName(multi.select("p", "k"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    (sel.collect { case (p, 0) => p }.toSet,
      sel.collect { case (p, 1) => p }.toSet)
  }

  /** Encode every doc against the start/continuation vocabularies: one
    * row per doc with ≥1 token — `(id, n_pieces, pieces)`, where a
    * digest of `pieces` is the engine-checkable segmentation (see
    * [[WordPiece.WordPieceEncode]]).
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      startV: Set[String], contV: Set[String]): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), T.normTokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol),
        WordPiece.wordpieceEncode(col("__toks"), startV, contV).as("__e"))
      .select(col(idCol),
        col("__e.n_pieces").as("n_pieces"),
        col("__e.pieces").as("pieces"))
}
