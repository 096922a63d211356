package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Model-based quality filtering trained on the corpus itself: the
  * fastText/CCNet recipe ("train a cheap linear classifier on weak
  * labels, score everything") reduced to pure relational algebra so the
  * training pass IS a Spark aggregation — no external ML runtime, no
  * driver-side model fit, and the whole thing re-trains in one job on
  * each corpus snapshot.
  *
  * The reference pipeline has no model-based filtering (its processors
  * are stateless per-message transforms, `src/processor.js`); this is
  * part of the LLM-training-data surface layered on top.
  */
object Classifier {

  /** Multinomial Naive Bayes quality classifier, trained with weak
    * supervision from the Gopher heuristic ([[T.gopherPass]]) and scored
    * over the same corpus — the standard bootstrap when no labeled
    * quality data exists (CCNet uses Wikipedia-vs-crawl the same way;
    * here the weak labeler is in-corpus so the oracle can replay it).
    *
    * Math (add-one smoothing everywhere, so zero-shot tokens and empty
    * classes are defined): per token `w`,
    * `llr(w) = ln((c_pos+1)/(T_pos+V)) − ln((c_neg+1)/(T_neg+V))`; per
    * doc, `nb_score = ln((D_pos+1)/(D_neg+1)) + Σ_occurrences llr(w)`
    * and `predicted_pass = nb_score > 0`. Docs with no tokens have no
    * evidence and are excluded (same contract as [[TrainingData.unigramLogProb]]).
    *
    * Scale shape: training is ONE corpus pass — a token-keyed
    * aggregation (map-side partial counts, vocabulary stays
    * distributed) whose vocabulary-sized result is what gets
    * checkpointed; the exploded corpus-sized token stream is never
    * materialized (an earlier version eagerly localCheckpoint'ed the
    * token stream itself and paid a scan-parallelism-bounded multi-GB
    * block write before any real work; tokenizing twice is far cheaper
    * than storing the tokens once). The five model scalars (class token
    * totals, vocab size, class doc counts) are read with one bounded
    * driver action and inlined as plan literals — the bounded-collect
    * discipline the other operators follow — so scoring is a plain
    * projection over the token stream joined to the vocabulary-sized
    * llr table (AQE broadcasts it when it fits, otherwise both sides
    * shuffle on the well-distributed token key) followed by one
    * doc-keyed aggregation.
    */
  def naiveBayesQuality(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val model = nbTrain(docs, idCol, textCol)
    nbScore(docs, idCol, textCol, model)
  }

  /** (id, label, pos, term) token stream. The weak label and the token
    * array are computed in their OWN projection below the explode: a
    * non-trivial expression placed next to a generator lands in the
    * Project ABOVE the Generate and re-evaluates per output TOKEN, not
    * per doc — measured 30× slower at sf0.1 (the r6 "fixed ~23 s stall":
    * every pass over `terms` was paying gopherPass × tokens). Below the
    * Generate, both evaluate once per doc and ride along as plain
    * attributes. `pos` is the token's position, so `pos == 0` marks each
    * doc exactly once (the doc-count trick in [[nbTrain]]).
    */
  private def termsOf(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = docs
    .filter(col(textCol).isNotNull)
    .select(col(idCol), T.gopherPass(col(textCol)).as("label"),
      T.normTokens(col(textCol)).as("__toks"))
    .select(col(idCol), col("label"),
      posexplode(col("__toks")).as(Seq("pos", "term")))

  /** Training half of [[naiveBayesQuality]]: the persisted-model form.
    * Returns the model AS a DataFrame, so it round-trips through parquet
    * with the same probe-and-append discipline as the dedup indexes
    * ([[Dedup.minhashIndex]] etc.): one row per vocabulary term —
    * `(term, llr)` — plus ONE metadata row with `term = NULL` carrying
    * the class prior `ln((D_pos+1)/(D_neg+1))` (normTokens never yields
    * null, so the slot cannot collide with a real term).
    *
    * The exploded token stream exists only as a streaming input to the
    * token-keyed count aggregation; what persists is vocabulary-sized.
    */
  def nbTrain(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = termsOf(docs, idCol, textCol)
    // ONE corpus pass: the vocabulary-sized token-keyed agg ALSO carries
    // the per-doc class counts — each doc with ≥1 token contributes
    // exactly one pos==0 row, so summing the pos==0 markers over the
    // vocab table recovers (D_pos, D_neg) without a second scan or a
    // distinct shuffle
    val counts = terms.groupBy("term").agg(
      sum(when(col("label"), 1L).otherwise(0L)).as("c_pos"),
      sum(when(!col("label"), 1L).otherwise(0L)).as("c_neg"),
      sum(when(col("pos") === 0 && col("label"), 1L).otherwise(0L)).as("__dp"),
      sum(when(col("pos") === 0 && !col("label"), 1L).otherwise(0L)).as("__dn"))
      .localCheckpoint(true)
    // one bounded driver action: 5 longs
    val t = counts.agg(
      sum("c_pos").as("t_pos"), sum("c_neg").as("t_neg"), count(lit(1)).as("v"),
      sum("__dp").as("d_pos"), sum("__dn").as("d_neg")).head()
    def l(i: Int): Long = if (t.isNullAt(i)) 0L else t.getLong(i)
    val (tPos, tNeg, v, dPos, dNeg) = (l(0), l(1), t.getLong(2), l(3), l(4))
    val prior = math.log((dPos + 1).toDouble / (dNeg + 1).toDouble)
    counts.select(col("term"),
      (log((col("c_pos") + 1).cast("double") / lit((tPos + v).toDouble)) -
        log((col("c_neg") + 1).cast("double") / lit((tNeg + v).toDouble)))
        .as("llr"))
      .unionByName(counts.sparkSession.range(1)
        .select(lit(null).cast("string").as("term"), lit(prior).as("llr")))
  }

  /** Scoring half: score `docs` against a persisted `model` (the
    * [[nbTrain]] output, possibly read back from parquet). Tokens absent
    * from the model vocabulary carry no evidence and are skipped (the
    * same contract as [[TrainingData.unigramLogProb]]); docs with no
    * in-vocabulary tokens are excluded. When the model was trained on a
    * corpus containing the scored docs, this reproduces
    * [[naiveBayesQuality]] restricted to them exactly.
    */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    // one bounded driver action: the single metadata row
    val prior = model.filter(col("term").isNull)
      .select(col("llr")).head().getDouble(0)
    val llr = model.filter(col("term").isNotNull)
      .select(col("term"), col("llr").as("__llr"))
    termsOf(docs, idCol, textCol)
      .join(llr, Seq("term"))
      .groupBy(col(idCol), col("label"))
      .agg(count(lit(1)).as("n_tokens_scored"), sum("__llr").as("__sum"))
      .select(col(idCol), col("label"), col("n_tokens_scored"),
        (lit(prior) + col("__sum")).as("nb_score"))
      .withColumn("predicted_pass", col("nb_score") > 0)
  }
}
