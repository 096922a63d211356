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
    * Scale shape: training is ONE token-keyed aggregation (map-side
    * partial counts, vocabulary stays distributed); the three scalar
    * totals (class token totals, vocab size, class doc counts) are
    * single-row broadcasts. Scoring re-joins the token stream to the
    * vocabulary-sized llr table on the token key — AQE broadcasts it
    * when it fits, otherwise both sides shuffle on the well-distributed
    * token key — then one doc-keyed aggregation. The token stream is
    * checkpointed once and feeds both passes, so the corpus is read and
    * tokenized exactly once.
    */
  def naiveBayesQuality(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val terms = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), T.gopherPass(col(textCol)).as("label"),
        explode(T.normTokens(col(textCol))).as("term"))
      .localCheckpoint(true)
    val counts = terms.groupBy("term").agg(
      sum(when(col("label"), 1L).otherwise(0L)).as("c_pos"),
      sum(when(!col("label"), 1L).otherwise(0L)).as("c_neg"))
    val totals = counts.agg(
      sum("c_pos").as("t_pos"), sum("c_neg").as("t_neg"),
      count(lit(1)).as("v"))
    val docTotals = terms.select(col(idCol), col("label")).distinct().agg(
      sum(when(col("label"), 1L).otherwise(0L)).as("d_pos"),
      sum(when(!col("label"), 1L).otherwise(0L)).as("d_neg"))
    val llr = counts.crossJoin(broadcast(totals)).select(
      col("term"),
      (log((col("c_pos") + 1).cast("double") /
          (col("t_pos") + col("v")).cast("double")) -
        log((col("c_neg") + 1).cast("double") /
          (col("t_neg") + col("v")).cast("double"))).as("__llr"))
    val prior = log((col("d_pos") + 1).cast("double") /
      (col("d_neg") + 1).cast("double"))
    terms
      .join(llr, Seq("term"))
      .groupBy(col(idCol), col("label"))
      .agg(count(lit(1)).as("n_tokens_scored"), sum("__llr").as("__sum"))
      .crossJoin(broadcast(docTotals))
      .select(col(idCol), col("label"), col("n_tokens_scored"),
        (prior + col("__sum")).as("nb_score"))
      .withColumn("predicted_pass", col("nb_score") > 0)
  }
}
