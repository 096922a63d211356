package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Corpus heavy hitters (frequent tokens) via the standard two-pass
  * distributed shape: a per-partition Misra-Gries summary proposes a
  * small candidate set, then an exact recount of ONLY the candidates
  * produces exact counts.
  *
  * Why not a plain `groupBy(term).count()`: with map-side combine the
  * shuffle still carries (partitions × distinct-terms-per-partition)
  * rows — at a 10M-token vocabulary over 1000 partitions that is
  * billions of shuffle rows to answer "which 50 tokens dominate". The
  * MG pass caps the shuffle at partitions × sketchSize rows, and the
  * recount's shuffle carries only rows whose term is a candidate
  * (broadcast semi join prunes the rest at the scan).
  *
  * Guarantee (classic MG union bound): any term with global occurrence
  * count > totalTokens / (sketchSize + 1) is heavy in at least one
  * partition and therefore survives into the candidate set. Choose
  * `sketchSize > 1 / minFraction` and recall is exact; the recount then
  * removes false candidates, so the output is EXACTLY the terms with
  * count >= minFraction · totalTokens.
  *
  * The reference engine has no aggregation surface at all (its only
  * counters are Prometheus metrics); this is a north-star text-analysis
  * operator.
  */
object HeavyHitters {

  /** Exact (term, cnt) for every token with
    * `cnt >= minFraction * totalTokens`. Two passes over the corpus —
    * the token explode is recomputed rather than cached: at 100 TB the
    * exploded relation dwarfs memory, and a scan + codegen'd split is
    * cheaper than spilling it.
    */
  def topTokens(docs: DataFrame, textCol: String,
      minFraction: Double, sketchSize: Int = 4096): DataFrame = {
    require(minFraction > 0 && minFraction <= 1, "minFraction in (0, 1]")
    require(sketchSize > 1 / minFraction,
      s"sketchSize $sketchSize cannot guarantee recall at minFraction " +
        s"$minFraction — need > ${(1 / minFraction).toInt}")
    val spark = docs.sparkSession
    import spark.implicits._
    val terms = docs.select(explode(T.normTokens(col(textCol))).as("term"))
    // pass 1: Misra-Gries per partition, union of summaries = candidates
    val candidates = terms.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        if (m.contains(t)) m(t) += 1
        else if (m.size < sketchSize) m(t) = 1L
        else {
          // the classic MG step: decrement all k counters, drop zeros
          val dead = List.newBuilder[String]
          m.foreach { case (k, v) => if (v == 1) dead += k else m(k) = v - 1 }
          dead.result().foreach(m.remove)
        }
      }
      m.keysIterator
    }.toDF("term").distinct()
    // pass 2: exact recount of candidates only; the total token count
    // rides alongside as a one-row broadcast so the threshold is exact —
    // computed as sum(size(tokens)) per doc, which never explodes
    val total = docs
      .agg(sum(size(T.normTokens(col(textCol)))).as("total"))
    terms.join(broadcast(candidates), Seq("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt").cast("double") >= lit(minFraction) * col("total").cast("double"))
      .select(col("term"), col("cnt"))
  }
}
