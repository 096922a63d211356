package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A Bloom filter built and probed with pure codegen'd column
  * expressions — no UDF, no driver-side hashing of the probe stream.
  *
  * Build is one `bit_or` aggregation over the (element, probe-index)
  * expansion; the resulting bit words (m/64 longs) are the ONLY thing
  * the driver holds, sized by the caller from the expected element
  * count. Probing folds k bit tests over the word array carried as one
  * array literal — whole-stage codegen keeps it in the scan projection,
  * so a 100 TB probe side filters before anything shuffles.
  *
  * Double hashing (Kirsch & Mitzenmacher 2006): position i is
  * `(h1 + i·h2) mod m` with `h1 = h mod m`, `h2 = xxhash64(h) mod m` —
  * the mod-first form keeps every intermediate below `k·m`, so the
  * arithmetic can never overflow under ANSI mode regardless of the raw
  * 64-bit hash values.
  */
object Bloom {

  /** Bit words for `numWords * 64` bits over the long column `hashCol`.
    * The collect is exactly `numWords` rows of one long each — the
    * caller budgets that (e.g. 1 M benchmark grams at 16 bits/elem =
    * 250 k words = 2 MB on the driver).
    */
  def build(hashes: DataFrame, hashCol: String, numWords: Int, k: Int)
      : Array[Long] = {
    require(numWords > 0 && k > 0, "need numWords > 0 and k > 0")
    val m = numWords * 64L
    val a = pmod(col(hashCol), lit(m))
    val b = pmod(xxhash64(col(hashCol)), lit(m))
    val rows = hashes
      .select(explode(transform(sequence(lit(0), lit(k - 1)),
        i => pmod(a + i.cast("long") * b, lit(m)))).as("p"))
      .select(shiftright(col("p"), 6).cast("int").as("w"),
        call_function("shiftleft", lit(1L),
          col("p").bitwiseAND(lit(63L)).cast("int")).as("mask"))
      .groupBy("w").agg(bit_or(col("mask")).as("bits"))
      .collect()
    val words = new Array[Long](numWords)
    rows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** True iff every one of `h`'s k bit positions is set — possibly-false
    * positives, never false negatives, for any `h` that went through
    * [[build]] with the same (numWords, k).
    */
  def mightContain(h: Column, words: Array[Long], k: Int): Column = {
    require(words.nonEmpty && k > 0, "need non-empty words and k > 0")
    val m = words.length * 64L
    val wordsLit = typedLit(words.toSeq)
    val a = pmod(h, lit(m))
    val b = pmod(xxhash64(h), lit(m))
    (0 until k).map { i =>
      val p = pmod(a + lit(i.toLong) * b, lit(m))
      element_at(wordsLit, shiftright(p, 6).cast("int") + lit(1))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          p.bitwiseAND(lit(63L)).cast("int"))) =!= lit(0L)
    }.reduce(_ && _)
  }
}
