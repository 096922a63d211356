package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregations (`Aggregator[IN, BUF, OUT]`) — the engine's
  * UDAF surface (SURVEY §2.3 "UDF/UDAF/UDTF" row). An Aggregator gets
  * partial aggregation (map-side combine) for free: at 100 TB the shuffle
  * carries one buffer per group per partition, never raw rows.
  */
object Aggregators {

  /** Mutable running sum of `dim` vector components + count. */
  final case class CentroidBuffer(sums: Array[Double], var n: Long)

  /** Per-group mean vector (centroid) of an `array<double>` column —
    * the building block for embedding clustering / IVF coarse quantizers.
    */
  final class VectorCentroid(dim: Int)
      extends Aggregator[Seq[Double], CentroidBuffer, Seq[Double]] {
    override def zero: CentroidBuffer = CentroidBuffer(Array.fill(dim)(0.0), 0L)
    override def reduce(b: CentroidBuffer, v: Seq[Double]): CentroidBuffer = {
      if (v != null) {
        // fail loudly: a short vector would IndexOutOfBounds mid-job and
        // a long one would silently contribute only its prefix
        if (v.length != dim) throw new IllegalArgumentException(
          s"vectorCentroid(dim=$dim) got a length-${v.length} vector")
        var i = 0
        while (i < dim) { b.sums(i) += v(i); i += 1 }
        b.n += 1
      }
      b
    }
    override def merge(a: CentroidBuffer, b: CentroidBuffer): CentroidBuffer = {
      var i = 0
      while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
      a.n += b.n
      a
    }
    override def finish(b: CentroidBuffer): Seq[Double] =
      if (b.n == 0) null else b.sums.map(_ / b.n).toSeq
    override def bufferEncoder: Encoder[CentroidBuffer] = ExpressionEncoder[CentroidBuffer]()
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** Column API: centroid of a vector column. `vec` must be
    * `array<double>` (cast upstream — float accumulation drifts).
    */
  def vectorCentroid(vec: Column, dim: Int): Column =
    udaf(new VectorCentroid(dim)).apply(vec)

  /** Bounded top-k buffer: ids/scores sorted by (score desc, id asc),
    * at most k entries. The whole point versus a window is the bound —
    * partial aggregation keeps k entries per group per partition, so a
    * per-id top-k over an N² pair stream shuffles #ids × k rows instead
    * of sorting N² rows.
    */
  final case class TopKBuf(ids: Array[Long], scores: Array[Double], var n: Int)

  /** Per-group top-k (id, score) pairs, ordered by (score desc, id asc) —
    * deterministic under ties. Insertion into the sorted bound-k arrays
    * is O(k) per row with k ≤ ~100; merge is a merge-walk.
    */
  final class TopKByScore(k: Int)
      extends Aggregator[(Long, Double), TopKBuf, Seq[(Long, Double)]] {
    require(k > 0, "k must be positive")

    private def beats(id1: Long, s1: Double, id2: Long, s2: Double): Boolean =
      s1 > s2 || (s1 == s2 && id1 < id2)

    override def zero: TopKBuf = TopKBuf(new Array[Long](k), new Array[Double](k), 0)

    override def reduce(b: TopKBuf, in: (Long, Double)): TopKBuf = {
      val (id, s) = in
      if (b.n < k || beats(id, s, b.ids(b.n - 1), b.scores(b.n - 1))) {
        // position of the first entry this one beats
        var pos = if (b.n < k) b.n else b.n - 1
        while (pos > 0 && beats(id, s, b.ids(pos - 1), b.scores(pos - 1))) pos -= 1
        val last = math.min(b.n, k - 1)
        var i = last
        while (i > pos) { b.ids(i) = b.ids(i - 1); b.scores(i) = b.scores(i - 1); i -= 1 }
        b.ids(pos) = id; b.scores(pos) = s
        if (b.n < k) b.n += 1
      }
      b
    }

    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
      if (b.n == 0) a
      else if (a.n == 0) b
      else {
        val ids = new Array[Long](k); val scores = new Array[Double](k)
        var i = 0; var j = 0; var o = 0
        while (o < k && (i < a.n || j < b.n)) {
          val takeA = j >= b.n ||
            (i < a.n && beats(a.ids(i), a.scores(i), b.ids(j), b.scores(j)))
          if (takeA) { ids(o) = a.ids(i); scores(o) = a.scores(i); i += 1 }
          else { ids(o) = b.ids(j); scores(o) = b.scores(j); j += 1 }
          o += 1
        }
        TopKBuf(ids, scores, o)
      }
    }

    override def finish(b: TopKBuf): Seq[(Long, Double)] =
      (0 until b.n).map(i => (b.ids(i), b.scores(i)))
    override def bufferEncoder: Encoder[TopKBuf] = ExpressionEncoder[TopKBuf]()
    override def outputEncoder: Encoder[Seq[(Long, Double)]] =
      ExpressionEncoder[Seq[(Long, Double)]]()
  }

  /** Column API: top-k (id, score) per group, (score desc, id asc). */
  def topKByScore(id: Column, score: Column, k: Int): Column =
    udaf(new TopKByScore(k)).apply(id, score)

  /** Bounded bottom-k buffer ordered by (key asc, id asc). String keys so
    * an md5 hex ordering replicates exactly (a double score would lose
    * long-prefix precision past 53 bits and reorder ties).
    */
  final case class BotKBuf(keys: Array[String], ids: Array[Long], var n: Int)

  /** Per-group ids of the k smallest (key, id) pairs — the bounded-state
    * replacement for `row_number() OVER (PARTITION BY g ORDER BY key)`:
    * a per-group window sends each ENTIRE group through one task, while
    * this aggregates with map-side combine (k entries per group per
    * partition in the shuffle) and never materializes a group-sized sort.
    */
  final class BottomKByKey(k: Int)
      extends Aggregator[(String, Long), BotKBuf, Seq[Long]] {
    require(k > 0, "k must be positive")

    private def precedes(k1: String, i1: Long, k2: String, i2: Long): Boolean = {
      val c = k1.compareTo(k2)
      c < 0 || (c == 0 && i1 < i2)
    }

    override def zero: BotKBuf = BotKBuf(new Array[String](k), new Array[Long](k), 0)

    override def reduce(b: BotKBuf, in: (String, Long)): BotKBuf = {
      val (key, id) = in
      if (key != null) {
        if (b.n < k || precedes(key, id, b.keys(b.n - 1), b.ids(b.n - 1))) {
          var pos = if (b.n < k) b.n else b.n - 1
          while (pos > 0 && precedes(key, id, b.keys(pos - 1), b.ids(pos - 1))) pos -= 1
          val last = math.min(b.n, k - 1)
          var i = last
          while (i > pos) { b.keys(i) = b.keys(i - 1); b.ids(i) = b.ids(i - 1); i -= 1 }
          b.keys(pos) = key; b.ids(pos) = id
          if (b.n < k) b.n += 1
        }
      }
      b
    }

    override def merge(a: BotKBuf, b: BotKBuf): BotKBuf = {
      if (b.n == 0) a
      else if (a.n == 0) b
      else {
        val keys = new Array[String](k); val ids = new Array[Long](k)
        var i = 0; var j = 0; var o = 0
        while (o < k && (i < a.n || j < b.n)) {
          val takeA = j >= b.n ||
            (i < a.n && precedes(a.keys(i), a.ids(i), b.keys(j), b.ids(j)))
          if (takeA) { keys(o) = a.keys(i); ids(o) = a.ids(i); i += 1 }
          else { keys(o) = b.keys(j); ids(o) = b.ids(j); j += 1 }
          o += 1
        }
        BotKBuf(keys, ids, o)
      }
    }

    override def finish(b: BotKBuf): Seq[Long] = (0 until b.n).map(b.ids(_))
    override def bufferEncoder: Encoder[BotKBuf] = ExpressionEncoder[BotKBuf]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Column API: ids of the k smallest (key, id) pairs per group. */
  def bottomKByKey(key: Column, id: Column, k: Int): Column =
    udaf(new BottomKByKey(k)).apply(key, id)
}
