package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ArrayOpsSpec extends SparkSpec {

  test("sortedIntersectCount: merge-walk equals array_intersect size") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 9L)), // overlap 2
      (Seq(1L, 2L), Seq(3L, 4L)),                  // disjoint
      (Seq.empty[Long], Seq(1L)),                  // empty side
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))           // identical
    ).toDF("a", "b")
    val got = df.select(ArrayOps.sortedIntersectCount(col("a"), col("b")))
      .collect().map(_.getInt(0))
    got shouldBe Array(2, 0, 0, 3)
    val ref = df.select(
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.array_intersect(col("a"), col("b"))))
      .collect().map(_.getInt(0))
    got shouldBe ref
  }

  test("shingleHashes equals the composed column pipeline, incl. multibyte chars") {
    import spark.implicits._
    import graft.functions.{TextFunctions => T}
    import org.apache.spark.sql.functions.{array_distinct, array_sort, transform, xxhash64,
      regexp_replace, trim, lower, split}
    val texts = Seq("the quick brown fox", "ab", "abcdé 中文字 xyz", "", "  A  B  C  ")
    val df = texts.toDF("text")
    val norm = regexp_replace(trim(lower(col("text"))), "\\s+", " ")
    val native = df.select(ArrayOps.shingleHashes(norm, 3)).collect().map(_.getSeq[Long](0))
    val composed = df
      .select(T.normChars(col("text")).as("c"))
      .select(array_sort(array_distinct(transform(
        T.charShinglesOfChars(col("c"), 3), s => xxhash64(s)))))
      .collect().map(_.getSeq[Long](0))
    native shouldBe composed
    native(0) should not be empty
  }

  test("wordNgramHashes equals the composed column pipeline, incl. multibyte tokens") {
    import spark.implicits._
    import graft.functions.{TextFunctions => T}
    import org.apache.spark.sql.functions.{array_distinct, array_sort, transform, xxhash64}
    val texts = Seq("the quick brown fox jumps", "one two", "", "中文 字符 串 测试 again")
    val df = texts.toDF("text")
    val native = df
      .select(ArrayOps.wordNgramHashes(T.normTokens(col("text")), 3))
      .collect().map(_.getSeq[Long](0))
    val composed = df
      .select(T.normTokens(col("text")).as("t"))
      .select(array_sort(array_distinct(transform(
        T.wordNgramsOfTokens(col("t"), 3), s => xxhash64(s)))))
      .collect().map(_.getSeq[Long](0))
    native shouldBe composed
    native(0) should have length 3
    native(1) shouldBe empty // fewer tokens than n
  }

  test("jaccardSortedLong matches generic jaccard on sorted inputs") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L)), // 2/6
      (Seq.empty[Long], Seq.empty[Long])           // 0 by convention
    ).toDF("a", "b")
    val got = df.select(ArrayOps.jaccardSortedLong(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    got(0) shouldBe (2.0 / 6.0) +- 1e-12
    got(1) shouldBe 0.0
  }
}
