package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{VectorFunctions => V}

class VectorFunctionsSpec extends SparkSpec {

  private def cosineOf(a: Seq[Double], b: Seq[Double]): Double = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(V.cosine(col("a"), col("b"))).head().getDouble(0)
  }

  test("cosine: identical, orthogonal, opposite, zero vectors") {
    cosineOf(Seq(1, 2, 3), Seq(1, 2, 3)) shouldBe 1.0 +- 1e-12
    cosineOf(Seq(1, 0), Seq(0, 1)) shouldBe 0.0 +- 1e-12
    cosineOf(Seq(1, 0), Seq(-1, 0)) shouldBe -1.0 +- 1e-12
    cosineOf(Seq(0, 0), Seq(1, 1)) shouldBe 0.0
  }

  test("jaccard set semantics") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("a", "b")
    df.select(V.jaccard(col("a"), col("b"))).head().getDouble(0) shouldBe 0.5 +- 1e-12
    val empty = Seq((Seq.empty[String], Seq.empty[String])).toDF("a", "b")
    empty.select(V.jaccard(col("a"), col("b"))).head().getDouble(0) shouldBe 0.0
  }

  test("hamming64") {
    import spark.implicits._
    val df = Seq((0L, -1L), (5L, 4L), (7L, 7L)).toDF("a", "b")
    df.select(V.hamming64(col("a"), col("b"))).collect().map(_.get(0)) shouldBe
      Array(64, 1, 0)
  }

  test("minhash: identical sets share full signature; similar sets collide more") {
    import spark.implicits._
    val x = Seq("a", "b", "c", "d", "e", "f")
    val mostlyX = Seq("a", "b", "c", "d", "e", "zz")
    val other = Seq("p", "q", "r", "s", "t", "u")
    val df = Seq(("x", x), ("x2", x), ("y", mostlyX), ("z", other)).toDF("id", "sh")
    val sigs = df.select(col("id"), V.minhashSignature(col("sh"), 16).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    sigs("x") shouldBe sigs("x2")
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (p, q) => p == q }
    agree(sigs("x"), sigs("y")) should be > agree(sigs("x"), sigs("z"))
  }

  test("minhash of empty set is the sentinel signature") {
    import spark.implicits._
    val df = Seq(Seq.empty[String]).toDF("sh")
    val sig = df.select(V.minhashSignature(col("sh"), 4)).head().getSeq[Long](0)
    sig shouldBe Seq.fill(4)(2147483647L)
  }

  test("simhash: identical token sets equal; near sets within small hamming") {
    import spark.implicits._
    val base = Seq("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog")
    val near = base.updated(1, "slow")
    val far = Seq("completely", "different", "words", "entirely", "unrelated")
    val df = Seq(("a", base), ("a2", base), ("b", near), ("c", far)).toDF("id", "t")
    val sigs = df.select(col("id"), V.simhash64(col("t")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sigs("a") shouldBe sigs("a2")
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    ham(sigs("a"), sigs("b")) should be < ham(sigs("a"), sigs("c"))
  }

  test("hyperplane LSH: same vector same bucket; scaled copy same bucket") {
    import spark.implicits._
    val v = Seq(0.3, -1.2, 0.8, 2.2)
    val df = Seq(("a", v), ("b", v.map(_ * 3.0)), ("c", v.map(-_))).toDF("id", "v")
    val bk = df.select(col("id"), V.hyperplaneLshBucket(col("v"), 8, 4).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bk("a") shouldBe bk("b")             // scale-invariant (sign projections)
    bk("a") should not be bk("c")        // antipode flips every bit
    (bk("a") ^ bk("c")) shouldBe 255L    // all 8 bits differ
  }

  // independent MD5 references (MessageDigest here, hand-rolled bit math
  // — no shared code with ArrayOps.Md5Kernel beyond the JDK digest)
  private def md5Bytes(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  test("md5-kernel simhash matches an independent MD5 majority-vote reference") {
    import spark.implicits._
    val toks = Seq("the", "quick", "brown", "fox", "the", "éü")
    val expected = {
      val counts = new Array[Int](64)
      toks.foreach { t =>
        val hex = md5Bytes(t).map(b => f"$b%02x").mkString
        val h = java.lang.Long.parseLong(hex.substring(0, 15), 16) // 60 bits
        (0 until 64).foreach(b => counts(b) += ((h >>> b) & 1L).toInt)
      }
      (0 until 64).foldLeft(0L)((acc, b) =>
        if (counts(b) * 2 > toks.length) acc | (1L << b) else acc)
    }
    val got = Seq(toks).toDF("t")
      .select(V.simhash64(col("t"), kernel = "md5")).head().getLong(0)
    got shouldBe expected
    (got >>> 60) shouldBe 0L // md5 kernel is 60-bit: top nibble always clear
  }

  test("randomProjection matches an independent MD5-sign reference; JL preserves cosine approximately") {
    import spark.implicits._
    val v = Seq(0.3, -1.2, 0.8, 2.2, -0.5)
    val outDim = 4
    val expected = (0 until outDim).map { i =>
      v.indices.foldLeft(0.0) { (p, j) =>
        val sign = if ((md5Bytes(s"$i:$j")(0) & 0x80) == 0) 1.0 else -1.0
        p + v(j) * sign
      } / math.sqrt(outDim)
    }
    val got = Seq(v).toDF("v")
      .select(graft.functions.ArrayOps.randomProjection(col("v"), outDim, 5, "md5"))
      .head().getSeq[Double](0)
    got shouldBe expected
    // JL distortion: project 64-dim unit-ish vectors to 16 dims; mean
    // absolute cosine error over pairs stays small (expectation-level
    // check — individual pairs can deviate)
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 30).map(i => i.toLong -> Seq.fill(64)(rnd.nextGaussian()))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val proj = vecs.toDF("id", "v")
      .select(col("id"), graft.functions.ArrayOps.randomProjection(
        col("v"), 16, 64, "md5").as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val errs = for {
      (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib
    } yield math.abs(cos(va, vb) - cos(proj(ia), proj(ib)))
    (errs.sum / errs.size) should be < 0.25
  }

  test("md5-kernel hyperplane bucket matches an independent MD5-sign reference") {
    import spark.implicits._
    val v = Seq(0.3, -1.2, 0.8, 2.2, -0.5)
    val nBits = 6
    val expected = (0 until nBits).foldLeft(0L) { (acc, i) =>
      val proj = v.indices.foldLeft(0.0) { (p, j) =>
        val sign = if ((md5Bytes(s"$i:$j")(0) & 0x80) == 0) 1.0 else -1.0
        p + v(j) * sign
      }
      if (proj >= 0) acc | (1L << i) else acc
    }
    val got = Seq(v).toDF("v")
      .select(V.hyperplaneLshBucket(col("v"), nBits, 5, kernel = "md5"))
      .head().getLong(0)
    got shouldBe expected
  }
}
