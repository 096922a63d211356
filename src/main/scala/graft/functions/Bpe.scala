package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Real byte-pair-encoding token counting from a merges file — the
  * token-budget signal shard packing and chunking decisions actually run
  * on (the regex segment count in [[TextFunctions.subwordCount]] remains
  * the zero-dependency lower-bound estimator).
  *
  * Algorithm (GPT-2 encoder shape, Sennrich et al. 2016): pre-tokenize
  * with [[TextFunctions.subwordPattern]]; per segment start from
  * characters and repeatedly merge ALL occurrences of the lowest-rank
  * adjacent pair until none applies; the BPE count is the surviving
  * symbol count. Character-level (not byte-level) symbols keep the
  * algorithm SQL-replicable — the DuckDB oracle rebuilds the exact same
  * loop from the same merges fixture.
  *
  * Scale shape: the merges table rides the serialized expression into
  * each task (~KBs for the bundled fixture; point `loadMergesFile` at a
  * real 50k-merge GPT-2 file and a broadcast variable holding the
  * [[Bpe.Encoder]] is the production shape). Encoding is cached per
  * DISTINCT segment in a bounded per-task LRU — corpus text repeats
  * segments heavily, so the merge loop runs once per distinct segment,
  * not once per occurrence.
  */
object Bpe {

  /** Parse merges lines ("a b" per line, rank = line order, '#' comments).
    * Symbols must be whitespace-free — guaranteed by training that never
    * merges across or with whitespace.
    */
  def parseMerges(lines: Iterator[String]): Seq[(String, String)] = {
    val out = lines.map(_.stripLineEnd)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val parts = l.split(" ")
        require(parts.length == 2 && parts.forall(_.nonEmpty),
          s"malformed merges line (need 'a b'): '$l'")
        (parts(0), parts(1))
      }.toSeq
    require(out.nonEmpty, "merges file has no rules")
    out
  }

  /** The bundled fixture (src/main/resources/graft/bpe/merges.txt),
    * trained character-level on the synthetic documents corpus.
    */
  lazy val defaultMerges: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe/merges.txt")
    require(in != null, "bundled merges fixture /graft/bpe/merges.txt missing")
    try parseMerges(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** Byte-level fixture (merges_byte.txt), trained by
    * [[graft.tools.TrainBpe]] on the same corpus in the real GPT-2 file
    * format: `#version` header, rules over the bytes→unicode alphabet
    * (space rides as 'Ġ' = U+0120).
    */
  lazy val defaultByteMerges: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe/merges_byte.txt")
    require(in != null, "bundled merges fixture /graft/bpe/merges_byte.txt missing")
    try parseMerges(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  def loadMergesFile(path: String): Seq[(String, String)] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parseMerges(src.getLines()) finally src.close()
  }

  /** Vocab paired with [[defaultByteMerges]] (vocab_byte.json: 256 byte
    * symbols in byte order, then merged symbols in merge order).
    */
  lazy val defaultByteVocab: Map[String, Int] = {
    val in = getClass.getResourceAsStream("/graft/bpe/vocab_byte.json")
    require(in != null, "bundled vocab fixture /graft/bpe/vocab_byte.json missing")
    try parseVocab(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
    finally in.close()
  }

  /** Parse a GPT-2-format vocab.json ({"token": id, ...}) — the other
    * half of a real merges+vocab tokenizer pair. Only needed when token
    * IDS (not counts) are the output.
    */
  def parseVocab(json: String): Map[String, Int] = {
    import org.json4s._
    org.json4s.jackson.JsonMethods.parse(json) match {
      case JObject(fields) => fields.map {
        case (k, JInt(v)) => k -> v.toInt
        case (k, v) => throw new IllegalArgumentException(s"vocab id for '$k' not an int: $v")
      }.toMap
      case other => throw new IllegalArgumentException(s"vocab.json must be an object, got $other")
    }
  }

  def loadVocabFile(path: String): Map[String, Int] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parseVocab(src.mkString) finally src.close()
  }

  /** GPT-2 bytes↔unicode pre-mapping: every byte gets a PRINTABLE
    * codepoint so merge rules are plain text. Printable latin-1 bytes
    * (33-126, 161-172, 174-255) map to themselves; the 68 excluded bytes
    * (controls, space, DEL, NBSP range, soft hyphen) map to 256+n in
    * increasing byte order — so space(32)→'Ġ'(288), newline(10)→'Ċ'(266),
    * exactly the alphabet real GPT-2/tiktoken merges files are written in.
    */
  val byteToUnicode: Array[Char] = {
    val out = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      val printable = (b >= 33 && b <= 126) || (b >= 161 && b <= 172) || (b >= 174)
      if (printable) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }

  /** Inverse of [[byteToUnicode]] (codepoint → original byte). */
  lazy val unicodeToByte: Map[Char, Byte] =
    byteToUnicode.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** The encoder: rank table + pre-tokenizer + bounded segment cache.
    * One instance per task (deserialized with the expression, or shipped
    * via a broadcast for production-size merge tables —
    * [[broadcastEncoder]]).
    *
    * `byteLevel = true` is the real GPT-2/tiktoken shape: a segment's
    * initial symbols are its UTF-8 BYTES through [[byteToUnicode]], not
    * its characters — token budgets then stop drifting on non-ASCII text,
    * where one character is 2-4 byte symbols before merging.
    */
  final class Encoder(merges: Seq[(String, String)],
      val byteLevel: Boolean = false,
      vocab: Map[String, Int] = Map.empty) extends Serializable {
    @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.size * 2)
      merges.zipWithIndex.foreach { case ((a, b), i) =>
        m.put(a + "\u0000" + b, i)
      }
      m
    }
    @transient private lazy val mergedOf: Array[String] =
      merges.map { case (a, b) => a + b }.toArray
    @transient private lazy val pairOf: Array[(String, String)] = merges.toArray
    @transient private lazy val segPattern =
      java.util.regex.Pattern.compile(TextFunctions.subwordPattern)
    // LRU over distinct segments: natural text re-uses the same words
    // constantly; 64k entries of short symbol arrays is a few MB per
    // thread. Stores the ENCODED SYMBOLS (not just the count) so the
    // emission path (encodeText/encodeIds) shares the same memoization
    // as the count path — the merge loop runs once per distinct segment
    // for both. Callers must not mutate the cached arrays.
    // ThreadLocal because a CodegenFallback expression instance is shared
    // across an executor's task threads (same reason the md5 kernel's
    // MessageDigest is ThreadLocal) and LinkedHashMap is not thread-safe.
    @transient private lazy val cache =
      new ThreadLocal[java.util.LinkedHashMap[String, Array[String]]] {
        override def initialValue(): java.util.LinkedHashMap[String, Array[String]] =
          new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
            override def removeEldestEntry(
                e: java.util.Map.Entry[String, Array[String]]): Boolean =
              size() > 65536
          }
      }

    /** [[encodeSegment]] through the per-thread LRU — the entry point
      * both the count and the emission paths share.
      */
    private def cachedSegment(seg: String): Array[String] = {
      val c = cache.get()
      val hit = c.get(seg)
      if (hit != null) hit
      else {
        val syms = encodeSegment(seg)
        c.put(seg, syms)
        syms
      }
    }

    /** BPE symbols of ONE pre-token segment (exposed for tests). */
    def encodeSegment(seg: String): Array[String] = {
      var word: Array[String] =
        if (byteLevel)
          seg.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            .map(b => String.valueOf(byteToUnicode(b & 0xff)))
        else seg.toCharArray.map(_.toString)
      var done = word.length < 2
      while (!done) {
        // lowest-rank adjacent pair present in the word
        var best = Int.MaxValue
        var i = 0
        while (i < word.length - 1) {
          val r = ranks.get(word(i) + "\u0000" + word(i + 1))
          if (r != null && r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          // merge ALL occurrences left-to-right (merged symbol a+b can
          // never equal a, so a merge never chains into itself)
          val (a, b) = pairOf(best)
          val ab = mergedOf(best)
          val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
          var j = 0
          while (j < word.length) {
            if (j < word.length - 1 && word(j) == a && word(j + 1) == b) {
              out += ab; j += 2
            } else { out += word(j); j += 1 }
          }
          word = out.toArray
          done = word.length < 2
        }
      }
      word
    }

    def countSegment(seg: String): Int = cachedSegment(seg).length

    /** Total BPE tokens of a text: pre-tokenize, sum segment counts. */
    def countText(text: String): Int = {
      val m = segPattern.matcher(text)
      var n = 0
      while (m.find()) n += countSegment(m.group())
      n
    }

    /** All BPE token strings of a text, in order (segment-LRU-backed). */
    def encodeText(text: String): Array[String] = {
      val m = segPattern.matcher(text)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) out ++= cachedSegment(m.group())
      out.toArray
    }

    /** Token IDS under the vocab (requires one — the real merges+vocab
      * pair from [[loadMergesFile]]/[[loadVocabFile]]). A symbol absent
      * from the vocab is a fixture/corpus mismatch and throws.
      */
    def encodeIds(text: String): Array[Int] = {
      require(vocab.nonEmpty, "encodeIds needs a vocab (loadVocabFile)")
      encodeText(text).map { t =>
        vocab.getOrElse(t, throw new NoSuchElementException(
          s"BPE symbol '$t' not in vocab (merges/vocab pair mismatch?)"))
      }
    }

    @transient private lazy val symbolOf: Map[Int, String] =
      vocab.map(_.swap)

    /** Inverse of [[encodeIds]]. Byte-level decoding is LOSSLESS for any
      * input text: ids → symbols → mapped chars → original bytes → UTF-8
      * (every byte has a vocab symbol, so `decodeIds(encodeIds(t)) == t`
      * always — the property a trainer's detokenizer relies on).
      * Char-level decoding concatenates symbols directly.
      */
    def decodeIds(ids: Array[Int]): String = {
      require(vocab.nonEmpty, "decodeIds needs a vocab (loadVocabFile)")
      val joined = ids.map { id =>
        symbolOf.getOrElse(id, throw new NoSuchElementException(
          s"token id $id not in vocab"))
      }.mkString
      if (!byteLevel) joined
      else {
        val bytes = new Array[Byte](joined.length)
        var i = 0
        while (i < joined.length) {
          bytes(i) = unicodeToByte.getOrElse(joined.charAt(i),
            throw new IllegalArgumentException(
              s"decoded symbol codepoint ${joined.charAt(i).toInt} outside the byte alphabet"))
          i += 1
        }
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      }
    }
  }

  /** Production shape for real 50k-merge tables: ship ONE copy of the
    * encoder per executor via a broadcast instead of riding the merges
    * inside every serialized expression.
    */
  def broadcastEncoder(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], byteLevel: Boolean = false,
      vocab: Map[String, Int] = Map.empty)
      : org.apache.spark.broadcast.Broadcast[Encoder] =
    spark.sparkContext.broadcast(new Encoder(merges, byteLevel, vocab))

  /** BPE token count of `child` under `merges`. Null-safe; empty → 0. */
  case class BpeCount(child: Expression, merges: Seq[(String, String)],
      byteLevel: Boolean = false)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    @transient private lazy val enc = new Encoder(merges, byteLevel)
    override def nullSafeEval(input: Any): Any =
      enc.countText(input.asInstanceOf[UTF8String].toString)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** BPE token count through a broadcast encoder — only the broadcast
    * HANDLE rides in the serialized expression; executors fetch the
    * (potentially 50k-rule) rank table once each.
    */
  case class BpeCountBroadcast(child: Expression,
      bc: org.apache.spark.broadcast.Broadcast[Encoder])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any =
      bc.value.countText(input.asInstanceOf[UTF8String].toString)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Token IDS of `child` — the actual training-data emission: text in,
    * ordered vocab ids out. Null-safe; empty text → empty array.
    */
  /** Per-row evaluation counter for [[BpeIds]] (local-mode diagnostic:
    * lets specs assert an operator encodes a corpus exactly once — e.g.
    * writeTokenShards' single-pass contract. One atomic add per row is
    * noise next to the encode itself; on a real cluster each executor
    * counts only its own rows.)
    */
  val idsEvalCount = new java.util.concurrent.atomic.AtomicLong(0L)

  case class BpeIds(child: Expression, merges: Seq[(String, String)],
      vocab: Map[String, Int], byteLevel: Boolean)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
    @transient private lazy val enc = new Encoder(merges, byteLevel, vocab)
    override def nullSafeEval(input: Any): Any = {
      idsEvalCount.incrementAndGet()
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        enc.encodeIds(input.asInstanceOf[UTF8String].toString))
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Byte-level token ids from the bundled merges+vocab pair. */
  def bpeIdsBytes(text: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(BpeIds(Bridge.expression(text), defaultByteMerges,
      defaultByteVocab, byteLevel = true))
  }

  /** Inverse of [[BpeIds]]: ids back to text (lossless at byte level —
    * see [[Encoder.decodeIds]]).
    */
  case class BpeDecode(child: Expression, merges: Seq[(String, String)],
      vocab: Map[String, Int], byteLevel: Boolean)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = org.apache.spark.sql.types.StringType
    @transient private lazy val enc = new Encoder(merges, byteLevel, vocab)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      UTF8String.fromString(enc.decodeIds(arr.toIntArray()))
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Byte-level decode of a token-id array column. */
  def bpeDecodeBytes(ids: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(BpeDecode(Bridge.expression(ids), defaultByteMerges,
      defaultByteVocab, byteLevel = true))
  }

  /** Column builder: real BPE token count from a merges table (the
    * bundled fixture by default).
    */
  def bpeCount(text: Column, merges: Seq[(String, String)] = defaultMerges,
      byteLevel: Boolean = false): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(BpeCount(Bridge.expression(text), merges, byteLevel))
  }

  /** Byte-level count from the bundled byte-level fixture. */
  def bpeCountBytes(text: Column): Column =
    bpeCount(text, defaultByteMerges, byteLevel = true)

  /** Count through a [[broadcastEncoder]] (production merge tables). */
  def bpeCount(text: Column,
      bc: org.apache.spark.broadcast.Broadcast[Encoder]): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(BpeCountBroadcast(Bridge.expression(text), bc))
  }
}
