package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graft.Bridge

/** Unicode text normalization — the crawl-hygiene pass that belongs
  * BEFORE every hashing/dedup/tokenize stage: the same visible text can
  * arrive as precomposed (`é` U+00E9) or decomposed (`e` + U+0301)
  * codepoints, and byte-keyed dedup, shingle hashes, and exact-match
  * decontamination all silently treat them as different documents.
  *
  * Two forms, matching DuckDB's built-ins so the oracle replays them
  * verbatim (`nfc_normalize`, `strip_accents` — both utf8proc-backed;
  * the JDK `java.text.Normalizer` implements the same Unicode TR-15
  * canonical algorithm):
  *
  *  - [[NfcNormalize]] — canonical composition (NFC): decomposed
  *    sequences collapse to their precomposed forms; the lossless
  *    canonicalization every pipeline should apply at ingest.
  *  - [[StripAccents]] — NFD-decompose then drop combining marks
  *    (`\p{Mn}`): the lossy fold (`é` → `e`) used for accent-insensitive
  *    matching keys, never for stored text.
  *
  * Scope of the DuckDB-equivalence claim: NFC agreement is exact (both
  * sides implement UAX #15 canonical composition). StripAccents
  * equivalence is oracle-verified for ASCII plus Latin precomposed /
  * combining-mark sequences (the crawl-text classes the corpus and the
  * `text_unicode_norm` fixture exercise); for codepoints whose canonical
  * decompositions are NOT mark sequences — Hangul syllables (Jamo
  * expansion), canonical singletons — the JDK path leaves the output
  * DECOMPOSED and utf8proc's `strip_accents` may differ byte-wise. When
  * a fold key must replay bit-for-bit across engines on such corpora,
  * compose `nfc(stripAccents(x))` (and `nfc_normalize(strip_accents(x))`
  * on the oracle side) so both outputs land in one canonical form.
  *
  * Scale shape: per-row scalar expressions in the scan projection — no
  * shuffle, no driver state; normalization cost is linear in the string
  * and only non-ASCII rows pay more than a scan (both forms fast-path
  * pure-ASCII input, the overwhelming majority of crawl bytes).
  */
object UnicodeNorm {

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0
    while (i < n) {
      if ((org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0x80) != 0)
        return false
      i += 1
    }
    true
  }

  /** Canonical composition (Unicode NFC). */
  case class NfcNormalize(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      if (isAscii(s)) s // ASCII is NFC-invariant — skip the round trip
      else UTF8String.fromString(java.text.Normalizer.normalize(
        s.toString, java.text.Normalizer.Form.NFC))
    }
    override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
      copy(child = newChild)
  }

  /** NFD-decompose then remove combining marks (accent folding). */
  case class StripAccents(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      if (isAscii(s)) s // no marks to strip
      else UTF8String.fromString(
        MarksPattern.matcher(java.text.Normalizer.normalize(
          s.toString, java.text.Normalizer.Form.NFD)).replaceAll(""))
    }
    override protected def withNewChildInternal(newChild: Expression): StripAccents =
      copy(child = newChild)
  }

  private val MarksPattern = java.util.regex.Pattern.compile("\\p{Mn}+")

  /** Column API: NFC canonicalization. */
  def nfc(text: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(text)))

  /** Column API: accent folding (NFD − combining marks). */
  def stripAccents(text: Column): Column =
    Bridge.column(StripAccents(Bridge.expression(text)))
}
