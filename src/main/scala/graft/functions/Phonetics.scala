package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Phonetic / normalization functions mirroring the reference's
  * `phonetic.py`.
  *
  * `fingerprint` follows the `fingerprints.generate` contract used at
  * /root/reference/ftm_columnstore/phonetic.py:43-45: lowercase,
  * strip punctuation, split, de-duplicate tokens, sort, re-join —
  * test vector "Tchibo Holding AG" → "ag holding tchibo"
  * (/root/reference/tests/test_store.py:55).
  *
  * Everything here is composed from `org.apache.spark.sql.functions._`
  * only, so the whole pipeline stays inside whole-stage codegen — no
  * UDF/serialization cost at 100 TB.
  */
object Phonetics {

  /** Normalized token array of a name: lowercase, non-alphanumerics →
    * space, split, drop empties.
    */
  def nameTokens(c: Column): Column =
    filter(
      split(regexp_replace(lower(c), "[^a-z0-9]+", " "), " "),
      t => length(t) > 0)

  /** Name fingerprint: sorted distinct normalized tokens joined by a
    * single space. phonetic.py:43-45. One compiled pass per row
    * ([[FingerprintExpression]]); [[fingerprintComposed]] is the
    * spec-asserted parity twin.
    */
  def fingerprint(c: Column): Column =
    FingerprintExpression.fingerprint(c)

  /** The `functions._`-only twin of [[fingerprint]] (four interpreted
    * array walks per value — HOFs never codegen; kept for the parity
    * spec).
    */
  def fingerprintComposed(c: Column): Column =
    array_join(array_sort(array_distinct(nameTokens(c))), " ")

  /** Blocking token set of a fingerprint: the full fingerprint plus any
    * token longer than 5 chars. phonetic.py:32-37 (`tokenize`). One
    * compiled pass per row ([[FpxTokensExpression]]);
    * [[fpxTokensComposed]] is the spec-asserted parity twin.
    */
  def fpxTokens(fp: Column): Column =
    FpxTokensExpression.fpxTokens(fp)

  /** The `functions._`-only twin of [[fpxTokens]]. */
  def fpxTokensComposed(fp: Column): Column =
    array_union(array(fp), filter(split(fp, " "), t => length(t) > 5))

  /** Soundex phonetic code per token (reference: phonetic.py:48-50).
    * Spark ships a codegen'd soundex; applied to each fingerprint token.
    */
  def soundexTokens(fp: Column): Column =
    transform(filter(split(fp, " "), t => length(t) > 0), t => soundex(t))

  /** Classic Metaphone (Lawrence Philips, 1990) — the reference attaches
    * metaphone1/metaphone2 codes per token via the `metaphone` package
    * (phonetic.py:43-45). Pure Scala; the QUERY path rides the codegen'd
    * [[graft.functions.MetaphoneExpression]] — this imperative form is
    * the differential-spec reference twin (FunctionsSpec wraps it in a
    * test-scoped UDF; no UDF ships in main source).
    */
  def metaphone(word: String): String = {
    val w = word.toUpperCase.filter(ch => ch >= 'A' && ch <= 'Z')
    if (w.isEmpty) return ""
    val sb = new StringBuilder
    var i = 0
    val n = w.length
    def ch(k: Int): Char = if (k >= 0 && k < n) w(k) else '\u0000'
    def isVowel(c: Char): Boolean = "AEIOU".indexOf(c) >= 0
    // initial-letter exceptions
    if (n >= 2) {
      (w(0), w(1)) match {
        case ('A', 'E') | ('G', 'N') | ('K', 'N') | ('P', 'N') | ('W', 'R') =>
          i = 1
        case ('X', _) => sb.append('S'); i = 1
        case ('W', 'H') => sb.append('W'); i = 2
        case _ => ()
      }
    }
    while (i < n && sb.length < 8) {
      val c = w(i)
      // skip doubled letters except C
      if (c != 'C' && i > 0 && ch(i - 1) == c) { i += 1 }
      else {
        c match {
          case 'A' | 'E' | 'I' | 'O' | 'U' =>
            if (i == 0) sb.append(c)
          case 'B' =>
            if (!(i == n - 1 && ch(i - 1) == 'M')) sb.append('B')
          case 'C' =>
            if (ch(i + 1) == 'I' && ch(i + 2) == 'A') sb.append('X')
            else if (ch(i + 1) == 'H') { sb.append('X'); i += 1 }
            else if (ch(i + 1) == 'I' || ch(i + 1) == 'E' || ch(i + 1) == 'Y') sb.append('S')
            else sb.append('K')
          case 'D' =>
            if (ch(i + 1) == 'G' && (ch(i + 2) == 'E' || ch(i + 2) == 'Y' || ch(i + 2) == 'I')) {
              sb.append('J'); i += 1
            } else sb.append('T')
          case 'F' => sb.append('F')
          case 'G' =>
            if (ch(i + 1) == 'H') {
              if (i + 1 == n - 1 || isVowel(ch(i + 2))) { sb.append('K'); i += 1 }
              // silent GH otherwise
              else i += 1
            } else if (ch(i + 1) == 'N') {
              // silent G in GN
            } else if (ch(i + 1) == 'I' || ch(i + 1) == 'E' || ch(i + 1) == 'Y') sb.append('J')
            else sb.append('K')
          case 'H' =>
            if (isVowel(ch(i + 1)) && !(i > 0 && "CSPTG".indexOf(ch(i - 1)) >= 0)) sb.append('H')
          case 'J' => sb.append('J')
          case 'K' =>
            if (!(i > 0 && ch(i - 1) == 'C')) sb.append('K')
          case 'L' => sb.append('L')
          case 'M' => sb.append('M')
          case 'N' => sb.append('N')
          case 'P' =>
            if (ch(i + 1) == 'H') { sb.append('F'); i += 1 } else sb.append('P')
          case 'Q' => sb.append('K')
          case 'R' => sb.append('R')
          case 'S' =>
            if (ch(i + 1) == 'H') { sb.append('X'); i += 1 }
            else if (ch(i + 1) == 'I' && (ch(i + 2) == 'O' || ch(i + 2) == 'A')) sb.append('X')
            else sb.append('S')
          case 'T' =>
            if (ch(i + 1) == 'H') { sb.append('0'); i += 1 }
            else if (ch(i + 1) == 'I' && (ch(i + 2) == 'O' || ch(i + 2) == 'A')) sb.append('X')
            else sb.append('T')
          case 'V' => sb.append('F')
          case 'W' =>
            if (isVowel(ch(i + 1))) sb.append('W')
          case 'X' => sb.append("KS")
          case 'Y' =>
            if (isVowel(ch(i + 1))) sb.append('Y')
          case 'Z' => sb.append('S')
          case _ => ()
        }
        i += 1
      }
    }
    sb.toString
  }

}
