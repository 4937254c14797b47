package graft.analysis

import graft.analysis.TokenStream.TokenStream

/** Splits filtered text into a token stream
  * (`/root/reference/tokenizer.go:10-12`). */
trait Tokenizer extends Serializable {
  def tokenize(s: String): TokenStream
}

/** Split on any code point that is not a Unicode letter or number,
  * dropping empty segments (`/root/reference/tokenizer.go:14-29` uses
  * `unicode.IsLetter/IsNumber`). "Number" is the full \p{N} class —
  * Nd+Nl+No, matching Go's `unicode.IsNumber` and the native column
  * path's `\p{N}` — NOT `Character.isDigit` (Nd only), which would drop
  * 'Ⅷ' (Nl) and '½' (No) that the column path keeps.
  */
final case class StandardTokenizer() extends Tokenizer {
  import StandardTokenizer.isNumberCp
  override def tokenize(s: String): TokenStream = {
    val out = Vector.newBuilder[Token]
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      if (Character.isLetter(cp) || isNumberCp(cp)) sb.appendCodePoint(cp)
      else if (sb.length > 0) { out += Token(sb.toString); sb.setLength(0) }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) out += Token(sb.toString)
    out.result()
  }
}

object StandardTokenizer {
  /** The equivalent split pattern for the Catalyst column path (Java regex
    * classes \p{L}\p{N} match Go's unicode.IsLetter/IsNumber categories). */
  val SplitPattern = "[^\\p{L}\\p{N}]+"

  /** \p{N} = Nd + Nl + No (Go `unicode.IsNumber`). */
  private[analysis] def isNumberCp(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.DECIMAL_DIGIT_NUMBER.toInt ||
      t == Character.LETTER_NUMBER.toInt ||
      t == Character.OTHER_NUMBER.toInt
  }
}

/** Character n-grams over code points: `len(runes)+1-n` grams; n greater
  * than the rune length yields an empty stream
  * (`/root/reference/tokenizer.go:50-67`, golden incl. multi-byte runes at
  * `tokenizer_test.go:60-112`).
  */
final case class NgramTokenizer(n: Int) extends Tokenizer {
  require(n >= 1, s"ngram n must be >= 1, got $n")
  override def tokenize(s: String): TokenStream = {
    val runes = s.codePoints().toArray
    val count = runes.length + 1 - n
    if (count <= 0) TokenStream.empty
    else (0 until count).map { i =>
      Token(new String(runes, i, n))
    }.toVector
  }
}

/** Pluggable morphological analysis (Japanese path). The reference delegates
  * to kagome + IPA-neologd (`/root/reference/morphology/kagome.go:14-44`);
  * implementations are injected — the reference itself unit-tests against a
  * mock (`/root/reference/tokenizer_test.go:37-47`). The in-repo
  * [[LatticeMorphology]] is a real kagome-style lattice + Viterbi analyzer
  * over an embedded demo-scale dictionary (IPA-neologd itself is
  * unavailable offline); a full dictionary drops in through the same
  * Entry shape.
  */
trait Morphology extends Serializable {
  /** Returns (surface form, kana reading) pairs; whitespace tokens dropped. */
  def analyze(s: String): Seq[(String, String)]
}

final case class MorphologicalTokenizer(morphology: Morphology) extends Tokenizer {
  override def tokenize(s: String): TokenStream =
    morphology.analyze(s).map { case (term, kana) => Token(term, kana) }.toVector
}
