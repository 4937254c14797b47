package graft.analysis

import graft.analysis.TokenStream.TokenStream

/** Post-tokenization stream transform (`/root/reference/token_filter.go:10-12`). */
trait TokenFilter extends Serializable {
  def filter(ts: TokenStream): TokenStream
}

/** Lowercases every term (`/root/reference/token_filter.go:14-27`).
  * Note: the reference drops `kana` here (NewToken(lower) zeroes it); we
  * reproduce that. */
final case class LowercaseFilter() extends TokenFilter {
  override def filter(ts: TokenStream): TokenStream =
    ts.map(t => Token(t.term.toLowerCase(java.util.Locale.ROOT)))
}

/** Drops terms in the stopword set, preserving survivor order — positions
  * are assigned after filtering (`/root/reference/token_filter.go:29-51`). */
final case class StopWordFilter(stopWords: Seq[String]) extends TokenFilter {
  private val set = stopWords.toSet
  override def filter(ts: TokenStream): TokenStream =
    ts.filterNot(t => set.contains(t.term))
}

/** Snowball English (Porter2) stemming of each term
  * (`/root/reference/token_filter.go:53-66`; goldens pens→pen, came→came). */
final case class StemmerFilter() extends TokenFilter {
  override def filter(ts: TokenStream): TokenStream =
    ts.map(t => Token(EnglishStemmer.stem(t.term)))
}

/** Canonicalizing synonym filter: terms with an entry in `mapping` are
  * replaced by their canonical form (1:1, order-preserving — the
  * replacement flavor of Lucene's SynonymFilter; same-position injection
  * is not representable in a position=ordinal stream). Apply AFTER
  * lowercasing so keys match the normalized terms. Mapping size is plan
  * size on the native path — synonym sets are config-scale by contract. */
final case class SynonymFilter(mapping: Map[String, String]) extends TokenFilter {
  override def filter(ts: TokenStream): TokenStream =
    ts.map(t => mapping.get(t.term).fold(t)(m => Token(m)))
  // Canonical (sorted) rendering: Analyzer.describe goes into the index
  // manifest for the query/build parity check, and Map toString order is an
  // implementation detail.
  override def toString: String = mapping.toSeq.sorted
    .map { case (k, v) => s"$k=$v" }.mkString("SynonymFilter(", ",", ")")
}

/** Folds accented Latin-1/Latin-Extended letters to their ASCII base
  * (Lucene ASCIIFoldingFilter's common subset) — strictly 1:1 foldings so
  * the native path is a single `translate`; multi-char foldings (ß→ss,
  * æ→ae) are out of contract. */
final case class AsciiFoldingFilter() extends TokenFilter {
  override def filter(ts: TokenStream): TokenStream =
    ts.map(t => t.copy(term = AsciiFoldingFilter.fold(t.term)))
}

object AsciiFoldingFilter {
  // Aligned source/target tables; checked 1:1 at class load.
  val Src: String =
    "àáâãäåèéêëìíîïòóôõöùúûüçñýÿøÀÁÂÃÄÅÈÉÊËÌÍÎÏÒÓÔÕÖÙÚÛÜÇÑÝØ"
  val Dst: String =
    "aaaaaaeeeeiiiiooooouuuucnyyoAAAAAAEEEEIIIIOOOOOUUUUCNYO"
  require(Src.length == Dst.length,
    s"fold tables misaligned: ${Src.length} vs ${Dst.length}")

  def fold(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val idx = Src.indexOf(s.charAt(i).toInt)
      sb.append(if (idx >= 0) Dst.charAt(idx) else s.charAt(i))
      i += 1
    }
    sb.toString
  }
}

/** Drops terms whose code-point length is outside [min, max] —
  * Lucene's LengthFilter, the standard guard against tokenizer debris
  * (single chars, unbroken blobs) reaching the index. Order-preserving
  * like the stopword filter; positions are assigned after filtering. */
final case class LengthFilter(min: Int, max: Int) extends TokenFilter {
  require(min >= 0 && max >= min, s"need 0 <= min <= max, got [$min, $max]")
  override def filter(ts: TokenStream): TokenStream =
    ts.filter { t =>
      val n = t.term.codePointCount(0, t.term.length)
      n >= min && n <= max
    }
}

/** Word n-gram (shingle) filter: token i of the output is input tokens
  * [i, i+n) joined with a single space; a stream shorter than `n` yields
  * nothing. Lucene ShingleFilter's shingles-only flavor
  * (`outputUnigrams=false`): same-position unigram+shingle emission is not
  * representable in a position=ordinal stream (same constraint as
  * [[SynonymFilter]] injection). Kana readings do not compose across words
  * and are dropped. */
final case class ShingleFilter(n: Int) extends TokenFilter {
  require(n >= 2, s"shingle size must be >= 2, got $n")
  override def filter(ts: TokenStream): TokenStream =
    if (ts.size < n) Vector.empty
    else ts.sliding(n).map(w => Token(w.map(_.term).mkString(" "))).toVector
}

/** term := Hepburn romaji of the hiragana reading
  * (`/root/reference/token_filter.go:68-80`). */
final case class RomajiReadingformFilter() extends TokenFilter {
  override def filter(ts: TokenStream): TokenStream =
    ts.map(t => t.copy(term = Romaji.toHepburn(Romaji.katakanaToHiragana(t.kana))))
}

/** term := kana reading (`/root/reference/token_filter.go:82-94`). */
final case class KanaReadingformFilter() extends TokenFilter {
  override def filter(ts: TokenStream): TokenStream =
    ts.map(t => t.copy(term = t.kana))
}
