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
