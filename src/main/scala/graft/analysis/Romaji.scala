package graft.analysis

/** Minimal kana → Hepburn romaji transliteration covering the reference's
  * reading-form path (`/root/reference/token_filter.go:68-80`, goldens
  * `token_filter_test.go:74-112`: おはよう→ohayo, ちょっと→chotto).
  *
  * Rules: digraph (youon) syllables first, then base syllables; っ doubles
  * the following consonant (ち → 't'); ん → n; the long vowel combinations
  * ou/oo/uu collapse to a single vowel (Hepburn without macrons, matching
  * the reference library's output for the golden cases).
  */
object Romaji {

  def katakanaToHiragana(s: String): String =
    s.map { c =>
      if (c >= 'ァ' && c <= 'ヶ') (c - 0x60).toChar else c
    }

  private val digraphs: Map[String, String] = Map(
    "きゃ" -> "kya", "きゅ" -> "kyu", "きょ" -> "kyo",
    "しゃ" -> "sha", "しゅ" -> "shu", "しょ" -> "sho",
    "ちゃ" -> "cha", "ちゅ" -> "chu", "ちょ" -> "cho",
    "にゃ" -> "nya", "にゅ" -> "nyu", "にょ" -> "nyo",
    "ひゃ" -> "hya", "ひゅ" -> "hyu", "ひょ" -> "hyo",
    "みゃ" -> "mya", "みゅ" -> "myu", "みょ" -> "myo",
    "りゃ" -> "rya", "りゅ" -> "ryu", "りょ" -> "ryo",
    "ぎゃ" -> "gya", "ぎゅ" -> "gyu", "ぎょ" -> "gyo",
    "じゃ" -> "ja",  "じゅ" -> "ju",  "じょ" -> "jo",
    "びゃ" -> "bya", "びゅ" -> "byu", "びょ" -> "byo",
    "ぴゃ" -> "pya", "ぴゅ" -> "pyu", "ぴょ" -> "pyo"
  )

  private val base: Map[Char, String] = Map(
    'あ' -> "a", 'い' -> "i", 'う' -> "u", 'え' -> "e", 'お' -> "o",
    'か' -> "ka", 'き' -> "ki", 'く' -> "ku", 'け' -> "ke", 'こ' -> "ko",
    'さ' -> "sa", 'し' -> "shi", 'す' -> "su", 'せ' -> "se", 'そ' -> "so",
    'た' -> "ta", 'ち' -> "chi", 'つ' -> "tsu", 'て' -> "te", 'と' -> "to",
    'な' -> "na", 'に' -> "ni", 'ぬ' -> "nu", 'ね' -> "ne", 'の' -> "no",
    'は' -> "ha", 'ひ' -> "hi", 'ふ' -> "fu", 'へ' -> "he", 'ほ' -> "ho",
    'ま' -> "ma", 'み' -> "mi", 'む' -> "mu", 'め' -> "me", 'も' -> "mo",
    'や' -> "ya", 'ゆ' -> "yu", 'よ' -> "yo",
    'ら' -> "ra", 'り' -> "ri", 'る' -> "ru", 'れ' -> "re", 'ろ' -> "ro",
    'わ' -> "wa", 'を' -> "wo", 'ん' -> "n",
    'が' -> "ga", 'ぎ' -> "gi", 'ぐ' -> "gu", 'げ' -> "ge", 'ご' -> "go",
    'ざ' -> "za", 'じ' -> "ji", 'ず' -> "zu", 'ぜ' -> "ze", 'ぞ' -> "zo",
    'だ' -> "da", 'ぢ' -> "ji", 'づ' -> "zu", 'で' -> "de", 'ど' -> "do",
    'ば' -> "ba", 'び' -> "bi", 'ぶ' -> "bu", 'べ' -> "be", 'ぼ' -> "bo",
    'ぱ' -> "pa", 'ぴ' -> "pi", 'ぷ' -> "pu", 'ぺ' -> "pe", 'ぽ' -> "po"
  )

  def toHepburn(hiragana: String): String = {
    val out = new StringBuilder
    var i = 0
    var pendingSokuon = false
    val n = hiragana.length
    while (i < n) {
      val c = hiragana(i)
      if (c == 'っ') { pendingSokuon = true; i += 1 }
      else {
        val syl: Option[String] =
          if (i + 1 < n) digraphs.get(hiragana.substring(i, i + 2)) else None
        val (rom, adv) = syl match {
          case Some(r) => (r, 2)
          case None    => (base.getOrElse(c, ""), 1)
        }
        var r = rom
        if (pendingSokuon && r.nonEmpty) {
          // Hepburn: っち → tchi family uses 't'; otherwise double the consonant
          val d = if (r.startsWith("ch")) "t" else r.take(1)
          r = d + r
          pendingSokuon = false
        }
        // long-vowel collapse: ou/oo/uu after an existing vowel
        if ((r == "u" && out.nonEmpty && (out.last == 'o' || out.last == 'u')) ||
            (r == "o" && out.nonEmpty && out.last == 'o')) {
          // skip the lengthening vowel
        } else out.append(r)
        i += adv
      }
    }
    out.toString
  }
}
