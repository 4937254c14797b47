package graft.analysis

/** Snowball "English" (Porter2) stemmer, implemented from the published
  * algorithm description (snowballstem.org/algorithms/english/stemmer.html).
  *
  * Behavioural parity target: the reference stems with kljensen/snowball's
  * `english.Stem(term, false)` (`/root/reference/token_filter.go:59-61`,
  * goldens `token_filter_test.go:53-71`: pens→pen, came→came;
  * `README.md:86-92`: tired→tire).
  *
  * Input is assumed already lowercased when `stemStopWords=false` semantics
  * are wanted; we lowercase defensively like the Go library does.
  */
object EnglishStemmer {

  private val vowels = Set('a', 'e', 'i', 'o', 'u', 'y')
  // "li" may be deleted only after one of these (step 2)
  private val validLiEndings = Set('c', 'd', 'e', 'g', 'h', 'k', 'm', 'n', 'r', 't')
  private val doubles =
    Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

  private val exceptions1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    // invariant forms
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes"
  )

  private val exceptions2 = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed"
  )

  def stem(input: String): String = {
    var w = input.toLowerCase(java.util.Locale.ROOT)
    if (w.length <= 2) return w
    // remove initial apostrophe
    if (w.startsWith("'")) w = w.substring(1)
    exceptions1.get(w) match {
      case Some(r) => return r
      case None    =>
    }
    // mark consonant-y as 'Y': y at start or after a vowel
    val sb = new StringBuilder(w)
    if (sb.nonEmpty && sb(0) == 'y') sb(0) = 'Y'
    var i = 1
    while (i < sb.length) {
      if (sb(i) == 'y' && vowels.contains(sb(i - 1))) sb(i) = 'Y'
      i += 1
    }
    w = sb.toString

    val r1 = computeR1(w)
    val r2 = computeRegionAfterVC(w, r1)

    w = step0(w)
    w = step1a(w)
    if (exceptions2.contains(w)) return w.replace('Y', 'y')
    w = step1b(w, r1)
    w = step1c(w)
    w = step2(w, r1)
    w = step3(w, r1, r2)
    w = step4(w, r2)
    w = step5(w, r1, r2)
    w.replace('Y', 'y')
  }

  private def isVowel(c: Char): Boolean = vowels.contains(c) // 'Y' is a consonant

  /** R1: region after the first non-vowel following a vowel; special-cased
    * prefixes gener-, commun-, arsen- per the algorithm definition. */
  private def computeR1(w: String): Int = {
    for (p <- Seq("gener", "commun", "arsen"))
      if (w.startsWith(p)) return p.length
    computeRegionAfterVC(w, 0)
  }

  private def computeRegionAfterVC(w: String, from: Int): Int = {
    var i = from
    while (i < w.length && !isVowel(w(i))) i += 1        // find a vowel
    while (i < w.length && isVowel(w(i))) i += 1          // find a non-vowel after it
    if (i < w.length) i + 1 else w.length
  }

  /** True if w(i) begins a "short syllable" ending at the word end check is
    * done by callers; definition: a vowel followed by a non-vowel other than
    * w/x/Y and preceded by a non-vowel, OR a vowel at the beginning of the
    * word followed by a non-vowel. */
  private def endsWithShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n >= 2 && n == 2) {
      isVowel(w(0)) && !isVowel(w(1))
    } else if (n >= 3) {
      val c = w(n - 3); val v = w(n - 2); val x = w(n - 1)
      !isVowel(c) && isVowel(v) && !isVowel(x) && x != 'w' && x != 'x' && x != 'Y'
    } else false
  }

  private def isShortWord(w: String, r1: Int): Boolean =
    r1 >= w.length && endsWithShortSyllable(w)

  private def hasVowel(w: String, until: Int): Boolean =
    w.substring(0, math.max(0, until)).exists(isVowel)

  /** Step 0: strip trailing ', 's, 's' (longest first). */
  private def step0(w: String): String = {
    if (w.endsWith("'s'")) w.dropRight(3)
    else if (w.endsWith("'s")) w.dropRight(2)
    else if (w.endsWith("'")) w.dropRight(1)
    else w
  }

  private def step1a(w: String): String = {
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies")) {
      val stem = w.dropRight(3)
      if (stem.length > 1) stem + "i" else stem + "ie"
    } else if (w.endsWith("us") || w.endsWith("ss")) w
    else if (w.endsWith("s")) {
      // delete if the preceding word part contains a vowel not immediately
      // before the s
      if (w.length >= 3 && hasVowel(w, w.length - 2)) w.dropRight(1) else w
    } else w
  }

  private def step1b(w: String, r1: Int): String = {
    def inR1(suffixLen: Int): Boolean = w.length - suffixLen >= r1
    if (w.endsWith("eedly")) {
      if (inR1(5)) w.dropRight(3) else w
    } else if (w.endsWith("eed")) {
      if (inR1(3)) w.dropRight(1) else w
    } else {
      val suffix = Seq("ingly", "edly", "ing", "ed").find(w.endsWith)
      suffix match {
        case Some(suf) if hasVowel(w, w.length - suf.length) =>
          var s = w.dropRight(suf.length)
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s = s + "e"
          else if (doubles.exists(s.endsWith)) s = s.dropRight(1)
          else if (isShortWord(s, computeR1Of(s, r1))) s = s + "e"
          s
        case _ => w
      }
    }
  }

  /** R1 is defined on the original word; after deletions it can only move to
    * the (shorter) word end. */
  private def computeR1Of(s: String, r1: Int): Int = math.min(r1, s.length)

  private def step1c(w: String): String = {
    val n = w.length
    if (n > 2 && (w(n - 1) == 'y' || w(n - 1) == 'Y') && !isVowel(w(n - 2)))
      w.dropRight(1) + "i"
    else w
  }

  // (suffix, replacement); checked longest-first within the step
  private val step2Suffixes: Seq[(String, String)] = Seq(
    "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
    "ousness" -> "ous", "iveness" -> "ive", "tional" -> "tion",
    "biliti" -> "ble", "lessli" -> "less", "entli" -> "ent",
    "ation" -> "ate", "alism" -> "al", "aliti" -> "al", "ousli" -> "ous",
    "iviti" -> "ive", "fulli" -> "ful", "enci" -> "ence", "anci" -> "ance",
    "abli" -> "able", "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
    "bli" -> "ble"
  )

  private def step2(w: String, r1: Int): String = {
    def inR1(l: Int): Boolean = w.length - l >= r1
    for ((suf, rep) <- step2Suffixes)
      if (w.endsWith(suf)) return if (inR1(suf.length)) w.dropRight(suf.length) + rep else w
    if (w.endsWith("ogi")) {
      if (inR1(3) && w.length >= 4 && w(w.length - 4) == 'l') w.dropRight(1) else w
    } else if (w.endsWith("li")) {
      if (inR1(2) && w.length >= 3 && validLiEndings.contains(w(w.length - 3)))
        w.dropRight(2)
      else w
    } else w
  }

  private val step3Suffixes: Seq[(String, String)] = Seq(
    "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
    "icate" -> "ic", "iciti" -> "ic", "ical" -> "ic",
    "ness" -> "", "ful" -> ""
  )

  private def step3(w: String, r1: Int, r2: Int): String = {
    def inR1(l: Int): Boolean = w.length - l >= r1
    if (w.endsWith("ative")) {
      return if (w.length - 5 >= r2) w.dropRight(5) else w
    }
    for ((suf, rep) <- step3Suffixes)
      if (w.endsWith(suf)) return if (inR1(suf.length)) w.dropRight(suf.length) + rep else w
    w
  }

  private val step4Suffixes: Seq[String] = Seq(
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "al", "er", "ic"
  )

  private def step4(w: String, r2: Int): String = {
    def inR2(l: Int): Boolean = w.length - l >= r2
    // "ion" handled specially (delete only after s/t); must be considered in
    // the longest-match ordering: "sion"/"tion" are longer matches than "ion"
    // prefixed suffixes above don't overlap except through "ement"> "ment"> "ent"
    for (suf <- step4Suffixes) {
      if (w.endsWith(suf)) {
        return if (inR2(suf.length)) w.dropRight(suf.length) else w
      }
    }
    if (w.endsWith("ion") && inR2(3) && w.length >= 4 &&
        (w(w.length - 4) == 's' || w(w.length - 4) == 't')) w.dropRight(3)
    else w
  }

  private def step5(w: String, r1: Int, r2: Int): String = {
    val n = w.length
    if (n > 0 && w(n - 1) == 'e') {
      if (n - 1 >= r2) w.dropRight(1)
      else if (n - 1 >= r1 && !endsWithShortSyllable(w.dropRight(1))) w.dropRight(1)
      else w
    } else if (n > 1 && w(n - 1) == 'l' && n - 1 >= r2 && w(n - 2) == 'l') {
      w.dropRight(1)
    } else w
  }
}
