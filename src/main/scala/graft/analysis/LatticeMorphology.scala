package graft.analysis

/** MeCab/kagome-style lattice morphological analyzer: common-prefix
  * dictionary matches + character-class unknown-word nodes form a lattice
  * over the input; a Viterbi pass picks the connection-cost-minimal
  * segmentation; tokens carry (surface, katakana reading) and whitespace
  * POS is dropped — the exact output contract of the reference's kagome
  * wrapper (`/root/reference/morphology/kagome.go:24-44`: skip `空白`
  * features, reading = feature 8 when present else the surface form).
  *
  * The ALGORITHM is the real one (the same lattice + Viterbi structure
  * kagome/MeCab run); the DICTIONARY is an embedded demo-scale excerpt
  * ([[LatticeMorphology.demo]]) because the sandbox has no egress to fetch
  * IPA-neologd (~50 MB). Production use injects a full dictionary through
  * the same constructor — entries and connection ids are plain data.
  * Spark-side nothing changes with dictionary size: the analyzer is a
  * serializable value captured by the fused analyze `mapPartitions` pass
  * (one broadcast-sized deserialization per executor, pure per-row compute,
  * no shuffle).
  */
object LatticeMorphology {

  /** One dictionary word: MeCab-shaped (left/right context ids for the
    * connection matrix, additive word cost, part of speech, reading). */
  final case class Entry(
      surface: String,
      leftId: Int,
      rightId: Int,
      cost: Int,
      pos: String,
      reading: String)

  // Connection-context ids (a demo-scale stand-in for IPADIC's ~1300):
  val Bos = 0      // also EOS, as in IPADIC matrix row/col 0
  val Noun = 1
  val Particle = 2
  val Verb = 3
  val Aux = 4
  val Symbol = 5
  val Adj = 6
  val Space = 7
  val NumIds = 8

  /** conn(prev.rightId)(next.leftId): additive transition cost. Hand-tuned
    * demo matrix with the qualitative shape of IPADIC's: particles glue to
    * anything, double particles are penalized (so も+も loses to the noun
    * もも), noun-noun compounding carries a mild penalty (so 東京+都 loses
    * to the single entry 東京都). */
  private val conn: Array[Array[Int]] = {
    val c = Array.fill(NumIds, NumIds)(800)
    def set(from: Int, to: Int, v: Int): Unit = c(from)(to) = v
    // BOS/EOS
    set(Bos, Noun, 0); set(Bos, Verb, 200); set(Bos, Adj, 200)
    set(Bos, Particle, 1500); set(Bos, Aux, 2000); set(Bos, Symbol, 0)
    set(Noun, Bos, 0); set(Verb, Bos, 0); set(Adj, Bos, 0)
    set(Particle, Bos, 600); set(Aux, Bos, 0); set(Symbol, Bos, 0)
    // within-sentence
    set(Noun, Particle, 0); set(Particle, Noun, 0)
    set(Noun, Noun, 400)          // compounding allowed, mildly penalized
    set(Particle, Particle, 3000) // double particles strongly penalized
    set(Particle, Verb, 0); set(Verb, Particle, 200)
    set(Noun, Verb, 300); set(Verb, Noun, 300)
    set(Verb, Aux, 0); set(Aux, Particle, 200); set(Aux, Bos, 0)
    set(Aux, Aux, 200)            // stacked auxiliaries: まし+た, でし+た
    set(Adj, Noun, 100); set(Noun, Adj, 400); set(Particle, Adj, 0)
    set(Adj, Aux, 0)              // 高かっ+た, 面白く+ない(aux reading)
    set(Adj, Particle, 200)       // 高けれ+ば, 高く+て
    // whitespace is transparent glue
    (0 until NumIds).foreach { i => set(i, Space, 0); set(Space, i, 0) }
    c
  }

  private val WhitespacePos = "空白"

  // ---- unknown-word character classes (IPADIC char.def shape) ------------
  private final val ClsKatakana = 0
  private final val ClsHiragana = 1
  private final val ClsKanji = 2
  private final val ClsAlpha = 3
  private final val ClsNumeric = 4
  private final val ClsSpace = 5
  private final val ClsOther = 6

  private def charClass(cp: Int): Int =
    if (Character.isWhitespace(cp)) ClsSpace
    else if (cp >= 0x30A0 && cp <= 0x30FF || cp == 0x30FC) ClsKatakana
    else if (cp >= 0x3040 && cp <= 0x309F) ClsHiragana
    else if (Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN) ClsKanji
    else if (Character.isLetter(cp)) ClsAlpha
    else if (Character.isDigit(cp)) ClsNumeric
    else ClsOther

  /** Whether an unknown node GROUPS a same-class run (vs a single code
    * point), and its per-class lattice parameters — the demo analogue of
    * char.def's invoke/group/length plus unk.def's costs. */
  private def unkParams(cls: Int): (Boolean, Int, Int, String) = cls match {
    //          group, ctxId,   cost, pos
    case ClsKatakana => (true, Noun, 9000, "名詞")
    case ClsHiragana => (false, Noun, 12000, "名詞")
    case ClsKanji    => (false, Noun, 11000, "名詞")
    case ClsAlpha    => (true, Noun, 9000, "名詞")
    case ClsNumeric  => (true, Noun, 9000, "名詞")
    case ClsSpace    => (true, Space, 0, WhitespacePos)
    case _           => (false, Symbol, 10000, "記号")
  }

  /** Hiragana → katakana (the two blocks are offset by 0x60); used for
    * unknown-word readings, mirroring kagome's surface fallback upgraded
    * to the reading form the downstream kana/romaji filters expect. */
  private[analysis] def toKatakana(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch >= 0x3041 && ch <= 0x3096) sb.append((ch + 0x60).toChar)
      else sb.append(ch)
      i += 1
    }
    sb.toString
  }

  /** Demo-scale dictionary: enough of IPADIC's most common entries to
    * exercise every lattice mechanism (ambiguous noun/particle overlaps,
    * compound-vs-split choices, verbs + auxiliaries, readings that differ
    * from surfaces). NOT a linguistic resource — a full dictionary drops in
    * through the same Entry shape. */
  private[analysis] def n(s: String, r: String, c: Int = 7000) =
    Entry(s, Noun, Noun, c, "名詞", r)
  private[analysis] def p(s: String, r: String, c: Int = 4000) =
    Entry(s, Particle, Particle, c, "助詞", r)
  private[analysis] def v(s: String, r: String, c: Int = 7000) =
    Entry(s, Verb, Verb, c, "動詞", r)
  private[analysis] def a(s: String, r: String, c: Int = 7500) =
    Entry(s, Adj, Adj, c, "形容詞", r)
  private[analysis] def x(s: String, r: String, c: Int = 6000) =
    Entry(s, Aux, Aux, c, "助動詞", r)

  private[analysis] val demoEntries: Seq[Entry] = {
    Seq(
      // the classic lattice ambiguity: すもももももももものうち
      n("すもも", "スモモ"), n("もも", "モモ"), n("うち", "ウチ"),
      // compound vs split: 東京都 must beat 東京+都
      n("東京", "トウキョウ", 6000), n("都", "ト", 8000), n("東京都", "トウキョウト", 9000),
      n("京都", "キョウト", 6500),
      // common nouns
      n("日本", "ニホン"), n("日本語", "ニホンゴ", 8000), n("語", "ゴ", 8500),
      n("検索", "ケンサク"), n("索引", "サクイン"), n("全文", "ゼンブン"),
      n("形態", "ケイタイ"), n("素", "ソ", 9000), n("形態素", "ケイタイソ", 8500),
      n("解析", "カイセキ"), n("今日", "キョウ"), n("天気", "テンキ"),
      n("人", "ヒト"), n("時間", "ジカン"), n("会話", "カイワ"),
      // particles (short, ambiguous with noun prefixes)
      p("の", "ノ"), p("も", "モ"), p("は", "ハ"), p("が", "ガ"), p("を", "ヲ"),
      p("に", "ニ"), p("で", "デ"), p("と", "ト"), p("へ", "ヘ"), p("から", "カラ"),
      p("まで", "マデ"), p("より", "ヨリ"),
      // verbs + auxiliaries
      v("住む", "スム"), v("する", "スル"), v("いる", "イル"), v("ある", "アル"),
      v("行く", "イク"), v("見る", "ミル"), v("し", "シ", 7500),
      x("ます", "マス"), x("です", "デス"), x("た", "タ", 5000),
      // adjectives
      a("良い", "ヨイ"), a("高い", "タカイ"), a("早い", "ハヤイ")
    )
  }

  val demo: LatticeMorphology = new LatticeMorphology(demoEntries)

  /** Demo entries plus [[CommonJaDict]]'s embedded general-vocabulary list
    * (hand-typed public dictionary data — readings and parts of speech are
    * common knowledge, JMdict/IPADIC-style; no external fetch) plus
    * [[JaInflection]]'s generated conjugation rows (godan/ichidan verb
    * paradigms, i-adjective forms, irregular する/来る — the same expansion
    * a real MeCab dictionary precomputes). Same mechanisms, broader
    * coverage: everyday nouns, full verb/adjective inflection, adverbs,
    * auxiliaries, numerals. */
  lazy val extended: LatticeMorphology =
    new LatticeMorphology(demoEntries ++ CommonJaDict.entries ++ JaInflection.entries)
}

/** See [[LatticeMorphology$]]. Instances are cheap serializable values; the
  * prefix index rebuilds lazily per executor after deserialization. */
final class LatticeMorphology(entries: Seq[LatticeMorphology.Entry])
    extends Morphology {
  import LatticeMorphology._

  // surface -> entries, plus the maximum surface length in chars, for
  // common-prefix search. @transient: rebuilt on first use per executor.
  @transient private lazy val bySurface: java.util.HashMap[String, List[Entry]] = {
    val m = new java.util.HashMap[String, List[Entry]]()
    entries.foreach { e =>
      require(e.surface.nonEmpty, "empty dictionary surface")
      m.merge(e.surface, List(e), (a, b) => b ::: a)
    }
    m
  }
  // foldLeft, not .max: an EMPTY dictionary must degrade to pure
  // unknown-node segmentation, not crash on empty.max inside a task
  @transient private lazy val maxSurfaceLen: Int =
    entries.foldLeft(0)((m, e) => math.max(m, e.surface.length))

  private[analysis] final case class Node(
      start: Int, end: Int, leftId: Int, rightId: Int, cost: Int,
      pos: String, surface: String, reading: String)

  override def analyze(s: String): Seq[(String, String)] =
    tokens(s).collect { case t if t.pos != WhitespacePos => (t.surface, t.reading) }

  /** Full segmentation including whitespace nodes (dropped by analyze). */
  private[analysis] def tokens(s: String): Seq[Node] = {
    val n = s.length
    if (n == 0) return Nil
    val maxLen = maxSurfaceLen

    // nodes grouped by START char index; every index gets at least one node
    // (unknown fallback), so the lattice is always connected
    val starting = Array.fill(n)(List.empty[Node])
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      val cls = charClass(cp)
      var hasDict = false
      var len = 1
      val lim = math.min(maxLen, n - i)
      while (len <= lim) {
        // char-slice keys are safe: a dictionary surface never starts or
        // ends mid-surrogate-pair, so non-boundary slices simply miss
        val cand = bySurface.get(s.substring(i, i + len))
        if (cand != null) {
          hasDict = true
          cand.foreach { e =>
            starting(i) ::= Node(i, i + len, e.leftId, e.rightId, e.cost,
              e.pos, e.surface, e.reading)
          }
        }
        len += 1
      }
      val (group, ctx, ucost, upos) = unkParams(cls)
      // IPADIC shape: katakana/alpha/numeric/space unknowns are ALWAYS
      // proposed (invoke) so runs stay whole even when a prefix is known;
      // other classes only when the dictionary has nothing here
      val invoke = group || !hasDict
      if (invoke) {
        var end = i + Character.charCount(cp)
        if (group) {
          var steps = 1
          while (end < n && steps < 16 && charClass(s.codePointAt(end)) == cls) {
            end += Character.charCount(s.codePointAt(end))
            steps += 1
          }
        }
        val surf = s.substring(i, end)
        val reading = if (cls == ClsHiragana) toKatakana(surf) else surf
        starting(i) ::= Node(i, end, ctx, ctx, ucost, upos, surf, reading)
      }
      i += Character.charCount(cp)
    }

    // Viterbi over node ends: bestByEnd(e) = min-cost node list ending at e
    val bestCost = new java.util.HashMap[Node, Long]()
    val bestPrev = new java.util.HashMap[Node, Node]()
    val endingAt = Array.fill(n + 1)(List.empty[Node])
    // forward pass in start order guarantees predecessors are final before
    // a node is relaxed (all edges go strictly left to right)
    var st = 0
    while (st < n) {
      starting(st).foreach { node =>
        val best: (Long, Node) =
          if (st == 0) (conn(Bos)(node.leftId).toLong, null)
          else {
            var bc = Long.MaxValue
            var bp: Node = null
            endingAt(st).foreach { prev =>
              val pc = bestCost.get(prev)
              val c = pc + conn(prev.rightId)(node.leftId)
              if (c < bc || (c == bc && bp != null && prev.start < bp.start)) {
                bc = c; bp = prev
              }
            }
            (bc, bp)
          }
        if (best._1 != Long.MaxValue) {
          bestCost.put(node, best._1 + node.cost)
          bestPrev.put(node, best._2)
          endingAt(node.end) ::= node
        }
      }
      st += 1
    }

    var last: Node = null
    var lastCost = Long.MaxValue
    endingAt(n).foreach { node =>
      val c = bestCost.get(node) + conn(node.rightId)(Bos)
      if (c < lastCost) { lastCost = c; last = node }
    }
    require(last != null, s"disconnected lattice for input of length $n")
    var path = List.empty[Node]
    var cur = last
    while (cur != null) { path ::= cur; cur = bestPrev.get(cur) }
    path
  }
}
