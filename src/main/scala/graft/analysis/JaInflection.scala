package graft.analysis

/** Systematic inflection table for the embedded Japanese dictionary —
  * the demo-scale analogue of IPADIC's conjugation rows (MeCab dictionaries
  * list every inflected form as its own entry; the kagome dictionary the
  * reference uses, `/root/reference/morphology/kagome.go:14-44`, ships the
  * same expansion precomputed). Forms are generated from the godan (五段)
  * and ichidan (一段) paradigms — the two regular verb classes — plus the
  * i-adjective (形容詞) paradigm and the two irregular verbs する/来る:
  *
  *  - godan 書く: 書か (未然 — glues to ない), 書き (連用 — glues to ます/
  *    たい), 書い (タ接続 — glues to た/て; ending-dependent euphonic stem:
  *    う/つ/る→っ, く/ぐ→い, す→し, ぬ/ぶ/む→ん, 行く→行っ exceptionally),
  *    書け (仮定 — glues to ば), 書こう (意向)
  *  - ichidan 食べる: 食べ (未然=連用=タ接続), 食べれ (仮定), 食べよう (意向)
  *  - adjective 高い: 高く (連用), 高かっ (タ接続), 高くて, 高けれ (仮定),
  *    高くない (plain negative)
  *
  * Readings derive mechanically: the suffix's katakana is the hiragana
  * shifted by 0x60 ([[LatticeMorphology.toKatakana]]).
  */
private[analysis] object JaInflection {
  import LatticeMorphology.{Entry, Verb, Adj, Aux}
  import LatticeMorphology.toKatakana

  // kana columns of the godan paradigm, keyed by the dictionary-form ending
  private val aCol = Map('う' -> "わ", 'く' -> "か", 'ぐ' -> "が", 'す' -> "さ",
    'つ' -> "た", 'ぬ' -> "な", 'ぶ' -> "ば", 'む' -> "ま", 'る' -> "ら")
  private val iCol = Map('う' -> "い", 'く' -> "き", 'ぐ' -> "ぎ", 'す' -> "し",
    'つ' -> "ち", 'ぬ' -> "に", 'ぶ' -> "び", 'む' -> "み", 'る' -> "り")
  private val eCol = Map('う' -> "え", 'く' -> "け", 'ぐ' -> "げ", 'す' -> "せ",
    'つ' -> "て", 'ぬ' -> "ね", 'ぶ' -> "べ", 'む' -> "め", 'る' -> "れ")
  private val oCol = Map('う' -> "お", 'く' -> "こ", 'ぐ' -> "ご", 'す' -> "そ",
    'つ' -> "と", 'ぬ' -> "の", 'ぶ' -> "ぼ", 'む' -> "も", 'る' -> "ろ")
  private val taStem = Map('う' -> "っ", 'つ' -> "っ", 'る' -> "っ",
    'く' -> "い", 'ぐ' -> "い", 'す' -> "し", 'ぬ' -> "ん", 'ぶ' -> "ん", 'む' -> "ん")

  // inflected forms cost slightly above dictionary forms: when a surface is
  // ambiguous between a listed word and a generated form, the listed word
  // (with its curated cost) wins ties
  private val FormCost = 7200

  private def ve(surface: String, reading: String) =
    Entry(surface, Verb, Verb, FormCost, "動詞", reading)

  /** The five regular godan forms of a dictionary-form verb. */
  def godan(surface: String, reading: String): Seq[Entry] = {
    val last = surface.last
    require(aCol.contains(last), s"not a godan ending: $surface")
    val sStem = surface.init
    val rStem = reading.init
    def f(suffix: String) = ve(sStem + suffix, rStem + toKatakana(suffix))
    val ta = if (surface == "行く") "っ" else taStem(last)
    Seq(f(aCol(last)), f(iCol(last)), f(ta), f(eCol(last)), f(oCol(last) + "う"))
  }

  /** The three distinct ichidan forms (未然=連用=タ接続 share the stem). */
  def ichidan(surface: String, reading: String): Seq[Entry] = {
    require(surface.last == 'る', s"not an ichidan ending: $surface")
    val sStem = surface.init
    val rStem = reading.init
    Seq(ve(sStem, rStem), ve(sStem + "れ", rStem + "レ"), ve(sStem + "よう", rStem + "ヨウ"))
  }

  /** (dictionary form, reading, class) for every verb the embedded
    * dictionary lists; 'g' = godan, 'i' = ichidan. る-ending class
    * membership is lexical (帰る/入る/切る are godan; 着る/出る ichidan) —
    * encoded per word exactly as a real dictionary does. */
  private val verbClasses: Seq[(String, String, Char)] = Seq(
    // demo entries
    ("住む", "スム", 'g'), ("いる", "イル", 'i'), ("ある", "アル", 'g'),
    ("行く", "イク", 'g'), ("見る", "ミル", 'i'),
    // CommonJaDict dictionary forms
    ("食べる", "タベル", 'i'), ("飲む", "ノム", 'g'), ("読む", "ヨム", 'g'),
    ("書く", "カク", 'g'), ("聞く", "キク", 'g'), ("話す", "ハナス", 'g'),
    ("買う", "カウ", 'g'), ("売る", "ウル", 'g'), ("使う", "ツカウ", 'g'),
    ("作る", "ツクル", 'g'), ("歩く", "アルク", 'g'), ("走る", "ハシル", 'g'),
    ("泳ぐ", "オヨグ", 'g'), ("帰る", "カエル", 'g'), ("出る", "デル", 'i'),
    ("入る", "ハイル", 'g'), ("立つ", "タツ", 'g'), ("座る", "スワル", 'g'),
    ("待つ", "マツ", 'g'), ("持つ", "モツ", 'g'), ("取る", "トル", 'g'),
    ("置く", "オク", 'g'), ("送る", "オクル", 'g'), ("届く", "トドク", 'g'),
    ("始まる", "ハジマル", 'g'), ("始める", "ハジメル", 'i'), ("終わる", "オワル", 'g'),
    ("続く", "ツヅク", 'g'), ("変わる", "カワル", 'g'), ("変える", "カエル", 'i'),
    ("考える", "カンガエル", 'i'), ("思う", "オモウ", 'g'), ("知る", "シル", 'g'),
    ("分かる", "ワカル", 'g'), ("覚える", "オボエル", 'i'), ("忘れる", "ワスレル", 'i'),
    ("教える", "オシエル", 'i'), ("学ぶ", "マナブ", 'g'), ("働く", "ハタラク", 'g'),
    ("休む", "ヤスム", 'g'), ("遊ぶ", "アソブ", 'g'), ("笑う", "ワラウ", 'g'),
    ("泣く", "ナク", 'g'), ("歌う", "ウタウ", 'g'), ("踊る", "オドル", 'g'),
    ("寝る", "ネル", 'i'), ("起きる", "オキル", 'i'), ("会う", "アウ", 'g'),
    ("呼ぶ", "ヨブ", 'g'), ("言う", "イウ", 'g'), ("降る", "フル", 'g'),
    ("晴れる", "ハレル", 'i'), ("曇る", "クモル", 'g'), ("開く", "ヒラク", 'g'),
    ("閉める", "シメル", 'i'), ("付ける", "ツケル", 'i'), ("消す", "ケス", 'g'),
    ("動く", "ウゴク", 'g'), ("止まる", "トマル", 'g'), ("乗る", "ノル", 'g'),
    ("降りる", "オリル", 'i'), ("着く", "ツク", 'g'), ("できる", "デキル", 'i'),
    ("飛ぶ", "トブ", 'g'), ("切る", "キル", 'g'), ("洗う", "アラウ", 'g'),
    ("着る", "キル", 'i'), ("選ぶ", "エラブ", 'g'), ("調べる", "シラベル", 'i'),
    ("探す", "サガス", 'g'), ("見つける", "ミツケル", 'i'), ("試す", "タメス", 'g'),
    ("直す", "ナオス", 'g'), ("壊れる", "コワレル", 'i'), ("落ちる", "オチル", 'i'),
    ("上がる", "アガル", 'g'), ("下がる", "サガル", 'g'), ("進む", "ススム", 'g'),
    ("戻る", "モドル", 'g'), ("押す", "オス", 'g'), ("引く", "ヒク", 'g'),
    ("運ぶ", "ハコブ", 'g'), ("並ぶ", "ナラブ", 'g'), ("集める", "アツメル", 'i'),
    ("集まる", "アツマル", 'g'), ("増える", "フエル", 'i'), ("減る", "ヘル", 'g'),
    ("数える", "カゾエル", 'i')
  )

  /** Irregular verbs: する (し already listed in the demo) and 来る, whose
    * stems change reading with the form — listed explicitly, as IPADIC does. */
  private val irregular: Seq[Entry] = Seq(
    ve("さ", "サ"), ve("すれ", "スレ"), ve("しよう", "シヨウ"),
    ve("来", "キ"), ve("来れ", "クレ"), ve("来よう", "コヨウ"), ve("来い", "コイ")
  )

  /** Additional common verbs NOT in the curated lists — single-sourced
    * here: the dictionary form AND its paradigm both generate from this
    * table. 'g' = godan, 'i' = ichidan. */
  private val extraVerbs: Seq[(String, String, Char)] = Seq(
    ("死ぬ", "シヌ", 'g'), ("打つ", "ウツ", 'g'), ("勝つ", "カツ", 'g'),
    ("負ける", "マケル", 'i'), ("落とす", "オトス", 'g'), ("渡す", "ワタス", 'g'),
    ("渡る", "ワタル", 'g'), ("通う", "カヨウ", 'g'), ("通る", "トオル", 'g'),
    ("過ぎる", "スギル", 'i'), ("過ごす", "スゴス", 'g'), ("決める", "キメル", 'i'),
    ("決まる", "キマル", 'g'), ("伝える", "ツタエル", 'i'), ("届ける", "トドケル", 'i'),
    ("見せる", "ミセル", 'i'), ("借りる", "カリル", 'i'), ("貸す", "カス", 'g'),
    ("返す", "カエス", 'g'), ("払う", "ハラウ", 'g'), ("拾う", "ヒロウ", 'g'),
    ("捨てる", "ステル", 'i'), ("投げる", "ナゲル", 'i'), ("受ける", "ウケル", 'i'),
    ("植える", "ウエル", 'i'), ("育てる", "ソダテル", 'i'), ("育つ", "ソダツ", 'g'),
    ("生きる", "イキル", 'i'), ("生まれる", "ウマレル", 'i'), ("触る", "サワル", 'g'),
    ("吸う", "スウ", 'g'), ("吹く", "フク", 'g'), ("鳴く", "ナク", 'g'),
    ("光る", "ヒカル", 'g'), ("曲がる", "マガル", 'g'), ("曲げる", "マゲル", 'i'),
    ("折る", "オル", 'g'), ("割る", "ワル", 'g'), ("割れる", "ワレル", 'i'),
    ("並べる", "ナラベル", 'i'), ("手伝う", "テツダウ", 'g'), ("頼む", "タノム", 'g'),
    ("断る", "コトワル", 'g'), ("謝る", "アヤマル", 'g'), ("褒める", "ホメル", 'i'),
    ("驚く", "オドロク", 'g'), ("喜ぶ", "ヨロコブ", 'g'), ("怒る", "オコル", 'g'),
    ("困る", "コマル", 'g'), ("疲れる", "ツカレル", 'i'), ("慣れる", "ナレル", 'i'),
    ("比べる", "クラベル", 'i'), ("続ける", "ツヅケル", 'i'), ("足りる", "タリル", 'i'),
    ("増やす", "フヤス", 'g'), ("減らす", "ヘラス", 'g'), ("直る", "ナオル", 'g'),
    ("治る", "ナオル", 'g'), ("壊す", "コワス", 'g'), ("汚れる", "ヨゴレル", 'i'),
    ("濡れる", "ヌレル", 'i'), ("乾く", "カワク", 'g'), ("凍る", "コオル", 'g'),
    ("燃える", "モエル", 'i'), ("焼く", "ヤク", 'g'), ("焼ける", "ヤケル", 'i'),
    ("混ぜる", "マゼル", 'i'), ("包む", "ツツム", 'g'), ("結ぶ", "ムスブ", 'g'),
    ("開ける", "アケル", 'i'), ("閉じる", "トジル", 'i')
  )

  private def dictForm(surface: String, reading: String): Entry =
    Entry(surface, Verb, Verb, 7000, "動詞", reading)

  /** i-adjective paradigm: 連用 (〜く), タ接続 (〜かっ), 連用テ (〜くて),
    * 仮定 (〜けれ), plain negative (〜くない). */
  def adjective(surface: String, reading: String): Seq[Entry] = {
    require(surface.last == 'い', s"not an i-adjective: $surface")
    val sStem = surface.init
    val rStem = reading.init
    def f(suffix: String) =
      Entry(sStem + suffix, Adj, Adj, FormCost + 300, "形容詞", rStem + toKatakana(suffix))
    Seq(f("く"), f("かっ"), f("くて"), f("けれ"), f("くない"))
  }

  /** Adjectives inflected (from the curated dictionary-form lists; いい is
    * suppletive — its inflections come from 良い). */
  private val adjForms: Seq[Entry] = {
    val dict = (LatticeMorphology.demoEntries ++ CommonJaDict.entries)
      .filter(e => e.pos == "形容詞" && e.surface != "いい" && e.surface.last == 'い')
    dict.flatMap(e => adjective(e.surface, e.reading))
  }

  /** Auxiliaries and conjunctive particles the inflected forms glue to
    * (まし/でし/たい/ない are already listed). */
  private val glue: Seq[Entry] = {
    import LatticeMorphology.{p, x}
    Seq(
      x("ませ", "マセ"), x("ん", "ン", 6500), x("なかっ", "ナカッ"),
      x("たかっ", "タカッ"), x("だ", "ダ"), x("だっ", "ダッ"),
      x("だろう", "ダロウ"), x("でしょう", "デショウ"), x("ましょう", "マショウ"),
      x("れる", "レル"), x("られる", "ラレル"), x("せる", "セル"),
      x("させる", "サセル"),
      p("て", "テ"), p("ば", "バ"), p("たり", "タリ"), p("ながら", "ナガラ"),
      p("ね", "ネ"), p("よ", "ヨ"), p("か", "カ"), p("や", "ヤ")
    )
  }

  /** Every generated entry, deduplicated against the curated lists (e.g.
    * the hand-typed 連用形 rows in CommonJaDict): first occurrence wins, so
    * curated costs are preserved. */
  lazy val entries: Seq[Entry] = {
    val curated = (LatticeMorphology.demoEntries ++ CommonJaDict.entries)
      .map(e => (e.surface, e.pos)).toSet
    val generated = (verbClasses ++ extraVerbs).flatMap {
      case (s, r, 'g') => godan(s, r)
      case (s, r, _)   => ichidan(s, r)
    } ++ extraVerbs.map { case (s, r, _) => dictForm(s, r) } ++
      irregular ++ adjForms ++ glue
    generated
      .filterNot(e => curated((e.surface, e.pos)))
      .distinctBy(e => (e.surface, e.pos))
  }
}
