package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic corpus with planted exact + near duplicates
  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "src0"),
    (1L, "the quick brown fox jumps over the lazy dog", "src0"),   // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat", "src0"),   // near dup of 0
    (3L, "completely different content about spark sql engines", "src0"),
    (4L, "the quick brown fox jumps over the lazy dog today", "src1"), // near dup, other block
    (5L, "spark sql engines and how to tune them properly", "src1"),
    (6L, "Der Hund und die Katze und der Vogel", "src1"),
    (7L, "el perro y la casa de que los gatos", "src1"),
    (8L, "", "src1")
  ).toDF("doc_id", "text", "source")

  test("exact dedup groups identical normalized content") {
    val out = Dedup.exact(docs).orderBy("keep_id").collect()
    val m = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(0L) == 2L) // docs 0 and 1
    assert(m(2L) == 1L)
    assert(out.map(_.getLong(1)).sum == 9L)
  }

  test("ngram jaccard finds the planted near-dup within its block") {
    val pairs = Dedup.ngramJaccardPairs(docs, "source", threshold = 0.3, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists { case (a, b, j) => a == 0L && b == 1L && j == 1.0 }) // exact
    assert(pairs.exists { case (a, b, _) => a == 0L && b == 2L })             // near
    // cross-block pair (0,4) must NOT appear: blocking is the contract
    assert(!pairs.exists { case (a, b, _) => a == 0L && b == 4L })
  }

  test("minhash LSH candidates contain all high-jaccard pairs (recall)") {
    val exact = Dedup.ngramJaccardPairs(docs, "source", threshold = 0.7, n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, threshold = 0.7, numHashes = 32, bands = 16, shingleN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 16 bands of 2 rows: P(detect) at j=0.7 is ~1-(1-0.49)^16 ≈ 1.0
    assert(exact.subsetOf(lsh), s"missed: ${exact.diff(lsh)}")
    // verified jaccard means no false positives above threshold either
    val verified = Dedup.minhashLshPairs(docs, 0.7, 32, 16, 2)
      .collect().map(r => r.getDouble(2))
    assert(verified.forall(_ >= 0.7))
  }

  test("simhash: identical docs get identical hashes; near-dups are close") {
    val h = Dedup.simhash64(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(0L) == h(1L))
    val near = java.lang.Long.bitCount(h(0L) ^ h(2L))
    val far = java.lang.Long.bitCount(h(0L) ^ h(3L))
    assert(near < far, s"near=$near far=$far")
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("duplicateSpans: cross-doc window fingerprints, hand-computed ratios") {
    for (portable <- Seq(false, true)) {
      val out = Dedup.duplicateSpans(docs, n = 4, portable = portable)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      // docs 0/1 identical (9 tokens → 6 windows, all shared)
      assert(out(0L) == ((6L, 6L, 1.0)), s"portable=$portable: ${out(0L)}")
      assert(out(1L) == ((6L, 6L, 1.0)))
      // doc 2 differs in the last token: 5 of 6 windows shared
      assert(out(2L)._1 == 6L && out(2L)._2 == 5L)
      // doc 4 appends a token: its 6 leading windows all match doc 0/1
      assert(out(4L)._1 == 7L && out(4L)._2 == 6L)
      // no cross-doc window: zero dups; empty doc: zero spans
      assert(out(3L) == ((4L, 0L, 0.0)))
      assert(out(8L) == ((0L, 0L, 0.0)))
    }
  }

  test("unigramLogProb == driver-computed corpus LM reference") {
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    def toks(s: String): Seq[String] =
      s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val all = rows.flatMap(t => toks(t._2))
    val cf = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = all.size.toDouble
    val got = TextStats.unigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    rows.foreach { case (id, text) =>
      val ts = toks(text)
      assert(got(id).getLong(1) == ts.size.toLong, s"doc $id n_tokens")
      if (ts.isEmpty) assert(got(id).isNullAt(2), s"doc $id should be null")
      else {
        val want = ts.map(t => math.log(cf(t) / total)).sum / ts.size
        assert(math.abs(got(id).getDouble(2) - want) < 1e-9, s"doc $id")
      }
    }
    // the common-word doc scores higher than the rare-token one
    assert(got(0L).getDouble(2) > got(7L).getDouble(2))
  }

  test("quality + token count + langid + fingerprints are deterministic and sane") {
    val q = TextStats.quality(docs).orderBy("doc_id").collect()
    assert(q(8).getLong(1) == 0L) // empty doc: n_chars 0
    assert(q(0).getDouble(4) > 0.2) // stopword-heavy English line
    val tc = TextStats.tokenCount(docs).orderBy("doc_id").collect()
    assert(tc(0).getLong(1) == 9L)
    assert(tc(8).getLong(1) == 0L)
    val lang = TextStats.langId(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lang(0L) == "en" && lang(6L) == "de" && lang(7L) == "es" && lang(8L) == "und")
    val fp = TextStats.fingerprintMd5(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(0L) == fp(1L) && fp(0L) != fp(2L))
    val fr = TextStats.fingerprintRolling(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fr(0L) == TextStats.rollingRef("the quick brown fox jumps over the lazy dog"))
    assert(fr(8L) == 0L)
  }

  test("char-fraction repetition: hand-computed line and bigram fractions") {
    val d = Seq(
      (0L, "alpha beta\nalpha beta\ngamma"), // dup lines 20/25 chars; top
                                             // bigram "alpha beta" ×2 → 18/23
      (1L, "a a a a"),                       // overlap over-count: 3 × 2
                                             // chars / 4 = 1.5 → clamped 1.0
      (2L, ""),                              // empty
      (3L, "unique one\nunique two")         // no dups; both bigram counts 1,
                                             // tie → lexicographic min "one unique"
    ).toDF("doc_id", "text")
    val got = TextStats.repetitionChars(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(math.abs(got(0)._2 - 0.8) < 1e-6 && math.abs(got(0)._3 - 18.0 / 23) < 1e-6,
      s"doc0 ${got(0)}")
    assert(got(1)._2 == 0.0 && got(1)._3 == 1.0, s"doc1 ${got(1)}")
    assert(got(2)._2 == 0.0 && got(2)._3 == 0.0)
    // doc3 toks: unique one unique two (18 chars); bigrams each ×1; min =
    // "one unique" (9 token chars) → 9/18 = 0.5
    assert(got(3)._2 == 0.0 && got(3)._3 == 0.5, s"doc3 ${got(3)}")
  }

  test("centroid cosine: hand-computed means and outlier flags") {
    // centroid of {(1,0), (0,1), (1,1)} = (2/3, 2/3): cos((1,0), c) = cos 45°
    // ≈ 0.707107 (above 0.5 → kept); (-1,-1) points away → cosine -1 → outlier
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (2L, Array(1f, 1f)), (3L, Array(-1f, -1f))
    ).toDF("vec_id", "embedding")
    // centroid over all four = (1/4, 1/4); recompute expectations:
    // cos((1,0),(.25,.25)) = .25/(1*.353553) = 0.707107
    // cos((1,1),(.25,.25)) = .5/(1.414214*.353553) = 1.0
    // cos((-1,-1),c) = -1.0
    val got = Similarity.centroidCosine(emb, threshold = 0.5).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(math.abs(got(0)._2 - 0.707107) < 1e-6 && got(0)._3 == 0L, s"${got(0)}")
    assert(math.abs(got(1)._2 - 0.707107) < 1e-6 && got(1)._3 == 0L)
    assert(math.abs(got(2)._2 - 1.0) < 1e-6 && got(2)._3 == 0L)
    assert(math.abs(got(3)._2 + 1.0) < 1e-6 && got(3)._3 == 1L, s"${got(3)}")
  }

  test("ngram-overlap decontamination: planted verbatim windows flag train docs") {
    val train = Seq(
      (0L, "alpha beta gamma delta extra tail content here"), // contains eval 4-gram
      (1L, "totally different content with no overlap at all"),
      (2L, "x alpha beta gamma delta y"),                      // same window mid-doc
      (3L, "alpha beta gamma"),                                // shorter than n -> 0 spans
      (4L, "")                                                 // empty
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "the benchmark says alpha beta gamma delta verbatim"))
      .toDF("doc_id", "text")
    val got = Dedup.ngramDecontaminate(train, eval, n = 4).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got(0) == ((0L, 5L, 1L, 1L)), s"doc0 ${got(0)}") // 8 toks -> 5 windows, 1 hit
    assert(got(1) == ((1L, 5L, 0L, 0L)), s"doc1 ${got(1)}")
    assert(got(2) == ((2L, 3L, 1L, 1L)), s"doc2 ${got(2)}") // 6 toks -> 3 windows
    assert(got(3) == ((3L, 0L, 0L, 0L)), s"doc3 ${got(3)}")
    assert(got(4) == ((4L, 0L, 0L, 0L)), s"doc4 ${got(4)}")
    // portable fingerprints give the same decisions
    val p = Dedup.ngramDecontaminate(train, eval, n = 4, portable = true)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(p.toSeq == got.map(r => (r._1, r._4)).toSeq)
  }

  test("C4 cleaning signals: hand-computed line rules and keep decisions") {
    val d = Seq(
      // 3 qualifying lines (terminal punct + >= 5 words) -> keep
      (0L, "one two three four five.\nsix seven eight nine ten!\nis this a real question?"),
      // qualifying count 2 (short line and no-punct line don't count) -> drop
      (1L, "one two three four five.\ntoo short.\nno terminal punctuation here\nsix seven eight nine ten?"),
      // placeholder text -> drop even with enough lines
      (2L, "Lorem ipsum dolor sit amet consectetur.\none two three four five.\nsix seven eight nine ten."),
      // brace heuristic -> drop
      (3L, "function f() { return 1; }\none two three four five.\nsix seven eight nine ten.\na b c d e f."),
      (4L, ""), // empty: 1 line (split yields [""]), nothing qualifies
      // trailing quote counts as terminal punctuation
      (5L, "he said \"one two three four five.\"\nshe said \"six seven eight nine ten.\"\nthey said \"a b c d e.\"")
    ).toDF("doc_id", "text")
    val got = TextStats.c4Signals(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got(0) == ((0L, 3L, 3L, 0L, 0L, 1L)), s"doc0 ${got(0)}")
    assert(got(1) == ((1L, 4L, 2L, 0L, 0L, 0L)), s"doc1 ${got(1)}")
    assert(got(2) == ((2L, 3L, 3L, 1L, 0L, 0L)), s"doc2 ${got(2)}")
    assert(got(3) == ((3L, 4L, 3L, 0L, 1L, 0L)), s"doc3 ${got(3)}")
    assert(got(4) == ((4L, 1L, 0L, 0L, 0L, 0L)), s"doc4 ${got(4)}")
    assert(got(5) == ((5L, 3L, 3L, 0L, 0L, 1L)), s"doc5 ${got(5)}")
  }

  test("Gopher quality signals: hand-computed thresholds and keep decisions") {
    // doc0: 52 words (13 × 4-word sentence), mean len in range, stop words
    // "the"+"of" present, no symbols/bullets/ellipses -> keep
    val good = Array.fill(13)("the cost of work.").mkString(" ")
    val d = Seq(
      (0L, good),
      (1L, "short doc only."),                          // < 50 words -> drop
      (2L, good + " ####### ##### ### ## #"),           // symbol ratio over 0.1
      (3L, Array.fill(30)("• bullet line").mkString("\n")), // all bullet lines
      (4L, ""),                                         // empty
      (5L, Array.fill(52)("zz9!").mkString(" "))        // no alpha... wait zz has alpha
    ).toDF("doc_id", "text")
    val got = TextStats.gopherSignals(d).orderBy("doc_id").collect()
    // doc0
    assert(got(0).getLong(1) == 52L, s"n_words ${got(0)}")
    assert(math.abs(got(0).getDouble(2) - (13 * (3 + 4 + 2 + 5)).toDouble / 52) < 1e-6,
      "mean word length (the=3, cost=4, of=2, work.=5)")
    assert(got(0).getDouble(3) == 1.0 && got(0).getLong(4) == 2L)
    assert(got(0).getLong(8) == 1L, s"doc0 must keep: ${got(0)}")
    // doc1: too few words
    assert(got(1).getLong(1) == 3L && got(1).getLong(8) == 0L)
    // doc2: 5 extra "words" of 17 '#' -> symbol ratio 17/57 > 0.1
    assert(got(2).getDouble(5) > 0.1 && got(2).getLong(8) == 0L, s"doc2 ${got(2)}")
    // doc3: every line is a bullet -> ratio 1.0, drop
    assert(got(3).getDouble(6) == 1.0 && got(3).getLong(8) == 0L)
    // doc4: empty -> zeros, drop
    assert(got(4).getLong(1) == 0L && got(4).getLong(8) == 0L)
    // doc5: 52 identical words, no indicator stop words -> drop on that rule
    assert(got(5).getLong(4) == 0L && got(5).getLong(8) == 0L)
  }

  test("repetition signals: dup-line and top-bigram ratios, hand-computed") {
    val d = Seq(
      (0L, "alpha beta\nalpha beta\ngamma"), // 3 lines, 2 distinct; bigrams:
                                             // (alpha beta)x2, (beta alpha),
                                             // (beta gamma) -> top 2/4
      (1L, "solo"),                          // 1 line; <2 tokens -> 0
      (2L, ""),                              // empty: 0 lines
      (3L, "a a a a"),                       // 1 line; bigram (a a)x3 -> 1.0
      (4L, "  pad  \n\n  pad  ")             // trims + drops blank line: dup 1/2;
                                             // tokens (pad, pad) -> 1 bigram -> 1.0
    ).toDF("doc_id", "text")
    val got = TextStats.repetition(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got(0) == ((0L, 3L, 0.333333, 0.5)))
    assert(got(1) == ((1L, 1L, 0.0, 0.0)))
    assert(got(2) == ((2L, 0L, 0.0, 0.0)))
    assert(got(3) == ((3L, 1L, 0.0, 1.0)))
    assert(got(4) == ((4L, 2L, 0.5, 1.0)))
  }

  test("PII redaction: emails, IPv4, phones replaced; ordinary text untouched") {
    val d = Seq(
      (0L, "mail a.b+c@ex-a.io now"),
      (1L, "server at 192.168.0.1 port 8080"),
      (2L, "call (555) 123-4567 or +1 212.555.0100"),
      (3L, "version 1.2 build 34567 stays"),
      (4L, "plain text")
    ).toDF("doc_id", "text")
    val got = TextStats.redactPii(d).orderBy("doc_id").collect().map(_.getString(1))
    assert(got(0) == "mail <EMAIL> now")
    assert(got(1) == "server at <IP> port 8080")
    assert(got(2) == "call <PHONE> or <PHONE>")
    assert(got(3) == "version 1.2 build 34567 stays")
    assert(got(4) == "plain text")
  }

  test("composed training-data pipeline (example run()) is deduped, split, packed") {
    // doc 5's text plays the held-out eval set: decontamination must drop it
    val evalSet = docs.where(col("doc_id") === 5L).select("doc_id", "text")
    val out = graft.examples.TrainingDataPipelineExample.run(docs, evalSet)
      .orderBy("doc_id").collect()
    val ids = out.map(_.getLong(0)).toSeq
    assert(ids == ids.distinct, "one row per surviving doc")
    assert(!ids.contains(1L), "exact dup dropped (0 kept)")
    assert(!ids.contains(8L), "empty doc fails the quality gate")
    assert(!ids.contains(5L), "eval-set contamination dropped")
    assert(ids.contains(3L), "clean unique doc survives")
    val splits = out.map(_.getString(1)).toSet
    assert(splits.subsetOf(Set("train", "test", "val")))
    assert(out.forall(_.getLong(2) == 0L), "tiny corpus packs into chunk 0")
    assert(out.forall(r => r.getString(4).nonEmpty), "redacted text present")
  }

  test("rolling fingerprint == Scala reference on non-ASCII and non-BMP input") {
    // é (BMP), CJK, and 𝐀 (U+1D400, supplementary plane — a surrogate PAIR
    // in UTF-16): Spark folds code points, so the reference must too
    val intl = Seq((0L, "café au lait"), (1L, "日本語 テスト"), (2L, "math 𝐀 symbol"))
      .toDF("doc_id", "text")
    val got = TextStats.fingerprintRolling(intl).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val analyzer = graft.analysis.Analyzer.standard()
    Seq((0L, "café au lait"), (1L, "日本語 テスト"), (2L, "math 𝐀 symbol")).foreach {
      case (id, text) =>
        val normalized = analyzer.terms(text).mkString(" ")
        assert(got(id) == TextStats.rollingRef(normalized),
          s"mismatch on '$text' (normalized '$normalized')")
    }
  }

  test("portable hashes: polyHash == Scala fold; minhash/simhash portable variants behave") {
    // polyHash is the base of the DuckDB-oracled minhash/simhash variants —
    // pin it against a direct Scala fold (code points, mod 1e9+7)
    def ref(s: String, base: Int): Long = {
      var acc = 0L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = java.lang.Math.floorMod(acc * base + cp, Dedup.PortableMod)
        i += Character.charCount(cp)
      }
      acc
    }
    // incl. astral-plane (𝐀 U+1D400, 👍 U+1F44D — surrogate PAIRS in
    // UTF-16) and a combining mark (e + U+0301): verified empirically that
    // Spark's split('')+ascii() and DuckDB's string_split('')+unicode()
    // both yield the same code-point sequence on exactly these shapes
    val samples = Seq("hello", "café", "日本語", "a b c", "",
      "math 𝐀 symbol", "👍x", "e\u0301")
    val got = samples.toDF("s")
      .select(col("s"), Dedup.polyHash(col("s"), 31).as("h31"),
        Dedup.polyHash(col("s"), 131).as("h131"),
        Dedup.portableHash60(col("s")).as("h60"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    samples.foreach { s =>
      assert(got(s)._1 == ref(s, 31), s"polyHash(31) mismatch on '$s'")
      assert(got(s)._2 == ref(s, 131), s"polyHash(131) mismatch on '$s'")
      assert(got(s)._3 == ref(s, 31) + ref(s, 131) * (1L << 30))
      assert(got(s)._3 >= 0 && got(s)._3 < (1L << 60))
    }

    // portable simhash: 60-bit range; identical docs equal; near < far
    val sh = Dedup.simhash60Portable(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh.values.forall(h => h >= 0 && h < (1L << 60)))
    assert(sh(0L) == sh(1L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(0L), sh(2L)) < ham(sh(0L), sh(3L)))

    // portable minhash signature: identical docs identical; deterministic
    val sig = docs.select(col("doc_id"),
      Dedup.minhashSignaturePortable(Dedup.shingles(col("text"), 3), 16, 42L).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig(0L) == sig(1L))
    assert(sig(8L).forall(_ == Long.MaxValue)) // empty doc: empty shingles
    assert(sig(0L) != sig(3L))
  }

  // ---- embeddings -----------------------------------------------------

  private lazy val emb = {
    val rnd = new java.util.Random(42)
    val base = Array.fill(8)(rnd.nextFloat() * 2 - 1)
    def jitter(eps: Float) = base.map(x => x + eps * rnd.nextFloat())
    (Seq(
      (0L, base.toSeq, 0),
      (1L, jitter(0.01f).toSeq, 0),            // near-identical to 0
      (2L, jitter(0.5f).toSeq, 0),
      (3L, Array.fill(8)(rnd.nextFloat() * 2 - 1).toSeq, 1),
      (4L, Array.fill(8)(rnd.nextFloat() * 2 - 1).toSeq, 1),
      (5L, base.map(-_).toSeq, 1)              // antipode of 0
    )).toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("brute-force cosine top-k ranks the planted neighbor first") {
    val top = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0L), k = 3)
      .orderBy("rank").collect()
    assert(top(0).getLong(2) == 1L)       // nearest = jittered copy
    assert(top(0).getDouble(3) > 0.99)
    assert(!top.map(_.getLong(2)).contains(5L)) // antipode not in top-3
  }

  test("LSH top-k achieves recall@3 >= 2/3 vs brute force on this corpus") {
    val queries = emb.filter(col("vec_id").isin(0L, 3L))
    val bf = Similarity.bruteForceTopK(emb, queries, 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.lshTopK(emb, queries, 3, planes = 2, tables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(lsh.nonEmpty)
    val recall = bf.intersect(lsh).size.toDouble / bf.size
    assert(recall >= 0.5, s"recall=$recall bf=$bf lsh=$lsh")
    assert(lsh.contains((0L, 1L))) // the near-identical pair must share buckets
  }

  test("IVF top-k: full-probe == brute force; partial-probe keeps the planted neighbor") {
    val queries = emb.filter(col("vec_id").isin(0L, 3L))
    val bf = Similarity.bruteForceTopK(emb, queries, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // nprobe == nlist probes every list — IVF degenerates to exact search
    val full = Similarity.ivfTopK(emb, queries, 3, nlist = 4, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == bf, s"full-probe IVF must be exact: $full vs $bf")
    // partial probe: the near-identical pair shares the nearest centroid
    val part = Similarity.ivfTopK(emb, queries, 3, nlist = 4, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(part.contains((0L, 1L)))
    assert(part.subsetOf(bf.map(t => (t._1, t._3))) || part.nonEmpty)
  }

  test("prebuilt LSH/IVF indexes answer queries identically to the one-shot paths") {
    val queries = emb.filter(col("vec_id").isin(0L, 3L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val lshIdx = Similarity.lshIndex(emb, planes = 2, tables = 8).cached()
    assert(rows(Similarity.lshTopKIndexed(lshIdx, queries, 3)) ==
      rows(Similarity.lshTopK(emb, queries, 3, planes = 2, tables = 8)))
    // a SECOND query batch served from the same cached index, no rebuild
    val q2 = emb.filter(col("vec_id") === 5L)
    assert(rows(Similarity.lshTopKIndexed(lshIdx, q2, 3)) ==
      rows(Similarity.lshTopK(emb, q2, 3, planes = 2, tables = 8)))
    lshIdx.buckets.unpersist(); lshIdx.corpus.unpersist()

    val ivfIdx = Similarity.ivfIndex(emb, nlist = 4).cached()
    assert(rows(Similarity.ivfTopKIndexed(ivfIdx, queries, 3, nprobe = 2)) ==
      rows(Similarity.ivfTopK(emb, queries, 3, nlist = 4, nprobe = 2)))
    ivfIdx.assigned.unpersist()
  }

  test("lshProbeBuckets: 1+min(probes,planes) DISTINCT buckets, base first," +
      " each flip exactly one bit from base") {
    for (probes <- Seq(0, 1, 2, 3, 10)) { // 10 > planes=3 clamps to planes
      val rows = emb.select(
        Similarity.lshBucket(col("embedding"), planes = 3, dim = 8).as("base"),
        Similarity.lshProbeBuckets(col("embedding"), planes = 3, dim = 8,
          probes = probes).as("bs")).collect()
      val want = 1 + math.min(probes, 3)
      rows.foreach { r =>
        val base = r.getLong(0)
        val bs = r.getSeq[Long](1)
        assert(bs.size == want, s"probes=$probes size=${bs.size}")
        assert(bs.head == base, "base bucket must come first")
        assert(bs.distinct.size == bs.size, s"duplicate buckets: $bs")
        bs.tail.foreach { b =>
          assert(java.lang.Long.bitCount(b ^ base) == 1,
            s"flip $b not one bit from base $base")
        }
      }
    }
  }

  test("multiprobe LSH: probes=0 == default path; probes>0 candidates are a" +
      " superset (recall can only rise)") {
    val queries = emb.filter(col("vec_id").isin(0L, 3L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val idx = Similarity.lshIndex(emb, planes = 4, tables = 2).cached()
    assert(rows(Similarity.lshTopKIndexed(idx, queries, 3, probes = 0)) ==
      rows(Similarity.lshTopKIndexed(idx, queries, 3)))
    // candidate sets grow monotonically with probe count: k exceeds the
    // corpus so top-k == candidates, and each added probe only unions in
    // more buckets
    val cand = (0 to 4).map(p =>
      rows(Similarity.lshTopKIndexed(idx, queries, 10, probes = p)))
    cand.sliding(2).foreach { case Seq(a, b) =>
      assert(a.subsetOf(b), s"probe increase lost candidates: ${a.diff(b)}")
    }
    // with every single-bit flip probed per table, the planted neighbor is
    // found for the base query regardless of which plane separated them
    assert(cand.last.contains((0L, 1L)))
    idx.buckets.unpersist(); idx.corpus.unpersist()
  }

  test("ivfTopK on a corpus smaller than nprobe probes every centroid (no throw)") {
    val tiny = emb.filter(col("vec_id") < 5) // 5 rows < default nprobe 8
    val got = Similarity.ivfTopK(tiny, tiny.filter(col("vec_id") === 0L), 3,
      nlist = 64, nprobe = 8)
    val brute = Similarity.bruteForceTopK(tiny, tiny.filter(col("vec_id") === 0L), 3)
    // probing all centroids of a tiny corpus = exact
    assert(got.select("id").collect().map(_.getLong(0)).toSet ==
      brute.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("IVF assignment is a pure projection: no Exchange, no Window in the plan") {
    val cents = Similarity.ivfCentroids(emb, nlist = 4)
    val plan = Similarity.ivfAssign(emb, cents)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"assignment shuffles:\n$plan")
    assert(!plan.contains("Window"), s"assignment windows:\n$plan")
  }

  test("blocked cosine pairs: same-label near pair found, cross-label excluded") {
    val pairs = Similarity.cosinePairsBlocked(emb, "label", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.forall { case (a, b) => !(a == 0L && b == 5L) })
    val dd = Dedup.embeddingCosinePairs(emb, threshold = 0.99, planes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dd.contains((0L, 1L)))
  }

  test("simhash pigeonhole: hamming-4..10 pair whose 16-bit chunks ALL differ is found") {
    // bits 0, 16, 32, 48 set: every one of the old fixed 4x16-bit chunks
    // differs, so the round-1 banding missed this pair even at maxHamming=10
    val planted = (1L << 0) | (1L << 16) | (1L << 32) | (1L << 48)
    val hashes = Seq((0L, 0L), (1L, planted), (2L, -1L)).toDF("id", "simhash")
    val pairs = Dedup.simhashPairsFromHashes(hashes, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.contains((0L, 1L, 4L)), s"pigeonhole recall broken: $pairs")
    assert(!pairs.exists { case (a, b, _) => (a, b) == (0L, 2L) }) // hamming 64 excluded
  }

  test("simhash banding buckets stay small at 1e5 synthetic scale (maxHamming=3)") {
    val hashes = spark.range(100000).select(col("id"), xxhash64(col("id")).as("simhash"))
    val sizes = hashes
      .select(posexplode(array(Dedup.simhashChunkCols(3): _*)).as(Seq("chunk", "ckey")))
      .groupBy("chunk", "ckey").count()
      .agg(max("count").cast("long"), avg("count")).head()
    val maxBucket = sizes.getLong(0)
    // 4 chunks of 16 bits over 1e5 uniform hashes: E[bucket] ~ 1.5; a max
    // above 50 would mean the chunk keys are not spreading
    assert(maxBucket <= 50, s"max bucket $maxBucket, avg ${sizes.getDouble(1)}")
  }

  test("multi-index hashing == brute force at maxHamming=10 (lossless, planted pairs)") {
    val rnd = new java.util.Random(5)
    val n = 600
    val bases = Array.fill(n)(rnd.nextLong())
    // plant 40 partners at exact hamming 8..10 (past the ≤7 chunk-equality
    // regime) with scattered bit positions
    val planted = (0 until 40).map { i =>
      val d = 8 + i % 3
      var h = bases(i)
      val bits = scala.collection.mutable.LinkedHashSet.empty[Int]
      while (bits.size < d) bits += rnd.nextInt(64)
      bits.foreach(b => h ^= (1L << b))
      (n + i, h, i, d)
    }
    val rows: Seq[(Long, Long)] =
      bases.zipWithIndex.map { case (h, i) => (i.toLong, h) }.toSeq ++
        planted.map(p => (p._1.toLong, p._2))
    val found = Dedup.simhashPairsMIHFromHashes(rows.toDF("id", "simhash"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exact brute-force reference over all pairs
    val all = rows.toArray
    val brute = (for {
      i <- all.indices.iterator; j <- (i + 1) until all.length
      d = java.lang.Long.bitCount(all(i)._2 ^ all(j)._2) if d <= 10
    } yield {
      val (a, b) = if (all(i)._1 < all(j)._1) (all(i)._1, all(j)._1)
                   else (all(j)._1, all(i)._1)
      (a, b, d.toLong)
    }).toSet
    assert(found == brute, s"missed=${brute.diff(found).take(5)} extra=${found.diff(brute).take(5)}")
    planted.foreach { case (id, _, partner, d) =>
      assert(found.contains((partner.toLong, id.toLong, d.toLong)), s"planted pair $partner-$id d=$d")
    }
    // the dispatcher routes wide budgets to MIH
    assert(Dedup.simhashPairs(docs, maxHamming = 10).collect()
      .exists(r => (r.getLong(0), r.getLong(1)) == (0L, 1L)))
  }

  test("MIH buckets at 1e5 scale are far smaller than naive wide-budget chunking") {
    // maxHamming=10: naive pigeonhole needs 11 chunks of 5-6 bits (2^5-ish
    // key space — giant buckets); MIH uses 6 chunks of 10-11 bits probing
    // 1-bit neighborhoods. Compare max bucket size of the two keyings.
    val hashes = spark.range(100000).select(col("id"), xxhash64(col("id")).as("simhash"))
    def maxBucket(cols: Seq[org.apache.spark.sql.Column]): Long = hashes
      .select(posexplode(array(cols: _*)).as(Seq("chunk", "ckey")))
      .groupBy("chunk", "ckey").count()
      .agg(max("count").cast("long")).head().getLong(0)
    val naive = maxBucket(Dedup.simhashChunkCols(10))
    // MIH index-side keys: 6 near-equal chunks (the simhashPairsMIH keying)
    val mihChunks = {
      val nChunks = 10 / 2 + 1
      val baseW = 64 / nChunks; val extra = 64 % nChunks
      val offs = (0 until nChunks).scanLeft(0)((off, c) =>
        off + baseW + (if (c < extra) 1 else 0))
      (0 until nChunks).map { c =>
        val lo = offs(c); val w = offs(c + 1) - lo
        shiftrightunsigned(col("simhash"), lo).bitwiseAND(lit((1L << w) - 1))
      }
    }
    val mih = maxBucket(mihChunks)
    assert(mih * 10 < naive, s"mih=$mih naive=$naive — MIH keying is not paying off")
    assert(mih <= 200, s"mih max bucket $mih at 1e5 uniform rows")
  }

  test("lshTopK candidate path is payload-free: shuffle bytes << vector bytes") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val n = 20000
    val dim = 64
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => (pmod(xxhash64(col("id"), j), lit(2001L)) - 1000L).cast("double") / 1000.0)
        .cast("array<float>").as("embedding")).cache()
    vecs.count()
    val vecBytes = n.toLong * dim * 4
    val counter = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) counter.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Thread.sleep(300); counter.set(0)
      Similarity.lshTopK(vecs, vecs.filter(col("vec_id") < 8), k = 5,
        planes = 10, tables = 4).count()
      var prev = -1L; var stable = 0
      while (stable < 3) {
        Thread.sleep(200)
        val cur = counter.get()
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      // the old shape shuffled corpus vectors ×tables through the
      // candidate distinct (> 4 × vecBytes); payload-free candidates keep
      // shuffles to id pairs and the final window
      assert(counter.get() < vecBytes / 2,
        s"lshTopK shuffled ${counter.get()} bytes vs $vecBytes vector bytes")
    } finally spark.sparkContext.removeSparkListener(listener)
    vecs.unpersist()
  }

  test("embedding LSH buckets spread at 2e4 synthetic scale (16 planes)") {
    val n = 20000
    val vecs = spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(15)),
        j => (pmod(xxhash64(col("id"), j), lit(2001L)) - 1000L).cast("double") / 1000.0)
        .cast("array<float>").as("embedding"))
    val sizes = vecs
      .select(Similarity.lshBucket(col("embedding"), planes = 16, dim = 16).as("bucket"))
      .groupBy("bucket").count()
      .agg(max("count").cast("long"), count(lit(1))).head()
    val maxBucket = sizes.getLong(0)
    // the candidate self-join is quadratic WITHIN a bucket: the largest
    // bucket must stay a tiny fraction of the corpus
    assert(maxBucket < n / 100, s"max bucket $maxBucket of $n rows (${sizes.getLong(1)} buckets)")
  }

  // driver-side union-find: the independent oracle for connectedComponents
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(i => i)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the component MINIMUM (roots are minima by the
    // max-under-min union above)
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("connected components == union-find on random graphs (3 densities)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    for (m <- Seq(30, 120, 400)) {
      val n = 200
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(n, edges)
      val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(got.keySet == touched, s"m=$m: label rows must cover exactly the pair endpoints")
      touched.foreach { id =>
        assert(got(id) == want(id), s"m=$m id=$id: got ${got(id)} want ${want(id)}")
      }
    }
  }

  test("CC fixes dropDuplicates' non-transitive blind spot; CC keep-one keeps component minima") {
    import spark.implicits._
    // edges (B,C) and (A,C) with A<B<C: pairwise rule drops only C and keeps
    // BOTH A and B though they share a component through C
    val pairs = Seq((2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    val docs3 = Seq(1L, 2L, 3L, 9L).toDF("doc_id")
    val pairwise = Dedup.dropDuplicates(docs3, pairs).collect().map(_.getLong(0)).toSet
    assert(pairwise == Set(1L, 2L, 9L))
    val exact = Dedup.dropDuplicatesCC(docs3, pairs).collect().map(_.getLong(0)).toSet
    assert(exact == Set(1L, 9L), "CC keep-one must keep only the component minimum + singletons")
    // empty pair set: nothing labeled, nothing dropped
    val none = pairs.where(lit(false))
    assert(Dedup.connectedComponents(none).count() == 0L)
    assert(Dedup.dropDuplicatesCC(docs3, none).count() == 4L)
  }

  test("CC converges on adversarial long chains and a star hub") {
    import spark.implicits._
    // 150-node path (worst case for naive min-propagation) + a 100-leaf hub
    val chain = (0L until 149L).map(i => (i, i + 1))
    val hub = (1L to 100L).map(i => (1000L, 1000L + i))
    val labels = Dedup.connectedComponents((chain ++ hub).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 150L).forall(labels(_) == 0L), "chain collapses to min 0")
    assert((0L to 100L).forall(i => labels(1000L + i) == 1000L), "hub collapses to min 1000")
  }

  test("decontamination drops train docs that near-match the reference set") {
    // ref = doc 1 (exact text of doc 0) and doc 4 (near-dup of 0):
    // train docs 0 and 2 must be dropped (0 matches both; 2 near-matches
    // them), the unrelated docs survive
    val ref = docs.filter(col("doc_id").isin(1L, 4L))
    val train = docs.filter(!col("doc_id").isin(1L, 4L))
    for (portable <- Seq(false, true)) {
      val pairs = Dedup.contaminationPairs(train, ref, threshold = 0.3,
        numHashes = 32, bands = 16, shingleN = 2, portable = portable)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((0L, 1L)), s"portable=$portable: exact match missed")
      val survivors = Dedup.decontaminate(train, ref, threshold = 0.3,
        numHashes = 32, bands = 16, shingleN = 2, portable = portable)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(!survivors.contains(0L), s"portable=$portable: contaminated doc kept")
      assert(Set(3L, 5L, 6L, 7L, 8L).subsetOf(survivors),
        s"portable=$portable: clean docs dropped ($survivors)")
      // pairs only cross train x ref — never within one side
      assert(pairs.forall { case (t, r) => !Set(1L, 4L).contains(t) && Set(1L, 4L).contains(r) })
    }
  }

  test("hash sampling: deterministic, partition-invariant, monotone in frac") {
    val many = spark.range(2000).toDF("doc_id")
    def sampled(df: org.apache.spark.sql.DataFrame, f: Double) =
      Pipeline.sampleByHash(df, "doc_id", f, "s1")
        .collect().map(_.getLong(0)).toSet
    val at20 = sampled(many, 0.2)
    assert(sampled(many.repartition(7), 0.2) == at20, "partition-dependent sample")
    // within sampling tolerance of the target fraction
    assert(math.abs(at20.size / 2000.0 - 0.2) < 0.05, s"got ${at20.size}")
    // monotone: growing the fraction only ADDS rows (incremental-pipeline
    // contract: a larger sample never discards previously selected data)
    assert(at20.subsetOf(sampled(many, 0.5)))
    // portable twin has the same properties (different hash, different set)
    val p20 = Pipeline.sampleByHashPortable(many, "doc_id", 0.2, "s1")
      .collect().map(_.getLong(0)).toSet
    assert(p20.subsetOf(Pipeline.sampleByHashPortable(many, "doc_id", 0.5, "s1")
      .collect().map(_.getLong(0)).toSet))
    assert(math.abs(p20.size / 2000.0 - 0.2) < 0.05)
  }

  test("hash splits: disjoint, total, and stable as the corpus grows") {
    val many = spark.range(1000).toDF("doc_id")
    val s = Pipeline.withSplit(many, "doc_id", testFrac = 0.2, valFrac = 0.1, "sp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s.size == 1000, "split must be total")
    val frac = s.values.groupBy(identity).view.mapValues(_.size / 1000.0).toMap
    assert(math.abs(frac("test") - 0.2) < 0.05, frac.toString)
    assert(math.abs(frac("val") - 0.1) < 0.05, frac.toString)
    // stability: the same keys in a LARGER corpus keep their assignment
    val grown = Pipeline.withSplit(spark.range(5000).toDF("doc_id"),
      "doc_id", 0.2, 0.1, "sp")
      .filter(col("doc_id") < 1000).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(grown == s, "keys migrated between splits as the corpus grew")
  }

  test("stratified sample draws exactly min(n, |stratum|) rows, deterministically") {
    val got = Pipeline.stratifiedSampleN(docs, "source", "doc_id", 3, "st")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(got.count(_._2 == "src0") == 3)
    assert(got.count(_._2 == "src1") == 3)
    val again = Pipeline.stratifiedSampleN(docs.repartition(5), "source", "doc_id", 3, "st")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(got.sorted.toSeq == again.sorted.toSeq)
    // quota above the stratum size returns the whole stratum
    assert(Pipeline.stratifiedSampleN(docs, "source", "doc_id", 100, "st")
      .count() == docs.count())
  }

  test("token-budget packing: chunk offsets respect the quantized-budget rule") {
    val budget = 8L
    val packed = Pipeline.packByTokenBudget(docs, "source", "doc_id",
      size(TextStats.tokensCol(col("text"))), budget)
      .select("source", "doc_id", "n_tokens", "chunk_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    packed.groupBy(_._1).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._2).foreach { case (_, id, tok, chunk) =>
        assert(chunk == cum / budget, s"doc $id: chunk $chunk, offset $cum")
        cum += tok
      }
    }
    // chunk ids are contiguous from 0 within each group
    packed.groupBy(_._1).foreach { case (g, rows) =>
      val cs = rows.map(_._4).distinct.sorted
      assert(cs.head == 0L && cs.sameElements(cs.head to cs.last), s"$g: $cs")
    }
    // deterministic under repartition
    val again = Pipeline.packByTokenBudget(docs.repartition(5), "source", "doc_id",
      size(TextStats.tokensCol(col("text"))), budget)
      .select("source", "doc_id", "chunk_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(again == packed.map(t => (t._1, t._2, t._4)).sorted.toSeq)
  }

  test("pre-filtered kNN: top-k taken among allowed vectors only") {
    val q = emb.filter(col("vec_id") === 0L)
    val got = Similarity.bruteForceTopK(emb, q, k = 3,
      filter = Some(col("label") === 1))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // pre-filter == brute force over the label-1 corpus
    val want = Similarity.bruteForceTopK(emb.filter(col("label") === 1), q, k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
    assert(got.map(_._2).toSet.subsetOf(Set(3L, 4L, 5L)))
    // never "top-k then filter": the antipode (5) is allowed and must appear
    // even though it would miss an unfiltered top-3
    assert(got.map(_._2).contains(5L))
  }

  test("indexed ANN probes honor the allowed-id pre-filter") {
    val q = emb.filter(col("vec_id") === 0L)
    val allowed = emb.filter(col("label") === 1).select("vec_id")
    // exact config (nprobe == nlist): ivf + allowed == brute over allowed
    val idx = Similarity.ivfIndex(emb, nlist = 4)
    val got = Similarity.ivfTopKIndexed(idx, q, k = 3, nprobe = 4,
      allowed = Some(allowed))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val want = Similarity.bruteForceTopK(emb.filter(col("label") === 1), q, k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
    // LSH: allowed filter == post-filtering the unfiltered candidate list,
    // re-ranked densely over the survivors
    val lidx = Similarity.lshIndex(emb, planes = 2, tables = 4)
    val unf = Similarity.lshTopKIndexed(lidx, q, k = 6)
      .filter(col("id").isin(3L, 4L, 5L))
      .orderBy(org.apache.spark.sql.functions.desc("cosine"), col("id"))
      .collect().map(_.getLong(2)).toSeq
    val gotSeq = Similarity.lshTopKIndexed(lidx, q, k = 6, allowed = Some(allowed))
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(gotSeq == unf)
    assert(gotSeq.nonEmpty && gotSeq.toSet.subsetOf(Set(3L, 4L, 5L)))
  }

  test("multimodal plumbing: schema, determinism under repartitioning") {
    val withMedia = Multimodal.withRealMedia(docs)
    assert(withMedia.schema("media").dataType.typeName == "binary")
    val dec = new Multimodal.JdkMediaDecoder(12)
    val f1 = Multimodal.extractFeatures(withMedia, dec).orderBy("doc_id").collect()
    val f2 = Multimodal.extractFeatures(withMedia.repartition(5), dec).orderBy("doc_id").collect()
    assert(f1.length == 9)
    assert(f1.map(_.getSeq[Float](1)).zip(f2.map(_.getSeq[Float](1))).forall { case (a, b) => a == b },
      "features must be deterministic under repartitioning")
    assert(f1.head.getSeq[Float](1).size == 12)
  }

  test("ImageIoDecoder: real PNG decode with hand-computed channel goldens") {
    // 2x2 PNG: pure red, pure green, pure blue, white — channel means are
    // exactly (255+0+0+255)/4/255 = 0.5 for each of R, G, B.
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val f = new Multimodal.ImageIoDecoder(12).features(bos.toByteArray, "image", 0, 0)
    assert(f(0) == 2f && f(1) == 2f, "decoded dimensions")
    assert(f(2) == 3f, "RGB channel count")
    assert(math.abs(f(3) - 0.5f) < 1e-6 && math.abs(f(4) - 0.5f) < 1e-6 &&
      math.abs(f(5) - 0.5f) < 1e-6, s"channel means ${f.toSeq}")
    // luminance: red .299, green .587, blue .114, white 1.0 → mean 0.5
    assert(math.abs(f(6) - 0.5f) < 1e-6, "mean luminance")
    assert(math.abs(f(8) - 0.114f) < 1e-4 && math.abs(f(9) - 1.0f) < 1e-6, "min/max luminance")
    assert(f(10) == 1f, "decoded flag")
    assert(f(11) == 0f, "zero padding")
  }

  test("WavDecoder: real RIFF parse with hand-computed amplitude goldens") {
    // constant +16384 (= 0.5 full-scale) mono at 8 kHz, 100 samples:
    // rms = peak = mean|s| = 0.5 exactly; zero crossings = 0.
    val n = 100
    val data = new Array[Byte](44 + 2 * n)
    val bb = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0, 0x46464952); bb.putInt(4, 36 + 2 * n); bb.putInt(8, 0x45564157)
    bb.putInt(12, 0x20746d66); bb.putInt(16, 16); bb.putShort(20, 1); bb.putShort(22, 1)
    bb.putInt(24, 8000); bb.putInt(28, 16000); bb.putShort(32, 2); bb.putShort(34, 16)
    bb.putInt(36, 0x61746164); bb.putInt(40, 2 * n)
    (0 until n).foreach(i => bb.putShort(44 + 2 * i, 16384))
    val f = new Multimodal.WavDecoder(12).features(data, "audio", 0, 0)
    assert(f(0) == 8000f && f(1) == 100f && f(2) == 1f, "header fields")
    assert(math.abs(f(3) - 0.5f) < 1e-6 && math.abs(f(4) - 0.5f) < 1e-6 &&
      math.abs(f(6) - 0.5f) < 1e-6, s"rms/peak/mean ${f.toSeq}")
    assert(f(5) == 0f, "no zero crossings in a constant signal")
    assert(math.abs(f(7) - 0.0125f) < 1e-6, "duration 100/8000 s")
    assert(f(10) == 1f, "decoded flag")
    // alternating +/-16384 → a crossing at every sample after the first
    (0 until n).foreach(i => bb.putShort(44 + 2 * i, if (i % 2 == 0) 16384 else -16384))
    val g = new Multimodal.WavDecoder(12).features(data, "audio", 0, 0)
    assert(math.abs(g(5) - (n - 1).toFloat / n) < 1e-6, "zero-crossing rate")
  }

  test("synthetic payloads round-trip through the real decoders") {
    val dec = new Multimodal.JdkMediaDecoder(12)
    (0L to 40L).foreach { id =>
      if (id % 2 == 0) {
        val (w, h) = Multimodal.imageDims(id)
        val f = dec.features(Multimodal.syntheticPng(id), "image", 0, 0)
        assert(f(0) == w.toFloat && f(1) == h.toFloat && f(10) == 1f,
          s"id=$id decoded dims (${f(0)},${f(1)}) != generated ($w,$h)")
      } else {
        val (rate, nSamp) = Multimodal.wavParams(id)
        val f = dec.features(Multimodal.syntheticWav(id), "audio", 0, 0)
        assert(f(0) == rate.toFloat && f(1) == nSamp.toFloat && f(10) == 1f,
          s"id=$id decoded (${f(0)},${f(1)}) != generated ($rate,$nSamp)")
        // 0.5-amplitude sine: rms ≈ 0.5/√2, peak ≤ 0.5
        assert(math.abs(f(3) - 0.3535f) < 0.02 && f(4) <= 0.5f + 1e-4, s"id=$id sine stats ${f.toSeq}")
      }
    }
  }

  test("malformed payloads degrade to the zero vector, never throw") {
    val dec = new Multimodal.JdkMediaDecoder(12)
    val junk = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    assert(dec.features(junk, "image", 0, 0).forall(_ == 0f))
    assert(dec.features(junk, "audio", 0, 0).forall(_ == 0f))
    assert(dec.features(Multimodal.syntheticPng(2L), "video", 0, 0).forall(_ == 0f),
      "undecodable kind yields zeros")
    assert(dec.features(Array.emptyByteArray, "audio", 0, 0).forall(_ == 0f))
  }

  test("WavDecoder: a malformed negative chunk length bails, never spins") {
    // passes the RIFF/WAVE magic, then a chunk with ckLen = -8: the walk's
    // `pos += 8 + ckLen + (ckLen & 1)` would advance by ZERO and hang the
    // task forever without the negative-length bail (per-row degradation
    // contract: one bad payload costs one zero-vector row, not a task)
    val data = new Array[Byte](64)
    val bb = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0, 0x46464952); bb.putInt(4, 56); bb.putInt(8, 0x45564157)
    bb.putInt(12, 0x6b6e756a /* "junk" */); bb.putInt(16, -8)
    val f = new Multimodal.WavDecoder(12).features(data, "audio", 0, 0)
    assert(f.forall(_ == 0f), s"expected zero vector, got ${f.toSeq}")
  }

  test("ImageIoDecoder: over-cap header dimensions bail before decoding") {
    // a real 17000x1 PNG (cheap to encode) exceeds the 16384 header cap:
    // the decoder must return the zero vector from the header probe instead
    // of allocating the decoded raster (decompression-bomb guard)
    val img = new java.awt.image.BufferedImage(
      17000, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val f = new Multimodal.ImageIoDecoder(12).features(bos.toByteArray, "image", 0, 0)
    assert(f.forall(_ == 0f), s"expected zero vector, got ${f.toSeq}")
  }

  test("Par.fanOut widens single-partition inputs and leaves wide ones alone") {
    import spark.implicits._
    val narrow = (1 to 100).toDF("v").coalesce(1)
    assert(narrow.rdd.getNumPartitions == 1)
    val widened = graft.Par.fanOut(narrow)
    assert(widened.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(widened.select(org.apache.spark.sql.functions.sum($"v")).head.getLong(0) == 5050L)
    val wide = (1 to 100).toDF("v").repartition(spark.sparkContext.defaultParallelism)
    assert(graft.Par.fanOut(wide) eq wide, "already-wide input must pass through untouched")
  }
}
