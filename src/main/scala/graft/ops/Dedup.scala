package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape: candidate generation is always a key-equality join
  * (hash/LSH bucket), never an unblocked cross join; exact similarity is
  * verified only on candidates.
  */
object Dedup {

  /** Exact dedup on the normalized token stream: one row per distinct
    * content, keeping the smallest id (a single hash aggregation — the
    * map-side combine collapses duplicates before the shuffle). The group
    * key is the 128-bit MD5 of the normalized text, not the text itself:
    * at 100 TB the shuffle moves 16 bytes per surviving group instead of
    * arbitrary-length documents, and an md5 collision needs ~2^64 distinct
    * docs (birthday bound) — far beyond any corpus. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol),
        md5(to_binary(concat_ws(" ", TextStats.tokensCol(col(textCol))), lit("utf-8"))).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .select(col("keep_id"), col("dup_cnt"))

  /** Word n-gram (shingle) array of the normalized tokens. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextStats.tokensCol(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  private def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double")
        / size(array_union(a, b)).cast("double"))

  /** Blocked exact n-gram Jaccard: candidate pairs share `blockCol` (e.g.
    * source) — the blocking that keeps this linear-ish instead of N².
    * Returns (id_a, id_b, jaccard) for pairs above `threshold`. */
  def ngramJaccardPairs(
      docs: DataFrame,
      blockCol: String,
      threshold: Double,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val withSh = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      shingles(col(textCol), n).as("sh"))
    val a = withSh.select(col("id").as("id_a"), col("blk"), col("sh").as("sh_a"))
    val b = withSh.select(col("id").as("id_b"), col("blk"), col("sh").as("sh_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Fine-grained duplicated-span signal — the n-gram-granular flavor of
    * substring dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better"): every window of `n` consecutive normalized
    * tokens is fingerprinted, and a window whose fingerprint occurs in MORE
    * THAN ONE distinct document is a duplicated span. Returns per doc
    * `(doc_id, n_spans, n_dup_spans, dup_ratio)`; docs shorter than `n`
    * tokens report 0 / 0 / 0.0. Within-doc repeats alone do NOT mark a span
    * (cross-doc is the dedup signal; within-doc repetition is
    * [[TextStats.repetition]]'s job).
    *
    * Scale shape: span rows are payload-free `(hash, doc_id)` — window
    * STRINGS never leave the row they were built in; the cross-doc count
    * and the back-join both shuffle on the 64-bit hash with map-side
    * combine, and nothing is broadcast (the span table is corpus-scale by
    * construction, ~one row per token). `portable = true` swaps xxhash64
    * for the 60-bit polynomial fold so a SQL oracle reproduces the exact
    * fingerprints (collisions and all). */
  /** Every window of `n` consecutive normalized tokens as a space-joined
    * string column (empty array for docs shorter than `n`). */
  private def tokenWindows(textCol: Column, n: Int): Column = {
    val toks = TextStats.tokensCol(textCol)
    val cnt = size(toks) - lit(n - 1)
    when(cnt <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), cnt),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  def duplicateSpans(docs: DataFrame, n: Int = 6, idCol: String = "doc_id",
      textCol: String = "text", portable: Boolean = false): DataFrame = {
    require(n >= 2, s"span window must be >= 2 tokens, got $n")
    val wins = tokenWindows(col(textCol), n)
    val spanRows = docs
      .select(col(idCol).as("doc_id"), explode(wins).as("w"))
      .select(col("doc_id"),
        (if (portable) portableHash60(col("w")) else xxhash64(col("w"))).as("h"))
    val dupH = spanRows
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
      .filter(col("ndocs") > 1)
      .select(col("h"), lit(1L).as("is_dup"))
    val perDoc = spanRows
      .join(dupH, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_spans"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        when(coalesce(col("n_spans"), lit(0L)) === 0, lit(0.0))
          .otherwise(coalesce(col("n_dup_spans"), lit(0L)).cast("double")
            / coalesce(col("n_spans"), lit(1L)).cast("double")).as("dup_ratio"))
  }

  /** Modulus every portable hash works in: intermediates stay far inside a
    * signed 64-bit long, so ANY engine with plain integer arithmetic (no
    * overflow wrap semantics needed) computes identical values — which is
    * what lets the driver's DuckDB oracle check minhash/simhash end-to-end. */
  val PortableMod = 1000000007L

  /** Engine-portable polynomial hash of a string column: fold of the code
    * points, `h = (h*base + cp) mod PortableMod` (≈30 bits of output).
    * Character-level higher-order aggregate — interpreted, not codegen'd —
    * so this is the ORACLE-CHECKABLE variant; the production paths keep
    * codegen'd xxhash64. */
  def polyHash(s: Column, base: Int = 31): Column =
    aggregate(
      filter(split(s, ""), c => c =!= ""),
      lit(0L),
      (acc, ch) => pmod(acc * lit(base.toLong) + ascii(ch).cast("long"), lit(PortableMod)))

  /** Two independent polynomial hashes packed into 60 bits (30 + 30):
    * enough simhash bit-width for a portable near-dup fingerprint. */
  def portableHash60(s: Column): Column =
    polyHash(s, 31) + polyHash(s, 131) * lit(1L << 30)

  /** The seeded affine-permutation coefficients minhash uses — public so an
    * oracle generator can embed the SAME (a, b) pairs as SQL literals. */
  def minhashCoeffs(numHashes: Int, seed: Long = 42L): Array[(Long, Long)] = {
    val rnd = new java.util.Random(seed)
    val p = PortableMod
    Array.fill(numHashes)((math.abs(rnd.nextLong()) % (p - 1) + 1,
      math.abs(rnd.nextLong()) % p))
  }

  /** MinHash signature column: for each of `numHashes` seeded affine
    * permutations over xxhash64(shingle), the minimum value. Empty shingle
    * sets get Long.MaxValue rows (never collide with real content). */
  def minhashSignature(sh: Column, numHashes: Int, seed: Long = 42L): Column = {
    val p = PortableMod
    val mins = minhashCoeffs(numHashes, seed).map { case (ca, cb) =>
      when(size(sh) === 0, lit(Long.MaxValue)).otherwise(
        array_min(transform(sh, s =>
          pmod(pmod(xxhash64(s), lit(p)) * lit(ca) + lit(cb), lit(p)))))
    }
    array(mins.toIndexedSeq: _*)
  }

  /** [[minhashSignature]] with the portable polynomial base hash instead of
    * xxhash64 — bit-identical replicable in ANSI-ish SQL (DuckDB oracle). */
  def minhashSignaturePortable(sh: Column, numHashes: Int, seed: Long = 42L): Column = {
    val p = PortableMod
    val mins = minhashCoeffs(numHashes, seed).map { case (ca, cb) =>
      when(size(sh) === 0, lit(Long.MaxValue)).otherwise(
        array_min(transform(sh, s =>
          pmod(polyHash(s) * lit(ca) + lit(cb), lit(p)))))
    }
    array(mins.toIndexedSeq: _*)
  }

  /** MinHash + LSH banding near-dup pairs: shingle → signature → band
    * buckets → bucket-equality join (the scale path) → exact Jaccard verify
    * on candidates only.
    *
    * @return (id_a, id_b, jaccard) for verified candidates ≥ threshold
    */
  def minhashLshPairs(
      docs: DataFrame,
      threshold: Double,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleN: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      seed: Long = 42L
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    // persisted once: both band-join sides and the verify join read it;
    // without this the shingle+signature chain is recomputed 4x.
    // Par.fanOut BEFORE shingling: a single-file corpus otherwise computes
    // every signature on one core (guide §2.5), and the exchange moves raw
    // text rows, never the derived shingle arrays
    val withSh = graft.Par.fanOut(docs).select(col(idCol).as("id"),
      shingles(col(textCol), shingleN).as("sh")).persist()

    // band key rows carry ONLY (id, band, bucket) — the heavy shingle arrays
    // never enter the candidate join's shuffle
    val banded = withSh
      .withColumn("sig", minhashSignature(col("sh"), numHashes, seed))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          bnd => xxhash64(lit("band"), bnd,
            concat_ws(",", slice(col("sig"), bnd * rowsPerBand + 1, lit(rowsPerBand))))))
          .as(Seq("band", "bucket")))

    val cand = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct() // a pair can collide in several bands

    // exact-Jaccard verification only on candidates
    cand
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** [[minhashLshPairs]] with the portable polynomial base hash AND
    * unhashed band keys: a band's bucket key is the comma-joined slice of
    * the signature itself (a string equality join needs no hash at all),
    * so the ENTIRE pipeline — signature, banding, candidate join, verify —
    * is bit-identical replicable in ANSI-ish SQL (the DuckDB oracle runs
    * it end-to-end). Production banding keeps [[minhashLshPairs]]'
    * codegen'd xxhash64 signature + hashed band keys (fixed-width keys
    * shuffle fewer bytes than slice strings at 100 TB). */
  def minhashLshPairsPortable(
      docs: DataFrame,
      threshold: Double,
      numHashes: Int = 16,
      bands: Int = 8,
      shingleN: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      seed: Long = 42L
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val withSh = graft.Par.fanOut(docs).select(col(idCol).as("id"),
      shingles(col(textCol), shingleN).as("sh")).persist()
    val banded = withSh
      .withColumn("sig", minhashSignaturePortable(col("sh"), numHashes, seed))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          bnd => concat_ws(",", slice(col("sig"), bnd * rowsPerBand + 1, lit(rowsPerBand)))))
          .as(Seq("band", "bkey")))
    val cand = banded.select(col("band"), col("bkey"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bkey"), col("id").as("id_b")),
        Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    cand
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Decontamination pairs: near-dup matches of `train` documents against a
    * REFERENCE corpus (eval/benchmark sets) — the matches a training
    * pipeline must drop before training to avoid benchmark leakage. Same
    * MinHash+LSH shape as [[minhashLshPairs]] but across two frames, with
    * the scale asymmetry exploited: at 10^12 train docs × a few thousand
    * eval docs, the reference band rows and shingle sets are
    * broadcast-sized, so the candidate join and the verify join ship ONLY
    * the broadcast ref side — the train side is one banding pass, no
    * self-join shuffle.
    *
    * @param portable polynomial base hash + unhashed band keys (the
    *                 DuckDB-oracle twin); production default is xxhash64.
    * @return (train_id, ref_id, jaccard) verified >= threshold
    */
  def contaminationPairs(
      train: DataFrame,
      ref: DataFrame,
      threshold: Double,
      numHashes: Int = 16,
      bands: Int = 8,
      shingleN: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      seed: Long = 42L,
      portable: Boolean = false
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    def shingled(df: DataFrame, as: String) =
      df.select(col(idCol).as(as), shingles(col(textCol), shingleN).as(s"sh_$as"))
    def banded(withSh: DataFrame, as: String) = {
      val sig = if (portable) minhashSignaturePortable(col(s"sh_$as"), numHashes, seed)
                else minhashSignature(col(s"sh_$as"), numHashes, seed)
      def key(bnd: Column, sliced: Column) =
        if (portable) concat_ws(",", sliced).cast("string")
        else xxhash64(lit("band"), bnd, concat_ws(",", sliced)).cast("string")
      withSh.withColumn("sig", sig)
        .select(col(as),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            bnd => key(bnd, slice(col("sig"), bnd * rowsPerBand + 1, lit(rowsPerBand)))))
            .as(Seq("band", "bkey")))
    }
    val trainSh = shingled(train, "train_id").persist()
    val refSh = shingled(ref, "ref_id").persist()
    val cand = banded(trainSh, "train_id")
      .join(broadcast(banded(refSh, "ref_id")), Seq("band", "bkey"))
      .select("train_id", "ref_id")
      .distinct() // a pair can collide in several bands
    cand
      .join(trainSh, "train_id")
      .join(broadcast(refSh), "ref_id")
      .select(col("train_id"), col("ref_id"),
        round(jaccard(col("sh_train_id"), col("sh_ref_id")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The rows of `train` that survive decontamination against `ref` (drop
    * every train doc with a verified near-dup in the reference corpus). */
  def decontaminate(
      train: DataFrame,
      ref: DataFrame,
      threshold: Double,
      numHashes: Int = 16,
      bands: Int = 8,
      shingleN: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      seed: Long = 42L,
      portable: Boolean = false
  ): DataFrame = {
    val bad = contaminationPairs(train, ref, threshold, numHashes, bands,
      shingleN, idCol, textCol, seed, portable)
      .select(col("train_id").as(idCol)).distinct()
    train.join(bad, Seq(idCol), "left_anti")
  }

  /** EXACT n-gram-overlap decontamination — the GPT-3 appendix-C / PaLM
    * method, complementary to the MinHash [[decontaminate]] (that one
    * catches NEAR-duplicate docs; this one flags a train doc containing
    * ANY verbatim `n`-token window that also occurs in the eval corpus,
    * however different the rest of the doc is). Returns per-train-doc
    * `(doc_id, n_spans, n_hit_spans, contaminated)` — keep the signal
    * rather than silently dropping rows, so the caller audits thresholds;
    * filter `contaminated = 0` to clean.
    *
    * Scale shape: eval corpora are benchmark-sized, so the eval side's
    * DISTINCT window fingerprints BROADCAST; the 100 TB train side then
    * pays one map-only window explode + broadcast left join — no shuffle
    * of the train corpus at all. `portable = true` swaps xxhash64 for the
    * 60-bit polynomial fold so a SQL oracle reproduces exact fingerprints. */
  def ngramDecontaminate(
      train: DataFrame,
      eval: DataFrame,
      n: Int = 13,
      idCol: String = "doc_id",
      textCol: String = "text",
      portable: Boolean = false
  ): DataFrame = {
    require(n >= 2, s"window must be >= 2 tokens, got $n")
    def h(c: Column) = if (portable) portableHash60(c) else xxhash64(c)
    val evalH = eval
      .select(explode(tokenWindows(col(textCol), n)).as("w"))
      .select(h(col("w")).as("h")).distinct()
    val spanRows = train
      .select(col(idCol).as("doc_id"), explode(tokenWindows(col(textCol), n)).as("w"))
      .select(col("doc_id"), h(col("w")).as("h"))
    val perDoc = spanRows
      .join(broadcast(evalH.select(col("h"), lit(1L).as("hit"))), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit_spans"))
    train.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_hit_spans"), lit(0L)).as("n_hit_spans"),
        (coalesce(col("n_hit_spans"), lit(0L)) > 0).cast("long").as("contaminated"))
  }

  /** 64-bit SimHash over the token multiset (unit weights): bit i is set
    * when more token-hashes have bit i than not. Fully native columns. */
  def simhash64(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = TextStats.tokensCol(col(textCol))
    // hash every token exactly once (a materialized projection between the
    // two selects), then take the bit-majority votes over the long array —
    // NOT xxhash64 inside each of the 64 folds
    val hashed = graft.Par.fanOut(docs).select(col(idCol),
      transform(toks, t => xxhash64(t)).as("th"))
    hashed.select(col(idCol), simhashBits(col("th"), 64).as("simhash"))
  }

  /** SimHash over the portable 60-bit polynomial token hash (bits 60..63
    * always 0) — same majority-vote construction, bit-identical replicable
    * in the DuckDB oracle. Production near-dup banding should keep
    * [[simhash64]] (codegen'd xxhash64, full 64 bits). */
  def simhash60Portable(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = TextStats.tokensCol(col(textCol))
    val hashed = graft.Par.fanOut(docs).select(col(idCol),
      transform(toks, t => portableHash60(t)).as("th"))
    hashed.select(col(idCol), simhashBits(col("th"), 60).as("simhash"))
  }

  /** One bit-majority aggregate per bit position (shift amounts must be
    * Scala literals — functions.shiftright takes Int), OR-folded into a
    * single long; everything stays native. */
  private def simhashBits(th: Column, nBits: Int): Column =
    (0 until nBits).map { i =>
      val vote = aggregate(th, lit(0L), (acc, h) =>
        acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, lit(1L))
          .otherwise(lit(-1L)))
      when(vote > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** SimHash near-dup pairs via pigeonhole banding: the 64-bit hash is cut
    * into `maxHamming + 1` chunks, so any pair within the hamming budget
    * has at least one chunk with ZERO differing bits — i.e. banding on
    * chunk equality is recall-lossless for the contract, for ANY
    * maxHamming (the round-1 fixed 4×16-bit split silently dropped pairs
    * with hamming 4..maxHamming whose four chunks all differed). Chunk
    * widths are ⌈64/c⌉ or ⌊64/c⌋. Candidates are verified by exact hamming.
    *
    * Scale note: more chunks ⇒ narrower keys ⇒ bigger buckets — with
    * maxHamming 10 each of the 11 chunks would have only 5-6 bits, so past
    * maxHamming 7 (8-bit chunks) this dispatches to MULTI-INDEX HASHING
    * ([[simhashPairsMIHFromHashes]]): ~half the chunks, each wide enough to
    * key real buckets, probing 1-bit neighborhoods instead of shrinking the
    * key space.
    *
    * Returns (id_a, id_b, hamming ≤ maxHamming). */
  def simhashPairs(
      docs: DataFrame,
      maxHamming: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val hashes = simhash64(docs, idCol, textCol)
      .select(col(idCol).as("id"), col("simhash"))
    if (maxHamming <= 7) simhashPairsFromHashes(hashes, maxHamming)
    else simhashPairsMIHFromHashes(hashes, maxHamming)
  }

  /** Multi-index hashing (Norouzi et al.'s pigeonhole generalization) for
    * wide hamming budgets: cut the 64 bits into `c = ⌊m/2⌋ + 1` chunks —
    * if every chunk of a pair differed in ≥ 2 bits, total distance would be
    * ≥ 2c > m, so some chunk differs in AT MOST ONE bit. Candidates are
    * therefore pairs sharing a chunk key exactly OR up to one flipped bit:
    * the index side posts each chunk's exact key once; the probe side posts
    * the exact key plus its `width` 1-bit flips. Compared to m+1 zero-diff
    * chunks, keys keep ~2× the bits — 2^6 times fewer random collisions per
    * bucket at m=10 — for a ~(width+1)× probe-row factor: the classic
    * bucket-size-vs-probe-count trade that keeps 10^9+ corpora feasible.
    * Verified by exact hamming; recall-lossless by the pigeonhole bound
    * (planted-pair property in OpsSpec). */
  def simhashPairsMIHFromHashes(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming must be in [0,64), got $maxHamming")
    val nChunks = maxHamming / 2 + 1
    val bounds = chunkBounds(nChunks)
    def keyOf(lo: Int, w: Int): Column = {
      val mask = if (w >= 64) -1L else (1L << w) - 1
      shiftrightunsigned(col("simhash"), lo).bitwiseAND(lit(mask))
    }
    val idxKeys = bounds.zipWithIndex.map { case ((lo, w), ci) =>
      struct(lit(ci).as("chunk"), keyOf(lo, w).as("ckey"))
    }
    val probeKeys = bounds.zipWithIndex.flatMap { case ((lo, w), ci) =>
      val exact = keyOf(lo, w)
      exact +: (0 until w).map(b => exact.bitwiseXOR(lit(1L << b)))
    }.zip(bounds.zipWithIndex.flatMap { case ((_, w), ci) => Seq.fill(w + 1)(ci) })
      .map { case (k, ci) => struct(lit(ci).as("chunk"), k.as("ckey")) }
    // persisted: the probe side re-derives 64 hash-vote columns otherwise
    val h = hashes.persist()
    val idx = h.select(col("id"), col("simhash"),
      explode(array(idxKeys: _*)).as("ik"))
      .select(col("id").as("id_a"), col("simhash").as("h_a"),
        col("ik.chunk").as("chunk"), col("ik.ckey").as("ckey"))
    val probe = h.select(col("id"), col("simhash"),
      explode(array(probeKeys: _*)).as("pk"))
      .select(col("id").as("id_b"), col("simhash").as("h_b"),
        col("pk.chunk").as("chunk"), col("pk.ckey").as("ckey"))
    idx.join(probe, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("h_a"), col("h_b")).distinct()
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
  }

  /** Banding + verify over precomputed (id, simhash) rows — the candidate
    * machinery of [[simhashPairs]], exposed so recall (pigeonhole) and
    * bucket-size properties can be pinned on planted/synthetic hashes. */
  def simhashPairsFromHashes(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming must be in [0,64), got $maxHamming")
    val chunks = simhashChunkCols(maxHamming)
    // persisted: the self-join would recompute 64 hash-votes per row twice
    val chunked = hashes.select(col("id"), col("simhash"),
      posexplode(array(chunks: _*)).as(Seq("chunk", "ckey")))
      .persist()
    val a = chunked.select(col("chunk"), col("ckey"), col("id").as("id_a"), col("simhash").as("h_a"))
    val b = chunked.select(col("chunk"), col("ckey"), col("id").as("id_b"), col("simhash").as("h_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("h_a"), col("h_b")).distinct()
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
  }

  /** (lo, width) of `nChunks` near-equal chunks covering bits 0..63. */
  private def chunkBounds(nChunks: Int): Seq[(Int, Int)] = {
    val baseW = 64 / nChunks
    val extra = 64 % nChunks // first `extra` chunks are one bit wider
    val offs = (0 until nChunks).scanLeft(0)((off, c) =>
      off + baseW + (if (c < extra) 1 else 0))
    (0 until nChunks).map(c => (offs(c), offs(c + 1) - offs(c)))
  }

  /** The `maxHamming + 1` chunk-key columns over a `simhash` column. */
  def simhashChunkCols(maxHamming: Int): Seq[Column] =
    chunkBounds(maxHamming + 1).map { case (lo, w) =>
      val mask = if (w >= 64) -1L else (1L << w) - 1
      shiftrightunsigned(col("simhash"), lo).bitwiseAND(lit(mask))
    }

  /** Embedding near-dup pairs: cosine ≥ threshold among candidates sharing
    * any of `tables` independent LSH buckets (random-hyperplane signs; see
    * Similarity.lshBucket). Defaults are the scale shape: 16 planes keep
    * the self-join within each bucket at N²/2^16 expected work, and
    * multi-table OR-amplification buys back the recall that narrow buckets
    * cost (one 16-plane table misses ~? of true near-dups; L tables miss
    * miss^L). Candidate rows carry only (table, bucket, id) — vectors
    * rejoin for verification. */
  def embeddingCosinePairs(
      emb: DataFrame,
      threshold: Double,
      planes: Int = 16,
      tables: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: Long = 42L,
      portable: Boolean = false
  ): DataFrame = {
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("v")).persist()
    // one-row dim probe → literal plane vectors → codegen'd VecDot hashes
    val dim = Similarity.measureDim(base, "v")
    val bucketStructs = (0 until tables).map(t =>
      struct(lit(t).as("tbl"),
        Similarity.lshBucket(col("v"), planes, dim, seed + t * 7919L, portable).as("b")))
    // payload-free band rows: the heavy vectors never enter the candidate join
    val banded = base
      .select(col("id"), explode(array(bucketStructs: _*)).as("tb"))
      .select(col("id"), col("tb.tbl").as("tbl"), col("tb.b").as("bucket"))
    val cand = banded.select(col("tbl"), col("bucket"), col("id").as("id_a"))
      .join(banded.select(col("tbl"), col("bucket"), col("id").as("id_b")),
        Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct() // a pair can collide in several tables
    cand
      .join(base.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(Similarity.cosine(col("v_a"), col("v_b")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Keep-one representative view from a pair list: drop every id that
    * appears as the larger member of a dup pair (transitive enough for
    * near-dup filtering pipelines; [[connectedComponents]] /
    * [[dropDuplicatesCC]] is the exact clustering). */
  def dropDuplicates(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.join(pairs.select(col("id_b").as(idCol)).distinct(), Seq(idCol), "left_anti")

  /** Connected components over the undirected dup-pair graph — the exact
    * clustering that [[dropDuplicates]]' drop-the-larger-endpoint rule only
    * approximates (a pair (B,C) whose canonical B was itself dropped via
    * (A,B) leaves C's true representative A undiscovered without the
    * transitive closure). Returns one row per distinct pair endpoint:
    * `(id, comp)` with `comp` = the minimum id in the component; singleton
    * docs never enter a pair, so callers left-join and coalesce to self.
    *
    * Algorithm: alternating large-star / small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", MapReduce alg. 2) —
    * each round hangs nodes under the minimum of their neighborhood,
    * converging to depth-1 stars rooted at component minima in O(log² n)
    * rounds. The 100 TB shape: per-round work is linear in the edge count
    * (two map-side-combinable `min` aggregates + two co-partitioned joins);
    * no vertex ever materializes its neighbor list, so a hub with 10^8
    * neighbors costs a combiner, not a `collect_list`. `localCheckpoint`
    * per round keeps the iterative plan's lineage (and thus task binary
    * size) constant instead of growing by four operators every round.
    *
    * Convergence = the (count, xxhash64-XOR) signature of the edge set
    * repeating — a fixed-size driver check instead of a two-sided
    * `except` (XOR, not sum: order-independent AND overflow-free under
    * ANSI mode; the edge set is distinct, so no multiset cancellation);
    * a signature collision on UNequal sets is a ~2^-64 event, and
    * `maxIter` (>> the O(log² n) bound) backstops it loudly rather than
    * silently mislabeling. */
  def connectedComponents(
      pairs: DataFrame,
      idACol: String = "id_a",
      idBCol: String = "id_b",
      maxIter: Int = 50
  ): DataFrame = {
    var edges = pairs
      .select(col(idACol).as("a"), col(idBCol).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)

    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(a, b))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var sig = signature(edges)
    var converged = sig._1 == 0L // empty graph: nothing to iterate
    var it = 0
    while (!converged && it < maxIter) {
      // large-star: every neighbor v > u re-hangs under m = min(Γ(u) ∪ {u})
      val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
      val lsMin = sym.groupBy("a").agg(min("b").as("mb"))
      val ls = sym.join(lsMin, "a")
        .where(col("b") > col("a"))
        .select(col("b").as("a"), least(col("a"), col("mb")).as("b"))
        .distinct()
      // small-star: orient (hi, lo); all of N(hi) ∪ {hi} re-hangs under min(N(hi))
      val ori = ls.select(greatest(col("a"), col("b")).as("h"), least(col("a"), col("b")).as("l"))
      val ssMin = ori.groupBy("h").agg(min("l").as("ml"))
      val next = ori.join(ssMin, "h")
        .select(col("l").as("a"), col("ml").as("b"))
        .union(ssMin.select(col("h").as("a"), col("ml").as("b")))
        .where(col("a") =!= col("b"))
        .distinct()
        .localCheckpoint(true)
      val nsig = signature(next)
      converged = nsig == sig
      sig = nsig
      edges.unpersist()
      edges = next
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds " +
          s"(edge signature still moving: $sig) — graph degenerate or maxIter too low")
    // fixpoint edges are (child, root) stars; roots label themselves
    edges.select(col("a").as("id"), col("b").as("comp"))
      .union(edges.select(col("b").as("id"), col("b").as("comp")))
      .groupBy("id").agg(min("comp").as("comp"))
  }

  /** Keep-one view with EXACT transitive clustering: keep each component's
    * minimum-id doc (plus every doc that never entered a pair). */
  def dropDuplicatesCC(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val dropped = connectedComponents(pairs)
      .where(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    docs.join(dropped, Seq(idCol), "left_anti")
  }
}
