package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (broadcast the query side — exact,
  * and the oracle for the approximate path). Scale path: random-hyperplane
  * LSH bucketing so candidate generation is a bucket-equality join.
  * All vector math is native `zip_with`/`aggregate` — no UDFs.
  */
object Similarity {

  /** Left-to-right dot product in double precision (deterministic order —
    * matters for engine-portable score comparison). Served by the native
    * codegen'd [[graft.functions.VecDot]]; [[dotHof]] is the Catalyst
    * higher-order original it is pinned bit-identical to (VecDotSpec). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.VecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** The interpreted higher-order formulation `dot` replaced — kept as the
    * semantics reference for the bit-identity pin (VecDotSpec). */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Corpus-centroid cosine — the embedding-quality outlier signal a
    * curation pipeline thresholds on (vectors pointing away from the
    * corpus mean are mis-embedded, off-domain, or garbage rows). One
    * position-exploded aggregation computes the dim-sized centroid
    * (dim × n rows shuffle to dim groups — tiny payload), which then rides
    * into a codegen'd literal-array cosine over the corpus: a 100 TB pass
    * is one agg + one map-only scan, no window, no all-pairs anything.
    * Returns `(id, centroid_cosine, is_outlier)`; `threshold` is a plain
    * parameter because the right cut is corpus-specific — the signal
    * column stays for auditing either way. */
  def centroidCosine(emb: DataFrame, threshold: Double = 0.5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cent: Array[Double] = emb
      .select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(avg(col("v")).as("m"))
      .orderBy(col("pos")).collect().map(_.getDouble(1))
    require(cent.nonEmpty, "empty embedding corpus")
    val centCol = array(cent.map(lit(_)): _*)
    val cos = cosine(col(vecCol).cast("array<double>"), centCol)
    emb.select(col(idCol),
      round(cos, 6).as("centroid_cosine"),
      (cos < threshold).cast("long").as("is_outlier"))
  }

  /** Deterministic pseudo-random hyperplane component: unit-free sign test
    * only needs a fixed direction, so we derive component j of plane p from
    * xxhash64 — reproducible across engines and sessions, no RNG state. */
  private def planeComponent(p: Int, j: Column, seed: Long): Column =
    (pmod(xxhash64(lit(seed), lit(p), j), lit(2001L)) - lit(1000L)).cast("double") / 1000.0

  /** ENGINE-PORTABLE hyperplane component: a multiplicative-congruential
    * scramble mod 1e9+7 whose every intermediate fits a signed 64-bit long
    * (seed must stay << 1e9 for the first product to), so any SQL engine
    * with plain integer arithmetic computes the identical direction — what
    * lets the DuckDB oracle replicate LSH bucketing end-to-end. Weaker
    * mixing than xxhash64; production paths keep [[planeComponent]]. */
  private[ops] def portablePlaneComponent(p: Int, j: Column, seed: Long): Column = {
    val P = graft.ops.Dedup.PortableMod
    val x = pmod(lit(seed) * lit(1000003L) + lit(p.toLong * 8191L) + j, lit(P))
    (pmod(pmod(x * lit(1103515245L) + lit(12345L), lit(P)), lit(2001L)) - lit(1000L))
      .cast("double") / 1000.0
  }

  /** Driver-side twin of [[planeComponent]]: the identical xxhash64 chain
    * (initial seed 42, fold LongType seed then IntegerType p then
    * IntegerType j — exactly the `xxhash64(lit(seed), lit(p), j)` child
    * order) and the identical pmod/scale arithmetic. Pinned bit-identical
    * to the Column formulation in LshNativeSpec. */
  private def planeComponentValue(p: Int, j: Int, seed: Long): Double = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.{IntegerType, LongType}
    var h = XxHash64Function.hash(seed, LongType, 42L)
    h = XxHash64Function.hash(p, IntegerType, h)
    h = XxHash64Function.hash(j, IntegerType, h)
    (Math.floorMod(h, 2001L) - 1000L).toDouble / 1000.0
  }

  /** Driver-side twin of [[portablePlaneComponent]] (pmod == floorMod for a
    * positive modulus; every intermediate fits a long — see that scaladoc). */
  private def portablePlaneComponentValue(p: Int, j: Int, seed: Long): Double = {
    val P = graft.ops.Dedup.PortableMod
    val x = Math.floorMod(seed * 1000003L + p.toLong * 8191L + j, P)
    (Math.floorMod(Math.floorMod(x * 1103515245L + 12345L, P), 2001L) - 1000L)
      .toDouble / 1000.0
  }

  /** Plane `p` as a materialized direction vector — what lets the per-row
    * projection be a single codegen'd [[graft.functions.VecDot]] against a
    * literal array instead of `dim` interpreted lambda steps per plane. */
  private[ops] def planeVector(p: Int, dim: Int, seed: Long, portable: Boolean): Seq[Double] =
    (0 until dim).map(j =>
      if (portable) portablePlaneComponentValue(p, j, seed)
      else planeComponentValue(p, j, seed))

  /** LSH bucket id: packed signs of `planes` random-hyperplane projections.
    * `portable = true` swaps the xxhash64-derived plane components for the
    * congruential [[portablePlaneComponent]] (oracle-replicable).
    *
    * With `dim > 0` a row whose vector is exactly `dim` long projects via a
    * codegen'd dot against the precomputed literal [[planeVector]] — same
    * doubles, same left-to-right fold (pinned in LshNativeSpec); any OTHER
    * row (heterogeneous-length corpora, or a stale caller-supplied dim)
    * falls back per row to the dynamic fold, so it hashes by its REAL
    * projections rather than collapsing into bucket 0 of every table.
    * `dim = -1` keeps the dynamic higher-order fold for all rows: planes
    * adapt to each row's array length, one interpreted lambda step per
    * element. */
  /** Per-plane signed projections `v · plane_p` for p in [0, planes) — the
    * quantities whose SIGNS form the bucket and whose MAGNITUDES rank the
    * multiprobe flip candidates (a projection near zero means the vector
    * sits near that plane, so its true neighbors plausibly landed on the
    * other side). */
  private def lshProjections(v: Column, planes: Int, dim: Int, seed: Long,
      portable: Boolean): IndexedSeq[Column] = {
    def dynAt(p: Int): Column = {
      val idx = sequence(lit(0), size(v) - 1)
      val comp = (j: Column) =>
        if (portable) portablePlaneComponent(p, j, seed) else planeComponent(p, j, seed)
      aggregate(
        zip_with(v.cast("array<double>"), idx, (x, j) => x * comp(j)),
        lit(0.0), (acc, x) => acc + x)
    }
    val projAt: Int => Column =
      if (dim > 0) { p =>
        // the when() only EVALUATES the interpreted fallback for mismatched
        // rows — fixed-dim columns stay fully on the codegen'd fast dot
        when(size(v) === dim, dot(v, typedLit(planeVector(p, dim, seed, portable))))
          .otherwise(dynAt(p))
      } else dynAt
    (0 until planes).map(projAt)
  }

  def lshBucket(v: Column, planes: Int, dim: Int, seed: Long = 42L,
      portable: Boolean = false): Column =
    lshProjections(v, planes, dim, seed, portable).zipWithIndex.map {
      case (proj, p) => when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Multiprobe bucket set (Lv et al., VLDB 2007): the base bucket plus the
    * `probes` single-bit flips on the planes whose |projection| is smallest
    * — the boundaries this vector sits nearest, i.e. the flips most likely
    * to hold missed true neighbors. Probing runs on the QUERY side only:
    * recall rises without more tables (no index growth, no extra corpus
    * projections) at the cost of `1 + probes` bucket lookups per (query,
    * table) instead of 1. Returns array<long> of `1 + min(probes, planes)`
    * DISTINCT buckets, base first. */
  def lshProbeBuckets(v: Column, planes: Int, dim: Int, seed: Long = 42L,
      portable: Boolean = false, probes: Int = 2): Column =
    probeBucketsFromProjs(
      array(lshProjections(v, planes, dim, seed, portable): _*), planes, probes)

  /** Probe buckets from a MATERIALIZED projection array (`pj(p)` = v ·
    * plane_p). Kept separate from [[lshProbeBuckets]] so the bucketing
    * plan can compute the `planes` dot products ONCE per (row, table) and
    * reference the array: the base bucket, the |projection| ranking, and
    * every flip all reuse the projections, and Catalyst expressions are
    * trees without common-subexpression sharing across Columns — inlining
    * the projection subtrees (each carrying a dim-sized plane literal)
    * into every consumer multiplied the plan by ~planes× and dominated
    * wall time with planning + codegen, not probing. */
  private def probeBucketsFromProjs(pj: Column, planes: Int, probes: Int): Column = {
    def proj(p: Int): Column = element_at(pj, p + 1)
    val base = (0 until planes).map { p =>
      when(proj(p) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val nFlips = math.min(math.max(probes, 0), planes)
    if (nFlips == 0) return array(base)
    // rank planes by |projection| asc (ties: plane index asc — struct sort
    // is field-order lexicographic), flip the nearest-boundary bits
    val ranked = array_sort(array((0 until planes).map { p =>
      struct(abs(proj(p)).as("a"), lit(p).as("p"))
    }: _*))
    // 1L << p for a COLUMN p: planes is small (<= 24 in any real config),
    // so a when-chain stays a compact codegen'd expression
    def bitOf(pcol: Column): Column =
      (1 until planes).foldLeft(when(pcol === 0, lit(1L))) {
        case (acc, p) => acc.when(pcol === p, lit(1L << p))
      }
    val flips = (0 until nFlips).map { i =>
      base.bitwiseXOR(bitOf(element_at(ranked, i + 1).getField("p")))
    }
    array(base +: flips: _*)
  }

  /** The fixed vector length of `vecCol`, read from one row — callers use
    * it to plan literal plane vectors / codebooks. -1 on an empty frame
    * (callers fall back to the dynamic path). */
  private[graft] def measureDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol)).as("d")).head(1) match {
      case Array(r) if !r.isNullAt(0) => r.getInt(0)
      case _ => -1
    }

  /** Exact brute-force cosine top-k: broadcast the (small) query set against
    * the corpus, window-rank per query. The per-query work is a full scan —
    * the correct baseline and the oracle for `lshTopK`.
    *
    * `filter` is the Elasticsearch kNN PRE-filter: a predicate over the
    * corpus frame's own columns that restricts WHICH vectors compete —
    * top-k is taken among survivors (never "top-k then filter", which can
    * return fewer than k). Applied before the scan, so it pushes down to
    * the column store. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      filter: Option[Column] = None
  ): DataFrame = {
    val base = filter.map(corpus.filter).getOrElse(corpus)
    val c = base.select(col(idCol).as("id"), col(vecCol).as("v"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"))
    val scored = graft.TopK.prunePerKey(
      // bounded per-partition top-k selection BEFORE the rank window: the
      // full scan's |Q| x corpus scored rows otherwise all cross the
      // window's exchange and each query's corpus-sized list sorts on one
      // reducer; the prune caps that at partitions x queries x k rows with
      // bit-identical survivors (graft.TopK scaladoc has the order proof)
      c.join(broadcast(q), col("id") =!= col("q_id"))
        .select(col("q_id"), col("id"),
          round(cosine(col("v"), col("q_v")), 6).as("cosine")),
      "q_id", "cosine", "id", k)
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cosine"), asc("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("id"), col("cosine"))
  }

  /** Approximate top-k via multi-table LSH: `tables` independent
    * random-hyperplane hashes; candidates = rows sharing ANY table's bucket
    * with the query (classic L-table LSH — one table's recall on
    * near-orthogonal vectors is poor), then exact-cosine verify + rank.
    * Recall vs brute force measured in OpsSpec; at scale this replaces the
    * full scan with `tables` bucket-equality joins.
    *
    * Candidate rows are PAYLOAD-FREE — (table, bucket, id) only, the same
    * shape as [[Dedup.embeddingCosinePairs]]: the corpus vectors never
    * explode ×tables or flow through the candidate join's shuffle +
    * distinct; they rejoin once, for the deduplicated candidate ids only.
    * A second corpus scan is far cheaper than shuffling the vector payload
    * ×tables at 100 TB. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      planes: Int = 6,
      tables: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: Long = 42L,
      portable: Boolean = false,
      probes: Int = 0
  ): DataFrame =
    lshTopKIndexed(lshIndex(corpus, planes, tables, idCol, vecCol, seed, portable),
      queries, k, idCol, vecCol, probes = probes)

  /** Prebuilt LSH index: the payload-free bucket table plus the projected
    * corpus and every hashing parameter a query probe must reproduce. The
    * caller owns persistence (cache/parquet) — the 100 TB shape is build
    * ONCE, persist, then serve every query batch from it; hashing the
    * corpus per query set (what the one-shot [[lshTopK]] composition does)
    * pays the dominant cost — `tables × planes` projections per corpus
    * row — on every call. */
  final case class LshIndex(
      buckets: DataFrame, // (tbl, bucket, id) — payload-free
      corpus: DataFrame,  // (id, v)
      planes: Int, tables: Int, dim: Int, seed: Long, portable: Boolean) {
    /** Pin both frames in memory and return this (bench/serving hot shape). */
    def cached(): LshIndex = {
      buckets.cache().count(); corpus.cache().count(); this
    }
  }

  private def lshBucketed(df: DataFrame, id: String, v: String,
      planes: Int, tables: Int, dim: Int, seed: Long, portable: Boolean,
      probes: Int = 0): DataFrame = {
    if (probes <= 0) {
      val buckets = (0 until tables).map(t =>
        struct(lit(t).as("tbl"),
          lshBucket(col(v), planes, dim, seed + t * 7919L, portable).as("b")))
      df.select(col(id), explode(array(buckets: _*)).as("tb"))
        .select(col(id), col("tb.tbl").as("tbl"), col("tb.b").as("bucket"))
    } else {
      // multiprobe (query side only): 1 + probes buckets per (row, table).
      // Projections materialize FIRST (one array per table, each plane
      // literal once in the plan); buckets derive from the array — see
      // probeBucketsFromProjs on why inlining blows the plan up
      val projTables = (0 until tables).map(t =>
        struct(lit(t).as("tbl"),
          array(lshProjections(col(v), planes, dim,
            seed + t * 7919L, portable): _*).as("pj")))
      df.select(col(id), explode(array(projTables: _*)).as("tp"))
        .select(col(id), col("tp.tbl").as("tbl"),
          probeBucketsFromProjs(col("tp.pj"), planes, probes).as("bs"))
        .select(col(id), col("tbl"), explode(col("bs")).as("bucket"))
    }
  }

  def lshIndex(
      corpus: DataFrame,
      planes: Int = 6,
      tables: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: Long = 42L,
      portable: Boolean = false
  ): LshIndex = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    // one-row dim probe buys literal plane vectors: every bucket hash below
    // becomes a codegen'd VecDot instead of planes×dim interpreted lambdas
    val dim = measureDim(c, "v")
    LshIndex(lshBucketed(c, "id", "v", planes, tables, dim, seed, portable),
      c, planes, tables, dim, seed, portable)
  }

  /** Restrict payload-free candidate pairs to an allowed-id set — the
    * Elasticsearch kNN PRE-filter on the indexed probes: top-k is taken
    * among allowed survivors. The id frame's FIRST column is the id; a
    * left-semi join keeps the candidate rows payload-free, and an
    * eval-set-sized allow list broadcasts. */
  private def allowOnly(cand: DataFrame, allowed: Option[DataFrame]): DataFrame =
    allowed.fold(cand) { a =>
      // explicit broadcast: a filtered projection of a large source keeps
      // its parent's size estimate, and an un-hinted semi join would
      // sort-merge-shuffle the corpus-scale candidate/index side
      cand.join(broadcast(a.select(col(a.columns.head).as("id"))),
        Seq("id"), "left_semi")
    }

  /** Query a prebuilt [[LshIndex]]: hash only the (small, broadcast) query
    * set, bucket-equality join against the index's candidate table, then
    * exact-cosine verify + rank on the deduplicated candidates.
    * `allowed` pre-filters candidates to an id set (see [[allowOnly]]) and
    * MUST be broadcast-sized (an eval/allow list, not a corpus-scale
    * filter result — it is broadcast to every executor; a predicate that
    * matches most of the corpus belongs as a filter on `index.corpus`
    * before the build, not here). */
  def lshTopKIndexed(
      index: LshIndex,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      allowed: Option[DataFrame] = None,
      probes: Int = 0
  ): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"))
    // probes > 0 = multiprobe ([[lshProbeBuckets]]): each (query, table)
    // additionally looks up the `probes` nearest-boundary single-bit-flip
    // buckets — recall rises with ZERO index growth (the corpus table is
    // untouched; only the broadcast query side fans out ×(1+probes))
    val qb = lshBucketed(q, "q_id", "q_v",
      index.planes, index.tables, index.dim, index.seed, index.portable, probes)
    // ONE exchange serves both the multi-table dedup and the per-query rank
    // window (guide §2.4 "two operations keyed the same way can share one
    // exchange"): hash(q_id) co-locates every (q_id, id) duplicate — a
    // subset key satisfies the aggregation's clustering — and the window's
    // q_id partitioning is already established, so the former
    // distinct-then-window pair of exchanges collapses to this single one.
    // Per-partition width = one query's candidates, bounded by tables ×
    // bucket sizes.
    val cand = allowOnly(
      index.buckets
        .join(broadcast(qb), Seq("tbl", "bucket"))
        .filter(col("id") =!= col("q_id"))
        .select("q_id", "id"),
      allowed)
      .repartition(col("q_id"))
      .dropDuplicates("q_id", "id") // union of tables — id pairs only
    val scored = cand
      .join(index.corpus, "id")
      .join(broadcast(q), "q_id")
      .select(col("q_id"), col("id"),
        round(cosine(col("v"), col("q_v")), 6).as("cosine"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cosine"), asc("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("id"), col("cosine"))
  }

  /** IVF (inverted-file) approximate top-k: coarse-quantize the corpus to
    * `nlist` centroids (deterministic hash-ordered sample — FAISS-style IVF
    * with sampled init, no k-means iterations), then search only each
    * query's `nprobe` nearest centroid lists.
    *
    * Scale shape: corpus assignment is a NATIVE per-row argmax over the
    * broadcast centroid array — a single projection, zero shuffle, zero row
    * amplification. (The previous cross-join + `row_number` window exploded
    * the corpus ×nlist through an exchange — 64× data amplification at the
    * default nlist, for a value computable per row.) The probe side keeps
    * the windowed top-nprobe (queries are small); the probe join is a
    * key-equality join on the centroid id, so per-query work is
    * ~(nprobe/nlist) of the corpus instead of a full scan. Recall vs brute
    * force is pinned in OpsSpec; raise nprobe (or nlist for bigger corpora)
    * to trade cost for recall. */
  /** Deterministic centroid codebook: TakeOrdered by a seeded hash — no
    * full sort, no RNG state, identical at any parallelism; cid = 1-based
    * rank in natural source-id order. nlist rows collected to the driver —
    * the IVF contract (codebooks are broadcast state in every IVF
    * implementation). */
  def ivfCentroids(
      corpus: DataFrame,
      nlist: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: Long = 42L
  ): Seq[Seq[Double]] =
    corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("h", xxhash64(col("id"), lit(seed)))
      .orderBy(col("h")).limit(nlist)
      .select(col("id").as("cent_src"), col("v").as("cv"))
      .orderBy(col("cent_src"))
      .collect().toSeq
      .map(_.getSeq[Any](1).map {
        case f: Float => f.toDouble
        case d: Double => d
        case n: Number => n.doubleValue()
      }.toSeq)

  /** Per-row argmax centroid assignment over the broadcast codebook: ONE
    * native projection — no cross join, no window, no exchange (asserted in
    * OpsSpec). The fold keeps the (cid, sim) pair with the highest cosine;
    * strict `>` keeps the SMALLEST cid on ties, matching `row_number` over
    * (sim desc, cid asc). Returns the corpus projected to (id, v, cid). */
  def ivfAssign(
      corpus: DataFrame,
      centVecs: Seq[Seq[Double]],
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    // ONE constant-size codegen'd argmax over the reference-object codebook
    // ([[graft.functions.VecNearestCentroid]]): each row reads its vector
    // once, computes its norm once, and scans the centroid matrix in a
    // tight compiled loop — the unrolled array-of-cosines this replaced
    // degraded to interpreted evaluation at ~1 s PER CENTROID on a 60k
    // corpus and could never reach the nlist≈4096 a 10^12-vector corpus
    // needs. Sims and the first-max tie rule are bit-identical to the
    // struct-fold reference ([[ivfAssignFold]], pinned in LshNativeSpec).
    // Degenerate rows whose every sim is null (null vector, null element,
    // length mismatched to the codebook) land in list 1 — REACHABLE,
    // ranked last by their null verify cosine — rather than the
    // never-probed cid 0, which would silently drop them from every IVF
    // search. Only an empty codebook assigns cid 0.
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val assignExpr = if (centVecs.isEmpty) lit(0) else {
      val near = ColumnBridge.column(graft.functions.VecNearestCentroid(
        ColumnBridge.expression(col("v")), centVecs))
      when(near.isNull || near === 0, lit(1)).otherwise(near)
    }
    corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cid", assignExpr)
  }

  /** The interpreted struct-fold `ivfAssign` replaced — kept as the
    * semantics reference for the equivalence pin (LshNativeSpec). */
  private[ops] def ivfAssignFold(
      corpus: DataFrame,
      centVecs: Seq[Seq[Double]],
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val centArr = typedLit(centVecs)
    val assignExpr = aggregate(
      sequence(lit(1), lit(centVecs.size)),
      struct(lit(0).cast("int").as("cid"), lit(Double.NegativeInfinity).as("sim")),
      (acc, i) => {
        val s = cosine(col("v"), element_at(centArr, i))
        when(s > acc.getField("sim"),
          struct(i.cast("int").as("cid"), s.as("sim"))).otherwise(acc)
      },
      // never-assigned (all-null sims) -> list 1, matching ivfAssign;
      // only an empty codebook keeps the fold's initial cid 0
      acc => if (centVecs.isEmpty) acc.getField("cid")
             else greatest(acc.getField("cid"), lit(1)))
    corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cid", assignExpr)
  }

  /** Prebuilt IVF index: the corpus with its argmax centroid assignment,
    * plus the broadcast-sized codebook a probe must score against. Same
    * ownership contract as [[LshIndex]]: build once, persist (ideally
    * partitioned by cid so a probe's join prunes to its lists), serve every
    * query batch — re-assigning the corpus per call pays nlist cosines per
    * row every time. */
  final case class IvfIndex(
      assigned: DataFrame, // (id, v, cid)
      centVecs: Seq[Seq[Double]]) {
    def cached(): IvfIndex = { assigned.cache().count(); this }
  }

  def ivfIndex(
      corpus: DataFrame,
      nlist: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: Long = 42L
  ): IvfIndex = {
    val centVecs = ivfCentroids(corpus, nlist, idCol, vecCol, seed)
    IvfIndex(ivfAssign(corpus, centVecs, idCol, vecCol), centVecs)
  }

  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int = 64,
      nprobe: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: Long = 42L
  ): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, "need 1 <= nprobe <= nlist")
    ivfTopKIndexed(ivfIndex(corpus, nlist, idCol, vecCol, seed),
      queries, k, nprobe, idCol, vecCol)
  }

  /** Query a prebuilt [[IvfIndex]]: score the query set against the
    * broadcast codebook, keep each query's top-nprobe centroid lists, and
    * verify exactly within them. `allowed` pre-filters the probed lists to
    * an id set (see [[allowOnly]]) and MUST be broadcast-sized — same
    * contract as [[lshTopKIndexed]]'s `allowed`. */
  def ivfTopKIndexed(
      index: IvfIndex,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      allowed: Option[DataFrame] = None
  ): DataFrame = {
    val centVecs = index.centVecs
    require(nprobe >= 1, "need nprobe >= 1")
    // a corpus smaller than the requested nlist yields fewer centroids than
    // nprobe — probe them all (the one-shot ivfTopK contract: exact results
    // on tiny corpora), don't reject
    val np = math.min(nprobe, math.max(centVecs.size, 1))
    // empty codebook (empty corpus): zero rows, but with the SAME schema as
    // the normal path — q_id/id types follow the inputs' id columns, so
    // callers can union/join empty and non-empty results uniformly
    if (centVecs.isEmpty)
      return queries.select(col(idCol).as("q_id")).limit(0)
        .crossJoin(index.assigned.select(col("id")).limit(0))
        .select(col("q_id"), lit(0L).as("rank"), col("id"), lit(0.0).as("cosine"))
    val assigned = index.assigned
    val spark = index.assigned.sparkSession
    import spark.implicits._

    // probe side: same centroid order as the argmax (cid = 1-based rank in
    // cent_src order), windowed top-nprobe over the tiny query set
    val cents = centVecs.zipWithIndex
      .map { case (v, i) => (i + 1, v) }
      .toDF("cid", "cv")
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"))
    val probes = {
      val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), asc("cid"))
      q.join(broadcast(cents), expr("true"))
        .withColumn("sim", cosine(col("q_v"), col("cv")))
        .withColumn("crk", row_number().over(w))
        .filter(col("crk") <= np)
        .drop("cv", "sim", "crk")
    } // (q_id, q_v, cid)

    val scored = allowOnly(assigned, allowed).join(probes, Seq("cid"))
      .filter(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id"),
        round(cosine(col("v"), col("q_v")), 6).as("cosine"))
      // hash(q_id) exchange shared by the dedup AND the rank window below
      // (subset key satisfies the clustering) — was two exchanges
      .repartition(col("q_id"))
      .dropDuplicates("q_id", "id") // a pair can meet via several probes
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cosine"), asc("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("id"), col("cosine"))
  }

  /** All pairs with cosine ≥ threshold within a blocking key (e.g. label) —
    * set-stable output for oracle checks. */
  def cosinePairsBlocked(
      emb: DataFrame,
      blockCol: String,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val x = emb.select(col(idCol).as("id"), col(blockCol).as("blk"), col(vecCol).as("v"))
    val a = x.select(col("blk"), col("id").as("id_a"), col("v").as("v_a"))
    val b = x.select(col("blk"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("v_a"), col("v_b")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
