package graft

import graft.analysis.Analyzer
import graft.index.BlockParams
import graft.ops.{Dedup, Multimodal, Pipeline, Similarity, TextStats}
import graft.query.{And, BPhrase, BTerm, Or, Percolator, Searcher}
import graft.storage.{ParquetIndexStorage, StorageParams}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract: every implemented operator from SURVEY.md §2 (plus the
  * training-data ops) exposed as a named query over the driver's parquet
  * testdata, with a DuckDB-runnable oracle where the semantics are ANSI-SQL
  * expressible. Column names and rounding match the oracles exactly — the
  * driver compares by sorted-column value hashing.
  */
object SparkEntry {

  /** Normalized-token SQL fragment shared by the oracles (DuckDB): the
    * standard analyzer — lowercase, split on non-alphanumerics, drop empties. */
  private val toksSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** Engine-portable polynomial hash (Dedup.polyHash) as DuckDB SQL: fold of
    * the code points mod 1e9+7 — every intermediate fits a BIGINT in both
    * engines, so the values are bit-identical. `v` is the string expression;
    * lambda variable names must not collide with enclosing lambdas. */
  private def polySql(v: String, base: Int): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(list_filter(string_split($v, ''), " +
      s"pc -> pc <> ''), pc -> unicode(pc)::BIGINT)), (ph, pcp) -> (ph * $base + pcp) % ${Dedup.PortableMod})"

  /** Dedup.portableHash60 in SQL: two polynomial hashes packed 30+30 bits. */
  private def portable60Sql(v: String): String =
    s"(${polySql(v, 31)} + ${polySql(v, 131)} * ${1L << 30})"

  /** Pipeline.bucketPortable in SQL: a subquery over `documents` carrying
    * `cols` plus the salted doc_id's mixed bucket `b` (two polynomial folds
    * combined, then three modular squarings — see Pipeline.bucketPortable
    * for why the squaring mix is needed). */
  private def plBucketSql(cols: String, salt: String): String = {
    val v = s"'$salt' || doc_id::VARCHAR"
    val M = Dedup.PortableMod
    s"""(SELECT $cols, ((x2*x2 + 12345) % $M) % 1000000 AS b FROM
       | (SELECT $cols, (x1*x1 + 12345) % $M AS x2 FROM
       |  (SELECT $cols, (x0*x0 + 12345) % $M AS x1 FROM
       |   (SELECT $cols, (${polySql(v, 31)} + 1000003 * ${polySql(v, 131)}) % $M AS x0
       |    FROM documents))))""".stripMargin
  }

  /** Similarity.portablePlaneComponent as SQL: component j (0-based) of
    * plane p for LSH table t (seed = 42 + t*7919), congruential mod 1e9+7 —
    * every operand positive, so `%` == pmod in both engines. `t`/`j0` are
    * SQL expressions; p is a literal. */
  private def planeCompSql(t: String, p: Int, j0: String): String = {
    val P = Dedup.PortableMod
    s"((((((42 + ($t)*7919)::BIGINT * 1000003 + ${p}*8191 + ($j0)) % $P) " +
      s"* 1103515245 + 12345) % $P) % 2001 - 1000) / 1000.0"
  }

  /** Signed projection of vector expr `v` (1-based SQL list) onto plane p of
    * table `t` — matches Spark's left-to-right zip_with/aggregate sum. */
  private def projSql(t: String, p: Int, v: String): String =
    s"list_sum(list_transform(range(1, len($v)+1), pj -> " +
      s"($v)[pj]::DOUBLE * ${planeCompSql(t, p, "(pj-1)")}))"

  /** Packed-sign LSH bucket of `v` for table expr `t` (portable planes). */
  private def bucketSql(t: String, v: String, planes: Int): String =
    (0 until planes).map(p =>
      s"(CASE WHEN ${projSql(t, p, v)} >= 0 THEN ${1L << p} ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** Cosine of two 1-based SQL list exprs — mirrors Similarity.cosine
    * (left-to-right double sums, 0 when either norm is 0). */
  private def cosineSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(range(1, len($x)+1), ci -> ($x)[ci]::DOUBLE * ($y)[ci]::DOUBLE))"
    s"(CASE WHEN sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}) = 0 THEN 0.0 " +
      s"ELSE ${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})) END)"
  }

  /** Portable 60-bit simhash of every document (60 bit-majority votes over
    * the portable token hash); empty docs: list_sum([]) is NULL, NULL > 0
    * is false — 0, matching Spark's empty-aggregate vote of 0. */
  private def simhash60Sql: String = {
    val bitTerms = (0 until 60).map { i =>
      s"(CASE WHEN list_sum(list_transform(th, h -> CASE WHEN ((h >> $i) & 1) = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << i}::BIGINT ELSE 0::BIGINT END)"
    }.mkString(" + ")
    s"""WITH th AS (
       |  SELECT doc_id, list_transform($toksSql, t -> ${portable60Sql("t")}) AS th
       |  FROM documents
       |)
       |SELECT doc_id, ($bitTerms) AS simhash FROM th""".stripMargin
  }

  /** 3-gram word-shingle CTE body shared by the jaccard/minhash oracles. */
  private val shinglesSql =
    s"""SELECT doc_id,
       |  CASE WHEN len(arr) < 3 THEN [] ELSE
       |    list_transform(range(1, len(arr) - 1), i -> array_to_string(arr[i:i+2], ' '))
       |  END AS sh
       |FROM (SELECT doc_id, $toksSql AS arr FROM documents)""".stripMargin

  private val analyzer = Analyzer.standard()

  // One index per sf dir per session (Verify/Bench run many queries) —
  // served from the PERSISTED t_bucket-partitioned layout, so every query
  // measures the scale path: partition-pruned postings scans (only the
  // query terms' bucket directories are read) + the persisted WAND block
  // table, not a full scan of an in-memory posting cache.
  private val indexCache = scala.collection.mutable.HashMap.empty[String, Searcher]
  private def searcher(spark: SparkSession, dir: String): Searcher = indexCache.synchronized {
    indexCache.getOrElseUpdate(dir, {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("doc_ord", col("doc_id"))
      val path = LocalTmp.dir("graft_idx_") + "/index"
      ParquetIndexStorage.build(docs, analyzer, path,
        StorageParams(termBuckets = 16, writeGroups = 4,
          blockParams = BlockParams(blockSize = 128, bucketSpan = 1024)),
        sourceDesc = dir)
      Searcher(ParquetIndexStorage.read(spark, path), analyzer)
    })
  }

  // Second searchable field for the multi-field queries: an in-memory index
  // over `source` sharing the documents ordinal space (the text field stays
  // the persisted index above — per-field stats by construction).
  private val srcIndexCache = scala.collection.mutable.HashMap.empty[String, Searcher]
  private def srcSearcher(spark: SparkSession, dir: String): Searcher =
    srcIndexCache.synchronized {
      srcIndexCache.getOrElseUpdate(dir, {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .withColumn("doc_ord", col("doc_id"))
        new Searcher(
          graft.index.IndexBuilder.build(docs, analyzer, textCol = "source").cache(),
          analyzer)
      })
    }

  // Federated second field: the same doc_id % 3 slicing with per-slice
  // indexes over `source` — each FIELD federation merges its own global
  // statistics, the multi-field contract.
  private val srcFedCache = scala.collection.mutable.HashMap.empty[String, graft.query.Federation]
  private def srcFederation(spark: SparkSession, dir: String): graft.query.Federation =
    srcFedCache.synchronized {
      srcFedCache.getOrElseUpdate(dir, {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .withColumn("doc_ord", col("doc_id"))
        graft.query.Federation(
          (0 until 3).map(r =>
            graft.index.IndexBuilder.build(
              docs.filter(col("doc_id") % 3 === r), analyzer,
              textCol = "source").cache()),
          analyzer)
      })
    }

  // Federated searcher: THREE independently built slice indexes over a
  // doc_id % 3 split of the same documents table (slice-local ordinals,
  // dictionaries, dfs, avgdls). Its oracles are the MONOLITHIC BM25 SQL —
  // the federation's global-statistics merge must reproduce single-index
  // scores exactly.
  private val fedCache = scala.collection.mutable.HashMap.empty[String, graft.query.Federation]
  private def federation(spark: SparkSession, dir: String): graft.query.Federation =
    fedCache.synchronized {
      fedCache.getOrElseUpdate(dir, {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .withColumn("doc_ord", col("doc_id"))
        graft.query.Federation(
          (0 until 3).map(r =>
            graft.index.IndexBuilder.build(
              docs.filter(col("doc_id") % 3 === r), analyzer).cache()),
          analyzer)
      })
    }

  private def docsTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
  private def evTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: BM25 top-10
    * via block-max WAND over the documents table. */
  def entry(spark: SparkSession): DataFrame =
    searcher(spark, "/root/testdata/sf0.001")
      .bm25TopKWand("spark join table", 10)
      .select(col("doc_id"), round(col("score"), 6).as("score"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- fulltext query surface (SURVEY.md §2.4) ------------------------
    "ft_match_all" -> ((s, d) =>
      searcher(s, d).matchAll().select("doc_id").orderBy("doc_id")),

    "ft_match_and" -> ((s, d) =>
      searcher(s, d).matchQuery("Spark JOIN", And).select("doc_id").orderBy("doc_id")),

    "ft_match_or" -> ((s, d) =>
      searcher(s, d).matchQuery("vector window", Or).select("doc_id").orderBy("doc_id")),

    "ft_match_and_unknown" -> ((s, d) => // unknown term: AND short-circuit
      searcher(s, d).matchQuery("spark zzzunknownterm", And).select("doc_id").orderBy("doc_id")),

    "ft_phrase" -> ((s, d) =>
      searcher(s, d).phraseQuery("batch batch").select("doc_id").orderBy("doc_id")),

    "ft_phrase3" -> ((s, d) =>
      searcher(s, d).phraseQuery("row column sort").select("doc_id").orderBy("doc_id")),

    "ft_phrase_slop" -> ((s, d) => // 2-term window semantics: |shift| <= slop
      searcher(s, d).phraseQuery("sort merge", slop = 2)
        .select("doc_id").orderBy("doc_id")),

    "ft_phrase_slop3" -> ((s, d) => // 3-term: some occurrence choice spans <= slop
      searcher(s, d).phraseQuery("row column sort", slop = 3)
        .select("doc_id").orderBy("doc_id")),

    "ft_phrase_slop_ord" -> ((s, d) => // ordered window: query order required
      searcher(s, d).phraseQuery("sort merge", slop = 2, inOrder = true)
        .select("doc_id").orderBy("doc_id")),

    "ft_phrase_slop3_ord" -> ((s, d) => // 3-term non-decreasing chain <= slop
      searcher(s, d).phraseQuery("row column sort", slop = 3, inOrder = true)
        .select("doc_id").orderBy("doc_id")),

    "ft_qs_compound" -> ((s, d) => // Lucene-syntax slop + fuzzy inside a tree
      searcher(s, d).queryString("\"sort merge\"~2 AND sport~2")
        .select("doc_id").orderBy("doc_id")),

    "ft_count" -> ((s, d) => { // _count API: total hits, no doc fetch
      import s.implicits._
      Seq((searcher(s, d).countMatches("spark join", And),
        searcher(s, d).countMatches("vector window", Or),
        searcher(s, d).countMatches("zzzunknown", Or)))
        .toDF("n_and", "n_or", "n_unknown")
    }),

    "ft_msm" -> ((s, d) => // minimum_should_match: >= 2 of the 4 terms
      searcher(s, d).matchQueryMsm("spark join vector window", 2)
        .select("doc_id").orderBy("doc_id")),

    "ft_collapse" -> ((s, d) => // field collapsing: best doc per source
      searcher(s, d).bm25TopKCollapse("spark join", "source", 100)
        .select(col("doc_id"), col("source"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_search_after" -> ((s, d) => { // cursor pagination: page 2 == ranks 21-40
      val sr = searcher(s, d)
      val page1 = sr.bm25TopKFirstPage("spark join table", 20)
        .select("score", "doc_ord").collect() // page 1 in the SAME quantized order
      val cur = page1.last
      sr.bm25TopKAfter("spark join table", 20, cur.getDouble(0), cur.getLong(1))
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))
    }),

    "ft_facet_hist" -> ((s, d) => // histogram facet over the matched set
      searcher(s, d).facetHistogram("spark join", Or, "n_chars", 200L)
        .select(col("bucket"), col("n_docs")).orderBy("bucket")),

    "ft_boost" -> ((s, d) => // query-time boosts via the ^ query-string syntax
      searcher(s, d).queryString("spark^2 OR join", ranked = true)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_multifield" -> ((s, d) => { // multi_match most_fields: text + 2×source
      val docs = docsTable(s, d).withColumn("doc_ord", col("doc_id"))
      graft.query.MultiField.bm25TopK(docs,
        Seq(searcher(s, d) -> 1.0, srcSearcher(s, d) -> 2.0), "spark src3", 10000)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))
    }),

    "ft_funcscore" -> ((s, d) => // function_score: BM25 × ln(1 + n_chars)
      searcher(s, d).bm25TopKFunctionScore("spark join",
        log(col("n_chars").cast("double") + 1), 10000)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_dismax" -> ((s, d) => // dis_max: best clause + 0.3 × the others
      searcher(s, d).disMaxTopK(Seq("spark join", "vector window"), 10000, 0.3)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_filtered" -> ((s, d) => // ES filter context: restricts, never scores
      searcher(s, d).bm25TopKFiltered("spark join", col("lang") === "en", 10000)
        .select(col("doc_id"), col("lang"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_facet_pctl" -> ((s, d) => // percentiles facet (exact flavor) over
      // the matched set; approx t-digest twin pinned in SearcherSpec
      searcher(s, d).facetPercentiles("spark join", Or, "n_chars",
        Seq(0.25, 0.5, 0.75, 0.95))
        .select(col("fraction"), round(col("value"), 6).as("value"))
        .orderBy("fraction")),

    "ft_facet_stats" -> ((s, d) => // stats facet over the matched set
      searcher(s, d).facetStats("spark join", Or, "n_chars")
        .select(col("n_docs"), col("vmin"), col("vmax"),
          round(col("vsum"), 6).as("vsum"), round(col("vavg"), 6).as("vavg"))),

    "ft_sigterms" -> ((s, d) => // significant terms of the AND-matched set
      searcher(s, d).significantTerms("spark join", And, topN = 15, minDocCount = 5)
        .select(col("term"), col("df_in"), col("df"), round(col("lift"), 6).as("lift"))
        .orderBy(desc("lift"), asc("term"))),

    "ft_grouped" -> ((s, d) => // has_child sum mode: conversations by total evidence
      searcher(s, d).bm25TopKGrouped("spark join", "source", 10000, "sum")
        .select(col("source"), round(col("score"), 6).as("score"), col("n_hits"))
        .orderBy(desc("score"), asc("source"))),

    "ft_sortby" -> ((s, d) => // ES sort-by-field: shortest matching docs first
      searcher(s, d).matchTopKSortBy("spark join", And, "n_chars", 50)
        .select("doc_id", "n_chars").orderBy("n_chars", "doc_id")),

    "ft_cardinality" -> ((s, d) => // cardinality facet: distinct sources matched
      searcher(s, d).facetCardinality("spark join", Or, "source")),

    "ft_facet_date" -> ((s, d) => // date_histogram: monthly buckets of a
      // doc_id-derived timestamp (docs carry no ts col; synthesizing it from
      // a table column exercises the calendar math on every row)
      searcher(s, d).facetDateHistogram("spark join", Or,
        date_add(to_date(lit("2025-01-01")), (col("doc_id") % 400).cast("int"))
          .cast("timestamp"), "month")
        .select(col("bucket"), col("n_docs")).orderBy("bucket")),

    "ft_rescore" -> ((s, d) => // rescore API: BM25 retrieve + phrase re-rank
      // windowSize covers the whole matched set here so the oracle has no
      // float-sensitive window boundary; SearcherSpec pins the windowing
      searcher(s, d).bm25TopKRescore("spark join", "join table",
        windowSize = 10000, k = 10000, queryWeight = 1.0, rescoreWeight = 0.7)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_tfidf" -> ((s, d) =>
      searcher(s, d).matchQueryRanked("spark join", Or)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_bm25" -> ((s, d) =>
      searcher(s, d).bm25All("spark join")
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_context" -> ((s, d) => { // conversation-context fetch: ±2 turns of
      // each BM25 top-5 hit's conversation (conv/turn synthesized from
      // doc_id — the documents table carries no conversation key)
      val docs = docsTable(s, d)
        .withColumn("doc_ord", col("doc_id"))
        .withColumn("conv", (col("doc_id") / 10).cast("long"))
        .withColumn("turn", (col("doc_id") % 10).cast("int"))
      val hits = graft.query.Hybrid.ranks(
        searcher(s, d).bm25All("spark join").select(col("doc_id"), col("score")), 5)
        .select(col("doc_id").as("doc_ord"))
      graft.query.Searcher.contextWindows(docs, hits, "conv", "turn", window = 2)
        .select(col("hit_ord"), col("doc_id"), col("offset"))
        .orderBy("hit_ord", "offset")
    }),

    "ft_lmdirichlet" -> ((s, d) => // pluggable similarity: LM Dirichlet
      // (Zhai & Lafferty / Lucene LMDirichletSimilarity) over the same
      // one-scan plan as BM25
      searcher(s, d).lmDirichletAll("spark join")
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_boosting" -> ((s, d) => // ES boosting query: BM25('spark join'),
      // docs containing 'window' demoted x0.5 (not excluded)
      searcher(s, d).bm25TopKBoosting("spark join", "window", 0.5, 10000)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_phrase_prefix" -> ((s, d) => // match_phrase_prefix "the s": 's'
      // expands to {scan, slow, small, sort, spark, stream} against the
      // dictionary; a doc matches when 'the' is immediately followed by
      // any expansion
      searcher(s, d).matchPhrasePrefix("the s")
        .select("doc_id").orderBy("doc_id")),

    "ft_federated" -> ((s, d) => // 3 independently built slices; the oracle
      // is the MONOLITHIC BM25 SQL — global N/avgdl/df merge must reproduce
      // single-index scores float-exactly
      federation(s, d).bm25All("spark join")
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_federated_wand" -> ((s, d) => // per-slice block-max WAND with global
      // weights, scatter-gather k-cut — oracled against the monolithic
      // EXHAUSTIVE top-k SQL (lossless pruning under federation)
      federation(s, d).bm25TopKWand("spark join table", 20)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_federated_fuzzy" -> ((s, d) => // GLOBAL-vocabulary fuzzy expansion
      // (levenshtein<=2 of 'sport'), ranked: per-slice expansion would
      // diverge when a term is slice-exclusive or its df ordering differs
      // locally — the merged expansion + global-df TF-IDF must be
      // float-exact to the monolithic ranked fuzzy query
      federation(s, d).fuzzyQuery("sport", maxEdits = 2, ranked = true)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_federated_prefix" -> ((s, d) => // global-vocabulary prefix
      // expansion, unranked OR-match across the slices
      federation(s, d).prefixQuery("s")
        .select("doc_id").orderBy("doc_id")),

    "ft_federated_suggest" -> ((s, d) => // autocomplete over merged slice
      // dictionaries: Σ slice df == monolithic df, global (df desc, term)
      // top-n — a slice-exclusive completion still surfaces
      federation(s, d).suggest("s", 10)),

    "ft_federated_dym" -> ((s, d) => // spell correction over merged slice
      // dictionaries: Σ slice df == monolithic df and the edit distance is
      // a pure term function, so the (distance, df desc, term) correction
      // list is identical to the monolithic ft_dym ranking
      federation(s, d).didYouMean("sprak", maxEdits = 2, n = 5)
        .select(col("term"), col("df"),
          col("distance").cast("long").as("distance"))),

    "ft_federated_bool" -> ((s, d) => // boolean tree over the slices: leaf
      // membership is per-doc, so the union must equal the monolithic
      // ft_bool set — including the NOT branch evaluated per slice
      federation(s, d).boolQuery(
        (BTerm("spark") && BTerm("join")) || (BTerm("group") && !BTerm("window")))
        .select("doc_id").orderBy("doc_id")),

    "ft_federated_bool_ranked" -> ((s, d) => // ranked tree with the merged
      // global df injected into each slice's positive-leaf BM25 weights —
      // scores must be float-exact to the monolithic ft_bool_ranked SQL
      federation(s, d).boolQueryRanked(
        BTerm("spark join", Or) && !BTerm("window"))
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_federated_collapse" -> ((s, d) => // field collapsing across slices:
      // a source group spans slices, so the gather re-collapses per-slice
      // bests; scores carry the merged global df — must equal ft_collapse
      federation(s, d).bm25TopKCollapse("spark join", "source", 100)
        .select(col("doc_id"), col("source"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_federated_cardinality" -> ((s, d) => // a source value matched in
      // SEVERAL slices must count ONCE — per-slice distinct counts cannot
      // be summed; the federated agg spans the union of slice matches
      federation(s, d).facetCardinality("spark join", Or, "source")),

    "ft_federated_dismax" -> ((s, d) => // dis_max across slices via the
      // stats-override hook: per-slice clause scores carry the merged
      // global df, the gather is the standard top-k merge — must equal the
      // monolithic ft_dismax list float-exactly
      federation(s, d).disMaxTopK(Seq("spark join", "vector window"), 10000, 0.3)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_federated_lm" -> ((s, d) => // LM-Dirichlet across slices: global cf
      // via the stats override, global |C| injected — query-likelihood
      // scores must equal the monolithic ft_lmdirichlet list
      federation(s, d).lmDirichletTopK("spark join", 10000)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_federated_sigterms" -> ((s, d) => // merged matched-set term stats:
      // Σ slice df_in and Σ slice matched counts, lift recomputed from the
      // merged global df and N — the list must be identical to the
      // monolithic ft_sigterms ranking over the union corpus
      federation(s, d).significantTerms("spark join", And, topN = 15, minDocCount = 5)
        .select(col("term"), col("df_in"), col("df"), round(col("lift"), 6).as("lift"))
        .orderBy(desc("lift"), asc("term"))),

    "ft_federated_mlt" -> ((s, d) => // more-like-this across slices: source
      // doc located by its stable key, term selection over the MERGED
      // global df, then the federated ranked OR — must equal the monolithic
      // ft_mlt list float-exactly
      federation(s, d).moreLikeThis(Seq(42L), maxQueryTerms = 5, k = 100000)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_federated_phrase_prefix" -> ((s, d) => // match_phrase_prefix across
      // slices: the final-slot expansion runs against the MERGED global
      // vocabulary (per-slice expansion would diverge like prefix/fuzzy),
      // positional plans per slice — union must equal the monolithic set
      federation(s, d).matchPhrasePrefix("the s")
        .select("doc_id").orderBy("doc_id")),

    // ---- federated twins of the remaining per-document / aggregation
    // surface: each mirrors its monolithic entry's arguments exactly and
    // reuses the monolithic oracle SQL verbatim — lossless per-doc unions
    // (phrase/msm/wildcard/highlight/snippet/sortby/querystring), Σ-merged
    // or union-spanning facet partials, and stats-override scoring
    // (filtered/funcscore/grouped/boosting) with the merged global df.
    "ft_federated_phrase" -> ((s, d) =>
      federation(s, d).phraseQuery("batch batch")
        .select("doc_id").orderBy("doc_id")),
    "ft_federated_phrase_slop" -> ((s, d) =>
      federation(s, d).phraseQuery("sort merge", slop = 2)
        .select("doc_id").orderBy("doc_id")),
    "ft_federated_msm" -> ((s, d) =>
      federation(s, d).matchQueryMsm("spark join vector window", 2)
        .select("doc_id").orderBy("doc_id")),
    "ft_federated_phrase3" -> ((s, d) =>
      federation(s, d).phraseQuery("row column sort")
        .select("doc_id").orderBy("doc_id")),
    "ft_federated_phrase_ranked" -> ((s, d) => // TF-IDF over phrase terms
      // with the merged global df — float-exact to monolithic
      federation(s, d).phraseQuery("batch batch", ranked = true)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),
    "ft_federated_phrase_slop3" -> ((s, d) =>
      federation(s, d).phraseQuery("row column sort", slop = 3)
        .select("doc_id").orderBy("doc_id")),
    "ft_federated_phrase_slop_ord" -> ((s, d) =>
      federation(s, d).phraseQuery("sort merge", slop = 2, inOrder = true)
        .select("doc_id").orderBy("doc_id")),
    "ft_federated_phrase_slop3_ord" -> ((s, d) =>
      federation(s, d).phraseQuery("row column sort", slop = 3, inOrder = true)
        .select("doc_id").orderBy("doc_id")),
    "ft_federated_match_and" -> ((s, d) =>
      federation(s, d).matchQuery("Spark JOIN", And)
        .select("doc_id").orderBy("doc_id")),
    "ft_federated_match_or" -> ((s, d) =>
      federation(s, d).matchQuery("vector window", Or)
        .select("doc_id").orderBy("doc_id")),
    "ft_federated_match_and_unknown" -> ((s, d) => // a term in NO slice
      // dictionary: every slice's AND short-circuits — empty like monolithic
      federation(s, d).matchQuery("spark zzzunknownterm", And)
        .select("doc_id").orderBy("doc_id")),
    "ft_federated_search_after" -> ((s, d) => { // federated cursor walk:
      // page 2 from page 1's (score, tie-key) cursor — ranks 21-40
      val fr = federation(s, d)
      val page1 = fr.bm25TopKFirstPage("spark join table", 20)
        .select("score", "doc_id").collect()
      val cur = page1.last
      fr.bm25TopKAfter("spark join table", 20, cur.getDouble(0), cur.getLong(1))
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))
    }),
    "ft_federated_wildcard" -> ((s, d) =>
      federation(s, d).wildcardQuery("*a*e*")
        .select("doc_id").orderBy("doc_id")),
    "ft_federated_highlight" -> ((s, d) =>
      federation(s, d).highlightTerms("spark join vector", Or)
        .select("doc_id", "hit_terms").orderBy("doc_id")),
    "ft_federated_snippet" -> ((s, d) =>
      federation(s, d).snippet("vector", window = 2)
        .select("doc_id", "first_pos", "snippet").orderBy("doc_id")),
    "ft_federated_count" -> ((s, d) => { // Σ slice counts (disjoint corpora)
      import s.implicits._
      Seq((federation(s, d).countMatches("spark join", And),
        federation(s, d).countMatches("vector window", Or),
        federation(s, d).countMatches("zzzunknown", Or)))
        .toDF("n_and", "n_or", "n_unknown")
    }),
    "ft_federated_facets" -> ((s, d) =>
      federation(s, d).facetCounts("spark join", Or, "source")
        .orderBy("source")),
    "ft_federated_facet_stats" -> ((s, d) =>
      federation(s, d).facetStats("spark join", Or, "n_chars")
        .select(col("n_docs"), col("vmin"), col("vmax"),
          round(col("vsum"), 6).as("vsum"), round(col("vavg"), 6).as("vavg"))),
    "ft_federated_facet_hist" -> ((s, d) =>
      federation(s, d).facetHistogram("spark join", Or, "n_chars", 200L)
        .select(col("bucket"), col("n_docs")).orderBy("bucket")),
    "ft_federated_facet_date" -> ((s, d) =>
      federation(s, d).facetDateHistogram("spark join", Or,
        date_add(to_date(lit("2025-01-01")), (col("doc_id") % 400).cast("int"))
          .cast("timestamp"), "month")
        .select(col("bucket"), col("n_docs")).orderBy("bucket")),
    "ft_federated_facet_pctl" -> ((s, d) => // exact percentiles are
      // order-insensitive over the union multiset — identical to monolithic
      federation(s, d).facetPercentiles("spark join", Or, "n_chars",
        Seq(0.25, 0.5, 0.75, 0.95))
        .select(col("fraction"), round(col("value"), 6).as("value"))
        .orderBy("fraction")),
    "ft_federated_filtered" -> ((s, d) =>
      federation(s, d).bm25TopKFiltered("spark join", col("lang") === "en", 10000)
        .select(col("doc_id"), col("lang"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),
    "ft_federated_funcscore" -> ((s, d) =>
      federation(s, d).bm25TopKFunctionScore("spark join",
        log(col("n_chars").cast("double") + 1), 10000)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),
    "ft_federated_grouped" -> ((s, d) => // sum-mode groups SPAN slices:
      // per-slice partials re-aggregate before the ranking cut
      federation(s, d).bm25TopKGrouped("spark join", "source", 10000, "sum")
        .select(col("source"), round(col("score"), 6).as("score"), col("n_hits"))
        .orderBy(desc("score"), asc("source"))),
    "ft_federated_boosting" -> ((s, d) =>
      federation(s, d).bm25TopKBoosting("spark join", "window", 0.5, 10000)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),
    "ft_federated_sortby" -> ((s, d) =>
      federation(s, d).matchTopKSortBy("spark join", And, "n_chars", 50)
        .select("doc_id", "n_chars").orderBy("n_chars", "doc_id")),
    "ft_federated_querystring" -> ((s, d) =>
      federation(s, d).queryString("spark AND (join OR merge) AND NOT window")
        .select("doc_id").orderBy("doc_id")),
    "ft_federated_boost" -> ((s, d) => // ^boost weights ride the ranked tree
      // path with the merged global df — float-exact to monolithic
      federation(s, d).queryString("spark^2 OR join", ranked = true)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),
    "ft_federated_bool_not" -> ((s, d) => // pure negation: each slice's
      // complement unions to the global complement (disjoint corpora)
      federation(s, d).boolQuery(!BTerm("spark"))
        .select("doc_id").orderBy("doc_id")),
    "ft_federated_bool_phrase" -> ((s, d) =>
      federation(s, d).boolQuery(BPhrase("batch batch") && !BTerm("window"))
        .select("doc_id").orderBy("doc_id")),
    "ft_federated_qs_compound" -> ((s, d) => // slop + fuzzy leaves in one
      // tree; the unranked fuzzy expansion fits the cap at this vocab, so
      // per-slice expansion == monolithic (the documented condition)
      federation(s, d).queryString("\"sort merge\"~2 AND sport~2")
        .select("doc_id").orderBy("doc_id")),

    "ft_federated_multifield" -> ((s, d) => { // multi_match most_fields
      // ACROSS slices: each field is its own federation over the same
      // doc_id % 3 slicing (per-field global stats merge independently) —
      // combined scores must equal the monolithic ft_multifield list
      val docs = docsTable(s, d)
      graft.query.MultiField.bm25TopKFederated(docs,
        Seq(federation(s, d) -> 1.0, srcFederation(s, d) -> 2.0),
        "spark src3", 10000)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))
    }),

    "ft_federated_match_all" -> ((s, d) => // every doc of every slice,
      // stable-key order — the federated twin of the reference's match-all
      federation(s, d).matchAll().select("doc_id").orderBy("doc_id")),

    "ft_federated_tfidf" -> ((s, d) => // the reference's TF-IDF sorter
      // across slices: merged global df in the weights, tf/dl doc-local —
      // must equal the monolithic ft_tfidf list float-exactly
      federation(s, d).matchQueryRanked("spark join", Or)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_federated_regexp" -> ((s, d) => // raw-regex expansion over the
      // MERGED slice vocabularies, unranked OR-match
      federation(s, d).regexpQuery("s.*k|j.+n")
        .select("doc_id").orderBy("doc_id")),

    "ft_federated_termrange" -> ((s, d) => // lexicographic dictionary slice
      // [so, sz] of the merged vocabulary
      federation(s, d).termRangeQuery("so", "sz")
        .select("doc_id").orderBy("doc_id")),

    "ft_federated_termvectors" -> ((s, d) => // one doc's indexed view,
      // addressed by stable key: tf/positions are doc-local, so the home
      // slice's read must equal the monolithic _termvectors
      federation(s, d).termVectors(Seq(42L))),

    "ft_federated_explain" -> ((s, d) => // per-term BM25 breakdown with
      // FEDERATED stats: idf from merged global df, tf/dl from the home
      // slice — must equal the monolithic _explain rows float-exactly
      federation(s, d).explainScore("spark join table", Seq(42L))
        .select(col("term"), col("tf"), col("df"), round(col("idf"), 6).as("idf"),
          round(col("tf_factor"), 6).as("tf_factor"),
          round(col("contribution"), 6).as("contribution"))),

    "ft_federated_batch_wand" -> ((s, d) => // the offline query-set-replay
      // shape across slices: ONE slot broadcast + pruned blocks scan +
      // per-query WAND per slice with global idf/avgdl (bounds stay
      // lossless), gather window over ≤ slices·queries·k rows — ranks and
      // scores must equal the monolithic batch list
      federation(s, d).bm25TopKBatchWand(Seq("spark join", "vector window"), k = 500)
        .select(col("q_id"), col("rank"), col("doc_id"),
          round(col("score"), 6).as("score"))
        .orderBy("q_id", "rank")),

    "ft_federated_rescore" -> ((s, d) => // two-phase rescore across slices:
      // GLOBAL quantized window gather, phrase rescore on each window doc's
      // HOME slice with merged global df — must equal monolithic ft_rescore
      federation(s, d).bm25TopKRescore("spark join", "join table",
        windowSize = 10000, k = 10000, queryWeight = 1.0, rescoreWeight = 0.7)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_bm25_topk_wand" -> ((s, d) => // oracled against the EXHAUSTIVE top-k
      // SQL — the rank-identity claim itself (WAND pruning is lossless);
      // boundary safety: the rank-20/21 score gap at sf0.01 is ~7e-4,
      // orders above the 1e-6 rounding grain
      searcher(s, d).bm25TopKWand("spark join table", 20)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_bm25_topk_wand_serving" -> ((s, d) => { // the SERVING fast path
      // (bucket-local WAND + LocalRelation fetch) against the same
      // exhaustive oracle SQL verbatim — rank identity of the pinned
      // plan proved end-to-end, not just spec-to-spec
      val sc = searcher(s, d)
      sc.serving(pinDocs = true)
      try sc.bm25TopKWand("spark join table", 20)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))
      finally sc.unpin() // fast-path result is a LocalRelation — safe
    }),

    "ft_count_serving" -> ((s, d) => { // block-local count fast path vs
      // the same _count oracle verbatim
      import s.implicits._
      val sc = searcher(s, d)
      sc.serving(pinDocs = false)
      try Seq((sc.countMatches("spark join", And),
        sc.countMatches("vector window", Or),
        sc.countMatches("zzzunknown", Or)))
        .toDF("n_and", "n_or", "n_unknown")
      finally sc.unpin()
    }),

    "ft_bm25_batch_wand" -> ((s, d) => // batch + WAND combined, one plan
      searcher(s, d).bm25TopKBatchWand(Seq("spark join", "vector window"), k = 20)
        .select(col("q_id"), col("rank"), col("doc_ord").as("doc_id"),
          round(col("score"), 6).as("score"))
        .orderBy("q_id", "rank")),

    "ft_bm25_batch" -> ((s, d) => // batch query-set evaluation, one plan
      searcher(s, d).bm25TopKBatch(Seq("spark join", "vector window"), k = 500)
        .select(col("q_id"), col("rank"), col("doc_ord").as("doc_id"),
          round(col("score"), 6).as("score"))
        .orderBy("q_id", "rank")),

    "ft_ngram3" -> ((s, d) => {
      val ng = Analyzer(Nil, graft.analysis.NgramTokenizer(3),
        Seq(graft.analysis.LowercaseFilter()))
      docsTable(s, d)
        .filter(array_contains(ng.termsColumn(col("text")), "spa"))
        .select("doc_id").orderBy("doc_id")
    }),

    // ---- non-default analyzer stages, fingerprint-checked per token -------
    "ft_synonym" -> ((s, d) => { // canonicalizing synonym filter, per-token fp
      val a = Analyzer(Nil, graft.analysis.StandardTokenizer(),
        Seq(graft.analysis.LowercaseFilter(),
          graft.analysis.SynonymFilter(Map("join" -> "merge", "group" -> "agg"))))
      val toks = a.termsColumn(col("text"))
      docsTable(s, d).select(col("doc_id"),
        size(toks).cast("long").as("n_toks"),
        md5(to_binary(concat_ws(" ", toks), lit("utf-8"))).as("fp"))
        .orderBy("doc_id")
    }),

    "ft_asciifold" -> ((s, d) => { // accents SYNTHESIZED per row (a->á, e->é;
      // the corpus is ASCII), then folded — the fingerprint must equal the
      // plain analyzed stream's, exercising the fold on every row
      val a = Analyzer(Nil, graft.analysis.StandardTokenizer(),
        Seq(graft.analysis.LowercaseFilter(), graft.analysis.AsciiFoldingFilter()))
      val accented = regexp_replace(regexp_replace(col("text"), "a", "á"), "e", "é")
      val toks = a.termsColumn(accented)
      docsTable(s, d).select(col("doc_id"),
        size(toks).cast("long").as("n_toks"),
        md5(to_binary(concat_ws(" ", toks), lit("utf-8"))).as("fp"))
        .orderBy("doc_id")
    }),

    "ft_shingle" -> ((s, d) => { // word-bigram shingles, per-doc stream fp
      val a = Analyzer(Nil, graft.analysis.StandardTokenizer(),
        Seq(graft.analysis.LowercaseFilter(), graft.analysis.ShingleFilter(2)))
      val toks = a.termsColumn(col("text"))
      docsTable(s, d).select(col("doc_id"),
        size(toks).cast("long").as("n_toks"),
        md5(to_binary(concat_ws("|", toks), lit("utf-8"))).as("fp"))
        .orderBy("doc_id")
    }),

    "ft_lenfilter" -> ((s, d) => { // token length gate [3, 8] code points
      val a = Analyzer(Nil, graft.analysis.StandardTokenizer(),
        Seq(graft.analysis.LowercaseFilter(), graft.analysis.LengthFilter(3, 8)))
      val toks = a.termsColumn(col("text"))
      docsTable(s, d).select(col("doc_id"),
        size(toks).cast("long").as("n_kept"),
        md5(to_binary(concat_ws(" ", toks), lit("utf-8"))).as("fp"))
        .orderBy("doc_id")
    }),

    "ft_stopword" -> ((s, d) => { // order-preserving stopword drop (§2.1 row 7)
      val a = Analyzer.standard(stopWords = Seq("the", "a"))
      val toks = a.termsColumn(col("text"))
      docsTable(s, d).select(col("doc_id"),
        size(toks).cast("long").as("n_kept"),
        md5(to_binary(concat_ws(" ", toks), lit("utf-8"))).as("fp"))
        .orderBy("doc_id")
    }),

    "ft_charfilter" -> ((s, d) => { // mapping char filter before tokenize (§2.1 row 2)
      val a = Analyzer(Seq(graft.analysis.MappingCharFilter(Map("sl" -> "qu"))),
        graft.analysis.StandardTokenizer(), Seq(graft.analysis.LowercaseFilter()))
      val toks = a.termsColumn(col("text"))
      docsTable(s, d).select(col("doc_id"),
        md5(to_binary(concat_ws(" ", toks), lit("utf-8"))).as("fp"))
        .orderBy("doc_id")
    }),

    "ft_stemmer" -> ((s, d) => { // Porter2 stemmer, golden-mapped oracle (§2.1 row 8)
      val a = Analyzer.standard(stem = true)
      val toks = a.termsColumn(col("text"))
      docsTable(s, d).select(col("doc_id"),
        md5(to_binary(concat_ws(" ", toks), lit("utf-8"))).as("fp"))
        .orderBy("doc_id")
    }),

    "ft_phrase_ranked" -> ((s, d) => // ranked phrase: TF-IDF over phrase terms
      searcher(s, d).phraseQuery("batch batch", ranked = true)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    // ---- dictionary-expansion queries (prefix / wildcard / fuzzy): one
    // vocab-sized dictionary scan resolves the expansion set, then the same
    // pruned postings OR-match as any flat query ------------------------------
    "ft_prefix" -> ((s, d) =>
      searcher(s, d).prefixQuery("s").select("doc_id").orderBy("doc_id")),

    "ft_wildcard" -> ((s, d) => // '*a*e*' -> {table, value} on this corpus
      searcher(s, d).wildcardQuery("*a*e*").select("doc_id").orderBy("doc_id")),

    "ft_fuzzy" -> ((s, d) => // levenshtein <= 2 of 'sport' -> {part, sort, spark}
      searcher(s, d).fuzzyQuery("sport", maxEdits = 2)
        .select("doc_id").orderBy("doc_id")),

    "ft_regexp" -> ((s, d) => // raw-regex expansion over the dictionary
      searcher(s, d).regexpQuery("s.*k|j.+n")
        .select("doc_id").orderBy("doc_id")),

    "ft_termrange" -> ((s, d) => // lexicographic dictionary slice [so, sz]
      searcher(s, d).termRangeQuery("so", "sz")
        .select("doc_id").orderBy("doc_id")),

    "ft_dym" -> ((s, d) => // did-you-mean: 'sprak' -> corrections by (dist, df)
      searcher(s, d).didYouMean("sprak", maxEdits = 2, n = 5)
        .select(col("term"), col("df"), col("distance").cast("long").as("distance"))),

    // ---- boolean query trees: one pruned scan + per-doc leaf bitmask -------
    "ft_bool" -> ((s, d) =>
      searcher(s, d).boolQuery(
        (BTerm("spark") && BTerm("join")) || (BTerm("group") && !BTerm("window")))
        .select("doc_id").orderBy("doc_id")),

    "ft_bool_not" -> ((s, d) => // pure negation: the complement branch
      searcher(s, d).boolQuery(!BTerm("spark"))
        .select("doc_id").orderBy("doc_id")),

    "ft_bool_phrase" -> ((s, d) => // phrase leaf under AND NOT
      searcher(s, d).boolQuery(BPhrase("batch batch") && !BTerm("window"))
        .select("doc_id").orderBy("doc_id")),

    // ---- facets / highlighting / snippets ----------------------------------
    "ft_facets" -> ((s, d) =>
      searcher(s, d).facetCounts("spark join", Or, "source")
        .orderBy("source")),

    "ft_highlight" -> ((s, d) =>
      searcher(s, d).highlightTerms("spark join vector", Or)
        .select("doc_id", "hit_terms").orderBy("doc_id")),

    "ft_snippet" -> ((s, d) => // token window (±2) around the first hit,
      // match position from the INDEX postings, only matched rows re-analyzed
      searcher(s, d).snippet("vector", window = 2)
        .select("doc_id", "first_pos", "snippet").orderBy("doc_id")),

    "ft_mlt" -> ((s, d) => // more-like-this: top-5 tf·idf terms of doc 42,
      // BM25 over them, source excluded; k oversized so the oracle needs no
      // top-k boundary (all matches returned, rank order checked by hash)
      searcher(s, d).moreLikeThis(42L, maxQueryTerms = 5, k = 100000)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    "ft_suggest" -> ((s, d) => // autocomplete: highest-df dict terms by prefix
      searcher(s, d).suggest("s", n = 10)),

    "ft_termvectors" -> ((s, d) => // ES _termvectors: one doc's indexed view
      searcher(s, d).termVectors(42L)),

    "ft_explain" -> ((s, d) => // ES _explain: per-term BM25 breakdown
      searcher(s, d).explainScore("spark join table", 42L)
        .select(col("term"), col("tf"), col("df"), round(col("idf"), 6).as("idf"),
          round(col("tf_factor"), 6).as("tf_factor"),
          round(col("contribution"), 6).as("contribution"))),

    "ft_querystring" -> ((s, d) => // Lucene-lite syntax -> BoolQuery tree
      searcher(s, d).queryString("spark AND (join OR merge) AND NOT window")
        .select("doc_id").orderBy("doc_id")),

    "ft_bool_ranked" -> ((s, d) => // tree filters, positive clauses score
      searcher(s, d).boolQueryRanked(
        BTerm("spark join", Or) && !BTerm("window"))
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id"))),

    // ---- percolation (reverse search): stored queries vs the doc flow ------
    "ft_percolate" -> ((s, d) =>
      Percolator.matches(docsTable(s, d), Seq(
        Percolator.StoredQuery(0L, "spark join", And),
        Percolator.StoredQuery(1L, "vector window", Or),
        Percolator.StoredQuery(2L, "batch stream group", And)), analyzer)
        .orderBy("doc_id", "q_id")),

    "ft_percolate_bool" -> ((s, d) => // standing TREES percolated per doc
      Percolator.matchesBool(docsTable(s, d), Seq(
        0L -> ((BTerm("spark") && BTerm("join")) ||
               (BTerm("group") && !BTerm("window"))),
        1L -> (BPhrase("batch batch") && !BTerm("window"))), analyzer)
        .orderBy("doc_id", "q_id")),

    "dedup_keep_one" -> ((s, d) => { // end-to-end pipeline: pairs -> keep-one view
      val pairs = Dedup.ngramJaccardPairs(docsTable(s, d), "source", threshold = 0.05, n = 3)
      Dedup.dropDuplicates(docsTable(s, d), pairs)
        .select("doc_id").orderBy("doc_id")
    }),

    "dedup_cc" -> ((s, d) => { // exact transitive clustering: jaccard pairs
      // (threshold low enough for multi-node components at sf0.01: 179
      // edges, 76 non-trivial components, largest 12) -> alternating-star
      // connected components -> every doc labeled with its component min
      val docs = docsTable(s, d)
      val pairs = Dedup.ngramJaccardPairs(docs, "source", threshold = 0.01, n = 3)
      val labels = Dedup.connectedComponents(pairs).withColumnRenamed("id", "doc_id")
      docs.select("doc_id").join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp"))
        .orderBy("doc_id")
    }),

    // ---- dedup family ----------------------------------------------------
    "dedup_exact" -> ((s, d) =>
      Dedup.exact(docsTable(s, d)).orderBy("keep_id")),

    "dedup_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(docsTable(s, d), "source", threshold = 0.05, n = 3)
        .orderBy("id_a", "id_b")),

    "dedup_minhash_bands" -> ((s, d) => // portable polynomial base hash →
      // the signature itself is DuckDB-replicable (same affine coeffs
      // embedded in the oracle as literals); production banding keeps the
      // codegen'd xxhash64 variant (dedup_minhash_pairs)
      {
        val docs = docsTable(s, d)
        val withSig = docs.select(col("doc_id"),
          Dedup.shingles(col("text"), 3).as("sh"))
          .withColumn("sig", Dedup.minhashSignaturePortable(col("sh"), 16, 42L))
        withSig.select(col("doc_id"), element_at(col("sig"), 1).as("h0"),
          element_at(col("sig"), 6).as("h5"), element_at(col("sig"), 11).as("h10"),
          element_at(col("sig"), 16).as("h15")).orderBy("doc_id")
      }),

    "dedup_minhash_pairs" -> ((s, d) => // PORTABLE end-to-end: polynomial
      // base hash + unhashed band keys, so the oracle replicates signature,
      // banding, candidate join AND verify (production keeps the xxhash64
      // variant, OpsSpec-tested)
      Dedup.minhashLshPairsPortable(docsTable(s, d), threshold = 0.05,
        numHashes = 16, bands = 8, shingleN = 3).orderBy("id_a", "id_b")),

    "dedup_ngram_overlap" -> ((s, d) => { // GPT-3-style EXACT n-gram-overlap
      // decontamination signal vs the eval slice (doc_id % 5 == 0):
      // per-train-doc window counts + hit counts, portable fingerprints
      val docs = docsTable(s, d)
      Dedup.ngramDecontaminate(
        docs.filter(col("doc_id") % 5 =!= 0), docs.filter(col("doc_id") % 5 === 0),
        n = 5, portable = true)
        .orderBy("doc_id")
    }),

    "dedup_decontaminate" -> ((s, d) => { // training docs surviving near-dup
      // decontamination against a reference/eval slice (doc_id % 5 == 0);
      // portable twin end-to-end like dedup_minhash_pairs
      val docs = docsTable(s, d)
      Dedup.decontaminate(
        docs.filter(col("doc_id") % 5 =!= 0), docs.filter(col("doc_id") % 5 === 0),
        threshold = 0.05, numHashes = 16, bands = 8, shingleN = 3,
        portable = true)
        .select("doc_id").orderBy("doc_id")
    }),

    "dedup_simhash_pairs" -> ((s, d) => { // multi-index hashing (wide budget)
      // over the portable 60-bit simhash; banding is recall-LOSSLESS, so
      // the oracle is the brute-force hamming filter — checking the
      // pigeonhole claim itself, not a replication of the bands
      val hashes = Dedup.simhash60Portable(docsTable(s, d))
        .select(col("doc_id").as("id"), col("simhash"))
      Dedup.simhashPairsMIHFromHashes(hashes, maxHamming = 8)
        .orderBy("id_a", "id_b")
    }),

    "dedup_simhash_portable" -> ((s, d) => // 60-bit polynomial variant with a
      // full DuckDB oracle (simhash64 itself rests on xxhash64, which the
      // oracle engine lacks)
      Dedup.simhash60Portable(docsTable(s, d)).orderBy("doc_id")),

    "dedup_embedding" -> ((s, d) => // portable congruential planes: the
      // oracle replicates bucketing + candidate join + cosine verify
      Dedup.embeddingCosinePairs(embTable(s, d), threshold = 0.4, planes = 4,
        portable = true).orderBy("id_a", "id_b")),

    // ---- similarity search ----------------------------------------------
    "ann_brute_topk" -> ((s, d) => {
      val emb = embTable(s, d)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 5)
        .orderBy("q_id", "rank")
    }),

    "ann_centroid_outliers" -> ((s, d) => // embedding-quality signal: cosine
      // to the corpus centroid, flagged below a fixed threshold
      Similarity.centroidCosine(embTable(s, d), threshold = 0.5)
        .orderBy("vec_id")),

    "ann_lsh_topk" -> ((s, d) => { // portable congruential planes — the
      // oracle replicates the bucketing and ranks the same candidate set
      // (production keeps the xxhash64 planes, recall-tested in OpsSpec)
      val emb = embTable(s, d)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 5, planes = 4,
        portable = true).orderBy("q_id", "rank")
    }),

    "ann_lsh_mp_topk" -> ((s, d) => { // multiprobe LSH (Lv et al., VLDB'07):
      // same portable planes/index as ann_lsh_topk; the query side
      // additionally probes the 2 nearest-boundary single-bit-flip buckets
      // per (query, table) — the oracle replicates the probe-set derivation
      // (|projection| ranking, ties by plane index asc) and ranks the
      // expanded candidate set, so the recall-raising bucket expansion is
      // itself oracled end-to-end, not just recall-tested
      val emb = embTable(s, d)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 5, planes = 4,
        portable = true, probes = 2).orderBy("q_id", "rank")
    }),

    "ann_ivf_topk" -> ((s, d) => { // nprobe == nlist probes every list: exact,
      // so the brute-force oracle applies; partial-probe recall is in OpsSpec
      val emb = embTable(s, d)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 5, nlist = 8, nprobe = 8)
        .orderBy("q_id", "rank")
    }),

    "ann_filtered" -> ((s, d) => { // kNN with the ES PRE-filter: top-k among
      // label==1 vectors only (never "top-k then filter")
      val emb = embTable(s, d)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 5,
        filter = Some(col("label") === 1))
        .orderBy("q_id", "rank")
    }),

    "hyb_rrf" -> ((s, d) => { // hybrid retrieval: BM25('spark join') fused
      // with exact-cosine ranks of doc 7's embedding via reciprocal-rank
      // fusion — rank-based, so the two retrievers' incomparable score
      // scales never mix
      val emb = embTable(s, d)
      val qv = emb.filter(col("vec_id") === 7).select("embedding")
        .head.getSeq[Float](0).map(_.toDouble).toSeq
      graft.query.Hybrid.bm25VectorTopK(searcher(s, d), emb, "spark join",
        qv, k = 20, nPerSide = 50)
        .select(col("doc_id"), round(col("score"), 9).as("score"))
        .orderBy(desc("score"), asc("doc_id"))
    }),

    "sim_cosine_pairs" -> ((s, d) =>
      Similarity.cosinePairsBlocked(embTable(s, d), "label", threshold = 0.3)
        .orderBy("id_a", "id_b")),

    // ---- text analysis ---------------------------------------------------
    "text_tokcount" -> ((s, d) =>
      TextStats.tokenCount(docsTable(s, d)).orderBy("doc_id")),

    "text_quality" -> ((s, d) =>
      TextStats.quality(docsTable(s, d)).orderBy("doc_id")),

    "text_c4_rules" -> ((s, d) => // C4 cleaning heuristics, doc-level
      TextStats.c4Signals(docsTable(s, d)).orderBy("doc_id")),

    "text_gopher_rules" -> ((s, d) => // Gopher quality thresholds
      TextStats.gopherSignals(docsTable(s, d)).orderBy("doc_id")),

    "text_repetition_chars" -> ((s, d) => // Gopher char-fraction repetition
      TextStats.repetitionChars(docsTable(s, d)).orderBy("doc_id")),

    "text_langid" -> ((s, d) =>
      TextStats.langId(docsTable(s, d)).orderBy("doc_id")),

    "text_repetition" -> ((s, d) => // Gopher-style boilerplate signals
      TextStats.repetition(docsTable(s, d)).orderBy("doc_id")),

    "text_lm_score" -> ((s, d) => // corpus-unigram LM quality score
      TextStats.unigramLogProb(docsTable(s, d))
        .select(col("doc_id"), col("n_tokens"),
          round(col("avg_logp"), 6).as("avg_logp"))
        .orderBy("doc_id")),

    "dedup_spans" -> ((s, d) => // cross-doc duplicated 6-token spans
      Dedup.duplicateSpans(docsTable(s, d), n = 6, portable = true)
        .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
          round(col("dup_ratio"), 6).as("dup_ratio"))
        .orderBy("doc_id")),

    "text_redact_pii" -> ((s, d) => // PII is SYNTHESIZED from table columns
      // so the oracle exercises cross-engine regex parity on every row —
      // the synthetic corpus itself contains no emails/phones/IPs and an
      // identity diff would verify nothing
      TextStats.redactPii(
        docsTable(s, d).select(col("doc_id"),
          concat_ws(" ", col("text"), lit("contact"),
            concat(col("source"), lit("@ex-a.io")),
            lit("or (555) 123-4567 / +1 212.555.0100 from 10.0.0.1")).as("text")))
        .orderBy("doc_id")),

    "text_fingerprint" -> ((s, d) =>
      TextStats.fingerprintMd5(docsTable(s, d)).orderBy("doc_id")),

    "text_fingerprint_roll" -> ((s, d) => // no oracle: engine string-fold differs
      TextStats.fingerprintRolling(docsTable(s, d)).orderBy("doc_id")),

    // ---- pipeline plumbing: deterministic sampling / splits / stratified
    // draws / token-budget packing (portable-hash twins of the xxhash64
    // production ops in ops/Pipeline.scala — oracle-checkable) -------------
    "pl_sample" -> ((s, d) =>
      Pipeline.sampleByHashPortable(docsTable(s, d), "doc_id", 0.25, "s1")
        .select("doc_id").orderBy("doc_id")),

    "pl_clean_e2e" -> ((s, d) => { // the CAPSTONE composition: the ops
      // chained as an actual training-data cleaning pipeline — near-dup
      // keep-one, quality thresholds (Gopher signals), exact n-gram
      // decontamination against the eval slice, then a 50% hash sample —
      // with the WHOLE chain reproduced in one DuckDB query
      val docs = docsTable(s, d)
      val pairs = Dedup.ngramJaccardPairs(docs, "source", threshold = 0.05, n = 3)
      val deduped = Dedup.dropDuplicates(docs, pairs).select("doc_id")
      val quality = TextStats.gopherSignals(docs)
        .filter(col("n_words") >= 10 && col("alpha_word_ratio") >= 0.8 &&
          col("n_stop_kinds") >= 1)
        .select("doc_id")
      val clean = Dedup.ngramDecontaminate(
          docs.filter(col("doc_id") % 5 =!= 0), docs.filter(col("doc_id") % 5 === 0),
          n = 5, portable = true)
        .filter(col("contaminated") === 0).select("doc_id")
      val sampled = Pipeline.sampleByHashPortable(docs, "doc_id", 0.5, "e2e")
        .select("doc_id")
      deduped.join(quality, "doc_id").join(clean, "doc_id").join(sampled, "doc_id")
        .select("doc_id").orderBy("doc_id")
    }),

    "pl_split" -> ((s, d) =>
      Pipeline.withSplitPortable(docsTable(s, d), "doc_id", 0.2, 0.1, "sp")
        .select("doc_id", "split").orderBy("doc_id")),

    "pl_stratified_n" -> ((s, d) =>
      Pipeline.stratifiedSampleN(docsTable(s, d), "source", "doc_id", 5, "st",
        portable = true).select("doc_id", "source").orderBy("source", "doc_id")),

    "pl_pack_chunks" -> ((s, d) =>
      Pipeline.packByTokenBudget(docsTable(s, d), "source", "doc_id",
        size(TextStats.tokensCol(col("text"))), 500L)
        .select("doc_id", "source", "n_tokens", "chunk_id")
        .orderBy("source", "doc_id")),

    // ---- event-stream aggregations (same code runs under readStream +
    // watermark — spec-tested; here exercised in batch for the oracle) -----
    "ev_window_counts" -> ((s, d) =>
      graft.streaming.EventAggregates.windowedCounts(evTable(s, d), "5 minutes")
        .orderBy("w_start", "event_type")),

    "ev_sessions" -> ((s, d) =>
      graft.streaming.EventAggregates.sessionize(evTable(s, d), "30 minutes")
        .orderBy("user_id", "session_start")),

    // ---- multimodal with REAL pure-JDK decode: even docs carry a genuine
    // PNG (javax.imageio), odd docs a genuine RIFF/WAVE PCM16 payload, both
    // synthesized deterministically from doc_id. The oracle is a decode
    // ROUND-TRIP: the decoder must parse the actual byte stream and recover
    // the dimensions/sample counts the generator encoded — DuckDB recomputes
    // those from the generator formulas. Float pixel/amplitude stats are
    // golden-tested in OpsSpec (hand-computed 2x2 PNG / constant WAV). ------
    "mm_features" -> ((s, d) => {
      val withMedia = Multimodal.withRealMedia(docsTable(s, d))
      Multimodal.extractFeatures(withMedia, new Multimodal.JdkMediaDecoder(12))
        .select(col("doc_id"), size(col("features")).cast("long").as("dim"),
          element_at(col("features"), 1).cast("long").as("dec_a"),
          element_at(col("features"), 2).cast("long").as("dec_b"),
          element_at(col("features"), 11).cast("long").as("decoded"))
        .orderBy("doc_id")
    }),

    // ---- multimodal plumbing contract on an OPAQUE payload (sha256 bytes —
    // intentionally not a decodable stream): one row per doc through the
    // batched mapPartitions extraction, declared width, decode-failure flag
    // 0, and the exact binary payload byte-identical in the oracle ---------
    "mm_plumbing" -> ((s, d) => {
      val withMedia = Multimodal.withSyntheticMedia(docsTable(s, d))
      Multimodal.extractFeatures(withMedia, new Multimodal.JdkMediaDecoder(12))
        .join(withMedia.select(col("doc_id"),
          lower(hex(col("media"))).as("media_sha")), "doc_id")
        .select(col("doc_id"), size(col("features")).cast("long").as("dim"),
          element_at(col("features"), 11).cast("long").as("decoded"),
          col("media_sha"))
        .orderBy("doc_id")
    })
  )

  private val oracleSqlBase: Map[String, String] = Map(
    "ft_match_all" -> "SELECT doc_id FROM documents ORDER BY doc_id",

    "ft_match_and" ->
      s"""SELECT doc_id FROM documents
         |WHERE list_contains($toksSql, 'spark') AND list_contains($toksSql, 'join')
         |ORDER BY doc_id""".stripMargin,

    "ft_match_or" ->
      s"""SELECT doc_id FROM documents
         |WHERE list_contains($toksSql, 'vector') OR list_contains($toksSql, 'window')
         |ORDER BY doc_id""".stripMargin,

    "ft_match_and_unknown" ->
      "SELECT doc_id FROM documents WHERE false ORDER BY doc_id",

    "ft_phrase" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(arr) AS term, unnest(range(1, len(arr)+1)) AS pos
         |  FROM (SELECT doc_id, $toksSql AS arr FROM documents)
         |)
         |SELECT DISTINCT a.doc_id AS doc_id FROM toks a JOIN toks b
         |  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |WHERE a.term = 'batch' AND b.term = 'batch'
         |ORDER BY 1""".stripMargin,

    "ft_phrase3" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(arr) AS term, unnest(range(1, len(arr)+1)) AS pos
         |  FROM (SELECT doc_id, $toksSql AS arr FROM documents)
         |)
         |SELECT DISTINCT a.doc_id AS doc_id FROM toks a
         |JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
         |WHERE a.term = 'row' AND b.term = 'column' AND c.term = 'sort'
         |ORDER BY 1""".stripMargin,

    "ft_phrase_slop" -> // window semantics: ∃ occurrence pair with shifted
      // positions (pos − query ordinal) within slop=2 of each other
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(arr) AS term, unnest(range(1, len(arr)+1)) AS pos
         |  FROM (SELECT doc_id, $toksSql AS arr FROM documents)
         |)
         |SELECT DISTINCT a.doc_id AS doc_id FROM toks a JOIN toks b
         |  ON a.doc_id = b.doc_id AND abs((b.pos - 1) - a.pos) <= 2
         |WHERE a.term = 'sort' AND b.term = 'merge'
         |ORDER BY 1""".stripMargin,

    "ft_phrase_slop3" -> // 3-term window: some occurrence triple whose shifted
      // positions span at most slop=3
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(arr) AS term, unnest(range(1, len(arr)+1)) AS pos
         |  FROM (SELECT doc_id, $toksSql AS arr FROM documents)
         |)
         |SELECT DISTINCT a.doc_id AS doc_id FROM toks a
         |JOIN toks b ON a.doc_id = b.doc_id
         |JOIN toks c ON a.doc_id = c.doc_id
         |WHERE a.term = 'row' AND b.term = 'column' AND c.term = 'sort'
         |  AND greatest(a.pos, b.pos - 1, c.pos - 2) - least(a.pos, b.pos - 1, c.pos - 2) <= 3
         |ORDER BY 1""".stripMargin,

    "ft_phrase_slop_ord" -> // ordered: shifted gap in [0, slop]
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(arr) AS term, unnest(range(1, len(arr)+1)) AS pos
         |  FROM (SELECT doc_id, $toksSql AS arr FROM documents)
         |)
         |SELECT DISTINCT a.doc_id AS doc_id FROM toks a JOIN toks b
         |  ON a.doc_id = b.doc_id AND (b.pos - 1) - a.pos BETWEEN 0 AND 2
         |WHERE a.term = 'sort' AND b.term = 'merge'
         |ORDER BY 1""".stripMargin,

    "ft_phrase_slop3_ord" -> // 3-term non-decreasing shifted chain, span <= 3
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(arr) AS term, unnest(range(1, len(arr)+1)) AS pos
         |  FROM (SELECT doc_id, $toksSql AS arr FROM documents)
         |)
         |SELECT DISTINCT a.doc_id AS doc_id FROM toks a
         |JOIN toks b ON a.doc_id = b.doc_id
         |JOIN toks c ON a.doc_id = c.doc_id
         |WHERE a.term = 'row' AND b.term = 'column' AND c.term = 'sort'
         |  AND a.pos <= b.pos - 1 AND b.pos - 1 <= c.pos - 2
         |  AND (c.pos - 2) - a.pos <= 3
         |ORDER BY 1""".stripMargin,

    "ft_qs_compound" -> // sloppy-window pair AND any-token-within-2-edits
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(arr) AS term, unnest(range(1, len(arr)+1)) AS pos
         |  FROM (SELECT doc_id, $toksSql AS arr FROM documents)
         |), slop AS (
         |  SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
         |    ON a.doc_id = b.doc_id AND abs((b.pos - 1) - a.pos) <= 2
         |  WHERE a.term = 'sort' AND b.term = 'merge'
         |), fz AS (
         |  SELECT doc_id FROM documents
         |  WHERE len(list_filter($toksSql, t -> levenshtein(t, 'sport') <= 2)) > 0
         |)
         |SELECT doc_id FROM slop INTERSECT SELECT doc_id FROM fz ORDER BY doc_id""".stripMargin,

    "ft_count" ->
      s"""SELECT
         |  (SELECT count(*) FROM documents
         |   WHERE list_contains($toksSql, 'spark') AND list_contains($toksSql, 'join')) AS n_and,
         |  (SELECT count(*) FROM documents
         |   WHERE list_contains($toksSql, 'vector') OR list_contains($toksSql, 'window')) AS n_or,
         |  0::BIGINT AS n_unknown""".stripMargin,

    "ft_msm" ->
      s"""SELECT doc_id FROM documents
         |WHERE (list_contains($toksSql, 'spark')::INT + list_contains($toksSql, 'join')::INT
         |     + list_contains($toksSql, 'vector')::INT + list_contains($toksSql, 'window')::INT) >= 2
         |ORDER BY doc_id""".stripMargin,

    "ft_collapse" -> // best-scoring doc per source, groups ranked by that score
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join') GROUP BY doc_id, term),
         |scored AS (
         |  SELECT tf.doc_id,
         |    sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |      / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))) AS score
         |  FROM tf JOIN tc USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |  GROUP BY tf.doc_id)
         |SELECT s.doc_id, d.source, round(s.score, 6) AS score
         |FROM scored s JOIN documents d USING (doc_id)
         |QUALIFY row_number() OVER (PARTITION BY d.source ORDER BY s.score DESC, s.doc_id) = 1
         |ORDER BY score DESC, doc_id""".stripMargin,

    "ft_search_after" -> // page 2 of the 'spark join table' ranking: ranks 21-40
      // (rank-20/21 gap ~7e-4, rank-40/41 gap ~4.5e-3 at sf0.01 — orders
      // above the 1e-6 rounding grain, so the cursor boundary is float-safe)
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join','table') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join','table') GROUP BY doc_id, term),
         |scored AS (
         |  SELECT tf.doc_id,
         |    sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |      / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))) AS score
         |  FROM tf JOIN tc USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |  GROUP BY tf.doc_id)
         |SELECT doc_id, round(score, 6) AS score FROM scored
         |QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) BETWEEN 21 AND 40
         |ORDER BY score DESC, doc_id""".stripMargin,

    "ft_facet_hist" ->
      s"""SELECT (n_chars // 200) * 200 AS bucket, count(*) AS n_docs
         |FROM documents
         |WHERE list_contains($toksSql, 'spark') OR list_contains($toksSql, 'join')
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "ft_multifield" -> // per-field BM25 (text stats vs source stats), then
      // 1.0*text + 2.0*source; query 'spark src3' resolves per field
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','src3') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','src3') GROUP BY doc_id, term),
         |tscored AS (
         |  SELECT tf.doc_id,
         |    sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |      / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))) AS score
         |  FROM tf JOIN tc USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |  GROUP BY tf.doc_id),
         |sarr AS (SELECT doc_id,
         |    list_filter(string_split_regex(lower(source), '[^a-z0-9]+'), x -> x <> '') AS st
         |  FROM documents),
         |stok AS (SELECT doc_id, unnest(st) AS term FROM sarr),
         |stc AS (SELECT doc_id, len(st) AS token_count FROM sarr),
         |sstats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM stc),
         |sdf AS (SELECT term, count(DISTINCT doc_id) AS df FROM stok
         |        WHERE term IN ('spark','src3') GROUP BY term),
         |stf AS (SELECT doc_id, term, count(*) AS tf FROM stok
         |        WHERE term IN ('spark','src3') GROUP BY doc_id, term),
         |sscored AS (
         |  SELECT stf.doc_id,
         |    sum((ln(1 + (sstats.n - sdf.df + 0.5) / (sdf.df + 0.5)) * (stf.tf * 2.2))
         |      / (stf.tf + 1.2 * (0.25 + (0.75 * stc.token_count) / sstats.avgdl))) AS score
         |  FROM stf JOIN stc USING (doc_id) JOIN sdf USING (term) CROSS JOIN sstats
         |  GROUP BY stf.doc_id)
         |SELECT doc_id,
         |  round(coalesce(t.score, 0) * 1.0 + coalesce(s.score, 0) * 2.0, 6) AS score
         |FROM tscored t FULL OUTER JOIN sscored s USING (doc_id)
         |ORDER BY score DESC, doc_id""".stripMargin,

    "ft_funcscore" -> // BM25 × field-value factor ln(1 + n_chars)
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join') GROUP BY doc_id, term),
         |scored AS (
         |  SELECT tf.doc_id,
         |    sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |      / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))) AS score
         |  FROM tf JOIN tc USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |  GROUP BY tf.doc_id)
         |SELECT s.doc_id, round(s.score * ln(d.n_chars::DOUBLE + 1), 6) AS score
         |FROM scored s JOIN documents d USING (doc_id)
         |ORDER BY score DESC, doc_id""".stripMargin,

    "ft_dismax" -> // clauses ('spark join', 'vector window'), tie 0.3:
      // greatest(clause scores) + 0.3 * (sum - greatest)
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |qterms AS (SELECT * FROM (VALUES (0, 'spark'), (0, 'join'),
         |                                 (1, 'vector'), (1, 'window')) t(clause_id, term)),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join','vector','window') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join','vector','window') GROUP BY doc_id, term),
         |per_clause AS (
         |  SELECT qt.clause_id, tf.doc_id,
         |    sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |      / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))) AS cscore
         |  FROM tf JOIN qterms qt USING (term) JOIN tc USING (doc_id)
         |  JOIN df USING (term) CROSS JOIN stats
         |  GROUP BY qt.clause_id, tf.doc_id)
         |SELECT doc_id,
         |  round(max(cscore) + 0.3 * (sum(cscore) - max(cscore)), 6) AS score
         |FROM per_clause GROUP BY doc_id ORDER BY score DESC, doc_id""".stripMargin,

    "ft_filtered" -> // BM25 over the full corpus stats, results gated to lang=en
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join') GROUP BY doc_id, term),
         |scored AS (
         |  SELECT tf.doc_id,
         |    sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |      / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))) AS score
         |  FROM tf JOIN tc USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |  GROUP BY tf.doc_id)
         |SELECT s.doc_id, d.lang, round(s.score, 6) AS score
         |FROM scored s JOIN documents d USING (doc_id)
         |WHERE d.lang = 'en'
         |ORDER BY score DESC, doc_id""".stripMargin,

    "ft_facet_pctl" -> // quantile_cont == Spark percentile: both interpolate
      // at position f·(n-1) over the sorted matched values (DuckDB only
      // accepts CONSTANT fractions, hence the union of scalar aggregates)
      s"""WITH m AS (
         |  SELECT n_chars::DOUBLE AS v FROM documents
         |  WHERE list_contains($toksSql, 'spark') OR list_contains($toksSql, 'join')
         |)
         |SELECT 0.25::DOUBLE AS fraction, round(quantile_cont(v, 0.25), 6) AS value FROM m
         |UNION ALL SELECT 0.5::DOUBLE, round(quantile_cont(v, 0.5), 6) FROM m
         |UNION ALL SELECT 0.75::DOUBLE, round(quantile_cont(v, 0.75), 6) FROM m
         |UNION ALL SELECT 0.95::DOUBLE, round(quantile_cont(v, 0.95), 6) FROM m
         |ORDER BY fraction""".stripMargin,

    "ft_facet_stats" ->
      s"""SELECT count(*) AS n_docs,
         |  min(n_chars)::DOUBLE AS vmin, max(n_chars)::DOUBLE AS vmax,
         |  round(sum(n_chars)::DOUBLE, 6) AS vsum, round(avg(n_chars)::DOUBLE, 6) AS vavg
         |FROM documents
         |WHERE list_contains($toksSql, 'spark') OR list_contains($toksSql, 'join')""".stripMargin,

    "ft_dym" -> // dictionary spell correction, (distance asc, df desc, term)
      s"""WITH dt AS (
         |  SELECT DISTINCT doc_id, unnest($toksSql) AS term FROM documents
         |), dict AS (SELECT term, count(*) AS df FROM dt GROUP BY term)
         |SELECT term, df, levenshtein(term, 'sprak')::BIGINT AS distance
         |FROM dict
         |WHERE term <> 'sprak' AND levenshtein(term, 'sprak') <= 2
         |ORDER BY distance, df DESC, term LIMIT 5""".stripMargin,

    "ft_sigterms" -> // lift = (df_in/n_matched)/(df/N) over the AND-matched
      // set; exact integer divisions — engine-reproducible doubles
      s"""WITH dt AS (
         |  SELECT DISTINCT doc_id, unnest($toksSql) AS term FROM documents
         |), m AS (
         |  SELECT doc_id FROM documents
         |  WHERE list_contains($toksSql, 'spark') AND list_contains($toksSql, 'join')
         |), nm AS (SELECT count(*) AS n_matched FROM m),
         |n AS (SELECT count(*) AS n FROM documents),
         |gdf AS (SELECT term, count(*) AS df FROM dt GROUP BY term),
         |mdf AS (SELECT dt.term, count(*) AS df_in FROM dt JOIN m USING (doc_id) GROUP BY dt.term)
         |SELECT mdf.term, mdf.df_in, gdf.df,
         |  round((mdf.df_in::DOUBLE / nm.n_matched) / (gdf.df::DOUBLE / n.n), 6) AS lift
         |FROM mdf JOIN gdf USING (term) CROSS JOIN nm CROSS JOIN n
         |WHERE mdf.df_in >= 5
         |ORDER BY (mdf.df_in::DOUBLE / nm.n_matched) / (gdf.df::DOUBLE / n.n) DESC, term
         |LIMIT 15""".stripMargin,

    "ft_grouped" -> // has_child sum mode: per-source sum of member BM25 scores
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join') GROUP BY doc_id, term),
         |scored AS (
         |  SELECT tf.doc_id,
         |    sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |      / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))) AS score
         |  FROM tf JOIN tc USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |  GROUP BY tf.doc_id)
         |SELECT d.source, round(sum(s.score), 6) AS score, count(*) AS n_hits
         |FROM scored s JOIN documents d USING (doc_id)
         |GROUP BY d.source ORDER BY score DESC, source""".stripMargin,

    "ft_sortby" -> // first 50 AND-matched docs by (n_chars, doc_id)
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), m AS (
         |  SELECT doc_id FROM toks WHERE term IN ('spark','join')
         |  GROUP BY doc_id HAVING count(DISTINCT term) = 2
         |)
         |SELECT d.doc_id, d.n_chars FROM documents d JOIN m USING (doc_id)
         |ORDER BY n_chars, doc_id LIMIT 50""".stripMargin,

    "ft_cardinality" -> // distinct sources across the OR-matched set
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), m AS (
         |  SELECT DISTINCT doc_id FROM toks WHERE term IN ('spark','join')
         |)
         |SELECT count(DISTINCT d.source) AS n_distinct
         |FROM documents d JOIN m USING (doc_id)""".stripMargin,

    "ft_facet_date" -> // monthly date_histogram of a doc_id-derived timestamp
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), m AS (
         |  SELECT DISTINCT doc_id FROM toks WHERE term IN ('spark','join')
         |)
         |SELECT date_trunc('month',
         |    (DATE '2025-01-01' + (d.doc_id % 400)::INT)::TIMESTAMP
         |  )::TIMESTAMP AS bucket, -- DuckDB yields DATE at month grain; Spark yields TIMESTAMP
         |  count(*) AS n_docs
         |FROM documents d JOIN m USING (doc_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "ft_rescore" -> // retrieve by BM25('spark join'), re-rank the window with
      // 0.7 × BM25('join','table') for docs containing the exact phrase
      // "join table"; window covers the whole matched set (no float boundary)
      s"""WITH tp AS (
         |  SELECT doc_id, unnest(arr) AS term, unnest(range(1, len(arr)+1)) AS pos
         |  FROM (SELECT doc_id, $toksSql AS arr FROM documents)
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM tp GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tp
         |       WHERE term IN ('spark','join','table') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tp
         |       WHERE term IN ('spark','join','table') GROUP BY doc_id, term),
         |base AS (
         |  SELECT tf.doc_id,
         |    sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |      / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))) AS score
         |  FROM tf JOIN tc USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |  WHERE tf.term IN ('spark','join') GROUP BY tf.doc_id),
         |ph AS (
         |  SELECT DISTINCT a.doc_id FROM tp a JOIN tp b
         |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  WHERE a.term = 'join' AND b.term = 'table'),
         |resc AS (
         |  SELECT tf.doc_id,
         |    sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |      / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))) AS rscore
         |  FROM tf JOIN tc USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |  WHERE tf.term IN ('join','table')
         |    AND tf.doc_id IN (SELECT doc_id FROM ph)
         |    AND tf.doc_id IN (SELECT doc_id FROM base)
         |  GROUP BY tf.doc_id)
         |SELECT b.doc_id, round(b.score + 0.7 * coalesce(r.rscore, 0), 6) AS score
         |FROM base b LEFT JOIN resc r USING (doc_id)
         |ORDER BY score DESC, doc_id""".stripMargin,

    "ft_boost" -> // 'spark^2 OR join': spark's BM25 idf weight doubled
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join') GROUP BY doc_id, term)
         |SELECT tf.doc_id,
         |  round(sum((CASE WHEN tf.term = 'spark' THEN 2.0 ELSE 1.0 END)
         |    * (ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |    / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))), 6) AS score
         |FROM tf JOIN tc USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |GROUP BY tf.doc_id ORDER BY score DESC, doc_id""".stripMargin,

    "ft_tfidf" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |n AS (SELECT count(*) AS n FROM documents),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join') GROUP BY doc_id, term)
         |SELECT tf.doc_id,
         |  round(sum((tf.tf::DOUBLE / tc.token_count) * (log2(n.n::DOUBLE / (df.df + 1)) + 1)), 6) AS score
         |FROM tf JOIN tc USING (doc_id) JOIN df USING (term) CROSS JOIN n
         |GROUP BY tf.doc_id ORDER BY score DESC, doc_id""".stripMargin,

    "ft_bm25" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join') GROUP BY doc_id, term)
         |SELECT tf.doc_id,
         |  round(sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |    / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))), 6) AS score
         |FROM tf JOIN tc USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |GROUP BY tf.doc_id ORDER BY score DESC, doc_id""".stripMargin,

    "ft_bm25_batch" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |qterms AS (SELECT * FROM (VALUES (0, 'spark'), (0, 'join'),
         |                                 (1, 'vector'), (1, 'window')) t(q_id, term)),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join','vector','window') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join','vector','window') GROUP BY doc_id, term),
         |scored AS (
         |  SELECT qt.q_id, tf.doc_id,
         |    sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |      / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))) AS score
         |  FROM tf JOIN qterms qt USING (term) JOIN tc USING (doc_id)
         |  JOIN df USING (term) CROSS JOIN stats
         |  GROUP BY qt.q_id, tf.doc_id)
         |SELECT q_id, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank,
         |  doc_id, round(score, 6) AS score
         |FROM scored ORDER BY q_id, rank""".stripMargin,

    "ft_bm25_topk_wand" -> // EXHAUSTIVE top-20: the WAND lossless-pruning claim
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join','table') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join','table') GROUP BY doc_id, term),
         |scored AS (
         |  SELECT tf.doc_id,
         |    sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |      / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))) AS score
         |  FROM tf JOIN tc USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |  GROUP BY tf.doc_id)
         |SELECT doc_id, round(score, 6) AS score FROM scored
         |QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) <= 20
         |ORDER BY score DESC, doc_id""".stripMargin,

    "ft_context" -> // ±2-turn windows (conv = doc_id//10, turn = doc_id%10)
      // around the BM25 top-5 (quantized rank, doc_id tie-break)
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join') GROUP BY doc_id, term),
         |bm AS (
         |  SELECT tf.doc_id,
         |    round(sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |      / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))), 6) AS s
         |  FROM tf JOIN tc USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |  GROUP BY tf.doc_id),
         |hits AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
         |         FROM bm QUALIFY r <= 5)
         |SELECT h.doc_id AS hit_ord, d.doc_id,
         |  (d.doc_id % 10 - h.doc_id % 10)::INTEGER AS "offset"
         |FROM hits h JOIN documents d
         |  ON d.doc_id // 10 = h.doc_id // 10
         | AND abs(d.doc_id % 10 - h.doc_id % 10) <= 2
         |ORDER BY hit_ord, "offset"""".stripMargin,

    "ft_lmdirichlet" -> // query likelihood, Dirichlet μ=2000: per matched
      // term ln(1 + tf/(μ·cf/|C|)), plus |q∩d|·ln(μ/(dl+μ)) once per doc
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |ctot AS (SELECT count(*) AS c FROM toks),
         |cf AS (SELECT term, count(*) AS cf FROM toks
         |       WHERE term IN ('spark','join') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join') GROUP BY doc_id, term),
         |scored AS (
         |  SELECT tf.doc_id,
         |    sum(ln(1 + tf.tf::DOUBLE / (2000.0 * cf.cf / ctot.c)))
         |      + count(*) * ln(2000.0 / (tc.token_count + 2000.0)) AS score
         |  FROM tf JOIN tc USING (doc_id) JOIN cf USING (term) CROSS JOIN ctot
         |  GROUP BY tf.doc_id, tc.token_count)
         |SELECT doc_id, round(score, 6) AS score FROM scored
         |ORDER BY score DESC, doc_id""".stripMargin,

    "ft_boosting" -> // BM25('spark','join'), x0.5 where the doc contains 'window'
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join') GROUP BY doc_id, term),
         |neg AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'window'),
         |base AS (
         |  SELECT tf.doc_id,
         |    sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |      / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))) AS score
         |  FROM tf JOIN tc USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |  GROUP BY tf.doc_id)
         |SELECT b.doc_id,
         |  round(CASE WHEN n.doc_id IS NULL THEN b.score ELSE b.score * 0.5 END, 6) AS score
         |FROM base b LEFT JOIN neg n USING (doc_id)
         |ORDER BY score DESC, doc_id""".stripMargin,

    "ft_phrase_prefix" -> // 'the' adjacent to any dictionary term LIKE 's%'
      // (expansion capped at the same 128 / df-desc rule; the cap never
      // binds at this vocab)
      s"""WITH tp AS (
         |  SELECT doc_id, unnest(arr) AS term, unnest(range(1, len(arr)+1)) AS pos
         |  FROM (SELECT doc_id, $toksSql AS arr FROM documents)
         |), vocab AS (SELECT term, count(DISTINCT doc_id) AS df FROM tp GROUP BY term),
         |exp AS (SELECT term FROM vocab WHERE term LIKE 's%'
         |        ORDER BY df DESC, term LIMIT 128),
         |m AS (SELECT DISTINCT a.doc_id FROM tp a JOIN tp b
         |        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |      WHERE a.term = 'the' AND b.term IN (SELECT term FROM exp))
         |SELECT doc_id FROM m ORDER BY doc_id""".stripMargin,

    "ft_federated" -> // the MONOLITHIC BM25 SQL: federated slices with merged
      // global stats must reproduce single-index scores exactly
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join') GROUP BY doc_id, term)
         |SELECT tf.doc_id,
         |  round(sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |    / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))), 6) AS score
         |FROM tf JOIN tc USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |GROUP BY tf.doc_id ORDER BY score DESC, doc_id""".stripMargin,

    "ft_federated_wand" -> // monolithic EXHAUSTIVE top-20: federated per-slice
      // WAND with global weights is lossless
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join','table') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join','table') GROUP BY doc_id, term),
         |scored AS (
         |  SELECT tf.doc_id,
         |    sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |      / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))) AS score
         |  FROM tf JOIN tc USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |  GROUP BY tf.doc_id)
         |SELECT doc_id, round(score, 6) AS score FROM scored
         |QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) <= 20
         |ORDER BY score DESC, doc_id""".stripMargin,

    "ft_federated_fuzzy" -> // MONOLITHIC ranked fuzzy: expansion derived
      // from the corpus-wide vocabulary (levenshtein<=2, global-df-desc cap
      // — under the 128 cap at this 31-term vocab), TF-IDF with global df/N
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |n AS (SELECT count(*) AS n FROM documents),
         |vocab AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
         |exp AS (SELECT term FROM vocab WHERE levenshtein(term, 'sport') <= 2
         |        ORDER BY df DESC, term LIMIT 128),
         |df AS (SELECT term, df FROM vocab WHERE term IN (SELECT term FROM exp)),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN (SELECT term FROM exp) GROUP BY doc_id, term)
         |SELECT tf.doc_id,
         |  round(sum((tf.tf::DOUBLE / tc.token_count) * (log2(n.n::DOUBLE / (df.df + 1)) + 1)), 6) AS score
         |FROM tf JOIN tc USING (doc_id) JOIN df USING (term) CROSS JOIN n
         |GROUP BY tf.doc_id ORDER BY score DESC, doc_id""".stripMargin,

    "ft_federated_prefix" -> // 6 's'-prefix terms at this vocab — under the
      // 128 cap, so the unranked OR-match is exactly "any token matches"
      s"""SELECT doc_id FROM documents
         |WHERE len(list_filter($toksSql, t -> t LIKE 's%')) > 0
         |ORDER BY doc_id""".stripMargin,

    "ft_federated_suggest" -> // corpus-wide completion frequencies
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |)
         |SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |WHERE term LIKE 's%' GROUP BY term
         |ORDER BY df DESC, term LIMIT 10""".stripMargin,

    "ft_federated_dym" -> // MONOLITHIC spell correction: corpus-wide df,
      // (distance asc, df desc, term asc) — the exact ft_dym ranking the
      // federated merge must reproduce
      s"""WITH dt AS (
         |  SELECT DISTINCT doc_id, unnest($toksSql) AS term FROM documents
         |), dict AS (SELECT term, count(*) AS df FROM dt GROUP BY term)
         |SELECT term, df, levenshtein(term, 'sprak')::BIGINT AS distance
         |FROM dict
         |WHERE term <> 'sprak' AND levenshtein(term, 'sprak') <= 2
         |ORDER BY distance, df DESC, term LIMIT 5""".stripMargin,

    "ft_federated_bool" -> // MONOLITHIC tree membership over the union corpus
      s"""SELECT doc_id FROM documents
         |WHERE (list_contains($toksSql, 'spark') AND list_contains($toksSql, 'join'))
         |   OR (list_contains($toksSql, 'group') AND NOT list_contains($toksSql, 'window'))
         |ORDER BY doc_id""".stripMargin,

    "ft_federated_bool_ranked" -> // MONOLITHIC ranked tree (corpus-global
      // df/N/avgdl) — the exact ft_bool_ranked scores the federated
      // global-df injection must reproduce
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join') GROUP BY doc_id, term),
         |matched AS (
         |  SELECT doc_id FROM documents
         |  WHERE (list_contains($toksSql, 'spark') OR list_contains($toksSql, 'join'))
         |    AND NOT list_contains($toksSql, 'window'))
         |SELECT tf.doc_id,
         |  round(sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |    / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))), 6) AS score
         |FROM tf JOIN matched USING (doc_id) JOIN tc USING (doc_id)
         |JOIN df USING (term) CROSS JOIN stats
         |GROUP BY tf.doc_id ORDER BY score DESC, doc_id""".stripMargin,

    "ft_federated_collapse" -> // MONOLITHIC best-doc-per-source ranking —
      // the exact ft_collapse list the federated re-collapse must reproduce
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join') GROUP BY doc_id, term),
         |scored AS (
         |  SELECT tf.doc_id,
         |    sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |      / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))) AS score
         |  FROM tf JOIN tc USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |  GROUP BY tf.doc_id)
         |SELECT s.doc_id, d.source, round(s.score, 6) AS score
         |FROM scored s JOIN documents d USING (doc_id)
         |QUALIFY row_number() OVER (PARTITION BY d.source ORDER BY s.score DESC, s.doc_id) = 1
         |ORDER BY score DESC, doc_id""".stripMargin,

    "ft_federated_cardinality" -> // distinct sources over the union corpus
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), m AS (
         |  SELECT DISTINCT doc_id FROM toks WHERE term IN ('spark','join')
         |)
         |SELECT count(DISTINCT d.source) AS n_distinct
         |FROM documents d JOIN m USING (doc_id)""".stripMargin,

    "ft_federated_dismax" -> // MONOLITHIC dis_max — clauses ('spark join', 'vector window'), tie 0.3:
      // greatest(clause scores) + 0.3 * (sum - greatest)
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |qterms AS (SELECT * FROM (VALUES (0, 'spark'), (0, 'join'),
         |                                 (1, 'vector'), (1, 'window')) t(clause_id, term)),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join','vector','window') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join','vector','window') GROUP BY doc_id, term),
         |per_clause AS (
         |  SELECT qt.clause_id, tf.doc_id,
         |    sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |      / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))) AS cscore
         |  FROM tf JOIN qterms qt USING (term) JOIN tc USING (doc_id)
         |  JOIN df USING (term) CROSS JOIN stats
         |  GROUP BY qt.clause_id, tf.doc_id)
         |SELECT doc_id,
         |  round(max(cscore) + 0.3 * (sum(cscore) - max(cscore)), 6) AS score
         |FROM per_clause GROUP BY doc_id ORDER BY score DESC, doc_id""".stripMargin,

    "ft_federated_lm" -> // MONOLITHIC query likelihood, Dirichlet μ=2000: per matched
      // term ln(1 + tf/(μ·cf/|C|)), plus |q∩d|·ln(μ/(dl+μ)) once per doc
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |ctot AS (SELECT count(*) AS c FROM toks),
         |cf AS (SELECT term, count(*) AS cf FROM toks
         |       WHERE term IN ('spark','join') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join') GROUP BY doc_id, term),
         |scored AS (
         |  SELECT tf.doc_id,
         |    sum(ln(1 + tf.tf::DOUBLE / (2000.0 * cf.cf / ctot.c)))
         |      + count(*) * ln(2000.0 / (tc.token_count + 2000.0)) AS score
         |  FROM tf JOIN tc USING (doc_id) JOIN cf USING (term) CROSS JOIN ctot
         |  GROUP BY tf.doc_id, tc.token_count)
         |SELECT doc_id, round(score, 6) AS score FROM scored
         |ORDER BY score DESC, doc_id""".stripMargin,

    "ft_federated_sigterms" -> // MONOLITHIC significant_terms over the
      // union corpus — the exact ft_sigterms list the federated merge must
      // reproduce (lift from corpus-wide df/N and the full matched set)
      s"""WITH dt AS (
         |  SELECT DISTINCT doc_id, unnest($toksSql) AS term FROM documents
         |), m AS (
         |  SELECT doc_id FROM documents
         |  WHERE list_contains($toksSql, 'spark') AND list_contains($toksSql, 'join')
         |), nm AS (SELECT count(*) AS n_matched FROM m),
         |n AS (SELECT count(*) AS n FROM documents),
         |gdf AS (SELECT term, count(*) AS df FROM dt GROUP BY term),
         |mdf AS (SELECT dt.term, count(*) AS df_in FROM dt JOIN m USING (doc_id) GROUP BY dt.term)
         |SELECT mdf.term, mdf.df_in, gdf.df,
         |  round((mdf.df_in::DOUBLE / nm.n_matched) / (gdf.df::DOUBLE / n.n), 6) AS lift
         |FROM mdf JOIN gdf USING (term) CROSS JOIN nm CROSS JOIN n
         |WHERE mdf.df_in >= 5
         |ORDER BY (mdf.df_in::DOUBLE / nm.n_matched) / (gdf.df::DOUBLE / n.n) DESC, term
         |LIMIT 15""".stripMargin,

    "ft_bm25_batch_wand" -> // exhaustive batch top-20 == the batch WAND plan
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |qterms AS (SELECT * FROM (VALUES (0, 'spark'), (0, 'join'),
         |                                 (1, 'vector'), (1, 'window')) t(q_id, term)),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join','vector','window') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join','vector','window') GROUP BY doc_id, term),
         |scored AS (
         |  SELECT qt.q_id, tf.doc_id,
         |    sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |      / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))) AS score
         |  FROM tf JOIN qterms qt USING (term) JOIN tc USING (doc_id)
         |  JOIN df USING (term) CROSS JOIN stats
         |  GROUP BY qt.q_id, tf.doc_id)
         |SELECT q_id, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank,
         |  doc_id, round(score, 6) AS score
         |FROM scored QUALIFY rank <= 20 ORDER BY q_id, rank""".stripMargin,

    "ft_ngram3" ->
      "SELECT doc_id FROM documents WHERE contains(lower(text), 'spa') ORDER BY doc_id",

    "ft_synonym" ->
      s"""SELECT doc_id, len(mapped)::BIGINT AS n_toks,
         |  md5(array_to_string(mapped, ' ')) AS fp
         |FROM (SELECT doc_id, list_transform($toksSql,
         |        t -> CASE WHEN t = 'join' THEN 'merge'
         |                  WHEN t = 'group' THEN 'agg' ELSE t END) AS mapped
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "ft_asciifold" -> // folding the synthesized accents must restore the
      // PLAIN analyzed stream, so the oracle is the unmodified tokenization
      s"""SELECT doc_id, len($toksSql)::BIGINT AS n_toks,
         |  md5(array_to_string($toksSql, ' ')) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "ft_shingle" -> // adjacent-pair shingles of the normalized stream
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(arr) < 2 THEN [] ELSE
         |      list_transform(range(1, len(arr)), i -> array_to_string(arr[i:i+1], ' '))
         |    END AS sh
         |  FROM (SELECT doc_id, $toksSql AS arr FROM documents)
         |)
         |SELECT doc_id, len(sh)::BIGINT AS n_toks,
         |  md5(array_to_string(sh, '|')) AS fp
         |FROM sh ORDER BY doc_id""".stripMargin,

    "ft_lenfilter" ->
      s"""SELECT doc_id,
         |  len(list_filter($toksSql, t -> len(t) BETWEEN 3 AND 8))::BIGINT AS n_kept,
         |  md5(array_to_string(list_filter($toksSql, t -> len(t) BETWEEN 3 AND 8), ' ')) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "ft_stopword" ->
      s"""SELECT doc_id,
         |  len(list_filter($toksSql, t -> t NOT IN ('the','a')))::BIGINT AS n_kept,
         |  md5(array_to_string(list_filter($toksSql, t -> t NOT IN ('the','a')), ' ')) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "ft_charfilter" -> // char filter runs on raw text BEFORE tokenize/lowercase
      s"""SELECT doc_id,
         |  md5(array_to_string(
         |    list_filter(string_split_regex(lower(replace(text, 'sl', 'qu')), '[^a-z0-9]+'), x -> x <> ''),
         |    ' ')) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "ft_stemmer" -> // golden Porter2 stems of the corpus vocabulary (31 terms,
      // 5 non-identity), derived from the published Snowball English algorithm
      s"""SELECT doc_id,
         |  md5(array_to_string(list_transform($toksSql, t ->
         |    CASE t WHEN 'customer' THEN 'custom' WHEN 'merge' THEN 'merg'
         |           WHEN 'query' THEN 'queri' WHEN 'table' THEN 'tabl'
         |           WHEN 'value' THEN 'valu' ELSE t END), ' ')) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "ft_phrase_ranked" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(arr) AS term, unnest(range(1, len(arr)+1)) AS pos
         |  FROM (SELECT doc_id, $toksSql AS arr FROM documents)
         |), matched AS (
         |  SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
         |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  WHERE a.term = 'batch' AND b.term = 'batch'
         |), tc AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |n AS (SELECT count(*) AS n FROM documents),
         |df AS (SELECT count(DISTINCT doc_id) AS df FROM toks WHERE term = 'batch'),
         |tf AS (SELECT doc_id, count(*) AS tf FROM toks WHERE term = 'batch' GROUP BY doc_id)
         |SELECT m.doc_id,
         |  round((tf.tf::DOUBLE / tc.token_count) * (log2(n.n::DOUBLE / (df.df + 1)) + 1), 6) AS score
         |FROM matched m JOIN tf USING (doc_id) JOIN tc USING (doc_id) CROSS JOIN n CROSS JOIN df
         |ORDER BY score DESC, doc_id""".stripMargin,

    "ft_prefix" ->
      s"""SELECT doc_id FROM documents
         |WHERE len(list_filter($toksSql, t -> t LIKE 's%')) > 0
         |ORDER BY doc_id""".stripMargin,

    "ft_wildcard" ->
      s"""SELECT doc_id FROM documents
         |WHERE len(list_filter($toksSql, t -> regexp_matches(t, '^.*a.*e.*$$'))) > 0
         |ORDER BY doc_id""".stripMargin,

    "ft_fuzzy" -> // edit distance <= 2 implies |len diff| <= 2, so the
      // implementation's length-window prefilter cannot change the set
      s"""SELECT doc_id FROM documents
         |WHERE len(list_filter($toksSql, t -> levenshtein(t, 'sport') <= 2)) > 0
         |ORDER BY doc_id""".stripMargin,

    "ft_regexp" ->
      s"""SELECT doc_id FROM documents
         |WHERE len(list_filter($toksSql, t -> regexp_matches(t, '^(?:s.*k|j.+n)$$'))) > 0
         |ORDER BY doc_id""".stripMargin,

    "ft_termrange" ->
      s"""SELECT doc_id FROM documents
         |WHERE len(list_filter($toksSql, t -> t >= 'so' AND t <= 'sz')) > 0
         |ORDER BY doc_id""".stripMargin,

    "ft_bool" ->
      s"""SELECT doc_id FROM documents
         |WHERE (list_contains($toksSql, 'spark') AND list_contains($toksSql, 'join'))
         |   OR (list_contains($toksSql, 'group') AND NOT list_contains($toksSql, 'window'))
         |ORDER BY doc_id""".stripMargin,

    "ft_bool_not" ->
      s"""SELECT doc_id FROM documents
         |WHERE NOT list_contains($toksSql, 'spark')
         |ORDER BY doc_id""".stripMargin,

    "ft_bool_phrase" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(arr) AS term, unnest(range(1, len(arr)+1)) AS pos
         |  FROM (SELECT doc_id, $toksSql AS arr FROM documents)
         |), ph AS (
         |  SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
         |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  WHERE a.term = 'batch' AND b.term = 'batch'
         |)
         |SELECT doc_id FROM documents
         |WHERE doc_id IN (SELECT doc_id FROM ph)
         |  AND NOT list_contains($toksSql, 'window')
         |ORDER BY doc_id""".stripMargin,

    "ft_facets" ->
      s"""SELECT source, count(*) AS n_docs FROM documents
         |WHERE list_contains($toksSql, 'spark') OR list_contains($toksSql, 'join')
         |GROUP BY source ORDER BY source""".stripMargin,

    "ft_highlight" ->
      s"""SELECT doc_id,
         |  array_to_string(list_sort(list_distinct(
         |    list_filter($toksSql, t -> t IN ('spark','join','vector')))), ' ') AS hit_terms
         |FROM documents
         |WHERE len(list_filter($toksSql, t -> t IN ('spark','join','vector'))) > 0
         |ORDER BY doc_id""".stripMargin,

    "ft_snippet" -> // window [p-2, p+2], both bounds clamped; DuckDB slices
      // are 1-based inclusive and clamp the end like Spark's slice
      s"""WITH m AS (
         |  SELECT doc_id, arr, list_position(arr, 'vector') AS lp
         |  FROM (SELECT doc_id, $toksSql AS arr FROM documents)
         |)
         |SELECT doc_id, (lp - 1)::BIGINT AS first_pos,
         |  array_to_string(arr[greatest(lp - 2, 1) : lp + 2], ' ') AS snippet
         |FROM m WHERE lp > 0 ORDER BY doc_id""".stripMargin,

    "ft_mlt" -> // term selection: doc 42's top-5 terms by tf * tfidf-weight
      // (ties term asc) over GLOBAL df; then corpus BM25 over those terms,
      // doc 42 excluded — mirrors Searcher.moreLikeThis exactly
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |dfall AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
         |src AS (SELECT term, count(*) AS tf FROM toks WHERE doc_id = 42 GROUP BY term),
         |sel AS (SELECT s.term FROM src s JOIN dfall USING (term) CROSS JOIN stats
         |        ORDER BY s.tf * (log2(stats.n::DOUBLE / (dfall.df + 1)) + 1) DESC, s.term ASC
         |        LIMIT 5),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN (SELECT term FROM sel) GROUP BY doc_id, term)
         |SELECT tf.doc_id,
         |  round(sum((ln(1 + (stats.n - dfall.df + 0.5) / (dfall.df + 0.5)) * (tf.tf * 2.2))
         |    / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))), 6) AS score
         |FROM tf JOIN tc USING (doc_id) JOIN dfall USING (term) CROSS JOIN stats
         |WHERE tf.doc_id <> 42
         |GROUP BY tf.doc_id ORDER BY score DESC, doc_id""".stripMargin,

    "ft_suggest" ->
      s"""SELECT term, count(DISTINCT doc_id) AS df
         |FROM (SELECT doc_id, unnest($toksSql) AS term FROM documents)
         |WHERE term LIKE 's%'
         |GROUP BY term ORDER BY df DESC, term ASC LIMIT 10""".stripMargin,

    "ft_termvectors" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(arr) AS term, unnest(range(0, len(arr))) AS pos
         |  FROM (SELECT doc_id, $toksSql AS arr FROM documents)
         |)
         |SELECT term, count(*) AS tf,
         |  array_to_string(list_sort(list(pos)), ',') AS positions
         |FROM toks WHERE doc_id = 42
         |GROUP BY term ORDER BY term""".stripMargin,

    "ft_explain" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join','table') GROUP BY term),
         |tf AS (SELECT term, count(*) AS tf FROM toks
         |       WHERE doc_id = 42 AND term IN ('spark','join','table') GROUP BY term)
         |SELECT tf.term, tf.tf, df.df,
         |  round(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)), 6) AS idf,
         |  round((tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl)), 6) AS tf_factor,
         |  round(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
         |    * ((tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))), 6) AS contribution
         |FROM tf JOIN df USING (term) CROSS JOIN stats
         |JOIN tc ON tc.doc_id = 42
         |ORDER BY term""".stripMargin,

    "ft_querystring" ->
      s"""SELECT doc_id FROM documents
         |WHERE list_contains($toksSql, 'spark')
         |  AND (list_contains($toksSql, 'join') OR list_contains($toksSql, 'merge'))
         |  AND NOT list_contains($toksSql, 'window')
         |ORDER BY doc_id""".stripMargin,

    "ft_bool_ranked" -> // BM25 over the positive terms {spark, join} with the
      // tree as the row filter; df/N/avgdl are corpus-global like the index's
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join') GROUP BY doc_id, term),
         |matched AS (
         |  SELECT doc_id FROM documents
         |  WHERE (list_contains($toksSql, 'spark') OR list_contains($toksSql, 'join'))
         |    AND NOT list_contains($toksSql, 'window'))
         |SELECT tf.doc_id,
         |  round(sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |    / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))), 6) AS score
         |FROM tf JOIN matched USING (doc_id) JOIN tc USING (doc_id)
         |JOIN df USING (term) CROSS JOIN stats
         |GROUP BY tf.doc_id ORDER BY score DESC, doc_id""".stripMargin,

    "ft_percolate" ->
      s"""SELECT doc_id, 0::BIGINT AS q_id FROM documents
         |WHERE list_contains($toksSql, 'spark') AND list_contains($toksSql, 'join')
         |UNION ALL
         |SELECT doc_id, 1::BIGINT FROM documents
         |WHERE list_contains($toksSql, 'vector') OR list_contains($toksSql, 'window')
         |UNION ALL
         |SELECT doc_id, 2::BIGINT FROM documents
         |WHERE list_contains($toksSql, 'batch') AND list_contains($toksSql, 'stream')
         |  AND list_contains($toksSql, 'group')
         |ORDER BY doc_id, q_id""".stripMargin,

    "ft_percolate_bool" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(arr) AS term, unnest(range(1, len(arr)+1)) AS pos
         |  FROM (SELECT doc_id, $toksSql AS arr FROM documents)
         |), ph AS (
         |  SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
         |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  WHERE a.term = 'batch' AND b.term = 'batch'
         |)
         |SELECT doc_id, 0::BIGINT AS q_id FROM documents
         |WHERE (list_contains($toksSql, 'spark') AND list_contains($toksSql, 'join'))
         |   OR (list_contains($toksSql, 'group') AND NOT list_contains($toksSql, 'window'))
         |UNION ALL
         |SELECT doc_id, 1::BIGINT FROM documents
         |WHERE doc_id IN (SELECT doc_id FROM ph)
         |  AND NOT list_contains($toksSql, 'window')
         |ORDER BY doc_id, q_id""".stripMargin,

    "dedup_keep_one" ->
      s"""WITH sh AS (
         |  SELECT doc_id, source,
         |    CASE WHEN len(arr) < 3 THEN [] ELSE
         |      list_transform(range(1, len(arr) - 1), i -> array_to_string(arr[i:i+2], ' '))
         |    END AS sh
         |  FROM (SELECT doc_id, source, $toksSql AS arr FROM documents)
         |), dropped AS (
         |  SELECT DISTINCT b.doc_id FROM sh a JOIN sh b
         |    ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE round(CASE WHEN len(list_distinct(a.sh || b.sh)) = 0 THEN 0.0
         |    ELSE len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(a.sh || b.sh)) END, 6) >= 0.05
         |)
         |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
         |ORDER BY doc_id""".stripMargin,

    "dedup_cc" -> // transitive closure of the jaccard-pair graph via a
      // recursive CTE (reachability UNION dedups -> terminates), then
      // component = LEAST(self, min reachable); singletons label themselves
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, source,
         |    CASE WHEN len(arr) < 3 THEN [] ELSE
         |      list_transform(range(1, len(arr) - 1), i -> array_to_string(arr[i:i+2], ' '))
         |    END AS sh
         |  FROM (SELECT doc_id, source, $toksSql AS arr FROM documents)
         |), p AS (
         |  SELECT a.doc_id AS ia, b.doc_id AS ib FROM sh a JOIN sh b
         |    ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE round(CASE WHEN len(list_distinct(a.sh || b.sh)) = 0 THEN 0.0
         |    ELSE len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(a.sh || b.sh)) END, 6) >= 0.01
         |), sym AS (
         |  SELECT ia AS u, ib AS v FROM p UNION SELECT ib, ia FROM p
         |), reach(u, v) AS (
         |  SELECT u, v FROM sym
         |  UNION
         |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
         |), comp AS (
         |  SELECT u AS doc_id, LEAST(u, MIN(v)) AS comp FROM reach GROUP BY u
         |)
         |SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS comp
         |FROM documents d LEFT JOIN comp c USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      s"""SELECT min(doc_id) AS keep_id, count(*) AS dup_cnt FROM documents
         |GROUP BY array_to_string($toksSql, ' ') ORDER BY keep_id""".stripMargin,

    "dedup_jaccard" ->
      s"""WITH sh AS (
         |  SELECT doc_id, source,
         |    CASE WHEN len(arr) < 3 THEN [] ELSE
         |      list_transform(range(1, len(arr) - 1), i -> array_to_string(arr[i:i+2], ' '))
         |    END AS sh
         |  FROM (SELECT doc_id, source, $toksSql AS arr FROM documents)
         |)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(CASE WHEN len(list_distinct(a.sh || b.sh)) = 0 THEN 0.0
         |    ELSE len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(a.sh || b.sh)) END, 6) AS jaccard
         |FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE round(CASE WHEN len(list_distinct(a.sh || b.sh)) = 0 THEN 0.0
         |    ELSE len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(a.sh || b.sh)) END, 6) >= 0.05
         |ORDER BY id_a, id_b""".stripMargin,

    "sim_cosine_pairs" ->
      s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
         |pairs AS (
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(list_sum(list_transform(range(1, len(a.embedding)+1),
         |          i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
         |    / (sqrt(list_sum(list_transform(range(1, len(a.embedding)+1),
         |          i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
         |     * sqrt(list_sum(list_transform(range(1, len(b.embedding)+1),
         |          i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))), 6) AS cosine
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT * FROM pairs WHERE cosine >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,

    "ann_ivf_topk" -> // nprobe == nlist: IVF degenerates to exact search
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.q_id, e.vec_id AS id,
         |    round(list_sum(list_transform(range(1, len(e.embedding)+1),
         |            i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE))
         |      / (sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
         |            i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
         |       * sqrt(list_sum(list_transform(range(1, len(q.qe)+1),
         |            i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE)))), 6) AS cosine
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id
         |)
         |SELECT q_id, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, id) AS rank, id, cosine
         |FROM scored QUALIFY rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "ann_filtered" -> // ES kNN pre-filter: rank only label==1 vectors
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.q_id, e.vec_id AS id,
         |    round(${cosineSql("e.embedding", "q.qe")}, 6) AS cosine
         |  FROM embeddings e CROSS JOIN q
         |  WHERE e.vec_id <> q.q_id AND e.label = 1
         |)
         |SELECT q_id, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, id) AS rank, id, cosine
         |FROM scored QUALIFY rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "hyb_rrf" -> // RRF fusion: BM25 ranks (quantized to 6 digits, doc_id
      // tie-break, top 50) + cosine-vs-doc-7 ranks (same quantization),
      // fused as sum(1/(60+rank)) — two-term double sums, order-exact
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tc0 AS (SELECT doc_id, count(*) AS token_count FROM toks GROUP BY doc_id),
         |tc AS (SELECT d.doc_id, coalesce(tc0.token_count, 0) AS token_count
         |       FROM documents d LEFT JOIN tc0 USING (doc_id)),
         |stats AS (SELECT count(*) AS n, avg(token_count::DOUBLE) AS avgdl FROM tc),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark','join') GROUP BY doc_id, term),
         |bm AS (
         |  SELECT tf.doc_id,
         |    round(sum((ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2))
         |      / (tf.tf + 1.2 * (0.25 + (0.75 * tc.token_count) / stats.avgdl))), 6) AS s
         |  FROM tf JOIN tc USING (doc_id) JOIN df USING (term) CROSS JOIN stats
         |  GROUP BY tf.doc_id),
         |bmr AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
         |        FROM bm QUALIFY r <= 50),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7),
         |cos AS (SELECT e.vec_id AS doc_id,
         |          round(${cosineSql("e.embedding", "q.qe")}, 6) AS s
         |        FROM embeddings e CROSS JOIN q),
         |vr AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
         |       FROM cos QUALIFY r <= 50),
         |fused AS (SELECT doc_id, sum(1.0 / (60 + r)) AS score
         |          FROM (SELECT * FROM bmr UNION ALL SELECT * FROM vr)
         |          GROUP BY doc_id)
         |SELECT doc_id, round(score, 9) AS score FROM fused
         |QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) <= 20
         |ORDER BY score DESC, doc_id""".stripMargin,

    "ann_brute_topk" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.q_id, e.vec_id AS id,
         |    round(list_sum(list_transform(range(1, len(e.embedding)+1),
         |            i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE))
         |      / (sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
         |            i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
         |       * sqrt(list_sum(list_transform(range(1, len(q.qe)+1),
         |            i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE)))), 6) AS cosine
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id
         |)
         |SELECT q_id, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, id) AS rank, id, cosine
         |FROM scored QUALIFY rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "ann_centroid_outliers" -> // per-position mean over the corpus, then
      // cosine of each vector to that centroid; flag below 0.5 computed on
      // the UNROUNDED cosine exactly like the Spark column
      """WITH pos AS (
        |  SELECT unnest(range(1, len(embedding) + 1)) AS i, embedding
        |  FROM embeddings),
        |c AS (SELECT i, avg(embedding[i]::DOUBLE) AS m FROM pos GROUP BY i),
        |cent AS (SELECT list(m ORDER BY i) AS ce FROM c),
        |scored AS (
        |  SELECT e.vec_id,
        |    list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> e.embedding[i]::DOUBLE * ce[i]))
        |    / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
        |     * sqrt(list_sum(list_transform(range(1, len(ce) + 1),
        |        i -> ce[i] * ce[i])))) AS cosu
        |  FROM embeddings e CROSS JOIN cent)
        |SELECT vec_id, round(cosu, 6) AS centroid_cosine,
        |  (CASE WHEN cosu < 0.5 THEN 1 ELSE 0 END)::BIGINT AS is_outlier
        |FROM scored ORDER BY vec_id""".stripMargin,

    "text_tokcount" ->
      s"SELECT doc_id, len($toksSql)::BIGINT AS n_tokens FROM documents ORDER BY doc_id",

    "pl_sample" ->
      s"""SELECT doc_id FROM ${plBucketSql("doc_id", "s1")}
         |WHERE b < 250000 ORDER BY doc_id""".stripMargin,

    "pl_clean_e2e" -> // the whole cleaning chain in ONE query: keep-one
      // near-dup dedup + Gopher-signal quality cut + exact n-gram
      // decontamination (train slice only) + 50% portable hash sample
      s"""WITH sh AS (
         |  SELECT doc_id, source,
         |    CASE WHEN len(arr) < 3 THEN [] ELSE
         |      list_transform(range(1, len(arr) - 1), i -> array_to_string(arr[i:i+2], ' '))
         |    END AS sh
         |  FROM (SELECT doc_id, source, $toksSql AS arr FROM documents)
         |), dropped AS (
         |  SELECT DISTINCT b.doc_id FROM sh a JOIN sh b
         |    ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE round(CASE WHEN len(list_distinct(a.sh || b.sh)) = 0 THEN 0.0
         |    ELSE len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(a.sh || b.sh)) END, 6) >= 0.05
         |), q AS (
         |  SELECT doc_id,
         |    len(words)::BIGINT AS n_words,
         |    round(CASE WHEN len(words) > 0 THEN
         |      len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE / len(words)
         |      ELSE 0.0 END, 6) AS awr,
         |    (CASE WHEN list_contains(list_transform(words, x -> lower(x)), 'the') THEN 1 ELSE 0 END
         |     + CASE WHEN list_contains(list_transform(words, x -> lower(x)), 'be') THEN 1 ELSE 0 END
         |     + CASE WHEN list_contains(list_transform(words, x -> lower(x)), 'to') THEN 1 ELSE 0 END
         |     + CASE WHEN list_contains(list_transform(words, x -> lower(x)), 'of') THEN 1 ELSE 0 END
         |     + CASE WHEN list_contains(list_transform(words, x -> lower(x)), 'and') THEN 1 ELSE 0 END
         |     + CASE WHEN list_contains(list_transform(words, x -> lower(x)), 'that') THEN 1 ELSE 0 END
         |     + CASE WHEN list_contains(list_transform(words, x -> lower(x)), 'have') THEN 1 ELSE 0 END
         |     + CASE WHEN list_contains(list_transform(words, x -> lower(x)), 'with') THEN 1 ELSE 0 END
         |    )::BIGINT AS nsk
         |  FROM (SELECT doc_id,
         |          list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS words
         |        FROM documents)
         |), evw AS (
         |  SELECT DISTINCT ${portable60Sql("w")} AS h FROM (
         |    SELECT unnest(CASE WHEN len(arr) < 5 THEN [] ELSE
         |      list_transform(range(1, len(arr) - 3), i -> array_to_string(arr[i:i+4], ' ')) END) AS w
         |    FROM (SELECT $toksSql AS arr FROM documents WHERE doc_id % 5 = 0))
         |), tw AS (
         |  SELECT doc_id, ${portable60Sql("w")} AS h FROM (
         |    SELECT doc_id, unnest(CASE WHEN len(arr) < 5 THEN [] ELSE
         |      list_transform(range(1, len(arr) - 3), i -> array_to_string(arr[i:i+4], ' ')) END) AS w
         |    FROM (SELECT doc_id, $toksSql AS arr FROM documents WHERE doc_id % 5 <> 0))
         |), contaminated AS (
         |  SELECT DISTINCT tw.doc_id FROM tw JOIN evw ON tw.h = evw.h
         |), samp AS (
         |  SELECT doc_id FROM ${plBucketSql("doc_id", "e2e")} WHERE b < 500000
         |)
         |SELECT d.doc_id FROM documents d
         |WHERE d.doc_id % 5 <> 0
         |  AND d.doc_id NOT IN (SELECT doc_id FROM dropped)
         |  AND EXISTS (SELECT 1 FROM q WHERE q.doc_id = d.doc_id
         |              AND q.n_words >= 10 AND q.awr >= 0.8 AND q.nsk >= 1)
         |  AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
         |  AND d.doc_id IN (SELECT doc_id FROM samp)
         |ORDER BY d.doc_id""".stripMargin,

    "pl_split" ->
      s"""SELECT doc_id,
         |  CASE WHEN b < 200000 THEN 'test'
         |       WHEN b < 300000 THEN 'val'
         |       ELSE 'train' END AS split
         |FROM ${plBucketSql("doc_id", "sp")}
         |ORDER BY doc_id""".stripMargin,

    "pl_stratified_n" ->
      s"""SELECT doc_id, source FROM ${plBucketSql("doc_id, source", "st")}
         |QUALIFY row_number() OVER (PARTITION BY source ORDER BY b, doc_id) <= 5
         |ORDER BY source, doc_id""".stripMargin,

    "pl_pack_chunks" ->
      s"""SELECT doc_id, source, len($toksSql)::BIGINT AS n_tokens,
         |  ((sum(len($toksSql)::BIGINT) OVER
         |      (PARTITION BY source ORDER BY doc_id
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    - len($toksSql)::BIGINT) // 500)::BIGINT AS chunk_id
         |FROM documents ORDER BY source, doc_id""".stripMargin,

    "text_c4_rules" -> // C4 cleaning heuristics (Raffel et al. 2020):
      // a line counts iff it ends in terminal punctuation and has >= 5
      // whitespace words; keep iff >= 3 counting lines, no lorem ipsum,
      // no curly brace. Line splitting / trimming / regex anchoring must
      // agree exactly with the Spark columns.
      """WITH sig AS (
        |  SELECT doc_id,
        |    len(string_split(text, chr(10)))::BIGINT AS n_lines,
        |    len(list_filter(string_split(text, chr(10)), l ->
        |      regexp_matches(trim(l), '[.!?"]$')
        |      AND len(string_split_regex(trim(l), '\s+')) >= 5))::BIGINT AS n_kept_lines,
        |    (CASE WHEN contains(lower(text), 'lorem ipsum') THEN 1 ELSE 0 END)::BIGINT AS has_lorem,
        |    (CASE WHEN contains(text, '{') THEN 1 ELSE 0 END)::BIGINT AS has_brace
        |  FROM documents)
        |SELECT doc_id, n_lines, n_kept_lines, has_lorem, has_brace,
        |  (CASE WHEN n_kept_lines >= 3 AND has_lorem = 0 AND has_brace = 0
        |        THEN 1 ELSE 0 END)::BIGINT AS keep
        |FROM sig ORDER BY doc_id""".stripMargin,

    "text_gopher_rules" -> // Gopher A1.1 thresholds; word splitting, the
      // 8 indicator stop words, symbol/bullet/ellipsis definitions, and
      // rounding must agree exactly with the Spark columns
      """WITH w AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS words,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    len(words)::BIGINT AS n_words,
        |    CASE WHEN len(words) > 0 THEN
        |      list_sum(list_transform(words, x -> length(x)::DOUBLE)) / len(words)
        |      ELSE 0.0 END AS mean_word_len,
        |    CASE WHEN len(words) > 0 THEN
        |      len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE / len(words)
        |      ELSE 0.0 END AS alpha_word_ratio,
        |    (CASE WHEN list_contains(list_transform(words, x -> lower(x)), 'the') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(list_transform(words, x -> lower(x)), 'be') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(list_transform(words, x -> lower(x)), 'to') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(list_transform(words, x -> lower(x)), 'of') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(list_transform(words, x -> lower(x)), 'and') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(list_transform(words, x -> lower(x)), 'that') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(list_transform(words, x -> lower(x)), 'have') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(list_transform(words, x -> lower(x)), 'with') THEN 1 ELSE 0 END
        |    )::BIGINT AS n_stop_kinds,
        |    CASE WHEN len(words) > 0 THEN
        |      (length(text) - length(replace(replace(text, '#', ''), '…', '')))::DOUBLE / len(words)
        |      ELSE 0.0 END AS symbol_ratio,
        |    CASE WHEN len(lines) > 0 THEN
        |      len(list_filter(lines, l -> starts_with(ltrim(l), '•')
        |        OR starts_with(ltrim(l), '- ')))::DOUBLE / len(lines)
        |      ELSE 0.0 END AS bullet_line_ratio,
        |    CASE WHEN len(lines) > 0 THEN
        |      len(list_filter(lines, l -> ends_with(rtrim(l), '…')
        |        OR ends_with(rtrim(l), '...')))::DOUBLE / len(lines)
        |      ELSE 0.0 END AS ellipsis_line_ratio
        |  FROM w)
        |SELECT doc_id, n_words, round(mean_word_len, 6) AS mean_word_len,
        |  round(alpha_word_ratio, 6) AS alpha_word_ratio, n_stop_kinds,
        |  round(symbol_ratio, 6) AS symbol_ratio,
        |  round(bullet_line_ratio, 6) AS bullet_line_ratio,
        |  round(ellipsis_line_ratio, 6) AS ellipsis_line_ratio,
        |  (CASE WHEN n_words BETWEEN 50 AND 100000
        |        AND mean_word_len BETWEEN 3.0 AND 10.0
        |        AND symbol_ratio < 0.1 AND bullet_line_ratio < 0.9
        |        AND ellipsis_line_ratio < 0.3 AND alpha_word_ratio >= 0.8
        |        AND n_stop_kinds >= 2 THEN 1 ELSE 0 END)::BIGINT AS keep
        |FROM sig ORDER BY doc_id""".stripMargin,

    "text_repetition_chars" -> // Gopher char-fraction repetition: line
      // trimming/filtering, bigram construction, the lexicographic
      // tie-break on the top bigram, and the overlap clamp must all agree
      s"""WITH base AS (
         |  SELECT doc_id,
         |    list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
         |      x -> x <> '') AS lines,
         |    $toksSql AS toks
         |  FROM documents),
         |sig AS (
         |  SELECT doc_id,
         |    list_sum(list_transform(lines, l -> length(l)::BIGINT)) AS line_chars,
         |    list_sum(list_transform(lines, l ->
         |      CASE WHEN len(list_filter(lines, m -> m = l)) > 1
         |           THEN length(l)::BIGINT ELSE 0 END)) AS dup_chars,
         |    list_sum(list_transform(toks, t -> length(t)::BIGINT)) AS tok_chars,
         |    CASE WHEN len(toks) >= 2 THEN
         |      list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
         |      ELSE [] END AS grams
         |  FROM base),
         |tops AS (
         |  SELECT doc_id, line_chars, dup_chars, tok_chars,
         |    coalesce(list_max(list_transform(grams, g ->
         |      len(list_filter(grams, h -> h = g)))), 0) AS max_cnt,
         |    list_min(list_filter(grams, g ->
         |      len(list_filter(grams, h -> h = g)) =
         |      coalesce(list_max(list_transform(grams, g2 ->
         |        len(list_filter(grams, h2 -> h2 = g2)))), 0))) AS top
         |  FROM sig)
         |SELECT doc_id,
         |  round(CASE WHEN coalesce(line_chars, 0) > 0
         |    THEN dup_chars::DOUBLE / line_chars ELSE 0.0 END, 6) AS dup_line_char_frac,
         |  round(CASE WHEN coalesce(tok_chars, 0) > 0 AND max_cnt > 0
         |    THEN least(1.0, max_cnt::DOUBLE * (length(top) - 1) / tok_chars)
         |    ELSE 0.0 END, 6) AS top_bigram_char_frac
         |FROM tops ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      s"""SELECT doc_id,
         |  length(text)::BIGINT AS n_chars,
         |  len($toksSql)::BIGINT AS n_tokens,
         |  round(CASE WHEN len($toksSql) > 0 THEN
         |    list_sum(list_transform($toksSql, t -> length(t)::DOUBLE)) / len($toksSql)
         |    ELSE 0.0 END, 6) AS avg_token_len,
         |  round(CASE WHEN len($toksSql) > 0 THEN
         |    len(list_filter($toksSql, t -> t IN ('the','a','an','and','or','of','to','in','is','it')))::DOUBLE / len($toksSql)
         |    ELSE 0.0 END, 6) AS stopword_ratio,
         |  round(CASE WHEN length(text) > 0 THEN
         |    length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / length(text)
         |    ELSE 0.0 END, 6) AS alpha_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_lm_score" -> // avg ln(cf/total) per doc; exact-integer ratio logs
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |freq AS (SELECT term, count(*) AS cf FROM tok GROUP BY term),
         |tot AS (SELECT count(*) AS total FROM tok),
         |pd AS (SELECT tok.doc_id, count(*) AS n_tokens,
         |         avg(ln(freq.cf::DOUBLE / tot.total)) AS avg_logp
         |       FROM tok JOIN freq USING (term) CROSS JOIN tot GROUP BY tok.doc_id)
         |SELECT d.doc_id, coalesce(pd.n_tokens, 0)::BIGINT AS n_tokens,
         |  round(pd.avg_logp, 6) AS avg_logp
         |FROM documents d LEFT JOIN pd USING (doc_id) ORDER BY doc_id""".stripMargin,

    "dedup_ngram_overlap" -> // GPT-3-style exact-overlap decontamination:
      // a train doc (doc_id % 5 <> 0) is contaminated iff any 5-token
      // window fingerprint also occurs in the eval slice (doc_id % 5 = 0)
      s"""WITH tr AS (SELECT doc_id, $toksSql AS arr FROM documents WHERE doc_id % 5 <> 0),
         |ev AS (SELECT $toksSql AS arr FROM documents WHERE doc_id % 5 = 0),
         |evw AS (SELECT DISTINCT ${portable60Sql("w")} AS h FROM (
         |  SELECT unnest(CASE WHEN len(arr) < 5 THEN [] ELSE
         |    list_transform(range(1, len(arr) - 3), i -> array_to_string(arr[i:i+4], ' ')) END) AS w
         |  FROM ev)),
         |tw AS (SELECT doc_id, ${portable60Sql("w")} AS h FROM (
         |  SELECT doc_id, unnest(CASE WHEN len(arr) < 5 THEN [] ELSE
         |    list_transform(range(1, len(arr) - 3), i -> array_to_string(arr[i:i+4], ' ')) END) AS w
         |  FROM tr)),
         |pd AS (SELECT tw.doc_id, count(*)::BIGINT AS n_spans,
         |         sum(CASE WHEN evw.h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit_spans
         |       FROM tw LEFT JOIN evw ON tw.h = evw.h GROUP BY tw.doc_id)
         |SELECT d.doc_id, coalesce(pd.n_spans, 0)::BIGINT AS n_spans,
         |  coalesce(pd.n_hit_spans, 0)::BIGINT AS n_hit_spans,
         |  (CASE WHEN coalesce(pd.n_hit_spans, 0) > 0 THEN 1 ELSE 0 END)::BIGINT AS contaminated
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 <> 0) d
         |LEFT JOIN pd USING (doc_id) ORDER BY doc_id""".stripMargin,

    "dedup_spans" -> // portable-60 fingerprints of every 6-token window;
      // a fingerprint in >1 distinct doc marks the span duplicated
      s"""WITH w AS (
         |  SELECT doc_id, unnest(CASE WHEN len(arr) < 6 THEN [] ELSE
         |    list_transform(range(1, len(arr) - 4), i -> array_to_string(arr[i:i+5], ' '))
         |  END) AS w
         |  FROM (SELECT doc_id, $toksSql AS arr FROM documents)
         |), h AS (SELECT doc_id, ${portable60Sql("w")} AS h FROM w),
         |dup AS (SELECT h, count(DISTINCT doc_id) AS nd FROM h GROUP BY h),
         |pd AS (SELECT h.doc_id, count(*)::BIGINT AS n_spans,
         |         sum(CASE WHEN dup.nd > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_spans
         |       FROM h JOIN dup USING (h) GROUP BY h.doc_id)
         |SELECT d.doc_id, coalesce(pd.n_spans, 0)::BIGINT AS n_spans,
         |  coalesce(pd.n_dup_spans, 0)::BIGINT AS n_dup_spans,
         |  round(CASE WHEN coalesce(pd.n_spans, 0) = 0 THEN 0.0
         |    ELSE pd.n_dup_spans::DOUBLE / pd.n_spans END, 6) AS dup_ratio
         |FROM documents d LEFT JOIN pd USING (doc_id) ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |g AS (SELECT doc_id,
         |        unnest(list_transform(range(1, len(toks)),
         |                              i -> toks[i] || ' ' || toks[i+1])) AS gram
         |      FROM t),
         |c AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
         |tops AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS tb FROM c GROUP BY 1),
         |l AS (SELECT doc_id,
         |        list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
         |                    x -> x <> '') AS lines
         |      FROM documents)
         |SELECT l.doc_id,
         |  len(lines)::BIGINT AS n_lines,
         |  round(CASE WHEN len(lines) > 0
         |    THEN 1.0 - len(list_distinct(lines))::DOUBLE / len(lines)
         |    ELSE 0.0 END, 6) AS dup_line_ratio,
         |  round(coalesce(tb, 0.0), 6) AS top_bigram_ratio
         |FROM l LEFT JOIN tops USING (doc_id) ORDER BY doc_id""".stripMargin,

    "text_redact_pii" ->
      """WITH synth AS (
        |  SELECT doc_id,
        |    concat_ws(' ', text, 'contact', source || '@ex-a.io',
        |              'or (555) 123-4567 / +1 212.555.0100 from 10.0.0.1') AS t
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(t,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '(\+\d{1,2}[-. ])?\(?\d{3}\)?[-. ]?\d{3}[-. ]\d{4}\b', '<PHONE>', 'g')
        |    AS redacted
        |FROM synth ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      s"""WITH c AS (
         |  SELECT doc_id,
         |    len(list_filter($toksSql, t -> t IN ('der','die','und','das','nicht')))::BIGINT AS c_de,
         |    len(list_filter($toksSql, t -> t IN ('the','and','of','to','is')))::BIGINT AS c_en,
         |    len(list_filter($toksSql, t -> t IN ('el','la','de','que','los')))::BIGINT AS c_es,
         |    len(list_filter($toksSql, t -> t IN ('le','la','et','les','des')))::BIGINT AS c_fr
         |  FROM documents
         |), b AS (
         |  SELECT doc_id, c_de, c_en, c_es, c_fr,
         |    greatest(c_de, c_en, c_es, c_fr) AS best FROM c
         |)
         |SELECT doc_id,
         |  CASE WHEN best = 0 THEN 'und'
         |       WHEN c_de = best THEN 'de'
         |       WHEN c_en = best THEN 'en'
         |       WHEN c_es = best THEN 'es'
         |       ELSE 'fr' END AS pred_lang,
         |  best AS marker_hits
         |FROM b ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      s"""SELECT doc_id, md5(array_to_string($toksSql, ' ')) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_fingerprint_roll" -> // same mod-p code-point fold in both engines
      s"""SELECT doc_id,
         |  ${polySql(s"array_to_string($toksSql, ' ')", 31)} AS fp_roll
         |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_minhash_bands" -> { // SAME affine coefficients as the Spark side,
      // embedded as literals
      val coeffs = Dedup.minhashCoeffs(16, 42L)
      val p = Dedup.PortableMod
      val hCols = Seq(0, 5, 10, 15).map { i =>
        val (a, b) = coeffs(i)
        s"""  CASE WHEN len(sh) = 0 THEN ${Long.MaxValue}
           |    ELSE list_min(list_transform(sh, ms -> ($a * ${polySql("ms", 31)} + $b) % $p))
           |  END AS h$i""".stripMargin
      }.mkString(",\n")
      s"""WITH sh AS (
         |$shinglesSql
         |)
         |SELECT doc_id,
         |$hCols
         |FROM sh ORDER BY doc_id""".stripMargin
    },

    "dedup_simhash_portable" -> s"$simhash60Sql ORDER BY doc_id",

    "dedup_simhash_pairs" -> // brute-force hamming ≤ 8 over the portable
      // simhash — the ORACLE IS EXHAUSTIVE: it checks the multi-index
      // banding's lossless-recall pigeonhole claim, not a replication of it
      s"""WITH s AS ($simhash60Sql)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
         |FROM s a JOIN s b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
         |ORDER BY id_a, id_b""".stripMargin,

    "dedup_minhash_pairs" -> { // full pipeline replication: portable
      // signatures (same affine coeffs as the Spark side), band keys = the
      // comma-joined signature slices, candidate join, exact-Jaccard verify
      val coeffs = Dedup.minhashCoeffs(16, 42L)
      val p = Dedup.PortableMod
      val hExprs = coeffs.map { case (a, b) =>
        s"""CASE WHEN len(sh) = 0 THEN ${Long.MaxValue}
           |    ELSE list_min(list_transform(sh, ms -> ($a * ${polySql("ms", 31)} + $b) % $p)) END""".stripMargin
      }.mkString("[\n", ",\n", "\n]")
      s"""WITH sh AS (
         |$shinglesSql
         |), sigs AS (
         |  SELECT doc_id, sh, $hExprs AS sig FROM sh
         |), banded AS (
         |  SELECT doc_id,
         |    unnest(range(0, 8)) AS band,
         |    unnest(list_transform(range(0, 8),
         |      bb -> array_to_string(sig[bb*2+1 : bb*2+2], ','))) AS bkey
         |  FROM sigs
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |)
         |SELECT * FROM (
         |  SELECT c.id_a, c.id_b,
         |    round(CASE WHEN len(list_distinct(sa.sh || sb.sh)) = 0 THEN 0.0
         |      ELSE len(list_intersect(sa.sh, sb.sh))::DOUBLE
         |           / len(list_distinct(sa.sh || sb.sh)) END, 6) AS jaccard
         |  FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.id_a
         |  JOIN sh sb ON sb.doc_id = c.id_b
         |) WHERE jaccard >= 0.05 ORDER BY id_a, id_b""".stripMargin
    },

    "dedup_decontaminate" -> { // two-sided replication of the minhash
      // pipeline: train = doc_id % 5 != 0, ref = % 5 == 0; survivors = train
      // docs with NO verified cross match at jaccard >= 0.05
      val coeffs = Dedup.minhashCoeffs(16, 42L)
      val p = Dedup.PortableMod
      val hExprs = coeffs.map { case (a, b) =>
        s"""CASE WHEN len(sh) = 0 THEN ${Long.MaxValue}
           |    ELSE list_min(list_transform(sh, ms -> ($a * ${polySql("ms", 31)} + $b) % $p)) END""".stripMargin
      }.mkString("[\n", ",\n", "\n]")
      s"""WITH sh AS (
         |$shinglesSql
         |), sigs AS (
         |  SELECT doc_id, sh, $hExprs AS sig FROM sh
         |), banded AS (
         |  SELECT doc_id,
         |    unnest(range(0, 8)) AS band,
         |    unnest(list_transform(range(0, 8),
         |      bb -> array_to_string(sig[bb*2+1 : bb*2+2], ','))) AS bkey
         |  FROM sigs
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS train_id, b.doc_id AS ref_id
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bkey = b.bkey
         |  WHERE a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
         |), bad AS (
         |  SELECT DISTINCT c.train_id FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.train_id
         |  JOIN sh sb ON sb.doc_id = c.ref_id
         |  WHERE round(CASE WHEN len(list_distinct(sa.sh || sb.sh)) = 0 THEN 0.0
         |    ELSE len(list_intersect(sa.sh, sb.sh))::DOUBLE
         |         / len(list_distinct(sa.sh || sb.sh)) END, 6) >= 0.05
         |)
         |SELECT doc_id FROM documents
         |WHERE doc_id % 5 <> 0 AND doc_id NOT IN (SELECT train_id FROM bad)
         |ORDER BY doc_id""".stripMargin
    },

    "dedup_embedding" -> // portable-plane LSH bucketing replicated: pairs
      // sharing any of 4 tables' buckets, cosine-verified at 0.4
      s"""WITH tt AS (SELECT unnest(range(0, 4)) AS t),
         |bk AS (
         |  SELECT e.vec_id, tt.t, ${bucketSql("tt.t", "e.embedding", 4)} AS bucket
         |  FROM embeddings e CROSS JOIN tt
         |), cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bk a JOIN bk b
         |    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
         |)
         |SELECT * FROM (
         |  SELECT c.id_a, c.id_b,
         |    round(${cosineSql("ea.embedding", "eb.embedding")}, 6) AS cosine
         |  FROM cand c
         |  JOIN embeddings ea ON ea.vec_id = c.id_a
         |  JOIN embeddings eb ON eb.vec_id = c.id_b
         |) WHERE cosine >= 0.4 ORDER BY id_a, id_b""".stripMargin,

    "ann_lsh_topk" -> // portable-plane LSH: same candidate generation, then
      // exact-cosine rank within the candidate set (NOT a full-corpus rank)
      s"""WITH tt AS (SELECT unnest(range(0, 4)) AS t),
         |bk AS (
         |  SELECT e.vec_id, tt.t, ${bucketSql("tt.t", "e.embedding", 4)} AS bucket
         |  FROM embeddings e CROSS JOIN tt
         |), cand AS (
         |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS id
         |  FROM bk c JOIN bk q
         |    ON c.t = q.t AND c.bucket = q.bucket AND c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 5
         |), scored AS (
         |  SELECT c.q_id, c.id,
         |    round(${cosineSql("ec.embedding", "eq.embedding")}, 6) AS cosine
         |  FROM cand c
         |  JOIN embeddings ec ON ec.vec_id = c.id
         |  JOIN embeddings eq ON eq.vec_id = c.q_id
         |)
         |SELECT q_id, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, id) AS rank,
         |  id, cosine
         |FROM scored QUALIFY rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "ann_lsh_mp_topk" -> { // multiprobe: corpus side keeps base buckets
      // only; the query side derives base + the 2 single-bit flips on the
      // planes with smallest |projection| (Similarity.probeBucketsFromProjs
      // — ties break by plane index asc, which struct field order gives
      // both engines). Candidates = any shared (table, bucket) with the
      // expanded query probe set; exact-cosine rank within candidates.
      val projCols = (0 until 4).map(p =>
        s"${projSql("tt.t", p, "e.embedding")} AS pj$p").mkString(",\n         |    ")
      val baseSql = (0 until 4).map(p =>
        s"(CASE WHEN pj$p >= 0 THEN ${1L << p}::BIGINT ELSE 0::BIGINT END)")
        .mkString("(", " + ", ")")
      val rankedSql = (0 until 4).map(p => s"{'a': abs(pj$p), 'p': $p}")
        .mkString("list_sort([", ", ", "])")
      s"""WITH tt AS (SELECT unnest(range(0, 4)) AS t),
         |bk AS (
         |  SELECT e.vec_id, tt.t, ${bucketSql("tt.t", "e.embedding", 4)} AS bucket
         |  FROM embeddings e CROSS JOIN tt
         |), qp AS (
         |  SELECT e.vec_id, tt.t,
         |    $projCols
         |  FROM embeddings e CROSS JOIN tt WHERE e.vec_id < 5
         |), qd AS (
         |  SELECT vec_id, t, $baseSql AS base, $rankedSql AS ranked FROM qp
         |), qb AS (
         |  SELECT vec_id, t, unnest([base,
         |    xor(base, (1::BIGINT << (ranked[1].p))),
         |    xor(base, (1::BIGINT << (ranked[2].p)))]) AS bucket FROM qd
         |), cand AS (
         |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS id
         |  FROM bk c JOIN qb q
         |    ON c.t = q.t AND c.bucket = q.bucket AND c.vec_id <> q.vec_id
         |), scored AS (
         |  SELECT c.q_id, c.id,
         |    round(${cosineSql("ec.embedding", "eq.embedding")}, 6) AS cosine
         |  FROM cand c
         |  JOIN embeddings ec ON ec.vec_id = c.id
         |  JOIN embeddings eq ON eq.vec_id = c.q_id
         |)
         |SELECT q_id, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, id) AS rank,
         |  id, cosine
         |FROM scored QUALIFY rank <= 5 ORDER BY q_id, rank""".stripMargin
    },

    "ev_window_counts" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start, event_type,
        |  count(*) AS n_events, round(sum(value), 4) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "mm_features" -> // decode round-trip oracle: the decoder must parse the
      // real PNG/WAV byte stream and recover exactly what the deterministic
      // generator encoded (dims for images; sample rate/count for audio)
      """SELECT doc_id, 12::BIGINT AS dim,
        |  (CASE WHEN doc_id % 2 = 0 THEN 16 + doc_id % 17
        |        ELSE 8000 END)::BIGINT AS dec_a,
        |  (CASE WHEN doc_id % 2 = 0 THEN 16 + (doc_id // 17) % 13
        |        ELSE 256 + doc_id % 256 END)::BIGINT AS dec_b,
        |  1::BIGINT AS decoded
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_plumbing" -> // plumbing oracle: row cardinality through the batched
      // extraction, feature width, decode-failure flag on an opaque payload,
      // and the media column's exact bytes
      """SELECT doc_id, 12::BIGINT AS dim, 0::BIGINT AS decoded,
        |  sha256('media' || doc_id::VARCHAR) AS media_sha
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Spark session_window semantics (pinned by EventAggregatesSpec): an
    // event at EXACTLY prev_ts + gap still extends the session (inclusive
    // boundary), so a new session starts only when the gap is STRICTLY
    // exceeded; session_end = last_ts + gap.
    "ev_sessions" ->
      """WITH d AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d
        |)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL '30 minutes' AS session_end,
        |  count(*) AS n_events, round(sum(value), 4) AS total_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin
  )

  /** Federated twins whose oracle IS the monolithic SQL, verbatim: the
    * federation contract (global N/avgdl/df merged across slices) makes
    * the single-index oracle the exact spec — any slice-local stats leak
    * fails the float comparison. */
  def oracleSql: Map[String, String] = oracleSqlBase ++ Map(
    "ft_federated_mlt" -> oracleSqlBase("ft_mlt"),
    "ft_federated_rescore" -> oracleSqlBase("ft_rescore"),
    "ft_federated_phrase_prefix" -> oracleSqlBase("ft_phrase_prefix"),
    "ft_federated_batch_wand" -> oracleSqlBase("ft_bm25_batch"),
    "ft_federated_match_all" -> oracleSqlBase("ft_match_all"),
    "ft_federated_tfidf" -> oracleSqlBase("ft_tfidf"),
    "ft_federated_regexp" -> oracleSqlBase("ft_regexp"),
    "ft_federated_termrange" -> oracleSqlBase("ft_termrange"),
    "ft_federated_termvectors" -> oracleSqlBase("ft_termvectors"),
    "ft_federated_explain" -> oracleSqlBase("ft_explain"),
    "ft_federated_multifield" -> oracleSqlBase("ft_multifield"),
    "ft_federated_phrase" -> oracleSqlBase("ft_phrase"),
    "ft_federated_phrase_slop" -> oracleSqlBase("ft_phrase_slop"),
    "ft_federated_msm" -> oracleSqlBase("ft_msm"),
    "ft_federated_wildcard" -> oracleSqlBase("ft_wildcard"),
    "ft_federated_highlight" -> oracleSqlBase("ft_highlight"),
    "ft_federated_snippet" -> oracleSqlBase("ft_snippet"),
    "ft_federated_count" -> oracleSqlBase("ft_count"),
    // serving fast paths (round 5): same oracle SQL verbatim as their
    // cold twins — the pinned plans must be answer-identical
    "ft_bm25_topk_wand_serving" -> oracleSqlBase("ft_bm25_topk_wand"),
    "ft_count_serving" -> oracleSqlBase("ft_count"),
    "ft_federated_facets" -> oracleSqlBase("ft_facets"),
    "ft_federated_facet_stats" -> oracleSqlBase("ft_facet_stats"),
    "ft_federated_facet_hist" -> oracleSqlBase("ft_facet_hist"),
    "ft_federated_facet_date" -> oracleSqlBase("ft_facet_date"),
    "ft_federated_facet_pctl" -> oracleSqlBase("ft_facet_pctl"),
    "ft_federated_filtered" -> oracleSqlBase("ft_filtered"),
    "ft_federated_funcscore" -> oracleSqlBase("ft_funcscore"),
    "ft_federated_grouped" -> oracleSqlBase("ft_grouped"),
    "ft_federated_boosting" -> oracleSqlBase("ft_boosting"),
    "ft_federated_sortby" -> oracleSqlBase("ft_sortby"),
    "ft_federated_querystring" -> oracleSqlBase("ft_querystring"),
    "ft_federated_boost" -> oracleSqlBase("ft_boost"),
    "ft_federated_bool_not" -> oracleSqlBase("ft_bool_not"),
    "ft_federated_bool_phrase" -> oracleSqlBase("ft_bool_phrase"),
    "ft_federated_qs_compound" -> oracleSqlBase("ft_qs_compound"),
    "ft_federated_phrase3" -> oracleSqlBase("ft_phrase3"),
    "ft_federated_phrase_ranked" -> oracleSqlBase("ft_phrase_ranked"),
    "ft_federated_phrase_slop3" -> oracleSqlBase("ft_phrase_slop3"),
    "ft_federated_phrase_slop_ord" -> oracleSqlBase("ft_phrase_slop_ord"),
    "ft_federated_phrase_slop3_ord" -> oracleSqlBase("ft_phrase_slop3_ord"),
    "ft_federated_match_and" -> oracleSqlBase("ft_match_and"),
    "ft_federated_match_or" -> oracleSqlBase("ft_match_or"),
    "ft_federated_match_and_unknown" -> oracleSqlBase("ft_match_and_unknown"),
    "ft_federated_search_after" -> oracleSqlBase("ft_search_after"))
}
