package graft

import graft.analysis.{Analyzer, AsciiFoldingFilter, LowercaseFilter, NgramTokenizer, StandardTokenizer, StemmerFilter, StopWordFilter, SynonymFilter, TokenFilter}
import graft.index.Ids
import graft.query.{And, Or, Searcher}
import graft.storage.{ParquetIndexStorage, StorageParams}
import graft.streaming.StreamingIndexer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** spark-submit deployment surface for the engine (north_star: "runs via
  * spark-submit on multi-executor clusters").
  *
  * {{{
  * spark-submit --class graft.Main graft.jar \
  *   build  --input s3://bucket/transcripts --index s3://bucket/idx [--term-buckets 64]
  *   delta  --input batch.parquet --index s3://bucket/idx
  *   search --index s3://bucket/idx --query "spark join" [--mode wand] [--k 10]
  * }}}
  *
  * The cluster master/executors come from spark-submit's own configuration;
  * this object only declares the job. All heavy lifting is the library's
  * tested paths: `ParquetIndexStorage.build` (resumable staged build),
  * `StreamingIndexer.overStorage` (O(batch) delta through the staged
  * dynamic-partition-overwrite), `Searcher` (pruned query plans).
  *
  * Subcommands:
  *  - `build`: read a transcripts table (`input_hint` shape: conv_id,
  *    turn_idx, role, text, tool, ts), assign dense ordinals by the stable
  *    (conv_id, turn_idx) order, and commit a persisted index (resumable —
  *    rerunning after a crash skips committed stages).
  *  - `delta`: fold a batch of new/replaced turns into a committed index.
  *    Idempotent per `--batch-id`; re-running an applied id is a no-op.
  *  - `remove`: delete documents from a committed index (retention /
  *    right-to-be-forgotten). Input rows carry either `doc_ord` or the
  *    index's key columns (conv_id, turn_idx). Idempotent per `--batch-id`.
  *  - `search`: run one query against a committed index and print a TSV of
  *    results (modes: and, or, phrase, tfidf, bm25, wand, all).
  *  - `batch`: evaluate a FILE of queries (one per line) as ONE Spark plan —
  *    the capacity shape (per-query plans are pinned at a few q/s by driver
  *    latency at any cluster size; the batch plan amortizes it). Mode
  *    `wand` (default) adds lossless block-max pruning.
  *  - `vacuum`: drop staging data whose delta is already applied (and the
  *    build's raw checkpoint once the build is committed); markers stay, so
  *    idempotence and resumability are unaffected.
  *  - `compact`: rewrite the index with a dense ordinal space (removals
  *    never reclaim ordinals). Offline maintenance — run when the reported
  *    ordinal density drifts low; idempotent per `--batch-id`.
  *  - `stats`: one JSON line of index introspection (docs, avgdl, vocab
  *    size, ordinal density, applied stages) — cheap: manifest + the
  *    vocab-sized dictionary + one docs partition.
  *
  * The query-side analyzer MUST match the one the index was built with; the
  * manifest records the build analyzer and a mismatch fails loudly (scoring
  * with a different analyzer silently returns wrong matches).
  */
object Main {

  def main(args: Array[String]): Unit = {
    // master comes from spark-submit (or GRAFT_MASTER for bare-JVM runs)
    val builder = SparkSession.builder().appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
    sys.env.get("GRAFT_MASTER").foreach(builder.master)
    val spark = builder.getOrCreate()
    try {
      val code = run(spark, args.toIndexedSeq, println(_))
      if (code != 0) sys.exit(code)
    } finally spark.stop()
  }

  private val usage: String =
    """usage: graft.Main <build|delta|remove|search|serve|batch|vacuum|compact|stats> [options]
      |  build  --input <parquet> --index <path> [--text-col text]
      |         [--analyzer standard|stem|ngram:N] [--stopwords a,b,c]
      |         [--fold true] [--synonyms term=canonical,term2=canonical2]
      |         [--term-buckets 64] [--write-groups 8] [--block-size 128]
      |         [--bucket-span 65536] [--no-keymap]
      |  delta  --input <parquet> --index <path> [--batch-id <id>]
      |         [--analyzer ...] [--stopwords ...] [--text-col text]
      |  remove --input <parquet of doc_ord or key columns> --index <path>
      |         [--batch-id <id>]
      |  search --index <path>[,<path>…] --query <q>
      |         [--mode and|or|phrase|phrase-prefix|msm|tfidf|bm25|lm|wand|collapse|all|qs|qs-ranked|prefix|fuzzy|wildcard|regexp|range|rescore|mlt|termvectors|explain|highlight|snippet|suggest|dym|facets|sigterms|context]
      |         [--k 10] [--limit 20] [--max-edits 1] [--slop 0]
      |         [--min-match 2] [--collapse-field conv_id]
      |         [--facet-field role] [--min-doc-count 3]
      |         [--window 2 (context: ±turns fetched around each hit)]
      |         [--mu 2000 (lm: Dirichlet smoothing)]
      |         [--doc 42 (explain: the doc to explain — ordinal, or key
      |          values for a federated index)]
      |         [--rescore-phrase "join table"] [--window-size 100]
      |         [--rescore-weight 1.0 (rescore: phrase re-rank of the
      |          BM25 top window-size)]
      |         (qs: Lucene-lite string — AND/OR/NOT, -term, parens, "phrases",
      |          "a b"~slop, term~edits, term^boost;
      |          phrase: --slop widens to a position window; msm: --min-match terms required;
      |          collapse: best doc per --collapse-field value;
      |          mlt/termvectors: --query is a doc_ord (federated:
      |          comma-separated key values); suggest: --query is a term
      |          prefix; range: --query is "lo,hi" (empty side = open);
      |          comma-separated --index paths federate independently built
      |          slices — global stats merged, every mode except context;
      |          expansion/dictionary modes use the merged global vocabulary)
      |  serve  --index <path> [--queries <file; default stdin>] [--k 10]
      |         [--limit 20] [--pin-postings true]
      |         (interactive loop: pin once, answer `mode<TAB>query` lines;
      |          modes wand|count-and|count-or|and|or|phrase; bare lines =
      |          wand top-k; per-query latency after each answer)
      |  batch  --index <path>[,<path>…] --queries <text file, one query per line>
      |         [--k 10] [--mode wand|bm25]
      |         (comma-separated --index paths federate the query-set replay
      |          across slices — global stats merged, output keyed by the
      |          slices' stable key columns)
      |  vacuum --index <path>
      |  compact --index <path> [--batch-id <id>]
      |         [--groups auto|g1,g2,… (per-d_group incremental compaction;
      |          auto selects groups below --min-density, default 0.5)]
      |  stats  --index <path>""".stripMargin

  /** Testable core: returns a process exit code, prints through `out`. */
  def run(spark: SparkSession, args: Seq[String], out: String => Unit): Int = {
    if (args.isEmpty) { out(usage); return 2 }
    val opts = parseOpts(args.tail) match {
      case Right(o) => o
      case Left(msg) => out(s"error: $msg"); out(usage); return 2
    }
    def req(key: String): String = opts.getOrElse(key,
      throw new IllegalArgumentException(s"missing required --$key"))
    try {
      args.head match {
        case "build"  => build(spark, req("input"), req("index"), opts, out)
        case "delta"  => delta(spark, req("input"), req("index"), opts, out)
        case "remove" => remove(spark, req("input"), req("index"), opts, out)
        case "search" => search(spark, req("index"), req("query"), opts, out)
        case "serve"  => serve(spark, req("index"), opts, out)
        case "batch"  => batchSearch(spark, req("index"), req("queries"), opts, out)
        case "vacuum" =>
          val deleted = ParquetIndexStorage.vacuum(spark, req("index"))
          out(s"""{"vacuumed":${deleted.size}}""")
        case "compact" => compact(spark, req("index"), opts, out)
        case "stats"   => stats(spark, req("index"), out)
        case other    => out(s"error: unknown subcommand '$other'"); out(usage); return 2
      }
      0
    } catch {
      case e: IllegalArgumentException => out(s"error: ${e.getMessage}"); out(usage); 2
    }
  }

  private def parseOpts(args: Seq[String]): Either[String, Map[String, String]] = {
    @annotation.tailrec
    def loop(rest: List[String], acc: Map[String, String]): Either[String, Map[String, String]] =
      rest match {
        case Nil => Right(acc)
        case flag :: tail if flag.startsWith("--") =>
          val key = flag.stripPrefix("--")
          if (key == "no-keymap") loop(tail, acc + (key -> "true"))
          else tail match {
            case v :: tail2 => loop(tail2, acc + (key -> v))
            case Nil => Left(s"flag $flag needs a value")
          }
        case other :: _ => Left(s"unexpected argument '$other'")
      }
    loop(args.toList, Map.empty)
  }

  private[graft] def analyzerOf(opts: Map[String, String]): Analyzer = {
    val stop = opts.get("stopwords").map(_.split(",").toSeq).getOrElse(Nil)
    // optional normalization stages, inserted right after lowercasing:
    // --fold true (accent folding), --synonyms k=v,k2=v2 (canonicalization)
    val post: Seq[TokenFilter] =
      (if (opts.get("fold").exists(_.toBoolean)) Seq(AsciiFoldingFilter()) else Nil) ++
      opts.get("synonyms").toSeq.map { s =>
        SynonymFilter(s.split(",").map { kv =>
          kv.split("=", 2) match {
            case Array(k, v) if k.nonEmpty => k -> v
            case _ => throw new IllegalArgumentException(
              s"bad --synonyms entry '$kv' (want term=canonical)")
          }
        }.toMap)
      }
    val stopF = if (stop.nonEmpty) Seq(StopWordFilter(stop)) else Nil
    opts.getOrElse("analyzer", "standard") match {
      case "standard" =>
        Analyzer(Nil, StandardTokenizer(), Seq(LowercaseFilter()) ++ post ++ stopF)
      case "stem" =>
        Analyzer(Nil, StandardTokenizer(),
          Seq(LowercaseFilter()) ++ post ++ stopF ++ Seq(StemmerFilter()))
      case s if s.startsWith("ngram:") =>
        val n = s.stripPrefix("ngram:").toInt
        Analyzer(Nil, NgramTokenizer(n), Seq(LowercaseFilter()) ++ post ++ stopF)
      case other => throw new IllegalArgumentException(s"unknown analyzer '$other'")
    }
  }

  private def build(spark: SparkSession, input: String, index: String,
      opts: Map[String, String], out: String => Unit): Unit = {
    val analyzer = analyzerOf(opts)
    val textCol = opts.getOrElse("text-col", "text")
    val in = spark.read.parquet(input)
    val keyCols =
      if (opts.contains("no-keymap")) Nil
      else Seq("conv_id", "turn_idx").filter(in.columns.contains)
    // dense ordinals from the stable (conv_id, turn_idx) order — the per-row
    // invariant vs the reference (per-turn text equality under stable turn
    // ordering); inputs without those columns order by their first column
    val ordCols = if (keyCols.nonEmpty) keyCols else in.columns.take(1).toSeq
    val (withOrd, ordCleanup) = Ids.withDenseOrdinalHandle(in, "doc_ord", ordCols)
    val params = StorageParams(
      termBuckets = opts.get("term-buckets").map(_.toInt).getOrElse(64),
      writeGroups = opts.get("write-groups").map(_.toInt).getOrElse(8),
      blockParams = graft.index.BlockParams(
        blockSize = opts.get("block-size").map(_.toInt).getOrElse(128),
        bucketSpan = opts.get("bucket-span").map(_.toLong).getOrElse(65536L)),
      keyCols = keyCols)
    val mf = ParquetIndexStorage.build(withOrd, analyzer, index, params,
      sourceDesc = input, textCol = textCol)
    ordCleanup()
    out(s"""{"built":"$index","numDocs":${mf.numDocs},"avgDocLen":${mf.avgDocLen},"stages":${mf.stages.size}}""")
  }

  private def delta(spark: SparkSession, input: String, index: String,
      opts: Map[String, String], out: String => Unit): Unit = {
    val analyzer = checkAnalyzer(index, opts)
    val textCol = opts.getOrElse("text-col", "text")
    val batch = spark.read.parquet(input)
    // one explicit flush per CLI invocation; addBatch handles key resolution
    // (keymap-pruned), replacement semantics, and ordinal/term-id minting
    val si = StreamingIndexer.overStorage(spark, index, analyzer, textCol,
      flushThreshold = Long.MaxValue)
    si.addBatch(batch)
    si.flush(opts.get("batch-id")) // explicit id = idempotent across re-runs
    val mf = graft.storage.ManifestIO
      .read(s"$index/manifest.json", classOf[graft.storage.IndexManifest]).get
    out(s"""{"applied":"$input","numDocs":${mf.numDocs},"avgDocLen":${mf.avgDocLen}}""")
  }

  private def remove(spark: SparkSession, input: String, index: String,
      opts: Map[String, String], out: String => Unit): Unit = {
    val keys = spark.read.parquet(input)
    // default id: probe past claimed remove epochs. A path- or run-derived
    // id would hit its own applied marker when the SAME path carries NEW
    // keys next run and silently skip the deletion; a fresh epoch always
    // applies, and re-running the same key set is a semantic no-op anyway
    // (removing already-gone docs removes nothing).
    val id = opts.getOrElse("batch-id", {
      val e = ParquetIndexStorage.nextFreeEpoch(0L)(i =>
        ParquetIndexStorage.deltaClaimed(index, s"remove_$i"))
      s"remove_$e"
    })
    val mf = ParquetIndexStorage.removeDocuments(spark, index, keys, batchId = id)
    val removed = graft.storage.ManifestIO // this batch's own marker, not the
      .read(s"$index/_markers/delta_${id}_applied.json", // manifest's last
        classOf[graft.storage.StageMarker])              // (possibly older) stage
      .flatMap(_.lineage.get("removed")).getOrElse("0")
    out(s"""{"removed":$removed,"numDocs":${mf.numDocs},"avgDocLen":${mf.avgDocLen}}""")
  }

  private def compact(spark: SparkSession, index: String,
      opts: Map[String, String], out: String => Unit): Unit = {
    val before = ParquetIndexStorage.ordinalDensity(spark, index)
    // auto id probes past claimed compaction epochs (same reasoning as
    // remove: a path-derived id would no-op a LATER compaction of the same
    // index; a fresh epoch always applies, and compacting an already-dense
    // index is cheap and harmless)
    val id = opts.getOrElse("batch-id",
      ParquetIndexStorage.nextFreeEpoch(0L)(i =>
        ParquetIndexStorage.compactClaimed(index, s"$i")).toString)
    // --groups: incremental per-d_group compaction — `auto` selects groups
    // below --min-density (default 0.5), or an explicit comma list; absent
    // = the full dense rewrite
    val mf = opts.get("groups") match {
      case None => ParquetIndexStorage.compact(spark, index, id)
      case Some(spec) =>
        val gs =
          if (spec == "auto")
            ParquetIndexStorage.sparseDGroups(spark, index,
              opts.getOrElse("min-density", "0.5").toDouble)
          else spec.split(",").map(_.trim.toLong).toSeq
        if (gs.isEmpty) {
          out(s"""{"compacted":"$index","groups":[],"densityBefore":$before,"densityAfter":$before}""")
          return
        }
        ParquetIndexStorage.compactGroups(spark, index, id, gs)
    }
    val after = ParquetIndexStorage.ordinalDensity(spark, index)
    out(s"""{"compacted":"$index","numDocs":${mf.numDocs},""" +
      s""""densityBefore":$before,"densityAfter":$after}""")
  }

  private def stats(spark: SparkSession, index: String, out: String => Unit): Unit = {
    val mf = graft.storage.ManifestIO
      .read(s"$index/manifest.json", classOf[graft.storage.IndexManifest])
      .getOrElse(throw new IllegalArgumentException(s"no committed index at $index"))
    val density = ParquetIndexStorage.ordinalDensity(spark, index)
    val vocab = spark.read.parquet(s"$index/term_dict").count()
    val tokens = mf.stages.reverse.collectFirst {
      case s if s.lineage.contains("tokens") => s.lineage("tokens").toLong
    }.getOrElse(-1L)
    out(s"""{"index":"$index","numDocs":${mf.numDocs},"avgDocLen":${mf.avgDocLen},""" +
      s""""tokens":$tokens,"vocab":$vocab,"ordinalDensity":$density,""" +
      s""""analyzer":"${mf.analyzer}","formatVersion":${mf.formatVersion},""" +
      s""""termBuckets":${mf.termBuckets},"stages":${mf.stages.size}}""")
  }

  private def checkAnalyzer(index: String, opts: Map[String, String]): Analyzer = {
    val analyzer = analyzerOf(opts)
    val mf = graft.storage.ManifestIO
      .read(s"$index/manifest.json", classOf[graft.storage.IndexManifest])
    mf.foreach { m =>
      require(m.analyzer == analyzer.describe,
        s"analyzer mismatch: index built with ${m.analyzer}, got ${analyzer.describe} " +
          "(pass the SAME --analyzer/--stopwords the index was built with)")
    }
    analyzer
  }

  /** Interactive serving loop (the deployment shape `Searcher.serving()`
    * exists for): pin ONCE, then answer a stream of queries — from
    * `--queries <file>` or stdin, one per line as `mode<TAB>query` (bare
    * lines default to wand top-k). Modes: `wand` (pinned bucket-local
    * top-k), `count-and` / `count-or` (block-local hit counts), `and` /
    * `or` / `phrase` (full match rows). A per-query latency line follows
    * each answer. spark-submit keeps the session alive for the loop's
    * lifetime; the pins die with it. */
  private def serve(spark: SparkSession, index: String,
      opts: Map[String, String], out: String => Unit): Unit = {
    val analyzer = checkAnalyzer(index, opts)
    val k = opts.get("k").map(_.toInt).getOrElse(10)
    val limit = opts.get("limit").map(_.toInt).getOrElse(20)
    val searcher = Searcher(ParquetIndexStorage.read(spark, index), analyzer)
    searcher.serving(pinDocs = true,
      pinPostings = opts.get("pin-postings").exists(_.toBoolean))
    val src = opts.get("queries") match {
      case Some(f) => scala.io.Source.fromFile(f)
      case None    => scala.io.Source.stdin
    }
    try {
      for (line <- src.getLines().map(_.trim)
           if line.nonEmpty && !line.startsWith("#")) {
        val (mode, query) = line.split("\t", 2) match {
          case Array(m, q) => (m, q)
          case _           => ("wand", line)
        }
        val t0 = System.nanoTime()
        mode match {
          case "count-and" => out(s"count\t${searcher.countMatches(query, And)}")
          case "count-or"  => out(s"count\t${searcher.countMatches(query, Or)}")
          case "wand"   => printDocs(searcher.bm25TopKWand(query, k),
            ranked = true, Seq("doc_ord"), out)
          case "and"    => printDocs(searcher.matchQuery(query, And).limit(limit),
            ranked = false, Seq("doc_ord"), out)
          case "or"     => printDocs(searcher.matchQuery(query, Or).limit(limit),
            ranked = false, Seq("doc_ord"), out)
          case "phrase" => printDocs(searcher.phraseQuery(query).limit(limit),
            ranked = false, Seq("doc_ord"), out)
          case other    => out(s"error: unknown serve mode '$other'")
        }
        out(f"# ${(System.nanoTime() - t0) / 1e6}%.1f ms")
      }
    } finally {
      src.close()
      searcher.unpin()
    }
  }

  private def search(spark: SparkSession, index: String, query: String,
      opts: Map[String, String], out: String => Unit): Unit = {
    if (index.contains(",")) { // --index a,b,c → scatter-gather federation
      fedSearch(spark, index.split(',').map(_.trim).filter(_.nonEmpty).toSeq,
        query, opts, out)
      return
    }
    val analyzer = checkAnalyzer(index, opts)
    val k = opts.get("k").map(_.toInt).getOrElse(10)
    val limit = opts.get("limit").map(_.toInt).getOrElse(20)
    val searcher = Searcher(ParquetIndexStorage.read(spark, index), analyzer)
    val mode = opts.getOrElse("mode", "wand")
    if (mode == "suggest") { // autocomplete: (term, df), not doc rows
      out(Seq("term", "df").mkString("\t"))
      searcher.suggest(query, n = k).collect()
        .foreach(r => out(s"${r.getString(0)}\t${r.getLong(1)}"))
      return
    }
    if (mode == "dym") { // did-you-mean: (term, df, distance), not doc rows
      out(Seq("term", "df", "distance").mkString("\t"))
      searcher.didYouMean(query,
        maxEdits = opts.get("max-edits").map(_.toInt).getOrElse(2), n = k)
        .collect()
        .foreach(r => out(s"${r.getString(0)}\t${r.getLong(1)}\t${r.getInt(2)}"))
      return
    }
    if (mode == "facets") { // matched-set facet counts over a docs column
      val field = opts.getOrElse("facet-field", "role")
      out(Seq(field, "n_docs").mkString("\t"))
      searcher.facetCounts(query, Or, field)
        .orderBy(col("n_docs").desc, col(field)).collect()
        .foreach(r => out(s"${r.get(0)}\t${r.getLong(1)}"))
      return
    }
    if (mode == "context") { // conversation windows around the BM25 top-k:
      // the transcripts serving shape — retrieve, then feed each hit's
      // ±window surrounding turns (RAG context) downstream
      val docsCols = searcher.index.docs.columns
      require(Seq("conv_id", "turn_idx").forall(docsCols.contains),
        "context mode needs conv_id/turn_idx docs columns (build from a transcripts table)")
      val w = opts.get("window").map(_.toInt).getOrElse(2)
      val hits = searcher.bm25TopK(query, k).select("doc_ord")
      val cols = Seq("hit_ord", "offset", "conv_id", "turn_idx", "text")
      out(cols.mkString("\t"))
      searcher.contextWindows(hits, "conv_id", "turn_idx", w)
        .orderBy(col("hit_ord"), col("offset"))
        .select(cols.map(col): _*).collect()
        .foreach(r => out(cols.indices.map(i => String.valueOf(r.get(i))).mkString("\t")))
      return
    }
    if (mode == "sigterms") { // significant terms of the matched set
      out(Seq("term", "df_in", "df", "lift").mkString("\t"))
      searcher.significantTerms(query, Or, topN = k,
        minDocCount = opts.get("min-doc-count").map(_.toLong).getOrElse(3L))
        .collect()
        .foreach(r => out(f"${r.getString(0)}\t${r.getLong(1)}\t${r.getLong(2)}\t${r.getDouble(3)}%.4f"))
      return
    }
    if (mode == "termvectors") { // one doc's indexed view (ES _termvectors)
      out(Seq("term", "tf", "positions").mkString("\t"))
      searcher.termVectors(query.trim.toLong).collect()
        .foreach(r => out(s"${r.getString(0)}\t${r.getLong(1)}\t${r.getString(2)}"))
      return
    }
    if (mode == "highlight") { // which query terms each matched doc contains
      printCols(searcher.highlightTerms(query, Or).limit(limit),
        Seq("doc_ord", "hit_terms"), out)
      return
    }
    if (mode == "snippet") { // ±window tokens around the first hit
      printCols(searcher.snippet(query,
        opts.get("window").map(_.toInt).getOrElse(2)).limit(limit),
        Seq("doc_ord", "first_pos", "snippet"), out)
      return
    }
    if (mode == "explain") { // per-term BM25 breakdown (ES _explain):
      // --query is the keyword, --doc the ordinal
      val docOrd = opts.getOrElse("doc",
        throw new IllegalArgumentException("explain needs --doc <doc_ord>")).toLong
      out(Seq("term", "tf", "df", "idf", "tf_factor", "contribution").mkString("\t"))
      searcher.explainScore(query, docOrd).collect().foreach(r =>
        out(f"${r.getString(0)}\t${r.getLong(1)}\t${r.getLong(2)}\t" +
          f"${r.getDouble(3)}%.6f\t${r.getDouble(4)}%.6f\t${r.getDouble(5)}%.6f"))
      return
    }
    val (df, ranked): (DataFrame, Boolean) = mode match {
      case "and"    => (searcher.matchQuery(query, And).limit(limit), false)
      case "or"     => (searcher.matchQuery(query, Or).limit(limit), false)
      case "phrase" => (searcher.phraseQuery(query,
        slop = opts.get("slop").map(_.toInt).getOrElse(0)).limit(limit), false)
      case "phrase-prefix" => (searcher.matchPhrasePrefix(query,
        slop = opts.get("slop").map(_.toInt).getOrElse(0)).limit(limit), false)
      case "wildcard" => (searcher.wildcardQuery(query).limit(limit), false)
      case "regexp"   => (searcher.regexpQuery(query).limit(limit), false)
      case "range"    => // --query "lo,hi"; empty side = open end
        (searcher.termRangeQuery(rangeLo(query), rangeHi(query)).limit(limit), false)
      case "rescore" => (searcher.bm25TopKRescore(query,
        opts.getOrElse("rescore-phrase", throw new IllegalArgumentException(
          "rescore needs --rescore-phrase")),
        windowSize = opts.get("window-size").map(_.toInt).getOrElse(100), k = k,
        rescoreWeight = opts.get("rescore-weight").map(_.toDouble).getOrElse(1.0),
        slop = opts.get("slop").map(_.toInt).getOrElse(0)), true)
      case "msm"    => (searcher.matchQueryMsm(query,
        opts.get("min-match").map(_.toInt).getOrElse(2)).limit(limit), false)
      case "tfidf"  => (searcher.matchQueryRanked(query, Or).limit(k), true)
      case "bm25"   => (searcher.bm25TopK(query, k), true)
      case "lm"     => (searcher.lmDirichletTopK(query, k,
        opts.get("mu").map(_.toDouble).getOrElse(2000.0)), true)
      case "wand"   => (searcher.bm25TopKWand(query, k), true)
      case "collapse" => (searcher.bm25TopKCollapse(query,
        opts.getOrElse("collapse-field", "conv_id"), k), true)
      case "all"    => (searcher.matchAll().limit(limit), false)
      // compound surface: Lucene-lite query-string syntax (AND/OR/NOT,
      // -term, parens, "quoted phrases"), unranked or positive-clause BM25
      case "qs"        => (searcher.queryString(query).limit(limit), false)
      case "qs-ranked" => (searcher.queryString(query, ranked = true).limit(k), true)
      case "prefix" => (searcher.prefixQuery(query).limit(limit), false)
      case "fuzzy"  => (searcher.fuzzyQuery(query,
        maxEdits = opts.get("max-edits").map(_.toInt).getOrElse(1)).limit(limit), false)
      case "mlt"    => (searcher.moreLikeThis(query.trim.toLong, k = k), true)
      case other    => throw new IllegalArgumentException(s"unknown mode '$other'")
    }
    printDocs(df, ranked, Seq("doc_ord"), out)
  }

  /** `lo,hi` range bounds for `--mode range`; an empty side = open end. */
  private def rangeLo(q: String): String = q.split(",", -1).headOption.getOrElse("")
  private def rangeHi(q: String): String = {
    val parts = q.split(",", -1)
    require(parts.length == 2, s"range query must be 'lo,hi' (got '$q')")
    parts(1)
  }

  /** Fixed-column TSV printer for table-shaped modes. */
  private def printCols(df: DataFrame, cols: Seq[String],
      out: String => Unit): Unit = {
    out(cols.mkString("\t"))
    df.select(cols.map(col): _*).collect().foreach { r =>
      out(cols.indices.map(i => String.valueOf(r.get(i))).mkString("\t"))
    }
  }

  /** Shared doc-row printer: key columns, then score for ranked modes,
    * then any of the transcript columns present and not already printed. */
  private def printDocs(df: DataFrame, ranked: Boolean, keyCols: Seq[String],
      out: String => Unit): Unit = {
    val cols = keyCols ++ (if (ranked) Seq("score") else Nil) ++
      Seq("conv_id", "turn_idx", "text")
        .filter(c => df.columns.contains(c) && !keyCols.contains(c))
    out(cols.mkString("\t"))
    df.select(cols.map(col): _*).collect().foreach { r =>
      out(cols.indices.map(i => String.valueOf(r.get(i))).mkString("\t"))
    }
  }

  /** Scatter-gather search over several independently built persisted
    * indexes (`--index a,b,c` — time slices or shards): global BM25
    * statistics are merged across slices ([[graft.query.Federation]]), so
    * results are rank-identical to one monolithic index over the union
    * corpus. Results carry the slices' key columns instead of the
    * slice-local doc_ord. */
  /** Shared federation construction for the multi-`--index` search and
    * batch paths: reads every slice, resolves the common stable key
    * columns, and merges global statistics ([[graft.query.Federation]]). */
  private def federationOf(spark: SparkSession, paths: Seq[String],
      opts: Map[String, String]): (graft.query.Federation, Seq[String]) = {
    require(paths.size >= 2, "federated search needs at least two --index paths")
    val analyzer = paths.map(checkAnalyzer(_, opts)).head
    val slices = paths.map(ParquetIndexStorage.read(spark, _))
    val keyCols = slices.map(_.manifest.keyCols).distinct match {
      case Seq(kc) if kc.nonEmpty => kc
      case Seq(_) if slices.head.index.docs.columns.contains("doc_id") =>
        Seq("doc_id") // keymap-less slices with an explicit stable id col
      case Seq(_) => throw new IllegalArgumentException(
        "federated search needs a stable per-doc key: build slices with a " +
          "keymap (the default) or include a doc_id column in the input")
      case other => throw new IllegalArgumentException(
        s"slices disagree on key columns: $other")
    }
    // paths enable the keymap-pruned home-slice key resolution for
    // single-document modes (mlt): only the hashed key bucket is read
    (graft.query.Federation.ofPersisted(slices, analyzer, keyCols, paths),
      keyCols)
  }

  private def fedSearch(spark: SparkSession, paths: Seq[String], query: String,
      opts: Map[String, String], out: String => Unit): Unit = {
    val (fed, keyCols) = federationOf(spark, paths, opts)
    val k = opts.get("k").map(_.toInt).getOrElse(10)
    val limit = opts.get("limit").map(_.toInt).getOrElse(20)
    val mode = opts.getOrElse("mode", "wand")
    if (mode == "suggest") { // merged-vocabulary autocomplete: (term, Σ df)
      out(Seq("term", "df").mkString("\t"))
      fed.suggest(query, n = k).collect()
        .foreach(r => out(s"${r.getString(0)}\t${r.getLong(1)}"))
      return
    }
    if (mode == "dym") { // merged-vocabulary spell correction
      out(Seq("term", "df", "distance").mkString("\t"))
      fed.didYouMean(query,
        maxEdits = opts.get("max-edits").map(_.toInt).getOrElse(2), n = k)
        .collect()
        .foreach(r => out(s"${r.getString(0)}\t${r.getLong(1)}\t${r.getInt(2)}"))
      return
    }
    if (mode == "facets") { // per-slice facet partials re-aggregated
      val field = opts.getOrElse("facet-field", "role")
      out(Seq(field, "n_docs").mkString("\t"))
      fed.facetCounts(query, Or, field)
        .orderBy(col("n_docs").desc, col(field)).collect()
        .foreach(r => out(s"${r.get(0)}\t${r.getLong(1)}"))
      return
    }
    if (mode == "sigterms") { // merged matched-set term frequencies,
      // lift from global df/N — identical to the monolithic list
      out(Seq("term", "df_in", "df", "lift").mkString("\t"))
      fed.significantTerms(query, Or, topN = k,
        minDocCount = opts.get("min-doc-count").map(_.toLong).getOrElse(3L))
        .collect()
        .foreach(r => out(
          f"${r.getString(0)}\t${r.getLong(1)}\t${r.getLong(2)}\t${r.getDouble(3)}%.4f"))
      return
    }
    if (mode == "termvectors") { // one doc's indexed view, addressed by its
      // stable key (comma-separated values matching the slices' key cols)
      out(Seq("term", "tf", "positions").mkString("\t"))
      fed.termVectors(query.split(",").map(_.trim).toSeq).collect()
        .foreach(r => out(s"${r.getString(0)}\t${r.getLong(1)}\t${r.getString(2)}"))
      return
    }
    if (mode == "highlight") { // per-doc hit terms union losslessly
      printCols(fed.highlightTerms(query, Or).limit(limit),
        keyCols :+ "hit_terms", out)
      return
    }
    if (mode == "snippet") { // first-hit windows are per-document
      printCols(fed.snippet(query,
        opts.get("window").map(_.toInt).getOrElse(2)).limit(limit),
        keyCols ++ Seq("first_pos", "snippet"), out)
      return
    }
    if (mode == "explain") { // federated _explain: idf from the merged
      // global df, tf/dl from the doc's home slice — --doc takes the key
      val key = opts.getOrElse("doc", throw new IllegalArgumentException(
        "explain needs --doc <key[,key2…]>")).split(",").map(_.trim).toSeq
      out(Seq("term", "tf", "df", "idf", "tf_factor", "contribution").mkString("\t"))
      fed.explainScore(query, key).collect().foreach(r =>
        out(f"${r.getString(0)}\t${r.getLong(1)}\t${r.getLong(2)}\t" +
          f"${r.getDouble(3)}%.6f\t${r.getDouble(4)}%.6f\t${r.getDouble(5)}%.6f"))
      return
    }
    val (df, ranked): (DataFrame, Boolean) = mode match {
      case "and"    => (fed.matchQuery(query, And).limit(limit), false)
      case "or"     => (fed.matchQuery(query, Or).limit(limit), false)
      case "phrase" => (fed.phraseQuery(query,
        slop = opts.get("slop").map(_.toInt).getOrElse(0)).limit(limit), false)
      case "bm25"   => (fed.bm25TopK(query, k), true)
      case "wand"   => (fed.bm25TopKWand(query, k), true)
      case "all"    => (fed.matchAll().limit(limit), false)
      case "tfidf"  => (fed.matchQueryRanked(query, Or).limit(k), true)
      case "lm"     => (fed.lmDirichletTopK(query, k,
        opts.get("mu").map(_.toDouble).getOrElse(2000.0)), true)
      case "msm"    => (fed.matchQueryMsm(query,
        opts.get("min-match").map(_.toInt).getOrElse(2)).limit(limit), false)
      case "collapse" => (fed.bm25TopKCollapse(query,
        opts.getOrElse("collapse-field", "conv_id"), k), true)
      // boolean trees: membership is per-doc (union); ranked mode scores
      // with the merged global df injected per slice
      case "qs"        => (fed.queryString(query).limit(limit), false)
      case "qs-ranked" => (fed.queryString(query, ranked = true).limit(k), true)
      // global-vocabulary expansion: the expansion set and df ordering come
      // from the MERGED slice dictionaries, matching a monolithic index
      case "prefix" => (fed.prefixQuery(query).limit(limit), false)
      case "fuzzy"  => (fed.fuzzyQuery(query,
        opts.get("max-edits").map(_.toInt).getOrElse(1)).limit(limit), false)
      case "phrase-prefix" => (fed.matchPhrasePrefix(query,
        slop = opts.get("slop").map(_.toInt).getOrElse(0)).limit(limit), false)
      // more-like-this: the source doc is addressed by its stable key
      // (comma-separated values matching the slices' key columns)
      case "mlt" =>
        (fed.moreLikeThis(query.split(",").map(_.trim).toSeq, k = k), true)
      case "wildcard" => (fed.wildcardQuery(query).limit(limit), false)
      case "regexp"   => (fed.regexpQuery(query).limit(limit), false)
      case "range"    =>
        (fed.termRangeQuery(rangeLo(query), rangeHi(query)).limit(limit), false)
      case "rescore" => (fed.bm25TopKRescore(query,
        opts.getOrElse("rescore-phrase", throw new IllegalArgumentException(
          "rescore needs --rescore-phrase")),
        windowSize = opts.get("window-size").map(_.toInt).getOrElse(100), k = k,
        rescoreWeight = opts.get("rescore-weight").map(_.toDouble).getOrElse(1.0),
        slop = opts.get("slop").map(_.toInt).getOrElse(0)), true)
      case other => throw new IllegalArgumentException(
        s"mode '$other' is not federated; use and|or|phrase|phrase-prefix|" +
          "msm|tfidf|bm25|lm|wand|collapse|all|qs|qs-ranked|prefix|fuzzy|" +
          "wildcard|regexp|range|rescore|mlt|termvectors|explain|highlight|" +
          "snippet|suggest|dym|facets|sigterms with comma-separated --index")
    }
    printDocs(df, ranked, keyCols, out)
  }

  private def batchSearch(spark: SparkSession, index: String, queriesFile: String,
      opts: Map[String, String], out: String => Unit): Unit = {
    val k = opts.get("k").map(_.toInt).getOrElse(10)
    val queries = scala.io.Source.fromFile(queriesFile, "UTF-8") match {
      case src => try src.getLines().map(_.trim).filter(_.nonEmpty).toSeq
                  finally src.close()
    }
    require(queries.nonEmpty, s"no queries in $queriesFile")
    if (index.contains(",")) { // --index a,b,c → federated query-set replay:
      // one slot broadcast + pruned scan + per-query cut PER SLICE with
      // global idf/avgdl, one gather window — ranks/scores identical to a
      // monolithic index over the union corpus
      val paths = index.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      val (fed, keyCols) = federationOf(spark, paths, opts)
      val df = opts.getOrElse("mode", "wand") match {
        case "wand" => fed.bm25TopKBatchWand(queries, k)
        case "bm25" => fed.bm25TopKBatch(queries, k)
        case other  => throw new IllegalArgumentException(s"unknown batch mode '$other'")
      }
      out((Seq("q_id", "query", "rank") ++ keyCols :+ "score").mkString("\t"))
      df.orderBy(col("q_id"), col("rank")).collect().foreach { r =>
        val key = keyCols.indices.map(i => r.get(2 + i))
        out((Seq(r.get(0), queries(r.getAs[Number](0).intValue), r.get(1)) ++
          key :+ r.get(keyCols.size + 2)).map(String.valueOf).mkString("\t"))
      }
      return
    }
    val analyzer = checkAnalyzer(index, opts)
    val searcher = Searcher(ParquetIndexStorage.read(spark, index), analyzer)
    val df = opts.getOrElse("mode", "wand") match {
      case "wand" => searcher.bm25TopKBatchWand(queries, k)
      case "bm25" => searcher.bm25TopKBatch(queries, k)
      case other  => throw new IllegalArgumentException(s"unknown batch mode '$other'")
    }
    out(Seq("q_id", "query", "rank", "doc_ord", "score").mkString("\t"))
    df.orderBy(col("q_id"), col("rank")).collect().foreach { r =>
      out(Seq(r.get(0), queries(r.getAs[Number](0).intValue), r.get(1), r.get(2), r.get(3))
        .map(String.valueOf).mkString("\t"))
    }
  }
}
