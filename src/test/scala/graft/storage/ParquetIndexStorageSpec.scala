package graft.storage

import graft.SparkSpec
import graft.analysis.Analyzer
import graft.fixtures.SyntheticTranscripts
import graft.index.{BlockParams, IndexBuilder}
import graft.query.{And, Or, Searcher}
import org.apache.spark.sql.DataFrame

import java.nio.file.Files

class ParquetIndexStorageSpec extends SparkSpec {

  private val analyzer = Analyzer.standard()
  private def tmp(): String =
    Files.createTempDirectory("graft_idx_").toString

  private lazy val turns = SyntheticTranscripts.df(spark, SyntheticTranscripts.Params(
    seed = 11L, nConvs = 80, maxTurnsPerConv = 5, vocabSize = 60,
    minLen = 3, maxLen = 25, partitions = 4)).cache()

  private lazy val memIndex = IndexBuilder.buildFromTurns(turns, analyzer).cache()
  private lazy val memSearcher = new Searcher(memIndex, analyzer)

  // dGroupSpan == bucketSpan so the tiny corpus still spans several
  // doc-range groups (the partition-pruning unit incremental deltas touch)
  private val params = StorageParams(
    termBuckets = 8, writeGroups = 3, saltFactor = 2,
    blockParams = BlockParams(blockSize = 32, bucketSpan = 64),
    dGroupSpan = 64, keyCols = Seq("conv_id", "turn_idx"))

  private def docsWithOrd = memIndex.docs

  private def ids(df: DataFrame): Seq[Long] =
    df.select("doc_ord").collect().map(_.getLong(0)).toSeq

  test("write -> read -> query matches the in-memory index") {
    val path = tmp()
    val mf = ParquetIndexStorage.build(docsWithOrd, analyzer, path, params, "synthetic(seed=11)")
    assert(mf.numDocs == memIndex.numDocs)
    assert(math.abs(mf.avgDocLen - memIndex.avgDocLen) < 1e-9)

    val loaded = ParquetIndexStorage.read(spark, path)
    val s = Searcher(loaded, analyzer)
    for (q <- Seq("t000000", "t000001 t000005", "hot0 t000002", "planteda plantedb")) {
      assert(ids(s.matchQuery(q, And)) == ids(memSearcher.matchQuery(q, And)), s"AND $q")
      assert(ids(s.matchQuery(q, Or)) == ids(memSearcher.matchQuery(q, Or)), s"OR $q")
      assert(ids(s.phraseQuery(q)) == ids(memSearcher.phraseQuery(q)), s"PHRASE $q")
      assert(ids(s.bm25TopKWand(q, 10)) == ids(memSearcher.bm25TopK(q, 10)), s"WAND $q")
    }
  }

  test("manifest records per-bucket metrics and lineage") {
    val path = tmp()
    val mf = ParquetIndexStorage.build(docsWithOrd, analyzer, path, params, "synthetic(seed=11)")
    val postingStages = mf.stages.filter(_.stage.startsWith("postings_g"))
    assert(postingStages.size == params.writeGroups)
    val buckets = postingStages.flatMap(_.buckets)
    assert(buckets.map(_.bucket).distinct.size == buckets.size)
    assert(buckets.map(_.postings).sum == memIndex.postings.count())
    assert(mf.stages.forall(_.lineage("analyzer") == analyzer.describe))
    assert(mf.stages.forall(_.lineage("source") == "synthetic(seed=11)"))
  }

  test("resume after injected crash == fresh build (and skips committed stages)") {
    val fresh = tmp()
    ParquetIndexStorage.build(docsWithOrd, analyzer, fresh, params, "src")

    val resumed = tmp()
    // crash mid-way through the postings groups
    intercept[InjectedFailure] {
      ParquetIndexStorage.build(docsWithOrd, analyzer, resumed, params, "src",
        failAfter = Some("postings_g1"))
    }
    // markers for completed stages exist; later ones don't
    assert(ManifestIO.exists(s"$resumed/_markers/postings_g1.json"))
    assert(!ManifestIO.exists(s"$resumed/_markers/postings_g2.json"))
    assert(!ManifestIO.exists(s"$resumed/manifest.json"))
    val dictMtimeBefore = Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$resumed/_markers/dict.json"))

    ParquetIndexStorage.build(docsWithOrd, analyzer, resumed, params, "src")
    // committed stage was not redone
    assert(Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$resumed/_markers/dict.json")) == dictMtimeBefore)

    val a = ParquetIndexStorage.read(spark, fresh)
    val b = ParquetIndexStorage.read(spark, resumed)
    assert(a.index.postings.except(b.index.postings).count() == 0)
    assert(b.index.postings.except(a.index.postings).count() == 0)
    assert(a.index.termDict.except(b.index.termDict).count() == 0)
    val qa = ids(Searcher(a, analyzer).bm25TopKWand("t000000 hot1", 10))
    val qb = ids(Searcher(b, analyzer).bm25TopKWand("t000000 hot1", 10))
    assert(qa == qb)
  }

  test("incremental addDocuments == fresh rebuild; untouched partitions untouched") {
    import spark.implicits._
    val path = tmp()
    ParquetIndexStorage.build(docsWithOrd, analyzer, path, params, "src")

    // batch: one replacement (re-worded turn) + two appended docs
    val maxOrd = memIndex.docs.agg(org.apache.spark.sql.functions.max("doc_ord"))
      .head().getLong(0)
    val replacedOrd = 3L
    val docCols = spark.read.parquet(s"$path/docs").drop("d_bucket").columns
    val template = memIndex.docs.filter($"doc_ord" === replacedOrd).collect().head
    def mkRow(ord: Long, text: String) = {
      val m = docCols.map {
        case "doc_ord" => ord.asInstanceOf[Any]
        case "text" => text.asInstanceOf[Any]
        case c => template.get(template.fieldIndex(c))
      }
      org.apache.spark.sql.Row.fromSeq(m.toSeq)
    }
    val schema = spark.read.parquet(s"$path/docs").drop("d_bucket").schema
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        mkRow(replacedOrd, "replacedterm t000001 freshterm"),
        mkRow(maxOrd + 1, "appended t000002 freshterm"),
        mkRow(maxOrd + 2, ""))), schema)

    // untouched-partition evidence: postings leaves (t_bucket=b/d_group=g)
    // whose doc-range group is not named in the delta marker keep their
    // mtimes — the delta only rewrites the touched doc ranges
    def leafDirs(): Map[String, Long] = {
      val root = java.nio.file.Paths.get(s"$path/postings")
      val out = scala.collection.mutable.Map.empty[String, Long]
      java.nio.file.Files.list(root).forEach { tb =>
        if (java.nio.file.Files.isDirectory(tb) &&
            tb.getFileName.toString.startsWith("t_bucket="))
          java.nio.file.Files.list(tb).forEach { dg =>
            if (java.nio.file.Files.isDirectory(dg))
              out(s"${tb.getFileName}/${dg.getFileName}") =
                java.nio.file.Files.getLastModifiedTime(dg).toMillis
          }
      }
      out.toMap
    }
    val before = leafDirs()

    ParquetIndexStorage.addDocuments(spark, path, batch, analyzer, batchId = "b1")

    val touched = ManifestIO.read(
      s"$path/_markers/delta_b1_staged.json", classOf[StageMarker]).get
      .lineage("dGroups").split(",").map(_.toLong).toSet
    before.foreach { case (leaf, mtime) =>
      val g = leaf.split("/")(1).stripPrefix("d_group=").toLong
      if (!touched.contains(g))
        assert(java.nio.file.Files.getLastModifiedTime(
          java.nio.file.Paths.get(s"$path/postings/$leaf")).toMillis == mtime,
          s"untouched leaf $leaf was rewritten")
    }
    val allGroups = before.keySet.map(_.split("/")(1).stripPrefix("d_group=").toLong)
    assert(touched.size < allGroups.size,
      s"delta touched every doc-range group ($touched of $allGroups) — nothing pruned")

    // fresh rebuild over the union corpus must answer identically
    val unionDocs = memIndex.docs
      .join(batch.select("doc_ord"), Seq("doc_ord"), "left_anti")
      .unionByName(batch)
    val freshPath = tmp()
    ParquetIndexStorage.build(unionDocs, analyzer, freshPath, params, "fresh")
    val a = Searcher(ParquetIndexStorage.read(spark, path), analyzer)
    val b = Searcher(ParquetIndexStorage.read(spark, freshPath), analyzer)
    assert(math.abs(a.index.avgDocLen - b.index.avgDocLen) < 1e-12)
    assert(a.index.numDocs == b.index.numDocs)
    for (q <- Seq("replacedterm", "freshterm", "t000001 t000002", "appended",
      "t000000", "planteda plantedb")) {
      assert(ids(a.matchQuery(q, Or)) == ids(b.matchQuery(q, Or)), s"OR $q")
      assert(ids(a.matchQuery(q, And)) == ids(b.matchQuery(q, And)), s"AND $q")
      assert(ids(a.bm25TopKWand(q, 10)) == ids(b.bm25TopK(q, 10)), s"WAND-vs-exhaustive $q")
      assert(ids(a.phraseQuery(q)) == ids(b.phraseQuery(q)), s"PHRASE $q")
    }
    // re-applying the same batchId is a no-op (idempotent recovery path)
    val mfBefore = ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest]).get
    ParquetIndexStorage.addDocuments(spark, path, batch, analyzer, batchId = "b1")
    val mfAfter = ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest]).get
    assert(mfBefore == mfAfter)
  }

  test("removeDocuments == fresh rebuild without those docs; pruned, idempotent") {
    import spark.implicits._
    val path = tmp()
    ParquetIndexStorage.build(docsWithOrd, analyzer, path, params, "src")

    // victims: two docs from the FIRST doc-range group, one resolved through
    // the keymap (key columns) and one by explicit doc_ord
    val victims = memIndex.docs.filter($"doc_ord".isin(3L, 5L))
      .select("conv_id", "turn_idx", "doc_ord").collect()
    val byKey = Seq((victims(0).getString(0), victims(0).getInt(1)))
      .toDF("conv_id", "turn_idx")
    val byOrd = Seq(victims(1).getLong(2)).toDF("doc_ord")

    def leafMtimes(): Map[String, Long] = {
      val root = java.nio.file.Paths.get(s"$path/postings")
      val out = scala.collection.mutable.Map.empty[String, Long]
      java.nio.file.Files.list(root).forEach { tb =>
        if (java.nio.file.Files.isDirectory(tb))
          java.nio.file.Files.list(tb).forEach { dg =>
            if (java.nio.file.Files.isDirectory(dg))
              out(s"${tb.getFileName}/${dg.getFileName}") =
                java.nio.file.Files.getLastModifiedTime(dg).toMillis
          }
      }
      out.toMap
    }
    val before = leafMtimes()

    ParquetIndexStorage.removeDocuments(spark, path, byKey, "rm1")
    ParquetIndexStorage.removeDocuments(spark, path, byOrd, "rm2")

    // pruning evidence: only the victims' doc-range groups were rewritten
    val touched = Seq("rm1", "rm2").flatMap { id =>
      ManifestIO.read(s"$path/_markers/delta_${id}_staged.json", classOf[StageMarker])
        .get.lineage("dGroups").split(",").map(_.toLong)
    }.toSet
    val allGroups = before.keySet.map(_.split("/")(1).stripPrefix("d_group=").toLong)
    assert(touched.size < allGroups.size, s"remove touched every group ($touched)")
    before.foreach { case (leaf, mtime) =>
      val g = leaf.split("/")(1).stripPrefix("d_group=").toLong
      if (!touched.contains(g))
        assert(java.nio.file.Files.getLastModifiedTime(
          java.nio.file.Paths.get(s"$path/postings/$leaf")).toMillis == mtime,
          s"untouched leaf $leaf was rewritten by remove")
    }

    // fresh rebuild WITHOUT the victims answers identically (docs, dict
    // df/cf, blocks, stats all exact after the removal)
    val remaining = memIndex.docs.filter(!$"doc_ord".isin(3L, 5L))
    val freshPath = tmp()
    ParquetIndexStorage.build(remaining, analyzer, freshPath, params, "fresh")
    val a = Searcher(ParquetIndexStorage.read(spark, path), analyzer)
    val b = Searcher(ParquetIndexStorage.read(spark, freshPath), analyzer)
    assert(a.index.numDocs == b.index.numDocs)
    assert(math.abs(a.index.avgDocLen - b.index.avgDocLen) < 1e-12)
    assert(a.index.termDict.select("term_id", "term", "df", "cf")
      .except(b.index.termDict.select("term_id", "term", "df", "cf")).count() == 0)
    assert(b.index.termDict.select("term_id", "term", "df", "cf")
      .except(a.index.termDict.select("term_id", "term", "df", "cf")).count() == 0)
    for (q <- Seq("t000000", "t000001 t000005", "hot0 t000002", "planteda plantedb")) {
      assert(ids(a.matchQuery(q, Or)) == ids(b.matchQuery(q, Or)), s"OR $q")
      assert(ids(a.bm25TopKWand(q, 10)) == ids(b.bm25TopK(q, 10)), s"WAND $q")
      assert(ids(a.phraseQuery(q)) == ids(b.phraseQuery(q)), s"PHRASE $q")
    }
    assert(ids(a.matchAll()) == ids(b.matchAll()))
    // removed keys no longer resolve through the keymap
    assert(ParquetIndexStorage.lookupOrds(spark, path, byKey).count() == 0)

    // idempotent: re-applying an applied id and removing already-gone /
    // unknown ordinals are both no-ops
    val mfBefore = ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest]).get
    ParquetIndexStorage.removeDocuments(spark, path, byKey, "rm1")
    assert(ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest]).get == mfBefore)
    val mf3 = ParquetIndexStorage.removeDocuments(spark, path,
      Seq(3L, 5L, 999999L).toDF("doc_ord"), "rm3")
    assert(mf3.numDocs == mfBefore.numDocs)
    assert(math.abs(mf3.avgDocLen - mfBefore.avgDocLen) < 1e-12)
  }

  test("a batch id reused across add/remove kinds fails loudly, not no-ops") {
    import spark.implicits._
    val path = tmp()
    ParquetIndexStorage.build(docsWithOrd, analyzer, path, params, "src")
    val docCols = spark.read.parquet(s"$path/docs").drop("d_bucket").columns
    val batch = memIndex.docs.filter($"doc_ord" === 3L)
      .select(docCols.map(org.apache.spark.sql.functions.col): _*)
    ParquetIndexStorage.addDocuments(spark, path, batch, analyzer, "shared_id")
    val e = intercept[IllegalArgumentException] {
      ParquetIndexStorage.removeDocuments(spark, path,
        Seq(3L).toDF("doc_ord"), "shared_id")
    }
    assert(e.getMessage.contains("'add'") && e.getMessage.contains("shared_id"))
    // and the reverse direction
    ParquetIndexStorage.removeDocuments(spark, path, Seq(5L).toDF("doc_ord"), "rm_id")
    val e2 = intercept[IllegalArgumentException] {
      ParquetIndexStorage.addDocuments(spark, path, batch, analyzer, "rm_id")
    }
    assert(e2.getMessage.contains("'remove'"))
  }

  test("removing every doc of a d_bucket deletes its partitions (no stale rows)") {
    import spark.implicits._
    val path = tmp()
    ParquetIndexStorage.build(docsWithOrd, analyzer, path, params, "src")
    // bucketSpan=64: ords 64..127 form d_bucket 1
    val bucket1 = memIndex.docs.filter($"doc_ord" >= 64L && $"doc_ord" < 128L)
      .select("doc_ord")
    assert(bucket1.count() > 0)
    ParquetIndexStorage.removeDocuments(spark, path, bucket1, "rmb1")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/docs/d_bucket=1")),
      "emptied docs partition must be deleted, not left stale")
    // blocks are (t_bucket, d_group)-partitioned: every leaf of the
    // emptied doc group must be gone
    val blockLeaves = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$path/blocks")).iterator()
    blockLeaves.forEachRemaining { tb =>
      assert(!java.nio.file.Files.exists(tb.resolve("d_group=1")),
        s"stale block leaf $tb/d_group=1")
    }
    val s = Searcher(ParquetIndexStorage.read(spark, path), analyzer)
    val got = ids(s.matchAll()).toSet
    assert(got.intersect((64L until 128L).toSet).isEmpty)
    assert(s.index.numDocs == memIndex.numDocs - bucket1.count())
  }

  test("compact after removals == fresh dense rebuild of the survivors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, row_number}
    val path = tmp()
    ParquetIndexStorage.build(docsWithOrd, analyzer, path, params, "src")
    // carve holes across several d_buckets (span 64)
    val victims = Seq(3L, 5L, 64L, 70L, 129L, 200L)
    ParquetIndexStorage.removeDocuments(spark, path,
      victims.toDF("doc_ord"), "rm_for_compact")
    val densityBefore = ParquetIndexStorage.ordinalDensity(spark, path)
    assert(densityBefore < 1.0, s"removals must open holes ($densityBefore)")

    val mfC = ParquetIndexStorage.compact(spark, path, "c0")
    assert(ParquetIndexStorage.ordinalDensity(spark, path) == 1.0)

    // fresh build over the survivors with DENSE ordinals in old-ord order
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_ord"))
    val survivors = memIndex.docs.filter(!col("doc_ord").isin(victims: _*))
      .withColumn("new_ord", row_number().over(w).cast("long") - 1L)
      .drop("doc_ord").withColumnRenamed("new_ord", "doc_ord")
      // original column order: Dataset.except is positional
      .select(memIndex.docs.columns.map(col): _*)
    val freshPath = tmp()
    val mfF = ParquetIndexStorage.build(survivors, analyzer, freshPath, params, "fresh")
    assert(mfC.numDocs == mfF.numDocs)
    assert(math.abs(mfC.avgDocLen - mfF.avgDocLen) < 1e-12)

    // every table is content-identical to the fresh dense build
    val a = ParquetIndexStorage.read(spark, path)
    val b = ParquetIndexStorage.read(spark, freshPath)
    def sym(x0: org.apache.spark.sql.DataFrame, y0: org.apache.spark.sql.DataFrame,
        what: String): Unit = {
      // name-normalized column order: except() is positional, and the table
      // column order legitimately differs across write paths (a remove
      // delta's join moves doc_ord first; a fresh build keeps input order)
      val cols = x0.columns.sorted
      assert(y0.columns.sorted.sameElements(cols), s"$what: schemas differ")
      val (x, y) = (x0.select(cols.map(col): _*), y0.select(cols.map(col): _*))
      assert(x.except(y).count() == 0, s"$what: compacted has extra rows")
      assert(y.except(x).count() == 0, s"$what: compacted is missing rows")
    }
    sym(a.index.docs, b.index.docs, "docs")
    sym(a.index.postings, b.index.postings, "postings")
    sym(a.index.termDict.select("term_id", "term", "df", "cf"),
      b.index.termDict.select("term_id", "term", "df", "cf"), "term_dict")
    sym(a.blocks.toDF(), b.blocks.toDF(), "blocks")
    sym(spark.read.parquet(s"$path/doc_stats").drop("d_bucket"),
      spark.read.parquet(s"$freshPath/doc_stats").drop("d_bucket"), "doc_stats")

    // queries identical, keymap resolves keys to the REMAPPED ordinals
    val sa = Searcher(a, analyzer)
    val sb = Searcher(b, analyzer)
    for (q <- Seq("t000000", "t000001 t000005", "hot0 t000002", "planteda plantedb")) {
      assert(ids(sa.matchQuery(q, And)) == ids(sb.matchQuery(q, And)), s"AND $q")
      assert(ids(sa.bm25TopKWand(q, 10)) == ids(sb.bm25TopK(q, 10)), s"WAND $q")
      assert(ids(sa.phraseQuery(q)) == ids(sb.phraseQuery(q)), s"PHRASE $q")
    }
    val keyProbe = memIndex.docs.filter(col("doc_ord") === 10L)
      .select("conv_id", "turn_idx")
    val resolved = ParquetIndexStorage.lookupOrds(spark, path, keyProbe)
      .collect().map(_.getLong(2))
    val expected = a.index.docs
      .join(keyProbe, Seq("conv_id", "turn_idx"), "left_semi")
      .collect().map(_.getAs[Long]("doc_ord"))
    assert(resolved.toSet == expected.toSet && resolved.nonEmpty)

    // idempotent: re-running the applied id changes nothing
    val mfBefore = ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest]).get
    ParquetIndexStorage.compact(spark, path, "c0")
    assert(ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest]).get == mfBefore)

    // a delta AFTER compaction appends cleanly at the new dense frontier
    val docCols = spark.read.parquet(s"$path/docs").drop("d_bucket").columns
    val template = a.index.docs.limit(1).collect().head
    val row = org.apache.spark.sql.Row.fromSeq(docCols.map {
      case "doc_ord" => mfC.numDocs.asInstanceOf[Any]
      case "text" => "postcompact t000001".asInstanceOf[Any]
      case "conv_id" => "post_compact_conv".asInstanceOf[Any]
      case "turn_idx" => 0.asInstanceOf[Any]
      case c => template.get(template.fieldIndex(c))
    }.toSeq)
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row)),
      spark.read.parquet(s"$path/docs").drop("d_bucket").schema)
    val mf2 = ParquetIndexStorage.addDocuments(spark, path, batch, analyzer, "post_c0")
    assert(mf2.numDocs == mfC.numDocs + 1)
    val sa2 = Searcher(ParquetIndexStorage.read(spark, path), analyzer)
    assert(ids(sa2.matchQuery("postcompact", And)) == Seq(mfC.numDocs))
  }

  test("compactGroups: sparse-group compaction == fresh build with the same " +
      "per-group remap; untouched leaves keep their mtimes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, floor, lit, row_number}
    val path = tmp()
    // 2 WAND buckets per d_group so the sub-group bucket-offset remap is
    // exercised (a dense rank must carry across the group's buckets); a
    // bigger corpus than the shared fixture so 3+ groups of 128 exist
    val p2 = params.copy(dGroupSpan = 128)
    val turns2 = SyntheticTranscripts.df(spark, SyntheticTranscripts.Params(
      seed = 12L, nConvs = 160, maxTurnsPerConv = 5, vocabSize = 60,
      minLen = 3, maxLen = 25, partitions = 4)).cache()
    val idx2 = IndexBuilder.buildFromTurns(turns2, analyzer).cache()
    ParquetIndexStorage.build(idx2.docs, analyzer, path, p2, "src")
    val maxOrd = idx2.docs.agg(org.apache.spark.sql.functions.max("doc_ord"))
      .head().getLong(0)
    assert(maxOrd >= 384, s"fixture must span 3+ groups of 128 (max=$maxOrd)")
    // churn groups 0 and 2 heavily; leave group 1 (ords 128..255) intact
    val victims = (0L to 120L by 2L) ++ (256L to 380L by 2L)
    ParquetIndexStorage.removeDocuments(spark, path, victims.toDF("doc_ord"), "rm_pg")

    // density-driven selection finds exactly the churned groups
    val sparse = ParquetIndexStorage.sparseDGroups(spark, path, threshold = 0.75)
    assert(sparse.contains(0L) && sparse.contains(2L), s"sparse=$sparse")
    assert(!sparse.contains(1L), s"untouched group selected: $sparse")

    def leafMtimes(sub: String): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$path/$sub")).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    // untouched group 1: postings d_group=1, docs/doc_stats/blocks buckets 2-3
    val before = (leafMtimes("postings").filter(_._1.contains("d_group=1")),
      leafMtimes("docs").filter(_._1.contains("d_bucket=2")),
      leafMtimes("blocks").filter(_._1.contains("d_group=1")))
    assert(before._1.nonEmpty && before._2.nonEmpty && before._3.nonEmpty)

    val mfPG = ParquetIndexStorage.compactGroups(spark, path, "pg0", sparse)
    assert(mfPG.numDocs == idx2.numDocs - victims.count(_ <= maxOrd))

    val after = (leafMtimes("postings").filter(_._1.contains("d_group=1")),
      leafMtimes("docs").filter(_._1.contains("d_bucket=2")),
      leafMtimes("blocks").filter(_._1.contains("d_group=1")))
    assert(after == before, "untouched-group leaves were rewritten")

    // the compacted store == a FRESH build over the survivors with the
    // SAME ordinals (selected groups dense from their base, others kept) —
    // the strongest form of "partial compact == fresh build of the touched
    // groups": every table, including blocks and keymap, must match
    val gSpan = 128L
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("doc_ord"))
    val survivors0 = idx2.docs.filter(!col("doc_ord").isin(victims: _*))
    val expected = survivors0
      .withColumn("g", floor(col("doc_ord") / lit(gSpan)))
      .withColumn("new_ord",
        org.apache.spark.sql.functions.when(col("g").isin(sparse: _*),
          col("g") * lit(gSpan) + row_number().over(wg).cast("long") - 1L)
        .otherwise(col("doc_ord")))
      .drop("doc_ord", "g").withColumnRenamed("new_ord", "doc_ord")
      .select(idx2.docs.columns.map(col): _*)
    val freshPath = tmp()
    ParquetIndexStorage.build(expected, analyzer, freshPath, p2, "fresh")
    val a = ParquetIndexStorage.read(spark, path)
    val b = ParquetIndexStorage.read(spark, freshPath)
    def sym(x0: DataFrame, y0: DataFrame, what: String): Unit = {
      val cols = x0.columns.sorted
      assert(y0.columns.sorted.sameElements(cols), s"$what: schemas differ")
      val (x, y) = (x0.select(cols.map(col): _*), y0.select(cols.map(col): _*))
      assert(x.except(y).count() == 0, s"$what: compacted has extra rows")
      assert(y.except(x).count() == 0, s"$what: compacted is missing rows")
    }
    sym(a.index.docs, b.index.docs, "docs")
    sym(a.index.postings, b.index.postings, "postings")
    sym(a.index.termDict.select("term_id", "term", "df", "cf"),
      b.index.termDict.select("term_id", "term", "df", "cf"), "term_dict")
    sym(a.blocks.toDF(), b.blocks.toDF(), "blocks")
    sym(spark.read.parquet(s"$path/doc_stats").drop("d_bucket"),
      spark.read.parquet(s"$freshPath/doc_stats").drop("d_bucket"), "doc_stats")
    sym(spark.read.parquet(s"$path/keymap").drop("k_bucket"),
      spark.read.parquet(s"$freshPath/keymap").drop("k_bucket"), "keymap")

    // queries ride through unchanged (stable keys — ordinals moved)
    def keys(df: DataFrame): Set[(String, Int)] =
      df.select("conv_id", "turn_idx").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSet
    val sa = Searcher(a, analyzer)
    val sb = Searcher(b, analyzer)
    for (q <- Seq("t000000", "t000001 t000005", "hot0 t000002")) {
      assert(keys(sa.matchQuery(q, And)) == keys(sb.matchQuery(q, And)), s"AND $q")
      assert(keys(sa.bm25TopKWand(q, 10)) == keys(sb.bm25TopK(q, 10)), s"WAND $q")
    }

    // idempotent: re-running the applied id changes nothing
    val mfBefore = ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest]).get
    ParquetIndexStorage.compactGroups(spark, path, "pg0", sparse)
    assert(ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest]).get == mfBefore)
    // selection is quiet now: the compacted groups are dense from base
    assert(ParquetIndexStorage.sparseDGroups(spark, path, threshold = 0.75)
      .forall(g => !sparse.contains(g)))
  }

  test("compactGroups crash recovery: staged and mid-apply crashes re-run; " +
      "a staged group compaction that predates a later delta is refused") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = tmp()
    val p2 = params.copy(dGroupSpan = 128)
    ParquetIndexStorage.build(docsWithOrd, analyzer, path, p2, "src")
    ParquetIndexStorage.removeDocuments(spark, path,
      (0L to 100L by 2L).toDF("doc_ord"), "rm")
    // crash after staging -> re-run completes and matches a clean run
    intercept[Exception] {
      ParquetIndexStorage.compactGroups(spark, path, "pgc", Seq(0L),
        failAfter = Some("staged"))
    }
    ParquetIndexStorage.compactGroups(spark, path, "pgc", Seq(0L))
    // crash mid-apply -> re-run (staging skipped) finishes the overwrites
    ParquetIndexStorage.removeDocuments(spark, path,
      (128L to 200L by 2L).toDF("doc_ord"), "rm2")
    intercept[InjectedFailure] {
      ParquetIndexStorage.compactGroups(spark, path, "pgc2", Seq(1L),
        failAfter = Some("apply_postings"))
    }
    ParquetIndexStorage.compactGroups(spark, path, "pgc2", Seq(1L))
    val s = Searcher(ParquetIndexStorage.read(spark, path), analyzer)
    assert(s.matchQuery("t000000", Or).count() > 0)
    // interleaving guard: stage pg3, then apply ANOTHER delta, then re-run
    // pg3 — its staged tables predate the delta and must be refused
    intercept[Exception] {
      ParquetIndexStorage.compactGroups(spark, path, "pg3", Seq(0L),
        failAfter = Some("staged"))
    }
    ParquetIndexStorage.removeDocuments(spark, path,
      Seq(131L).toDF("doc_ord"), "rm3")
    val ex = intercept[IllegalStateException] {
      ParquetIndexStorage.compactGroups(spark, path, "pg3", Seq(0L))
    }
    assert(ex.getMessage.contains("predates"))
  }

  test("a staged delta that predates a compaction is refused at apply") {
    import spark.implicits._
    val path = tmp()
    ParquetIndexStorage.build(docsWithOrd, analyzer, path, params, "src")
    ParquetIndexStorage.removeDocuments(spark, path, Seq(5L).toDF("doc_ord"), "rm_pre")
    // a delta that STAGED and crashed before apply (the failAfter hook —
    // staged content + staged marker on disk, nothing applied)
    val docCols = spark.read.parquet(s"$path/docs").drop("d_bucket").columns
    val batch = memIndex.docs.filter($"doc_ord" === 7L)
      .select(docCols.map(org.apache.spark.sql.functions.col): _*)
    intercept[InjectedFailure] {
      ParquetIndexStorage.addDocuments(spark, path, batch, analyzer, "orphan",
        failAfter = Some("staged"))
    }
    // a compaction lands before the delta's apply is retried: its ordinals
    // were remapped, so applying the stale staging must refuse loudly
    ParquetIndexStorage.compact(spark, path, "c_between")
    val e = intercept[IllegalStateException] {
      ParquetIndexStorage.addDocuments(spark, path, batch, analyzer, "orphan")
    }
    assert(e.getMessage.contains("predates"), e.getMessage)
    // the store is unharmed and a FRESH batch id applies cleanly
    val n = ParquetIndexStorage.read(spark, path).manifest.numDocs
    ParquetIndexStorage.addDocuments(spark, path, batch
      .withColumn("doc_ord", org.apache.spark.sql.functions.lit(n)),
      analyzer, "fresh_post_c")
    assert(ParquetIndexStorage.read(spark, path).manifest.numDocs == n + 1)
  }

  test("a staged delta that predates ANOTHER applied delta is refused at apply") {
    import org.apache.spark.sql.functions.col
    val path = tmp()
    ParquetIndexStorage.build(docsWithOrd, analyzer, path, params, "src")
    val docCols = spark.read.parquet(s"$path/docs").drop("d_bucket").columns
    // A replaces doc 7, stages, crashes before apply
    val batchA = memIndex.docs.filter(col("doc_ord") === 7L)
      .select(docCols.map(col): _*)
    intercept[InjectedFailure] {
      ParquetIndexStorage.addDocuments(spark, path, batchA, analyzer, "ia",
        failAfter = Some("staged"))
    }
    // B replaces doc 8 — SAME d_bucket/d_group as doc 7 — and applies
    val batchB = memIndex.docs.filter(col("doc_ord") === 8L)
      .withColumn("text", org.apache.spark.sql.functions.lit("interleaved marker8"))
      .select(docCols.map(col): _*)
    ParquetIndexStorage.addDocuments(spark, path, batchB, analyzer, "ib")
    // retrying A must refuse: its staged partitions reflect the store
    // BEFORE B and would silently revert B's replacement
    val e = intercept[IllegalStateException] {
      ParquetIndexStorage.addDocuments(spark, path, batchA, analyzer, "ia")
    }
    assert(e.getMessage.contains("later applied"), e.getMessage)
    // B's content survived
    val s = Searcher(ParquetIndexStorage.read(spark, path), analyzer)
    assert(ids(s.matchQuery("interleaved marker8", And)) == Seq(8L))
    // and the same hazard guards a staged COMPACTION against a later delta
    intercept[InjectedFailure] {
      ParquetIndexStorage.compact(spark, path, "ic", failAfter = Some("staged"))
    }
    ParquetIndexStorage.addDocuments(spark, path, batchA, analyzer, "ia2")
    val e2 = intercept[IllegalStateException] {
      ParquetIndexStorage.compact(spark, path, "ic")
    }
    assert(e2.getMessage.contains("later applied"), e2.getMessage)
  }

  test("a batch carrying duplicate doc_ords is refused loudly") {
    import org.apache.spark.sql.functions.col
    val path = tmp()
    ParquetIndexStorage.build(docsWithOrd, analyzer, path, params, "src")
    val docCols = spark.read.parquet(s"$path/docs").drop("d_bucket").columns
    val one = memIndex.docs.filter(col("doc_ord") === 3L)
      .select(docCols.map(col): _*)
    val e = intercept[IllegalArgumentException] {
      ParquetIndexStorage.addDocuments(spark, path, one.unionAll(one), analyzer, "dup")
    }
    assert(e.getMessage.contains("duplicated doc_ord"), e.getMessage)
    // the refused staging left no marker: the corrected batch reuses the id
    val mf = ParquetIndexStorage.addDocuments(spark, path, one, analyzer, "dup")
    assert(mf.numDocs == memIndex.numDocs)
  }

  test("compact crash between staging and apply recovers by re-running") {
    import spark.implicits._
    val path = tmp()
    ParquetIndexStorage.build(docsWithOrd, analyzer, path, params, "src")
    ParquetIndexStorage.removeDocuments(spark, path,
      Seq(1L, 65L).toDF("doc_ord"), "rm0")
    val before = ids(Searcher(ParquetIndexStorage.read(spark, path), analyzer)
      .bm25TopKWand("t000000 hot1", 10))
    intercept[InjectedFailure] {
      ParquetIndexStorage.compact(spark, path, "cx", failAfter = Some("staged"))
    }
    // crash mid-APPLY too: postings swapped, docs/blocks not yet
    intercept[InjectedFailure] {
      ParquetIndexStorage.compact(spark, path, "cx", failAfter = Some("apply_postings"))
    }
    val mf = ParquetIndexStorage.compact(spark, path, "cx")
    assert(mf.numDocs == memIndex.numDocs - 2)
    assert(ParquetIndexStorage.ordinalDensity(spark, path) == 1.0)
    val s = Searcher(ParquetIndexStorage.read(spark, path), analyzer)
    // same docs (remapped ordinals), so same result COUNT and scores; spot
    // the full equality through the keymap: texts of the top hits match
    assert(ids(s.bm25TopKWand("t000000 hot1", 10)).size == before.size)
    assert(s.index.docs.count() == mf.numDocs)
    // vacuum now reclaims the applied compact staging
    val deleted = ParquetIndexStorage.vacuum(spark, path)
    assert(deleted.exists(_.contains("compact_cx")), deleted.mkString(","))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/_stage/compact_cx")))
    assert(ids(s.matchAll()).size == mf.numDocs.toInt)
  }

  test("compact crash between manifest write and applied marker recovers") {
    import spark.implicits._
    val path = tmp()
    ParquetIndexStorage.build(docsWithOrd, analyzer, path, params, "src")
    ParquetIndexStorage.removeDocuments(spark, path, Seq(2L, 66L).toDF("doc_ord"), "rm0")
    ParquetIndexStorage.compact(spark, path, "cm")
    val mfBefore = ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest]).get
    // the narrowest crash window: every swap done, manifest written (its
    // compact count already includes this batch), applied marker NOT yet —
    // re-running the SAME id must finish the marker, not misread the bumped
    // epoch as a foreign compaction and demand the staging be discarded
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$path/_markers/compact_cm_applied.json"))
    val mf = ParquetIndexStorage.compact(spark, path, "cm")
    assert(mf.stages.count(_.stage == "compact_cm_staged") == 1)
    assert(ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest]).get == mfBefore)
    assert(ManifestIO.exists(s"$path/_markers/compact_cm_applied.json"))
    // and vacuum can now reclaim the staging it previously couldn't
    ParquetIndexStorage.vacuum(spark, path)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/_stage/compact_cm")))
    val s = Searcher(ParquetIndexStorage.read(spark, path), analyzer)
    assert(ids(s.matchAll()).size == mf.numDocs.toInt)
  }

  test("delta crash between manifest write and applied marker recovers") {
    import org.apache.spark.sql.functions.col
    val path = tmp()
    ParquetIndexStorage.build(docsWithOrd, analyzer, path, params, "src")
    val docCols = spark.read.parquet(s"$path/docs").drop("d_bucket").columns
    val batch = memIndex.docs.filter(col("doc_ord") === 9L)
      .select(docCols.map(col): _*)
    ParquetIndexStorage.addDocuments(spark, path, batch, analyzer, "dm")
    val mfBefore = ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest]).get
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$path/_markers/delta_dm_applied.json"))
    val mf = ParquetIndexStorage.addDocuments(spark, path, batch, analyzer, "dm")
    // the re-run must not append the staged stage a second time
    assert(mf.stages.count(_.stage == "delta_dm_staged") == 1)
    assert(ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest]).get == mfBefore)
    assert(ManifestIO.exists(s"$path/_markers/delta_dm_applied.json"))
  }

  test("per-batch INPUT BYTES are bounded by touched partitions, not index size") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    // same vocabulary and same batch against a 1x and a 16x index: if the
    // delta staged against the whole postings/docs store (the O(index) scan
    // trap), bytes read would scale ~16x; directory pruning by d_group /
    // d_bucket / k_bucket keeps them near-constant (the only size-dependent
    // read left is the vocab-sized dictionary, constant here).
    def buildAt(nConvs: Int): String = {
      val t = SyntheticTranscripts.df(spark, SyntheticTranscripts.Params(
        seed = 7L, nConvs = nConvs, maxTurnsPerConv = 5, vocabSize = 60,
        minLen = 3, maxLen = 25, partitions = 4))
      val idx = IndexBuilder.buildFromTurns(t, analyzer)
      val path = tmp()
      ParquetIndexStorage.build(idx.docs, analyzer, path, params, s"bytes($nConvs)")
      path
    }
    val smallPath = buildAt(80)
    val largePath = buildAt(1280)

    val counter = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) counter.addAndGet(m.inputMetrics.bytesRead)
      }
    }
    def measure(body: => Unit): Long = {
      spark.sparkContext.addSparkListener(listener)
      try {
        Thread.sleep(300); counter.set(0)
        body
        var prev = -1L; var stable = 0
        while (stable < 3) {
          Thread.sleep(200)
          val cur = counter.get()
          if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        }
        counter.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    def batchFor(path: String) = {
      val schema = spark.read.parquet(s"$path/docs").drop("d_bucket").schema
      val maxOrd = spark.read.parquet(s"$path/docs")
        .agg(org.apache.spark.sql.functions.max("doc_ord")).head().getLong(0)
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row.fromSeq(schema.fieldNames.map {
          case "doc_ord" => (maxOrd + 1).asInstanceOf[Any]
          case "conv_id" => "znew"
          case "turn_idx" => 0
          case "text" => "appended t000002 freshterm"
          case _ => null
        }.toSeq))), schema)
    }
    val bSmall = measure(
      ParquetIndexStorage.addDocuments(spark, smallPath, batchFor(smallPath), analyzer, "bb1"))
    val bLarge = measure(
      ParquetIndexStorage.addDocuments(spark, largePath, batchFor(largePath), analyzer, "bb1"))
    // 16x corpus; pruned deltas must not read ~16x the bytes. Allow 3x of
    // slack for footer/metadata reads that scale with file count.
    assert(bLarge < bSmall * 3 + (1 << 20),
      s"delta input bytes scale with index size: small=$bSmall large=$bLarge")

    // removal deltas carry the same O(touched partitions) contract: the
    // only size-dependent read is the vocab-sized dictionary (constant
    // vocabulary here), everything else prunes by d_bucket/d_group/k_bucket
    import spark.implicits._
    def removeFor() = Seq(3L).toDF("doc_ord")
    val rSmall = measure(
      ParquetIndexStorage.removeDocuments(spark, smallPath, removeFor(), "rb1"))
    val rLarge = measure(
      ParquetIndexStorage.removeDocuments(spark, largePath, removeFor(), "rb1"))
    assert(rLarge < rSmall * 3 + (1 << 20),
      s"removal input bytes scale with index size: small=$rSmall large=$rLarge")
  }

  test("postings scan is partition-pruned by t_bucket") {
    val path = tmp()
    ParquetIndexStorage.build(docsWithOrd, analyzer, path, params, "src")
    val loaded = ParquetIndexStorage.read(spark, path)
    val s = Searcher(loaded, analyzer)
    val plan = s.matchQuery("t000000", And).queryExecution.executedPlan.toString()
    assert(plan.contains("t_bucket"), s"expected t_bucket pruning in plan")
  }

  test("sortPostingsFiles=true: same query results, files doc_ord-sorted") {
    val path = tmp()
    ParquetIndexStorage.build(docsWithOrd, analyzer, path,
      params.copy(sortPostingsFiles = true), "src")
    val s = Searcher(ParquetIndexStorage.read(spark, path), analyzer)
    for (q <- Seq("t000000", "t000001 t000005", "hot0 t000002")) {
      assert(ids(s.matchQuery(q, And)) == ids(memSearcher.matchQuery(q, And)), s"AND $q")
      assert(ids(s.bm25TopKWand(q, 10)) == ids(memSearcher.bm25TopK(q, 10)), s"WAND $q")
    }
    // every parquet file holds doc_ord-ascending rows (what row-group stats
    // pruning inside a touched d_group relies on); scan order within one
    // file is the file's row order, so adjacent same-file descents = unsorted
    import org.apache.spark.sql.functions._
    val bad = spark.read.parquet(s"$path/postings")
      .select(input_file_name().as("f"), col("doc_ord"))
      .rdd.mapPartitions { it =>
        var prev: (String, Long) = null
        var violations = 0L
        it.foreach { r =>
          val cur = (r.getString(0), r.getLong(1))
          if (prev != null && cur._1 == prev._1 && cur._2 < prev._2) violations += 1
          prev = cur
        }
        Iterator(violations)
      }.sum()
    assert(bad == 0.0, s"found $bad doc_ord-descending adjacencies within files")
  }

  test("deltas on a pre-d_group store are refused, not layout-corrupted") {
    // simulate a formatVersion-2 store: flatten postings to t_bucket-only
    // partitions and stamp dGroupSpan=0 — the layout the old code wrote.
    // A (t_bucket, d_group)-partitioned delta overwrite on top of it would
    // leave BOTH layouts on disk (stale flat files + new two-level dirs).
    val path = tmp()
    ParquetIndexStorage.build(docsWithOrd, analyzer, path, params, "src")
    val flat = spark.read.parquet(s"$path/postings").drop("d_group").cache()
    flat.count()
    flat.write.mode("overwrite").partitionBy("t_bucket").parquet(s"$path/postings_flat")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/postings"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$path/postings_flat"),
      new org.apache.hadoop.fs.Path(s"$path/postings"))
    flat.unpersist()
    val mf = ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest]).get
    ManifestIO.write(s"$path/manifest.json", mf.copy(dGroupSpan = 0L))

    val batch = docsWithOrd.limit(1)
    val e = intercept[IllegalArgumentException] {
      ParquetIndexStorage.addDocuments(spark, path, batch, analyzer, "old_layout_b0")
    }
    assert(e.getMessage.contains("d_group"))
  }

  test("deltas on a keymapped index require the key columns in the batch") {
    val path = tmp()
    ParquetIndexStorage.build(docsWithOrd, analyzer, path, params, "src")
    val noKeys = docsWithOrd.limit(1).select("doc_ord", "text")
    val e = intercept[IllegalArgumentException] {
      ParquetIndexStorage.addDocuments(spark, path, noKeys, analyzer, "nokeys_b0")
    }
    assert(e.getMessage.contains("keymap"))
  }
}
