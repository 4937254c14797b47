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

  private val params = StorageParams(
    termBuckets = 8, writeGroups = 3, saltFactor = 2,
    blockParams = BlockParams(blockSize = 32, bucketSpan = 128))

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

  test("postings scan is partition-pruned by t_bucket") {
    val path = tmp()
    ParquetIndexStorage.build(docsWithOrd, analyzer, path, params, "src")
    val loaded = ParquetIndexStorage.read(spark, path)
    val s = Searcher(loaded, analyzer)
    val plan = s.matchQuery("t000000", And).queryExecution.executedPlan.toString()
    assert(plan.contains("t_bucket"), s"expected t_bucket pruning in plan")
  }
}
