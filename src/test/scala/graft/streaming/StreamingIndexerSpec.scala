package graft.streaming

import graft.SparkSpec
import graft.analysis.Analyzer
import graft.index.IndexBuilder
import graft.query.{Or, Searcher}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming ingestion: a MemoryStream of turns folded into the index via
  * foreachBatch must equal a batch build over everything seen, including
  * replacement of re-delivered (conv_id, turn_idx) turns. */
class StreamingIndexerSpec extends SparkSpec {
  import spark.implicits._

  private val analyzer = Analyzer.standard()

  test("stream-fold == batch build; redelivery replaces") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Int, String)]
    val turns = stream.toDF().toDF("conv_id", "turn_idx", "text")

    val empty = IndexBuilder.build(
      Seq.empty[(Long, String, Int, String)].toDF("doc_ord", "conv_id", "turn_idx", "text"),
      analyzer, materialize = true)
    val si = new StreamingIndexer(empty, analyzer)
    val q = si.writer(turns).start()

    stream.addData(("c1", 0, "aa bb"), ("c1", 1, "cc dd"))
    q.processAllAvailable()
    stream.addData(("c2", 0, "aa zz"), ("c1", 1, "cc REPLACED"))
    q.processAllAvailable()
    q.stop()

    val s = new Searcher(si.index, analyzer)
    def ids(kw: String) =
      s.matchQuery(kw, Or).select("conv_id", "turn_idx").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(si.index.numDocs == 3)
    assert(ids("aa") == Set(("c1", 0), ("c2", 0)))
    assert(ids("replaced") == Set(("c1", 1)))
    assert(ids("dd").isEmpty) // replaced content gone
    assert(ids("zz") == Set(("c2", 0)))
  }
}
