package graft.streaming

import graft.analysis.Analyzer
import graft.index.{IndexBuilder, IndexMerge, TextIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Structured-Streaming index maintenance: a stream of transcript turns is
  * folded into the index one micro-batch at a time via `foreachBatch` +
  * IndexMerge (the Spark analogue of the reference's per-document
  * `AddDocument` + threshold merge, `/root/reference/indexer.go:20-61` —
  * the micro-batch IS the buffer, the merge IS the threshold flush).
  *
  * doc_ord for streamed turns is `xxhash64(conv_id, turn_idx)`-free: it must
  * be dense-ish and stable, so we key on a monotone base handed out per
  * batch (batch sizes are known at merge time). Re-delivered turns (same
  * conv_id, turn_idx) replace their previous version — exactly-once index
  * content under at-least-once delivery.
  */
final class StreamingIndexer(
    initial: TextIndex,
    analyzer: Analyzer,
    textCol: String = "text"
) extends Serializable {

  @volatile private var currentIndex: TextIndex = initial
  @volatile private var nextOrd: Long =
    initial.docs.agg(coalesce(max(col("doc_ord")), lit(-1L))).head().getLong(0) + 1

  def index: TextIndex = currentIndex

  /** Fold one (micro-)batch of turns into the index. Turns whose
    * (conv_id, turn_idx) already exists replace the old version (keeping its
    * doc_ord); new turns get fresh ordinals. */
  def addBatch(turns: DataFrame): Unit = synchronized {
    if (turns.isEmpty) return
    val idx = currentIndex
    // existing keys keep their doc_ord (replacement); new keys get fresh ones
    val keyed = turns.select(col("conv_id"), col("turn_idx"), col(textCol))
      .dropDuplicates("conv_id", "turn_idx")
    val existing = keyed.join(
      idx.docs.select(col("conv_id"), col("turn_idx"), col("doc_ord")),
      Seq("conv_id", "turn_idx"), "inner")
    val fresh0 = keyed.join(
      idx.docs.select(col("conv_id"), col("turn_idx")),
      Seq("conv_id", "turn_idx"), "left_anti")
    val (freshOrd, cleanup) = graft.index.Ids.withDenseOrdinalHandle(
      fresh0, "doc_ord0", Seq("conv_id", "turn_idx"))
    val fresh = freshOrd.withColumn("doc_ord", col("doc_ord0") + lit(nextOrd)).drop("doc_ord0")
    val batchDocs = existing.select("doc_ord", "conv_id", "turn_idx", textCol)
      .unionByName(fresh.select("doc_ord", "conv_id", "turn_idx", textCol))

    val merged = IndexMerge.addDocuments(idx, batchDocs, analyzer, textCol, materialize = true)
    cleanup()
    nextOrd = merged.docs.agg(coalesce(max(col("doc_ord")), lit(-1L))).head().getLong(0) + 1
    val old = currentIndex
    currentIndex = merged
    if (old ne initial) old.unpersist()
  }

  /** Attach to a streaming Dataset of turns; caller starts/stops the query. */
  def writer(turns: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    turns.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => addBatch(batch) }

  def start(turns: DataFrame, trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    writer(turns).trigger(trigger).start()
}
