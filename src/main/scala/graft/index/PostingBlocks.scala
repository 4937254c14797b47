package graft.index

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One compressed block of up to `blockSize` postings for (term, doc-range
  * bucket): delta-packed ascending docIDs, varint tfs and doc lengths, plus
  * the block-max metadata WAND prunes with (SURVEY.md §4.3).
  *
  * The block-max metadata is `(max_tf, min_dl)`, NOT a precomputed score
  * bound: the BM25 term quotient `tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl))`
  * is increasing in tf and decreasing in dl, so quotient(max_tf, min_dl)
  * upper-bounds every posting in the block for ANY avgdl — which keeps the
  * bounds valid (lossless) after incremental deltas shift the corpus
  * average doc length, without rebuilding untouched blocks. A stored
  * quotient would silently under-bound (= lossy pruning) the moment avgdl
  * grew.
  *
  * Blocks never span doc-range buckets: queries partition work by bucket
  * (doc-space parallelism), each bucket running an independent WAND that
  * needs all of its terms' blocks co-located.
  */
final case class PostingBlockRow(
    term_id: Long,
    bucket: Long,
    min_doc: Long,
    max_doc: Long,
    n: Int,
    max_tf: Long,
    min_dl: Long,
    docs: Array[Byte],
    tfs: Array[Byte],
    dls: Array[Byte]
)

final case class BlockParams(
    blockSize: Int = 128,
    bucketSpan: Long = 1L << 16,
    k1: Double = 1.2,
    b: Double = 0.75
)

object PostingBlocks {

  /** idf-free BM25 term contribution `(tf*(k1+1)) / (tf + k1*((1-b)+(b*dl)/avgdl))`
    * — the quantity the WAND scorer computes (times idf), so block `max_q`
    * upper-bounds exactly what gets scored. */
  def quotient(tf: Long, dl: Long, avgdl: Double, p: BlockParams): Double = {
    val tfd = tf.toDouble
    (tfd * (p.k1 + 1)) / (tfd + p.k1 * ((1 - p.b) + (p.b * dl.toDouble) / avgdl))
  }

  /** Build the block table. The shape the north_star names: shuffle once on
    * the bucket, `sortWithinPartitions(bucket, term_id, doc_ord)`, then a
    * streaming `mapPartitions` packs consecutive runs — no per-group
    * materialization beyond one block. */
  def build(index: TextIndex, params: BlockParams = BlockParams()): Dataset[PostingBlockRow] =
    buildFrom(index.postings, index.docStats, params)

  def buildFrom(
      postings: DataFrame,
      docStats: DataFrame,
      params: BlockParams
  ): Dataset[PostingBlockRow] = {
    val spark = postings.sparkSession
    import spark.implicits._
    val p = params

    // dl is denormalized onto posting rows by the fused build; only join
    // doc_stats for legacy inputs without it (that join is a full shuffle
    // at scale — the denormalized path avoids it)
    val withDl =
      if (postings.columns.contains("dl"))
        postings.select(col("term_id"), col("doc_ord"),
          col("tf").cast("long").as("tf"), col("dl").cast("long").as("dl"))
      else postings
        .select(col("term_id"), col("doc_ord"), col("tf").cast("long").as("tf"))
        .join(docStats.select(col("doc_ord"), col("token_count").cast("long").as("dl")), "doc_ord")

    val rows = withDl
      .withColumn("bucket", floor(col("doc_ord") / lit(p.bucketSpan)).cast("long"))
      .select(col("term_id"), col("bucket"), col("doc_ord"), col("tf"), col("dl"))
      .as[(Long, Long, Long, Long, Long)]

    // Exchange keyed by (bucket, term_id), NOT bucket alone: bucket counts
    // are small (corpus / bucketSpan — ~200 here, and even at 10^12 docs a
    // coarse key concentrates hot doc ranges), so hashing buckets into N
    // bins leaves ~2x straggler bins that cap the stage at ~0.5 scaling
    // (measured). (bucket, term_id) has ~|vocab| x |buckets| distinct keys
    // — balanced bins at any N. Block packing only needs each (bucket,term)
    // RUN co-located, which the pair key preserves. 4 tasks/core amortizes
    // task-duration variance (measured best 8.5s vs 13.5s at 32 threads on
    // 53M postings; identical output either way).
    //
    // The partition count is derived from the INPUT SIZE ESTIMATE, not a
    // constant (guide §2: scale-adaptive partitioning): a fixed
    // 4×shuffle.partitions was right for the 53M-posting corpus it was
    // tuned on but pays ~128 pack tasks of pure scheduling overhead on a
    // KB-sized store. ~1 MB of source bytes per pack task engages every
    // core well before the cap; inputs without statistics (in-memory views
    // over mapPartitions lineage report a huge default estimate) land on
    // the cap, i.e. exactly the previous behavior.
    val sizeBytes = postings.queryExecution.optimizedPlan.stats.sizeInBytes
    val cap = BigInt(4L * spark.sessionState.conf.numShufflePartitions)
    val nParts = ((sizeBytes / (1L << 20)) max BigInt(1) min cap).toInt
    rows
      .repartition(nParts, col("bucket"), col("term_id"))
      .sortWithinPartitions(col("bucket"), col("term_id"), col("doc_ord"))
      .mapPartitions(packRuns(_, p.blockSize))
  }

  /** Block table WITHOUT an exchange or a sort, for postings whose
    * partitions hold pairwise-disjoint doc_ord ranges AND whose rows arrive
    * doc_ord-ascending within each partition — the shape of the fused
    * analyze output over an ordinal-assigned corpus (range partitions in
    * doc order, then only narrow transforms). Rows are streamed once per
    * partition, accumulated into per-term posting runs for the CURRENT
    * doc-range bucket, and flushed as packed blocks when the stream crosses
    * a bucket boundary. A bucket that straddles a partition boundary yields
    * extra (underfilled) blocks whose doc ranges stay disjoint, which the
    * WAND cursor already consumes (blocks sorted by min_doc per term).
    *
    * At scale this removes BOTH the full posting-store shuffle and the
    * per-partition sort from block build: the exchange measured 0.50 N→4N
    * scaling in one JVM and the 3-key Tungsten sort dominated what
    * remained; the streaming pack reads each posting exactly once. Reads
    * are primitive InternalRow accessors — the Dataset-tuple boundary boxes
    * five longs per posting, and that GC pressure is shared across every
    * executor thread.
    *
    * CONTRACT: doc-disjoint, doc-ascending partitions; denormalized `dl`.
    * Violations fail loudly downstream: descending docs break the delta
    * codec's ascending `require`, and overlapping same-(bucket,term) blocks
    * trip the WAND cursor's disjointness guard. */
  def buildFromDocPartitioned(
      postings: DataFrame,
      params: BlockParams
  ): Dataset[PostingBlockRow] = {
    val spark = postings.sparkSession
    import spark.implicits._
    require(postings.columns.contains("dl"),
      "buildFromDocPartitioned requires denormalized dl on posting rows")
    val projected = postings.select(col("term_id"), col("doc_ord"),
      col("tf").cast("long").as("tf"), col("dl").cast("long").as("dl"))
    val blockSize = params.blockSize
    val span = params.bucketSpan
    val packed = projected.queryExecution.toRdd
      .mapPartitions(packStreaming(_, blockSize, span))
    spark.createDataset(packed)
  }

  /** Per-term posting accumulator for one doc-range bucket. */
  private final class TermAcc {
    val docs = new scala.collection.mutable.ArrayBuilder.ofLong
    val tfs = new scala.collection.mutable.ArrayBuilder.ofLong
    val dls = new scala.collection.mutable.ArrayBuilder.ofLong
  }

  /** Streaming bucket-flush pack over (term_id, doc_ord, tf, dl) rows that
    * are doc_ord-ascending: one pass, no sort. Values are copied out of the
    * runtime's reused InternalRow before advancing. */
  private def packStreaming(
      it: Iterator[org.apache.spark.sql.catalyst.InternalRow],
      blockSize: Int,
      bucketSpan: Long
  ): Iterator[PostingBlockRow] = {
    val acc = new java.util.LinkedHashMap[java.lang.Long, TermAcc]()
    var curBucket = Long.MinValue

    def flush(): Iterator[PostingBlockRow] = {
      if (acc.isEmpty) return Iterator.empty
      val bkt = curBucket
      val out = Vector.newBuilder[PostingBlockRow]
      val e = acc.entrySet().iterator()
      while (e.hasNext) {
        val kv = e.next()
        val tid = kv.getKey.longValue()
        val a = kv.getValue
        val docs = a.docs.result()
        val tfs = a.tfs.result()
        val dls = a.dls.result()
        var off = 0
        while (off < docs.length) {
          val n = math.min(blockSize, docs.length - off)
          var i = 0
          var maxTf = 0L
          var minDl = Long.MaxValue
          while (i < n) {
            if (tfs(off + i) > maxTf) maxTf = tfs(off + i)
            if (dls(off + i) < minDl) minDl = dls(off + i)
            i += 1
          }
          out += PostingBlockRow(tid, bkt, docs(off), docs(off + n - 1), n,
            maxTf, minDl,
            BlockCodec.packDeltas(java.util.Arrays.copyOfRange(docs, off, off + n)),
            BlockCodec.packVarints(java.util.Arrays.copyOfRange(tfs, off, off + n)),
            BlockCodec.packVarints(java.util.Arrays.copyOfRange(dls, off, off + n)))
          off += n
        }
      }
      acc.clear()
      out.result().iterator
    }

    new Iterator[Iterator[PostingBlockRow]] {
      private var done = false
      override def hasNext: Boolean = !done || it.hasNext
      override def next(): Iterator[PostingBlockRow] = {
        while (it.hasNext) {
          val r = it.next()
          val tid = r.getLong(0)
          val doc = r.getLong(1)
          val tf = r.getLong(2)
          val dl = r.getLong(3)
          val bkt = doc / bucketSpan
          if (bkt != curBucket) {
            val flushed = flush()
            curBucket = bkt
            var a = acc.get(tid)
            if (a == null) { a = new TermAcc; acc.put(tid, a) }
            a.docs += doc; a.tfs += tf; a.dls += dl
            if (flushed.nonEmpty) return flushed
          } else {
            var a = acc.get(tid)
            if (a == null) { a = new TermAcc; acc.put(tid, a) }
            a.docs += doc; a.tfs += tf; a.dls += dl
          }
        }
        done = true
        flush()
      }
    }.flatten
  }

  /** Streaming packer over (term_id, bucket, doc, tf, dl) rows sorted by
    * (bucket, term_id, doc_ord): consecutive same-(bucket,term) runs become
    * blocks of up to `blockSize` postings — no per-group materialization
    * beyond one block. */
  private def packRuns(
      it: Iterator[(Long, Long, Long, Long, Long)],
      blockSize: Int
  ): Iterator[PostingBlockRow] =
    new Iterator[PostingBlockRow] {
      private val buf = it.buffered
      override def hasNext: Boolean = buf.hasNext
      override def next(): PostingBlockRow = {
        val (tid, bkt, _, _, _) = buf.head
        val docs = Array.newBuilder[Long]
        val tfs = Array.newBuilder[Long]
        val dls = Array.newBuilder[Long]
        var n = 0
        var maxTf = 0L
        var minDl = Long.MaxValue
        var minDoc = Long.MaxValue
        var maxDoc = Long.MinValue
        while (buf.hasNext && n < blockSize && {
          val (t, bk, _, _, _) = buf.head; t == tid && bk == bkt
        }) {
          val (_, _, d, tf, dl) = buf.next()
          docs += d; tfs += tf; dls += dl
          if (d < minDoc) minDoc = d
          if (d > maxDoc) maxDoc = d
          if (tf > maxTf) maxTf = tf
          if (dl < minDl) minDl = dl
          n += 1
        }
        PostingBlockRow(tid, bkt, minDoc, maxDoc, n, maxTf, minDl,
          BlockCodec.packDeltas(docs.result()),
          BlockCodec.packVarints(tfs.result()),
          BlockCodec.packVarints(dls.result()))
      }
    }

  def decodeDocs(b: PostingBlockRow): Array[Long] = BlockCodec.unpackDeltas(b.docs, b.n)
  def decodeTfs(b: PostingBlockRow): Array[Long] = BlockCodec.unpackVarints(b.tfs, b.n)
  def decodeDls(b: PostingBlockRow): Array[Long] = BlockCodec.unpackVarints(b.dls, b.n)
}
