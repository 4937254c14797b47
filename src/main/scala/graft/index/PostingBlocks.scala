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
    val nParts = 4 * spark.sessionState.conf.numShufflePartitions
    rows
      .repartition(nParts, col("bucket"), col("term_id"))
      .sortWithinPartitions(col("bucket"), col("term_id"), col("doc_ord"))
      .mapPartitions { it =>
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
            while (buf.hasNext && n < p.blockSize && {
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
      }
  }

  def decodeDocs(b: PostingBlockRow): Array[Long] = BlockCodec.unpackDeltas(b.docs, b.n)
  def decodeTfs(b: PostingBlockRow): Array[Long] = BlockCodec.unpackVarints(b.tfs, b.n)
  def decodeDls(b: PostingBlockRow): Array[Long] = BlockCodec.unpackVarints(b.dls, b.n)
}
