package graft.index

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Dense, deterministic 0-based ordinal assignment by global key order —
  * without funnelling the data through a single-partition sort.
  *
  * The reference gets dense IDs from MySQL auto-increment
  * (`/root/reference/storage_rdb_Impl.go:89-104`); at 10^12 rows the Spark
  * equivalent must not be `row_number() OVER (ORDER BY ...)` (one partition).
  * Instead: range-repartition on the key, sort within partitions, count per
  * partition (a tiny driver-side array), broadcast the cumulative offsets,
  * and assign `offset(partition) + local_index`.
  *
  * CORRECTNESS NOTE 1: the range-partitioned input MUST be persisted before
  * the two passes. RangePartitioner seeds its reservoir sampling from the
  * ephemeral RDD id, so two separate actions on the same lazy plan can see
  * DIFFERENT range bounds — the count pass and the assign pass would then
  * disagree and produce duplicate/missing ordinals (observed at local[8]).
  * Persisting pins one materialized partitioning for both passes. Callers
  * that materialize the output should invoke the returned cleanup to free
  * the pinned input (at extreme scale, substitute a parquet checkpoint).
  *
  * CORRECTNESS NOTE 2: both passes run on ONE captured RDD via
  * `mapPartitionsWithIndex`, whose partition index is pinned to that RDD at
  * plan time. The round-1 implementation used `TaskContext.getPartitionId()`
  * inside a Dataset `mapPartitions`, which is the id of whatever STAGE the
  * operator ends up fused into: when a downstream consumer unions the
  * ordained frame with other data (IndexMerge does, and `foreachBatch`
  * force-disables AQE so nothing re-plans around it), the stage's partition
  * ids shift past the offsets array and — with the then-silent `else 0L`
  * fallback — every row restarted at offset 0, silently minting duplicate
  * ids. Out-of-contract partition ids now fail the job loudly.
  */
object Ids {

  def withDenseOrdinal(
      df: DataFrame,
      idCol: String,
      orderKeys: Seq[String],
      numPartitions: Int = 0
  ): DataFrame = withDenseOrdinalHandle(df, idCol, orderKeys, numPartitions)._1

  /** Returns (ordained DataFrame, cleanup). Call cleanup only after the
    * result has been fully materialized (cached/written). */
  def withDenseOrdinalHandle(
      df: DataFrame,
      idCol: String,
      orderKeys: Seq[String],
      numPartitions: Int = 0
  ): (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    val np = if (numPartitions > 0) numPartitions
             else spark.sessionState.conf.numShufflePartitions
    val keys = orderKeys.map(col)
    val sorted = df.repartitionByRange(np, keys: _*).sortWithinPartitions(keys: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ONE RDD for both passes: its partition indices are immutable plan-time
    // facts, immune to downstream stage fusion (see CORRECTNESS NOTE 2).
    val rdd = sorted.rdd
    val counts = rdd
      .mapPartitionsWithIndex((pid, it) => Iterator(pid -> {
        var c = 0L; while (it.hasNext) { it.next(); c += 1 }; c
      }), preservesPartitioning = true)
      .collect().toMap
    val nParts = rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    var p = 0
    while (p < nParts) { offsets(p) = acc; acc += counts.getOrElse(p, 0L); p += 1 }
    val bc = spark.sparkContext.broadcast(offsets)

    val outSchema = sorted.schema.add(idCol, LongType, nullable = false)
    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      if (pid >= bc.value.length)
        throw new IllegalStateException(
          s"dense-ordinal partition id $pid out of range (${bc.value.length} offsets); " +
            "the pinned input's partitioning changed between passes")
      var i = bc.value(pid)
      it.map { r =>
        val o = Row.fromSeq(r.toSeq :+ i)
        i += 1
        o
      }
    }
    val out = spark.createDataFrame(outRdd, outSchema)
    (out, () => { sorted.unpersist(); () })
  }
}
