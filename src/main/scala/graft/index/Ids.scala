package graft.index

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.types.LongType

/** Dense, deterministic 0-based ordinal assignment by global key order —
  * without funnelling the data through a single-partition sort.
  *
  * The reference gets dense IDs from MySQL auto-increment
  * (`/root/reference/storage_rdb_Impl.go:89-104`); at 10^12 rows the Spark
  * equivalent must not be `row_number() OVER (ORDER BY ...)` (one partition).
  * Instead: range-repartition on the key, sort within partitions, count per
  * partition (a tiny driver-side array), broadcast the cumulative offsets,
  * and assign `offset(partition) + local_index` in a single mapPartitions.
  *
  * CORRECTNESS NOTE: the range-partitioned input MUST be persisted before
  * the two passes. RangePartitioner seeds its reservoir sampling from the
  * ephemeral RDD id, so two separate actions on the same lazy plan can see
  * DIFFERENT range bounds — the count pass and the assign pass would then
  * disagree and produce duplicate/missing ordinals (observed at local[8]).
  * Persisting pins one materialized partitioning for both passes. Callers
  * that materialize the output should invoke the returned cleanup to free
  * the pinned input (at extreme scale, substitute a parquet checkpoint).
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

    val counts = sorted
      .groupBy(spark_partition_id().as("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (counts.isEmpty) -1 else counts.keys.max
    val offsets = new Array[Long](maxPid + 1)
    var acc = 0L
    var p = 0
    while (p <= maxPid) { offsets(p) = acc; acc += counts.getOrElse(p, 0L); p += 1 }
    val bc = spark.sparkContext.broadcast(offsets)

    val outSchema = sorted.schema.add(idCol, LongType, nullable = false)
    val out = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var i = if (pid < bc.value.length) bc.value(pid) else 0L
      it.map { r =>
        val o = Row.fromSeq(r.toSeq :+ i)
        i += 1
        o
      }
    }(Encoders.row(outSchema))
    (out, () => { sorted.unpersist(); () })
  }
}
