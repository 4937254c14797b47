package graft.index

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

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

  /** [[withDenseOrdinalHandle]] plus the input's exact row count, which
    * every assignment path establishes as a by-product (partition counts /
    * collected key count) — callers that would otherwise run a separate
    * `count()` job can reuse it.
    * @param assumeUnsorted skip the sorted-input verification pass when the
    *   caller KNOWS the input has no usable order (e.g. the output of a
    *   hash aggregation) — saves one full scan of the input. */
  def withDenseOrdinalCounted(
      df: DataFrame,
      idCol: String,
      orderKeys: Seq[String],
      numPartitions: Int = 0,
      assumeUnsorted: Boolean = false
  ): (DataFrame, Long, () => Unit) =
    assign(df, idCol, orderKeys, numPartitions, assumeUnsorted)

  /** Returns (ordained DataFrame, cleanup). Call cleanup only after the
    * result has been fully materialized (cached/written).
    *
    * FAST PATH: when the input is ALREADY globally sorted by the keys — the
    * common case for an Iceberg/parquet table maintained in (conv_id,
    * turn_idx) sort order, and for the deterministic generator — the range
    * exchange is pure waste: one verification pass (per-partition count +
    * first/last key + in-partition sortedness, no shuffle) proves the
    * existing partitioning is a valid range partitioning, and ordinals are
    * assigned over it directly. Shuffling the full text payload through a
    * RangePartitioner measured 0.38 N→4N scaling in one JVM (memory-bus
    * bound); the verified fast path is a narrow cached-scan that scales
    * like raw compute. Unsorted input falls back to the exchange, reusing
    * the pinned cache for the sampling pass. */
  def withDenseOrdinalHandle(
      df: DataFrame,
      idCol: String,
      orderKeys: Seq[String],
      numPartitions: Int = 0
  ): (DataFrame, () => Unit) = {
    val (out, _, cleanup) = assign(df, idCol, orderKeys, numPartitions, assumeUnsorted = false)
    (out, cleanup)
  }

  private def assign(
      df: DataFrame,
      idCol: String,
      orderKeys: Seq[String],
      numPartitions: Int,
      assumeUnsorted: Boolean
  ): (DataFrame, Long, () => Unit) = {
    val spark = df.sparkSession
    val np = if (numPartitions > 0) numPartitions
             else spark.sessionState.conf.numShufflePartitions
    val keys = orderKeys.map(col)

    val fastCandidate = orderKeys.forall { k =>
      keyComparator(df.schema(df.schema.fieldIndex(k)).dataType).isDefined
    }
    val (pinnedInput, pinnedHere) =
      if (fastCandidate && df.storageLevel == StorageLevel.NONE) {
        (df.persist(StorageLevel.MEMORY_AND_DISK), true)
      } else (df, false)
    if (fastCandidate) {
      if (!assumeUnsorted) {
        tryPreSorted(pinnedInput, idCol, orderKeys) match {
          case Some((out, total, unpinFast)) =>
            return (out, total,
              () => { unpinFast(); if (pinnedHere) pinnedInput.unpersist(); () })
          case None => // fall through (input stays pinned)
        }
      }
      trySmallBroadcast(pinnedInput, idCol, orderKeys) match {
        case Some((out, total)) =>
          return (out, total, () => { if (pinnedHere) pinnedInput.unpersist(); () })
        case None => // fall through to the exchange below
      }
    }

    val sorted = pinnedInput.repartitionByRange(np, keys: _*).sortWithinPartitions(keys: _*)
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
    (out, acc, () => { sorted.unpersist(); if (pinnedHere) pinnedInput.unpersist(); () })
  }

  /** Natural-order comparator for key types the fast path supports. String
    * comparison uses UTF8String's byte order — the SAME total order the
    * range exchange sorts by — so engaging the fast path never changes
    * which global order ordinals follow. */
  private def keyComparator(dt: DataType): Option[(Any, Any) => Int] = dt match {
    case StringType => Some((a, b) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(a.asInstanceOf[String])
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b.asInstanceOf[String])))
    case IntegerType => Some((a, b) => Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int]))
    case LongType => Some((a, b) => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long]))
    case ShortType => Some((a, b) => java.lang.Short.compare(a.asInstanceOf[Short], b.asInstanceOf[Short]))
    case ByteType => Some((a, b) => java.lang.Byte.compare(a.asInstanceOf[Byte], b.asInstanceOf[Byte]))
    // temporal external values are java.sql.Date/Timestamp by default but
    // java.time.LocalDate/Instant under spark.sql.datetime.java8API.enabled
    // — both families are Comparable with consistent ordering within a
    // column, so compare generically instead of casting to one family
    // (a hard cast would throw inside a task instead of falling back)
    case DateType | TimestampType => Some((a, b) =>
      a.asInstanceOf[Comparable[Any]].compareTo(b))
    case _ => None
  }

  /** Unsorted inputs up to this many rows skip the range exchange too: keys
    * are collected, ordered on the driver, and rejoined as a broadcast
    * (key, ordinal) map — the classic broadcast-small-dim move. The term
    * dictionary (vocab-sized) is the intended customer: its exchange path
    * costs 3-4 fixed-latency jobs that dwarf the actual work. */
  private val SmallMax = 300000

  /** Collect-order-broadcast assignment for small inputs with UNIQUE,
    * non-null keys (duplicates or nulls fall back — a join would reuse one
    * ordinal per duplicated key). Size is gated by a full `count()` first;
    * only an under-limit input has its key projection collected (the count
    * doubles as the pinned input's materializing action — see the inline
    * note on why count-then-collect beats take(N+1)'s quadrupling partition
    * scans here). Assignment is a pure function of the key, so there is no
    * two-pass partition-stability contract at all on this path. */
  private def trySmallBroadcast(
      pinned: DataFrame,
      idCol: String,
      orderKeys: Seq[String]
  ): Option[(DataFrame, Long)] = {
    val spark = pinned.sparkSession
    val schema = pinned.schema
    val idxs = orderKeys.indices.toArray // of the key-only projection below
    val cmps = orderKeys.map(k => keyComparator(schema(schema.fieldIndex(k)).dataType).get).toArray
    def cmpKeys(a: Array[Any], b: Array[Any]): Int = {
      var i = 0
      while (i < cmps.length) {
        val c = cmps(i)(a(i), b(i))
        if (c != 0) return c
        i += 1
      }
      0
    }
    // count first (one job, materializes the pinned input), then a plain
    // collect of the key projection (a cache read): two fixed-latency jobs
    // total, where take(N+1)'s quadrupling partition scans cost four
    val total = pinned.count()
    if (total > SmallMax) return None
    val keyRows = pinned.select(orderKeys.map(col): _*).collect()
    if (keyRows.exists(r => idxs.exists(r.isNullAt))) return None
    val keys = keyRows.map(r => Array.tabulate(r.length)(r.get(_)))
    java.util.Arrays.sort(keys, (a: Array[Any], b: Array[Any]) => cmpKeys(a, b))
    var i = 1
    while (i < keys.length) {
      if (cmpKeys(keys(i - 1), keys(i)) == 0) return None // duplicate keys
      i += 1
    }
    val ordByKey = new java.util.HashMap[Seq[Any], java.lang.Long](keys.length * 2)
    var j = 0
    while (j < keys.length) {
      ordByKey.put(keys(j).toSeq, j.toLong)
      j += 1
    }
    val bc = spark.sparkContext.broadcast(ordByKey)
    val fullIdxs = orderKeys.map(schema.fieldIndex).toArray
    val outSchema = schema.add(idCol, LongType, nullable = false)
    // broadcast-map assignment over the pinned input's rdd: functional in
    // the key, so there is no partition-stability contract at all — and
    // createDataFrame CUTS the plan lineage, like the other paths. (An
    // earlier broadcast-JOIN variant kept the upstream plan inside the
    // output; consumers that rebase plans per micro-batch — IndexMerge
    // under foreachBatch — then grow their plan with every batch until
    // explainString alone OOMs.)
    val outRdd = pinned.rdd.mapPartitions { it =>
      val m = bc.value
      it.map { r =>
        val k: Seq[Any] = fullIdxs.toSeq.map(r.get(_))
        val ord = m.get(k)
        if (ord == null)
          throw new IllegalStateException(
            s"dense-ordinal broadcast map missing key $k; input changed between passes")
        Row.fromSeq(r.toSeq :+ ord.longValue())
      }
    }
    Some((spark.createDataFrame(outRdd, outSchema), keys.length.toLong))
  }

  /** One verification pass over the pinned input: per-partition (count,
    * first key, last key, internally-sorted, any-null). Engages the
    * no-shuffle assignment iff every partition is internally ascending, no
    * key is null, and partition boundaries are globally non-decreasing —
    * i.e. the existing partitioning IS a range partitioning by the keys. */
  private def tryPreSorted(
      pinned: DataFrame,
      idCol: String,
      orderKeys: Seq[String]
  ): Option[(DataFrame, Long, () => Unit)] = {
    val spark = pinned.sparkSession
    val schema = pinned.schema
    val idxs = orderKeys.map(schema.fieldIndex).toArray
    val cmps = idxs.map(i => keyComparator(schema(i).dataType).get)
    def cmpKeys(a: Array[Any], b: Array[Any]): Int = {
      var i = 0
      while (i < cmps.length) {
        val c = cmps(i)(a(i), b(i))
        if (c != 0) return c
        i += 1
      }
      0
    }
    val rdd = pinned.rdd
    val bIdxs = spark.sparkContext.broadcast(idxs)
    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
      val ix = bIdxs.value
      var c = 0L
      var first: Array[Any] = null
      var last: Array[Any] = null
      var sortedIn = true
      var hasNull = false
      while (it.hasNext) {
        val r = it.next()
        val k = new Array[Any](ix.length)
        var j = 0
        while (j < ix.length) {
          val v = r.get(ix(j))
          if (v == null) hasNull = true
          k(j) = v
          j += 1
        }
        if (!hasNull) {
          if (first == null) first = k
          else if (sortedIn && cmpKeys(last, k) > 0) sortedIn = false
          last = k
        }
        c += 1
      }
      Iterator((pid, c, first, last, sortedIn, hasNull))
    }.collect().sortBy(_._1)

    val usable = stats.forall(s => s._5 && !s._6) && {
      val nonEmpty = stats.filter(_._3 != null)
      nonEmpty.zip(nonEmpty.drop(1)).forall { case (a, b) => cmpKeys(a._4, b._3) <= 0 }
    }
    if (!usable) return None

    val nParts = rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    val countByPid = stats.map(s => s._1 -> s._2).toMap
    var p = 0
    while (p < nParts) { offsets(p) = acc; acc += countByPid.getOrElse(p, 0L); p += 1 }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = schema.add(idCol, LongType, nullable = false)
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
    Some((spark.createDataFrame(outRdd, outSchema), acc, () => ()))
  }
}
