package graft

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for compute-heavy per-row operators (guide §2.5:
  * "one huge unsplittable file … repartition immediately after the read").
  *
  * A single parquet file under `spark.sql.files.maxPartitionBytes` scans as
  * ONE task, so every downstream narrow stage — analyzer token streams,
  * MinHash signatures, media decode — runs on one core no matter how many
  * the session has (measured in bench/HeadlineProbe: op_mm_decode 1.33 s in
  * a single task, op_dedup_minhash's two heavy stages 0.63 s + 0.65 s each
  * single-task at local[32]). Parquet cannot be split below a row group, so
  * widening `minPartitionNum` does nothing there; an explicit round-robin
  * exchange of the SMALL input rows (before any heavy derived columns or
  * payloads exist) is the only way to engage the cores.
  *
  * Inputs that already scan wide — the 100 TB shape, thousands of files —
  * are returned untouched: the repartition only fires when the physical
  * partition count is below the session's default parallelism, so no
  * shuffle is added where the input is already parallel. Row-level results
  * are identical either way (round-robin repartition is retry-deterministic
  * via Spark's sort-before-repartition default).
  */
object Par {

  /** `df` repartitioned to the session default parallelism when its
    * physical plan would scan fewer than HALF that many partitions; `df`
    * unchanged otherwise (already-parallel inputs never pay the exchange).
    * Call BEFORE deriving heavy columns so the exchange moves the small
    * source rows, not the derived payload. */
  private[graft] def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= target) df
    else df.repartition(target)
  }
}
