package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset-plumbing operators for large-scale training-data
  * pipelines (beyond the reference's surface, like the dedup/ANN family):
  * hash-based sampling and train/test splits, stratified per-group draws,
  * and token-budget context packing.
  *
  * Why hash-based rather than `df.sample`/`rand()`: the decision for a row
  * is a PURE FUNCTION of its key — re-running on a grown corpus keeps every
  * previously-sampled row's fate (no resampling churn in incremental
  * pipelines), the same row lands in the same split on every cluster at any
  * parallelism, and the filter is a codegen'd scan predicate (no shuffle,
  * no RNG state per partition).
  *
  * Every operator has a portable twin on the mod-1e9+7 polynomial hash
  * ([[Dedup.polyHash]]) that any SQL engine replicates bit-identically —
  * the DuckDB-oracled variant; production defaults use codegen'd xxhash64.
  */
object Pipeline {

  private val Mill = 1000000L

  /** Integer bucket in [0, 1e6) from the codegen'd hash — fraction
    * thresholds compare integers, no float edge cases. */
  private def bucket(key: Column, salt: String): Column =
    pmod(xxhash64(lit(salt), key.cast("string")), lit(Mill))

  /** Portable twin: two polynomial folds over the salted decimal key string,
    * mixed by three modular squarings. The folds ALONE are not uniform for
    * short keys — a 6-char salted id's polynomial tops out near 3e9 and
    * wraps the 1e9+7 modulus at most twice, so `% 1e6` would inherit the
    * key distribution (measured 0.5 at a requested 0.2 fraction). Squaring
    * mod p avalanches; every intermediate (x*x < ~1e18) is exact in BIGINT
    * in both engines, so the DuckDB twin is bit-identical. */
  private[ops] def bucketPortable(key: Column, salt: String): Column = {
    val s = concat(lit(salt), key.cast("string"))
    var x = pmod(
      Dedup.polyHash(s) + lit(1000003L) * Dedup.polyHash(s, 131),
      lit(Dedup.PortableMod))
    for (_ <- 0 until 3)
      x = pmod(x * x + lit(12345L), lit(Dedup.PortableMod))
    pmod(x, lit(Mill))
  }

  private def thresh(frac: Double): Long = {
    require(frac >= 0.0 && frac <= 1.0, s"fraction $frac outside [0,1]")
    math.round(frac * Mill)
  }

  /** Keep ~`frac` of rows, decided by the key's hash bucket. Monotone in
    * `frac`: the rows kept at 0.2 are a SUBSET of those kept at 0.4 (same
    * salt) — growing a sample never discards previously selected data.
    * Pure filter: no shuffle, stays inside whole-stage codegen. */
  def sampleByHash(df: DataFrame, keyCol: String, frac: Double,
      salt: String = ""): DataFrame =
    df.filter(bucket(col(keyCol), salt) < lit(thresh(frac)))

  /** [[sampleByHash]] on the portable polynomial hash (oracle-checkable). */
  def sampleByHashPortable(df: DataFrame, keyCol: String, frac: Double,
      salt: String = ""): DataFrame =
    df.filter(bucketPortable(col(keyCol), salt) < lit(thresh(frac)))

  /** Assignment expression shared by the split variants: disjoint, total,
    * and stable per key — a doc never migrates between splits as the corpus
    * grows (leakage-safe for train/test). */
  private def splitExpr(b: Column, testFrac: Double, valFrac: Double): Column = {
    require(testFrac + valFrac <= 1.0, "testFrac + valFrac must be <= 1")
    when(b < lit(thresh(testFrac)), "test")
      .when(b < lit(thresh(testFrac) + thresh(valFrac)), "val")
      .otherwise("train")
  }

  /** Add a `split` column ("train"/"test"/"val") decided by the key hash. */
  def withSplit(df: DataFrame, keyCol: String, testFrac: Double,
      valFrac: Double = 0.0, salt: String = ""): DataFrame =
    df.withColumn("split", splitExpr(bucket(col(keyCol), salt), testFrac, valFrac))

  /** [[withSplit]] on the portable polynomial hash (oracle-checkable). */
  def withSplitPortable(df: DataFrame, keyCol: String, testFrac: Double,
      valFrac: Double = 0.0, salt: String = ""): DataFrame =
    df.withColumn("split",
      splitExpr(bucketPortable(col(keyCol), salt), testFrac, valFrac))

  /** Exactly `min(n, |stratum|)` rows per stratum, drawn in hash order
    * (deterministic "reservoir"): one shuffle on the stratum key, then a
    * per-partition top-n window. The (hash, key) sort key makes the draw
    * total-ordered — reruns pick the same rows. At 100 TB this is the
    * per-GROUP exact quota shape; for a global fraction use the shuffle-free
    * [[sampleByHash]] instead. Skewed strata: the window sorts within one
    * partition per stratum — for a pathological mega-stratum, pre-filter
    * with [[sampleByHash]] at a loose fraction first, then apply the quota.
    */
  def stratifiedSampleN(df: DataFrame, strataCol: String, keyCol: String,
      n: Int, salt: String = "", portable: Boolean = false): DataFrame = {
    val h = if (portable) bucketPortable(col(keyCol), salt)
            else bucket(col(keyCol), salt)
    val w = Window.partitionBy(col(strataCol)).orderBy(h, col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n).drop("__rk")
  }

  /** Pack rows into token-budget context chunks within each group: adds
    * `n_tokens` (the evaluated `tokens` expression) and `chunk_id`, where
    * `chunk_id = floor(exclusive_prefix_sum(n_tokens) / budget)` over the
    * group's `orderCol` order.
    *
    * Semantics (budget-QUANTIZED packing): each row's token offset start
    * falls in `[chunk_id*budget, (chunk_id+1)*budget)`, so a chunk's rows
    * hold at most `budget` tokens plus the overflow of its boundary row
    * (an oversized row still gets placed, never dropped). Exact greedy
    * packing (residual resets per chunk) is inherently sequential per
    * group; the quantized rule is ONE window pass — the shape that scales —
    * and is the common practical choice for context-window batching.
    * One shuffle (by group), per-group sort; groups are conversations or
    * sources, bounded in practice. */
  def packByTokenBudget(df: DataFrame, groupCol: String, orderCol: String,
      tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
    df.withColumn("n_tokens", tokens.cast("long"))
      .withColumn("chunk_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / lit(budget))
          .cast("long"))
  }
}
