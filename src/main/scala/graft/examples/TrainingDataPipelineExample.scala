package graft.examples

import graft.ops.{Dedup, Pipeline, TextStats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Runnable end-to-end composition of the training-data operators — the
  * pipeline a 100 TB corpus runs between ingest and training, in the order
  * the stages are cheapest:
  *
  *   1. quality + repetition gates (per-row column math — scan-speed, run
  *      FIRST so later shuffling stages see only survivors), plus the
  *      corpus-LM score gate
  *   2. PII redaction (per-row regexp chain)
  *   3. exact dedup, then MinHash-LSH near-dup clustering with exact
  *      transitive keep-one (connected components), then the
  *      duplicated-span gate on the kept set (before dedup it would drop
  *      every copy instead of keeping one)
  *   4. decontamination against a held-out reference/eval set
  *   5. leakage-safe train/test/val split (stable as the corpus grows)
  *   6. token-budget context packing within each split
  *
  * Every stage is the library operator the DuckDB oracles check; this file
  * only composes them.
  *
  *   sbt -batch "runMain graft.examples.TrainingDataPipelineExample [sfDir]"
  */
object TrainingDataPipelineExample {

  /** The composed pipeline, returned as a DataFrame so callers can write it
    * wherever they like: survivors with (doc_id, split, chunk_id, redacted).
    */
  def run(docs: DataFrame, evalSet: DataFrame): DataFrame = {
    // 1. scan-speed gates, plus the corpus-LM gate (one aggregation pass):
    // outlier-scored docs are gibberish or boilerplate
    val quality = TextStats.quality(docs)
      .where(col("n_tokens") >= 3 && col("alpha_ratio") >= 0.3)
      .select("doc_id")
    val repetition = TextStats.repetition(docs)
      .where(col("dup_line_ratio") <= 0.5 && col("top_bigram_ratio") <= 0.8)
      .select("doc_id")
    val lmOk = TextStats.unigramLogProb(docs)
      .where(col("n_tokens") === 0 || col("avg_logp") >= -12.0)
      .select("doc_id")
    val gated = docs
      .join(quality, Seq("doc_id"), "left_semi")
      .join(repetition, Seq("doc_id"), "left_semi")
      .join(lmOk, Seq("doc_id"), "left_semi")

    // 2. PII scrub (keep the original text for the hash-based stages so
    // dedup keys are stable whether or not the scrub patterns change)
    val redacted = TextStats.redactPii(gated)

    // 3. exact dedup, then near-dup keep-one over the LSH pair graph with
    // exact transitive closure
    val exactKept = Dedup.exact(gated).select(col("keep_id").as("doc_id"))
    val deduped = gated.join(exactKept, Seq("doc_id"), "left_semi")
    val nearPairs = Dedup.minhashLshPairs(deduped, threshold = 0.7)
    val kept = Dedup.dropDuplicatesCC(deduped, nearPairs)

    // 3b. duplicated-span gate AFTER dedup — run before it, the gate would
    // drop EVERY copy of duplicated content instead of letting dedup keep
    // one; after keep-one, a high dup_ratio means residual cross-doc
    // boilerplate (templated spans dedup could not collapse)
    val spanOk = Dedup.duplicateSpans(kept, n = 6)
      .where(col("dup_ratio") <= 0.6)
      .select("doc_id")
    val keptClean = kept.join(spanOk, Seq("doc_id"), "left_semi")

    // 4. benchmark-leakage removal against the (small, broadcast) eval set
    val clean = Dedup.decontaminate(keptClean, evalSet, threshold = 0.5)

    // 5 + 6. stable splits, then pack each split to a token budget
    val split = Pipeline.withSplit(clean, "doc_id", testFrac = 0.05, valFrac = 0.05)
    val packed = Pipeline.packByTokenBudget(
      split, groupCol = "split", orderCol = "doc_id",
      tokens = size(TextStats.tokensCol(col("text"))), budget = 2048)

    packed.join(redacted, Seq("doc_id"))
      .select("doc_id", "split", "chunk_id", "n_tokens", "redacted")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // stand-in eval set: every 20th doc plays the held-out benchmark
    val evalSet = docs.where(pmod(col("doc_id"), lit(20)) === 0)
      .select(col("doc_id"), col("text"))

    val out = run(docs, evalSet).cache()
    val n = out.count()
    val bySplit = out.groupBy("split").count().orderBy("split")
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")
    println(s"pipeline survivors: $n of ${docs.count()} ($bySplit)")
    out.orderBy("doc_id").show(5, truncate = 60)
    spark.stop()
  }
}
