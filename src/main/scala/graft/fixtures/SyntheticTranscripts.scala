package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.sql.Timestamp

/** Deterministic synthetic transcripts table (FIXTURES.md §3): the exact
  * input_hint shape (conv_id, turn_idx, role, text, tool, ts), generated
  * distributed with a splittable PRNG keyed on (seed, conv) so the content
  * is identical under any partitioning or parallelism level — the property
  * the N-vs-4N scaling evidence relies on.
  *
  * Vocabulary: `vocabSize` terms `t000000..` with Zipf(s≈1.1) frequencies,
  * a few deliberately hot terms (skew exercise), and planted phrase bigrams
  * `pa pb` for PhraseQuery recall checks.
  */
object SyntheticTranscripts {

  final case class Params(
      seed: Long = 42L,
      nConvs: Int = 1000,
      maxTurnsPerConv: Int = 8,
      vocabSize: Int = 5000,
      minLen: Int = 5,
      maxLen: Int = 200,
      partitions: Int = 0
  )

  final case class TurnRow(
      conv_id: String, turn_idx: Int, role: String, text: String,
      tool: String, ts: Timestamp)

  private val roles = Array("user", "assistant", "tool")
  private val tools = Array("", "", "", "search", "python", "browser")
  val hotTerms: Array[String] = Array("hot0", "hot1", "hot2")
  val phraseA = "planteda"
  val phraseB = "plantedb"

  def df(spark: SparkSession, p: Params): DataFrame = {
    import spark.implicits._
    val np = if (p.partitions > 0) p.partitions
             else spark.sparkContext.defaultParallelism
    // Zipf cumulative weights, computed once and broadcast
    val weights = Array.tabulate(p.vocabSize)(i => 1.0 / math.pow(i + 1.0, 1.1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    val bc = spark.sparkContext.broadcast(cum)
    val params = p

    spark.range(0, params.nConvs.toLong, 1, np).flatMap { conv =>
      val rng = new java.util.Random(params.seed ^ (conv * 0x9E3779B97F4A7C15L))
      val nTurns = 1 + rng.nextInt(params.maxTurnsPerConv)
      val cumW = bc.value
      (0 until nTurns).map { t =>
        val len = params.minLen + rng.nextInt(params.maxLen - params.minLen + 1)
        val sb = new StringBuilder
        var w = 0
        while (w < len) {
          val r = rng.nextDouble()
          val word =
            if (r < 0.02) hotTerms(rng.nextInt(hotTerms.length))          // hot/skewed
            else if (r < 0.025) { w += 1; s"$phraseA $phraseB" }          // planted bigram
            else {
              // binary search the Zipf CDF
              val x = rng.nextDouble() * total
              var lo = 0; var hi = cumW.length - 1
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (cumW(mid) < x) lo = mid + 1 else hi = mid
              }
              f"t$lo%06d"
            }
          if (sb.nonEmpty) sb.append(' ')
          sb.append(word)
          w += 1
        }
        TurnRow(
          f"c$conv%08d", t, roles(t % roles.length), sb.toString,
          tools(rng.nextInt(tools.length)),
          new Timestamp(1700000000000L + conv * 1000L + t))
      }
    }.toDF()
  }
}
