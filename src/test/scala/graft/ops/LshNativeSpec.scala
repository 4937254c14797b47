package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The literal-plane-vector LSH path and the native IVF argmax
  * (VecNearestCentroid) must be BIT-identical to the dynamic higher-order
  * formulations they replace —
  * `ann_lsh_topk` and `dedup_minhash_bands`-style oracles hash-compare
  * bucket-derived outputs, so a single flipped sign bit breaks the gate. */
class LshNativeSpec extends SparkSpec {

  private val dim = 9

  private def vecs(n: Int, withEdges: Boolean) = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(FloatType, containsNull = true))))
    val rnd = new java.util.Random(11L)
    val rows = new java.util.ArrayList[Row]()
    (0 until n).foreach { i =>
      rows.add(Row(i.toLong, Seq.fill(dim)(java.lang.Float.valueOf((rnd.nextGaussian() * 3).toFloat))))
    }
    if (withEdges) {
      rows.add(Row(9001L, Seq.fill(dim)(java.lang.Float.valueOf(0f))))          // zero vector
      rows.add(Row(9002L, null))                                                // null array
      rows.add(Row(9003L, (Seq.fill(dim - 1)(java.lang.Float.valueOf(1f)) :+ null.asInstanceOf[java.lang.Float])))
      // length-mismatched rows: must hash by their REAL projections (the
      // per-row dynamic fallback), not collapse into bucket 0
      rows.add(Row(9004L, Seq.fill(dim + 3)(java.lang.Float.valueOf(1.5f))))
      rows.add(Row(9005L, Seq.fill(dim - 2)(java.lang.Float.valueOf(-2.5f))))
    }
    spark.createDataFrame(rows, schema)
  }

  test("fixed-dim lshBucket is bit-identical to the dynamic fold (both hash families)") {
    val d = vecs(200, withEdges = true)
    for (portable <- Seq(false, true); seed <- Seq(42L, 42L + 7919L)) {
      val got = d.select(col("id"),
          Similarity.lshBucket(col("v"), planes = 14, dim = dim, seed, portable).as("fast"),
          Similarity.lshBucket(col("v"), planes = 14, dim = -1, seed, portable).as("dyn"))
        .collect()
      got.foreach { r =>
        assert(r.getLong(1) == r.getLong(2),
          s"portable=$portable seed=$seed id=${r.getLong(0)}: fast=${r.getLong(1)} dyn=${r.getLong(2)}")
      }
    }
  }

  test("native ivfAssign matches the struct-fold reference, ties and edges included") {
    val d = vecs(150, withEdges = true)
    // codebooks are trained on clean vectors; the null/zero edge rows are
    // exercised on the ASSIGNMENT side below
    val base = Similarity.ivfCentroids(d.where(col("id") < 9000), nlist = 5,
      idCol = "id", vecCol = "v")
    // duplicate a centroid to force an exact sim tie → first (smallest cid) wins
    val cents = base :+ base.head
    val got = Similarity.ivfAssign(d, cents, idCol = "id", vecCol = "v")
      .select("id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = Similarity.ivfAssignFold(d, cents, idCol = "id", vecCol = "v")
      .select("id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == want)
    assert(got.values.exists(_ == 1), "tie duplicate must never win over cid 1")
  }

  test("empty codebook assigns the fold's never-assigned cid 0") {
    val d = vecs(3, withEdges = false)
    val got = Similarity.ivfAssign(d, Seq.empty, idCol = "id", vecCol = "v")
      .select("cid").collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 0, 0))
  }

  test("degenerate vectors stay REACHABLE: assigned to list 1, surfaced by probes") {
    val d = vecs(60, withEdges = true)
    val cents = Similarity.ivfCentroids(d.where(col("id") < 9000), nlist = 4,
      idCol = "id", vecCol = "v")
    val byId = Similarity.ivfAssign(d, cents, idCol = "id", vecCol = "v")
      .select("id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // null array / null element / length-mismatched rows: every sim is null
    // -> list 1 (never the unprobed cid 0, which silently drops the doc)
    Seq(9002L, 9003L, 9004L, 9005L).foreach(id => assert(byId(id) == 1, s"id=$id"))
    assert(!byId.values.exists(_ == 0))
    // and an all-lists probe actually surfaces a degenerate doc (ranked
    // last by its null verify cosine, like bruteForceTopK would rank it)
    val idx = Similarity.IvfIndex(
      Similarity.ivfAssign(d, cents, idCol = "id", vecCol = "v"), cents)
    val q = d.where(col("id") === 0L)
    val got = Similarity.ivfTopKIndexed(idx, q, k = 1000, nprobe = cents.size,
      idCol = "id", vecCol = "v")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got.contains(9002L) && got.contains(9004L))
  }

  test("ivfTopKIndexed empty-codebook result schema follows the input id types") {
    import org.apache.spark.sql.types.StringType
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("v", ArrayType(FloatType, containsNull = true))))
    val empty = spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    val queries = {
      val rows = new java.util.ArrayList[Row]()
      rows.add(Row("q1", Seq.fill(dim)(java.lang.Float.valueOf(1f))))
      spark.createDataFrame(rows, schema)
    }
    val idx = Similarity.ivfIndex(empty, nlist = 4, idCol = "id", vecCol = "v")
    val res = Similarity.ivfTopKIndexed(idx, queries, k = 5, idCol = "id", vecCol = "v")
    assert(res.count() == 0)
    assert(res.schema("q_id").dataType == StringType)
    assert(res.schema("id").dataType == StringType)
    // unions cleanly with a non-empty run over the same id type
    val corpus = vecs(20, withEdges = false)
      .select(concat(lit("d"), col("id")).as("id"), col("v"))
    val nonEmpty = Similarity.ivfTopK(corpus, queries, k = 3, nlist = 4,
      nprobe = 4, idCol = "id", vecCol = "v")
    assert(nonEmpty.unionByName(res).count() == nonEmpty.count())
  }
}
