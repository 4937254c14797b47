package graft.index

import graft.SparkSpec
import graft.analysis.Analyzer
import graft.query.{Or, Searcher}
import org.apache.spark.sql.functions._

/** Regression for the round-1 dense-ordinal landmine: ordinals assigned via
  * `TaskContext.getPartitionId()` inside a Dataset mapPartitions pick up the
  * id of whatever STAGE the operator fuses into. With AQE disabled (Spark
  * force-disables it inside `foreachBatch`), consuming the minted frame
  * through a union shifts partition ids past the offsets array and minted
  * duplicate ids. The fix pins assignment to `rdd.mapPartitionsWithIndex`;
  * these tests run the exact consumption patterns that failed.
  */
class IdsSpec extends SparkSpec {
  import spark.implicits._

  private def withAqeOff[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("union-consumed minted ids stay dense and unique under AQE-off") {
    withAqeOff {
      val old = Seq((0L, "aa"), (1L, "bb"), (2L, "cc"), (3L, "dd")).toDF("id", "term")
      val fresh = Seq(Tuple1("replaced"), Tuple1("zz")).toDF("term")
      val (minted0, cleanup) = Ids.withDenseOrdinalHandle(fresh, "id0", Seq("term"))
      val minted = minted0.select((col("id0") + lit(4L)).as("id"), col("term"))
      val all = old.union(minted).collect().map(r => r.getLong(0) -> r.getString(1))
      cleanup()
      assert(all.map(_._1).distinct.length == all.length,
        s"duplicate ids minted: ${all.sortBy(_._1).mkString(", ")}")
      assert(all.toMap.values.toSet == Set("aa", "bb", "cc", "dd", "replaced", "zz"))
      assert(all.map(_._1).sorted.toSeq == (0L to 5L))
    }
  }

  test("ordinals are dense, unique, and key-ordered across many partitions") {
    val n = 10000
    val df = spark.range(n).select(
      concat(lit("k"), lpad((col("id") * 2654435761L % n).cast("string"), 8, "0")).as("key"))
    val out = Ids.withDenseOrdinal(df, "ord", Seq("key"), numPartitions = 16)
      .select("key", "ord").collect().map(r => r.getString(0) -> r.getLong(1))
    assert(out.length == n)
    assert(out.map(_._2).distinct.length == n)
    assert(out.map(_._2).min == 0L && out.map(_._2).max == n - 1L)
    // ordinal order == key order
    assert(out.sortBy(_._2).map(_._1).toSeq == out.map(_._1).sorted.toSeq)
  }

  test("verified-sorted input: no-shuffle fast path, same ordinals as the exchange path") {
    val n = 5000
    // contiguously partitioned AND globally sorted by key: 8 range slices
    val sorted = spark.range(0, n, 1, 8)
      .select(format_string("k%08d", col("id")).as("key"))
    val shuffled = sorted.repartition(8) // round-robin: order destroyed
    def ords(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      val (out, cleanup) = Ids.withDenseOrdinalHandle(df, "ord", Seq("key"))
      val m = out.select("key", "ord").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      cleanup(); m
    }
    // fast path preserves the input's 8 partitions; the exchange path would
    // emit spark.sql.shuffle.partitions (= 4 in tests)
    val (fastOut, fastCleanup) = Ids.withDenseOrdinalHandle(sorted, "ord", Seq("key"))
    assert(fastOut.rdd.getNumPartitions == 8, "fast path must keep the existing partitioning")
    fastCleanup()
    assert(ords(sorted) == ords(shuffled), "fast and exchange paths must assign identical ordinals")
  }

  test("unsorted and null-keyed inputs fall back to the exchange and stay dense") {
    val withNull = Seq(Tuple1("bb"), Tuple1(null: String), Tuple1("aa")).toDF("key")
    val out = Ids.withDenseOrdinal(withNull, "ord", Seq("key"))
      .select("ord").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(0L, 1L, 2L))
  }

  test("IndexMerge under AQE-off: no term_id collisions, queries correct") {
    withAqeOff {
      val analyzer = Analyzer.standard()
      val base = Seq((0L, "aa bb"), (1L, "cc dd")).toDF("doc_ord", "text")
      val idx0 = IndexBuilder.build(base, analyzer, materialize = true)
      val add = Seq((2L, "aa zz"), (1L, "cc replaced")).toDF("doc_ord", "text")
      val merged = IndexMerge.addDocuments(idx0, add, analyzer, materialize = true)
      val dict = merged.termDict.select("term_id", "term").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      assert(dict.map(_._1).distinct.length == dict.length,
        s"duplicate term_ids: ${dict.sortBy(_._1).mkString(", ")}")
      val s = new Searcher(merged, analyzer)
      def ids(kw: String) = s.matchQuery(kw, Or).select("doc_ord").collect().map(_.getLong(0)).toSet
      assert(ids("replaced") == Set(1L))
      assert(ids("zz") == Set(2L))
      assert(ids("dd").isEmpty)
    }
  }
}
