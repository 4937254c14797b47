package graft.query

import graft.SparkSpec
import graft.analysis.Analyzer
import graft.query.Percolator.StoredQuery
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Percolation (reverse search): the join shape and the column-compiled
  * stateless shape agree with a driver-evaluated reference on every doc ×
  * query pair, with each other, and the stateless shape runs unchanged
  * under Structured Streaming in append mode. */
class PercolatorSpec extends SparkSpec {
  import spark.implicits._

  private val analyzer = Analyzer.standard()

  private val docs = Seq(
    (1L, "ruby php js"), (2L, "go ruby"), (3L, "ruby go php"),
    (4L, "go php"), (5L, "rust go"), (6L, ""), (7L, "PHP, Ruby!"))

  private val queries = Seq(
    StoredQuery(0L, "ruby php", And),
    StoredQuery(1L, "rust js", Or),
    StoredQuery(2L, "go", And),
    StoredQuery(3L, "zzz unknown", And), // matches nothing
    StoredQuery(4L, "", Or)              // analyzes to no terms
  )

  /** Driver-evaluated reference over the analyzed token sets. */
  private def reference: Set[(Long, Long)] = {
    docs.flatMap { case (id, text) =>
      val toks = analyzer.terms(text).toSet
      queries.flatMap { q =>
        val ts = analyzer.terms(q.keyword).distinct
        val m = ts.nonEmpty &&
          (if (q.logic == And) ts.forall(toks) else ts.exists(toks))
        if (m) Some((id, q.qId)) else None
      }
    }.toSet
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("join-shaped percolation == driver reference") {
    val got = pairs(Percolator.matches(docs.toDF("doc_id", "text"), queries, analyzer))
    assert(got == reference)
    assert(got.contains((7L, 0L))) // analysis applied: punctuation/case folded
    assert(!got.exists(_._2 == 3L) && !got.exists(_._2 == 4L))
  }

  test("stateless column-compiled percolation == join shape") {
    val df = docs.toDF("doc_id", "text")
    assert(pairs(Percolator.matchesStateless(df, queries, analyzer)) ==
      pairs(Percolator.matches(df, queries, analyzer)))
  }

  test("empty query set / empty docs yield empty (doc_id, q_id) frames") {
    val df = docs.toDF("doc_id", "text")
    assert(Percolator.matches(df, Nil, analyzer).count() == 0)
    assert(Percolator.matchesStateless(df, Nil, analyzer).count() == 0)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(pairs(Percolator.matches(empty, queries, analyzer)).isEmpty)
  }

  test("tree percolation == forward boolQuery on the same corpus (parity)") {
    // Reverse (per-doc column eval) and forward (index scan + bitmask) must
    // agree on every tree, including phrase leaves and pure negation.
    import graft.index.IndexBuilder
    val df = docs.toDF("doc_id", "text")
    val indexed = docs.zipWithIndex
      .map { case ((id, t), i) => (i.toLong, id, t) }
      .toDF("doc_ord", "doc_id", "text")
    val searcher = new Searcher(IndexBuilder.build(indexed, analyzer).cache(), analyzer)
    val trees: Seq[BoolQuery] = Seq(
      BTerm("ruby") && BTerm("go"),
      (BTerm("ruby") && BTerm("php")) || BTerm("rust"),
      BTerm("go") && !BTerm("ruby"),
      !BTerm("php"), // pure negation: complement includes the empty doc
      BPhrase("ruby go") && !BTerm("js"),
      BPhrase("go php") || BPhrase("ruby php"),
      !(BTerm("ruby") && BPhrase("php js")),
      // sloppy-phrase and fuzzy leaves (round-3 query-string additions)
      BPhrase("ruby php", slop = 1),
      BPhrase("php ruby", slop = 2) && !BTerm("js"),
      BFuzzy("rubi", 1),
      BFuzzy("rubi", 1) && !BPhrase("go php", slop = 1))
    trees.zipWithIndex.foreach { case (tree, i) =>
      val reverse = pairs(Percolator.matchesBool(df, Seq((0L, tree)), analyzer))
        .map(_._1)
      val forward = searcher.boolQuery(tree)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(reverse == forward, s"tree #$i: $tree")
    }
  }

  test("tree percolation: phrase window edges (short docs, repeated terms)") {
    val df = Seq((1L, "a b a b"), (2L, "b a"), (3L, "a"), (4L, ""))
      .toDF("doc_id", "text")
    // "a b a" needs a window scan past the first occurrence
    assert(pairs(Percolator.matchesBool(df, Seq((0L, BPhrase("a b a"))), analyzer))
      == Set((1L, 0L)))
    // phrase longer than the doc never matches (sequence guard)
    assert(pairs(Percolator.matchesBool(df, Seq((0L, BPhrase("b a b a b"))), analyzer))
      .isEmpty)
    assert(pairs(Percolator.matchesBool(df, Seq((0L, BPhrase("b a"))), analyzer))
      == Set((1L, 0L), (2L, 0L)))
  }

  test("stateless shape percolates a stream in append mode == batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val out = Percolator.matchesStateless(
      stream.toDF().toDF("doc_id", "text"), queries, analyzer)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("perc")
      .outputMode("append").start()
    try {
      stream.addData(docs.take(4))
      q.processAllAvailable()
      stream.addData(docs.drop(4))
      q.processAllAvailable()
      val got = pairs(spark.table("perc"))
      assert(got == reference)
    } finally q.stop()
  }
}
