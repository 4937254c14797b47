package graft.examples

import graft.analysis._
import graft.index.IndexBuilder
import graft.query.{And, Searcher}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Runnable usage example: the reference's Japanese pipeline shape
  * (morphological tokenizer + kana reading-form filter,
  * `/root/reference/analyzer.go` + `morphology/kagome.go`) over the in-repo
  * lattice analyzer — index a few Japanese documents, search by surface
  * forms, rank with BM25.
  *
  *   sbt -batch "runMain graft.examples.JapaneseSearchExample"
  */
object JapaneseSearchExample {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ja = Analyzer(Nil,
      MorphologicalTokenizer(LatticeMorphology.demo),
      Seq(KanaReadingformFilter()))
    println("analyze(すもももももももものうち) = " +
      ja.analyze("すもももももももものうち").map(_.term).mkString("/"))

    val schema = StructType(Seq(
      StructField("doc_ord", LongType), StructField("doc_id", LongType),
      StructField("text", StringType)))
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(0L, 1L, "東京都に住む人も形態素解析をします"))
    rows.add(Row(1L, 2L, "京都の天気は良い"))
    rows.add(Row(2L, 3L, "グーグルで全文検索"))
    val docs = spark.createDataFrame(rows, schema)

    val idx = IndexBuilder.build(docs, ja)
    val s = new Searcher(idx, ja)
    def ids(df: org.apache.spark.sql.DataFrame): String =
      df.select("doc_id").collect().map(_.getLong(0)).mkString(",")
    println("match(東京都, AND)      = " + ids(s.matchQuery("東京都", And)))
    println("match(京都 天気, AND)   = " + ids(s.matchQuery("京都 天気", And)))
    println("match(検索, AND)        = " + ids(s.matchQuery("検索", And)))
    println("phrase(形態素 解析)     = " + ids(s.phraseQuery("形態素 解析")))
    println("bm25TopK(東京都 検索)   = " +
      s.bm25TopK("東京都 検索", 3).select("doc_id", "score").collect()
        .map(r => r.getLong(0) + ":" + f"${r.getDouble(1)}%.3f").mkString(" "))
    spark.stop()
  }
}
