package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** The SQL registration path (`spark.sql.extensions=graft.GraftExtensions`)
  * must produce the SAME scores as the Scala Column API — a pipeline's
  * results can't depend on which surface authored it. */
class GraftExtensionsSpec extends SparkSpec {

  /** A second session on the shared SparkContext with the extension
    * applied. `spark.sql.extensions` itself is a STATIC conf read from the
    * SparkContext at session build — unreachable once a shared test context
    * exists — so the classname + no-arg-constructor contract a cluster's
    * `--conf spark.sql.extensions=graft.GraftExtensions` relies on is
    * proven by reflective instantiation instead. */
  private lazy val sqlSession: SparkSession = {
    spark.sparkContext // make sure the shared context exists first
    val ext = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try SparkSession.builder()
      .master("local[4]")
      .withExtensions(ext)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("vec_dot / vec_norm / vec_cosine resolve in SQL with VecDot semantics") {
    val r = sqlSession.sql(
      """SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |       vec_norm(array(3.0D, 4.0D)) AS n,
        |       vec_dot(array(1.0F), array(1.0F, 2.0F)) AS len_mismatch,
        |       vec_dot(cast(null as array<float>), array(1.0F)) AS null_arr,
        |       vec_cosine(array(0.0F, 0.0F), array(1.0F, 2.0F)) AS zero_guard
        |""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.isNullAt(2), "length mismatch must be null like the Column path")
    assert(r.isNullAt(3))
    assert(r.getDouble(4) == 0.0, "zero-norm guard must return 0.0, not null/NaN")
  }

  test("SQL vec_cosine is bit-identical to Similarity.cosine on random vectors") {
    import sqlSession.implicits._
    val rnd = new scala.util.Random(3L)
    val rows = Seq.fill(300)((
      Seq.fill(16)(rnd.nextFloat() * 4 - 2),
      Seq.fill(16)(rnd.nextFloat() * 4 - 2)))
    val df = rows.toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val viaSql = sqlSession.sql("SELECT vec_cosine(a, b) AS c FROM vecs")
      .collect().map(_.getDouble(0))
    val viaColumn = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    viaSql.zip(viaColumn).zipWithIndex.foreach { case ((s, c), i) =>
      assert(java.lang.Double.doubleToRawLongBits(s) == java.lang.Double.doubleToRawLongBits(c),
        s"row $i: sql=$s column=$c")
    }
  }

  test("functions do NOT leak into sessions built without the extension") {
    val err = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0F), array(1.0F))").head()
    }
    assert(err.getMessage.toLowerCase.contains("vec_dot"))
  }
}
