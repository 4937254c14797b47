package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** VecDot must be BIT-identical to the higher-order chain it replaced —
  * every similarity oracle hash-compares its scores — across float values,
  * null shapes, and both the codegen and interpreted eval paths. */
class VecDotSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("a", ArrayType(FloatType, containsNull = true)),
    StructField("b", ArrayType(FloatType, containsNull = true))))

  private def df(rows: Seq[(Seq[java.lang.Float], Seq[java.lang.Float])]) = {
    val data = new java.util.ArrayList[Row]()
    rows.foreach { case (a, b) => data.add(Row(a, b)) }
    spark.createDataFrame(data, schema)
  }

  private def bits(xs: Seq[Any]): Seq[Any] = xs.map {
    case d: java.lang.Double => java.lang.Double.doubleToRawLongBits(d)
    case other => other
  }

  test("bit-identical to the HOF chain on values, nulls, length mismatch") {
    def f(x: Double) = java.lang.Float.valueOf(x.toFloat)
    val rnd = new java.util.Random(7L)
    val randomRows = (1 to 50).map { _ =>
      val n = 1 + rnd.nextInt(8)
      (Seq.fill(n)(f(rnd.nextGaussian() * 10)), Seq.fill(n)(f(rnd.nextGaussian() * 10)))
    }
    val edgeRows: Seq[(Seq[java.lang.Float], Seq[java.lang.Float])] = Seq(
      (Seq(f(1), f(2), f(3)), Seq(f(4), f(5), f(6))),
      (Seq(f(0.1), f(-0.2)), Seq(f(0.3), f(1e30))),
      (Seq.empty, Seq.empty),                    // empty arrays -> 0.0
      (Seq(f(1), f(2)), Seq(f(1))),              // length mismatch -> null
      (Seq(f(1), null), Seq(f(1), f(2))),        // null element -> null
      (null, Seq(f(1))),                         // null array -> null
      (Seq(f(Float.MaxValue)), Seq(f(Float.MaxValue))))
    val d = df(randomRows ++ edgeRows)
    val got = d.select(Similarity.dot(col("a"), col("b"))).collect().map(_.get(0)).toSeq
    val want = d.select(Similarity.dotHof(col("a"), col("b"))).collect().map(_.get(0)).toSeq
    assert(bits(got) == bits(want))
  }

  test("integral/decimal element types widen exactly like the HOF cast") {
    // the HOF chain this replaced accepted ANY array castable to
    // array<double> (integer-quantized embeddings, decimals); VecDot must
    // keep that public-API surface, bit-identically, on a codegen'd plan
    val gen = spark.range(3).select(
        expr("transform(sequence(0, 4), j -> cast(j + id as int))").as("ai"),
        expr("transform(sequence(0, 4), j -> cast(j * 3 + id as bigint))").as("al"),
        expr("transform(sequence(0, 4), j -> cast((j + id) * 1.25 as decimal(12,2)))").as("ad"),
        expr("transform(sequence(0, 4), j -> cast(j * 0.5 + id as float))").as("af"),
        expr("transform(sequence(0, 4), j -> cast(j - 2 as smallint))").as("as"),
        expr("transform(sequence(0, 4), j -> cast(j as tinyint))").as("ab"))
      .repartition(2)
    for ((x, y) <- Seq(("ai", "ai"), ("al", "ai"), ("ad", "al"), ("ai", "af"),
        ("ad", "ad"), ("as", "ab"))) {
      val got = gen.select(Similarity.dot(col(x), col(y))).collect().map(_.get(0)).toSeq
      val want = gen.select(Similarity.dotHof(col(x), col(y))).collect().map(_.get(0)).toSeq
      assert(bits(got) == bits(want), s"$x . $y")
    }
    // 2^53+1 exercises the long->double round-to-nearest parity with Cast
    val big = spark.range(1).select(
      typedLit(Seq(9007199254740993L)).as("x"), typedLit(Seq(1L)).as("y"))
    val g2 = big.select(Similarity.dot(col("x"), col("y"))).head().getDouble(0)
    val w2 = big.select(Similarity.dotHof(col("x"), col("y"))).head().getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(g2) ==
      java.lang.Double.doubleToRawLongBits(w2))
  }

  test("interpreted eval path matches codegen (direct Expression eval)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.ArrayData
    val at = ArrayType(FloatType, containsNull = true)
    val e = VecDot(BoundReference(0, at, nullable = true),
      BoundReference(1, at, nullable = true))
    def arr(xs: Any*): ArrayData = ArrayData.toArrayData(xs.toArray)
    val row = InternalRow(arr(1.0f, 2.5f, -3.0f), arr(4.0f, 0.5f, 2.0f))
    val expect = 1.0f.toDouble * 4.0f + 2.5f.toDouble * 0.5f + (-3.0f).toDouble * 2.0f
    assert(e.eval(row) == expect)
    assert(e.eval(InternalRow(arr(1.0f), arr(1.0f, 2.0f))) == null)
    assert(e.eval(InternalRow(arr(1.0f, null), arr(1.0f, 2.0f))) == null)
    assert(e.eval(InternalRow(null, arr(1.0f))) == null)
    assert(e.eval(InternalRow(arr(), arr())) == 0.0)
  }

  test("cosine consumers stay green on the native path (plan is codegen'd)") {
    def f(x: Double) = java.lang.Float.valueOf(x.toFloat)
    val d = df(Seq((Seq(f(1), f(0)), Seq(f(1), f(0))),
      (Seq(f(0), f(0)), Seq(f(1), f(1)))))
    val got = d.select(round(Similarity.cosine(col("a"), col("b")), 6).as("c"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(1.0, 0.0))
    // a LocalRelation input constant-folds to LocalTableScan (the optimizer
    // evaluates vec_dot interpreted at plan time), and an inline transform()
    // array constructor is itself a non-codegen HOF that project-collapses
    // into the same projection, poisoning it; the repartition boundary keeps
    // vec_dot in its own projection — the shape every real scan-fed plan has
    val gen = spark.range(4)
      .select(expr("transform(sequence(0, 7), j -> cast(j + id as float))").as("a"),
        expr("transform(sequence(0, 7), j -> cast(j * 2 as float))").as("b"))
      .repartition(2)
    val q = gen.select(Similarity.dot(col("a"), col("b")))
    val a1 = q.collect().map(_.getDouble(0)).toSeq
    // AQE only finalizes codegen wrapping post-execution, and the compact
    // tree string marks a codegen'd operator with a `*(stageId)` prefix
    // (the literal word WholeStageCodegen appears only in formatted mode)
    val plan = q.queryExecution.executedPlan.toString()
    val starred = raw"\*\(\d+\) Project \[vec_dot".r
    assert(starred.findFirstIn(plan).isDefined,
      s"expected a codegen'd (starred) vec_dot projection in:\n$plan")
    // and the codegen'd values agree with the HOF chain on that plan
    val a2 = gen.select(Similarity.dotHof(col("a"), col("b"))).collect().map(_.getDouble(0)).toSeq
    assert(bits(a1) == bits(a2))
  }
}
