package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 1-based index of the centroid with the highest cosine similarity to the
  * input vector — the IVF coarse-quantization argmax as ONE codegen'd
  * expression over a reference-object `double[][]` codebook.
  *
  * Why not `array_position(sims, array_max(sims))` over an unrolled
  * `array(cosine(v, c_1) .. cosine(v, c_n))`: that expression's size grows
  * with nlist, the sims array is referenced three times (max, position,
  * null check), and past a handful of centroids the projection degrades to
  * interpreted evaluation — measured ~1 s PER CENTROID over a 60k×64-dim
  * corpus (33 s at nlist=32), i.e. unusable at the nlist≈4096 a 10^12-
  * vector corpus needs. This expression is constant-size generated code
  * (two nested loops), reads each vector element once into a local buffer,
  * and computes the row's norm once instead of once per centroid.
  *
  * Semantics are BIT-identical to the Catalyst struct-fold reference
  * [[graft.ops.Similarity.ivfAssignFold]] (pinned in LshNativeSpec):
  *  - per-centroid sim = `when(d === 0, 0.0).otherwise(dot/d)` with
  *    `d = sqrt(dot(v,v)) * sqrt(dot(c,c))`, every dot a strict
  *    left-to-right double fold (the [[VecDot]] contract); centroid norms
  *    are precomputed driver-side with the same fold;
  *  - argmax keeps the FIRST maximum under Spark's double ordering: strict
  *    `>` (so ties, including ±0.0 which Spark orders equal, keep the
  *    smallest index) with NaN greater than every non-NaN;
  *  - a null input vector yields null; a vector with a null element or a
  *    length different from the codebook's makes every sim null — yields 0
  *    (the fold's never-assigned initial cid), as does sim == -Infinity
  *    everywhere (the fold's `> -Infinity` initial never fires on it);
  *  - an empty codebook yields 0 for every row.
  * Callers map 0/null to a real list (see `Similarity.ivfAssign`).
  */
case class VecNearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  require(centroids.map(_.size).distinct.size <= 1,
    "centroids must all have the same dimension")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<float|double> input, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_nearest_centroid"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // plain arrays for the hot loop; recomputed per executor after deser
  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val centNorms: Array[Double] =
    cents.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      math.sqrt(acc)
    }

  /** The shared scalar kernel (also called from generated code). */
  def nearest(vd: Array[Double]): Int = {
    val k = cents.length
    val n = vd.length
    var nv = 0.0
    var j = 0
    while (j < n) { nv += vd(j) * vd(j); j += 1 }
    val nvs = math.sqrt(nv)
    var best = Double.NegativeInfinity
    var bestIdx = 0
    var c = 0
    while (c < k) {
      val cv = cents(c)
      if (cv.length == n) {
        var dot = 0.0
        var i = 0
        while (i < n) { dot += vd(i) * cv(i); i += 1 }
        val d = nvs * centNorms(c)
        val sim = if (d == 0.0) 0.0 else dot / d
        if ((java.lang.Double.isNaN(sim) && !java.lang.Double.isNaN(best)) ||
            sim > best) {
          best = sim; bestIdx = c + 1
        }
      }
      c += 1
    }
    bestIdx
  }

  /** Input vector as double[], or null when any element is null (every sim
    * would be null — the undefined case). */
  def toDoubles(v: ArrayData): Array[Double] = {
    val n = v.numElements()
    val vd = new Array[Double](n)
    val f = isFloat
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      vd(i) = if (f) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    vd
  }

  override def nullSafeEval(a: Any): Any = {
    val vd = toDoubles(a.asInstanceOf[ArrayData])
    if (vd == null) 0 else nearest(vd)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the kernel runs through `this` as a reference object: constant-size
    // generated code at ANY nlist (the codebook never unrolls into source)
    val self = ctx.addReferenceObj("nearestCentroid", this, classOf[VecNearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val vd = ctx.freshName("vd")
      s"""
         |double[] $vd = $self.toDoubles($a);
         |${ev.value} = ($vd == null) ? 0 : $self.nearest($vd);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecNearestCentroid =
    copy(child = newChild)
}
