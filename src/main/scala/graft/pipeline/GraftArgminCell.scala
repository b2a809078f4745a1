package graft.pipeline

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** `graft_argmin_cell(vec, cents_flat, dim)` — the IVF coarse-quantizer
  * cell assignment as a native codegen expression: the index of the
  * nearest centroid (squared L2, ties to the lower index) among
  * `cents_flat.length / dim` centroids stored row-major in a constant
  * double array. Closes the engine's last per-row boxed UDF
  * (Similarity.ivfTopK's `assignList` paid Seq[Float] boxing per corpus
  * row): the centroid matrix is folded out of the literal ONCE at plan
  * time and shipped to generated code as a reference object, so the per
  * row work is a primitive double loop inside whole-stage codegen — the
  * shape that matters when assignment touches every row of a 100 TB
  * corpus.
  *
  * Null contract: null vector → null; a vector whose length differs from
  * `dim`, or with a null element, → null (a malformed embedding must not
  * land in list 0 and silently skew a partition).
  */
case class GraftArgminCell(child: Expression, cents: Array[Double], dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!GraftVecOps.isVec(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_argmin_cell requires a float/double array, got ${child.dataType}")
    else if (dim <= 0 || cents.length == 0 || cents.length % dim != 0)
      TypeCheckResult.TypeCheckFailure(
        s"graft_argmin_cell centroid matrix (${cents.length}) must be a " +
          s"positive multiple of dim ($dim)")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmin_cell"

  private lazy val cf = child.dataType.asInstanceOf[ArrayType]
    .elementType == FloatType
  private lazy val anyNulls =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(v: Any): Any =
    GraftArgminCell.argmin(v.asInstanceOf[ArrayData], cf, anyNulls, cents, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("graftCents", cents, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""java.lang.Integer r = graft.pipeline.GraftArgminCell.argmin(
         |  $c, $cf, $anyNulls, $centsRef, $dim);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftArgminCell {
  /** Static entry for generated code: argmin over k = cents.length/dim
    * row-major centroids by squared L2; strict `<` keeps the lowest index
    * on exact ties. Null on length mismatch or (when the element type is
    * nullable) any null element. */
  def argmin(v: ArrayData, vf: Boolean, checkNulls: Boolean,
      cents: Array[Double], dim: Int): java.lang.Integer = {
    if (v.numElements() != dim) return null
    if (checkNulls) {
      var i = 0
      while (i < dim) { if (v.isNullAt(i)) return null; i += 1 }
    }
    val k = cents.length / dim
    var best = -1
    var bd = Double.MaxValue
    var j = 0
    while (j < k) {
      var s = 0.0
      val off = j * dim
      var i = 0
      while (i < dim) {
        val d = GraftVecOps.get(v, vf, i) - cents(off + i)
        s += d * d
        i += 1
      }
      if (s < bd) { bd = s; best = j }
      j += 1
    }
    // all-NaN distances (a NaN element in the vector) fail every `<`
    // comparison and leave best at -1 — that is a malformed embedding,
    // so it gets the documented malformed→null verdict, not cell -1
    // (which would silently vanish from every IVF probe)
    if (best < 0) null else Integer.valueOf(best)
  }

  private[graft] val info = new ExpressionInfo(
    classOf[GraftArgminCell].getName, null, "graft_argmin_cell",
    "_FUNC_(vec, cents_flat, dim) - index of the nearest centroid " +
      "(squared L2) in a constant row-major centroid matrix.",
    "", "", "", "", "4.1.0", "", "scala_udf")

  private[graft] def builder(children: Seq[Expression]): Expression = {
    require(children.length == 3,
      "graft_argmin_cell takes (vec, cents_flat, dim)")
    require(children(1).foldable && children(2).foldable,
      "graft_argmin_cell centroids and dim must be constant expressions")
    val cents = children(1).eval() match {
      case a: ArrayData => a.toDoubleArray()
      case other => throw new IllegalArgumentException(
        s"graft_argmin_cell centroids must be a double-array literal, got $other")
    }
    val dim = children(2).eval() match {
      case num: java.lang.Number => num.intValue()
      case other => throw new IllegalArgumentException(
        s"graft_argmin_cell dim must be an integer literal, got $other")
    }
    GraftArgminCell(children.head, cents, dim)
  }
}
