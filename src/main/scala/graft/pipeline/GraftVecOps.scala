package graft.pipeline

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen vector kernels for the similarity operators — the exact
  * left-fold double arithmetic of the SQL oracles (`list_reduce` over
  * `list_zip`), minus the interpreted higher-order-function evaluation the
  * `aggregate(zip_with(...))` form paid per element.
  *
  * Element types: float or double arrays (embeddings are float; some call
  * sites cast to double — both accepted, folded in double either way).
  */
private[pipeline] object GraftVecOps {
  def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  @inline def get(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** `graft_dot(a, b)` — left-fold dot product in double; null when the
  * lengths differ OR any element is null (exact parity with the zip_with
  * form, where the null pad or null product poisons the sum — a silent
  * 0.0 would let a malformed vector compete in top-k). */
case class GraftDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (GraftVecOps.isVec(left.dataType) && GraftVecOps.isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two float/double arrays, got " +
        s"${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private lazy val lf = left.dataType.asInstanceOf[ArrayType]
    .elementType == FloatType
  private lazy val rf = right.dataType.asInstanceOf[ArrayType]
    .elementType == FloatType
  private lazy val anyNulls =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      lf, rf, anyNulls)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Double r = graft.pipeline.GraftDot.dot($a, $b, $lf, $rf, $anyNulls);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object GraftDot {
  /** Static entry for generated code; null on length mismatch or (when the
    * element type is nullable) any null element. */
  def dot(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean,
      checkNulls: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (a.isNullAt(i) || b.isNullAt(i))) return null
      acc += GraftVecOps.get(a, af, i) * GraftVecOps.get(b, bf, i)
      i += 1
    }
    acc
  }

  private[graft] val info = new ExpressionInfo(
    classOf[GraftDot].getName, null, "graft_dot",
    "_FUNC_(a, b) - left-fold dot product of two float/double arrays in double.",
    "", "", "", "", "4.1.0", "", "scala_udf")

  private[graft] def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2, "graft_dot takes exactly two arguments")
    GraftDot(children(0), children(1))
  }
}

/** `graft_norm2(a)` — left-fold squared norm in double; null when any
  * element is null (parity with the transform+aggregate form). */
case class GraftNorm2(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (GraftVecOps.isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_norm2 requires a float/double array, got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_norm2"

  private lazy val cf = child.dataType.asInstanceOf[ArrayType]
    .elementType == FloatType
  private lazy val anyNulls =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any): Any =
    GraftNorm2.norm2(a.asInstanceOf[ArrayData], cf, anyNulls)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""java.lang.Double r = graft.pipeline.GraftNorm2.norm2($c, $cf, $anyNulls);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftNorm2 {
  /** Static entry for generated code; null on any null element (when the
    * element type is nullable). */
  def norm2(a: ArrayData, af: Boolean, checkNulls: Boolean): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && a.isNullAt(i)) return null
      val v = GraftVecOps.get(a, af, i)
      acc += v * v
      i += 1
    }
    acc
  }

  private[graft] val info = new ExpressionInfo(
    classOf[GraftNorm2].getName, null, "graft_norm2",
    "_FUNC_(a) - left-fold squared norm of a float/double array in double.",
    "", "", "", "", "4.1.0", "", "scala_udf")

  private[graft] def builder(children: Seq[Expression]): Expression = {
    require(children.length == 1, "graft_norm2 takes exactly one argument")
    GraftNorm2(children.head)
  }
}
