package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_langhits(text)` — the language-ID marker-word scores in ONE
  * native codegen pass: per [[TextStats.LangProfiles]] profile, the count
  * of profile words present in the doc's DISTINCT token set (the
  * `s_<lang>` integers [[TextStats.langId]] previously computed as one
  * interpreted `filter(toks, isin(...))` lambda per profile). Argmax and
  * tie-break stay in the (codegen'd) when-chain outside. */
case class GraftLangHits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_langhits requires a string argument, got ${child.dataType}")

  override def dataType: DataType = GraftLangHits.Schema
  override def prettyName: String = "graft_langhits"

  override def nullSafeEval(input: Any): Any =
    GraftLangHits.hits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.GraftLangHits.hits($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftLangHits {

  val Schema: StructType = StructType(TextStats.LangProfiles.map {
    case (lang, _) => StructField(s"s_$lang", LongType, nullable = false)
  })

  private val Profiles: Array[Array[String]] =
    TextStats.LangProfiles.map(_._2.toArray).toArray

  /** Static entry for generated code: one decode, one distinct-token set,
    * profile probes against it. */
  def hits(s: UTF8String): InternalRow = {
    val toks = GraftShingles.wsSplit(s.toString)
    // capacity HINT capped like GraftRepStats: no O(n) pre-allocation on
    // a giant doc, no Int overflow
    val cap = math.min(toks.length.toLong * 2L, 1L << 16).toInt.max(16)
    val seen = new java.util.HashSet[String](cap)
    var i = 0
    while (i < toks.length) { seen.add(toks(i)); i += 1 }
    val out = new Array[Any](Profiles.length)
    var p = 0
    while (p < Profiles.length) {
      var c = 0L
      val ws = Profiles(p)
      var w = 0
      while (w < ws.length) {
        if (seen.contains(ws(w))) c += 1
        w += 1
      }
      out(p) = c
      p += 1
    }
    new GenericInternalRow(out)
  }

  private[graft] val info = new ExpressionInfo(
    classOf[GraftLangHits].getName, null, "graft_langhits",
    "_FUNC_(text) - per-language marker-word hit counts over the distinct whitespace tokens.",
    "", "", "", "", "4.1.0", "", "scala_udf")

  private[graft] def builder(children: Seq[Expression]): Expression = {
    require(children.length == 1, "graft_langhits takes exactly one argument")
    GraftLangHits(children.head)
  }
}
