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

  private val NProfiles = TextStats.LangProfiles.length

  /** marker word → profile indexes containing it (profiles share words,
    * e.g. 'de'/'le' sit in several) — the INVERTED probe: the doc's
    * tokens are scanned against this ≤15-entry map, instead of building
    * a distinct-token set of the whole doc per row only to probe it 15
    * times. */
  private val Markers: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    // ws.distinct: a duplicate word inside one profile list must still
    // count once for that profile (distinct-isin parity)
    for (((_, ws), p) <- TextStats.LangProfiles.zipWithIndex;
         w <- ws.distinct) {
      val prev = Option(m.get(w)).getOrElse(Array.empty[Int])
      m.put(w, prev :+ p)
    }
    m
  }

  /** Static entry for generated code: one decode, one token scan, O(#
    * marker words) memory — each marker counts once per profile however
    * often it repeats (distinct-token semantics). */
  def hits(s: UTF8String): InternalRow = {
    val toks = GraftShingles.wsSplit(s.toString)
    val counts = new Array[Long](NProfiles)
    val seenMarkers = new java.util.HashSet[String](32)
    var i = 0
    while (i < toks.length) {
      val ps = Markers.get(toks(i))
      if (ps != null && seenMarkers.add(toks(i))) {
        var j = 0
        while (j < ps.length) { counts(ps(j)) += 1; j += 1 }
      }
      i += 1
    }
    val out = new Array[Any](NProfiles)
    var p = 0
    while (p < NProfiles) { out(p) = counts(p); p += 1 }
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
