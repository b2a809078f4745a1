package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_quality(text)` — the quality filter's four counting signals in
  * ONE native codegen pass: `struct(n_chars, n_tokens, n_stop, n_punct)`.
  * Replaces an interpreted `filter(toks, isin(stopwords))` lambda plus a
  * `regexp_extract_all` scan per row ([[TextStats.quality]]), keeping the
  * integers BIT-IDENTICAL to that form and to the SQL oracle:
  *
  *   - `n_chars` counts CODE POINTS (Spark `length()` semantics);
  *   - `n_tokens`/`n_stop` use the shared ws-token kernel
  *     ([[GraftShingles.wsSplit]]) and [[TextStats.Stopwords]];
  *   - `n_punct` counts code points matching Java `[^A-Za-z0-9\s]` —
  *     note `\s` is ASCII-only by default, so a U+00A0 no-break space IS
  *     punct under both the regex and this kernel.
  */
case class GraftQuality(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_quality requires a string argument, got ${child.dataType}")

  override def dataType: DataType = GraftQuality.Schema
  override def prettyName: String = "graft_quality"

  override def nullSafeEval(input: Any): Any =
    GraftQuality.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.GraftQuality.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftQuality {

  val Schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false)))

  private val Stop: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextStats.Stopwords.foreach(s.add)
    s
  }

  // Java regex \s with default flags: ASCII whitespace only
  @inline private def isRegexWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' ||
      cp == '\r'

  /** Static entry for generated code. ONE UTF-8 decode per row; n_chars
    * is `numChars` — Spark `length()`'s own byte-walk, which can differ
    * from decoded-String code-point counts on MALFORMED UTF-8 (a 0xC2
    * lead byte is one numChars char but decodes to U+FFFD + next char),
    * so counting the decoded string would break bit-parity with the
    * legacy form on dirty bytes. The punct/token counts run on the
    * decoded string exactly like the Java-regex forms they replace. */
  def counts(s: UTF8String): InternalRow = {
    val str = s.toString
    val nChars = s.numChars().toLong
    var nPunct = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val alnum = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= '0' && cp <= '9')
      if (!alnum && !isRegexWs(cp)) nPunct += 1
      i += Character.charCount(cp)
    }
    val toks = GraftShingles.wsSplit(str)
    var nStop = 0L
    var t = 0
    while (t < toks.length) {
      if (Stop.contains(toks(t))) nStop += 1
      t += 1
    }
    new GenericInternalRow(Array[Any](nChars, toks.length.toLong, nStop,
      nPunct))
  }

  private[graft] val info = new ExpressionInfo(
    classOf[GraftQuality].getName, null, "graft_quality",
    "_FUNC_(text) - struct(n_chars, n_tokens, n_stop, n_punct) quality-filter counting signals.",
    "", "", "", "", "4.1.0", "", "scala_udf")

  private[graft] def builder(children: Seq[Expression]): Expression = {
    require(children.length == 1, "graft_quality takes exactly one argument")
    GraftQuality(children.head)
  }
}
