package graft.index

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_postings(bytes)` — decode one compressed posting part into
  * (doc_id, tf, dl) rows as a native Catalyst [[CollectionGenerator]] (the
  * `inline` shape: an array of structs whose fields the Generate node
  * emits). The Spark-side analog of the reference's posting-chain walk at
  * query time (reference: app/Index/Index_Search.cpp:13-45 reading the
  * reversed block then its additional-block chain per word id).
  *
  * Codegen: [[doGenCode]] emits a call to the static [[GraftPostings.decodeRows]]
  * varint decoder, so GenerateExec keeps the whole search hot path inside
  * WholeStageCodegen (r2 shipped this as CodegenFallback — the Generate node
  * broke the codegen span at every posting decode).
  *
  * Registered alongside `graft_tokenize` by
  * [[graft.tokenize.GraftExtensions]] / [[graft.tokenize.GraftFunctions]].
  */
case class GraftPostings(child: Expression) extends UnaryExpression
    with CollectionGenerator {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_postings requires a binary argument, got ${child.dataType}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("tf", IntegerType, nullable = false),
    StructField("dl", IntegerType, nullable = false)))

  override def position: Boolean = false
  override def inline: Boolean = true
  override def collectionType: DataType = dataType

  override def prettyName: String = "graft_postings"

  /** Interpreted Generate path. */
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val bytes = child.eval(input)
    if (bytes == null) Iterator.empty
    else Codec.decodeAll(bytes.asInstanceOf[Array[Byte]]).iterator
      .map(p => InternalRow(p.docId, p.tf, p.dl))
  }

  /** Whole-stage-codegen Generate path: the generated Java calls the static
    * decoder, which returns the ArrayData of struct rows GenerateExec's
    * inline-collection loop consumes. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.index.GraftPostings.decodeRows($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftPostings {
  /** Static entry for generated code: one decoded posting part as an array
    * of (doc_id, tf, dl) rows. */
  def decodeRows(bytes: Array[Byte]): ArrayData = {
    val d = Codec.decode(bytes)
    val out = new Array[Any](d.count)
    var i = 0
    d.iterator.foreach { p => out(i) = InternalRow(p.docId, p.tf, p.dl); i += 1 }
    new GenericArrayData(out)
  }

  private[graft] val info = new ExpressionInfo(
    classOf[GraftPostings].getName, null, "graft_postings",
    "_FUNC_(bytes) - decode a compressed posting part into (doc_id, tf, dl) rows.",
    "", "", "", "", "4.1.0", "", "scala_udf")

  private[graft] def builder(children: Seq[Expression]): Expression = {
    require(children.length == 1, "graft_postings takes exactly one argument")
    GraftPostings(children.head)
  }
}
