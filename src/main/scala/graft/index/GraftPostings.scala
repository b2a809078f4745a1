package graft.index

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** `graft_postings(bytes)` — decode one compressed posting part into
  * (doc_id, tf, dl) rows as a native Catalyst [[Generator]] (the explode
  * family). The Spark-side analog of the reference's posting-chain walk at
  * query time (reference: app/Index/Index_Search.cpp:13-45 reading the
  * reversed block then its additional-block chain per word id). Replaces the r1
  * Scala-UDF-returning-Seq[Product] + explode on the search path: the
  * generator emits InternalRows straight from the delta+varint decoder with
  * no external-row conversion and no UDF serialization boundary.
  *
  * Registered alongside `graft_tokenize` by
  * [[graft.tokenize.GraftExtensions]] / [[graft.tokenize.GraftFunctions]].
  */
case class GraftPostings(child: Expression) extends UnaryExpression
    with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_postings requires a binary argument, got ${child.dataType}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("tf", IntegerType, nullable = false),
    StructField("dl", IntegerType, nullable = false)))

  override def prettyName: String = "graft_postings"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val bytes = child.eval(input)
    if (bytes == null) Iterator.empty
    else Codec.decodeAll(bytes.asInstanceOf[Array[Byte]]).iterator
      .map(p => InternalRow(p.docId, p.tf, p.dl))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftPostings {
  private[graft] val info = new ExpressionInfo(
    classOf[GraftPostings].getName, null, "graft_postings",
    "_FUNC_(bytes) - decode a compressed posting part into (doc_id, tf, dl) rows.",
    "", "", "", "", "4.1.0", "", "scala_udf")

  private[graft] def builder(children: Seq[Expression]): Expression = {
    require(children.length == 1, "graft_postings takes exactly one argument")
    GraftPostings(children.head)
  }
}
