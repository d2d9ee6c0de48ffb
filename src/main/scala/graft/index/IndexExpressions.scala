package graft.index

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** docIds of one posting block, decoded from the delta+varint `docs` payload
  * ([[BlockCodec.decodeDeltaLongs]]). Lets a LOGICAL plan turn the postings
  * table into a docId stream (`explode(block_doc_ids(docs, n))`) — the
  * candidate side of the index-accelerated filter rewrite
  * ([[graft.query.IndexFilterRewrite]]) — while staying inside whole-stage
  * codegen instead of dropping to a typed mapPartitions.
  */
case class BlockDocIds(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(docs: Any, n: Any): Any =
    BlockDocIds.decode(docs.asInstanceOf[Array[Byte]], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, n) => s"graft.index.BlockDocIds.decode($d, $n)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): BlockDocIds = copy(left = l, right = r)
  override def prettyName: String = "block_doc_ids"
}

object BlockDocIds {
  def decode(docs: Array[Byte], n: Int): GenericArrayData =
    new GenericArrayData(BlockCodec.decodeDeltaLongs(docs, n))
}
