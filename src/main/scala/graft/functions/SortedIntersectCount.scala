package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** |A ∩ B| of two SORTED string arrays with distinct, non-null elements,
  * as one codegen'd two-pointer merge — the array-shaped exact-verify
  * kernel of the shingle dedup family (containment + minhash verify;
  * the Jaccard self-join verifies through the exploded index instead —
  * see ngramJaccardPairs).
  *
  * Replaces `size(array_intersect(a, b))`: `ArrayIntersect` builds a
  * row-local hash map per evaluation; the merge does the same count
  * with zero allocation per row, which matters as shingle sets grow
  * (the verify joins are array-payload-bound before they are
  * compute-bound, so at sf0.1 the two are comparable). Both inputs
  * MUST be sorted by Spark's string ordering (`sort_array`:
  * UTF8String binary order — the same comparator this merge uses) and
  * duplicate-free; producers in TextDedupe guarantee both.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Static kernel (called from generated code): two-pointer merge count
    * under UTF8String binary order. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** |a ∩ b| for sorted, distinct, non-null string arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ExprBridge.col(SortedIntersectCount(ExprBridge.expr(a), ExprBridge.expr(b)))
}
