package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-token shingle array in one pass — the hot kernel of the
  * n-gram dedup family. Semantics are IDENTICAL to the composable form
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ",
  * element_at(ts, i)...)))` over `split(text, " ")` (limit −1: trailing
  * empty tokens kept; first-occurrence order preserved; docs shorter
  * than n shingles → empty array) — TextDedupeSpec pins exact equality.
  * The composable form walks interpreted HOF trees per element; this is
  * one static-method call per row inside whole-stage codegen, and the
  * ngram pipeline evaluates it up to four times per query (prefix index,
  * dfreq, both verify sides). */
case class ShingleArray(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleArray.compute(input.asInstanceOf[UTF8String].toString, n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleArray.compute($c.toString(), $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {

  /** Static kernel (called from generated code): tokenize on single
    * spaces keeping trailing empties, emit each n-token window joined by
    * one space; `distinct` dedupes in first-occurrence order (the dedup
    * family's set semantics), `!distinct` keeps every occurrence in
    * position order (the repetition-metric multiset semantics). */
  def compute(s: String, n: Int, distinct: Boolean): ArrayData = {
    val toks = s.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet dedupes preserving first-occurrence order; plain
    // ArrayList keeps the multiset. Both emit in a single forward pass.
    val out = new java.util.LinkedHashSet[String](toks.length * 2)
    val all = new java.util.ArrayList[String](toks.length)
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      if (distinct) out.add(sb.toString) else all.add(sb.toString)
      i += 1
    }
    val src: java.util.Collection[String] = if (distinct) out else all
    val arr = new Array[Any](src.size)
    val it = src.iterator()
    var k = 0
    while (it.hasNext) {
      arr(k) = UTF8String.fromString(it.next())
      k += 1
    }
    new GenericArrayData(arr)
  }

  def shingleArray(text: Column, n: Int): Column =
    ExprBridge.col(ShingleArray(ExprBridge.expr(text), n))

  /** Occurrence-order multiset form (no dedup) — for repetition metrics. */
  def shingleOccurrences(text: Column, n: Int): Column =
    ExprBridge.col(ShingleArray(ExprBridge.expr(text), n, distinct = false))
}
