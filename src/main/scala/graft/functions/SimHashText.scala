package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused 60-bit SimHash over a raw text column: space-split tokens →
  * per-token two-prime polynomial hash (TextDedupe.tokenHash60 semantics:
  * `poly(31,1e9+7)·2^30 + poly(37,998244353)` over code points) → 60-bit
  * sign voting — ONE codegen'd pass over the string, no intermediate
  * token/char arrays.
  *
  * This is the hot-path form of
  * `SimHash64.simhash64(transform(split(text,' '), tokenHash60))`: the
  * composable version runs nested interpreted higher-order functions
  * (re-walking each token's characters per fold — the HOF no-CSE
  * pitfall), measured ~5× slower at sf0.1. Split semantics mirror
  * Spark's `split(text, " ")` with limit −1: consecutive/leading spaces
  * yield empty tokens, and empty tokens hash to 0 (a −1 vote on every
  * bit) — TextDedupeSpec pins exact equality with the composed form.
  */
case class SimHashText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"requires string input, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val votes = new Array[Int](60)
    var h1 = 0L; var h2 = 0L
    var i = 0
    val n = s.length
    var done = false
    while (!done) {
      val end = i >= n
      val cp = if (end) -1 else s.codePointAt(i)
      if (!end && cp != ' ') {
        h1 = (h1 * 31 + cp) % 1000000007L
        h2 = (h2 * 37 + cp) % 998244353L
        i += Character.charCount(cp)
      } else {
        val h = h1 * 1073741824L + h2
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        h1 = 0L; h2 = 0L
        if (end) done = true else i += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val votes = ctx.freshName("votes")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val done = ctx.freshName("done")
      val end = ctx.freshName("end")
      val cp = ctx.freshName("cp")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val out = ctx.freshName("out")
      s"""
         |String $s = $c.toString();
         |int[] $votes = new int[60];
         |long $h1 = 0L; long $h2 = 0L;
         |int $i = 0;
         |int $n = $s.length();
         |boolean $done = false;
         |while (!$done) {
         |  boolean $end = $i >= $n;
         |  int $cp = $end ? -1 : $s.codePointAt($i);
         |  if (!$end && $cp != ' ') {
         |    $h1 = ($h1 * 31L + $cp) % 1000000007L;
         |    $h2 = ($h2 * 37L + $cp) % 998244353L;
         |    $i += Character.charCount($cp);
         |  } else {
         |    long $h = $h1 * 1073741824L + $h2;
         |    for (int $b = 0; $b < 60; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |    }
         |    $h1 = 0L; $h2 = 0L;
         |    if ($end) $done = true; else $i += 1;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 60; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashText =
    copy(child = newChild)
}

object SimHashText {
  def simhashText(text: Column): Column =
    ExprBridge.col(SimHashText(ExprBridge.expr(text)))
}
