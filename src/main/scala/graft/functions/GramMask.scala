package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit half of a 128-bucket character-bigram bitmask — the map-side
  * edit-distance prefilter signature for the fuzzy pair join.
  *
  * Every code-point bigram of the input is hashed (murmur-style fmix64)
  * to a bucket in [0,128); `part` 0 materializes buckets 0-63 as bits
  * 0-63, `part` 1 materializes buckets 64-127. Two calls per row yield
  * the full 128-bit signature as two plain long columns — no array
  * allocation, and the whole computation codegens into the scan stage.
  *
  * Filter theorem (q-gram count filtering, Gravano et al., VLDB 2001):
  * one edit operation destroys at most q overlapping q-grams, so
  * lev(a,b) ≤ k ⟹ the multiset of destroyed gram occurrences is ≤ q·k,
  * and in particular at most q·k gram TYPES of `a` can vanish entirely
  * from `b`: |grams(a) \ grams(b)| ≤ q·k as sets. Bucketing preserves
  * the bound under ANY hash collisions — a bucket set in mask(a) but
  * clear in mask(b) pins at least one distinct gram type in
  * grams(a)\grams(b), so popcount(mask(a) & ~mask(b)) ≤ q·k whenever
  * lev(a,b) ≤ k. The gate `bit_count(m_a & ~m_b) <= q*k` (both
  * directions, both halves) is therefore LOSSLESS for the declared
  * threshold: it can only reject pairs whose edit distance provably
  * exceeds k. With q=2, k=5 the bound is 10; unrelated 40-char heads
  * set ~30 of 128 buckets and differ in ~23 — rejected long before the
  * O(len·k) banded levenshtein runs.
  */
case class GramMask(child: Expression, part: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType && (part == 0 || part == 1))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"requires string input and part in {0,1}, got " +
        s"${child.dataType} / part=$part")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var mask = 0L
    val lo = part * 64
    var prev = -1
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (prev >= 0) {
        var h = (prev.toLong << 32) | (cp.toLong & 0xffffffffL)
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
        h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
        h ^= h >>> 33
        val b = (h & 127L).toInt
        if (b >= lo && b < lo + 64) mask |= 1L << (b - lo)
      }
      prev = cp
      i += Character.charCount(cp)
    }
    mask
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val mask = ctx.freshName("mask")
      val prev = ctx.freshName("prev")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val lo = part * 64
      s"""
         |String $s = $c.toString();
         |long $mask = 0L;
         |int $prev = -1;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  if ($prev >= 0) {
         |    long $h = (((long) $prev) << 32) | (((long) $cp) & 0xffffffffL);
         |    $h ^= $h >>> 33; $h *= 0xff51afd7ed558ccdL;
         |    $h ^= $h >>> 33; $h *= 0xc4ceb9fe1a85ec53L;
         |    $h ^= $h >>> 33;
         |    int $b = (int) ($h & 127L);
         |    if ($b >= $lo && $b < $lo + 64) $mask |= 1L << ($b - $lo);
         |  }
         |  $prev = $cp;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $mask;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GramMask =
    copy(child = newChild)
}

object GramMask {
  /** Low half (buckets 0-63) of the 128-bucket bigram signature. */
  def gramMaskLo(text: Column): Column =
    ExprBridge.col(GramMask(ExprBridge.expr(text), 0))
  /** High half (buckets 64-127). */
  def gramMaskHi(text: Column): Column =
    ExprBridge.col(GramMask(ExprBridge.expr(text), 1))
}
