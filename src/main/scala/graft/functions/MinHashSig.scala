package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd k-permutation MinHash over an array of (already xxhash64'd,
  * mod-Prime) shingle hashes: `sig(i) = min_h (h·(2i+1) + b_i) mod P`
  * with `b_i = 1013904223·(i+1) mod P` — exactly the arithmetic of the
  * composed `transform(sequence(...), i -> array_min(transform(hs, ...)))`
  * form, whose k·n lambda evaluations run interpreted inside the HOFs.
  * This is the signature kernel under dedupe_minhash_lsh, the duplicate
  * cluster entries, and the streaming near-dup key table (via
  * TextDedupe.bandRows), so the k·n loop is a corpus-ingest hot path.
  * Empty input → null (a doc with no shingles has no signature), same
  * as the composed form; TextDedupeSpec pins exact equality. */
case class MinHashSig(child: Expression, k: Int, prime: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = 2L * i + 1
      val b = 1013904223L * (i + 1) % prime
      var mn = Long.MaxValue
      var j = 0
      while (j < n) {
        val s = (hs.getLong(j) * a + b) % prime
        if (s < mn) mn = s
        j += 1
      }
      sig(i) = mn
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val mn = ctx.freshName("mn")
      val s = ctx.freshName("s")
      s"""
         |int $n = $hs.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long[] $sig = new long[$k];
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $a = 2L * $i + 1;
         |    long $b = 1013904223L * ($i + 1) % ${prime}L;
         |    long $mn = Long.MAX_VALUE;
         |    for (int $j = 0; $j < $n; $j++) {
         |      long $s = ($hs.getLong($j) * $a + $b) % ${prime}L;
         |      if ($s < $mn) $mn = $s;
         |    }
         |    $sig[$i] = $mn;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  import org.apache.spark.sql.graftbridge.ExprBridge

  def minhashSig(hashedShingles: Column, k: Int, prime: Long): Column =
    ExprBridge.col(MinHashSig(ExprBridge.expr(hashedShingles), k, prime))
}
