package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Codegen'd product-quantization encoder: per subspace mi, the id of
  * the codebook centroid maximizing `x_sub · c − ‖c‖²/2` (≡ the
  * L2-nearest centroid for normalized inputs).
  *
  * Replaces the composed Column form (per-subspace `slice` let-bound
  * into 16 `FloatVecDot` score expressions + `array_position(array_max)`)
  * whose lambda bodies evaluate INTERPRETED inside the higher-order
  * function — measured ~3× on the sf0.1 encode pass, and encode is the
  * ingest hot path of the persisted/streaming PQ tiers. Semantics are
  * bit-identical to the composed form (VectorOpsSpec pins equality):
  * left-to-right double accumulation per dot, the float-rounded ‖c‖²/2
  * subtracted in double, strict `>` keeps the FIRST max like
  * array_position does.
  */
case class PqEncode(child: Expression,
    codebooks: Array[Array[Array[Float]]]) extends UnaryExpression {

  private val m = codebooks.length
  private val k = codebooks(0).length
  private val dsub = codebooks(0)(0).length

  // flat(mi*k*dsub + c*dsub + i) = codebooks(mi)(c)(i); halves as the
  // composed form computes them: Float((Σ c_i²)/2) widened to double
  @transient private lazy val flat: Array[Float] = {
    val a = new Array[Float](m * k * dsub)
    var o = 0
    for (mi <- 0 until m; c <- 0 until k; i <- 0 until dsub) {
      a(o) = codebooks(mi)(c)(i); o += 1
    }
    a
  }
  @transient private lazy val halves: Array[Double] =
    (for (mi <- 0 until m; c <- 0 until k) yield
      (codebooks(mi)(c).map(x => x.toDouble * x).sum / 2.0)
        .toFloat.toDouble).toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    // dimension guard: an undersized vector would otherwise read
    // out-of-bounds UnsafeArrayData memory and yield garbage codes
    if (x.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: expected vector of ${m * dsub} floats, " +
          s"got ${x.numElements()}")
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val base = mi * dsub
      var best = Double.NegativeInfinity
      var idx = 0
      var c = 0
      while (c < k) {
        var s = 0.0
        var i = 0
        while (i < dsub) {
          s += x.getFloat(base + i).toDouble *
            flat(mi * k * dsub + c * dsub + i).toDouble
          i += 1
        }
        s -= halves(mi * k + c)
        if (s > best) { best = s; idx = c }
        c += 1
      }
      codes(mi) = idx
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "float[]")
    val halvesRef = ctx.addReferenceObj("pqHalves", halves, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val idx = ctx.freshName("idx")
      s"""
         |if ($x.numElements() != ${m * dsub}) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: expected vector of ${m * dsub} floats, got "
         |      + $x.numElements());
         |}
         |int[] $codes = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  double $best = Double.NEGATIVE_INFINITY;
         |  int $idx = 0;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      $s += (double) $x.getFloat($mi * $dsub + $i)
         |        * (double) $flatRef[$mi * $k * $dsub + $c * $dsub + $i];
         |    }
         |    $s -= $halvesRef[$mi * $k + $c];
         |    if ($s > $best) { $best = $s; $idx = $c; }
         |  }
         |  $codes[$mi] = $idx;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  import org.apache.spark.sql.graftbridge.ExprBridge

  def pqEncode(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    ExprBridge.col(PqEncode(ExprBridge.expr(vec), codebooks))
}
