package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's custom Catalyst expressions, so a
  * library user gets them in `spark.sql(...)` text, not only the Column
  * API:
  *
  *   - `graft_vec_dot(a, b)`   — [[FloatVecDot]], double-precision dot
  *     product over two float-array columns (codegen'd)
  *   - `graft_simhash64(hs)`   — [[SimHash64]], 64-bit sign-vote
  *     fingerprint over an array of token hashes (codegen'd)
  *
  * Two registration paths, both idiomatic Spark:
  *
  *   1. Config-injected (preferred for clusters):
  *      `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *      — applied at session build via [[SparkSessionExtensions]].
  *   2. Imperative, for an already-running session:
  *      `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def reg(name: String, clazz: Class[_], usage: String,
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, null, name, usage, ""),
      builder)

  val registrations: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      reg("graft_vec_dot", classOf[FloatVecDot],
        "graft_vec_dot(a, b) - dot product of two float arrays in double " +
          "precision",
        args => {
          require(args.length == 2, "graft_vec_dot takes 2 arguments")
          FloatVecDot(args(0), args(1))
        }),
      reg("graft_simhash64", classOf[SimHash64],
        "graft_simhash64(hashes) - 64-bit SimHash over an array of token " +
          "hashes",
        args => {
          require(args.length == 1, "graft_simhash64 takes 1 argument")
          SimHash64(args(0))
        }))

  /** Imperative twin of the config-injected path, for sessions that
    * already exist (e.g. notebooks): idempotent re-registration. */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (ident, info, builder) =>
      org.apache.spark.sql.graftbridge.ExprBridge
        .registerFunction(spark, ident, info, builder)
    }
}
