package graft

import org.apache.spark.sql.types._

/** Early-warning guard over the DRIVER-GENERATED testdata: the round-9
  * regeneration silently changed events.ts' parquet encoding and took
  * 14 entries off the scoreboard for two rounds before anyone connected
  * the dots. This spec pins the post-load column types every query
  * depends on, for every table, so the next encoding/schema drift fails
  * HERE — one `sbt test` run, named table, named column — instead of as
  * absent driver entries. Canceled (not failed) when no testdata dir
  * exists (laptop/CI without the driver corpus).
  */
class TestdataGuardSpec extends SparkSpec {

  // testdata root is overridable (env var, then system property) so the
  // guard still engages on a relocated corpus instead of silently
  // canceling via assume — the drift protection must travel with the data
  private val root = sys.env.get("SPARK_GRAFT_TESTDATA")
    .orElse(sys.props.get("graft.testdata"))
    .getOrElse("/root/testdata")
  private val dir = Seq(s"$root/sf0.001", s"$root/sf0.01")
    .find(d => new java.io.File(s"$d/region.parquet").exists())

  private val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType),
    "nation" -> Map("n_nationkey" -> IntegerType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_acctbal" -> DoubleType),
    "supplier" -> Map("s_suppkey" -> LongType),
    "part" -> Map("p_partkey" -> LongType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType),
    // ts MUST land as plain TimestampType whatever the parquet encoding
    // (INT64 nanos, TIMESTAMP_NTZ micros, ...) — the round-9 lesson
    "events" -> Map("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "ts" -> TimestampType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  test("driver testdata loads with the column types the queries assume") {
    assume(dir.isDefined, "no driver testdata dir on this machine")
    val d = dir.get
    val drift = for {
      (table, cols) <- expected.toSeq.sortBy(_._1)
      schema = Tables.load(spark, d, table).schema
      (c, want) <- cols.toSeq.sortBy(_._1)
      got = schema.find(_.name == c).map(_.dataType)
      if !got.contains(want)
    } yield s"$table.$c: expected $want, got ${got.getOrElse("MISSING")}"
    assert(drift.isEmpty,
      s"testdata schema drift (regenerate-proof the loaders!):\n  " +
        drift.mkString("\n  "))
  }

  test("orders.o_orderdate is castable to timestamp (as-of family contract)") {
    assume(dir.isDefined, "no driver testdata dir on this machine")
    import org.apache.spark.sql.functions.col
    val o = Tables.orders(spark, dir.get)
      .select(col("o_orderdate").cast("timestamp").as("t"))
    assert(o.filter(col("t").isNull).count() == 0)
  }
}
