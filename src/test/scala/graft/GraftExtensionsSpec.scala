package graft

import graft.functions.GraftExtensions

class GraftExtensionsSpec extends SparkSpec {

  test("imperative register exposes graft_vec_dot to SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect().head.getDouble(0)
    assert(r == 11.0)
  }

  test("graft_simhash64 in SQL matches the Column-API expression") {
    GraftExtensions.register(spark)
    import sqlImplicits._
    val df = Seq(("a b c d"), ("x y")).toDF("text")
    df.createOrReplaceTempView("ext_docs")
    // same engine-neutral token hash the Column API uses
    // (TextDedupe.tokenHash60), spelled in SQL
    val viaSql = spark.sql(
      """SELECT graft_simhash64(transform(split(text, ' '),
        |  t -> aggregate(filter(split(t, ''), ch -> length(ch) = 1),
        |         CAST(0 AS BIGINT),
        |         (acc, ch) -> pmod(acc * 31 + ascii(ch), 1000000007))
        |       * 1073741824
        |     + aggregate(filter(split(t, ''), ch -> length(ch) = 1),
        |         CAST(0 AS BIGINT),
        |         (acc, ch) -> pmod(acc * 37 + ascii(ch), 998244353))))
        |  AS sh FROM ext_docs""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    val viaCol = df.select(graft.ops.TextDedupe.simhash(
        org.apache.spark.sql.functions.col("text")).as("sh"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol)
  }

  test("registration is idempotent") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT graft_vec_dot(array(CAST(1.0 AS FLOAT)), " +
      "array(CAST(2.0 AS FLOAT))) AS d").collect().head.getDouble(0) == 2.0)
  }
}
