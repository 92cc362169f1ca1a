package graft

import graft.sink.{Catalog, JdbcSink}

class JdbcSinkSpec extends SparkSpec {
  import sqlImplicits._

  private def freshSink(name: String) =
    JdbcSink(s"jdbc:derby:memory:$name;create=true")

  test("ensureTable + upsert + readBack round-trip") {
    val sink = freshSink("rt")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "s", "v")
    sink.ensureTable("t1", df.schema, Seq("k"))
    sink.upsert(df, "t1", Seq("k"))
    val back = sink.readBack(spark, "t1")
      .as[(Long, String, Double)].collect().toSet
    assert(back == Set((1L, "a", 1.5), (2L, "b", 2.5)))
    assert(sink.recordCount("t1") == 2)
  }

  test("upsert updates on PK conflict (last write wins)") {
    val sink = freshSink("up")
    val df1 = Seq((1L, "old"), (2L, "keep")).toDF("k", "s")
    sink.ensureTable("t2", df1.schema, Seq("k"))
    sink.upsert(df1, "t2", Seq("k"))
    sink.upsert(Seq((1L, "new"), (3L, "ins")).toDF("k", "s"), "t2", Seq("k"))
    val back = sink.readBack(spark, "t2").as[(Long, String)].collect().toSet
    assert(back == Set((1L, "new"), (2L, "keep"), (3L, "ins")))
  }

  test("insert + delete-by-PK: absent-key delete is a no-op") {
    val sink = freshSink("del")
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
    sink.ensureTable("t_del", df.schema, Seq("k"))
    sink.insert(df, "t_del")
    assert(sink.recordCount("t_del") == 3)
    // delete rows may carry extra columns; only the PK is used, and
    // deleting a key that is not there must not fail
    sink.delete(Seq((2L, "ignored"), (9L, "absent")).toDF("k", "s"),
      "t_del", Seq("k"))
    val back = sink.readBack(spark, "t_del").as[(Long, String)]
      .collect().toSet
    assert(back == Set((1L, "a"), (3L, "c")))
    // idempotent: re-deleting converges
    sink.delete(Seq(Tuple1(2L)).toDF("k"), "t_del", Seq("k"))
    assert(sink.recordCount("t_del") == 2)
  }

  test("nulls and timestamps survive the sink boundary") {
    val sink = freshSink("nt")
    val ts = java.sql.Timestamp.valueOf("2024-06-01 12:30:00")
    val df = Seq((1L, Some("x"), Option(ts)), (2L, None, None))
      .toDF("k", "s", "t")
    sink.ensureTable("t3", df.schema, Seq("k"))
    sink.upsert(df, "t3", Seq("k"))
    val back = sink.readBack(spark, "t3").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getTimestamp(2)))).toSet
    assert(back == Set((1L, Some("x"), Some(ts)), (2L, None, None)))
  }

  test("TimestampNTZ and Date columns round-trip typed (not as VARCHAR)") {
    // regression: parquet timestamps without isAdjustedToUTC read as
    // TimestampNTZ in Spark 4; the sink once created such columns as
    // VARCHAR, so read-back returned 'yyyy-MM-dd HH:mm:ss.f' strings
    val sink = freshSink("ntz")
    val df = spark.sql(
      """SELECT 1L AS k, TIMESTAMP_NTZ '2024-03-01 08:30:00' AS tntz,
        |  DATE '2024-03-01' AS d""".stripMargin)
    assert(df.schema("tntz").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    sink.ensureTable("t5", df.schema, Seq("k"))
    sink.upsert(df, "t5", Seq("k"))
    val back = sink.readBack(spark, "t5", df.schema)
    assert(back.schema("tntz").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    assert(back.schema("d").dataType ==
      org.apache.spark.sql.types.DateType)
    val row = back.collect().head
    assert(row.getAs[java.time.LocalDateTime]("tntz") ==
      java.time.LocalDateTime.of(2024, 3, 1, 8, 30, 0))
    assert(row.getAs[java.sql.Date]("d").toString == "2024-03-01")
  }

  test("upsert SQL: Postgres ON CONFLICT shape and Derby delete+insert") {
    val pg = JdbcSink("jdbc:postgresql://host/db")
    val (pgSql, pgNull) = pg.upsertSql("t", Seq("k1", "k2", "v"), Seq("k1", "k2"))
    assert(pgNull == null) // single-statement dialect
    assert(pgSql ==
      """INSERT INTO "t" ("k1", "k2", "v") VALUES (?, ?, ?)""" +
        """ ON CONFLICT ("k1", "k2") DO UPDATE SET "v" = EXCLUDED."v"""")
    // single-PK table — the reference's actual sink shape
    // (datastore_upsert on one primary key, datapump.py:560-566)
    val (pgSingle, _) = pg.upsertSql("obs", Seq("id", "ts", "val"), Seq("id"))
    assert(pgSingle ==
      """INSERT INTO "obs" ("id", "ts", "val") VALUES (?, ?, ?)""" +
        """ ON CONFLICT ("id") DO UPDATE SET "ts" = EXCLUDED."ts",""" +
        """ "val" = EXCLUDED."val"""")
    // all-PK table degenerates to DO NOTHING (nothing to update)
    assert(pg.upsertSql("t", Seq("k"), Seq("k"))._1 ==
      """INSERT INTO "t" ("k") VALUES (?) ON CONFLICT ("k") DO NOTHING""")
    val derby = JdbcSink("jdbc:derby:memory:x")
    val (del, ins) = derby.upsertSql("t", Seq("k", "v"), Seq("k"))
    assert(del == """DELETE FROM "t" WHERE "k" = ?""")
    assert(ins == """INSERT INTO "t" ("k", "v") VALUES (?, ?)""")
  }

  test("truncate empties the table") {
    val sink = freshSink("tr")
    val df = Seq((1L, 1.0)).toDF("k", "v")
    sink.ensureTable("t4", df.schema, Seq("k"))
    sink.upsert(df, "t4", Seq("k"))
    sink.truncate("t4")
    assert(sink.recordCount("t4") == 0)
  }

  test("live Postgres round-trip: create + ON CONFLICT upsert + truncate " +
      "(gated on SPARK_GRAFT_PG_URL)") {
    // The generated-SQL test above pins the Postgres ON CONFLICT string;
    // THIS test executes it. It needs a live Postgres (and its JDBC
    // driver on the classpath — neither ships in the offline CI image,
    // where Derby exercises the two-statement dialect instead), so it
    // cancels unless SPARK_GRAFT_PG_URL is set, e.g.
    //   SPARK_GRAFT_PG_URL='jdbc:postgresql://host/db?user=u&password=p'
    // COVERAGE.md records that CI covers Derby only.
    val url = sys.env.get("SPARK_GRAFT_PG_URL")
    assume(url.isDefined, "SPARK_GRAFT_PG_URL not set; Postgres " +
      "integration skipped (Derby covers the JDBC path in CI)")
    val sink = JdbcSink(url.get)
    val table = s"graft_pg_it_${System.currentTimeMillis()}"
    val df1 = Seq((1L, "old", 1.5), (2L, "keep", 2.5)).toDF("k", "s", "v")
    sink.ensureTable(table, df1.schema, Seq("k"))
    try {
      sink.upsert(df1, table, Seq("k"))
      // second upsert hits the ON CONFLICT DO UPDATE arm on k=1 and the
      // plain-insert arm on k=3 — the single-statement dialect for real
      sink.upsert(Seq((1L, "new", 9.0), (3L, "ins", 3.5))
        .toDF("k", "s", "v"), table, Seq("k"))
      val back = sink.readBack(spark, table)
        .as[(Long, String, Double)].collect().toSet
      assert(back == Set((1L, "new", 9.0), (2L, "keep", 2.5),
        (3L, "ins", 3.5)))
      sink.truncate(table)
      assert(sink.recordCount(table) == 0)
    } finally {
      val c = sink.connect()
      try c.createStatement().execute(s"""DROP TABLE "$table"""")
      finally c.close()
    }
  }

  test("catalog description stamping strips prior stamp") {
    val sink = freshSink("cat")
    val cat = new Catalog(sink)
    assert(cat.tableName("My Org", "IoT-Test", "air quality") ==
      "my_org__iot_test__air_quality")
    val s1 = cat.updateDescription("res1", "2024-01-01 10:00:00")
    assert(s1 == "res1 (UPDATED: 2024-01-01 10:00:00)")
    val s2 = cat.updateDescription("res1", "2024-02-02 11:00:00")
    assert(s2 == "res1 (UPDATED: 2024-02-02 11:00:00)") // single stamp
    assert(cat.lastUpdated(s2).contains("2024-02-02 11:00:00"))
  }
}
