package graft

import java.nio.file.{Files, Paths}
import graft.jobs.{Job, JobRunner}
import graft.sink.JdbcSink

class JobRunnerSpec extends SparkSpec {

  test("Job.parse validates required fields, enum, and defaults") {
    val ok = Job.parse(
      """{"InputFile":"/tmp/x/*.csv","TargetOrg":"o","TargetPackage":"p",
        |"TargetResource":"r","PrimaryKey":"DateTime,Sensor_id",
        |"Dedupe":"last"}""".stripMargin)
    assert(ok.isRight)
    val j = ok.toOption.get
    assert(j.primaryKey == Seq("DateTime", "Sensor_id"))
    assert(!j.truncate && j.stats.isEmpty) // defaults (ref bug 2 fixed)

    assert(Job.parse("""{"InputFile":"x"}""").isLeft) // missing fields
    assert(Job.parse(
      """{"InputFile":"x","TargetOrg":"o","TargetPackage":"p",
        |"TargetResource":"r","PrimaryKey":"k","Dedupe":"newest"}"""
        .stripMargin).isLeft) // bad enum
    assert(Job.parse("not json").isLeft)
  }

  test("end-to-end: queue sweep dedupes, upserts, stats, archives") {
    val base = Files.createTempDirectory("graft-e2e")
    val input = base.resolve("input"); Files.createDirectories(input)
    val processed = base.resolve("processed").toString
    val problems = base.resolve("problems").toString
    val samples = base.resolve("samples"); Files.createDirectories(samples)

    // two files; newer one processed first, so OLDER file's rows win
    val f1 = samples.resolve("old.csv")
    Files.write(f1,
      ("DateTime,Sensor_id,LAT,LONG,pm25\n" +
       "2024-01-01 10:00:00,s1,1.0,2.0,10.0\n" +
       "2024-01-01 10:00:00,s1,1.0,2.0,12.0\n" + // in-file dupe, keep last
       "2024-01-01 11:00:00,s1,1.0,2.0,20.0\n").getBytes)
    f1.toFile.setLastModified(1700000000000L)
    val f2 = samples.resolve("new.csv")
    Files.write(f2,
      ("DateTime,Sensor_id,LAT,LONG,pm25\n" +
       "2024-01-01 10:00:00,s1,1.0,2.0,99.0\n").getBytes)
    f2.toFile.setLastModified(1700000099000L)

    // a poisoned file: PK column missing -> problems/
    val f3 = samples.resolve("poison.csv")
    Files.write(f3, "Whatever,x\n1,2\n".getBytes)
    f3.toFile.setLastModified(1700000050000L)

    Files.write(input.resolve("sensors-job.json"),
      (s"""{"InputFile":"$samples/*.csv","TargetOrg":"etl-test",
          |"TargetPackage":"iot-test","TargetResource":"air-quality",
          |"PrimaryKey":"DateTime,Sensor_id","Dedupe":"last",
          |"Stats":[{"Kind":"descriptive"},
          |         {"Kind":"H","GroupBy":"Sensor_id","DropColumns":"LAT,LONG"}]}"""
        .stripMargin).getBytes)

    val sink = JdbcSink("jdbc:derby:memory:e2e;create=true")
    val runner = new JobRunner(spark, sink, input.toString, processed, problems)
    val results = runner.runAll()
    assert(results.size == 1 && results.head._2.isRight)

    // data table: new.csv processed first, old.csv (older mtime) last ->
    // old.csv's keep-last value (12.0) wins over new.csv's 99.0
    val table = "etl_test__iot_test__air_quality"
    val rows = sink.readBack(spark, table)
      .select("DateTime", "Sensor_id", "pm25").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getDouble(2)))
      .toSet
    assert(rows == Set(
      ("2024-01-01 10:00:00.0", "s1", 12.0),
      ("2024-01-01 11:00:00.0", "s1", 20.0)))

    // stats tables exist and have content: describe(include='all') emits
    // the full pandas row set — count/unique/top/freq + 7 numeric moments
    assert(sink.recordCount(s"${table}__descriptive") == 11)
    assert(sink.recordCount(s"${table}__h") == 2) // two hourly buckets

    // archive semantics: 2 good files moved to processed/, poison to problems/
    assert(Paths.get(processed, "old.csv").toFile.exists)
    assert(Paths.get(processed, "new.csv").toFile.exists)
    assert(Paths.get(problems, "poison.csv").toFile.exists)
    assert(!Files.exists(samples.resolve("old.csv")))
    assert(Files.readAllLines(Paths.get(processed, "processed.log")).size == 2)
    assert(Files.readAllLines(Paths.get(problems, "problems.log")).size == 1)

    // dupe accounting: old.csv logged 1 dupe
    val logged = Files.readAllLines(Paths.get(processed, "processed.log"))
    assert(logged.asScala.exists(l => l.contains("old.csv") &&
      l.contains("DUPES: 1") && l.contains("PROCESSED: 2")))
  }

  private implicit class JListAsScala[T](l: java.util.List[T]) {
    def asScala: Seq[T] = {
      val b = Seq.newBuilder[T]
      l.forEach(x => b += x)
      b.result()
    }
  }
}
