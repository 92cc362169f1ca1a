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

  test("corpus kinds: queue drives bootstrap + delta end-to-end; " +
      "job files archive; bad kinds and broken deltas hit problems/") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft-corpusq")
    val input = base.resolve("input"); Files.createDirectories(input)
    val processed = base.resolve("processed").toString
    val problems = base.resolve("problems").toString
    val corpus = base.resolve("corpus").toString
    val st0 = base.resolve("st0").toString
    val st1 = base.resolve("st1").toString

    // sliding 20-token docs with "the" at every i%20==15 position: all
    // pass the lang gate, and J(doc(a), doc(a+3)) = 15/21 ≥ 0.5 makes
    // 11 a near-dup of 10 within the delta (IncrementalCorpusJobSpec's
    // w2/doc2 construction)
    def w(i: Int) = if (i % 20 == 15) "the" else s"t$i"
    def doc(lo: Int) = (lo to lo + 19).map(w).mkString(" ")
    import sqlImplicits._
    def docsDir(rows: (Long, String)*): String = {
      val d = base.resolve(s"docs${rows.head._1}")
      rows.toSeq.toDF("doc_id", "text").withColumn("lang", lit("en"))
        .coalesce(1).write.parquet(s"$d/documents.parquet")
      d.toString
    }
    val baseDocs = docsDir(1L -> doc(1), 2L -> doc(101))
    val deltaDocs = docsDir(10L -> doc(41), 11L -> doc(44))

    // queue order is lexicographic — build runs before delta
    Files.write(input.resolve("a-build-job.json"),
      s"""{"Kind":"CorpusBuild","InputDocs":"$baseDocs",
         |"CorpusDir":"$corpus","StateDir":"$st0"}""".stripMargin.getBytes)
    Files.write(input.resolve("b-delta-job.json"),
      s"""{"Kind":"CorpusDelta","InputDocs":"$deltaDocs",
         |"CorpusDir":"$corpus","Generation":1,
         |"StateDirs":["$st0"],"StateOutDir":"$st1"}""".stripMargin.getBytes)
    Files.write(input.resolve("c-bad-job.json"),
      """{"Kind":"CorpusTeleport","InputDocs":"x"}""".getBytes)

    val sink = JdbcSink("jdbc:derby:memory:corpusq;create=true")
    val runner = new JobRunner(spark, sink, input.toString, processed,
      problems)
    val results = runner.runAll()
    assert(results.size == 3, results.map(_._1).toString)
    val byFile = results.map { case (f, r) =>
      Paths.get(f).getFileName.toString -> r }.toMap
    val build = byFile("a-build-job.json").toOption.get
      .asInstanceOf[runner.CorpusOutcome]
    assert(build.kind == "CorpusBuild" && build.nKept == 2, build.toString)
    val delta = byFile("b-delta-job.json").toOption.get
      .asInstanceOf[runner.CorpusOutcome]
    // 10 is fresh; 11 near-dups 10 within the delta
    assert(delta.kind == "CorpusDelta" && delta.generation == 1 &&
      delta.nKept == 1, delta.toString)
    assert(byFile("c-bad-job.json").isLeft)

    // landed layout: both generations readable as one corpus, chain
    // metadata coherent with the landed ids
    val landed = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(landed == Seq(1L, 2L, 10L))
    val metas = graft.jobs.IncrementalCorpusJob
      .readChainMeta(spark, Seq(st0, st1)).get
    assert(metas.map(m => (m.gen, m.nKeys)).sorted == Seq((0, 2L), (1, 1L)))

    // one-shot archive semantics: corpus job FILES moved out of the
    // queue (success → processed/, failure → problems/); a re-sweep
    // finds an empty queue and re-runs nothing
    assert(Paths.get(processed, "a-build-job.json").toFile.exists)
    assert(Paths.get(processed, "b-delta-job.json").toFile.exists)
    assert(Paths.get(problems, "c-bad-job.json").toFile.exists)
    assert(runner.runAll().isEmpty)
    val plog = Files.readAllLines(Paths.get(processed, "processed.log"))
      .asScala
    assert(plog.exists(l => l.contains("CORPUSBUILD gen=0") &&
      l.contains("KEPT: 2")), plog.toString)
    assert(plog.exists(l => l.contains("CORPUSDELTA gen=1") &&
      l.contains("KEPT: 1")), plog.toString)

    // a delta over a generation that already landed is refused by the
    // chain gate and its job file lands in problems/
    Files.write(input.resolve("d-redo-job.json"),
      s"""{"Kind":"CorpusDelta","InputDocs":"$deltaDocs",
         |"CorpusDir":"$corpus","Generation":1,
         |"StateDirs":["$st0","$st1"],"StateOutDir":"${st1}_b"}"""
        .stripMargin.getBytes)
    val redo = runner.runAll()
    assert(redo.size == 1 && redo.head._2.isLeft)
    assert(redo.head._2.swap.toOption.get.contains("already exists"))
    assert(Paths.get(problems, "d-redo-job.json").toFile.exists)
  }

  test("CorpusStream kind is resident: each sweep drains only what " +
      "arrived, the job file never archives, an empty sweep drains " +
      "nothing") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft-streamq")
    val input = base.resolve("input"); Files.createDirectories(input)
    val processed = base.resolve("processed").toString
    val problems = base.resolve("problems").toString
    val corpus = base.resolve("corpus").toString
    val stateRoot = base.resolve("state").toString
    val landing = base.resolve("landing"); Files.createDirectories(landing)
    val ckpt = base.resolve("ckpt").toString

    def w(i: Int) = if (i % 20 == 15) "the" else s"t$i"
    def doc(lo: Int) = (lo to lo + 19).map(w).mkString(" ")
    import sqlImplicits._
    def docsDf(rows: (Long, String)*) =
      rows.toSeq.toDF("doc_id", "text").withColumn("lang", lit("en"))
        .select("doc_id", "lang", "text")
    val baseDir = base.resolve("basedocs")
    docsDf(1L -> doc(1), 2L -> doc(101)).coalesce(1)
      .write.parquet(s"$baseDir/documents.parquet")
    def drop(name: String, mtimeSec: Long, rows: (Long, String)*): Unit = {
      val stage = Files.createTempDirectory("graft-streamq-drop")
      docsDf(rows: _*).coalesce(1).write.mode("overwrite")
        .parquet(stage.toString)
      val part = Files.list(stage).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dst = landing.resolve(name)
      Files.move(part, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtimeSec * 1000L))
    }

    // queue: bootstrap (one-shot) sorts before the resident stream job
    Files.write(input.resolve("a-build-job.json"),
      s"""{"Kind":"CorpusBuild","InputDocs":"$baseDir",
         |"CorpusDir":"$corpus","StateDir":"$stateRoot/snap=0"}"""
        .stripMargin.getBytes)
    Files.write(input.resolve("b-stream-job.json"),
      s"""{"Kind":"CorpusStream","LandingDir":"$landing",
         |"CorpusDir":"$corpus","StateRoot":"$stateRoot",
         |"CheckpointDir":"$ckpt"}""".stripMargin.getBytes)
    drop("d1.parquet", 1000, 10L -> doc(41), 11L -> doc(61))

    val sink = JdbcSink("jdbc:derby:memory:streamq;create=true")
    val runner = new JobRunner(spark, sink, input.toString, processed,
      problems)
    val s1 = runner.runAll()
    assert(s1.size == 2, s1.map(_._1).toString)
    val out1 = s1.collectFirst { case (f, Right(o))
      if f.endsWith("b-stream-job.json") => o }.get
      .asInstanceOf[runner.StreamOutcome]
    assert(out1.generations == Seq(1) && out1.nKept == 2, out1.toString)

    // resident: the stream job file is still in the queue, the build is
    // archived; a new drop drains as the NEXT generation only
    assert(input.resolve("b-stream-job.json").toFile.exists)
    assert(Paths.get(processed, "a-build-job.json").toFile.exists)
    drop("d2.parquet", 2000, 20L -> doc(201))
    val s2 = runner.runAll()
    assert(s2.size == 1)
    val out2 = s2.head._2.toOption.get.asInstanceOf[runner.StreamOutcome]
    assert(out2.generations == Seq(2) && out2.nKept == 1, out2.toString)

    // an empty sweep drains nothing and the chain is untouched
    val s3 = runner.runAll()
    val out3 = s3.head._2.toOption.get.asInstanceOf[runner.StreamOutcome]
    assert(out3.generations.isEmpty, out3.toString)
    val landedIds = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(landedIds == Seq(1L, 2L, 10L, 11L, 20L))
    val plog = Files.readAllLines(Paths.get(processed, "processed.log"))
      .asScala
    assert(plog.exists(l => l.contains("b-stream-job.json") &&
      l.contains("CORPUSSTREAM gens=1") && l.contains("KEPT: 2")),
      plog.toString)
  }

  private implicit class JListAsScala[T](l: java.util.List[T]) {
    def asScala: Seq[T] = {
      val b = Seq.newBuilder[T]
      l.forEach(x => b += x)
      b.result()
    }
  }
}
