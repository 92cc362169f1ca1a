package graft

import org.apache.spark.sql.functions._
import graft.jobs.CorpusBuildJob
import graft.ops.TextOps

/** End-to-end corpus-build job over the DRIVER testdata: every
  * invariant is asserted against the LANDED parquet layout (read back
  * from disk), not the in-memory frames — the composed
  * ingest→curate→dedupe→pack→shuffled-write journey a user of the
  * library actually runs. Canceled when no testdata dir exists. */
class CorpusBuildJobSpec extends SparkSpec {

  private val root = sys.env.get("SPARK_GRAFT_TESTDATA")
    .orElse(sys.props.get("graft.testdata"))
    .getOrElse("/root/testdata")
  private val dir = Seq(s"$root/sf0.01", s"$root/sf0.001")
    .find(d => new java.io.File(s"$d/documents.parquet").exists())

  test("corpus build: funnel, conservation, layout, and determinism " +
      "hold on the landed output") {
    assume(dir.isDefined, "no driver testdata dir on this machine")
    val d = dir.get
    val out1 = java.nio.file.Files
      .createTempDirectory("graft_build1").toString
    val r = CorpusBuildJob.run(spark, d, out1)

    // funnel monotone and non-vacuous: every stage kept something and
    // cut something (the sf fixtures carry real dupes + quality tails)
    assert(r.nInput >= r.nCurated && r.nCurated >= r.nKept,
      r.toString)
    assert(r.nKept > 0 && r.nCurated < r.nInput, r.toString)

    val landed = spark.read.parquet(out1).localCheckpoint()
    assert(landed.count() == r.nKept)

    // every landed doc is a curation survivor (keep recomputed from
    // the source) and carries its source text verbatim
    val keepIds = TextOps.curate(Tables.documents(spark, d),
        "doc_id", "text", 20, 90, 0.58)
      .filter(col("keep")).select("doc_id")
    assert(landed.join(keepIds, Seq("doc_id"), "left_anti").count() == 0,
      "landed a doc curation rejected")
    val src = Tables.documents(spark, d).select(col("doc_id"),
      col("text").as("src_text"))
    assert(landed.join(src, "doc_id")
      .filter(col("text") =!= col("src_text")).count() == 0)

    // token conservation + packing geometry, all recomputed from the
    // landed rows: per lang the doc stream is contiguous (no gaps:
    // max(start+n) == sum(n)) and bin_id is exactly
    // floor(start_offset / budget)
    assert(landed.filter(col("n_tokens") =!=
      size(split(col("text"), " ", -1))).count() == 0)
    assert(r.totalTokens ==
      landed.agg(sum("n_tokens")).head.getLong(0))
    val geo = landed.groupBy("lang").agg(
      max(col("start_offset") + col("n_tokens")).as("hi"),
      sum(col("n_tokens")).as("tot"))
    assert(geo.filter(col("hi") =!= col("tot")).count() == 0,
      "per-lang token stream has gaps")
    assert(landed.filter(col("bin_id") =!=
      floor(col("start_offset") / 2048)).count() == 0)
    assert(r.nSequences ==
      landed.select("lang", "bin_id").distinct().count())

    // shard layout: partition dirs exist, shard = pmod(key, n), and
    // within-file order is ascending shuffle_key (the loader contract)
    val shardDirs = new java.io.File(out1).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shardDirs.nonEmpty && shardDirs.length <= r.numShards)
    val withShard = spark.read.parquet(out1)
    assert(withShard.filter(col("shard") =!=
      pmod(col("shuffle_key"), lit(8)).cast("int")).count() == 0)

    // determinism: a second run lands byte-equal row sets
    val out2 = java.nio.file.Files
      .createTempDirectory("graft_build2").toString
    val r2 = CorpusBuildJob.run(spark, d, out2)
    assert(r2.copy(outDir = r.outDir) == r)
    val a = spark.read.parquet(out1)
      .select("doc_id", "lang", "text", "n_tokens", "start_offset",
        "bin_id", "shuffle_key", "shard")
    val b = spark.read.parquet(out2)
      .select("doc_id", "lang", "text", "n_tokens", "start_offset",
        "bin_id", "shuffle_key", "shard")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
