package graft

import graft.jobs.{ChainPosture, CorpusStreamJob, IncrementalCorpusJob}

/** The chain-dimension posture gate (VERDICT r14 ask #6), suite-scale:
  * 24 generations over the sf0.001 bootstrap with compaction every 8.
  * Asserts (a) per-delta wall time stays FLAT as the chain deepens —
  * the O(candidates)-per-delta claim's chain dimension, (b) the live
  * chain listing is bounded by supersedence (compaction actually
  * vacuums), and (c) recover() still repairs kill windows at depth.
  * The measured 50-generation sf0.1 protocol (`graft.ChainPosture`)
  * is recorded in PLANS round 15. */
class ChainPostureSpec extends SparkSpec {

  private val dir = Seq(sfDir("0.001"), sfDir("0.01"))
    .find(d => new java.io.File(d).isDirectory)

  test("24 generations with compaction every 8: flat per-delta time, " +
      "bounded live chain, recovery at depth") {
    assume(dir.isDefined, "no driver testdata dir on this machine")
    val (timings, corpus, stateRoot) =
      ChainPosture.drive(spark, dir.get, nGens = 24, deltaSize = 20,
        compactEvery = 8)
    assert(timings.size == 24)
    // (a) flatness: the last third must not cost more than 3x the
    // middle third (the first gens carry plan/JIT warmup, so the
    // middle is the honest baseline; a chain-length term would make
    // gen 17-24 strictly dearer than gen 9-16)
    val mid = timings.slice(8, 16).map(_.ingestSec)
    val last = timings.slice(16, 24).map(_.ingestSec)
    val (midMean, lastMean) = (mid.sum / mid.size, last.sum / last.size)
    info(f"per-delta mean: mid8=$midMean%.2fs last8=$lastMean%.2fs " +
      f"(full: ${timings.map(t => f"${t.ingestSec}%.2f").mkString(",")})")
    assert(lastMean < midMean * 3,
      f"per-delta time grows with chain depth: mid $midMean%.2fs -> " +
        f"last $lastMean%.2fs")
    // (b) supersedence bounds the listing: never more than
    // compactEvery live snaps above the newest compact (+1 for it)
    assert(timings.map(_.liveDirs).max <= 9,
      s"live chain unbounded: ${timings.map(_.liveDirs).mkString(",")}")
    assert(CorpusStreamJob.chainDirs(spark, stateRoot).size == 1,
      "gen 24 compaction should leave exactly compact=24")
    // (c) recovery at depth — both kill windows of generation 25:
    // staged leftovers with no committed snapshot roll back...
    // (the staging shape `corpus.staging/gen=N` is the commit
    // protocol's, IncrementalCorpusJob.stagingDir)
    new java.io.File(s"${corpus.stripSuffix("/")}.staging/gen=25").mkdirs()
    val did = IncrementalCorpusJob.recover(spark, corpus, 25,
      s"$stateRoot/snap=25")
    assert(did == "rolled-back" || did == "nothing-to-recover", did)
    // ...and a landed-generation/missing-snapshot kill rolls the state
    // forward by rebuilding it (state is a pure function of the text)
    val r25 = CorpusStreamJob.ingestBatch(spark,
      ChainPosture.mkDocs(spark, 900000L to 900019L), corpus, stateRoot,
      graft.jobs.CorpusKnobs(minTokens = 1, maxTokens = 10000,
        minQuality = 0.0, numShards = 2))
    assert(r25.exists(_.generation == 25))
    val snap25 = new java.io.File(s"$stateRoot/snap=25")
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteRec)
      f.delete()
    }
    deleteRec(snap25)
    assert(IncrementalCorpusJob.recover(spark, corpus, 25,
      s"$stateRoot/snap=25") == "state-rebuilt")
    // the repaired chain keeps ingesting
    val r26 = CorpusStreamJob.ingestBatch(spark,
      ChainPosture.mkDocs(spark, 910000L to 910019L), corpus, stateRoot,
      graft.jobs.CorpusKnobs(minTokens = 1, maxTokens = 10000,
        minQuality = 0.0, numShards = 2))
    assert(r26.exists(_.generation == 26))
  }
}
