package graft

import org.apache.spark.sql.functions._
import graft.jobs.{CorpusBuildJob, IncrementalCorpusJob}

/** The incremental corpus lifecycle, asserted against LANDED layouts:
  * bootstrap + N delta ingests must reproduce the full-rebuild kept
  * set (id-ordered arrival), the state chain must accrete snapshot by
  * snapshot, and the two INHERENT divergences of immutable-output
  * incremental dedupe (the late bridge; the dropped-doc relay) are
  * pinned as constructed counterexamples, not discovered in prod. */
class IncrementalCorpusJobSpec extends SparkSpec {

  private val root = sys.env.get("SPARK_GRAFT_TESTDATA")
    .orElse(sys.props.get("graft.testdata"))
    .getOrElse("/root/testdata")
  private val dir = Seq(s"$root/sf0.01", s"$root/sf0.001")
    .find(d => new java.io.File(s"$d/documents.parquet").exists())

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeDocsDir(df: org.apache.spark.sql.DataFrame): String = {
    val d = tmp("graft_docs")
    df.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("bootstrap + two delta generations reproduce the full-rebuild " +
      "kept set; funnel and state chain are consistent") {
    assume(dir.isDefined, "no driver testdata dir on this machine")
    val d = dir.get
    val docs = Tables.documents(spark, d)
      .select("doc_id", "lang", "text").localCheckpoint()
    val ids = docs.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0))
    val (cut1, cut2) = (ids((ids.length * 6) / 10), ids((ids.length * 8) / 10))

    val baseDir = writeDocsDir(docs.filter(col("doc_id") <= cut1))
    val delta1 = docs.filter(col("doc_id") > cut1 && col("doc_id") <= cut2)
    val delta2 = docs.filter(col("doc_id") > cut2)

    val corpusDir = tmp("graft_inc_corpus")
    val (st0, st1, st2) = (tmp("graft_st0"), tmp("graft_st1"), tmp("graft_st2"))
    val boot = IncrementalCorpusJob.bootstrap(spark, baseDir, corpusDir, st0)
    val r1 = IncrementalCorpusJob.ingestDelta(spark, delta1, 1, corpusDir,
      Seq(st0), st1)
    val r2 = IncrementalCorpusJob.ingestDelta(spark, delta2, 2, corpusDir,
      Seq(st0, st1), st2)

    // funnel shape per delta: monotone, and the verdict counts tile the
    // exact-fresh set
    for (r <- Seq(r1, r2)) {
      assert(r.nDelta >= r.nCurated && r.nCurated >= r.nExactFresh,
        r.toString)
      assert(r.nExactFresh == r.nKept + r.nDupBase + r.nDupDelta,
        r.toString)
    }
    // both tiers actually fired somewhere across the two deltas (the
    // fixtures carry cross-batch exact and near dupes)
    assert(r1.nDupBase + r2.nDupBase > 0, s"$r1 / $r2")

    // kept set across generations == the full-rebuild kept set (the
    // driver corpus has no late-bridge/dropped-relay topologies; those
    // are pinned in the constructed test below)
    val fullDir = tmp("graft_full")
    CorpusBuildJob.run(spark, d, fullDir)
    val incKept = spark.read.parquet(corpusDir).select("doc_id")
    val fullKept = spark.read.parquet(fullDir).select("doc_id")
    val onlyInc = incKept.join(fullKept, Seq("doc_id"), "left_anti")
      .collect().map(_.getLong(0)).sorted
    val onlyFull = fullKept.join(incKept, Seq("doc_id"), "left_anti")
      .collect().map(_.getLong(0)).sorted
    assert(onlyInc.isEmpty && onlyFull.isEmpty,
      s"inc-only=${onlyInc.mkString(",")} full-only=${onlyFull.mkString(",")}")

    // landed generations carry verbatim source text
    val src = docs.select(col("doc_id"), col("text").as("src_text"))
    assert(spark.read.parquet(corpusDir).join(src, "doc_id")
      .filter(col("text") =!= col("src_text")).count() == 0)

    // state chain accretes: one snapshot per generation, 1 key row and
    // 1 packed band row (16 sigs) per landed canonical of that
    // generation
    for ((st, n) <- Seq(st0 -> boot.nKept, st1 -> r1.nKept,
        st2 -> r2.nKept)) {
      assert(spark.read.parquet(s"$st/keys").count() == n, st)
      val b = spark.read.parquet(s"$st/bands")
      assert(b.count() == n, st)
      assert(b.filter(size(col("band_sigs")) =!= 16).count() == 0, st)
    }

    // compacting the chain into one snapshot is a content-identity
    // rewrite (both tables, both directions)
    val stC = tmp("graft_stC")
    IncrementalCorpusJob.compactState(spark, Seq(st0, st1, st2), stC)
    for (t <- Seq("keys", "bands")) {
      val chain = spark.read.parquet(Seq(st0, st1, st2)
        .map(_ + s"/$t"): _*)
      val compacted = spark.read.parquet(s"$stC/$t")
      assert(chain.exceptAll(compacted).count() == 0, t)
      assert(compacted.exceptAll(chain).count() == 0, t)
    }

    // id-ordering contract is enforced, not assumed
    val bad = intercept[IllegalArgumentException] {
      IncrementalCorpusJob.ingestDelta(spark, delta1, 3, corpusDir,
        Seq(stC), tmp("graft_st3"))
    }
    assert(bad.getMessage.contains("id-ordered"))
  }

  // Sliding 20-token windows over one token family: doc(lo) covers
  // tokens lo..lo+19 (w15 = "the" so the lang gate reads en; all other
  // gates pass at the job DEFAULTS). Shingle windows overlap exactly,
  // so every pairwise Jaccard is closed-form:
  //   J(doc(1), doc(11)) = 8/28 ≈ 0.286   (below the 0.5 threshold)
  //   J(doc(1), doc(6))  = 13/23 ≈ 0.565  (above)
  //   J(doc(1), doc(7))  = 12/24 = 0.5    (exactly at — >= keeps it)
  //   J(doc(7), doc(13)) = 12/24 = 0.5
  //   J(doc(1), doc(13)) = 6/30 = 0.2     (below)
  private def w(i: Int): String = if (i == 15) "the" else s"t$i"
  private def doc(lo: Int): String = (lo to lo + 19).map(w).mkString(" ")
  private def mk(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
  }

  test("late-bridge and dropped-doc-relay divergences are exactly the " +
      "documented ones; within-delta contamination is transitive") {
    // --- late bridge: C = doc(6) near-dups BOTH landed canonicals
    // A = doc(1), B = doc(11) (which are not near-dups of each other).
    // A full rebuild merges {A,B,C} and keeps only A; incrementally A
    // and B are landed and immutable, C drops, and both stay.
    val baseDir = writeDocsDir(mk(1L -> doc(1), 2L -> doc(11)))
    val corpusDir = tmp("graft_bridge")
    val (st0, st1) = (tmp("graft_bst0"), tmp("graft_bst1"))
    val boot = IncrementalCorpusJob.bootstrap(spark, baseDir, corpusDir,
      st0)
    assert(boot.nKept == 2, boot.toString)
    val r = IncrementalCorpusJob.ingestDelta(spark, mk(10L -> doc(6)), 1,
      corpusDir, Seq(st0), st1)
    assert(r.nDupBase == 1 && r.nKept == 0, r.toString)
    assert(spark.read.parquet(corpusDir).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val fullDir = tmp("graft_bridge_full")
    CorpusBuildJob.run(spark,
      writeDocsDir(mk(1L -> doc(1), 2L -> doc(11), 10L -> doc(6))),
      fullDir)
    assert(spark.read.parquet(fullDir).select("doc_id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))

    // --- transitive contamination: delta {F = doc(7), E = doc(13)}
    // against base {A = doc(1)}: F hits A directly (J = 0.5), E only
    // reaches A through F (J(E,A) = 0.2) — E must fall with its
    // component, not survive because it missed the base directly.
    val base2 = writeDocsDir(mk(1L -> doc(1)))
    val corpus2 = tmp("graft_trans")
    val (s20, s21) = (tmp("graft_tst0"), tmp("graft_tst1"))
    IncrementalCorpusJob.bootstrap(spark, base2, corpus2, s20)
    val r2 = IncrementalCorpusJob.ingestDelta(spark,
      mk(10L -> doc(7), 11L -> doc(13)), 1, corpus2, Seq(s20), s21)
    assert(r2.nDupBase == 2 && r2.nKept == 0, r2.toString)

    // --- dropped-doc relay (the OTHER inherent divergence): at
    // bootstrap F = doc(7) drops as near-dup of K = doc(1); the later
    // E = doc(13) near-dups only the DROPPED F (J = 0.5), not the
    // canonical K (J = 0.2). State indexes canonicals only, so E lands
    // incrementally; a full rebuild merges the chain {K,F,E} and keeps
    // only K.
    val base3 = writeDocsDir(mk(1L -> doc(1), 2L -> doc(7)))
    val corpus3 = tmp("graft_relay")
    val (s30, s31) = (tmp("graft_rst0"), tmp("graft_rst1"))
    val boot3 = IncrementalCorpusJob.bootstrap(spark, base3, corpus3, s30)
    assert(boot3.nKept == 1, boot3.toString)
    // the delta also carries a VERBATIM copy of landed K — the
    // bloom-gated exact tier must kill it before the near-dup tier
    // ever sees it (nExactFresh = 1 = E alone)
    val r3 = IncrementalCorpusJob.ingestDelta(spark,
      mk(10L -> doc(13), 11L -> doc(1)), 1, corpus3, Seq(s30), s31)
    assert(r3.nCurated == 2 && r3.nExactFresh == 1, r3.toString)
    assert(r3.nKept == 1 && r3.nDupBase == 0, r3.toString) // E lands
    val full3 = tmp("graft_relay_full")
    CorpusBuildJob.run(spark,
      writeDocsDir(mk(1L -> doc(1), 2L -> doc(7), 10L -> doc(13))),
      full3)
    assert(spark.read.parquet(full3).select("doc_id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
