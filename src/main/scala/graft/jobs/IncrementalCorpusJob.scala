package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{CorpusOps, IncrementalDedupe, TextOps}

/** The INCREMENTAL corpus lifecycle — how a training corpus actually
  * lives at 100 TB: built once ([[bootstrap]] = the full
  * [[CorpusBuildJob]]), then grown batch-by-batch ([[ingestDelta]])
  * without ever re-pairing or re-scanning what already landed.
  *
  * Layout contract:
  *  - Corpus generations land under `corpusDir/gen=N/shard=K/…` — one
  *    immutable generation per ingested batch; `spark.read.parquet
  *    (corpusDir)` reassembles the whole corpus with `gen` + `shard` as
  *    partition columns (partition-pruned reads per generation/shard).
  *  - Dedupe state is a chain of IMMUTABLE SNAPSHOTS, one dir per
  *    generation, each holding ONLY that generation's additions
  *    (`keys/` exact-content keys, `bands/` the LSH band index packed
  *    as one 16-sig array row per landed canonical — ~150 B at rest,
  *    independent of document size). A run reads the union of all
  *    prior snapshots and writes
  *    one new snapshot: O(delta) writes, no state rewrite, and any
  *    generation is reproducible by replaying the chain.
  *
  * Per-delta cost: curate is map-only over the delta; the exact tier
  * bloom-gates against the landed key table (one un-shuffled pass to
  * build the filter; only probe-positives reach the exact semi-join);
  * the
  * near-dup tier probes the band index and fetches landed TEXT only for
  * band-candidates (see [[IncrementalDedupe.neardupVerdicts]]); packing
  * and the shard write touch only kept delta docs. Nothing is
  * proportional to the landed corpus except the state-key/band unions,
  * which are ~256 bytes per landed canonical.
  *
  * Ordering contract (asserted): delta doc ids must be strictly greater
  * than every landed id, so "landed canonicals win" coincides with the
  * corpus-wide keep-first (min-id) rule of the full rebuild. Under that
  * contract the incremental kept set EQUALS the full-rebuild kept set,
  * except the inherent late-bridge divergence documented on
  * [[IncrementalDedupe]] (pinned in IncrementalCorpusJobSpec).
  *
  * Reference lifecycle analog: `datapump.py`'s repeated-run queue
  * (Entry 2-3) reconciling new records against the landed resource.
  */
object IncrementalCorpusJob {

  /** Audit of one delta ingestion, counts read back from the LANDED
    * generation where possible (a write-path bug cannot hide). The
    * funnel: nDelta ≥ nCurated ≥ nExactFresh = nKept + nDupBase +
    * nDupDelta. */
  case class DeltaReport(
      generation: Int,
      nDelta: Long, nCurated: Long, nExactFresh: Long,
      nKept: Long, nDupBase: Long, nDupDelta: Long,
      nSequences: Long, totalTokens: Long,
      genDir: String, stateOutDir: String)

  /** Full build of the initial corpus into `corpusDir/gen=0` plus the
    * generation-0 state snapshot. */
  def bootstrap(spark: SparkSession, docsDir: String, corpusDir: String,
      stateOutDir: String,
      minTokens: Int = 20, maxTokens: Int = 90,
      minQuality: Double = 0.58, dedupeThreshold: Double = 0.5,
      budgetTokens: Int = 2048, seed: Long = 7L,
      numShards: Int = 8): CorpusBuildJob.Report = {
    val rep = CorpusBuildJob.run(spark, docsDir, s"$corpusDir/gen=0",
      minTokens, maxTokens, minQuality, dedupeThreshold, budgetTokens,
      seed, numShards)
    writeState(spark.read.parquet(s"$corpusDir/gen=0")
      .select("doc_id", "text"), stateOutDir, single = false)
    rep
  }

  /** Ingest one delta batch as generation `generation`: curate →
    * exact-vs-state → near-dup-vs-state (transitive through the batch)
    * → pack → shard write → state snapshot. `stateInDirs` is the chain
    * of ALL prior snapshots (bootstrap's plus one per prior delta). */
  def ingestDelta(spark: SparkSession, deltaDocs: DataFrame,
      generation: Int, corpusDir: String,
      stateInDirs: Seq[String], stateOutDir: String,
      minTokens: Int = 20, maxTokens: Int = 90,
      minQuality: Double = 0.58, dedupeThreshold: Double = 0.5,
      budgetTokens: Int = 2048, seed: Long = 7L,
      numShards: Int = 8): DeltaReport = {
    require(generation > 0, "generation 0 is bootstrap's")
    val delta = deltaDocs.select("doc_id", "lang", "text")
      .localCheckpoint()
    val stateKeys = spark.read
      .parquet(stateInDirs.map(_ + "/keys"): _*).localCheckpoint()
    val stateBands = IncrementalDedupe.explodeBands(
      spark.read.parquet(stateInDirs.map(_ + "/bands"): _*), "doc_id")

    // ordering contract: landed ids all precede delta ids (keep-first
    // parity with a full rebuild; both aggs run over small relations)
    val maxLanded = stateKeys.agg(max("doc_id")).head.getLong(0)
    val minDelta = delta.agg(min("doc_id")).head.getLong(0)
    require(minDelta > maxLanded,
      s"delta ids must follow landed ids (landed max $maxLanded, " +
        s"delta min $minDelta) — keep-first parity needs id-ordered " +
        "arrival")

    // stage 1: curate (quality gates + WITHIN-delta exact keep-first)
    val curKeep = TextOps.curate(delta, "doc_id", "text",
        minTokens, maxTokens, minQuality)
      .filter(col("keep")).select("doc_id")
    val curated = delta.join(curKeep, "doc_id").localCheckpoint()

    // stage 2: exact tier vs landed — BLOOM-GATED (the
    // dedupe_incremental_bloom tier wired into the job): the landed
    // key table folds into a ~9-bits/key filter (one pass over the
    // checkpointed state, a mergeable aggregate — the state is never
    // shuffled), bloom-negatives are DEFINITIVELY fresh (no false
    // negatives), and only probe-positives reach the exact semi-join,
    // so the join input is |dupes| + 1%·|fresh| instead of |delta|.
    // Result identical to a plain anti-join by construction.
    val keyed = curated
      .withColumn("__k", IncrementalDedupe.exactKey(col("text")))
      .localCheckpoint()
    val bf = stateKeys.stat.bloomFilter("k",
      math.max(stateKeys.count(), 1000L), 0.01)
    val bfBc = spark.sparkContext.broadcast(bf)
    val might = udf((k: Long) => bfBc.value.mightContainLong(k))
    val dupIds = keyed.filter(might(col("__k")))
      .join(stateKeys.select(col("k").as("__k")), Seq("__k"), "left_semi")
      .select("doc_id")
    val fresh = keyed.join(dupIds, Seq("doc_id"), "left_anti")
      .drop("__k").localCheckpoint()

    // stage 3: near-dup tier vs landed band index; landed TEXT is read
    // candidate-wise from the corpus itself (state stores no text)
    val landedText = spark.read.parquet(corpusDir)
      .select("doc_id", "text")
    val verdicts = IncrementalDedupe.neardupVerdicts(fresh, "doc_id",
      "text", stateBands, landedText, dedupeThreshold).localCheckpoint()
    val kept = fresh.join(
      verdicts.filter(col("status") === "kept").select("doc_id"),
      "doc_id").localCheckpoint()

    // stage 4: pack THIS generation's stream and land its shards. An
    // all-dropped delta lands NO generation dir (a zero-row
    // partitionBy write emits no files, so a later read could not
    // infer its schema) — but it still gets a schema-ful empty state
    // snapshot so the chain union stays readable.
    val keptN = kept.count()
    val genDir = s"$corpusDir/gen=$generation"
    if (keptN > 0) {
      val packed = CorpusOps.packSequences(kept, "doc_id", "lang",
        "text", budgetTokens)
      CorpusOps.writeShuffled(
        packed.join(kept.select("doc_id", "text"), "doc_id"),
        "doc_id", seed + generation, numShards, genDir)
      // stage 5: state snapshot for this generation (additions only),
      // built from the LANDED rows so a write-path bug cannot hide
      writeState(spark.read.parquet(genDir).select("doc_id", "text"),
        stateOutDir, single = false)
    } else {
      writeState(kept.select("doc_id", "text").limit(0), stateOutDir,
        single = true)
    }

    // audit from the landed generation + the verdict relation
    val statusCounts = verdicts.groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (nseq, tok) =
      if (keptN == 0) (0L, 0L)
      else {
        val a = spark.read.parquet(genDir).agg(
          count_distinct(col("lang"), col("bin_id")).as("nseq"),
          sum("n_tokens").as("tok")).head
        (a.getLong(0), a.getLong(1))
      }
    DeltaReport(
      generation = generation,
      nDelta = delta.count(), nCurated = curated.count(),
      nExactFresh = fresh.count(),
      nKept = keptN,
      nDupBase = statusCounts.getOrElse("dup_base", 0L),
      nDupDelta = statusCounts.getOrElse("dup_delta", 0L),
      nSequences = nseq,
      totalTokens = tok,
      genDir = genDir, stateOutDir = stateOutDir)
  }

  /** Merge a snapshot chain into ONE snapshot — the manifest-compaction
    * analog of the generation model: after many generations the
    * chain's file count (not its bytes) is what costs, and compaction
    * is a pure union rewrite, content-identical by construction
    * (asserted in IncrementalCorpusJobSpec). Subsequent ingests pass
    * `Seq(compactedDir)` instead of the chain. */
  def compactState(spark: SparkSession, stateInDirs: Seq[String],
      stateOutDir: String): Unit = {
    spark.read.parquet(stateInDirs.map(_ + "/keys"): _*)
      .write.mode("overwrite").parquet(s"$stateOutDir/keys")
    spark.read.parquet(stateInDirs.map(_ + "/bands"): _*)
      .write.mode("overwrite").parquet(s"$stateOutDir/bands")
  }

  /** `single = true` forces one write task so a ZERO-ROW snapshot still
    * lands a schema-bearing parquet file (the task opens the file and
    * writes the footer even with no rows). */
  private def writeState(landed: DataFrame, stateDir: String,
      single: Boolean): Unit = {
    val (keys, bands) = IncrementalDedupe.stateRows(landed,
      "doc_id", "text")
    def w(df: DataFrame, p: String): Unit =
      (if (single) df.coalesce(1) else df)
        .write.mode("overwrite").parquet(p)
    w(keys, s"$stateDir/keys")
    w(bands, s"$stateDir/bands")
  }
}
