package graft.jobs

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.ops.{CorpusOps, IncrementalDedupe, TextOps}

/** The INCREMENTAL corpus lifecycle — how a training corpus actually
  * lives at 100 TB: built once ([[bootstrap]] = the full
  * [[CorpusBuildJob]]), then grown batch-by-batch ([[ingestDelta]])
  * without ever re-pairing or re-scanning what already landed.
  *
  * Layout contract:
  *  - Corpus generations land under `corpusDir/gen=N/…` — one immutable
  *    generation per ingested batch, ID-CLUSTERED
  *    ([[CorpusOps.writeIdClustered]]: id-range files, rows ascending by
  *    `doc_id`). Because delta ids are generation-monotonic (enforced
  *    below), the WHOLE corpus is globally id-clustered: `gen` prunes as
  *    a partition column and `doc_id` ranges prune at row-group level —
  *    which is what makes the per-delta candidate-text fetch
  *    O(candidates) instead of O(corpus) ([[prunedTextFetch]]).
  *    `spark.read.parquet(corpusDir)` reassembles the whole corpus.
  *  - Dedupe state is a chain of IMMUTABLE SNAPSHOTS, one dir per
  *    generation, each holding ONLY that generation's additions
  *    (`keys/` exact-content keys, `bands/` the LSH band index packed
  *    as one 16-sig array row per landed canonical — ~150 B at rest,
  *    independent of document size) plus a `meta.json` carrying the
  *    generation's canonical count and id range, so chain-wide facts
  *    (bloom sizing, the ordering check, fetch pruning ranges) cost a
  *    driver-side metadata read instead of a state-chain scan. A run
  *    reads the union of all prior snapshots and writes one new
  *    snapshot: O(delta) writes, no state rewrite, and any generation
  *    is reproducible by replaying the chain.
  *
  * Crash safety (single commit point + derivable state): a delta stages
  * its shards at `<corpusDir>.staging/gen=N` (a SIBLING dir of the
  * corpus — invisible to every corpus read by construction, and on the
  * same filesystem so the commit rename stays atomic), writes the
  * state snapshot from the STAGED
  * bytes via tmp-dir + atomic rename, and only then renames the staging
  * dir to `gen=N` — the rename IS the commit. A kill in any window
  * leaves a chain [[recover]] repairs mechanically: snapshot present
  * but `gen=N` missing → roll the staged dir forward (the snapshot is
  * only ever written after staging completed); staged dir present but
  * no snapshot → roll back and re-run the delta; landed generation
  * with no snapshot (a bootstrap kill) → rebuild the snapshot from the
  * landed text, of which state is a pure function. [[ingestDelta]]
  * validates chain/landed consistency up front so an unrepaired crash
  * fails loudly instead of silently re-admitting near-dups.
  *
  * Per-delta cost: curate is map-only over the delta; the exact tier
  * bloom-gates against the landed key table (filter sized from chain
  * metadata — no counting pass; only probe-positives reach the exact
  * semi-join); the near-dup tier probes the band index and fetches
  * landed TEXT only for band-candidates through the pruned generation
  * reads; packing and the shard write touch only kept delta docs.
  * Nothing is proportional to the landed corpus except the
  * state-key/band unions, which are ~256 bytes per landed canonical.
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

  /** One generation's entry in a snapshot's `meta.json`: how many
    * canonicals it landed and their id range (empty generation ⇒
    * `nKeys == 0`, range `[0, -1]` — matches nothing), plus the full
    * id ENVELOPE of the ingested batch BEFORE curation/dedupe
    * (`batchMin`/`batchMax`; sentinel `[0, -1]` when unrecorded —
    * bootstrap, or a pre-envelope chain). The envelope is what makes a
    * crash-replayed batch exactly recognizable ([[graft.jobs.CorpusStreamJob]]):
    * kept ranges alone cannot distinguish a replay from a new
    * overlapping batch that happens to cover them. A compacted
    * snapshot's meta carries one entry per covered generation, so
    * compaction loses no pruning or replay precision.
    *
    * `batchCount`/`batchHash` (r15) are a cheap CONTENT fingerprint of
    * the same pre-curation batch (row count + order-insensitive
    * bit_xor of per-row xxhash64): envelope equality alone cannot
    * distinguish a replay from a genuinely new batch whose [min,max]
    * happens to coincide with the head's (possible after an
    * all-dropped head when a producer re-drops the same id range with
    * different content). Sentinel `batchCount = -1` on pre-fingerprint
    * chains and rebuilt snapshots — recognition then degrades to
    * envelope-only, the pre-r15 behavior. */
  case class GenMeta(gen: Int, nKeys: Long, minDocId: Long, maxDocId: Long,
      batchMin: Long = 0L, batchMax: Long = -1L,
      batchCount: Long = -1L, batchHash: Long = 0L) {
    /** True when the ingested batch's id envelope was recorded. */
    def hasEnvelope: Boolean = batchMax >= batchMin
    /** True when the ingested batch's content fingerprint was recorded. */
    def hasFingerprint: Boolean = batchCount >= 0L
  }

  /** Full build of the initial corpus into `corpusDir/gen=0` plus the
    * generation-0 state snapshot, through the same staged commit
    * protocol as [[ingestDelta]] (stage → snapshot → rename). */
  def bootstrap(spark: SparkSession, docsDir: String, corpusDir: String,
      stateOutDir: String,
      minTokens: Int = 20, maxTokens: Int = 90,
      minQuality: Double = 0.58, dedupeThreshold: Double = 0.5,
      budgetTokens: Int = 2048, seed: Long = 7L,
      numShards: Int = 8): CorpusBuildJob.Report = {
    val staging = stagingDir(corpusDir, 0)
    val rep = CorpusBuildJob.run(spark, docsDir, staging,
      minTokens, maxTokens, minQuality, dedupeThreshold, budgetTokens,
      seed, numShards, clusterById = true)
    writeStateCommitted(spark,
      spark.read.parquet(staging).select("doc_id", "text"),
      generation = 0, stateOutDir, single = false)
    commitGeneration(spark, corpusDir, 0)
    rep.copy(outDir = s"$corpusDir/gen=0")
  }

  /** Ingest one delta batch as generation `generation`: curate →
    * exact-vs-state → near-dup-vs-state (transitive through the batch)
    * → pack → staged shard write → state snapshot → commit rename.
    * `stateInDirs` is the chain of ALL prior snapshots (bootstrap's
    * plus one per prior delta, or a [[compactState]] merge). */
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
    val chainMeta = readChainMeta(spark, stateInDirs)
    chainMeta.foreach(validateChain(spark, corpusDir, _, generation))
    val stateKeys = spark.read
      .parquet(stateInDirs.map(_ + "/keys"): _*).localCheckpoint()
    val stateBands = IncrementalDedupe.explodeBands(
      spark.read.parquet(stateInDirs.map(_ + "/bands"): _*), "doc_id")

    // ordering contract: landed ids all precede delta ids (keep-first
    // parity with a full rebuild). With chain metadata this is a
    // driver-side comparison; without it (a pre-metadata chain) it
    // falls back to one agg over the checkpointed key table.
    val maxLanded = chainMeta
      .map(_.filter(_.nKeys > 0).map(_.maxDocId).max)
      .getOrElse(stateKeys.agg(max("doc_id")).head.getLong(0))
    val (minDelta, maxDelta, fpCount, fpHash) = envelopeFingerprint(delta)
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
    // Sizing comes from chain metadata — the state chain is NOT
    // re-counted per delta (that second pass was r13's cost bug).
    // Result identical to a plain anti-join by construction.
    val keyed = curated
      .withColumn("__k", IncrementalDedupe.exactKey(col("text")))
      .localCheckpoint()
    val nLandedKeys = chainMeta.map(_.map(_.nKeys).sum)
      .getOrElse(stateKeys.count())
    val bf = stateKeys.stat.bloomFilter("k",
      math.max(nLandedKeys, 1000L), 0.01)
    val bfBc = spark.sparkContext.broadcast(bf)
    val might = udf((k: Long) => bfBc.value.mightContainLong(k))
    val dupIds = keyed.filter(might(col("__k")))
      .join(stateKeys.select(col("k").as("__k")), Seq("__k"), "left_semi")
      .select("doc_id")
    val fresh = keyed.join(dupIds, Seq("doc_id"), "left_anti")
      .drop("__k").localCheckpoint()

    // stage 3: near-dup tier vs landed band index; landed TEXT is read
    // candidate-wise — with chain metadata, through generation-pruned
    // row-group-skipping reads (O(candidates) corpus I/O); without it,
    // through the plain semi-join fetch (reads the corpus's two
    // columns once)
    val fetch: DataFrame => DataFrame = chainMeta match {
      case Some(metas) =>
        prunedTextFetch(spark, corpusDir, "doc_id", "text", metas)
      case None => ids =>
        spark.read.parquet(corpusDir).select("doc_id", "text")
          .join(ids, Seq("doc_id"), "left_semi")
    }
    val verdicts = IncrementalDedupe.neardupVerdicts(fresh, "doc_id",
      "text", stateBands, fetch, dedupeThreshold).localCheckpoint()
    val kept = fresh.join(
      verdicts.filter(col("status") === "kept").select("doc_id"),
      "doc_id").localCheckpoint()

    // stage 4: pack THIS generation's stream and STAGE its shards
    // (invisible to readers until the commit rename below). An
    // all-dropped delta lands NO generation dir — but it still gets a
    // schema-ful empty state snapshot so the chain union stays
    // readable.
    val keptN = kept.count()
    val genDir = s"$corpusDir/gen=$generation"
    if (keptN > 0) {
      val staging = stagingDir(corpusDir, generation)
      val packed = CorpusOps.packSequences(kept, "doc_id", "lang",
        "text", budgetTokens)
      CorpusOps.writeIdClustered(
        packed.join(kept.select("doc_id", "text"), "doc_id"),
        "doc_id", seed + generation, numShards, staging)
      // stage 5: state snapshot for this generation (additions only),
      // built from the STAGED bytes (= the landed bytes after the
      // rename) so a write-path bug cannot hide; then the commit
      // rename makes the generation visible
      writeStateCommitted(spark,
        spark.read.parquet(staging).select("doc_id", "text"),
        generation, stateOutDir, single = false,
        envelope = Some((minDelta, maxDelta)),
        fingerprint = Some((fpCount, fpHash)))
      commitGeneration(spark, corpusDir, generation)
    } else {
      writeStateCommitted(spark, kept.select("doc_id", "text").limit(0),
        generation, stateOutDir, single = true,
        envelope = Some((minDelta, maxDelta)),
        fingerprint = Some((fpCount, fpHash)))
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

  /** The O(candidates) landed-text fetch: candidates are mapped to the
    * generations whose id ranges contain them (a broadcast join against
    * the ≤|generations|-row metadata relation), and each touched
    * generation is read with a PUSHED id predicate — a per-generation
    * range always, plus the exact id-IN list when the candidate set is
    * small enough to collect (the `pqCosineTopKFromLayout` rerank
    * precedent). Because generation files are id-clustered, those
    * predicates prune at row-group level off parquet min/max footers;
    * untouched generations are never opened at all. Driver-side data
    * is O(|generations|) rows plus at most `maxInIds` collected ids —
    * never O(corpus), never O(delta).
    *
    * The trailing left-semi join restores row-exactness over whatever
    * the pruned scan let through (row groups are coarse). */
  def prunedTextFetch(spark: SparkSession, corpusDir: String,
      idCol: String, textCol: String, metas: Seq[GenMeta],
      maxInIds: Int = 4096): DataFrame => DataFrame = { candIdsIn =>
    // the candidate relation feeds 2-3 actions below — materialize once
    val candIds = candIdsIn.localCheckpoint()
    val ranges = metas.filter(_.nKeys > 0)
    val empty = () => spark.read.parquet(corpusDir)
      .select(col(idCol), col(textCol)).limit(0)
    if (ranges.isEmpty) empty()
    else {
      val rangeDf = spark.createDataFrame(
        ranges.map(m => (m.gen, m.minDocId, m.maxDocId)))
        .toDF("__gen", "__lo", "__hi")
      // ≤ one row per generation: which gens hold candidates, and the
      // candidate id envelope within each
      val perGen = candIds
        .join(broadcast(rangeDf),
          col(idCol).between(col("__lo"), col("__hi")))
        .groupBy("__gen")
        .agg(min(idCol).as("__mn"), max(idCol).as("__mx"),
          count(lit(1)).as("__n"))
        .collect()
      if (perGen.isEmpty) empty()
      else {
        val totalCand = perGen.map(_.getAs[Long]("__n")).sum
        // bounded collect: only when the whole candidate set fits the
        // id-IN budget (point predicates prune sharper than the range
        // envelope when candidates are sparse within a generation)
        val idList: Option[Seq[Long]] =
          if (totalCand <= maxInIds)
            Some(candIds.collect().map(_.getLong(0)).toIndexedSeq)
          else None
        val parts = perGen.toSeq.map { r =>
          val g = r.getAs[Int]("__gen")
          val base = spark.read.parquet(s"$corpusDir/gen=$g")
            .filter(col(idCol).between(
              r.getAs[Long]("__mn"), r.getAs[Long]("__mx")))
          idList.fold(base)(ids => base.filter(col(idCol).isin(ids: _*)))
            .select(col(idCol), col(textCol))
        }
        parts.reduce(_ union _)
          .join(candIds, Seq(idCol), "left_semi")
      }
    }
  }

  /** Merge a snapshot chain into ONE snapshot — the manifest-compaction
    * analog of the generation model: after many generations the
    * chain's file count (not its bytes) is what costs, and compaction
    * is a pure union rewrite, content-identical by construction
    * (asserted in IncrementalCorpusJobSpec). The merged `meta.json`
    * keeps one entry PER COVERED GENERATION (a driver-side JSON merge —
    * no state scan), so bloom sizing and fetch pruning lose nothing.
    * Subsequent ingests pass `Seq(compactedDir)` instead of the
    * chain. */
  def compactState(spark: SparkSession, stateInDirs: Seq[String],
      stateOutDir: String): Unit = {
    spark.read.parquet(stateInDirs.map(_ + "/keys"): _*)
      .write.mode("overwrite").parquet(s"$stateOutDir/keys")
    spark.read.parquet(stateInDirs.map(_ + "/bands"): _*)
      .write.mode("overwrite").parquet(s"$stateOutDir/bands")
    readChainMeta(spark, stateInDirs).foreach(metas =>
      writeMeta(spark, stateOutDir, metas.sortBy(_.gen)))
  }

  /** Repair a chain interrupted mid-commit. Returns what it did:
    * `committed` (nothing to do), `rolled-forward` (snapshot landed but
    * the gen rename didn't — finish it; safe because the snapshot is
    * only ever written AFTER the staging write completed),
    * `state-rebuilt` (generation landed but its snapshot is missing —
    * rebuild it from the landed text, of which state is a pure
    * function), `rolled-back` (staging/tmp leftovers with no committed
    * snapshot — delete them; re-run the delta), or `committed-empty`
    * (the snapshot says the generation landed nothing, so no dir is
    * expected). */
  def recover(spark: SparkSession, corpusDir: String, generation: Int,
      stateDir: String): String = {
    val fs = new Path(corpusDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val genP = new Path(s"$corpusDir/gen=$generation")
    val stagP = new Path(stagingDir(corpusDir, generation))
    val tmpP = new Path(stateDir + ".tmp")
    val stateP = new Path(stateDir)
    def clean(): Unit = {
      fs.delete(stagP, true); fs.delete(tmpP, true)
    }
    if (fs.exists(genP) && fs.exists(stateP)) { clean(); "committed" }
    else if (fs.exists(genP)) {
      // landed, snapshot missing (bootstrap-shaped kill): state is a
      // pure function of the landed text — rebuild it
      writeStateCommitted(spark,
        spark.read.parquet(genP.toString).select("doc_id", "text"),
        generation, stateDir, single = false)
      clean(); "state-rebuilt"
    } else if (fs.exists(stateP)) {
      if (fs.exists(stagP)) {
        // the commit rename didn't happen; staging is complete by the
        // write protocol's ordering — roll forward
        require(fs.rename(stagP, genP), s"rename $stagP -> $genP failed")
        fs.delete(tmpP, true); "rolled-forward"
      } else {
        val meta = readChainMeta(spark, Seq(stateDir))
        val isEmpty = meta.exists(_.forall(m =>
          m.gen != generation || m.nKeys == 0))
        if (isEmpty) { fs.delete(tmpP, true); "committed-empty" }
        else throw new IllegalStateException(
          s"snapshot $stateDir claims generation $generation landed " +
            "canonicals but neither gen dir nor staging exists — " +
            "chain is unrecoverable without re-ingesting the delta")
      }
    } else if (fs.exists(stagP) || fs.exists(tmpP)) {
      clean(); "rolled-back"
    } else "nothing-to-recover"
  }

  /** Chain/landed consistency gate run at the top of [[ingestDelta]]:
    * every landed `gen=K` dir must be covered by the snapshot chain
    * (else a crash left a generation invisible to dedupe state — the
    * silent near-dup re-admission the commit protocol exists to
    * prevent), and every chain entry claiming canonicals must have its
    * generation landed. Fails loudly, naming [[recover]]. */
  private def validateChain(spark: SparkSession, corpusDir: String,
      metas: Seq[GenMeta], ingesting: Int): Unit = {
    val fs = new Path(corpusDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val landed: Set[Int] =
      if (!fs.exists(new Path(corpusDir))) Set.empty
      else fs.listStatus(new Path(corpusDir)).toSeq
        .map(_.getPath.getName)
        .collect { case s if s.startsWith("gen=") =>
          s.stripPrefix("gen=").toInt }
        .toSet
    val covered = metas.map(_.gen).toSet
    val nonEmpty = metas.filter(_.nKeys > 0).map(_.gen).toSet
    val uncovered = landed -- covered
    require(uncovered.isEmpty,
      s"landed generation(s) ${uncovered.toSeq.sorted.mkString(",")} " +
        "have no state snapshot in the chain — run " +
        "IncrementalCorpusJob.recover (or pass their snapshots) before " +
        "ingesting, else their near-dups would be re-admitted")
    val ghost = nonEmpty -- landed
    require(ghost.isEmpty,
      s"chain snapshot(s) for generation(s) " +
        s"${ghost.toSeq.sorted.mkString(",")} claim landed canonicals " +
        "but no gen dir exists — run IncrementalCorpusJob.recover to " +
        "roll the staged generation forward")
    require(!covered.contains(ingesting) && !landed.contains(ingesting),
      s"generation $ingesting already exists in the chain — " +
        "re-ingesting a committed generation would duplicate it")
  }

  /** Write one generation's snapshot (keys, packed bands, meta) to
    * `stateDir + ".tmp"`, then atomically rename into place — a
    * half-written snapshot is never visible under the final name.
    * `envelope` is the ingested batch's pre-curation id range
    * ([[GenMeta]]); None (bootstrap, state rebuilds) records the
    * sentinel. */
  private def writeStateCommitted(spark: SparkSession, landed: DataFrame,
      generation: Int, stateDir: String, single: Boolean,
      envelope: Option[(Long, Long)] = None,
      fingerprint: Option[(Long, Long)] = None): Unit = {
    val fs = new Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = stateDir + ".tmp"
    fs.delete(new Path(tmp), true)
    val (keys, bands) = IncrementalDedupe.stateRows(landed,
      "doc_id", "text")
    // single = true forces one write task so a ZERO-ROW snapshot still
    // lands a schema-bearing parquet file (the task opens the file and
    // writes the footer even with no rows)
    def w(df: DataFrame, p: String): Unit =
      (if (single) df.coalesce(1) else df)
        .write.mode("overwrite").parquet(p)
    w(keys, s"$tmp/keys")
    w(bands, s"$tmp/bands")
    // this generation's metadata: one O(delta) agg over the snapshot's
    // own keys — never the chain
    val a = spark.read.parquet(s"$tmp/keys")
      .agg(count(lit(1)), min("doc_id"), max("doc_id")).head
    val (bMin, bMax) = envelope.getOrElse((0L, -1L))
    val (bCnt, bHash) = fingerprint.getOrElse((-1L, 0L))
    val gm =
      if (a.getLong(0) == 0L)
        GenMeta(generation, 0L, 0L, -1L, bMin, bMax, bCnt, bHash)
      else GenMeta(generation, a.getLong(0), a.getLong(1), a.getLong(2),
        bMin, bMax, bCnt, bHash)
    writeMeta(spark, tmp, Seq(gm))
    fs.delete(new Path(stateDir), true)
    require(fs.rename(new Path(tmp), new Path(stateDir)),
      s"rename $tmp -> $stateDir failed")
  }

  /** One pass over a pre-curation batch: id envelope + content
    * fingerprint `(min, max, count, order-insensitive bit_xor of
    * per-row xxhash64(doc_id, lang, text))`. Shared by [[ingestDelta]]
    * (which records it) and [[graft.jobs.CorpusStreamJob.ingestBatch]]
    * (which compares it for replay recognition) so both sides compute
    * the identical value. Caller guarantees a non-empty batch. */
  def envelopeFingerprint(batch: DataFrame): (Long, Long, Long, Long) = {
    val r = batch.agg(min("doc_id"), max("doc_id"), count(lit(1)),
      expr("coalesce(bit_xor(xxhash64(doc_id, lang, text)), 0L)")).head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  private def writeMeta(spark: SparkSession, stateDir: String,
      gens: Seq[GenMeta]): Unit = {
    val json = JsonMethods.compact(JsonMethods.render(
      JObject("gens" -> JArray(gens.toList.map(g => JObject(
        "gen" -> JInt(g.gen), "n_keys" -> JInt(g.nKeys),
        "min_doc_id" -> JInt(g.minDocId),
        "max_doc_id" -> JInt(g.maxDocId),
        "batch_min" -> JInt(g.batchMin),
        "batch_max" -> JInt(g.batchMax),
        "batch_count" -> JInt(g.batchCount),
        "batch_hash" -> JInt(g.batchHash)))))))
    val p = new Path(s"$stateDir/meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** The chain's generation metadata, or None if ANY snapshot predates
    * the metadata format (callers then fall back to state-scan
    * derivations — correct, just not O(1)). */
  def readChainMeta(spark: SparkSession,
      stateInDirs: Seq[String]): Option[Seq[GenMeta]] = {
    val per = stateInDirs.map { d =>
      val p = new Path(s"$d/meta.json")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val items = JsonMethods.parse(txt) \ "gens" match {
          case JArray(xs) => xs
          case other => throw new IllegalStateException(
            s"bad meta.json in $d: gens = $other")
        }
        Some(items.map { j =>
          def l(f: String): Long = (j \ f) match {
            case JInt(v) => v.toLong
            case other => throw new IllegalStateException(
              s"bad meta.json field $f in $d: $other")
          }
          // envelope fields default to the sentinel on pre-envelope
          // chains — GenMeta.hasEnvelope is then false
          def lOpt(f: String, dflt: Long): Long = (j \ f) match {
            case JInt(v) => v.toLong
            case JNothing => dflt
            case other => throw new IllegalStateException(
              s"bad meta.json field $f in $d: $other")
          }
          GenMeta(l("gen").toInt, l("n_keys"), l("min_doc_id"),
            l("max_doc_id"), lOpt("batch_min", 0L), lOpt("batch_max", -1L),
            lOpt("batch_count", -1L), lOpt("batch_hash", 0L))
        })
      }
    }
    if (per.exists(_.isEmpty)) None else Some(per.flatten.flatten)
  }

  /** Where generation `gen` stages before its commit rename: a sibling
    * of `corpusDir` (same filesystem → atomic rename; outside the
    * corpus root → never visible to a corpus read, with no reliance on
    * hidden-path filtering). */
  private def stagingDir(corpusDir: String, gen: Int): String =
    s"${corpusDir.stripSuffix("/")}.staging/gen=$gen"

  /** The commit point: rename the invisible staging dir to its final
    * `gen=N` name. Idempotent against hadoop rename-into-existing-dir
    * semantics by requiring the target absent. */
  private def commitGeneration(spark: SparkSession, corpusDir: String,
      generation: Int): Unit = {
    val fs = new Path(corpusDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val src = new Path(stagingDir(corpusDir, generation))
    val dst = new Path(s"$corpusDir/gen=$generation")
    require(!fs.exists(dst), s"$dst already exists — refusing to commit")
    require(fs.rename(src, dst), s"rename $src -> $dst failed")
  }
}
