package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Clusters, CorpusOps, TextDedupe, TextOps}

/** The complete corpus-build journey as ONE library call:
  * ingest → curate → near-dup cluster dedupe → sequence packing →
  * seeded-shuffle shard write — the end-to-end job a training-data
  * team runs nightly, composed from the same stage operators the
  * registry checks individually (`curate`, `minhashLshPairs` +
  * `connectedComponents`, `packSequences`, `writeShuffled`).
  *
  * Scan/shuffle accounting at 100 TB: the corpus is scanned once per
  * stage off a localCheckpoint (a real pipeline lands the survivor
  * table between stages exactly like this); document BODIES move only
  * through the curate dedupe window, the final pack window (both
  * partitioned — lang/fingerprint keyed), and the shard repartition
  * the write itself needs. The near-dup stage exchanges (gram, id)
  * pairs and (id, label) rounds, never text. Every stage is the
  * registry-verified operator, so the composition's correctness
  * reduces to the funnel/conservation invariants [[Report]] carries —
  * which CorpusBuildJobSpec asserts against the LANDED output, not
  * the in-memory frames.
  *
  * Reference lifecycle analog: `datapump.py`'s ingest→dedupe→sink
  * queue job (Entry 1-3), re-shaped for the pre-training corpus
  * journey (SURVEY §2.9 curation tier).
  */
object CorpusBuildJob {

  /** Audit of one run: the funnel (input ≥ curated ≥ kept), the packed
    * layout (sequences, token total), and where the shards landed. */
  case class Report(
      nInput: Long, nCurated: Long, nKept: Long,
      nSequences: Long, totalTokens: Long,
      numShards: Int, outDir: String)

  /** @param clusterById false (default) lands the seeded-shuffle shard
    *        layout ([[CorpusOps.writeShuffled]] — the training-loader
    *        artifact); true lands the corpus-of-record layout
    *        ([[CorpusOps.writeIdClustered]] — id-range files whose
    *        row groups prune point/range id fetches, which is what
    *        [[IncrementalCorpusJob]]'s per-delta verify needs). Both
    *        carry the `shuffle_key` column. */
  def run(spark: SparkSession, docsDir: String, outDir: String,
      minTokens: Int = 20, maxTokens: Int = 90,
      minQuality: Double = 0.58, dedupeThreshold: Double = 0.5,
      budgetTokens: Int = 2048, seed: Long = 7L,
      numShards: Int = 8, clusterById: Boolean = false): Report = {
    val docs = Tables.documents(spark, docsDir)
      .select("doc_id", "lang", "text")

    // stage 1: curate (quality gates + exact-dup keep-first)
    val curKeep = TextOps.curate(docs, "doc_id", "text",
        minTokens, maxTokens, minQuality)
      .filter(col("keep")).select("doc_id")
    val surv = docs.join(curKeep, "doc_id").localCheckpoint()

    // stage 2: near-dup cluster dedupe — keep each cluster's min id
    val pairs = TextDedupe.minhashLshPairs(surv, "doc_id", "text",
      threshold = dedupeThreshold)
    val keepers = Clusters.connectedComponents(
        surv.select(col("doc_id").as("id")),
        pairs.select(col("d1").as("src"), col("d2").as("dst")))
      .filter(col("id") === col("label"))
      .select(col("id").as("doc_id"))
    val kept = surv.join(keepers, "doc_id").localCheckpoint()

    // stage 3: pack into fixed-budget training sequences (per lang)
    val packed = CorpusOps.packSequences(kept, "doc_id", "lang", "text",
      budgetTokens)
    val layout = packed.join(kept.select("doc_id", "text"), "doc_id")

    // stage 4: land the requested layout
    if (clusterById)
      CorpusOps.writeIdClustered(layout, "doc_id", seed, numShards, outDir)
    else
      CorpusOps.writeShuffled(layout, "doc_id", seed, numShards, outDir)

    // audit WHAT WAS WRITTEN — the report reads the landed output back
    // so a write-path bug can't hide behind in-memory frames
    val out = spark.read.parquet(outDir)
    val a = out.agg(count(lit(1)).as("n"),
      count_distinct(col("lang"), col("bin_id")).as("nseq"),
      sum("n_tokens").as("tok")).head
    Report(
      nInput = docs.count(), nCurated = surv.count(), nKept = a.getLong(0),
      nSequences = a.getLong(1), totalTokens = a.getLong(2),
      numShards = numShards, outDir = outDir)
  }
}
