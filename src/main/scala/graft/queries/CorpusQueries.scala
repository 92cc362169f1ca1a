package graft.queries

import org.apache.spark.sql.functions._
import graft.{StableRound, Tables}
import graft.ops.{Clusters, CorpusOps, IncrementalDedupe, TextDedupe}

/** Corpus-level training-data-build queries (north-star tier): benchmark
  * decontamination, Gopher repetition filtering, temperature mixture
  * sampling, and dedup cluster assignment via connected components.
  *
  * The eval slice for decontamination is `doc_id % 5 = 0` — a
  * deterministic stand-in for a benchmark suite that provably overlaps
  * the corpus (the corpus carries real near-duplicates, so eval 13-grams
  * appear in training docs at every SF).
  */
object CorpusQueries extends QueryPack {

  def queries: Map[String, Q] = Map(
    // GPT-3-style 13-gram benchmark decontamination; eval set broadcast,
    // corpus never shuffled
    "text_decontaminate" -> ((s, d) =>
      CorpusOps.decontaminate(Tables.documents(s, d), "doc_id", "text",
        isEval = pmod(col("doc_id"), lit(5)) === 0, n = 13)),

    // Gopher table-A1 repetition rules (token-fraction form)
    "text_quality_gopher" -> ((s, d) =>
      CorpusOps.gopherRepetition(Tables.documents(s, d), "doc_id", "text")),

    // mT5-style alpha=0.5 temperature sampling over the lang mixture;
    // deterministic fingerprint membership so the exact row set is
    // oracle-reproducible
    "sample_mixture" -> ((s, d) =>
      CorpusOps.mixtureSample(Tables.documents(s, d), "doc_id", "lang")),

    // transitive closure of the MinHash-LSH near-dup pairs: every doc
    // labelled with its duplicate-cluster representative (min doc_id),
    // keep-one-per-cluster = is_keeper
    "dedupe_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = TextDedupe.minhashLshPairs(docs, "doc_id", "text",
        threshold = 0.5)
      Clusters.connectedComponents(
        docs.select(col("doc_id").as("id")),
        pairs.select(col("d1").as("src"), col("d2").as("dst")))
        .select(col("id").as("doc_id"), col("label").as("cluster_id"),
          (col("id") === col("label")).as("is_keeper"))
    }),

    // same closure via the O(log n) large-star/small-star rounds
    // (Kiveris et al. SoCC'14) — the variant for graphs whose diameter
    // cannot be argued in advance (min-label is O(diameter)); identical
    // labels by construction, checked against the SAME recursive-CTE
    // oracle as dedupe_clusters
    "dedupe_clusters_star" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = TextDedupe.minhashLshPairs(docs, "doc_id", "text",
        threshold = 0.5)
      Clusters.connectedComponentsStar(
        docs.select(col("doc_id").as("id")),
        pairs.select(col("d1").as("src"), col("d2").as("dst")))
        .select(col("id").as("doc_id"), col("label").as("cluster_id"),
          (col("id") === col("label")).as("is_keeper"))
    }),

    // SEMANTIC cluster dedup: same closure over embedding-cosine pairs —
    // near-dups the text tiers can't see (paraphrases) cluster by
    // embedding geometry; reuses dedupe_embed's pair relation
    "dedupe_embed_clusters" -> ((s, d) => {
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val pairs = graft.ops.VectorOps.pairwiseCosine(emb, "vec_id",
        "embedding", threshold = 0.45, blockCol = None)
      Clusters.connectedComponents(
        emb.select(col("vec_id").as("id")),
        pairs.select(col("id1").as("src"), col("id2").as("dst")))
        .select(col("id").as("vec_id"), col("label").as("cluster_id"),
          (col("id") === col("label")).as("is_keeper"))
    }),

    // the SCALE path of semantic dedup: same closure, but candidate
    // IVF-cell blocking IN THE REGIME WHERE IT PAYS (r16 re-scope):
    // near-dup threshold 0.9 (≈26°), quantizer scaled with the corpus
    // (nCentroids = ⌈√m⌉ — the classic IVF balance point), nAssign=3
    // multi-probe. Candidate volume is Θ(m^1.5) (measured fraction
    // 0.32 / 0.17 / 0.089 at m = 600 / 2400 / 9600 — shrinking as
    // na²/√m), vs the r14 finding that at the semantic 0.45 band NO
    // recall-1.0 blocking prunes (that band's scale tier is SemDeDup
    // above, recall<1 by contract). The testdata has no natural pairs
    // above cosine 0.65, so the corpus PLANTS near-dups the oracle
    // derives identically: every vec_id%5==0 gains a copy (id + n)
    // with coordinate 0 HALVED — a float-exact (exponent decrement)
    // perturbation both engines reproduce bit-for-bit, cos ≈ 0.998.
    // Exact-cosine verify keeps precision structural; recall measured
    // 1.0 at sf0.001/0.01/0.1 AND sf1 (this grid: nAssign=2 misses 2
    // of 1600 pairs at sf1, 3 misses none), so the exact-pair oracle
    // hash-checks the blocked result.
    "dedupe_embed_ivf" -> ((s, d) => {
      val emb0 = Tables.embeddings(s, d).select("vec_id", "embedding")
      val n = emb0.count()
      val dim = emb0.select(size(col("embedding"))).head().getInt(0)
      val planted = emb0.filter(pmod(col("vec_id"), lit(5)) === 0)
        .select((col("vec_id") + n).as("vec_id"),
          concat(
            array((element_at(col("embedding"), 1) * lit(0.5f))
              .cast("float")),
            slice(col("embedding"), 2, dim - 1)).as("embedding"))
      val emb = emb0.union(planted)
      val m = n + (n + 4) / 5
      val pairs = graft.ops.VectorOps.ivfPairwiseCosine(emb, "vec_id",
        "embedding", threshold = 0.9,
        nCentroids = graft.ops.VectorOps.superK(m.toInt), nAssign = 3)
      Clusters.connectedComponents(
        emb.select(col("vec_id").as("id")),
        pairs.select(col("id1").as("src"), col("id2").as("dst")))
        .select(col("id").as("vec_id"), col("label").as("cluster_id"),
          (col("id") === col("label")).as("is_keeper"))
    }),

    // The SUB-QUADRATIC semantic-dedup tier (SemDeDup, Abbas et al.
    // 2023): every vector is assigned to exactly ONE k-means cell and
    // pairs are scored only WITHIN a cell — vs the Θ(n²) bound the r14
    // grid proved inescapable for any recall-1.0 blocking at this 0.45
    // threshold. k SCALES WITH n (VectorOps.semdedupK: target cell
    // population ≈250, floor 8), so candidate volume is ≈ n·250/2 —
    // LINEAR in n — not the n²/k constant fraction a fixed k gives;
    // SemDedupSpec asserts the cross-size candidate GROWTH directly
    // (10× corpus ⇒ ≪100× candidates). At the in-suite SFs
    // (n=500, 2000) the derived k is the floor 8; at sf1 (n=8000) k=32.
    // Recall < 1 BY DESIGN (cross-cell near-dups are unseen; the
    // two-level argmin adds a second bounded approximation — a vector
    // whose true nearest centroid lives in another super-cell lands
    // coarser, which only re-buckets, never mis-reports: precision
    // stays structural via the exact verify). Measured under the
    // two-level recipe (pair recall / candidate fraction,
    // SemDedupSpec + PLANS §27):
    //   sf0.001 (k=8, g=3): 0.429 / 0.226   sf0.1: 0.333 / 0.190
    // iters=3, and the ASSIGNMENT itself is sub-quadratic: two-level
    // coarse-to-fine argmin (VectorOps.superK: g=⌈√k⌉ super-cells over
    // the centroids, one probed super-cell per vector — n·√k distance
    // evals per pass, Θ(n^1.5) with the derived k, vs the one-level
    // n·k = Θ(n²/250) that was round 16's weak mark), with the
    // centroid model a broadcast-joined k-row RELATION end to end (no
    // expression-tree literal, no per-round k·d driver collect). At
    // 100 TB the same rule holds (SemDeDup runs k≈10⁵ at LAION scale),
    // the cell id is a shuffle key so each cell's pairwise is
    // partition-local, and the model stays a distributed table.
    // Hash-checkable DESPITE recall<1: cells come from the exact
    // fixed-point Lloyd recipe (VectorOps.semdedupCells), and the
    // DuckDB oracle derives the SAME k from count(*) and the SAME g by
    // integer search (no float-ceil parity risk) then replays the
    // two-level rounds bit-identically and restricts the exact pair
    // relation to same-cell — the oracle agrees at every SF without
    // needing recall 1.
    "dedupe_embed_semdedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val k = graft.ops.VectorOps.semdedupK(emb.count())
      val cells = graft.ops.VectorOps.semdedupCells(emb, "vec_id",
        "embedding", k = k, iters = 3)
      val pairs = graft.ops.VectorOps.pairwiseCosine(
        emb.join(cells, "vec_id"), "vec_id", "embedding",
        threshold = 0.45, blockCol = Some("cell"))
      Clusters.connectedComponents(
        emb.select(col("vec_id").as("id")),
        pairs.select(col("id1").as("src"), col("id2").as("dst")))
        .select(col("id").as("vec_id"), col("label").as("cluster_id"),
          (col("id") === col("label")).as("is_keeper"))
    }),

    // MULTI-PROBE SemDeDup (SemDeDup-style soft assignment): each vector
    // blocks into its TWO nearest cells and a pair is a candidate when
    // ANY cell is shared — the measured recall/cost frontier (grid in
    // PLANS §31, threshold 0.45, derived k):
    //   sf1 (n=8000, k=32): nAssign=1 recall 0.19 @ cand frac 0.031,
    //   nAssign=2 0.47 @ 0.123, nAssign=3 0.71 @ 0.261
    //   sf0.1 (n=2000, k=8): 0.375 @ 0.125 / 0.80 @ 0.46 / 0.94 @ 0.82
    // Candidate volume scales ~nAssign² at fixed k but stays LINEAR in
    // n under the k-scaling rule (cells still bound the blocking), so
    // this tier buys ~2.5× the recall for ~4× the (linear) cost —
    // shipped as its own entry; the default tier stays nAssign=1.
    // Oracle: the same two-level Lloyd replay with the final (fine)
    // assignment widened to rk<=2 within the probed super-cell and the
    // pair relation DISTINCT-ed (a pair sharing both cells would match
    // twice).
    "dedupe_embed_semdedup_mp" -> ((s, d) => {
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val k = graft.ops.VectorOps.semdedupK(emb.count())
      val cells = graft.ops.VectorOps.semdedupCellsN(emb, "vec_id",
        "embedding", k = k, iters = 3, nAssign = 2)
      val pairs = graft.ops.VectorOps.pairwiseCosine(
        emb.join(cells, "vec_id"), "vec_id", "embedding",
        threshold = 0.45, blockCol = Some("cell"))
        .select("id1", "id2").distinct()
      Clusters.connectedComponents(
        emb.select(col("vec_id").as("id")),
        pairs.select(col("id1").as("src"), col("id2").as("dst")))
        .select(col("id").as("vec_id"), col("label").as("cluster_id"),
          (col("id") === col("label")).as("is_keeper"))
    }),

    // INCREMENTAL semantic dedup — the vector twin of dedupe_incremental:
    // an incoming embedding batch (vec_id%3==0) is checked against the
    // landed corpus WITHOUT rescoring corpus×corpus. Candidates come
    // from ivfCosineMatches (quantizer trained on the landed side, both
    // sides multi-assigned to cells), so per-batch cost is
    // |batch|·cell-candidates, never |batch|×|corpus|; the exact-cosine
    // verify makes precision structural and the DuckDB oracle is the
    // honest quadratic cross join.
    "dedupe_embed_incremental" -> ((s, d) => {
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val existing = emb.filter(pmod(col("vec_id"), lit(3)) =!= 0)
      val incoming = emb.filter(pmod(col("vec_id"), lit(3)) === 0)
      val hits = graft.ops.VectorOps.ivfCosineMatches(
        incoming, existing, "vec_id", "embedding", threshold = 0.45,
        nCentroids = 16, nAssign = 6)
        .select(col("qid").as("vec_id")).distinct()
        .withColumn("__dup", lit(true))
      incoming.select("vec_id").join(hits, Seq("vec_id"), "left")
        .select(col("vec_id"), col("__dup").isNull.as("is_new"))
    }),

    // exact substring-span dedup (Lee et al. 2022): a 13-token span is
    // duplicated when it also occurs in a lower-id doc (keep-first);
    // gram-keyed exchanges move (gram, id) pairs, never documents
    "dedupe_substring" -> ((s, d) =>
      CorpusOps.substringDedupe(Tables.documents(s, d), "doc_id", "text")),

    // CCNet-style LM quality signal: corpus-trained add-one bigram model,
    // per-doc mean negative log-likelihood (nats/bigram)
    "text_lm_score" -> ((s, d) =>
      CorpusOps.lmScore(Tables.documents(s, d), "doc_id", "text")),

    // DSIR importance weights (Xie et al. 2023) — score every document
    // by hashed-token-bag likelihood ratio target-vs-corpus; the
    // principled replacement for hand-tuned source mixtures (the data-
    // SELECTION face of the mixture tier: sample_mixture reweights
    // sources, this scores documents). Target = three named sources
    // (the "curated domain"); B=256 buckets over the engine-neutral
    // tokenHash60, per-bucket lns round6'd, per-doc sums exact decimal
    // (the text_lm_score discipline). One token scan builds both count
    // relations; the B-row score table broadcasts — text never shuffles.
    "sample_dsir" -> ((s, d) =>
      CorpusOps.dsirWeights(Tables.documents(s, d), "doc_id", "text",
        isTarget = col("source").isin("src1", "src2", "src3"))),

    // the allocation step of a mixture build: waterfill a 40% token
    // budget across sources (largest cap c with Σ min(n_s, c) ≤ T,
    // integer remainder to the smallest capped domains first) — the
    // closed-form integer form of DoReMi-style mixture tuning. One
    // corpus token-count agg; everything after is m-row arithmetic.
    "pipeline_token_budget" -> ((s, d) =>
      CorpusOps.tokenBudgetWaterfill(Tables.documents(s, d), "text",
        "source")),

    // EPOCH PLANNING under a token budget with a repetition cap — the
    // data-constrained-scaling question ("Scaling Data-Constrained
    // Language Models", Muennighoff et al. 2023): budget = 50% of corpus
    // tokens, shares follow α=0.5 temperature weights (√tokens, the
    // sample_mixture tilt toward low-resource domains), and no domain
    // repeats more than 4 epochs — past ~4 epochs repeated data stops
    // buying loss. Complements pipeline_token_budget (which fills a
    // budget without repetition): this one answers "how many PASSES over
    // each domain". Weights snap to DECIMAL(27,12)@6 so their sum is
    // exact; epochs is one straight-line double expression mirrored
    // verbatim in the oracle; alloc = floor(epochs·tokens) on the
    // snapped value. One grouped scan + a broadcast totals row.
    "pipeline_epoch_plan" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val stats = Tables.documents(s, d).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
        .withColumn("wgt",
          round(sqrt(col("n_tokens").cast("double"))
            .cast(DecimalType(27, 12)), 6))
        .localCheckpoint() // m-row bounded frame; totals + final both
                           // read it — the corpus is scanned ONCE
      val tot = stats.agg(sum(col("wgt")).as("denom"),
        sum(col("n_tokens")).as("total"))
      stats.crossJoin(broadcast(tot))
        .withColumn("epochs", StableRound.round6(least(
          lit(4).cast("double"),
          col("total").cast("double") * lit(0.5)
            * (col("wgt").cast("double") / col("denom").cast("double"))
            / col("n_tokens").cast("double"))))
        .select(col("lang"), col("n_docs"), col("n_tokens"), col("epochs"),
          floor(col("epochs") * col("n_tokens").cast("double"))
            .cast("long").as("alloc_tokens"))
        .orderBy("lang")
    }),

    // CURRICULUM ORDERING: quality-quartile phases (easy→hard schedule)
    // with a deterministic within-phase shuffle key — the stage between
    // curation and packing when training on a difficulty schedule.
    // phase = floor(4·rank/n) where rank = EXACT strict-below count
    // under the (quality, doc_id) total order, computed WINDOWLESSLY
    // via Prefix.belowBucketed (bucketed prefix sums — no
    // single-partition exchange, the mann-whitney discipline); the
    // shuffle key is the engine-neutral rolling fingerprint, so batch
    // order inside a phase is reproducible in any engine. One map-only
    // scan + the bounded prefix machinery; integer phase law replays
    // exactly.
    "pipeline_curriculum_order" -> ((s, d) => {
      import graft.ops.TextOps
      val base = Tables.documents(s, d).select(col("doc_id"),
          TextOps.qualityExpr(col("text")).as("quality"),
          TextOps.fingerprint(col("text")).as("shuffle_key"))
        .localCheckpoint() // bounds + totals + main prefix passes
      val n = base.agg(count(lit(1)).as("n"))
      graft.ops.Prefix.belowBucketed(base, "quality",
          tieBreak = Seq("doc_id"),
          sums = Seq((lit(1L), "rnk")), inclusive = false)
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("quality"),
          col("rnk").cast("long").as("rnk"),
          expr("(rnk * 4L) div n").as("phase"),
          col("shuffle_key"))
    }),

    // THE COMPOSED PRE-TRAINING PIPELINE — the real corpus build runs
    // curate → gopher → decontaminate → cluster-dedupe → mixture as ONE
    // job ending in a one-row report. Composition shape (and why it
    // equals sequential filtering): curate/gopher verdicts are per-doc
    // (corpus-independent), the eval-gram set is fixed by the benchmark
    // (not by filtering), so contamination is per-doc too; the near-dup
    // pair relation restricted to survivors IS the pair relation of the
    // filtered corpus; only cluster labels and mixture rates are
    // recomputed on their actual input sets. Scan/shuffle accounting:
    // the corpus is scanned once per stage; nothing shuffles document
    // bodies except the curate dedupe window and the (id,label) cluster
    // rounds (PLANS.md §15).
    "pipeline_pretrain_corpus" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val isEval = pmod(col("doc_id"), lit(5)) === 0
      val cur = graft.ops.TextOps.curate(docs, "doc_id", "text",
        minTokens = 20, maxTokens = 90, minQuality = 0.58)
        .select(col("doc_id"), col("keep").as("cur_keep"))
      val gop = CorpusOps.gopherRepetition(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep").as("gop_keep"))
      val dec = CorpusOps.decontaminate(docs, "doc_id", "text", isEval)
        .select(col("doc_id"), col("contaminated"))
      // the per-doc verdict frame feeds five downstream branches (surv,
      // the funnel aggregate, and through surv the pair/cluster/mixture
      // stages) — materialize it ONCE, as a real pipeline lands the
      // verdict table between stages, instead of re-running
      // curate+gopher+decontaminate per branch (measured 7.2 s → 4.6 s
      // at sf0.1; the remainder is the genuine stage sum — minhash pairs
      // ~1.7 s + cluster rounds ~2 s)
      val flags = docs.select(col("doc_id"), col("lang"), col("text"),
          isEval.as("is_eval"))
        .join(cur, "doc_id").join(gop, "doc_id")
        .join(dec, Seq("doc_id"), "left") // eval docs carry no dec row
        .localCheckpoint()
      val survives = !col("is_eval") && col("cur_keep") &&
        col("gop_keep") && !coalesce(col("contaminated"), lit(false))
      val surv = flags.filter(survives)
        .select(col("doc_id"), col("lang"), col("text"))
      val pairs = TextDedupe.minhashLshPairs(surv, "doc_id", "text",
        threshold = 0.5)
      val keepers = Clusters.connectedComponents(
          surv.select(col("doc_id").as("id")),
          pairs.select(col("d1").as("src"), col("d2").as("dst")))
        .filter(col("id") === col("label"))
        .select(col("id").as("doc_id"))
        .join(surv, "doc_id")
        .localCheckpoint() // feeds mixture stats, the join back, and a2
      val mixed = CorpusOps.mixtureSample(keepers, "doc_id", "lang")
        .select(col("doc_id"), col("sampled"))
        .join(keepers.select(col("doc_id"), col("text")), "doc_id")
      val a1 = flags.agg(
        count(lit(1)).as("n_input"),
        count(when(!col("is_eval"), 1)).as("n_train"),
        count(when(!col("is_eval") && col("cur_keep"), 1))
          .as("n_after_curate"),
        count(when(!col("is_eval") && col("cur_keep") && col("gop_keep"), 1))
          .as("n_after_gopher"),
        count(when(survives, 1)).as("n_after_decontam"))
      val a2 = keepers.agg(count(lit(1)).as("n_after_dedupe"))
      val a3 = mixed.agg(
        count(when(col("sampled"), 1)).as("n_sampled"),
        sum(when(col("sampled"), size(split(col("text"), " ")))
          .otherwise(0)).as("total_tokens_sampled"))
      a1.crossJoin(a2).crossJoin(a3)
    }),

    // pre-training sequence packing: per-language contiguous token
    // stream in doc_id order, each doc assigned to the fixed-budget
    // training sequence where its first token lands (concat-then-chunk,
    // the layout pretraining loaders consume) — one window shuffle
    "pipeline_pack_tokens" -> ((s, d) =>
      CorpusOps.packSequences(Tables.documents(s, d), "doc_id", "lang",
        "text", budgetTokens = 2048)),

    // training-export shuffle: deterministic seeded permutation + shard
    // assignment (map-only — the only shuffle in the real write path is
    // the shard repartition the write itself needs). Injective for
    // ids < 1e9+7, so the key column doubles as the permutation proof:
    // the oracle recomputes the scramble arithmetic in SQL.
    "pipeline_shuffle_shard" -> ((s, d) =>
      CorpusOps.shuffleShard(Tables.documents(s, d), "doc_id",
          seed = 7L, numShards = 8)
        .select("doc_id", "shuffle_key", "shard")),

    // curate → pack, end to end: the packed training layout of exactly
    // the curation survivors (curate's verdict already folds in the
    // exact-dup rule). The keep set joins back as a semi-join —
    // broadcast at this SF, co-partitioned at scale — and packing adds
    // its one running-sum window; nothing else shuffles.
    "pipeline_train_export" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val kept = graft.ops.TextOps.curate(docs, "doc_id", "text",
          minTokens = 20, maxTokens = 90, minQuality = 0.58)
        .filter(col("keep")).select("doc_id")
      CorpusOps.packSequences(docs.join(kept, "doc_id"),
        "doc_id", "lang", "text", budgetTokens = 2048)
    }),

    // deterministic fixed-size uniform sample: BOTTOM-K by the seeded
    // permutation key — the mergeable one-pass form of reservoir
    // sampling (each partition keeps its k smallest, the driver merges;
    // TakeOrderedAndProject — no shuffle of the corpus, no rand()).
    // Injectivity of the scramble (ids < 1e9+7) makes the sample
    // tie-free and identical on every engine.
    "sample_bottomk" -> ((s, d) =>
      CorpusOps.shuffleShard(Tables.documents(s, d), "doc_id",
          seed = 13L, numShards = 1)
        .select("doc_id", "shuffle_key")
        .orderBy("shuffle_key")
        .limit(100)),

    // PER-GROUP deterministic fixed-size sample: bottom-20 of the seeded
    // permutation key within each language — the stratified twin of
    // sample_bottomk (same LCG, different seed). Spark's WindowGroupLimit
    // rule turns the rank-filter into a per-partition top-k BEFORE the
    // exchange, so at 100 TB each map task forwards ≤ k rows per group —
    // the shuffle moves O(groups·k), never the corpus.
    "sample_bottomk_grouped" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang").orderBy("shuffle_key")
      CorpusOps.shuffleShard(Tables.documents(s, d), "doc_id",
          seed = 17L, numShards = 1)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 20)
        .select(col("lang"), col("doc_id"), col("shuffle_key"), col("rk"))
    }),

    // WEIGHT-BIASED deterministic sample: rank by scrambled-uniform /
    // weight and keep the bottom-k, so heavier documents (n_chars) are
    // proportionally more likely to survive — the sampling shape used
    // to bias a training mix toward long documents without a full sort
    // of the corpus (TakeOrderedAndProject: per-partition top-k, driver
    // merge of k·partitions rows). The key is one IEEE division of two
    // exactly-representable integers, so the ranking — and therefore
    // the sample — is identical on every engine; ties (equal ratios)
    // break on doc_id.
    "sample_weighted" -> ((s, d) =>
      CorpusOps.shuffleShard(Tables.documents(s, d), "doc_id",
          seed = 29L, numShards = 1)
        .select(col("doc_id"), col("n_chars"),
          (col("shuffle_key").cast("double") / col("n_chars"))
            .as("__wkey"))
        .orderBy(col("__wkey"), col("doc_id"))
        .limit(100)
        .select(col("doc_id"), col("n_chars"),
          graft.StableRound.round6(col("__wkey")).as("wkey"))),

    // deterministic NEGATIVE SAMPLING for contrastive training — every
    // anchor doc gets k=4 pseudo-random negatives from a seeded affine
    // map over the dense id space ((a·id + b·j + c) mod n, self remapped
    // to the next id). Deterministic-by-construction: the "random" pick
    // is pure integer arithmetic, so the exact pair set is reproducible
    // on any engine and across reruns — the property a training-data
    // pipeline needs for resumable epoch builds. Scale shape: the only
    // corpus-sized operation is the id-keyed join fetching negative
    // metadata (co-partitioned shuffle join); n arrives by broadcast.
    // Dense 0..n-1 ids are assumed (the standard zipWithIndex prep);
    // a·n must stay under int64 — holds to ~3.5e9 docs, document past
    // that (DECIMAL or Russian-peasant modmul).
    "sample_negatives" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "lang")
      val cnt = docs.agg(count(lit(1)).as("n"))
      val anchors = docs.select("doc_id").crossJoin(broadcast(cnt))
        .select(col("doc_id"), col("n"),
          explode(sequence(lit(1), lit(4))).as("j"))
      val raw = (col("doc_id") * 2654435761L + col("j") * 40503L
        + 12345L) % col("n")
      anchors.select(col("doc_id"), col("j").cast("long").as("j"),
          when(raw === col("doc_id"), (raw + 1) % col("n"))
            .otherwise(raw).as("neg_id"))
        .join(docs.select(col("doc_id").as("neg_id"),
          col("lang").as("neg_lang")), "neg_id")
        .select(col("doc_id"), col("j"), col("neg_id"), col("neg_lang"))
    }),

    // the BLOOM tier of incremental dedup — the documented scale path
    // of dedupe_incremental made code: the landed corpus's key table is
    // folded into a ~9-bits/key bloom filter (1% fpp; mergeable
    // distributed aggregate, broadcast once), incoming rows probe it
    // map-side, and ONLY probe-positives reach the exact verification
    // join. No false negatives ⇒ negatives are definitively new, and
    // the exact semi-join confirms the positives — so the output is
    // IDENTICAL to the exact tier (same oracle), while the join input
    // shrinks from |incoming| to |dupes| + 1%·|fresh|. At 100 TB the
    // filter is ~1 GB per billion landed keys (executor-resident) vs a
    // key table that must shuffle or broadcast whole.
    "dedupe_incremental_bloom" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
      // injective (len, fp) combine: fp < 1e9+7 < the 1e9+9 multiplier
      val key = (length(norm).cast("long") * lit(1000000009L) +
        graft.ops.TextOps.fingerprint(norm))
      val existing = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
        .select(key.as("k"))
      // Size the bloom from scan STATISTICS, not a count() pass — the
      // count would re-run the normalize+fingerprint projection over all
      // of history just to pick a capacity, doubling the history cost.
      // File bytes / 64 over-estimates rows for document-sized records
      // (over-sizing only widens the filter; fpp degrades gracefully if
      // ever under-sized), so the filter build stays a single pass.
      val estRows = docs.queryExecution.optimizedPlan.stats.rowCount
        .map(_.toLong)
        .getOrElse(docs.queryExecution.optimizedPlan.stats
          .sizeInBytes.toLong / 64L)
      val bf = existing.stat.bloomFilter("k",
        expectedNumItems = math.max(estRows, 1000L), fpp = 0.01)
      val bfBc = s.sparkContext.broadcast(bf)
      // scalar UDF probe: no public built-in probes a broadcast
      // BloomFilter (might_contain wants a binary-literal aggregate), so
      // this one filter is codegen-opaque — acceptable off the hot path
      val might = udf((k: Long) => bfBc.value.mightContainLong(k))
      val incoming = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select(col("doc_id"), key.as("k"))
      val dupIds = incoming.filter(might(col("k")))
        .join(existing.distinct(), Seq("k"), "left_semi")
        .select(col("doc_id"), lit(true).as("__dup"))
      incoming.select("doc_id").join(dupIds, Seq("doc_id"), "left")
        .select(col("doc_id"), col("__dup").isNull.as("is_new"))
    }),

    // INCREMENTAL dedup — the steady-state ingestion shape: an incoming
    // batch is checked against the ALREADY-LANDED corpus without
    // re-deduping history. The existing side is reduced to 16-byte
    // (length, fingerprint) keys of the normalized text (never document
    // bodies — the dedupe_exact_norm tradeoff); at 100 TB that key table
    // is bloom-filterable/broadcastable while the corpus itself is never
    // rescanned beyond the key projection. Split: incoming = doc_id%3=0.
    "dedupe_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
      val existing = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
        .select(length(norm).as("n_len"),
          graft.ops.TextOps.fingerprint(norm).as("n_fp")).distinct()
      docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select(col("doc_id"), length(norm).as("n_len"),
          graft.ops.TextOps.fingerprint(norm).as("n_fp"))
        .join(existing.withColumn("hit", lit(1)),
          Seq("n_len", "n_fp"), "left")
        .select(col("doc_id"), col("hit").isNull.as("is_new"))
    }),

    // duplicate-cluster CANONICALIZATION — the rewrite pass after
    // clustering: each near-dup cluster elects ONE canonical document
    // (longest text, ties broken by min doc_id) that the corpus keeps,
    // and the per-cluster summary drives the rewrite join. The election
    // is a partial-aggregatable max over struct((n_chars, -doc_id)) —
    // no window, no per-cluster sort; clusters come from the same
    // MinHash-LSH closure as dedupe_clusters, so the oracle reuses that
    // recursive CTE with a row_number pick.
    "dedupe_canonicalize" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = TextDedupe.minhashLshPairs(docs, "doc_id", "text",
        threshold = 0.5)
      Clusters.connectedComponents(
          docs.select(col("doc_id").as("id")),
          pairs.select(col("d1").as("src"), col("d2").as("dst")))
        .join(docs.select(col("doc_id").as("id"), col("n_chars")), "id")
        .groupBy(col("label").as("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          max(struct(col("n_chars"), (-col("id")).as("negid"))).as("pick"))
        .select(col("cluster_id"), col("n_members"),
          (-col("pick.negid")).as("canonical_id"),
          col("pick.n_chars").as("canonical_chars"))
    }),

    // deterministic train/val/test split: the 80/10/10 hash split every
    // dataset build needs — membership from the engine-neutral
    // samplingHash (not rand()), so the split is reproducible across
    // reruns, engines, and cluster sizes, and a doc NEVER migrates
    // between splits when the corpus grows. Map-only: no shuffle at all.
    "sample_split_hash" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("h", CorpusOps.samplingHash(col("doc_id")))
        .select(col("doc_id"), col("lang"), expr("h div 10000").as("bucket"))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val").otherwise("test"))),

    // SPLIT-LEAKAGE AUDIT: near-duplicate pairs that CROSS the
    // train/eval boundary of the sample_split_hash law — the test-set
    // contamination check every LLM data release runs (Lee et al. 2022
    // found C4's validation split leaking against train; n-gram overlap
    // is text_decontaminate, this is its NEAR-DUP face). One row per
    // eval (val/test) doc: how many train near-dups touch it, the worst
    // jaccard, and the leaked flag a release gate keys on. Scale shape:
    // the pair relation is the banded MinHash-LSH tier (ids only, never
    // all-pairs); the split law is a per-row hash — the audit adds two
    // id⋈split joins and a grouped count on top of machinery that
    // already scales.
    "pipeline_split_leakage" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sp = docs
        .withColumn("h", CorpusOps.samplingHash(col("doc_id")))
        .withColumn("bucket", expr("h div 10000"))
        .select(col("doc_id"),
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val").otherwise("test").as("split"))
      val pairs = TextDedupe.minhashLshPairs(docs, "doc_id", "text",
        threshold = 0.5)
      val crossing = pairs
        .join(sp.select(col("doc_id").as("d1"), col("split").as("sp1")),
          "d1")
        .join(sp.select(col("doc_id").as("d2"), col("split").as("sp2")),
          "d2")
        .filter((col("sp1") === "train") =!= (col("sp2") === "train"))
        .select(when(col("sp1") === "train", col("d2")).otherwise(col("d1"))
          .as("doc_id"), col("jaccard"))
      val leak = crossing.groupBy("doc_id")
        .agg(count(lit(1)).as("n_train_dups"),
          max(col("jaccard")).as("max_jaccard"))
      sp.filter(col("split") =!= "train")
        .join(leak, Seq("doc_id"), "left")
        .select(col("doc_id"), col("split"),
          coalesce(col("n_train_dups"), lit(0L)).as("n_train_dups"),
          coalesce(col("max_jaccard"), lit(0.0)).as("max_jaccard"),
          (coalesce(col("n_train_dups"), lit(0L)) > 0).as("leaked"))
        .orderBy("doc_id")
    }),

    // one-glance DATASET CARD per language: doc/char/token totals,
    // exact-duplicate rate, and corpus share — the release-report
    // rollup a training-data build publishes. Two aggregation passes
    // (per-lang tallies incl. distinct (len, fingerprint) keys — bodies
    // never shuffle — and a broadcast one-row total); every ratio is
    // two exact ints through one round6'd division.
    "pipeline_dataset_card" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val perLang = docs
        .select(col("lang"), col("doc_id"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          length(col("text")).as("t_len"), xxhash64(col("text")).as("t_fp"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("t_len"), col("t_fp")).as("n_distinct"),
          sum("n_tokens").as("n_tokens"), sum("n_chars").as("n_chars"))
      val total = perLang.agg(sum("n_docs").as("n_total"))
      perLang.crossJoin(broadcast(total))
        .select(col("lang"), col("n_docs"), col("n_distinct"),
          col("n_tokens"), col("n_chars"),
          StableRound.round6(lit(1.0) -
            col("n_distinct").cast("double") / col("n_docs")).as("dup_rate"),
          StableRound.round6(
            col("n_docs").cast("double") / col("n_total")).as("corpus_share"))
        .orderBy("lang")
    }),

    // TOKENIZER FIT, step one of BPE training — the adjacent-pair
    // frequency count whose argmax is the first merge rule. This is the
    // kernel a distributed tokenizer trainer runs per merge round; one
    // round is the honest distributed unit (later rounds re-tokenize
    // with the learned merges — an orchestration loop over the same
    // kernel, not a different plan). The pair stream comes from the
    // codegen'd occurrence-order shingle kernel (NOT the distinct form
    // — BPE counts occurrences), map-side combined into the pair-vocab
    // relation; the top-20 merge table is a distributed TakeOrdered
    // under the (count desc, pair) total order, never a vocab-wide
    // window. Output carries the corpus totals a trainer logs per
    // round.
    "pipeline_tokenizer_fit" -> ((s, d) => {
      val pairs = Tables.documents(s, d)
        .select(explode(graft.functions.ShingleArray
          .shingleOccurrences(col("text"), 2)).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val tot = pairs.agg(sum("cnt").as("n_pairs"),
        count(lit(1)).as("n_distinct_pairs"))
      pairs.orderBy(col("cnt").desc, col("pair")).limit(20)
        .crossJoin(broadcast(tot))
        .select(col("pair"), col("cnt"), col("n_pairs"),
          col("n_distinct_pairs"))
    }),

    // CLASS-BALANCED DOWNSAMPLE — every class thinned toward the
    // minority class count, the label-balancing step before training a
    // classifier on skewed data. Deterministic proportional thinning:
    // class t keeps rows with samplingHash(id) < ppm(t) where
    // ppm = ⌊n_min·10⁶/n_t⌋ — the engine-neutral LCG, so membership is
    // bit-reproducible and a row never flips when the corpus grows
    // under the same counts. MAP-ONLY on the corpus (class counts are a
    // tiny broadcast aggregate; no per-class rank window — a
    // partition-per-class window would put the whole majority class in
    // one task at scale); kept counts are binomially tight around n_min
    // (exact-n variant = count-below-threshold + boundary fix-up by id,
    // same hash). Output is the per-class audit row: original count,
    // kept count, and an exact id checksum pinning MEMBERSHIP, not just
    // cardinality, across engines.
    "sample_balanced_classes" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("event_type"))
      val cnts = ev.groupBy("event_type").agg(count(lit(1)).as("n_t"))
      val nmin = cnts.agg(min("n_t").as("n_min"))
      val rated = cnts.crossJoin(broadcast(nmin))
        .select(col("event_type"), col("n_t"),
          expr("n_min * 1000000 div n_t").as("ppm"))
      ev.join(broadcast(rated), "event_type")
        .filter(CorpusOps.samplingHash(col("event_id")) < col("ppm"))
        .groupBy("event_type")
        .agg(max("n_t").as("n_orig"), count(lit(1)).as("n_kept"),
          // BIGINT, not DECIMAL(38,0): sums of sequential event_ids fit
          // int64 far past sf1 (sf1 total-corpus sum ≈ 5e12), and a
          // decimal final is the one dtype the driver's stringifying
          // hash renders differently across engines (r9 b341ffe, r12).
          sum(col("event_id").cast("long")).as("id_checksum"))
    }),

    // N-ROUND BPE TRAINER — pipeline_tokenizer_fit made real: apply the
    // argmax merge, re-count, repeat for 8 rounds, emitting the learned
    // merge table plus per-round corpus statistics. Published algorithm
    // (Sennrich et al. 2016): BPE trains over the WORD-FREQUENCY
    // vocabulary, not the raw corpus — ONE corpus scan builds
    // (word, count), then every merge round is vocab-sized work
    // (distinct words ≈ millions at 100 TB; trivially distributed, no
    // further corpus scans). Each word is a space-joined char sequence
    // + '</w>'; pair counts weight by word frequency; argmax under the
    // (count desc, a, b) total order is a 1-row broadcast (never a
    // collect — the loop is 8 rounds of lazy plan building with a
    // localCheckpoint per round to bound plan depth). The merge applies
    // as an engine-neutral greedy left-to-right fold (string-typed
    // accumulator; a merge appends the right symbol without a
    // separator), identical in Spark `aggregate` and DuckDB
    // `list_reduce`, so the oracle replays the ENTIRE training
    // trajectory as CTE stages (the vec_kmeans_lloyd pattern) and the
    // per-round token total pins the invariant n_tokens' = n_tokens −
    // cnt(merge) across engines.
    "pipeline_tokenizer_train" -> ((s, d) =>
      bpeTrain(s, d, 8)._2.reduce(_.unionAll(_)).orderBy("round")),

    // TOKENIZER APPLY — the train→apply journey closed: tokenize the
    // corpus with the 8 learned merges and report per-language
    // compression. The trained vocabulary (word → merged symbol
    // sequence) IS the training loop's final state, so apply is a
    // corpus-scale JOIN on the word key (broadcast here; hash join
    // co-partitioned on the word at 100 TB — exactly how a production
    // tokenizer service shards) plus one map-side length sum — the
    // corpus is scanned once and no text ever shuffles. Output: docs /
    // words / BPE tokens / char-level tokens per language and the
    // compression ratio the tokenizer report quotes.
    "pipeline_tokenizer_apply" -> ((s, d) => {
      // trained vocabulary comes from a source-keyed fixture (the IVF-
      // layout precedent): a tokenizer is trained once and applied many
      // times — benching apply must measure the corpus join, not
      // re-training. Fixture invalidates on corpus regeneration.
      val vocab = bpeVocabFixture(s, d)
        .select(col("w"),
          size(split(col("seq"), " ")).as("n_bpe"),
          (length(col("w")) + 1).as("n_char"))
      val docs = Tables.documents(s, d)
      val perLang = docs.select(col("lang"),
          explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .join(broadcast(vocab), "w")
        .groupBy("lang").agg(count(lit(1)).as("n_words"),
          sum("n_bpe").as("n_tokens_bpe"),
          sum(col("n_char").cast("long")).as("n_tokens_char"))
      docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
        .join(perLang, "lang")
        .select(col("lang"), col("n_docs"), col("n_words"),
          col("n_tokens_bpe"), col("n_tokens_char"),
          StableRound.round6(col("n_tokens_char").cast("double")
            / col("n_tokens_bpe").cast("double")).as("compression"))
    }),

    // TRAINED QUALITY/DOMAIN CLASSIFIER — the third train→apply journey
    // (tokenizer, corpus lifecycle, now the model-based filter every
    // production corpus build runs: CCNet's wiki-vs-crawl fasttext,
    // DataComp's quality model — here the exact-math multinomial NB
    // relative so the DuckDB oracle replays train AND apply
    // bit-for-bit). Trains per-class word log-odds on the seeded
    // doc_id%3!=0 split with `lang` as the 5-class label, scores EVERY
    // document, argmaxes under the (score DESC, class ASC) total
    // order. Per-term round-6 ln summed as exact DECIMAL (the
    // text_lm_score discipline); vocab×classes log-prob relation
    // broadcasts, so the scoring pass never shuffles text — see the
    // CorpusOps.nbClassify scaladoc for the full scale shape.
    "pipeline_classifier_nb" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.CorpusOps.nbClassify(docs, "doc_id", "text", "lang",
        isTrain = pmod(col("doc_id"), lit(3)) =!= 0)
    }),

    // INCREMENTAL near-dup dedupe — the landed-corpus-wins refinement of
    // dedupe_clusters, and the stage IncrementalCorpusJob runs per delta
    // batch: the base corpus (doc_id%3!=0) is cluster-deduped to its
    // canonicals, the delta (doc_id%3==0) is verdicted against the
    // canonical BAND INDEX only (no base×base re-pairing), with
    // contamination transitive through within-delta components. The
    // oracle replays both closures as recursive CTEs over the exact
    // Jaccard pair relation, split by side.
    "dedupe_incremental_neardup" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val delta = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      // landed base state comes from a bootstrap-once fixture (the
      // bpeVocabFixture precedent): a real pipeline pays the base
      // pairing ONCE at bootstrap and every delta batch after that
      // probes the persisted index — so the benched cost is the
      // per-delta cost, which is the operational number.
      val (landed, stateBands) = incStateFixture(s, d)
      IncrementalDedupe.neardupVerdicts(delta, "doc_id", "text",
        stateBands, landed, threshold = 0.5)
    }),
  )

  /** Landed incremental-dedupe base state (canonical docs + their LSH
    * band index), bootstrapped once per corpus under a source-keyed
    * fixture dir: base = doc_id%3!=0 cluster-deduped to its keepers —
    * the IncrementalCorpusJob bootstrap, scenario-sized. Auto-
    * invalidated when the driver regenerates the corpus (Fixtures.key
    * folds uri+len+mtime). */
  private def incStateFixture(s: org.apache.spark.sql.SparkSession,
      d: String): (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) = {
    val dir = s"${Fixtures.root}/graft_incstate/${Fixtures.key(s, s"$d/documents.parquet")}"
    if (!Fixtures.exists(s, s"$dir/landed")) {
      val base = Tables.documents(s, d).select("doc_id", "text")
        .filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val basePairs = TextDedupe.minhashLshPairs(base, "doc_id", "text",
        threshold = 0.5)
      val keepers = Clusters.connectedComponents(
          base.select(col("doc_id").as("id")),
          basePairs.select(col("d1").as("src"), col("d2").as("dst")))
        .filter(col("id") === col("label"))
        .select(col("id").as("doc_id"))
      val landed = base.join(keepers, "doc_id")
      landed.write.mode("overwrite").parquet(s"$dir/landed")
      TextDedupe.bandRows(landed, "doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/bands")
    }
    (s.read.parquet(s"$dir/landed"), s.read.parquet(s"$dir/bands"))
  }

  /** The trained 8-merge vocabulary, landed once per corpus under a
    * source-keyed fixture dir and read back on subsequent calls. */
  private def bpeVocabFixture(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val dir = s"${Fixtures.root}/graft_bpe_vocab/${Fixtures.key(s, s"$d/documents.parquet")}"
    if (!Fixtures.exists(s, dir))
      bpeTrain(s, d, 8)._1.write.mode("overwrite").parquet(dir)
    s.read.parquet(dir)
  }

  /** Shared 8-round BPE trainer (Sennrich-style, over the word-
    * frequency vocabulary — see `pipeline_tokenizer_train`'s entry
    * comment for the scale argument). Returns (final vocabulary
    * `(w, wc, seq)` with all `rounds` merges applied, one audit row
    * per round). */
  private def bpeTrain(s: org.apache.spark.sql.SparkSession, d: String,
      rounds: Int): (org.apache.spark.sql.DataFrame,
        Seq[org.apache.spark.sql.DataFrame]) = {
    val words = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .localCheckpoint()
    var cur = words.select(col("w"), col("wc"),
      concat(array_join(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))), " "), lit(" </w>")).as("seq"))
      .localCheckpoint()
    val roundRows = (1 to rounds).map { r =>
      val toks = cur.select(col("w"), col("wc"),
        split(col("seq"), " ").as("ts"))
      val pc = toks.select(col("wc"), explode(
          when(size(col("ts")) >= 2,
            transform(sequence(lit(1), size(col("ts")) - 1),
              i => struct(element_at(col("ts"), i).as("a"),
                element_at(col("ts"), i + 1).as("b"))))
            .otherwise(array())).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("wc").as("cnt"))
        .localCheckpoint()
      val stats = pc.agg(sum("cnt").as("n_pairs"),
        count(lit(1)).as("n_distinct_pairs"))
      val m = pc.orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
      cur = cur.crossJoin(broadcast(m.select(
          col("a").as("__ma"), col("b").as("__mb"))))
        .select(col("w"), col("wc"),
          aggregate(slice(split(col("seq"), " "), lit(2), size(split(
              col("seq"), " ")) - 1),
            element_at(split(col("seq"), " "), 1),
            (acc, x) => when(x === col("__mb") && (acc === col("__ma")
                || endswith(acc, concat(lit(" "), col("__ma")))),
              concat(acc, x)).otherwise(concat(acc, lit(" "), x)))
            .as("seq"))
        .localCheckpoint()
      val nTok = cur.agg(
        sum(col("wc") * size(split(col("seq"), " "))).as("n_tokens"))
      m.select(lit(r).as("round"), col("a").as("pair_a"),
          col("b").as("pair_b"), col("cnt"))
        .crossJoin(broadcast(stats)).crossJoin(broadcast(nTok))
    }
    (cur, roundRows)
  }

  /** DuckDB replay of the [[bpeTrain]] trajectory: the same merge
    * rounds as chained CTE stages — v{r} applies round r's argmax
    * merge via `list_reduce` with the identical greedy fold. Returns
    * the `WITH ...` prefix ending at v{rounds}/t{rounds}, shared by
    * the train and apply oracles. */
  private def bpeCtes(rounds: Int): String = {
    val head =
      """WITH w AS (SELECT w, count(*) AS wc FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY 1),
        |v0 AS (SELECT w, wc, array_to_string(
        |    list_transform(range(1, len(w) + 1),
        |      i -> substr(w, CAST(i AS INTEGER), 1)), ' ')
        |    || ' </w>' AS seq FROM w)""".stripMargin
    val body = (1 to rounds).map { r =>
      s"""pc$r AS (SELECT a, b, CAST(sum(wc) AS BIGINT) AS cnt FROM (
         |  SELECT ts[i] AS a, ts[i+1] AS b, wc FROM (
         |      SELECT wc, string_split(seq, ' ') AS ts FROM v${r - 1}) t,
         |    unnest(range(1, len(ts))) AS u(i)) GROUP BY 1, 2),
         |s$r AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_pairs,
         |  count(*) AS n_distinct_pairs FROM pc$r),
         |m$r AS (SELECT a, b, cnt FROM pc$r
         |  ORDER BY cnt DESC, a, b LIMIT 1),
         |v$r AS (SELECT w, wc, list_reduce(string_split(seq, ' '),
         |    (acc, x) -> CASE WHEN x = m.b
         |        AND (acc = m.a OR ends_with(acc, ' ' || m.a))
         |      THEN acc || x ELSE acc || ' ' || x END) AS seq
         |  FROM v${r - 1}, m$r m),
         |t$r AS (SELECT CAST(sum(wc * len(string_split(seq, ' ')))
         |  AS BIGINT) AS n_tokens FROM v$r)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"$head$body"
  }

  private def tokenizerTrainSql: String = {
    val outs = (1 to 8).map { r =>
      s"""SELECT CAST($r AS INTEGER) AS round, m.a AS pair_a,
         |  m.b AS pair_b, m.cnt, s.n_pairs, s.n_distinct_pairs,
         |  t.n_tokens FROM m$r m, s$r s, t$r t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"${bpeCtes(8)}\n$outs\nORDER BY round"
  }

  /** Apply oracle: v8 is the trained vocabulary; per-lang token sums
    * come from the corpus word stream joined on the word key. */
  // NOTE: bpeCtes' text is concatenated OUTSIDE the stripMargin'd
  // literal — interpolating it inside would let the outer stripMargin
  // eat the first '|' of its '||' concatenations
  private def tokenizerApplySql: String = bpeCtes(8) + ",\n" +
    s"""vb AS (SELECT w, len(string_split(seq, ' ')) AS n_bpe,
       |    len(w) + 1 AS n_char FROM v8),
       |tw AS (SELECT lang, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |pl AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
       |    CAST(sum(n_bpe) AS BIGINT) AS n_tokens_bpe,
       |    CAST(sum(n_char) AS BIGINT) AS n_tokens_char
       |  FROM tw JOIN vb USING (w) WHERE w <> '' GROUP BY 1),
       |dd AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM documents GROUP BY 1)
       |SELECT lang, n_docs, n_words, n_tokens_bpe, n_tokens_char,
       |  ${graft.StableRound.sql6("CAST(n_tokens_char AS DOUBLE) " +
            "/ CAST(n_tokens_bpe AS DOUBLE)")} AS compression
       |FROM dd JOIN pl USING (lang)""".stripMargin

  /** dedupe_embed_ivf oracle: derive the SAME planted-near-dup corpus
    * the entry builds (every vec_id%5==0 copied under id+n with
    * coordinate 0 halved — float-exact in both engines), then the
    * exact cosine-0.9 pair relation + recursive closure. The blocked
    * Spark result hash-matches because recall is measured 1.0 (grid in
    * the entry comment / PLANS) — precision is the exact verify's. */
  private def ivfPlantedSql: String =
    """WITH RECURSIVE
      |nn AS (SELECT count(*) AS n FROM embeddings),
      |corp AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + (SELECT n FROM nn) AS vec_id,
      |    [CAST(embedding[1] * 0.5 AS FLOAT)] || embedding[2:]
      |      AS embedding
      |  FROM embeddings WHERE vec_id % 5 = 0),
      |cv AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM corp),
      |cn AS (SELECT vec_id, e,
      |    sqrt(list_dot_product(e, e)) AS nrm FROM cv),
      |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2
      |      FROM cn a JOIN cn b ON a.vec_id < b.vec_id
      |      WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.9),
      |e AS (SELECT id1 AS src, id2 AS dst FROM p
      |      UNION ALL SELECT id2, id1 FROM p),
      |r AS (
      |  SELECT vec_id AS v, vec_id AS l FROM corp
      |  UNION
      |  SELECT e.dst AS v, r.l AS l FROM r JOIN e ON e.src = r.v
      |)
      |SELECT v AS vec_id, min(l) AS cluster_id,
      |  (v = min(l)) AS is_keeper
      |FROM r GROUP BY v""".stripMargin

  /** Exact embedding-cosine connected components — the Θ(n²) ORACLE
    * tier dedupe_embed_clusters (the anchor the blocked tiers verify
    * against at test scale; at corpus scale use the SemDeDup or IVF
    * entries above). */
  private def embedClustersSql: String =
    s"""WITH RECURSIVE
       |p AS (SELECT id1, id2 FROM (
       |${VectorQueries.vCte}
       |SELECT a.vec_id AS id1, b.vec_id AS id2
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.45
       |)),
       |e AS (SELECT id1 AS src, id2 AS dst FROM p
       |      UNION ALL SELECT id2, id1 FROM p),
       |r AS (
       |  SELECT vec_id AS v, vec_id AS l FROM embeddings
       |  UNION
       |  SELECT e.dst AS v, r.l AS l FROM r JOIN e ON e.src = r.v
       |)
       |SELECT v AS vec_id, min(l) AS cluster_id,
       |  (v = min(l)) AS is_keeper
       |FROM r GROUP BY v""".stripMargin

  /** SemDeDup-tier oracle: derive the SAME corpus-size-scaled k the
    * Spark entry derives (integer-ceil `GREATEST(8, (count(*)+249)
    * // 250)` ≡ VectorOps.semdedupK) and the SAME super-cell count g
    * (smallest integer with g² ≥ k, by integer search over a
    * row_number stream ≡ VectorOps.superK — no float-sqrt parity
    * risk), replay the exact fixed-point TWO-LEVEL Lloyd rounds
    * (per round: coarse argmin of every vector AND every centroid
    * against the g super-centroids, then fine argmin within the
    * probed super-cell only — bit-identical to
    * VectorOps.semdedupCells by construction), then the exact-cosine
    * pair relation RESTRICTED to same final cell, then the same
    * recursive-CTE closure as embedClustersSql. This is how a recall<1
    * blocking scheme stays hash-checkable: the oracle doesn't need
    * recall 1, it needs the same cells.
    *
    * `nAssign` > 1 replays the MULTI-PROBE tier: the final FINE
    * assignment keeps each vector's nAssign nearest cells within its
    * probed super-cell (row_number over (dist, cid) — the same total
    * order semdedupAssignFrozen's sorted-struct slice uses), a pair is
    * a candidate when ANY cell is shared, and the pair relation is
    * DISTINCT-ed because a pair sharing both its cells would otherwise
    * match twice. */
  private[queries] def semdedupClustersSql: String = semdedupSql(1)

  private[queries] def semdedupSql(nAssign: Int): String = {
    val lloydPre =
      """lk AS (SELECT GREATEST(8, (count(*) + 249) // 250) AS k
        |  FROM embeddings),
        |lg AS (SELECT min(i) AS g FROM (
        |    SELECT row_number() OVER (ORDER BY vec_id) AS i
        |    FROM embeddings) t
        |  WHERE i * i >= (SELECT k FROM lk)),
        |lq AS (SELECT vec_id, list_transform(embedding,
        |    e -> CAST(floor(CAST(e AS DOUBLE) * 10000 + 0.5) AS BIGINT))
        |    AS x FROM embeddings),
        |lvx AS (SELECT vec_id, generate_subscripts(x, 1) AS pos,
        |    unnest(x) AS q FROM lq),
        |lc0 AS (SELECT vec_id AS cid, pos, q AS cq FROM lvx
        |  WHERE vec_id < (SELECT k FROM lk))""".stripMargin
    val rounds = (1 to 3).map { i =>
      s""",
         |lgd$i AS (SELECT lvx.vec_id, s.cid AS sid,
         |    sum((lvx.q - s.cq) * (lvx.q - s.cq)) AS dist
         |  FROM lvx JOIN lc${i - 1} s USING (pos)
         |  WHERE s.cid < (SELECT g FROM lg) GROUP BY 1, 2),
         |lga$i AS (SELECT vec_id, sid FROM (
         |    SELECT vec_id, sid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY dist, sid) AS rk FROM lgd$i) WHERE rk = 1),
         |lcd$i AS (SELECT c.cid, s.cid AS sid,
         |    sum((c.cq - s.cq) * (c.cq - s.cq)) AS dist
         |  FROM lc${i - 1} c JOIN lc${i - 1} s USING (pos)
         |  WHERE s.cid < (SELECT g FROM lg) GROUP BY 1, 2),
         |lcg$i AS (SELECT cid, sid FROM (
         |    SELECT cid, sid, row_number() OVER (PARTITION BY cid
         |      ORDER BY dist, sid) AS rk FROM lcd$i) WHERE rk = 1),
         |ld$i AS (SELECT lvx.vec_id, cg.cid,
         |    sum((lvx.q - c.cq) * (lvx.q - c.cq)) AS dist
         |  FROM lvx
         |  JOIN lga$i a USING (vec_id)
         |  JOIN lcg$i cg ON cg.sid = a.sid
         |  JOIN lc${i - 1} c ON c.cid = cg.cid AND c.pos = lvx.pos
         |  GROUP BY 1, 2),
         |la$i AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY dist, cid) AS rk FROM ld$i) WHERE rk = 1),
         |lu$i AS (SELECT a.cid, lvx.pos, sum(lvx.q) AS sq, count(*) AS n
         |  FROM lvx JOIN la$i a USING (vec_id) GROUP BY 1, 2),
         |lc$i AS (SELECT pc.cid, pc.pos,
         |    CASE WHEN u.n IS NULL THEN pc.cq
         |      ELSE (CAST(u.sq AS BIGINT)
         |        - ((CAST(u.sq AS BIGINT) % u.n) + u.n) % u.n) // u.n
         |    END AS cq
         |  FROM lc${i - 1} pc LEFT JOIN lu$i u
         |    ON u.cid = pc.cid AND u.pos = pc.pos)""".stripMargin
    }.mkString
    val (assignCte, distinctKw) =
      if (nAssign == 1) ("la3", "")
      else (s""",
         |lam AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY dist, cid) AS rk FROM ld3) WHERE rk <= $nAssign)"""
        .stripMargin, "DISTINCT ")
    val finalAssign = if (nAssign == 1) "la3" else "lam"
    s"""WITH RECURSIVE
       |p AS (SELECT ${distinctKw}id1, id2 FROM (
       |${VectorQueries.vCte},
       |$lloydPre$rounds${if (nAssign == 1) "" else assignCte}
       |SELECT a.vec_id AS id1, b.vec_id AS id2
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |JOIN $finalAssign ca ON ca.vec_id = a.vec_id
       |JOIN $finalAssign cb ON cb.vec_id = b.vec_id AND cb.cid = ca.cid
       |WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.45
       |)),
       |e AS (SELECT id1 AS src, id2 AS dst FROM p
       |      UNION ALL SELECT id2, id1 FROM p),
       |r AS (
       |  SELECT vec_id AS v, vec_id AS l FROM embeddings
       |  UNION
       |  SELECT e.dst AS v, r.l AS l FROM r JOIN e ON e.src = r.v
       |)
       |SELECT v AS vec_id, min(l) AS cluster_id,
       |  (v = min(l)) AS is_keeper
       |FROM r GROUP BY v""".stripMargin
  }

  /** The decontamination verdict as a full statement (own WITH scope) —
    * shared by the standalone entry and the composed pipeline oracle. */
  private def decontamSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts
      |            FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         list_aggregate(ts[i:i+12], 'string_agg', ' ') AS g
      |       FROM tok, unnest(range(1, len(ts) - 11)) AS t(i)
      |       WHERE len(ts) >= 13),
      |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 5 = 0),
      |hits AS (SELECT s.doc_id, count(*) AS h
      |         FROM sh s JOIN bench b USING (g)
      |         WHERE s.doc_id % 5 <> 0 GROUP BY 1)
      |SELECT d.doc_id,
      |  CAST(coalesce(h.h, 0) AS BIGINT) AS n_hit_grams,
      |  coalesce(h.h, 0) > 0 AS contaminated
      |FROM documents d LEFT JOIN hits h USING (doc_id)
      |WHERE d.doc_id % 5 <> 0""".stripMargin

  /** The Gopher-rules verdict as a full statement — shared likewise. */
  private def gopherSql: String = {
      val mwl = StableRound.sql6(
        "(length(text) - (len(ts) - 1)) / CAST(len(ts) AS DOUBLE)")
      val alpha = StableRound.sql6(
        "len(list_filter(ts, t -> regexp_matches(t, '[A-Za-z]')))" +
          " / CAST(len(ts) AS DOUBLE)")
      s"""WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS ts
         |            FROM documents),
         |base AS (SELECT doc_id, len(ts) AS n_tokens,
         |    $mwl AS mean_word_len,
         |    $alpha AS frac_alpha_words
         |  FROM tok),
         |g2 AS (SELECT doc_id, max(c) AS top2c FROM (
         |    SELECT doc_id, g, count(*) AS c FROM (
         |      SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g
         |      FROM tok, unnest(range(1, len(ts))) AS t(i)
         |      WHERE len(ts) >= 2)
         |    GROUP BY 1, 2) GROUP BY 1),
         |g5 AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup5c
         |  FROM (
         |    SELECT doc_id, g, count(*) AS c FROM (
         |      SELECT doc_id, list_aggregate(ts[i:i+4], 'string_agg', ' ') AS g
         |      FROM tok, unnest(range(1, len(ts) - 3)) AS t(i)
         |      WHERE len(ts) >= 5)
         |    GROUP BY 1, 2) GROUP BY 1)
         |SELECT b.doc_id, b.n_tokens, b.mean_word_len, b.frac_alpha_words,
         |  ${StableRound.sql6("coalesce(top2c, 0) * 2.0 / b.n_tokens")}
         |    AS frac_top_2gram,
         |  ${StableRound.sql6("coalesce(dup5c, 0) * 5.0 / b.n_tokens")}
         |    AS frac_dup_5gram,
         |  (b.mean_word_len BETWEEN 3.0 AND 10.0
         |    AND b.frac_alpha_words >= 0.8
         |    AND frac_top_2gram <= 0.20
         |    AND frac_dup_5gram <= 0.15) AS keep
         |FROM base b LEFT JOIN g2 USING (doc_id) LEFT JOIN g5 USING (doc_id)"""
        .stripMargin
  }

  def oracle: Map[String, String] = Map(
    "text_decontaminate" -> decontamSql,

    "text_quality_gopher" -> gopherSql,

    // the Spark side evaluates: rate = least(1.0, 0.4 * n_total * term
    // / denom / n_d) with term/denom exact decimals cast to double — the
    // SQL mirrors the exact op order so every IEEE step is identical
    "sample_mixture" ->
      s"""WITH stats AS (SELECT lang, count(*) AS n_d,
         |    round(CAST(sqrt(CAST(count(*) AS DOUBLE)) AS DECIMAL(27,12)), 6)
         |      AS term
         |  FROM documents GROUP BY lang),
         |tot AS (SELECT sum(term) AS denom, sum(n_d) AS n_total FROM stats),
         |rates AS (SELECT lang,
         |    CAST(floor(least(CAST(1.0 AS DOUBLE),
         |      CAST(0.4 AS DOUBLE) * CAST(n_total AS DOUBLE)
         |        * CAST(term AS DOUBLE) / CAST(denom AS DOUBLE) / n_d)
         |      * 1000000) AS BIGINT) AS rate_ppm
         |  FROM stats CROSS JOIN tot)
         |SELECT d.doc_id, d.lang,
         |  ${StableRound.sql6("rate_ppm / 1000000.0")} AS sample_rate,
         |  ((((d.doc_id % 1000000007) * 48271 + 12345) % 1000000007
         |      * 48271 + 12345) % 1000000007 % 1000000
         |    < rate_ppm) AS sampled
         |FROM documents d JOIN rates USING (lang)""".stripMargin,

    // recursive transitive closure over the exact-Jaccard pair relation
    // (identical to the LSH pair set — see dedupe_minhash_lsh's oracle)
    "dedupe_clusters" ->
      s"""WITH RECURSIVE
         |p AS (SELECT d1, d2 FROM (
         |${TextQueries.shingleCte(blocked = false)}
         |)),
         |e AS (SELECT d1 AS src, d2 AS dst FROM p
         |      UNION ALL SELECT d2, d1 FROM p),
         |r AS (
         |  SELECT doc_id AS v, doc_id AS l FROM documents
         |  UNION
         |  SELECT e.dst AS v, r.l AS l FROM r JOIN e ON e.src = r.v
         |)
         |SELECT v AS doc_id, min(l) AS cluster_id,
         |  (v = min(l)) AS is_keeper
         |FROM r GROUP BY v""".stripMargin,

    // curate verdict CTE (TextQueries' single SQL rendering of the rule
    // chain) + the pack layout over its keep set
    "pipeline_train_export" ->
      (TextQueries.curateCteSql + """,
        |sel AS (
        |  SELECT d.doc_id, d.lang,
        |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents d
        |  JOIN (SELECT doc_id FROM c WHERE keep) k USING (doc_id)),
        |packed AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_tokens AS BIGINT) AS start_offset
        |  FROM sel)
        |SELECT doc_id, lang, n_tokens, start_offset,
        |  CAST(floor(start_offset / 2048) AS BIGINT) AS bin_id
        |FROM packed""".stripMargin),

    "sample_bottomk" ->
      """WITH r AS (SELECT doc_id,
        |    ((doc_id % 1000000007) * 48271 + 13) % 1000000007 AS r1
        |  FROM documents),
        |k AS (SELECT doc_id,
        |    (r1 * 48271 + 13) % 1000000007 AS shuffle_key FROM r)
        |SELECT doc_id, shuffle_key FROM k
        |ORDER BY shuffle_key LIMIT 100""".stripMargin,

    "sample_bottomk_grouped" ->
      """WITH r AS (SELECT doc_id, lang,
        |    ((doc_id % 1000000007) * 48271 + 17) % 1000000007 AS r1
        |  FROM documents),
        |k AS (SELECT doc_id, lang,
        |    (r1 * 48271 + 17) % 1000000007 AS shuffle_key FROM r),
        |w AS (SELECT lang, doc_id, shuffle_key, row_number() OVER (
        |    PARTITION BY lang ORDER BY shuffle_key) AS rk FROM k)
        |SELECT lang, doc_id, shuffle_key, rk FROM w
        |WHERE rk <= 20""".stripMargin,

    // same affine map in hugeint; j cast to BIGINT to match
    "sample_negatives" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |a AS (SELECT doc_id, CAST(j AS BIGINT) AS j, n
        |  FROM documents, nn, unnest(range(1, 5)) AS t(j)),
        |r AS (SELECT doc_id, j,
        |    CAST((doc_id * 2654435761 + j * 40503 + 12345) % n
        |      AS BIGINT) AS raw, n
        |  FROM a),
        |s AS (SELECT doc_id, j,
        |    CASE WHEN raw = doc_id THEN (raw + 1) % n ELSE raw END
        |      AS neg_id
        |  FROM r)
        |SELECT s.doc_id, s.j, s.neg_id, d.lang AS neg_lang
        |FROM s JOIN documents d ON d.doc_id = s.neg_id""".stripMargin,

    // same LCG scramble (seed 29) ranked by key/weight — the ORDER BY
    // uses the exact double; only the emitted column is rounded
    "sample_weighted" ->
      """WITH r AS (SELECT doc_id, n_chars,
        |    ((doc_id % 1000000007) * 48271 + 29) % 1000000007 AS r1
        |  FROM documents),
        |k AS (SELECT doc_id, n_chars,
        |    (r1 * 48271 + 29) % 1000000007 AS sk FROM r),
        |w AS (SELECT doc_id, n_chars,
        |    sk / CAST(n_chars AS DOUBLE) AS wk FROM k)
        |SELECT doc_id, n_chars,
        |  CAST(round(CAST(wk AS DECIMAL(27,12)), 6) AS DOUBLE) AS wkey
        |FROM w ORDER BY wk, doc_id LIMIT 100""".stripMargin,

    // same two-round LCG scramble, spelled in SQL (doc_id ≥ 0, so % ≡
    // the Spark pmod here)
    "pipeline_shuffle_shard" ->
      """WITH r AS (SELECT doc_id,
        |    ((doc_id % 1000000007) * 48271 + 7) % 1000000007 AS r1
        |  FROM documents),
        |k AS (SELECT doc_id,
        |    (r1 * 48271 + 7) % 1000000007 AS shuffle_key FROM r)
        |SELECT doc_id, shuffle_key,
        |  CAST(shuffle_key % 8 AS INTEGER) AS shard
        |FROM k""".stripMargin,

    // running-sum layout is engine-neutral integer math: start offset =
    // cumsum − own count, bin = integer division by the budget
    "pipeline_pack_tokens" ->
      """WITH t AS (SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, lang, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_tokens AS BIGINT) AS start_offset
        |  FROM t)
        |SELECT doc_id, lang, n_tokens, start_offset,
        |  CAST(floor(start_offset / 2048) AS BIGINT) AS bin_id
        |FROM c""".stripMargin,

    // the star variant computes the SAME labels (component minima) —
    // one oracle, two algorithms
    "dedupe_clusters_star" ->
      s"""WITH RECURSIVE
         |p AS (SELECT d1, d2 FROM (
         |${TextQueries.shingleCte(blocked = false)}
         |)),
         |e AS (SELECT d1 AS src, d2 AS dst FROM p
         |      UNION ALL SELECT d2, d1 FROM p),
         |r AS (
         |  SELECT doc_id AS v, doc_id AS l FROM documents
         |  UNION
         |  SELECT e.dst AS v, r.l AS l FROM r JOIN e ON e.src = r.v
         |)
         |SELECT v AS doc_id, min(l) AS cluster_id,
         |  (v = min(l)) AS is_keeper
         |FROM r GROUP BY v""".stripMargin,

    // same closure over the embedding-cosine pair relation
    "dedupe_embed_clusters" -> embedClustersSql,

    // the IVF-blocked tier must converge to the SAME exact closure
    // (its candidate blocking is recall-1 on this corpus; exact verify
    // makes precision structural)
    "dedupe_embed_ivf" -> ivfPlantedSql,

    // bounded-recall tier: its own Lloyd-replay oracle — NOT the exact
    // closure (recall < 1 is the contract; see semdedupClustersSql)
    "dedupe_embed_semdedup" -> semdedupClustersSql,
    "dedupe_embed_semdedup_mp" -> semdedupSql(2),

    // honest quadratic cross-set oracle for the IVF-blocked incremental
    // tier (recall-1 blocking => identical verdicts)
    "dedupe_embed_incremental" ->
      s"""${VectorQueries.vCte},
         |inc AS (SELECT vec_id, e, nrm FROM n WHERE vec_id % 3 = 0),
         |ex AS (SELECT vec_id, e, nrm FROM n WHERE vec_id % 3 <> 0),
         |hit AS (SELECT DISTINCT a.vec_id FROM inc a JOIN ex b
         |  ON list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.45)
         |SELECT i.vec_id, hit.vec_id IS NULL AS is_new
         |FROM inc i LEFT JOIN hit ON i.vec_id = hit.vec_id""".stripMargin,

    // occurrence slicing mirrors ShingleArray.shingleOccurrences (n=13,
    // non-distinct); keep-first ownership = min doc_id per gram
    "dedupe_substring" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts
        |            FROM documents),
        |occ AS (SELECT doc_id,
        |          list_aggregate(ts[i:i+12], 'string_agg', ' ') AS g
        |        FROM tok, unnest(range(1, len(ts) - 11)) AS t(i)
        |        WHERE len(ts) >= 13),
        |own AS (SELECT g, min(doc_id) AS owner FROM occ GROUP BY g),
        |agg AS (SELECT o.doc_id, count(*) AS n_grams,
        |          count(CASE WHEN own.owner < o.doc_id THEN 1 END) AS n_dup
        |        FROM occ o JOIN own USING (g) GROUP BY o.doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup_grams,
        |  coalesce(n_dup, 0) > 0 AS has_dup_span
        |FROM documents d LEFT JOIN agg USING (doc_id)""".stripMargin,

    // per-term round6(ln) cast to exact DECIMAL before summing, so the
    // only cross-engine libm comparison is one ln() per gram at round-6
    // granularity (the math_funcs precedent) — never an
    // accumulation-order double sum
    "text_lm_score" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts
         |            FROM documents),
         |occ AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g
         |        FROM tok, unnest(range(1, len(ts))) AS t(i)
         |        WHERE len(ts) >= 2),
         |cu AS (SELECT w, count(*) AS cu FROM (
         |         SELECT unnest(ts) AS w FROM tok) GROUP BY w),
         |v AS (SELECT count(*) AS v FROM cu),
         |sc AS (SELECT occ.doc_id,
         |    CAST(${graft.StableRound.sql6(
                 "ln(CAST(cu.cu + v.v AS DOUBLE) / CAST(cb.cb + 1 AS DOUBLE))")}
         |      AS DECIMAL(27,6)) AS nll
         |  FROM occ
         |  JOIN (SELECT g, count(*) AS cb FROM occ GROUP BY g) cb USING (g)
         |  JOIN cu ON cu.w = split_part(occ.g, ' ', 1)
         |  CROSS JOIN v),
         |pd AS (SELECT doc_id, count(*) AS n_bigrams, sum(nll) AS s
         |       FROM sc GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |  ${graft.StableRound.sql6("CAST(s AS DOUBLE) / n_bigrams")}
         |    AS nll_per_bigram
         |FROM documents d LEFT JOIN pd USING (doc_id)""".stripMargin,

    // same DSIR law: identical engine-neutral token hash, round6'd
    // per-bucket lns, exact-decimal per-doc sums
    "sample_dsir" ->
      s"""WITH tok AS (SELECT doc_id,
         |    (CASE WHEN source IN ('src1','src2','src3') THEN 1 ELSE 0 END)
         |      AS t,
         |    unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |tb AS (SELECT doc_id, t,
         |    ${TextQueries.tokenHash60Sql("w")} % 256 AS b FROM tok),
         |cnt AS (SELECT b, count(*) AS cr, sum(t) AS ct FROM tb GROUP BY 1),
         |tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM cnt),
         |sc AS (SELECT b,
         |    CAST(${graft.StableRound.sql6(
                "ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + 256 AS DOUBLE))")}
         |        AS DECIMAL(27,6))
         |    - CAST(${graft.StableRound.sql6(
                "ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + 256 AS DOUBLE))")}
         |        AS DECIMAL(27,6)) AS s
         |  FROM cnt CROSS JOIN tot),
         |pd AS (SELECT tb.doc_id, count(*) AS n_tokens, sum(sc.s) AS lw
         |  FROM tb JOIN sc USING (b) GROUP BY 1)
         |SELECT doc_id, n_tokens,
         |  ${graft.StableRound.sql6("CAST(lw AS DOUBLE) / n_tokens")}
         |    AS lw_per_token,
         |  lw > 0 AS selected
         |FROM pd""".stripMargin,

    // quality CTE shared with text_quality's oracle; rank/phase are
    // exact integers so the quartile law replays verbatim
    "pipeline_curriculum_order" ->
      """WITH q AS (SELECT doc_id,
        |    CAST(round(CAST(least(nt / 100.0, 1.0) * 0.4
        |      + (1.0 - ns / nt) * 0.3 + (nd / nt) * 0.3
        |      AS DECIMAL(27,12)), 6) AS DOUBLE) AS quality,
        |    fp AS shuffle_key
        |  FROM (
        |    SELECT doc_id,
        |      CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt,
        |      CAST(len(list_filter(string_split(text, ' '),
        |        t -> t IN ('a', 'the'))) AS DOUBLE) AS ns,
        |      CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |        AS nd,
        |      list_reduce(
        |        list_prepend(CAST(0 AS BIGINT),
        |          list_transform(string_split(text, ''),
        |            c -> CAST(unicode(c) AS BIGINT))),
        |        (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
        |    FROM documents)),
        |nn AS (SELECT count(*) AS n FROM q),
        |r AS (SELECT doc_id, quality, shuffle_key,
        |    CAST(row_number() OVER (ORDER BY quality, doc_id) - 1
        |      AS BIGINT) AS rnk
        |  FROM q)
        |SELECT doc_id, quality, rnk, (rnk * 4) // nn.n AS phase,
        |  shuffle_key
        |FROM r, nn""".stripMargin,

    // same integer waterfill law: i* by the affordability predicate,
    // cap and remainder by integer division — exact at any magnitude
    "pipeline_token_budget" ->
      """WITH c AS (SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |tt AS (SELECT sum(n_tokens) AS n_total, count(*) AS m FROM c),
        |r AS (SELECT source, n_tokens, (2 * n_total) // 5 AS t, m,
        |    CAST(row_number() OVER (ORDER BY n_tokens, source) AS BIGINT)
        |      AS i,
        |    sum(n_tokens) OVER (ORDER BY n_tokens, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pfx
        |  FROM c CROSS JOIN tt),
        |st AS (SELECT coalesce(max(i), 0) AS istar,
        |    coalesce(max_by(pfx, i), 0) AS pstar
        |  FROM r WHERE pfx + n_tokens * (m - i) <= t),
        |f AS (SELECT r.*, istar, pstar,
        |    (CASE WHEN m > istar THEN (t - pstar) // (m - istar)
        |          ELSE 0 END) AS cap
        |  FROM r CROSS JOIN st)
        |SELECT source, n_tokens,
        |  CAST(CASE WHEN i <= istar THEN n_tokens
        |        ELSE cap + (CASE WHEN i - istar
        |            <= t - pstar - cap * (m - istar) THEN 1 ELSE 0 END)
        |   END AS BIGINT) AS alloc_tokens,
        |  i > istar AS capped
        |FROM f""".stripMargin,

    // weights as exact DECIMAL sums, the epoch law as the verbatim
    // straight-line double expression of the Spark side
    "pipeline_epoch_plan" ->
      s"""WITH stats AS (SELECT lang, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |w AS (SELECT lang, n_docs, n_tokens,
        |    round(CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(27,12)), 6)
        |      AS wgt
        |  FROM stats),
        |tot AS (SELECT sum(wgt) AS denom, sum(n_tokens) AS total FROM w),
        |p AS (SELECT lang, n_docs, n_tokens,
        |    ${StableRound.sql6(
             "least(CAST(4 AS DOUBLE), CAST(total AS DOUBLE)" +
             " * CAST(0.5 AS DOUBLE)" +
             " * (CAST(wgt AS DOUBLE) / CAST(denom AS DOUBLE))" +
             " / CAST(n_tokens AS DOUBLE))")} AS epochs
        |  FROM w CROSS JOIN tot)
        |SELECT lang, n_docs, n_tokens, epochs,
        |  CAST(floor(epochs * CAST(n_tokens AS DOUBLE)) AS BIGINT)
        |    AS alloc_tokens
        |FROM p ORDER BY lang""".stripMargin,

    // The composed pipeline, stage oracles embedded as SUBQUERIES (each
    // keeps its own WITH scope, so CTE names cannot collide) — the
    // per-stage SQL exists once and is reused here verbatim. The closure
    // and the mixture rates run over their actual sequential input sets
    // (survivors / keepers), exactly like the Spark side.
    "pipeline_pretrain_corpus" ->
      s"""WITH RECURSIVE
         |cur AS (SELECT doc_id, keep FROM (
         |${TextQueries.oracle("text_curate")}
         |)),
         |gop AS (SELECT doc_id, keep FROM (
         |$gopherSql
         |)),
         |dec AS (SELECT doc_id, contaminated FROM (
         |$decontamSql
         |)),
         |surv AS (
         |  SELECT d.doc_id, d.lang, d.text
         |  FROM documents d
         |  JOIN cur ON cur.doc_id = d.doc_id
         |  JOIN gop ON gop.doc_id = d.doc_id
         |  LEFT JOIN dec ON dec.doc_id = d.doc_id
         |  WHERE d.doc_id % 5 <> 0 AND cur.keep AND gop.keep
         |    AND NOT coalesce(dec.contaminated, FALSE)),
         |p0 AS (SELECT d1, d2 FROM (
         |${TextQueries.shingleCte(blocked = false)}
         |)),
         |p AS (SELECT d1, d2 FROM p0
         |      JOIN surv a ON p0.d1 = a.doc_id
         |      JOIN surv b ON p0.d2 = b.doc_id),
         |e AS (SELECT d1 AS src, d2 AS dst FROM p
         |      UNION ALL SELECT d2, d1 FROM p),
         |r AS (
         |  SELECT doc_id AS v, doc_id AS l FROM surv
         |  UNION
         |  SELECT e.dst AS v, r.l AS l FROM r JOIN e ON e.src = r.v
         |),
         |lbl AS (SELECT v, min(l) AS cluster FROM r GROUP BY v),
         |kp AS (SELECT s.doc_id, s.lang, s.text
         |       FROM surv s JOIN lbl ON lbl.v = s.doc_id
         |       WHERE lbl.cluster = s.doc_id),
         |mstats AS (SELECT lang, count(*) AS n_d,
         |    round(CAST(sqrt(CAST(count(*) AS DOUBLE)) AS DECIMAL(27,12)), 6)
         |      AS term
         |  FROM kp GROUP BY lang),
         |mtot AS (SELECT sum(term) AS denom, sum(n_d) AS n_total FROM mstats),
         |mrates AS (SELECT lang,
         |    CAST(floor(least(CAST(1.0 AS DOUBLE),
         |      CAST(0.4 AS DOUBLE) * CAST(n_total AS DOUBLE)
         |        * CAST(term AS DOUBLE) / CAST(denom AS DOUBLE) / n_d)
         |      * 1000000) AS BIGINT) AS rate_ppm
         |  FROM mstats CROSS JOIN mtot),
         |mx AS (SELECT k.doc_id, k.text,
         |    ((((k.doc_id % 1000000007) * 48271 + 12345) % 1000000007
         |        * 48271 + 12345) % 1000000007 % 1000000
         |      < rate_ppm) AS sampled
         |  FROM kp k JOIN mrates USING (lang))
         |SELECT
         |  (SELECT count(*) FROM documents) AS n_input,
         |  (SELECT count(*) FROM documents WHERE doc_id % 5 <> 0) AS n_train,
         |  (SELECT count(*) FROM documents d JOIN cur USING (doc_id)
         |    WHERE d.doc_id % 5 <> 0 AND cur.keep) AS n_after_curate,
         |  (SELECT count(*) FROM documents d
         |    JOIN cur USING (doc_id) JOIN gop USING (doc_id)
         |    WHERE d.doc_id % 5 <> 0 AND cur.keep AND gop.keep)
         |    AS n_after_gopher,
         |  (SELECT count(*) FROM surv) AS n_after_decontam,
         |  (SELECT count(*) FROM kp) AS n_after_dedupe,
         |  (SELECT count(CASE WHEN sampled THEN 1 END) FROM mx) AS n_sampled,
         |  (SELECT CAST(sum(CASE WHEN sampled
         |      THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT)
         |    FROM mx) AS total_tokens_sampled""".stripMargin,

    // the oracle dedupes on the normalized TEXT itself; the Spark side
    // groups on its 16-byte (length, fingerprint) proxy — same grouping
    // in every realizable case (the dedupe_exact convention)
    // bloom tier: no false negatives + exact confirmation of positives
    // => same result as the exact tier, same oracle
    "dedupe_incremental_bloom" ->
      """WITH i AS (SELECT doc_id,
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nrm
        |  FROM documents WHERE doc_id % 3 = 0),
        |e AS (SELECT DISTINCT
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nrm
        |  FROM documents WHERE doc_id % 3 <> 0)
        |SELECT i.doc_id, e.nrm IS NULL AS is_new
        |FROM i LEFT JOIN e ON i.nrm = e.nrm""".stripMargin,

    "dedupe_incremental" ->
      """WITH i AS (SELECT doc_id,
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nrm
        |  FROM documents WHERE doc_id % 3 = 0),
        |e AS (SELECT DISTINCT
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nrm
        |  FROM documents WHERE doc_id % 3 <> 0)
        |SELECT i.doc_id, e.nrm IS NULL AS is_new
        |FROM i LEFT JOIN e ON i.nrm = e.nrm""".stripMargin,

    // same recursive closure as dedupe_clusters + a row_number election
    // (n_chars DESC, doc_id) per cluster — tie order matches the
    // struct-max pick exactly
    "dedupe_canonicalize" ->
      s"""WITH RECURSIVE
         |p AS (SELECT d1, d2 FROM (
         |${TextQueries.shingleCte(blocked = false)}
         |)),
         |e AS (SELECT d1 AS src, d2 AS dst FROM p
         |      UNION ALL SELECT d2, d1 FROM p),
         |r AS (
         |  SELECT doc_id AS v, doc_id AS l FROM documents
         |  UNION
         |  SELECT e.dst AS v, r.l AS l FROM r JOIN e ON e.src = r.v
         |),
         |cl AS (SELECT v AS doc_id, min(l) AS cluster_id FROM r GROUP BY v),
         |j AS (SELECT cl.cluster_id, cl.doc_id, d.n_chars
         |  FROM cl JOIN documents d USING (doc_id)),
         |w AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
         |    ORDER BY n_chars DESC, doc_id) AS rk FROM j),
         |m AS (SELECT cluster_id, count(*) AS n_members FROM j GROUP BY 1)
         |SELECT m.cluster_id, m.n_members, w.doc_id AS canonical_id,
         |  w.n_chars AS canonical_chars
         |FROM m JOIN w ON w.cluster_id = m.cluster_id AND w.rk = 1""".stripMargin,

    "sample_split_hash" ->
      """WITH h AS (SELECT doc_id, lang,
        |    (((doc_id % 1000000007) * 48271 + 12345) % 1000000007
        |      * 48271 + 12345) % 1000000007 % 1000000 AS hv
        |  FROM documents)
        |SELECT doc_id, lang, hv // 10000 AS bucket,
        |  CASE WHEN hv // 10000 < 80 THEN 'train'
        |       WHEN hv // 10000 < 90 THEN 'val' ELSE 'test' END AS split
        |FROM h""".stripMargin,

    // split law replayed from the same hash arithmetic; the near-dup
    // pair relation is the dedupe_minhash_lsh oracle embedded as a
    // subquery (its own WITH scope — the pretrain-corpus composition
    // idiom), so banding recall vs the exact form is re-checked here too
    "pipeline_split_leakage" ->
      s"""WITH sp AS (SELECT doc_id,
        |    CASE WHEN hv // 10000 < 80 THEN 'train'
        |         WHEN hv // 10000 < 90 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT doc_id,
        |      (((doc_id % 1000000007) * 48271 + 12345) % 1000000007
        |        * 48271 + 12345) % 1000000007 % 1000000 AS hv
        |    FROM documents)),
        |pr AS (SELECT * FROM (${TextQueries.shingleCte(blocked = false)})),
        |crossing AS (SELECT
        |    CASE WHEN s1.split = 'train' THEN pr.d2 ELSE pr.d1 END
        |      AS doc_id,
        |    pr.jaccard
        |  FROM pr JOIN sp s1 ON pr.d1 = s1.doc_id
        |  JOIN sp s2 ON pr.d2 = s2.doc_id
        |  WHERE (s1.split = 'train') <> (s2.split = 'train')),
        |leak AS (SELECT doc_id, count(*) AS n_train_dups,
        |    max(jaccard) AS max_jaccard
        |  FROM crossing GROUP BY 1)
        |SELECT sp.doc_id, sp.split,
        |  coalesce(leak.n_train_dups, 0) AS n_train_dups,
        |  coalesce(leak.max_jaccard, CAST(0.0 AS DOUBLE)) AS max_jaccard,
        |  coalesce(leak.n_train_dups, 0) > 0 AS leaked
        |FROM sp LEFT JOIN leak ON sp.doc_id = leak.doc_id
        |WHERE sp.split <> 'train'
        |ORDER BY sp.doc_id""".stripMargin,

    // n_tokens/n_chars: DuckDB sum(BIGINT) returns HUGEINT, which pandas
    // renders as float64 ("3.0" vs Spark's int64 "3") — value-equal but
    // format-different, so a stringifying hash fails while a value
    // compare passes (the r8/r9 driver hash-FAIL). CAST pins BIGINT.
    "pipeline_dataset_card" ->
      s"""WITH pl AS (SELECT lang, count(*) AS n_docs,
         |    count(DISTINCT text) AS n_distinct,
         |    CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
         |      AS BIGINT) AS n_tokens,
         |    CAST(sum(n_chars) AS BIGINT) AS n_chars
         |  FROM documents GROUP BY 1),
         |t AS (SELECT sum(n_docs) AS n_total FROM pl)
         |SELECT lang, n_docs, n_distinct, n_tokens, n_chars,
         |  ${StableRound.sql6("1.0 - CAST(n_distinct AS DOUBLE) / n_docs")}
         |    AS dup_rate,
         |  ${StableRound.sql6("CAST(n_docs AS DOUBLE) / n_total")}
         |    AS corpus_share
         |FROM pl CROSS JOIN t
         |ORDER BY lang""".stripMargin,

    // occurrence-order adjacent pairs (no distinct); top-20 under the
    // (count desc, pair) total order
    "pipeline_tokenizer_fit" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS ts FROM documents),
        |p AS (SELECT ts[i] || ' ' || ts[i+1] AS pair
        |  FROM tok, unnest(range(1, len(ts))) AS t(i)),
        |c AS (SELECT pair, count(*) AS cnt FROM p GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_pairs,
        |    CAST(count(*) AS BIGINT) AS n_distinct_pairs FROM c),
        |top AS (SELECT pair, CAST(cnt AS BIGINT) AS cnt FROM c
        |  ORDER BY cnt DESC, pair LIMIT 20)
        |SELECT pair, cnt, n_pairs, n_distinct_pairs FROM top, t""".stripMargin,

    // same LCG membership predicate; id checksum pins membership
    "sample_balanced_classes" ->
      """WITH cnts AS (SELECT event_type, count(*) AS n_t
        |  FROM events GROUP BY 1),
        |mn AS (SELECT min(n_t) AS n_min FROM cnts),
        |rated AS (SELECT event_type, n_t, n_min * 1000000 // n_t AS ppm
        |  FROM cnts, mn),
        |kept AS (SELECT e.event_type, e.event_id, r.n_t
        |  FROM events e JOIN rated r USING (event_type)
        |  WHERE ((((e.event_id % 1000000007) * 48271 + 12345)
        |    % 1000000007 * 48271 + 12345) % 1000000007 % 1000000)
        |    < r.ppm)
        |SELECT event_type, CAST(max(n_t) AS BIGINT) AS n_orig,
        |  CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum
        |FROM kept GROUP BY 1""".stripMargin,

    "pipeline_tokenizer_train" -> tokenizerTrainSql,

    "pipeline_tokenizer_apply" -> tokenizerApplySql,

    // NB train + apply replayed in full: every per-term ln mirrored
    // expression-for-expression under the round-6 decimal bridge
    // (division spelled identically — ln(CAST(a)/CAST(b)), unseen
    // default ln(1.0/CAST(n_c+v)); NOT -ln(x), which differs in float);
    // argmax = row_number under the same (score DESC, class ASC) order
    "pipeline_classifier_nb" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |             FROM documents),
         |tokf AS (SELECT doc_id, w FROM tok WHERE len(w) > 0),
         |train AS (SELECT doc_id, lang FROM documents WHERE doc_id % 3 <> 0),
         |ttok AS (SELECT t.doc_id, tr.lang, t.w
         |         FROM tokf t JOIN train tr USING (doc_id)),
         |cwc AS (SELECT lang AS cls, w, count(*) AS cnt
         |        FROM ttok GROUP BY 1, 2),
         |nc AS (SELECT cls, sum(cnt) AS n_c FROM cwc GROUP BY 1),
         |v AS (SELECT count(DISTINCT w) AS v FROM cwc),
         |nd AS (SELECT count(*) AS n_docs FROM train),
         |priors AS (SELECT lang AS cls, CAST(${graft.StableRound.sql6(
                "ln(CAST(count(*) AS DOUBLE) / CAST(max(n_docs) AS DOUBLE))")}
         |      AS DECIMAL(27,6)) AS prior
         |    FROM train CROSS JOIN nd GROUP BY lang),
         |cstats AS (SELECT nc.cls, nc.n_c, v.v, CAST(${graft.StableRound.sql6(
                "ln(1.0 / CAST(n_c + v AS DOUBLE))")}
         |      AS DECIMAL(27,6)) AS lw_unseen
         |    FROM nc CROSS JOIN v),
         |wstats AS (SELECT cwc.cls, cwc.w, CAST(${graft.StableRound.sql6(
                "ln(CAST(cnt + 1 AS DOUBLE) / CAST(n_c + v AS DOUBLE))")}
         |      AS DECIMAL(27,6)) AS lw
         |    FROM cwc JOIN cstats USING (cls)),
         |pdc AS (SELECT t.doc_id, c.cls,
         |      sum(coalesce(ws.lw, c.lw_unseen)) AS s_tok
         |    FROM tokf t CROSS JOIN cstats c
         |    LEFT JOIN wstats ws ON ws.cls = c.cls AND ws.w = t.w
         |    GROUP BY 1, 2),
         |scored AS (SELECT d.doc_id, d.lang, p.cls,
         |      p.prior + coalesce(pdc.s_tok, CAST(0 AS DECIMAL(27,6))) AS s
         |    FROM documents d CROSS JOIN priors p
         |    LEFT JOIN pdc ON pdc.doc_id = d.doc_id AND pdc.cls = p.cls),
         |best AS (SELECT doc_id, lang, cls, s, row_number()
         |      OVER (PARTITION BY doc_id ORDER BY s DESC, cls) AS rk
         |    FROM scored)
         |SELECT doc_id, cls AS pred, CAST(s AS DOUBLE) AS score,
         |  cls = lang AS is_correct
         |FROM best WHERE rk = 1""".stripMargin,

    // both closures (base canonicals, delta components) as recursive
    // CTEs over the exact-Jaccard pair relation, split by doc_id%3 side;
    // a delta component is contaminated when any member pairs with a
    // base CANONICAL (cross-side pair against the bk keeper set)
    "dedupe_incremental_neardup" ->
      s"""WITH RECURSIVE
         |p AS (SELECT d1, d2 FROM (
         |${TextQueries.shingleCte(blocked = false)}
         |)),
         |bp AS (SELECT d1, d2 FROM p WHERE d1 % 3 <> 0 AND d2 % 3 <> 0),
         |be AS (SELECT d1 AS src, d2 AS dst FROM bp
         |       UNION ALL SELECT d2, d1 FROM bp),
         |br AS (
         |  SELECT doc_id AS v, doc_id AS l FROM documents
         |  WHERE doc_id % 3 <> 0
         |  UNION
         |  SELECT be.dst AS v, br.l AS l FROM br JOIN be ON be.src = br.v
         |),
         |bk AS (SELECT v AS doc_id FROM br GROUP BY v HAVING v = min(l)),
         |dp AS (SELECT d1, d2 FROM p WHERE d1 % 3 = 0 AND d2 % 3 = 0),
         |de AS (SELECT d1 AS src, d2 AS dst FROM dp
         |       UNION ALL SELECT d2, d1 FROM dp),
         |dr AS (
         |  SELECT doc_id AS v, doc_id AS l FROM documents
         |  WHERE doc_id % 3 = 0
         |  UNION
         |  SELECT de.dst AS v, dr.l AS l FROM dr JOIN de ON de.src = dr.v
         |),
         |dc AS (SELECT v AS doc_id, min(l) AS label FROM dr GROUP BY v),
         |hit AS (SELECT DISTINCT
         |    CASE WHEN d1 % 3 = 0 THEN d1 ELSE d2 END AS doc_id
         |  FROM p JOIN bk
         |    ON bk.doc_id = CASE WHEN d1 % 3 = 0 THEN d2 ELSE d1 END
         |  WHERE (d1 % 3 = 0) <> (d2 % 3 = 0)),
         |cont AS (SELECT DISTINCT dc.label FROM dc
         |  JOIN hit USING (doc_id))
         |SELECT dc.doc_id,
         |  CASE WHEN dc.label IN (SELECT label FROM cont) THEN 'dup_base'
         |       WHEN dc.doc_id <> dc.label THEN 'dup_delta'
         |       ELSE 'kept' END AS status
         |FROM dc""".stripMargin,
  )
}
