package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.StableRound

/** Corpus-level training-data operators beyond per-document analysis:
  * benchmark decontamination, repetition-based quality filtering (the
  * Gopher rules), and temperature-weighted mixture sampling. These are the
  * passes a pre-training data build runs AFTER per-doc curation — they all
  * need corpus- or partition-level context, and each is shaped so the big
  * side (the corpus) is never shuffled.
  */
object CorpusOps {

  /** Gram shuffle key: `xxhash64` of the gram string (8-byte long) when
    * `hashKeys`, the string itself otherwise. Every gram-keyed exchange
    * in this file moves ~13 tokens (~80-100 bytes) per row in string
    * form — at open-web scale that amplifies corpus text ~13× through
    * the shuffle. Hashing at explode time (map-side, before the
    * exchange) cuts the key to 8 bytes; every downstream use is
    * count/min/join-membership, so results are identical up to 64-bit
    * collisions (~n²/2⁶⁵ — negligible below trillions of DISTINCT
    * grams, and a collision only merges two gram tallies, never drops a
    * document). `hashKeys = false` keeps the exact string path; the
    * string≡hash equivalence is pinned by CorpusOpsSpec on real sf0.001
    * corpus text. */
  private def gramKey(gram: Column, hashKeys: Boolean): Column =
    if (hashKeys) xxhash64(gram) else gram

  /** Benchmark decontamination — the published GPT-3/PaLM pattern (Brown
    * et al. 2020, appendix C): flag a training document when it shares any
    * n-token gram (n = 13 there, and here) with an evaluation document.
    *
    * Scale shape: eval suites are tiny relative to the corpus (thousands
    * of docs vs billions), so the distinct eval-gram set is BROADCAST and
    * the training side is a map-side broadcast-hash semi-match — the
    * 100 TB corpus is never shuffled; the only exchange is the per-doc hit
    * aggregation, which moves (doc_id, count) pairs for contaminated docs
    * only. Docs shorter than n tokens have no n-gram and cannot be
    * flagged, matching the reference rule. With `hashKeys` (default) the
    * broadcast set holds 8-byte `xxhash64` keys instead of ~100-byte
    * 13-gram strings — ~10× more eval grams fit the same broadcast
    * budget (see [[gramKey]] for the collision analysis).
    *
    * Returns one row per TRAINING doc: (id, n_hit_grams, contaminated).
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      isEval: Column, n: Int = 13, hashKeys: Boolean = true): DataFrame = {
    val grams = graft.functions.ShingleArray.shingleArray(col(textCol), n)
    val evalGrams = docs.filter(isEval)
      .select(explode(grams).as("__g0"))
      .select(gramKey(col("__g0"), hashKeys).as("gram")).distinct()
    val train = docs.filter(!isEval)
    // grams are distinct per doc (set semantics), so the count is the
    // number of DISTINCT shared grams without a second dedup pass
    val hits = train
      .select(col(idCol), explode(grams).as("__g0"))
      .select(col(idCol), gramKey(col("__g0"), hashKeys).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .groupBy(idCol).agg(count(lit(1)).as("hits"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("hits"), lit(0L)).as("n_hit_grams"),
        (coalesce(col("hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Repetition-based quality rules from the Gopher corpus pipeline (Rae
    * et al. 2021, "Scaling Language Models", table A1) — the standard
    * document-level repetition filters, in their token-fraction form:
    *
    *  - `mean_word_len` must lie in [3, 10]
    *  - `frac_alpha_words` (tokens containing at least one alphabetic
    *    char) must be ≥ 0.80
    *  - `frac_top_2gram` (fraction of tokens covered by occurrences of
    *    the single most frequent 2-gram) must be ≤ 0.20
    *  - `frac_dup_5gram` (fraction of tokens covered by occurrences of
    *    5-grams that appear more than once; overlapping occurrences each
    *    count, so the ratio can exceed 1 on degenerate docs) must be
    *    ≤ 0.15
    *
    * Shape: the per-row metrics are pure column expressions; the two gram
    * tallies explode the occurrence multiset and aggregate on
    * (doc, gram) — partial aggregation combines map-side, and only
    * (doc_id, metric) pairs reach the final join. With `hashKeys`
    * (default) the grouping key is (doc_id, xxhash64(gram)) — 8-byte
    * longs through the exchange instead of gram strings; the metrics
    * only ever see per-key COUNTS, so the results are hash-invariant
    * (see [[gramKey]]; equivalence pinned by CorpusOpsSpec).
    */
  def gopherRepetition(docs: DataFrame, idCol: String, textCol: String,
      top2Max: Double = 0.20, dup5Max: Double = 0.15,
      hashKeys: Boolean = true): DataFrame = {
    val ts = split(col(textCol), " ")
    val nTok = size(ts)
    val base = docs.select(col(idCol), nTok.cast("long").as("n_tokens"),
      StableRound.round6((length(col(textCol)) - (nTok - 1)).cast("double")
        / nTok).as("mean_word_len"),
      StableRound.round6(size(filter(ts, t => t.rlike("[A-Za-z]")))
        .cast("double") / nTok).as("frac_alpha_words"))

    def gramCounts(n: Int): DataFrame = docs
      .select(col(idCol), explode(
        graft.functions.ShingleArray.shingleOccurrences(col(textCol), n))
        .as("__g0"))
      .select(col(idCol), gramKey(col("__g0"), hashKeys).as("gram"))
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("c"))

    val top2 = gramCounts(2).groupBy(idCol)
      .agg(max(col("c")).as("top2c"))
    val dup5 = gramCounts(5).groupBy(idCol)
      .agg(sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup5c"))

    val m = base
      .join(top2, Seq(idCol), "left")
      .join(dup5, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("mean_word_len"),
        col("frac_alpha_words"),
        StableRound.round6(coalesce(col("top2c"), lit(0L)) * 2.0
          / col("n_tokens")).as("frac_top_2gram"),
        StableRound.round6(coalesce(col("dup5c"), lit(0L)) * 5.0
          / col("n_tokens")).as("frac_dup_5gram"))
    m.withColumn("keep",
      col("mean_word_len").between(3.0, 10.0) &&
        col("frac_alpha_words") >= 0.8 &&
        col("frac_top_2gram") <= top2Max &&
        col("frac_dup_5gram") <= dup5Max)
  }

  /** Deterministic per-id sampling hash in [0, 1e6): two rounds of the
    * MINSTD linear congruential step (a = 48271, Park–Miller 1988) mod
    * the 31-bit prime 1e9+7. One round is not enough — for small ids
    * `id·a + c` never wraps the modulus and the "hash" is just a linear
    * ramp (every small id lands under any threshold; caught by
    * CorpusOpsSpec) — but round 2 multiplies a ≥ 12345 value by 48271
    * into guaranteed wrap territory, giving Weyl-sequence
    * equidistribution that a threshold test needs. Pure 64-bit integer
    * ops, max intermediate (1e9+6)·48271 ≈ 4.8e13: overflow-free and
    * expressible verbatim in any BIGINT engine. */
  def samplingHash(id: Column): Column = {
    val p = 1000000007L
    val r1 = pmod(pmod(id, lit(p)) * 48271L + 12345L, lit(p))
    pmod(pmod(r1 * 48271L + 12345L, lit(p)), lit(1000000L))
  }

  /** Temperature-weighted mixture sampling — the multilingual/multi-domain
    * alpha-sampling rule (Xue et al. 2021, mT5 §3.1, α = 0.5 there and
    * here): domain d with n_d docs gets mixture weight
    * w_d = n_d^α / Σ_e n_e^α, and a total budget of `targetFrac · N` docs,
    * so its per-doc keep rate is min(1, targetFrac · N · w_d / n_d) —
    * high-resource domains are down-sampled hardest, low-resource domains
    * kept whole.
    *
    * Determinism across engines: membership is decided by the
    * engine-neutral [[samplingHash]] (not rand()), and the α = 0.5 power
    * is `sqrt` — correctly-rounded IEEE in both engines, unlike libm
    * `pow`. The per-domain terms are rounded to exact decimals BEFORE the
    * Σ so the denominator is summation-order-independent; the remaining
    * rate arithmetic is straight-line IEEE double ops evaluated in the
    * same order on both sides.
    *
    * Scale shape: domain stats are a tiny aggregate → broadcast back; the
    * corpus pass is map-only (hash + compare) — no corpus shuffle.
    *
    * Returns one row per doc: (id, domain, sample_rate, sampled).
    */
  def mixtureSample(docs: DataFrame, idCol: String, domainCol: String,
      targetFrac: Double = 0.4): DataFrame = {
    val stats = docs.groupBy(domainCol).agg(count(lit(1)).as("n_d"))
      .withColumn("term",
        round(sqrt(col("n_d").cast("double")).cast(DecimalType(27, 12)), 6))
    val totals = stats.agg(sum(col("term")).as("denom"),
      sum(col("n_d")).as("n_total"))
    val rate = least(lit(1.0),
      lit(targetFrac) * col("n_total") * col("term").cast("double")
        / col("denom").cast("double") / col("n_d"))
    val rates = stats.crossJoin(broadcast(totals))
      .select(col(domainCol), floor(rate * 1000000L).cast("long")
        .as("rate_ppm"))
    docs.join(broadcast(rates), domainCol)
      .select(col(idCol), col(domainCol),
        StableRound.round6(col("rate_ppm") / 1000000.0).as("sample_rate"),
        (samplingHash(col(idCol)) < col("rate_ppm")).as("sampled"))
  }

  /** Exact substring-span deduplication — Lee et al. 2022 ("Deduplicating
    * Training Data Makes Language Models Better"): an n-token span is
    * duplicated when the SAME span occurs in an earlier (lower-id)
    * document; the keep-first convention mirrors the suffix-array
    * dedup's "keep one copy of every duplicated substring". Output per
    * doc: total span count, duplicated-span count, and the has_dup flag
    * a filtering pass keys on.
    *
    * Scale shape: one occurrence explode + a gram-keyed aggregation
    * (map-side combine) to find each gram's minimum owner, then one
    * gram-keyed join back — both exchanges move (gram, id) pairs, never
    * documents. With `hashKeys` (default) the join/group key is
    * xxhash64(gram) — 8-byte longs instead of ~100-byte 13-gram strings
    * through BOTH exchanges; min-owner and ownership comparison are
    * hash-invariant (see [[gramKey]]; equivalence pinned by
    * CorpusOpsSpec). Docs shorter than n tokens carry zero spans and
    * pass through unflagged. */
  def substringDedupe(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 13, hashKeys: Boolean = true): DataFrame = {
    val occ = docs.select(col(idCol), explode(
      graft.functions.ShingleArray.shingleOccurrences(col(textCol), n))
      .as("__g0"))
      .select(col(idCol), gramKey(col("__g0"), hashKeys).as("gram"))
    val owner = occ.groupBy("gram").agg(min(col(idCol)).as("__owner"))
    val agg = occ.join(owner, "gram")
      .groupBy(idCol).agg(
        count(lit(1)).as("n_grams"),
        count(when(col("__owner") < col(idCol), 1)).as("n_dup_grams"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        (coalesce(col("n_dup_grams"), lit(0L)) > 0).as("has_dup_span"))
  }

  /** Pre-training SEQUENCE PACKING — the step between a curated corpus
    * and a training run: documents are laid out into one contiguous
    * token stream per group (language/domain) in deterministic id
    * order, and each document is assigned to the fixed-budget training
    * sequence (bin) where its first token lands:
    * `bin_id = floor(start_offset / budget)` with
    * `start_offset = cumsum(n_tokens) - n_tokens`. This is the
    * streaming concat-then-chunk layout (GPT-style packing: documents
    * concatenated with separators, chunked every `budget` tokens) —
    * NOT bin-repacking first-fit-decreasing, which is
    * order-destroying, unstable under appends, and needs a driver-side
    * solver; the contiguous layout is what production pretraining
    * loaders actually consume, and it is exactly reproducible by any
    * engine with a running sum.
    *
    * Scale shape: one column projection for token counts, ONE window
    * shuffle partitioned by the group column ordered by id — the same
    * exchange class as win_running_total; no driver state, no
    * iteration. Per-group streams are the natural 100 TB layout
    * (domains partition independently; a skewed mega-domain salts the
    * same way any window op does — or pre-splits on a coarse id range,
    * since offsets within a range are recoverable by adding the
    * range's token total).
    *
    * Returns one row per doc: (id, group, n_tokens, start_offset,
    * bin_id). */
  def packSequences(docs: DataFrame, idCol: String, groupCol: String,
      textCol: String, budgetTokens: Int = 2048): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nTok = size(split(col(textCol), " ", -1)).cast("long")
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), col(groupCol), nTok.as("n_tokens"))
      .withColumn("start_offset",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin_id",
        floor(col("start_offset") / budgetTokens.toLong))
  }

  /** N-gram language-model quality score — the CCNet/KenLM filtering
    * signal (Wenzek et al. 2020) re-expressed as a corpus-trained bigram
    * model with add-one smoothing: each document scores the mean negative
    * log-likelihood (nats/bigram) of its token bigrams under
    * P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V). Low = phrasing the corpus
    * finds predictable; high = line noise — the tails are what a quality
    * gate cuts.
    *
    * Scale shape: the unigram/bigram count relations are the classic LM
    * shuffle (gram-keyed, map-side combined — same exchange class as
    * text_tfidf); scoring joins the doc's bigram occurrences against the
    * count relations on the gram key, then reduces to (doc_id, sum, n).
    * With `hashKeys` (default) both count relations and both scoring
    * joins key on xxhash64 — the bigram string exists only map-side,
    * pre-exchange, where the leading word is also extracted and hashed;
    * the score depends only on per-key counts, so it is hash-invariant
    * (see [[gramKey]]; equivalence pinned by CorpusOpsSpec).
    * Cross-engine float discipline: each term is StableRound'd to 6
    * decimals and summed as an EXACT decimal, so the only libm call
    * compared across engines is a single per-gram ln() at round-6
    * granularity (the math_funcs precedent), never an
    * accumulation-order-dependent double sum. */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
      hashKeys: Boolean = true): DataFrame = {
    // r17 opt: occ (the bigram extraction — the expensive text pass)
    // feeds the big aggregate AND the scoring join; uni (vocab-bounded)
    // feeds the vocab count AND the join. Materialized once each —
    // before, every consumer re-scanned the corpus and re-ran the
    // shingle/split explode (5 source scans in the plan, now 2).
    // occ is CORPUS-SIZED, so it persists WITH lineage (r18, ADVICE
    // r17): localCheckpoint pins blocks with no recompute path — an
    // executor loss mid-query fails the job at cluster scale — while
    // MEMORY_AND_DISK keeps the one-computation sharing and falls back
    // to the (shallow: scan+explode) lineage on block loss. Bounded
    // frames (uni: vocab rows) keep the cheaper localCheckpoint.
    val occ = docs.select(col(idCol), explode(
      graft.functions.ShingleArray.shingleOccurrences(col(textCol), 2))
      .as("__g0"))
      .select(col(idCol), gramKey(col("__g0"), hashKeys).as("g"),
        gramKey(substring_index(col("__g0"), " ", 1), hashKeys).as("w1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uni = docs.select(explode(split(col(textCol), " ")).as("__w0"))
      .select(gramKey(col("__w0"), hashKeys).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("cu"))
      .localCheckpoint()
    val vocab = uni.agg(count(lit(1)).as("v"))
    val big = occ.groupBy("g").agg(count(lit(1)).as("cb"))
    val scored = occ
      .join(big, "g")
      .join(uni, "w1")
      .crossJoin(broadcast(vocab))
      .select(col(idCol), StableRound.round6(
        log((col("cu") + col("v")).cast("double")
          / (col("cb") + lit(1)).cast("double")))
        .cast(DecimalType(27, 6)).as("nll"))
    val perDoc = scored.groupBy(idCol).agg(
      count(lit(1)).as("n_bigrams"), sum(col("nll")).as("s"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        StableRound.round6(col("s").cast("double") / col("n_bigrams"))
          .as("nll_per_bigram"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection via
    * Importance Resampling"): score every document by how much more
    * likely its hashed-token bag is under a TARGET distribution (the
    * high-quality / in-domain subset) than under the RAW corpus
    * distribution — the principled replacement for hand-tuned source
    * mixtures when assembling a pre-training corpus.
    *
    * Model: tokens hash into `buckets` bins via the engine-neutral
    * [[TextDedupe.tokenHash60]]; with add-one smoothing
    *   p_T(b) = (c_T(b)+1)/(N_T+B),  p_R(b) = (c_R(b)+1)/(N_R+B)
    * and log w(d) = Σ_{tok ∈ d} [ln p_T(b(tok)) − ln p_R(b(tok))].
    * Each per-bucket ln is StableRound'd to 6 decimals and the per-doc
    * sum runs as EXACT DECIMAL (the text_lm_score discipline), so the
    * only cross-engine libm surface is one ln per (bucket, side) at
    * round-6 granularity. `selected` = log w > 0 (decimal compare):
    * the doc reads more target-like than corpus-average.
    *
    * Scale shape: ONE token-level scan builds both count relations
    * (c_T via conditional sum inside the same map-side-combined
    * groupBy); the B-row score table broadcasts; the only exchanges
    * are B-row partial-agg combines and the (id, decimal) per-doc sum.
    * Document text never shuffles. B is a constant (default 256) —
    * driver/broadcast state is O(B), independent of corpus size.
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256): DataFrame =
    dsirApply(dsirScores(docs, textCol, isTarget, buckets),
      docs, idCol, textCol, buckets)

  /** Token-budget waterfilling across domains — the allocation step of a
    * mixture build: given per-domain token counts n_s and a total budget
    * T = (2·N) div 5 (40% of the corpus, integer), find the largest cap
    * c such that Σ min(n_s, c) ≤ T, allocate min(n_s, c) per domain, and
    * hand the integer remainder one token each to the smallest capped
    * domains first (deterministic (n_s, domain) total order). Exactly
    * Σ alloc = min(T, N). This is the closed-form integer form of the
    * water-filling mixtures DoReMi-style pipelines tune iteratively.
    *
    * Scale shape: the corpus pays ONE map-side-combined token-count agg;
    * everything after runs on the m-row domain relation (m = #domains,
    * tens — the single-partition windows are bounded by m, never by
    * corpus size; all arithmetic is integer so the oracle replay is
    * exact at any magnitude). */
  def tokenBudgetWaterfill(docs: DataFrame, textCol: String,
      domainCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs.groupBy(domainCol)
      .agg(sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"))
    val totals = counts.agg(sum("n_tokens").as("n_total"),
      count(lit(1)).as("m"))
    val w = Window.orderBy(col("n_tokens"), col(domainCol))
    val ranked = counts.crossJoin(broadcast(totals))
      .withColumn("t", expr("(2 * n_total) div 5"))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("pfx", sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint() // feeds the i*-row aggregate AND the final join
    // i* = the last rank whose full allocation is affordable for all
    // remaining domains; max(struct) is safe because i is ascending
    val star = ranked.agg(
      max(when(col("pfx") + col("n_tokens") * (col("m") - col("i"))
        <= col("t"), struct(col("i"), col("pfx"))))
        .as("st"))
      .select(coalesce(col("st.i"), lit(0L)).as("istar"),
        coalesce(col("st.pfx"), lit(0L)).as("pstar"))
    ranked.crossJoin(broadcast(star))
      .withColumn("cap", when(col("m") > col("istar"),
        expr("(t - pstar) div (m - istar)")).otherwise(lit(0L)))
      .withColumn("rem", col("t") - col("pstar")
        - col("cap") * (col("m") - col("istar")))
      .select(col(domainCol), col("n_tokens"),
        when(col("i") <= col("istar"), col("n_tokens"))
          .otherwise(col("cap") +
            when(col("i") - col("istar") <= col("rem"), lit(1L))
              .otherwise(lit(0L))).as("alloc_tokens"),
        (col("i") > col("istar")).as("capped"))
  }

  /** The FIT half of [[dsirWeights]]: the B-row (bucket, score) relation
    * with score = round6(ln p_T(b)) − round6(ln p_R(b)) as exact
    * DECIMAL(28,6). This is the frozen artifact a deployed DSIR filter
    * ships — O(B) rows regardless of corpus size. */
  def dsirScores(docs: DataFrame, textCol: String, isTarget: Column,
      buckets: Int = 256): DataFrame = {
    val tok = docs
      .select(isTarget.cast("long").as("__t"),
        explode(split(col(textCol), " ")).as("__w"))
      .select(col("__t"),
        pmod(TextDedupe.tokenHash60(col("__w")), lit(buckets.toLong))
          .as("b"))
    // counts feeds two consumers (totals and the score projection) —
    // materialize the B-row frame so the token scan runs exactly once
    // (the scaladoc's "ONE token scan" is a real claim, not a hope)
    val counts = tok.groupBy("b")
      .agg(count(lit(1)).as("cr"), sum(col("__t")).as("ct"))
      .localCheckpoint()
    val totals = counts.agg(sum("cr").as("nr"), sum("ct").as("nt"))
    def lnP(c: Column, n: Column): Column =
      StableRound.round6(log((c + 1).cast("double")
        / (n + buckets).cast("double"))).cast(DecimalType(27, 6))
    counts.crossJoin(broadcast(totals))
      .select(col("b"),
        (lnP(col("ct"), col("nt")) - lnP(col("cr"), col("nr"))).as("s"))
  }

  /** The APPLY half of [[dsirWeights]]: score a document frame against a
    * frozen (bucket, score) relation. Tokens absent from the fit corpus
    * hash to buckets the relation may lack — they contribute the
    * smoothing floor 0 via the left join's coalesce (both lns collapse
    * to the same +1/(N+B) term difference only when counts exist; an
    * unseen bucket's ratio is ln((0+1)/(Nt+B)) − ln((0+1)/(Nr+B)), a
    * CONSTANT the fit side never emits — so the apply side recomputes
    * nothing and treats missing buckets as weight-neutral, the
    * conservative deployment choice). */
  def dsirApply(scores: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, buckets: Int = 256): DataFrame = {
    val tok = docs
      .select(col(idCol),
        explode(split(col(textCol), " ")).as("__w"))
      .select(col(idCol),
        pmod(TextDedupe.tokenHash60(col("__w")), lit(buckets.toLong))
          .as("b"))
    val perDoc = tok.join(broadcast(scores), Seq("b"), "left")
      .groupBy(idCol).agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("s"), lit(BigDecimal(0)).cast(DecimalType(27, 6))))
          .as("lw"))
    perDoc.select(col(idCol), col("n_tokens"),
      StableRound.round6(col("lw").cast("double") / col("n_tokens"))
        .as("lw_per_token"),
      (col("lw") > 0).as("selected"))
  }

  /** Trained multinomial Naive-Bayes document classifier — the exact-math
    * relative of the fasttext-style domain/quality filters every corpus
    * build runs (CCNet's wiki-vs-crawl model, DataComp's quality
    * classifier): train per-class word log-odds on a LABELED subset,
    * score every document, argmax. Here the label column is supplied by
    * the caller (the registry entry uses `lang` with a seeded id split —
    * a real 5-class problem on this corpus); the same op is the
    * "reference-corpus vs crawl" quality gate when the label is a
    * curated/crawl flag.
    *
    * Model: add-one-smoothed multinomial NB.
    *   score(d, c) = round6(ln(n_docs_c / n_docs)) +
    *                 Σ_{w ∈ d} round6(ln((c(w,c) + 1) / (n_c + V)))
    * with c(w,c) = 0 for words the class never saw, V = train vocab
    * size, n_c = class token total. Every per-term ln is StableRound'd
    * to 6 decimals and summed as EXACT DECIMAL (the text_lm_score
    * discipline), so the only cross-engine libm comparison is a single
    * per-(word,class) ln at round-6 granularity; the argmax tie-break
    * is (score DESC, class ASC) via the min(struct(-score, class))
    * idiom — deterministic in both engines.
    *
    * Scale shape: the count relations are word-keyed map-side-combined
    * aggs (the tfidf exchange class, xxhash64-keyed by default — score
    * is hash-invariant because it depends only on per-key counts, the
    * [[gramKey]] argument); the (vocab × classes) log-prob relation is
    * BROADCAST (vocabulary-bounded, not corpus-bounded) so the scoring
    * pass is a map-side join over the token stream; per-(doc, class)
    * partial sums map-side combine to ≤ |docs|·|classes| exchange rows;
    * the argmax is one more combinable agg. The corpus text is scanned
    * twice (train counts, scoring) and never shuffled. Docs with no
    * tokens score prior-only; a class absent from the train split is
    * simply never predicted (it has no prior row) — both engines agree
    * by construction.
    *
    * Output: (idCol, pred, score, is_correct) — predicted class, its
    * round-6 total log-score, and pred == label for the accuracy audit
    * downstream gates read.
    *
    * Split as train → apply ([[nbTrainModel]] / [[nbApply]]) so the
    * frozen model scores arriving documents in the streaming face
    * without retraining per micro-batch; this composed form is
    * apply(train(...)) with the model frames localCheckpointed
    * (vocabulary-bounded), which also stops the batch plan re-deriving
    * the count aggregations once per model branch. */
  def nbClassify(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, isTrain: Column,
      hashKeys: Boolean = true): DataFrame =
    nbApply(nbTrainModel(docs, idCol, textCol, labelCol, isTrain,
      hashKeys), docs, idCol, textCol, labelCol, hashKeys)

  /** The frozen NB model: three vocabulary-bounded frames, materialized
    * (localCheckpoint) so apply-side plans — batch or per-micro-batch —
    * never re-derive the training aggregations. */
  case class NbModel(priors: DataFrame, classes: DataFrame,
      wstats: DataFrame)

  /** Train the [[nbClassify]] model on `docs.filter(isTrain)` — the
    * count relations are word-keyed map-side-combined aggs; all three
    * result frames are vocabulary- or class-bounded, never
    * corpus-bounded.
    *
    * Vocabulary-bounded is NOT constant-bounded: `wstats` is
    * vocab×classes rows and [[nbApply]] BROADCASTS it, so a web-scale
    * corpus (10⁸+ distinct terms) would blow the broadcast/driver
    * limit even though the relation is corpus-size-independent.
    * `maxVocab` is the standard fastText-filter escape: keep only the
    * top-N terms by total training count (ties broken on term key, so
    * the cap is deterministic); dropped terms score through each
    * class's `lw_unseen` default exactly like genuinely unseen words.
    * Default None preserves the exact uncapped model. */
  def nbTrainModel(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, isTrain: Column,
      hashKeys: Boolean = true, maxVocab: Option[Int] = None): NbModel = {
    val dec = DecimalType(27, 6)
    val trainDocs = docs.filter(isTrain)
    val trainTok = trainDocs.select(col(idCol), col(labelCol),
        explode(split(col(textCol), " ")).as("__w0"))
      .filter(length(col("__w0")) > 0)
      .select(col(labelCol), gramKey(col("__w0"), hashKeys).as("w"))
    // per-class word counts, class token totals, vocab size, doc priors
    val cwcAll = trainTok.groupBy(col(labelCol).as("cls"), col("w"))
      .agg(count(lit(1)).as("cnt"))
    val cwc = maxVocab match {
      case Some(n) =>
        val keep = cwcAll.groupBy("w").agg(sum("cnt").as("__tot"))
          .orderBy(col("__tot").desc, col("w")).limit(n).select("w")
        cwcAll.join(keep, "w")
      case None => cwcAll
    }
    // class token totals come from the UNCAPPED counts: dropped terms
    // keep their class mass (and classes whose whole vocabulary was
    // capped away stay present, with every token scoring lw_unseen);
    // only the smoothing denominator's V shrinks to the kept vocab
    val nc = cwcAll.groupBy("cls").agg(sum(col("cnt")).as("n_c"))
    val vocab = cwc.select("w").distinct().agg(count(lit(1)).as("v"))
    val priors = trainDocs.groupBy(col(labelCol).as("cls"))
      .agg(count(lit(1)).as("n_docs_c"))
      .crossJoin(broadcast(trainDocs.agg(count(lit(1)).as("n_docs"))))
      .select(col("cls"), StableRound.round6(
          log(col("n_docs_c").cast("double") / col("n_docs").cast("double")))
        .cast(dec).as("prior"))
    // (vocab × classes) log-probs, plus each class's unseen-word default
    val classStats = nc
      .crossJoin(broadcast(vocab))
      .select(col("cls"), col("n_c"), col("v"),
        StableRound.round6(log(lit(1.0) / (col("n_c") + col("v"))
          .cast("double"))).cast(dec).as("lw_unseen"))
    val wstats = cwc.join(classStats, "cls")
      .select(col("cls"), col("w"), StableRound.round6(
          log((col("cnt") + 1).cast("double")
            / (col("n_c") + col("v")).cast("double")))
        .cast(dec).as("lw"))
    NbModel(priors.localCheckpoint(),
      classStats.select("cls", "lw_unseen").localCheckpoint(),
      wstats.localCheckpoint())
  }

  /** Score `docs` under a frozen [[NbModel]] — the apply half of
    * [[nbClassify]], shared verbatim by the streaming face (stateless
    * per batch: broadcast model joins + combinable per-(doc, class)
    * sums + the argmax agg; no state store, no watermark). */
  def nbApply(model: NbModel, docs: DataFrame, idCol: String,
      textCol: String, labelCol: String,
      hashKeys: Boolean = true): DataFrame = {
    val dec = DecimalType(27, 6)
    val tok = docs.select(col(idCol),
        explode(split(col(textCol), " ")).as("__w0"))
      .filter(length(col("__w0")) > 0)
      .select(col(idCol), gramKey(col("__w0"), hashKeys).as("w"))
    // score: token stream × classes, seen words via the broadcast
    // log-prob relation, unseen via the class default — then one
    // map-side-combinable sum per (doc, class)
    val perDocClass = tok
      .crossJoin(broadcast(model.classes))
      .join(broadcast(model.wstats), Seq("cls", "w"), "left")
      .select(col(idCol), col("cls"),
        coalesce(col("lw"), col("lw_unseen")).as("t"))
      .groupBy(idCol, "cls").agg(sum(col("t")).as("s_tok"))
    // every (doc, class) pair exists even for token-less docs
    val scored = docs.select(col(idCol), col(labelCol))
      .crossJoin(broadcast(model.priors))
      .join(perDocClass, Seq(idCol, "cls"), "left")
      .select(col(idCol), col(labelCol), col("cls"),
        (col("prior") + coalesce(col("s_tok"), lit(0).cast(dec))).as("s"))
    // argmax with (score DESC, class ASC) tie-break: min(struct(-s, cls))
    scored.groupBy(col(idCol), col(labelCol))
      .agg(min(struct((col("s") * -1).as("ns"), col("cls"))).as("best"))
      .select(col(idCol),
        col("best.cls").as("pred"),
        (col("best.ns").cast("double") * -1).as("score"),
        (col("best.cls") === col(labelCol)).as("is_correct"))
  }

  /** Generation-versioned [[NbModel]] persistence — the retrain-cadence
    * half of a production classifier (the corpus lifecycle's
    * `gen=N` + atomic-rename precedent applied to models): each retrain
    * commits as `dir/gen=N` via staged write + one rename, so a
    * half-written model is never loadable and readers always see the
    * newest COMMITTED generation. [[graft.streaming.StreamOps.classifyVersionedBatch]]
    * binds each micro-batch to the generation it first scored under,
    * which is what makes a crash-replayed batch score replay-identically
    * even after a mid-stream swap. */
  def nbSaveModel(spark: org.apache.spark.sql.SparkSession,
      model: NbModel, dir: String, gen: Int): String = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(s"$dir/gen=$gen")
    // immutability check FIRST — a duplicate-generation call must fail
    // before paying the (potentially large) staged write, and must not
    // leave an orphaned gen=N.tmp behind
    require(!fs.exists(dst), s"$dst already committed — model " +
      "generations are immutable; retrain commits the NEXT gen")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/gen=$gen.tmp")
    fs.delete(tmp, true)
    try {
      model.priors.write.parquet(s"$tmp/priors")
      model.classes.write.parquet(s"$tmp/classes")
      model.wstats.write.parquet(s"$tmp/wstats")
      require(!fs.exists(dst), s"$dst committed concurrently — model " +
        "generations are immutable; retrain commits the NEXT gen")
      require(fs.rename(tmp, dst), s"rename $tmp -> $dst failed")
    } catch {
      case e: Throwable => fs.delete(tmp, true); throw e
    }
    dst.toString
  }

  /** Load a committed model generation (frames localCheckpointed like
    * a freshly-trained model, so per-batch apply plans stay flat). */
  def nbLoadModel(spark: org.apache.spark.sql.SparkSession,
      dir: String, gen: Int): NbModel =
    NbModel(
      spark.read.parquet(s"$dir/gen=$gen/priors").localCheckpoint(),
      spark.read.parquet(s"$dir/gen=$gen/classes").localCheckpoint(),
      spark.read.parquet(s"$dir/gen=$gen/wstats").localCheckpoint())

  /** Newest committed model generation under `dir` (in-flight `.tmp`
    * stages are invisible by construction), or -1 when none. */
  def nbLatestGen(spark: org.apache.spark.sql.SparkSession,
      dir: String): Int = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return -1
    fs.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("gen=") &&
          n.stripPrefix("gen=").forall(_.isDigit) =>
        n.stripPrefix("gen=").toInt }
      .maxOption.getOrElse(-1)
  }

  /** Deterministic seeded global shuffle + shard assignment — the
    * training-export layout step: a corpus is dealt into `numShards`
    * shard files in a reproducible pseudo-random order so every epoch
    * (and every re-run) streams the same permutation.
    *
    * Each doc gets a sort key from a two-round LCG scramble of
    * (id, seed) mod p = 1e9+7; shard = key mod numShards. Both rounds
    * are multiplications by 48271 (invertible mod p), so for ids < p the
    * key map is INJECTIVE — a true permutation, no ties, no collisions
    * to break. xxhash64 would be the production scramble at 100 TB;
    * the LCG is chosen because any engine can recompute it in SQL
    * (the oracle does), and a seeded 64-bit permutation is exactly as
    * shuffled as a training loader needs.
    *
    * Scale shape: assignment is MAP-ONLY (two fused multiplies per
    * row — no rand(), no zipWithIndex, no global sort, no window). The
    * only exchange anywhere is the shard repartition the write itself
    * requires, and [[writeShuffled]] sorts within partitions so each
    * shard file is internally key-ordered: a loader reading shard files
    * sequentially sees the permutation without ever materializing a
    * global position column. */
  def shuffleShard(docs: DataFrame, idCol: String, seed: Long,
      numShards: Int): DataFrame = {
    val p = 1000000007L
    val r1 = pmod(pmod(col(idCol), lit(p)) * 48271L + lit(seed), lit(p))
    val key = pmod(r1 * 48271L + lit(seed), lit(p))
    docs.withColumn("shuffle_key", key)
      .withColumn("shard", pmod(key, lit(numShards.toLong)).cast("int"))
  }

  /** Land the [[shuffleShard]] layout: one parquet directory per shard
    * (`shard=K/`), rows inside each file ascending by `shuffle_key`.
    * `repartition(shard)` gives each task whole shards; the sort leads
    * with `shard` so it satisfies the partitioned writer's required
    * ordering as a prefix — otherwise FileFormatWriter inserts its own
    * (unstable) sort on the partition column and the key order inside
    * each file is lost. */
  def writeShuffled(docs: DataFrame, idCol: String, seed: Long,
      numShards: Int, outDir: String): Unit =
    shuffleShard(docs, idCol, seed, numShards)
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "shuffle_key")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** Land the CORPUS-OF-RECORD layout: `numFiles` range partitions of
    * `idCol`, each file internally ascending by `idCol`, so a point or
    * range id predicate prunes at row-group level off parquet min/max
    * footers — the property the incremental lifecycle's candidate-text
    * fetch needs for O(candidates) verify I/O. [[writeShuffled]]'s
    * hash-shard layout CANNOT serve that fetch: shard membership is a
    * seeded permutation, so every shard file's id min/max spans nearly
    * the whole generation and no range ever prunes.
    *
    * The training-loader concern doesn't vanish — the seeded
    * `shuffle_key` column is retained in the data, so a loader (or the
    * `pipeline_train_export` materialization, which IS [[writeShuffled]])
    * re-derives the permutation order; the corpus of record just stops
    * paying its layout for it. */
  def writeIdClustered(docs: DataFrame, idCol: String, seed: Long,
      numFiles: Int, outDir: String): Unit =
    shuffleShard(docs, idCol, seed, numFiles).drop("shard")
      .repartitionByRange(numFiles, col(idCol))
      .sortWithinPartitions(idCol)
      .write.mode("overwrite").parquet(outDir)
}
