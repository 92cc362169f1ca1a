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
    * flagged, matching the reference rule.
    *
    * Returns one row per TRAINING doc: (id, n_hit_grams, contaminated).
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      isEval: Column, n: Int = 13): DataFrame = {
    val grams = graft.functions.ShingleArray.shingleArray(col(textCol), n)
    val evalGrams = docs.filter(isEval)
      .select(explode(grams).as("gram")).distinct()
    val train = docs.filter(!isEval)
    // grams are distinct per doc (set semantics), so the count is the
    // number of DISTINCT shared grams without a second dedup pass
    val hits = train
      .select(col(idCol), explode(grams).as("gram"))
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
    * (doc_id, metric) pairs reach the final join. At open-web scale the
    * gram grouping keys would be (doc_id, hash(gram)) like the dedupe
    * family; kept as strings here for oracle exactness.
    */
  def gopherRepetition(docs: DataFrame, idCol: String, textCol: String,
      top2Max: Double = 0.20, dup5Max: Double = 0.15): DataFrame = {
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
        .as("gram"))
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
    * documents. At open-web scale the join/group key is xxhash64(gram)
    * (16 bytes) rather than the string; kept as strings here for oracle
    * exactness (same convention as gopherRepetition). Docs shorter than
    * n tokens carry zero spans and pass through unflagged. */
  def substringDedupe(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 13): DataFrame = {
    val occ = docs.select(col(idCol), explode(
      graft.functions.ShingleArray.shingleOccurrences(col(textCol), n))
      .as("gram"))
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
    * Cross-engine float discipline: each term is StableRound'd to 6
    * decimals and summed as an EXACT decimal, so the only libm call
    * compared across engines is a single per-gram ln() at round-6
    * granularity (the math_funcs precedent), never an
    * accumulation-order-dependent double sum. */
  def lmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val occ = docs.select(col(idCol), explode(
      graft.functions.ShingleArray.shingleOccurrences(col(textCol), 2))
      .as("g"))
    val uni = docs.select(explode(split(col(textCol), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val big = occ.groupBy("g").agg(count(lit(1)).as("cb"))
    val scored = occ
      .join(big, "g")
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .join(uni.withColumnRenamed("w", "w1"), "w1")
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
}
