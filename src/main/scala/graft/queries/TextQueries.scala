package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{TextOps, TextDedupe}

/** Text-analysis + dedup-family queries over `documents` (SURVEY §2.9 and
  * the north-star LLM-pipeline tier).
  *
  * The shared DuckDB shingle CTE mirrors TextDedupe.shingles exactly
  * (3-token shingles, distinct per doc, docs under 3 tokens excluded).
  */
object TextQueries extends QueryPack {

  private[queries] def shingleCte(blocked: Boolean): String = {
    val langCol = if (blocked) ", lang" else ""
    val langJoin = if (blocked) " AND a.lang = b.lang" else ""
    s"""WITH tok AS (SELECT doc_id$langCol, string_split(text, ' ') AS ts
       |            FROM documents),
       |sh AS (SELECT DISTINCT doc_id$langCol, s FROM (
       |  SELECT doc_id$langCol, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
       |  FROM tok, unnest(range(1, len(ts) - 1)) AS t(i))),
       |sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY 1),
       |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
       |  FROM sh a JOIN sh b
       |    ON a.s = b.s$langJoin AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT d1, d2,
       |  CAST(round(CAST(inter / (s1.nsh + s2.nsh - inter) AS DECIMAL(27,12)), 4) AS DOUBLE) AS jaccard
       |FROM pairs p
       |JOIN sizes s1 ON p.d1 = s1.doc_id
       |JOIN sizes s2 ON p.d2 = s2.doc_id
       |WHERE CAST(round(CAST(inter / (s1.nsh + s2.nsh - inter) AS DECIMAL(27,12)), 4) AS DOUBLE) >= 0.5""".stripMargin
  }

  // Shared BM25 setup for the lexical-retrieval entries (text_bm25_topk,
  // stream_bm25_score, vec_hybrid_rrf): docs 0-2 act as the query set
  // (their distinct token sets), docs >= 3 as the corpus.
  private[queries] def bm25QueryTokens(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        explode(TextOps.tokens(col("text"))).as("token"))
      .distinct()

  private[queries] def bm25Corpus(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.filter(col("doc_id") >= 3)

  /** DuckDB replay of TextOps.bm25 over the shared query/corpus split:
    * CTE chain ending in `lex(query_id, doc_id, score6, n_terms)`.
    * Constants are written as the same double ARITHMETIC the Scala side
    * compiles ((1.2 + 1.0), (1.0 - 0.75)) so every IEEE op matches; each
    * per-term score snaps to round6 micro-units before the integer sum
    * (the maxsim discipline — summation order can never matter). */
  private[queries] val bm25LexCte: String = {
    val term = graft.StableRound.sql6(
      "ln(1.0 + (st.n - dfr.df + CAST(0.5 AS DOUBLE)) / " +
        "(dfr.df + CAST(0.5 AS DOUBLE))) * " +
      "(tf.tf * (CAST(1.2 AS DOUBLE) + 1.0)) / " +
      "(tf.tf + CAST(1.2 AS DOUBLE) * ((1.0 - CAST(0.75 AS DOUBLE)) + " +
        "CAST(0.75 AS DOUBLE) * dl.dl / st.avgdl))")
    s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id >= 3),
       |qt AS (SELECT DISTINCT doc_id AS query_id,
       |    unnest(string_split(text, ' ')) AS token
       |  FROM documents WHERE doc_id < 3),
       |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
       |    AS dl FROM corpus),
       |st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |  FROM corpus),
       |qv AS (SELECT DISTINCT token FROM qt),
       |tokq AS (SELECT t.doc_id, t.token FROM tok t JOIN qv USING (token)),
       |tf AS (SELECT doc_id, token, count(*) AS tf FROM tokq GROUP BY 1, 2),
       |dfr AS (SELECT token, count(DISTINCT doc_id) AS df
       |  FROM tokq GROUP BY 1),
       |term AS (SELECT qt.query_id, tf.doc_id,
       |    CAST(floor($term * 1000000 + 0.5) AS BIGINT) AS s6
       |  FROM tf JOIN qt USING (token) JOIN dfr USING (token)
       |    JOIN dl USING (doc_id) CROSS JOIN st),
       |lex AS (SELECT query_id, doc_id, CAST(sum(s6) AS BIGINT) AS score6,
       |    CAST(count(*) AS BIGINT) AS n_terms
       |  FROM term GROUP BY 1, 2)""".stripMargin
  }

  def queries: Map[String, Q] = Map(
    "text_tokenize" -> ((s, d) =>
      TextOps.tokenize(Tables.documents(s, d), "doc_id", "text")),

    "text_stats" -> ((s, d) =>
      TextOps.textStats(Tables.documents(s, d), "doc_id", "text")),

    "text_quality" -> ((s, d) =>
      TextOps.qualityScore(Tables.documents(s, d), "doc_id", "text")),

    // Automated Readability Index per document — the grade-level screen
    // a curation pipeline pairs with the quality score (ARI is the one
    // classic readability formula with NO syllable model: pure
    // character/word/sentence counts, so it is exactly computable and
    // cross-engine stable). All three counts are integers from the same
    // regex family both engines share; the formula assembly is one
    // per-row double expression under the round6 bridge. Pure map-only
    // scan — no shuffle, codegen'd end-to-end, trivially 100 TB-safe.
    "text_readability" -> ((s, d) => {
      val words = greatest(lit(1),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))))
        .cast("long")
      val sents = greatest(lit(1),
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))))
        .cast("long")
      val chars = length(regexp_replace(col("text"), "\\s", ""))
        .cast("long")
      Tables.documents(s, d).select(
        col("doc_id"), chars.as("n_chars"), words.as("n_words"),
        sents.as("n_sentences"),
        graft.StableRound.round6(
          lit(4.71) * (chars.cast("double") / words.cast("double"))
            + lit(0.5) * (words.cast("double") / sents.cast("double"))
            - lit(21.43)).as("ari"))
    }),

    // the composed curation pass: lang → length bounds → quality →
    // exact-dup, first failing rule wins (thresholds sized so every rule
    // fires on this corpus)
    "text_curate" -> ((s, d) =>
      TextOps.curate(Tables.documents(s, d), "doc_id", "text",
        minTokens = 20, maxTokens = 90, minQuality = 0.58)),

    // the END-TO-END training-data report: curation verdicts + PII
    // accounting + token budget of the surviving corpus, as ONE
    // aggregation pass over the curate output (conditional aggregates —
    // no second scan, no driver loop). The per-reason columns are the
    // numbers every corpus-build report leads with.
    "pipeline_curate_report" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cur = TextOps.curate(docs, "doc_id", "text",
        minTokens = 20, maxTokens = 90, minQuality = 0.58)
      val nPii = regexp_count(col("text"), lit(TextOps.EmailRe)) +
        regexp_count(col("text"), lit(TextOps.PhoneRe))
      docs.join(cur, "doc_id").agg(
        count(lit(1)).as("n_input"),
        count(when(col("keep"), 1)).as("n_kept"),
        count(when(col("reject_reason") === "lang", 1)).as("n_lang"),
        count(when(col("reject_reason") === "too_short", 1)).as("n_too_short"),
        count(when(col("reject_reason") === "too_long", 1)).as("n_too_long"),
        count(when(col("reject_reason") === "quality", 1)).as("n_quality"),
        count(when(col("reject_reason") === "duplicate", 1)).as("n_duplicate"),
        sum(when(col("keep"), size(split(col("text"), " ")))
          .otherwise(0)).as("total_tokens_kept"),
        sum(when(col("keep"), nPii).otherwise(0)).as("n_pii_redacted"))
    }),

    // token counting two ways: whitespace and a BPE-ish pre-tokenizer
    // regex (GPT-2 style: contraction suffixes | letter runs | digit runs
    // | punctuation runs, each optionally space-prefixed). Pure per-row
    // expressions — no shuffle, fully codegen'd scan.
    "text_token_count" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"),
          lit(0))).cast("long").as("n_bpe_tokens"))),

    "text_tfidf" -> ((s, d) =>
      TextOps.tfidf(Tables.documents(s, d), "doc_id", "text")),

    // KEYWORD EXTRACTION: top-3 tokens per document by tf-idf — the
    // per-doc salient-terms tagger built on the tfidf relation. Ranking
    // is (tfidf DESC, token ASC): tfidf is already round6'd (the
    // cross-engine bridge) and the token tiebreak totalizes the order.
    // Spark's WindowGroupLimit pushes the rk<=3 filter below the
    // exchange — each map task forwards ≤3 rows per doc, so at 100 TB
    // the shuffle carries O(docs·k), not the full (doc, token) relation.
    "text_keywords_tfidf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      TextOps.tfidf(Tables.documents(s, d), "doc_id", "text")
        .withColumn("rk", row_number().over(Window.partitionBy("doc_id")
          .orderBy(col("tfidf").desc, col("token"))))
        .filter(col("rk") <= 3)
    }),

    // BM25 LEXICAL RETRIEVAL (Okapi, Lucene idf; k1=1.2, b=0.75): top-15
    // corpus docs per query, queries = docs 0-2's token sets. The other
    // half of hybrid search next to vec_cosine_topk_batch — tf-idf ranks
    // TERMS within a doc; BM25 ranks DOCS for a query, with dl/avgdl
    // length normalization and tf saturation. Per-term scores snap to
    // round6 micro-units before the per-doc integer sum, so the ranking
    // order is engine-exact; the rk<=15 cut rides WindowGroupLimit (each
    // map task forwards <=15 rows per query). Scale: corpus bodies are
    // scanned once map-side; shuffles carry only (query, doc, matched-
    // term) rows; df/stats/queries broadcast (frozen-artifact split —
    // the streaming face reuses them verbatim).
    "text_bm25_topk" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      TextOps.bm25(bm25Corpus(docs), "doc_id", "text",
          bm25QueryTokens(docs))
        .withColumn("rk", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("score6").desc, col("doc_id"))).cast("long"))
        .filter(col("rk") <= 15)
        .select("query_id", "doc_id", "score6", "n_terms", "bm25", "rk")
    }),

    // edit-distance scalar tier — the fuzzy-matching primitive (title /
    // name matching). Distance to the reversed head is a deterministic
    // self-contained exercise of the function; norm_sim is the usual
    // 1 − d/max(len) similarity.
    "scalar_fuzzy_distance" -> ((s, d) => {
      val head = substring(col("text"), 1, 30)
      Tables.documents(s, d).select(col("doc_id"),
        levenshtein(head, reverse(head)).as("lev_rev"),
        graft.StableRound.round6(lit(1.0) -
          levenshtein(head, reverse(head)).cast("double") /
            greatest(length(head), lit(1)))
          .as("norm_sim"))
    }),

    // fuzzy near-pairs on document HEADS: the short-string (title/name)
    // fuzzy-join regime, where BLOCKING is the scale lever and
    // within-block verification cost is the second one.
    // Block = (language, 2-char head prefix) — standard prefix blocking:
    // candidates must agree on the first two characters, which collapses
    // the pair space from |lang block|² to Σ|prefix block|² (measured
    // 90 s → ~1 s at sf0.1) at the declared recall cost of missing pairs
    // whose edits touch the first two characters; the oracle blocks
    // identically, so the check is exact for the declared join. Length
    // gate + levenshtein ≤ 5 over 40-char heads verify exactly.
    // Within a block, candidates pass a LOSSLESS q-gram bitmask gate
    // before any edit distance runs: each side carries a 128-bucket
    // bigram signature (two longs, computed map-side in the scan stage
    // by the codegen'd GramMask), and lev ≤ 5 forces
    // popcount(mask_a & ~mask_b) ≤ q·k = 10 per half in both directions
    // (gram-count filtering — see GramMask.scala for the proof sketch).
    // Unrelated same-prefix heads differ in ~23 of 128 buckets, so the
    // O(len·k) banded levenshtein now runs only on the near-match tail
    // instead of every block-quadratic candidate.
    "dedupe_fuzzy_pairs" -> ((s, d) => {
      import graft.functions.GramMask.{gramMaskLo, gramMaskHi}
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          substring(col("text"), 1, 40).as("head"))
        .withColumn("blk", substring(col("head"), 1, 2))
        .withColumn("glo", gramMaskLo(col("head")))
        .withColumn("ghi", gramMaskHi(col("head")))
      val a = docs.toDF("d1", "lang", "h1", "blk", "glo1", "ghi1")
      val b = docs.toDF("d2", "lang2", "h2", "blk2", "glo2", "ghi2")
      // PREDICATE ORDER IS LOAD-BEARING: the gate must be a filter ON
      // the join output, stated BEFORE the lev filter — Catalyst
      // collapses both into the join condition preserving conjunct
      // order, so the ~40ns bitmask gate short-circuits the ~100µs
      // levenshtein for the ~98% of candidates it rejects. Putting the
      // gate inside the join(...) condition instead lets the collapsed
      // lev conjunct land FIRST and re-runs levenshtein on every
      // candidate (measured 38.8 vs 5.2 s at sf1 — PLANS.md §24).
      a.join(b, col("lang") === col("lang2") && col("blk") === col("blk2") &&
          col("d1") < col("d2") &&
          abs(length(col("h1")) - length(col("h2"))) <= 5)
        .filter(
          bit_count(col("glo1").bitwiseAND(bitwise_not(col("glo2")))) +
            bit_count(col("ghi1").bitwiseAND(bitwise_not(col("ghi2")))) <= 10 &&
          bit_count(col("glo2").bitwiseAND(bitwise_not(col("glo1")))) +
            bit_count(col("ghi2").bitwiseAND(bitwise_not(col("ghi1")))) <= 10)
        // banded levenshtein (threshold arg): the verify bails once edit
        // distance exceeds 5 — O(len·k) per survivor instead of O(len²),
        // exact for every kept pair (the -1 over-threshold sentinel is
        // filtered)
        .withColumn("lev", levenshtein(col("h1"), col("h2"), 5))
        .filter(col("lev").between(0, 5))
        .select("d1", "d2", "lev")
    }),

    // per-language token-distribution Shannon entropy — the diversity /
    // degeneracy signal (a collapsed crawl slice shows as an entropy
    // drop). H = ln N − (Σ c·ln c)/N over token counts c. The Σ term
    // follows the lm_score recipe: each ln is boundary-stabilized to 6
    // decimals and the products are summed as EXACT DECIMAL, so the
    // aggregate is summation-order-independent across engines. Two agg
    // exchanges, both map-side combined; nothing holds the vocabulary.
    "text_entropy" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      Tables.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .groupBy("lang", "w").agg(count(lit(1)).as("c"))
        .groupBy("lang").agg(
          sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_vocab"),
          sum((col("c") * graft.StableRound.round6(log(col("c").cast("double")))
            .cast(DecimalType(27, 6))).cast(DecimalType(38, 6))).as("s"))
        .select(col("lang"), col("n_tokens"), col("n_vocab"),
          graft.StableRound.round6(
            graft.StableRound.round6(log(col("n_tokens").cast("double")))
              - col("s").cast("double") / col("n_tokens"))
            .as("entropy"))
    }),

    // lexical-richness report per (lang, source): type-token ratio +
    // hapax-legomena rate — the crawl-quality signal that catches
    // template/boilerplate collapse (TTR craters when one page is
    // cloned across a source). Same two-level agg shape as
    // text_entropy; the ratios divide two exact counts (single IEEE
    // division) under the decimal bridge. At open-web scale the
    // (lang, source, token) key hashes to 8 bytes exactly like the
    // gram shuffles (count-only downstream ⇒ hash-invariant).
    // TOKEN BURSTINESS (variance-to-mean ratio of per-doc counts) for
    // the top-20 corpus tokens — Church & Gale's content-vs-function
    // word discriminant: function words spread evenly (VMR ≈ 1,
    // Poisson), content/boilerplate words clump into few docs
    // (VMR ≫ 1) — a template-detection signal no frequency rank alone
    // gives. The moments run over ALL N corpus docs — docs without
    // the token contribute zero counts (they add nothing to Σx/Σx²,
    // only to N), which is what makes a token appearing once in each
    // of 3 docs out of 10k read as RARE, not Poisson-flat (ADVICE
    // r12: the occurrence-conditional VMR can't see that). Two
    // map-side-combined aggs over the exploded token stream, the doc
    // total a 1-row broadcast, then a distributed TakeOrdered picks
    // the top 20 — the vocab never sorts globally and the corpus
    // never re-shuffles.
    "text_burstiness" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val nTot = docs.agg(count(lit(1)).as("n_corpus"))
      val st = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("w", "doc_id").agg(count(lit(1)).as("x"))
        .groupBy("w").agg(count(lit(1)).as("n_docs"),
          sum("x").as("total"), sum(col("x") * col("x")).as("sq"))
      def D(c: org.apache.spark.sql.Column) = c.cast("double")
      val mean = D(col("total")) / D(col("n_corpus"))
      val vr = (D(col("sq")) - D(col("total")) * D(col("total"))
        / D(col("n_corpus"))) / (D(col("n_corpus")) - 1)
      st.orderBy(col("total").desc, col("w")).limit(20)
        .crossJoin(broadcast(nTot))
        .select(col("w").as("token"), col("n_docs"), col("total"),
          col("n_corpus"),
          graft.StableRound.round6(mean).as("mean_per_doc"),
          when(col("n_corpus") > 1, graft.StableRound.round6(vr / mean))
            .as("vmr"))
    }),

    "text_ttr" -> ((s, d) => {
      val perTok = Tables.documents(s, d)
        .select(col("lang"), col("source"),
          explode(split(col("text"), " ")).as("w"))
        .groupBy("lang", "source", "w").agg(count(lit(1)).as("c"))
      perTok.groupBy("lang", "source").agg(
          sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("lang"), col("source"), col("n_tokens"),
          col("n_types"), col("n_hapax"),
          graft.StableRound.round6(
            col("n_types").cast("double") / col("n_tokens"))
            .as("ttr"),
          graft.StableRound.round6(
            col("n_hapax").cast("double") / col("n_types"))
            .as("hapax_rate"))
    }),

    // top-5 trigrams per language by DOCUMENT frequency — the corpus
    // vocabulary report. Reuses the dedupe tier's codegen'd shingle
    // kernel (per-doc distinct grams ⇒ count(*) = doc frequency). The
    // doc-frequency agg is map-side combined; the final per-lang top-k
    // window sees only (lang, gram, df) rows — the bounded vocabulary,
    // never the corpus.
    "text_ngram_topk" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.ops.TextDedupe.shingleIndex(
          Tables.documents(s, d), "doc_id", "text", carryCols = Seq("lang"))
        .groupBy("lang", "shingle").agg(count(lit(1)).as("df"))
        .withColumn("rk", row_number().over(Window.partitionBy("lang")
          .orderBy(col("df").desc, col("shingle"))))
        .filter(col("rk") <= 5)
        .select("lang", "shingle", "df", "rk")
    }),

    // PII redaction — the pre-training scrub pass. The corpus carries no
    // real PII, so deterministic synthetic PII (an email + phone derived
    // from doc_id) is injected first; the scrub must find and redact
    // exactly those. Map-only column expressions.
    "text_pii_scrub" -> ((s, d) =>
      TextOps.scrubPii(
        Tables.documents(s, d).select(col("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or +1-555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
            .as("text")),
        "doc_id", "text")
        .select(col("doc_id"), expr("right(scrubbed, 48)").as("tail"),
          col("n_pii"))),

    "text_lang_id" -> ((s, d) =>
      TextOps.langId(Tables.documents(s, d), "doc_id", "text")),

    "text_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"))),

    // exact duplicate groups by full text
    // exact dedupe, hash-groupBy: the shuffle key is (length, xxhash64)
    // of the text, NOT the text itself — at 100 TB shuffling full
    // document bodies as group keys is the bottleneck; 8+8 bytes per row
    // is not. Collision would need equal length AND equal 64-bit hash
    // (P < 1e-12 at billions of docs) — same grouping as the oracle's
    // GROUP BY text in every realizable case.
    "dedupe_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(length(col("text")), xxhash64(col("text")))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
        .select("keep_id", "n")),

    // normalized-exact tier: lowercase, trim, collapse whitespace
    "dedupe_exact_norm" -> ((s, d) => {
      val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
      Tables.documents(s, d)
        .groupBy(length(norm), xxhash64(norm))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
        .select("keep_id", "n")
    }),

    // exact n-gram Jaccard pairs, language-blocked. broadcastDfreq: this
    // corpus has a bounded shingle vocabulary (~27k distinct at sf0.1), so
    // the document-frequency table broadcasts and the inverted index is
    // shuffled once instead of twice; open-vocabulary corpora keep the
    // default merge-join plan.
    "dedupe_near_ngram" -> ((s, d) =>
      TextDedupe.ngramJaccardPairs(Tables.documents(s, d),
        "doc_id", "text", threshold = 0.5, blockCol = Some("lang"),
        broadcastDfreq = true)),

    // asymmetric containment |A∩B|/|A| ≥ 0.8 — the doc-in-doc detector
    // (quotes/boilerplate) that Jaccard is blind to; asymmetric prefix
    // filter, exact verify (TextDedupe.containmentPairs)
    "dedupe_containment" -> ((s, d) =>
      TextDedupe.containmentPairs(Tables.documents(s, d),
        "doc_id", "text", threshold = 0.8, blockCol = Some("lang"),
        broadcastDfreq = true)),

    // threshold-tuning report: the near-dup pair relation histogrammed
    // by jaccard band — the number every dedupe rollout decision reads
    // ("how many more pairs does dropping the threshold 0.1 admit?").
    // Reuses the prefix-filtered pair join; the banding is a map-only
    // projection of the (already round-4) jaccard, mirrored exactly.
    "dedupe_threshold_report" -> ((s, d) =>
      TextDedupe.ngramJaccardPairs(Tables.documents(s, d),
          "doc_id", "text", threshold = 0.5, blockCol = Some("lang"),
          broadcastDfreq = true)
        .groupBy((floor(col("jaccard") * 10) / 10).as("j_band"))
        .agg(count(lit(1)).as("n_pairs"))),

    // collocation mining: top-20 bigrams by pointwise mutual
    // information (min support 5). All counts are exact integers; the
    // PMI argument is one division of two exact sub-2^53 long products,
    // and the single ln is compared at round-6 granularity (the
    // math_funcs/lm_score precedent) — so the ranking is engine-exact,
    // ties broken on the gram string.
    "text_cooccurrence_pmi" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(split(col("text"), " ").as("ts"))
      val bg = tok.filter(size(col("ts")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(ts)-1), " +
          "i -> concat(element_at(ts, i), ' ', element_at(ts, i+1)))"))
          .as("g"))
      // r17 opt: the count relations materialize once (they are the
      // Zipf-bounded vocab tables), and the grand totals derive from
      // them algebraically (n1 = Σcu, n2 = Σcb — identical values) —
      // before, n1/n2 each re-scanned and re-exploded the corpus and
      // cu/cb re-ran per consumer: 5 corpus passes, now 2 (unigram +
      // bigram extraction once each)
      val cb = bg.groupBy("g").agg(count(lit(1)).as("cb"))
        .localCheckpoint()
      val cu = tok.select(explode(col("ts")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cu"))
        .localCheckpoint()
      val n1 = cu.agg(sum("cu").as("n1"))
      val n2 = cb.agg(sum("cb").as("n2"))
      cb.filter(col("cb") >= 5)
        .withColumn("w1", split(col("g"), " ")(0))
        .withColumn("w2", split(col("g"), " ")(1))
        .join(cu.withColumnRenamed("w", "w1")
          .withColumnRenamed("cu", "cu1"), "w1")
        .join(cu.withColumnRenamed("w", "w2")
          .withColumnRenamed("cu", "cu2"), "w2")
        .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
        // operands cast to double BEFORE multiplying: the integer product
        // cb·n1² wraps Long silently past ~3e9 total tokens (and errors
        // on the DuckDB side); IEEE double products round identically on
        // both engines, so the ratio stays bit-identical cross-engine
        .select(col("g"), col("cb"),
          graft.StableRound.round6(log(
            (col("cb").cast("double") * col("n1").cast("double") *
              col("n1").cast("double")) /
            (col("n2").cast("double") * col("cu1").cast("double") *
              col("cu2").cast("double")))).as("pmi"))
        .orderBy(col("pmi").desc, col("g"))
        .limit(20)
    }),

    // MinHash+LSH candidates verified exactly — matches the global exact
    // oracle because recall at s>=0.95 with b=8,r=4 is 1-3e-8 (see op doc)
    "dedupe_minhash_lsh" -> ((s, d) =>
      TextDedupe.minhashLshPairs(Tables.documents(s, d),
        "doc_id", "text", threshold = 0.5)),

    // SimHash hamming pairs. The token hash is the engine-neutral
    // two-prime polynomial (TextDedupe.tokenHash60), so the WHOLE
    // pipeline — token hash, 60-bit voting, hamming filter — has a full
    // DuckDB oracle (the banding candidate generation is pigeonhole-
    // exact at hamming <= 3, so Spark's output equals brute-force
    // all-pairs and the oracle can be the quadratic form).
    "dedupe_simhash" -> ((s, d) =>
      TextDedupe.simhashPairs(Tables.documents(s, d),
        "doc_id", "text", maxHamming = 3)),

    // BOILERPLATE DETECTION — the C4/RefinedWeb-style filter: a 3-gram
    // shingle occurring in ≥ 5% of documents is boilerplate (navigation,
    // license headers, templating), and each doc reports what fraction
    // of its distinct shingles is boilerplate — the per-doc signal a
    // curation pass thresholds. Two aggregations over the shared
    // shingle index (doc-frequency, then per-doc counts); the heavy set
    // is df-filtered FIRST (≤ n_docs/⌈0.05·n⌉ ≈ 20·(1/0.05) shingles
    // can exceed any fixed df bound — the filtered relation is tiny and
    // broadcast), so the corpus-sized side joins against a small build.
    // At 100 TB the join key would be xxhash64(shingle) to shrink
    // shuffle width; here it stays the string for byte-exact oracle
    // parity. Threshold is RELATIVE (ceil of 5% of the doc count), so
    // the semantics are corpus-size-stable.
    "text_boilerplate_ngrams" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sh = TextDedupe.shingleIndex(docs, "doc_id", "text")
        .localCheckpoint()
      val nd = docs.agg(count(lit(1)).as("n_docs"))
      val heavy = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nd))
        .filter(col("df") >= ceil(col("n_docs") * 0.05))
        .select(col("shingle"), lit(1L).as("hit"))
      sh.join(broadcast(heavy), Seq("shingle"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          coalesce(sum("hit"), lit(0L)).as("n_boiler"))
        .select(col("doc_id"), col("n_shingles"), col("n_boiler"),
          graft.StableRound.round6(col("n_boiler").cast("double")
            / col("n_shingles").cast("double")).as("boiler_share"))
    }),

    // ZIPF FIT over the token frequency distribution — the
    // language-health screen (natural text slopes ≈ −1; synthetic or
    // boilerplate-heavy corpora flatten or steepen). Log-log OLS over
    // the TOP-100 tokens only (rank by count desc, token asc — fully
    // deterministic): the top-k is a distributed TakeOrdered (never a
    // vocabulary-wide single-partition window), the 100-row regression
    // relation is driver-trivial at any corpus size, and each
    // ln(rank)/ln(freq) product term snaps to the round6 grid and sums
    // as fixed-point longs — the libm-ln-at-1e-6 discipline every
    // drift entry uses. Output also carries the full vocabulary size.
    "text_zipf_fit" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val freqs = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val vocab = freqs.agg(count(lit(1)).as("vocab"))
      val top = freqs.orderBy(col("cnt").desc, col("tok")).limit(100)
      val rk = graft.ops.Prefix.thetaRank(top.localCheckpoint(),
        Seq(("cnt", true), ("tok", false)), "r")
      def s6(c: org.apache.spark.sql.Column) =
        floor(graft.StableRound.round6(c) * 1e6 + 0.5).cast("long")
      val x = log(col("r").cast("double"))
      val y = log(col("cnt").cast("double"))
      val sums = rk.select(s6(x).as("x6"), s6(y).as("y6"),
          s6(x * y).as("xy6"), s6(x * x).as("xx6"), s6(y * y).as("yy6"))
        .agg(count(lit(1)).as("k"), sum("x6").as("sx"), sum("y6").as("sy"),
          sum("xy6").as("sxy"), sum("xx6").as("sxx"), sum("yy6").as("syy"))
      def D(c: org.apache.spark.sql.Column) = c.cast("double") / 1e6
      val kD = col("k").cast("double")
      val covn = kD * D(col("sxy")) - D(col("sx")) * D(col("sy"))
      val varx = kD * D(col("sxx")) - D(col("sx")) * D(col("sx"))
      val vary = kD * D(col("syy")) - D(col("sy")) * D(col("sy"))
      sums.crossJoin(broadcast(vocab))
        .select(col("vocab").cast("long").as("vocab_size"),
          col("k").cast("long").as("k_fit"),
          graft.StableRound.round6(covn / varx).as("slope"),
          graft.StableRound.round6((D(col("sy")) - covn / varx * D(col("sx")))
            / kD).as("intercept"),
          graft.StableRound.round6(covn * covn / (varx * vary)).as("r2"))
    }),

    // RAG / context-window prep: fixed-size token chunks with overlap
    // (window 32 tokens, stride 24 ⇒ 8-token overlap) — see
    // TextOps.chunkOverlap for the chunk law both engines replay.
    "text_chunk_overlap" -> ((s, d) =>
      TextOps.chunkOverlap(Tables.documents(s, d), "doc_id", "text",
        window = 32, stride = 24)),

    // THE WEB-CRAWL FRONT DOOR (r16 What's-missing #2): main-content
    // extraction from HTML — the stage every CCNet/RefinedWeb-style
    // corpus build runs BEFORE text_curate. The mm_decode_image
    // fixture discipline: each document is wrapped into a full
    // synthetic page (title, style, script with hostile < > && inside,
    // nav bar, a mid-article related-links box, footer — all chrome
    // built from LINKS so the link-density rule, not position, must
    // remove it; the body text is HTML-escaped on the way in), so the
    // closed-form expected extract is the whitespace-normalized
    // original text + the planted trailing paragraph, which the oracle
    // states DIRECTLY without parsing any HTML — the extractor is
    // verified end-to-end (escape → wrap → extract ≡ normalize).
    // Map-only column expressions; composes into the curation cascade
    // (TextOpsSpec pins htmlMainText → curate ≡ curate on plain text).
    "text_html_extract" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .select(col("doc_id"),
          TextOps.htmlTitle(syntheticPageHtml).as("title"),
          TextOps.htmlMainText(syntheticPageHtml).as("main_text"))),

    // Unicode canonicalization — the normalize pass that runs right
    // after text_html_extract and BEFORE any hashing/dedupe stage
    // (decomposed accents and zero-width characters make identical
    // sentences hash apart). Fixture discipline: every document is
    // wrapped with all four dirt classes (NFC-decomposed accents,
    // ZWSP, NBSP, whitespace runs), so the oracle states the expected
    // clean text in CLOSED FORM (composed é = chr(233)) without calling
    // any normalizer — decompose → wrap → normalize ≡ closed form
    // verifies the chain end to end. Map-only column expressions; the
    // NFC step is the native codegen'd NfcNormalize expression (already-
    // normalized text returns without copying — the clean-corpus path).
    "text_normalize_unicode" -> ((s, d) => {
      val dirty = concat(
        lit("Cafe\u0301\u200B \u00A0 "), col("text"),
        lit("  fin de ligne\u0301 "))
      Tables.documents(s, d).select(col("doc_id"),
        length(dirty).as("n_chars_dirty"),
        TextOps.normalizeUnicode(dirty).as("clean_text"))
        .withColumn("n_chars_clean", length(col("clean_text")))
    }),

    // chunk-level (block) dedupe accounting: disjoint 32-token blocks
    // (window = stride), a block is "duplicated" when its text occurs in
    // ≥2 DISTINCT docs — the RefinedWeb-style sub-document screen that
    // catches near-dup docs sharing long aligned spans (27 such blocks
    // in this corpus despite zero doc-level exact dups). Alignment
    // tradeoff by design: block hashing only sees stride-aligned repeats
    // (that's what makes it one scan + one 8-byte-key shuffle);
    // unaligned spans are dedupe_substring's gram-keyed territory.
    // Scale shape: chunks carry tokenHash60 LONGS into the groupBy and
    // the count join-back — strings never shuffle.
    "dedupe_chunks" -> ((s, d) => {
      val ch = TextOps.chunkOverlap(Tables.documents(s, d), "doc_id",
          "text", window = 32, stride = 32)
        .select(col("doc_id"),
          TextDedupe.tokenHash60(col("chunk_text")).as("h"))
        .localCheckpoint() // count + join-back: hash each chunk ONCE
      val counts = ch.groupBy("h")
        .agg(count_distinct(col("doc_id")).as("nd"))
      ch.join(counts, "h").groupBy("doc_id").agg(
          count(lit(1)).as("n_chunks"),
          count(when(col("nd") >= 2, 1)).as("n_dup_chunks"))
        .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
          graft.StableRound.round4(col("n_dup_chunks").cast("double")
            / col("n_chunks").cast("double")).as("dup_chunk_ratio"))
    }),

    // STREAMING incremental chunk dedupe — the sub-document twin of
    // stream_incremental_dedupe: the corpus arrives in two doc_id-ordered
    // drops; each micro-batch's blocks are probed against the persisted
    // (hash, first_doc) index plus batch-mates, a doc is kept iff fewer
    // than half its blocks were already observed on a lower-id doc. The
    // integer law tiles for any doc_id-ordered batching, so the oracle is
    // the ONE-SHOT batch SQL over the whole documents table — the live
    // dedupe is pinned to answer like the offline pass.
    // the COMPOSED cleanup every corpus build actually runs, as one
    // call with a per-stage attrition report: exact-normalized dedupe
    // (keep min id per normalized text) → chunk/block dedupe (drop docs
    // with ≥ half their 32-token blocks observed on a lower-id
    // survivor) → near-dup dedupe (drop the higher id of any surviving
    // lang-blocked pair with 3-shingle Jaccard ≥ 0.5, exact-verified).
    // Each stage runs ONLY on the previous stage's survivors — the
    // cascade order (cheap exact → mid block → expensive near-dup) is
    // the cost discipline that makes the composed pass affordable at
    // 100 TB: every tier shrinks the relation the next, more expensive
    // tier must score. One summary row; all counts integers.
    "pipeline_dedupe_cascade" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d).select("doc_id", "text", "lang")
      val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
      val s1 = docs
        .withColumn("__keeper", min(col("doc_id")).over(
          Window.partitionBy(length(norm), xxhash64(norm))))
        .filter(col("doc_id") === col("__keeper")).drop("__keeper")
        .localCheckpoint() // feeds the chunk index AND the s2 join
      val ch = TextOps.chunkOverlap(s1, "doc_id", "text",
          window = 32, stride = 32)
        .select(col("doc_id"),
          TextDedupe.tokenHash60(col("chunk_text")).as("h"))
        .localCheckpoint()
      val cd = ch
        .join(ch.groupBy("h").agg(min("doc_id").as("md")), "h")
        .groupBy("doc_id").agg(count(lit(1)).as("nc"),
          count(when(col("md") < col("doc_id"), 1)).as("ndup"))
      val s2 = s1.join(cd, "doc_id")
        .filter(col("ndup") * 2 < col("nc"))
        .select("doc_id", "text", "lang")
        .localCheckpoint() // feeds the pair join AND the s3 anti-join
      val drops = TextDedupe.ngramJaccardPairs(s2, "doc_id", "text",
          threshold = 0.5, blockCol = Some("lang"), broadcastDfreq = true)
        .select(col("d2").as("doc_id")).distinct()
      val s3 = s2.join(drops, Seq("doc_id"), "left_anti")
      val c0 = docs.agg(count(lit(1)).as("n_input"))
      val c1 = s1.agg(count(lit(1)).as("n_s1"))
      val c2 = s2.agg(count(lit(1)).as("n_s2"))
      val c3 = s3.agg(count(lit(1)).as("n_kept"),
        sum(size(split(col("text"), " ")).cast("long")).as("tokens_kept"))
      c0.crossJoin(c1).crossJoin(c2).crossJoin(c3).select(
        col("n_input"),
        (col("n_input") - col("n_s1")).as("n_exact_dropped"),
        (col("n_s1") - col("n_s2")).as("n_chunk_dropped"),
        (col("n_s2") - col("n_kept")).as("n_neardup_dropped"),
        col("n_kept"), col("tokens_kept"))
    }),

    "stream_dedupe_chunks" -> ((s, d) => {
      val base = Fixtures.freshDir("graft_chunkdedupe_fixture")
      val src = base.resolve("src").toString
      val idxDir = base.resolve("index").toString
      val outDir = base.resolve("out").toString
      val ckpt = base.resolve("ckpt").toString
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType)))
      val half = docs.agg(max("doc_id")).head().getLong(0) / 2
      def runOnce(): Unit = {
        val q = graft.streaming.StreamOps.chunkDedupeEachBatch(
          graft.streaming.StreamOps.fileStreamParquet(s, src, schema),
          "doc_id", "text", idxDir, outDir, ckpt)
        q.awaitTermination()
      }
      docs.filter(col("doc_id") <= half)
        .write.mode("append").parquet(src)
      runOnce()
      docs.filter(col("doc_id") > half)
        .write.mode("append").parquet(src)
      runOnce()
      s.read.parquet(outDir)
        .select("doc_id", "n_chunks", "n_dup_chunks", "keep")
    }),
  )

  /** The curate relation (doc_id, text, reject_reason, keep) in DuckDB —
    * shared by the per-doc verdict oracle and the one-pass report
    * oracle, so the rule chain exists in exactly one SQL rendering. */
  /** The synthetic full page the html-extract fixture wraps each document
    * into (title, style, script with hostile < > && content, nav bar,
    * mid-article related-links box, footer — all chrome built from LINKS
    * so the link-density rule, not position, must remove it). Shared by
    * the batch and streaming entries, over a frame with (doc_id, text). */
  private[queries] def syntheticPageHtml: org.apache.spark.sql.Column =
    concat(
      lit("<html><head><title>Doc "), col("doc_id"),
      lit("</title><style>body { font: 12px; }</style>" +
        "<script>var t = \"x < y && z > w\";</script></head>" +
        "<body><nav><a href=\"/\">Home</a> <a href=\"/a\">About</a> " +
        "<a href=\"/c\">Contact</a></nav><div><p>"),
      TextOps.escapeHtml(col("text")),
      lit("</p><ul><li><a href=\"/r1\">Related one</a></li>" +
        "<li><a href=\"/r2\">Related two</a></li></ul>" +
        "<p>End of article.</p></div>" +
        "<footer><a href=\"/t\">Terms</a> | " +
        "<a href=\"/p\">Privacy</a></footer></body></html>"))

  /** Closed-form expected extract (no HTML parsed) — shared verbatim by
    * the batch and streaming oracle rows. */
  private[queries] val htmlExtractOracleSql: String =
    """SELECT doc_id,
      |  'Doc ' || doc_id AS title,
      |  regexp_replace(trim(text), '\s+', ' ', 'g')
      |    || ' End of article.' AS main_text
      |FROM documents""".stripMargin

  private[queries] def curateCteSql: String = curateCteSql(true)

  /** `withDup = false` drops the corpus-wide keeper window and the
    * duplicate rule — the STATELESS rule chain, mirroring
    * TextOps.curateStatelessReason for the streaming twin's oracle. */
  private[queries] def curateCteSql(withDup: Boolean): String = {
    val dupRule = if (withDup) """
      |       WHEN doc_id <> keeper THEN 'duplicate'""" else ""
    ("""WITH t AS (
      |  SELECT doc_id, text,
      |    len(string_split(text, ' ')) AS ntok,
      |    CAST(round(CAST(
      |      least(len(string_split(text, ' ')) / 100.0, 1.0) * 0.4
      |      + (1.0 - len(list_filter(string_split(text, ' '),
      |          tk -> tk IN ('a', 'the')))
      |        / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.3
      |      + len(list_distinct(string_split(text, ' ')))
      |        / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.3
      |      AS DECIMAL(27,12)), 6) AS DOUBLE) AS q,
      |    CASE
      |      WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
      |      WHEN regexp_matches(text, '[぀-ヿ]') THEN 'ja'
      |      WHEN regexp_matches(text, '[Ѐ-ӿ]') THEN 'ru'
      |      WHEN regexp_matches(text, '(^| )(the|of|and)( |$)') THEN 'en'
      |      WHEN regexp_matches(text, '(^| )(el|la|de|que)( |$)') THEN 'es'
      |      WHEN regexp_matches(text, '(^| )(der|die|das|und)( |$)') THEN 'de'
      |      WHEN regexp_matches(text, '(^| )(le|la|et|les)( |$)') THEN 'fr'
      |      ELSE 'und' END AS pred""" + (if (withDup) """,
      |    min(doc_id) OVER (PARTITION BY
      |      length(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))),
      |      list_reduce(
      |        list_prepend(CAST(0 AS BIGINT),
      |          list_transform(string_split(
      |            lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ''),
      |            c -> CAST(unicode(c) AS BIGINT))),
      |        (acc, x) -> (acc * 31 + x) % 1000000007)) AS keeper""" else "") + """
      |  FROM documents),
      |c AS (SELECT doc_id, text,
      |  CASE WHEN pred = 'und' THEN 'lang'
      |       WHEN ntok < 20 THEN 'too_short'
      |       WHEN ntok > 90 THEN 'too_long'
      |       WHEN q < 0.58 THEN 'quality'""" + dupRule + """ END AS reject_reason,
      |  (CASE WHEN pred = 'und' THEN 'lang'
      |       WHEN ntok < 20 THEN 'too_short'
      |       WHEN ntok > 90 THEN 'too_long'
      |       WHEN q < 0.58 THEN 'quality'""" + dupRule + """ END) IS NULL AS keep
      |FROM t)""").stripMargin
  }

  /** tokenHash60 in DuckDB: the same two polynomial folds, combined
    * identically; all intermediates < 2^36 so no overflow either side. */
  private[queries] def tokenHash60Sql(tok: String): String = {
    def poly(base: Int, mod: Long): String =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split($tok, ''),
         |        c -> CAST(unicode(c) AS BIGINT))),
         |    (acc, x) -> (acc * $base + x) % $mod)""".stripMargin
    s"(${poly(31, 1000000007L)} * 1073741824 + ${poly(37, 998244353L)})"
  }

  /** The 60 SimHash vote bits as one grouped aggregate: bit b set iff
    * Σ_tokens sign-of-bit-b votes positive. */
  private def simhashSql: String = {
    val bits = (0 until 60).map { b =>
      s"(CASE WHEN sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
       |  FROM documents),
       |th AS (SELECT doc_id, ${tokenHash60Sql("t")} AS h FROM tok),
       |sh AS (SELECT doc_id, $bits AS sh FROM th GROUP BY doc_id)
       |SELECT a.doc_id AS d1, b.doc_id AS d2,
       |  bit_count(CAST(xor(a.sh, b.sh) AS BIGINT)) AS hamming
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE bit_count(CAST(xor(a.sh, b.sh) AS BIGINT)) <= 3""".stripMargin
  }

  def oracle: Map[String, String] = Map(
    "text_tokenize" ->
      """SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |FROM documents""".stripMargin,

    // integer counts from the shared regex family; one per-row double
    // assembly under round6
    "text_readability" ->
      s"""WITH c AS (SELECT doc_id,
         |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
         |      AS n_chars,
         |    CAST(greatest(1, len(regexp_extract_all(text, '\\S+')))
         |      AS BIGINT) AS n_words,
         |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
         |      AS BIGINT) AS n_sentences
         |  FROM documents)
         |SELECT doc_id, n_chars, n_words, n_sentences,
         |  ${graft.StableRound.sql6(
              "4.71 * (CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE))" +
                " + 0.5 * (CAST(n_words AS DOUBLE) " +
                "/ CAST(n_sentences AS DOUBLE)) - 21.43")} AS ari
         |FROM c""".stripMargin,

    "text_token_count" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_ws_tokens,
        |  len(regexp_extract_all(text,
        |    '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))
        |    AS n_bpe_tokens
        |FROM documents""".stripMargin,

    "text_stats" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |  CAST(round(CAST((length(text) - (len(string_split(text, ' ')) - 1))
        |    / len(string_split(text, ' ')) AS DECIMAL(27,12)), 6) AS DOUBLE) AS avg_token_len,
        |  CAST(round(CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('a', 'the')))
        |    / len(string_split(text, ' ')) AS DECIMAL(27,12)), 6) AS DOUBLE) AS stop_ratio
        |FROM documents""".stripMargin,

    "text_quality" ->
      """SELECT doc_id,
        |  CAST(round(CAST(least(nt / 100.0, 1.0) * 0.4
        |    + (1.0 - ns / nt) * 0.3 + (nd / nt) * 0.3 AS DECIMAL(27,12)), 6) AS DOUBLE) AS quality
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('a', 'the'))) AS DOUBLE) AS ns,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd
        |  FROM documents)""".stripMargin,

    // same rule chain, same precedence; quality uses the DECIMAL(27,12)
    // stable-round construction text_quality already proves cross-engine
    "text_curate" ->
      (curateCteSql + "\nSELECT doc_id, reject_reason, keep FROM c"),

    // the one-pass corpus report over the same curate relation
    "pipeline_curate_report" ->
      (curateCteSql + """
        |SELECT count(*) AS n_input,
        |  count(CASE WHEN keep THEN 1 END) AS n_kept,
        |  count(CASE WHEN reject_reason = 'lang' THEN 1 END) AS n_lang,
        |  count(CASE WHEN reject_reason = 'too_short' THEN 1 END) AS n_too_short,
        |  count(CASE WHEN reject_reason = 'too_long' THEN 1 END) AS n_too_long,
        |  count(CASE WHEN reject_reason = 'quality' THEN 1 END) AS n_quality,
        |  count(CASE WHEN reject_reason = 'duplicate' THEN 1 END) AS n_duplicate,
        |  CAST(sum(CASE WHEN keep THEN len(string_split(text, ' '))
        |    ELSE 0 END) AS BIGINT) AS total_tokens_kept,
        |  CAST(sum(CASE WHEN keep THEN
        |      len(regexp_extract_all(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |      + len(regexp_extract_all(text,
        |        '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}'))
        |    ELSE 0 END) AS BIGINT) AS n_pii_redacted
        |FROM c""".stripMargin),

    "text_pii_scrub" ->
      """WITH w AS (SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or +1-555-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        |  FROM documents)
        |SELECT doc_id,
        |  right(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'), 48) AS tail,
        |  CAST(len(regexp_extract_all(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |    + len(regexp_extract_all(t,
        |      '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_pii
        |FROM w""".stripMargin,

    "text_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT token, count(DISTINCT doc_id) AS df
        |          FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT tf.doc_id, tf.token,
        |  round(tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)), 6) AS tfidf
        |FROM tf JOIN dfreq USING (token) CROSS JOIN n""".stripMargin,

    "text_keywords_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT token, count(DISTINCT doc_id) AS df
        |          FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (SELECT tf.doc_id, tf.token,
        |    round(tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)), 6)
        |      AS tfidf
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n),
        |w AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, token) AS INTEGER) AS rk FROM sc)
        |SELECT doc_id, token, tfidf, rk FROM w WHERE rk <= 3""".stripMargin,

    "text_bm25_topk" -> (bm25LexCte +
      s""",
        |w AS (SELECT query_id, doc_id, score6, n_terms,
        |    ${graft.StableRound.sql6("score6 / 1000000.0")} AS bm25,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score6 DESC, doc_id) AS BIGINT) AS rk
        |  FROM lex)
        |SELECT query_id, doc_id, score6, n_terms, bm25, rk
        |FROM w WHERE rk <= 15""".stripMargin),

    "scalar_fuzzy_distance" ->
      s"""SELECT doc_id,
        |  levenshtein(substring(text, 1, 30),
        |    reverse(substring(text, 1, 30))) AS lev_rev,
        |  ${graft.StableRound.sql6(
           "1.0 - levenshtein(substring(text, 1, 30), " +
           "reverse(substring(text, 1, 30))) / " +
           "greatest(length(substring(text, 1, 30)), 1)")} AS norm_sim
        |FROM documents""".stripMargin,

    "dedupe_fuzzy_pairs" ->
      """WITH h AS (SELECT doc_id, lang, substring(text, 1, 40) AS head,
        |             substring(text, 1, 2) AS blk
        |           FROM documents)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(levenshtein(a.head, b.head) AS INTEGER) AS lev
        |FROM h a JOIN h b
        |  ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
        | AND abs(length(a.head) - length(b.head)) <= 5
        |WHERE levenshtein(a.head, b.head) <= 5""".stripMargin,

    // per-term stabilized ln + exact-decimal Σ, the lm_score recipe
    "text_entropy" ->
      s"""WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS w
        |             FROM documents),
        |cnt AS (SELECT lang, w, count(*) AS c FROM tok GROUP BY 1, 2),
        |agg AS (SELECT lang,
        |    CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS n_vocab,
        |    sum(c * CAST(${graft.StableRound.sql6("ln(c)")}
        |      AS DECIMAL(27,6))) AS s
        |  FROM cnt GROUP BY 1)
        |SELECT lang, n_tokens, n_vocab,
        |  ${graft.StableRound.sql6(
             s"${graft.StableRound.sql6("ln(n_tokens)")} - CAST(s AS DOUBLE) / n_tokens")} AS entropy
        |FROM agg""".stripMargin,

    // per-(token,doc) then per-token exact moments; top-20 by corpus
    // frequency with the token tiebreak; mirrored VMR straight line
    // moments over ALL N corpus docs (zero counts included via the
    // n_corpus denominator) — the unconditional Church–Gale VMR
    "text_burstiness" -> {
      val mean = "(CAST(total AS DOUBLE) / CAST(n_corpus AS DOUBLE))"
      val vr = "((CAST(sq AS DOUBLE) - CAST(total AS DOUBLE) " +
        "* CAST(total AS DOUBLE) / CAST(n_corpus AS DOUBLE)) " +
        "/ (CAST(n_corpus AS DOUBLE) - 1))"
      s"""WITH tok AS (SELECT doc_id,
         |    unnest(string_split(text, ' ')) AS w FROM documents),
         |pd AS (SELECT w, doc_id, count(*) AS x FROM tok GROUP BY 1, 2),
         |st AS (SELECT w, count(*) AS n_docs, sum(x) AS total,
         |    sum(x * x) AS sq
         |  FROM pd GROUP BY 1),
         |nc AS (SELECT count(*) AS n_corpus FROM documents),
         |top AS (SELECT * FROM st ORDER BY total DESC, w LIMIT 20)
         |SELECT w AS token, CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(total AS BIGINT) AS total,
         |  CAST(n_corpus AS BIGINT) AS n_corpus,
         |  ${graft.StableRound.sql6(mean)} AS mean_per_doc,
         |  CASE WHEN n_corpus > 1 THEN ${graft.StableRound.sql6(
              s"$vr / $mean")} END AS vmr
         |FROM top, nc""".stripMargin
    },

    "text_ttr" ->
      s"""WITH tok AS (SELECT lang, source,
        |    unnest(string_split(text, ' ')) AS w FROM documents),
        |cnt AS (SELECT lang, source, w, count(*) AS c
        |  FROM tok GROUP BY 1, 2, 3),
        |agg AS (SELECT lang, source,
        |    CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS n_types,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_hapax
        |  FROM cnt GROUP BY 1, 2)
        |SELECT lang, source, n_tokens, n_types, n_hapax,
        |  ${graft.StableRound.sql6("CAST(n_types AS DOUBLE) / n_tokens")}
        |    AS ttr,
        |  ${graft.StableRound.sql6("CAST(n_hapax AS DOUBLE) / n_types")}
        |    AS hapax_rate
        |FROM agg""".stripMargin,

    // same slice arithmetic as the decontamination 13-gram CTE, n=3
    "text_ngram_topk" ->
      """WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS ts
        |             FROM documents),
        |sh AS (SELECT DISTINCT doc_id, lang,
        |         list_aggregate(ts[i:i+2], 'string_agg', ' ') AS g
        |       FROM tok, unnest(range(1, len(ts) - 1)) AS t(i)
        |       WHERE len(ts) >= 3),
        |dfreq AS (SELECT lang, g AS shingle, count(*) AS df
        |          FROM sh GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY lang ORDER BY df DESC, shingle) AS rk
        |      FROM dfreq)
        |SELECT lang, shingle, df, rk FROM r WHERE rk <= 5""".stripMargin,

    "text_lang_id" ->
      """SELECT doc_id,
        |  CASE
        |    WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |    WHEN regexp_matches(text, '[\x{3040}-\x{30ff}]') THEN 'ja'
        |    WHEN regexp_matches(text, '[\x{0400}-\x{04ff}]') THEN 'ru'
        |    WHEN regexp_matches(text, '(^| )(the|of|and)( |$)') THEN 'en'
        |    WHEN regexp_matches(text, '(^| )(el|la|de|que)( |$)') THEN 'es'
        |    WHEN regexp_matches(text, '(^| )(der|die|das|und)( |$)') THEN 'de'
        |    WHEN regexp_matches(text, '(^| )(le|la|et|les)( |$)') THEN 'fr'
        |    ELSE 'und' END AS pred_lang
        |FROM documents""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''),
        |        c -> CAST(unicode(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
        |FROM documents""".stripMargin,

    "dedupe_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n
        |FROM documents GROUP BY text""".stripMargin,

    "dedupe_exact_norm" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n
        |FROM documents
        |GROUP BY lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"""
        .stripMargin,

    "dedupe_near_ngram" -> shingleCte(blocked = true),

    // ordered-pair twin of the shingle CTE with the |A| denominator
    "dedupe_containment" ->
      """WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS ts
        |            FROM documents),
        |sh AS (SELECT DISTINCT doc_id, lang, s FROM (
        |  SELECT doc_id, lang,
        |    ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
        |  FROM tok, unnest(range(1, len(ts) - 1)) AS t(i))),
        |sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS src, b.doc_id AS dst,
        |    count(*) AS inter
        |  FROM sh a JOIN sh b
        |    ON a.s = b.s AND a.lang = b.lang AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT src, dst,
        |  CAST(round(CAST(inter * 1.0 / s1.nsh AS DECIMAL(27,12)), 4)
        |    AS DOUBLE) AS containment
        |FROM pairs p JOIN sizes s1 ON p.src = s1.doc_id
        |WHERE CAST(round(CAST(inter * 1.0 / s1.nsh AS DECIMAL(27,12)), 4)
        |    AS DOUBLE) >= 0.8""".stripMargin,

    "dedupe_threshold_report" ->
      s"""SELECT floor(jaccard * 10) / 10 AS j_band, count(*) AS n_pairs
         |FROM (
         |${shingleCte(blocked = true)}
         |) GROUP BY 1""".stripMargin,

    // same exact integer products and single round-6 ln; DuckDB's
    // string_split mirrors the token stream
    "text_cooccurrence_pmi" ->
      s"""WITH tok AS (SELECT string_split(text, ' ') AS ts FROM documents),
         |bg AS (SELECT ts[i] || ' ' || ts[i+1] AS g
         |       FROM tok, unnest(range(1, len(ts))) AS t(i)
         |       WHERE len(ts) >= 2),
         |cb AS (SELECT g, count(*) AS cb FROM bg GROUP BY g),
         |cu AS (SELECT w, count(*) AS cu FROM (
         |         SELECT unnest(ts) AS w FROM tok) GROUP BY w),
         |n1 AS (SELECT count(*) AS n1 FROM (SELECT unnest(ts) FROM tok)),
         |n2 AS (SELECT count(*) AS n2 FROM bg),
         |p AS (SELECT g, cb,
         |    ${graft.StableRound.sql6(
              "ln((cb::DOUBLE * n1::DOUBLE * n1::DOUBLE) / " +
              "(n2::DOUBLE * cu1.cu::DOUBLE * cu2.cu::DOUBLE))")} AS pmi
         |  FROM cb
         |  JOIN cu cu1 ON cu1.w = split_part(cb.g, ' ', 1)
         |  JOIN cu cu2 ON cu2.w = split_part(cb.g, ' ', 2)
         |  CROSS JOIN n1 CROSS JOIN n2
         |  WHERE cb.cb >= 5)
         |SELECT g, cb, pmi FROM p
         |ORDER BY pmi DESC, g LIMIT 20""".stripMargin,

    "dedupe_minhash_lsh" -> shingleCte(blocked = false),
    "dedupe_simhash" -> simhashSql,

    // shared shingle CTE; df-filtered heavy set; relative 5% threshold
    "text_boilerplate_ngrams" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts
         |            FROM documents),
         |sh AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
         |  FROM tok, unnest(range(1, len(ts) - 1)) AS t(i))),
         |nd AS (SELECT count(*) AS n_docs FROM documents),
         |heavy AS (SELECT s, 1 AS hit FROM (
         |    SELECT s, count(*) AS df FROM sh GROUP BY 1), nd
         |  WHERE df >= ceil(n_docs * 0.05)),
         |per AS (SELECT sh.doc_id, count(*) AS n_shingles,
         |    coalesce(sum(heavy.hit), 0) AS n_boiler
         |  FROM sh LEFT JOIN heavy USING (s) GROUP BY 1)
         |SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
         |  CAST(n_boiler AS BIGINT) AS n_boiler,
         |  ${graft.StableRound.sql6(
              "CAST(n_boiler AS DOUBLE) / CAST(n_shingles AS DOUBLE)")}
         |    AS boiler_share
         |FROM per""".stripMargin,

    // top-100 token log-log OLS; per-term round6 fixed-point sums
    "text_zipf_fit" -> {
      def s6(e: String) = "CAST(floor(" + graft.StableRound.sql6(e) +
        " * 1000000 + 0.5) AS BIGINT)"
      val x = "ln(CAST(r AS DOUBLE))"
      val y = "ln(CAST(cnt AS DOUBLE))"
      val covn = "(CAST(k AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1000000.0) " +
        "- CAST(sx AS DOUBLE) / 1000000.0 * (CAST(sy AS DOUBLE) " +
        "/ 1000000.0))"
      val varx = "(CAST(k AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1000000.0) " +
        "- CAST(sx AS DOUBLE) / 1000000.0 * (CAST(sx AS DOUBLE) " +
        "/ 1000000.0))"
      val vary = "(CAST(k AS DOUBLE) * (CAST(syy AS DOUBLE) / 1000000.0) " +
        "- CAST(sy AS DOUBLE) / 1000000.0 * (CAST(sy AS DOUBLE) " +
        "/ 1000000.0))"
      s"""WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |f AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY 1),
         |v AS (SELECT count(*) AS vocab FROM f),
         |top AS (SELECT tok, cnt FROM f ORDER BY cnt DESC, tok LIMIT 100),
         |rk AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok)
         |    AS r FROM top),
         |t AS (SELECT ${s6(x)} AS x6, ${s6(y)} AS y6,
         |    ${s6(s"$x * $y")} AS xy6, ${s6(s"$x * $x")} AS xx6,
         |    ${s6(s"$y * $y")} AS yy6 FROM rk),
         |su AS (SELECT count(*) AS k, sum(x6) AS sx, sum(y6) AS sy,
         |    sum(xy6) AS sxy, sum(xx6) AS sxx, sum(yy6) AS syy FROM t)
         |SELECT CAST(vocab AS BIGINT) AS vocab_size,
         |  CAST(k AS BIGINT) AS k_fit,
         |  ${graft.StableRound.sql6(s"$covn / $varx")} AS slope,
         |  ${graft.StableRound.sql6(
              s"(CAST(sy AS DOUBLE) / 1000000.0 - $covn / $varx " +
                "* (CAST(sx AS DOUBLE) / 1000000.0)) " +
                "/ CAST(k AS DOUBLE)")} AS intercept,
         |  ${graft.StableRound.sql6(
              s"$covn * $covn / ($varx * $vary)")} AS r2
         |FROM su, v""".stripMargin
    },

    // same chunk law: ids 0..⌈n/24⌉−1 (integer ceil via (n+23)//24),
    // 1-based inclusive slice [i·24+1, min(i·24+32, n)]
    "text_chunk_overlap" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts
        |  FROM documents),
        |ch AS (SELECT doc_id, i AS chunk_id, i * 24 AS chunk_start,
        |    ts[CAST(i * 24 + 1 AS BIGINT)
        |       : CAST(least(i * 24 + 32, len(ts)) AS BIGINT)] AS cts
        |  FROM tok, unnest(range(0, (len(ts) + 23) // 24)) AS t(i))
        |SELECT doc_id, chunk_id, chunk_start,
        |  len(cts) AS n_chunk_tokens,
        |  array_to_string(cts, ' ') AS chunk_text
        |FROM ch""".stripMargin,

    // the closed-form expected extract: escape -> wrap -> extract must
    // round-trip to the whitespace-normalized text + the planted
    // trailing paragraph; the title is the planted literal. NO HTML is
    // parsed here — that the Spark side's parse reproduces this is the
    // whole check.
    "text_html_extract" -> htmlExtractOracleSql,

    // closed form: NFC composes e+U+0301 into é (chr(233)), zero-widths
    // vanish, NBSP becomes space, runs collapse — stated WITHOUT calling
    // any normalizer. chr(769)=combining acute, chr(8203)=ZWSP,
    // chr(160)=NBSP.
    "text_normalize_unicode" ->
      """WITH f AS (SELECT doc_id,
        |    'Cafe' || chr(769) || chr(8203) || ' ' || chr(160) || ' '
        |      || text || '  fin de ligne' || chr(769) || ' ' AS dirty,
        |    'Caf' || chr(233) || ' '
        |      || regexp_replace(trim(text), '\s+', ' ', 'g')
        |      || ' fin de lign' || chr(233) AS clean_text
        |  FROM documents)
        |SELECT doc_id, length(dirty) AS n_chars_dirty, clean_text,
        |  length(clean_text) AS n_chars_clean
        |FROM f""".stripMargin,

    // disjoint 32-token blocks + the same 60-bit polynomial chunk hash
    "dedupe_chunks" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts
        |  FROM documents),
        |ch AS (SELECT doc_id, array_to_string(
        |    ts[CAST(i * 32 + 1 AS BIGINT)
        |       : CAST(least(i * 32 + 32, len(ts)) AS BIGINT)], ' ') AS ct
        |  FROM tok, unnest(range(0, (len(ts) + 31) // 32)) AS t(i)),
        |h AS (SELECT doc_id, ${tokenHash60Sql("ct")} AS h FROM ch),
        |c AS (SELECT h AS hh, count(DISTINCT doc_id) AS nd
        |  FROM h GROUP BY 1)
        |SELECT doc_id, count(*) AS n_chunks,
        |  count(CASE WHEN nd >= 2 THEN 1 END) AS n_dup_chunks,
        |  ${graft.StableRound.sql4(
             "count(CASE WHEN nd >= 2 THEN 1 END) " +
               "/ CAST(count(*) AS DOUBLE)")} AS dup_chunk_ratio
        |FROM h JOIN c ON h.h = c.hh GROUP BY doc_id""".stripMargin,

    // the streaming face answers like the one-shot batch pass: a block
    // is duplicated iff min(doc_id) over its hash is strictly smaller
    // (observed-index law, batching-invariant for doc_id-ordered drops)
    "stream_dedupe_chunks" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts
        |  FROM documents),
        |ch AS (SELECT doc_id, array_to_string(
        |    ts[CAST(i * 32 + 1 AS BIGINT)
        |       : CAST(least(i * 32 + 32, len(ts)) AS BIGINT)], ' ') AS ct
        |  FROM tok, unnest(range(0, (len(ts) + 31) // 32)) AS t(i)),
        |h AS (SELECT doc_id, ${tokenHash60Sql("ct")} AS h FROM ch),
        |m AS (SELECT h AS hh, min(doc_id) AS md FROM h GROUP BY 1)
        |SELECT doc_id, count(*) AS n_chunks,
        |  count(CASE WHEN md < doc_id THEN 1 END) AS n_dup_chunks,
        |  (2 * count(CASE WHEN md < doc_id THEN 1 END) < count(*)) AS keep
        |FROM h JOIN m ON h.h = m.hh GROUP BY doc_id""".stripMargin,

    // the three stage laws replayed in sequence, each over the previous
    // stage's survivors; jaccard threshold under the SAME round4 law as
    // the shingle pair relation
    "pipeline_dedupe_cascade" ->
      s"""WITH d AS (SELECT doc_id, text, lang,
        |    lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS nrm
        |  FROM documents),
        |s1 AS (SELECT doc_id, text, lang FROM (
        |    SELECT doc_id, text, lang,
        |      min(doc_id) OVER (PARTITION BY nrm) AS keeper FROM d)
        |  WHERE doc_id = keeper),
        |tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM s1),
        |ch AS (SELECT doc_id, array_to_string(
        |    ts[CAST(i * 32 + 1 AS BIGINT)
        |       : CAST(least(i * 32 + 32, len(ts)) AS BIGINT)], ' ') AS ct
        |  FROM tok, unnest(range(0, (len(ts) + 31) // 32)) AS t(i)),
        |h AS (SELECT doc_id, ${tokenHash60Sql("ct")} AS h FROM ch),
        |m AS (SELECT h AS hh, min(doc_id) AS md FROM h GROUP BY 1),
        |cd AS (SELECT doc_id, count(*) AS nc,
        |    count(CASE WHEN md < doc_id THEN 1 END) AS ndup
        |  FROM h JOIN m ON h.h = m.hh GROUP BY doc_id),
        |s2 AS (SELECT s1.doc_id, s1.text, s1.lang FROM s1
        |  JOIN cd ON s1.doc_id = cd.doc_id WHERE 2 * ndup < nc),
        |t2 AS (SELECT doc_id, lang, string_split(text, ' ') AS ts
        |  FROM s2),
        |sh AS (SELECT DISTINCT doc_id, lang, s FROM (
        |  SELECT doc_id, lang,
        |      ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
        |  FROM t2, unnest(range(1, len(ts) - 1)) AS t(i))),
        |sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY 1),
        |pr AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        |  FROM sh a JOIN sh b
        |    ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |dr AS (SELECT DISTINCT d2 FROM pr
        |  JOIN sizes z1 ON pr.d1 = z1.doc_id
        |  JOIN sizes z2 ON pr.d2 = z2.doc_id
        |  WHERE CAST(round(CAST(inter / (z1.nsh + z2.nsh - inter)
        |      AS DECIMAL(27,12)), 4) AS DOUBLE) >= 0.5),
        |s3 AS (SELECT doc_id, text FROM s2
        |  WHERE doc_id NOT IN (SELECT d2 FROM dr))
        |SELECT
        |  (SELECT count(*) FROM documents) AS n_input,
        |  (SELECT count(*) FROM documents) - (SELECT count(*) FROM s1)
        |    AS n_exact_dropped,
        |  (SELECT count(*) FROM s1) - (SELECT count(*) FROM s2)
        |    AS n_chunk_dropped,
        |  (SELECT count(*) FROM s2) - (SELECT count(*) FROM s3)
        |    AS n_neardup_dropped,
        |  (SELECT count(*) FROM s3) AS n_kept,
        |  (SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT)
        |    FROM s3) AS tokens_kept""".stripMargin,
  )
}
