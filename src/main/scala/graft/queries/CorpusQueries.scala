package graft.queries

import org.apache.spark.sql.functions._
import graft.{StableRound, Tables}
import graft.ops.{Clusters, CorpusOps, TextDedupe}

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
  )

  def oracle: Map[String, String] = Map(
    "text_decontaminate" ->
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
        |WHERE d.doc_id % 5 <> 0""".stripMargin,

    "text_quality_gopher" -> {
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
    },

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

    // same closure over the embedding-cosine pair relation
    "dedupe_embed_clusters" ->
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
         |FROM r GROUP BY v""".stripMargin,

    // the oracle dedupes on the normalized TEXT itself; the Spark side
    // groups on its 16-byte (length, fingerprint) proxy — same grouping
    // in every realizable case (the dedupe_exact convention)
    "dedupe_incremental" ->
      """WITH i AS (SELECT doc_id,
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nrm
        |  FROM documents WHERE doc_id % 3 = 0),
        |e AS (SELECT DISTINCT
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nrm
        |  FROM documents WHERE doc_id % 3 <> 0)
        |SELECT i.doc_id, e.nrm IS NULL AS is_new
        |FROM i LEFT JOIN e ON i.nrm = e.nrm""".stripMargin,
  )
}
