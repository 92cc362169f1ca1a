package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.VectorOps

/** Embedding similarity queries over `embeddings` (north-star tier):
  * brute-force cosine top-k, label-blocked pairwise join, and global
  * embedding near-dup detection. Thresholds calibrated on the corpus
  * (max global cosine 0.513; 26 label-blocked pairs >= 0.35; 14 global
  * pairs >= 0.45).
  */
object VectorQueries extends QueryPack {

  def queries: Map[String, Q] = Map(
    "vec_cosine_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      VectorOps.cosineTopK(
        emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        emb.filter(col("vec_id") === 0).select("embedding"),
        "embedding", k = 10)
    }),

    // batch similarity search: top-3 neighbors for each of 5 query vectors
    "vec_cosine_topk_batch" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      VectorOps.cosineTopKBatch(
        emb.filter(col("vec_id") >= 5), "vec_id", "embedding",
        emb.filter(col("vec_id") < 5).select("vec_id", "embedding"),
        "vec_id", "embedding", k = 3)
    }),

    "vec_pairwise_join" -> ((s, d) =>
      VectorOps.pairwiseCosine(
        Tables.embeddings(s, d).select("vec_id", "label", "embedding"),
        "vec_id", "embedding", threshold = 0.35, blockCol = Some("label"))
        .select("id1", "id2", "label", "cos_sim")),

    "dedupe_embed" -> ((s, d) =>
      VectorOps.pairwiseCosine(
        Tables.embeddings(s, d).select("vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.45, blockCol = None)
        .select("id1", "id2", "cos_sim")),

    // int8 embedding quantization (4× storage cut — the disk-resident
    // index format). Output is scalar per-vector stats of the quantized
    // codes (the driver compare cannot sort array cells), fully
    // oracle-checked — DuckDB reproduces the identical codes.
    "vec_quantize_int8" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          VectorOps.quantizeInt8(col("embedding")).as("q"))
        .select(col("vec_id"),
          aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
          array_min(col("q")).as("q_min"),
          array_max(col("q")).as("q_max"))),

    // ANN scale path: sign-LSH bucketed candidates + exact rerank. No SQL
    // oracle (approximate); VectorOpsSpec checks candidate scores against
    // the exact ranking.
    // ANN scale path 2: IVF coarse quantizer (sample-trained spherical
    // k-means) + nProbe cell probing + exact rerank. Rows-only check
    // (approximate); VectorOpsSpec proves score-exactness and
    // probe-all degeneracy to exact top-k.
    "vec_ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      VectorOps.ivfCosineTopK(
        emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        emb.filter(col("vec_id") === 0).select("embedding"),
        "embedding", k = 10, nCentroids = 16, nProbe = 4)
    }),

    // IVF with the PHYSICAL layout: corpus landed hive-partitioned by
    // cell, probe filter prunes partitions (PartitionFilters in the plan)
    // — only nProbe/nCentroids of the data is read. Same results as
    // vec_ann_ivf given the same quantizer (spec-verified).
    "vec_ann_ivf_pruned" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val corpus = emb.filter(col("vec_id") =!= 0)
        .select("vec_id", "embedding")
      val centroids = VectorOps.ivfTrain(corpus, "embedding", 16)
      VectorOps.ivfCosineTopKPruned(s, corpus, "vec_id", "embedding",
        emb.filter(col("vec_id") === 0).select("embedding"),
        "embedding", k = 10, centroids, nProbe = 4,
        layoutDir = s"/tmp/graft_ivf_fixture/${Fixtures.key(s, s"$d/embeddings.parquet")}")
    }),

    "vec_ann_lsh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      VectorOps.annCosineTopK(
        emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        emb.filter(col("vec_id") === 0).select("embedding"),
        "embedding", k = 10, nBits = 8, dim = 64, probe = 1)
    }),

    // LSH with the PHYSICAL layout: corpus landed hive-partitioned by
    // sign-LSH bucket; the multi-probe filter prunes partitions, so only
    // ~9/256 of the corpus is opened. Same results as vec_ann_lsh given
    // the same hyperplanes (spec-verified).
    "vec_ann_lsh_pruned" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      VectorOps.lshCosineTopKPruned(s,
        emb.filter(col("vec_id") =!= 0).select("vec_id", "embedding"),
        "vec_id", "embedding",
        emb.filter(col("vec_id") === 0).select("embedding"),
        "embedding", k = 10, nBits = 8, dim = 64, probe = 1,
        layoutDir =
          s"/tmp/graft_lsh_fixture/${Fixtures.key(s, s"$d/embeddings.parquet")}")
    }),
  )

  private val vCte =
    """WITH v AS (SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |n AS (SELECT vec_id, label, e,
      |    sqrt(list_dot_product(e, e)) AS nrm FROM v)""".stripMargin

  def oracle: Map[String, String] = Map(
    "vec_quantize_int8" ->
      """WITH m AS (SELECT vec_id, embedding,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        |  FROM embeddings),
        |q AS (SELECT vec_id,
        |    CASE WHEN maxabs = 0
        |      THEN list_transform(embedding, x -> CAST(0 AS INT))
        |      ELSE list_transform(embedding, x -> CAST(floor(
        |        CAST(x AS DOUBLE) / maxabs * 127 + 0.5) AS INT)) END AS qv
        |  FROM m)
        |SELECT vec_id, CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  list_min(qv) AS q_min, list_max(qv) AS q_max
        |FROM q""".stripMargin,

    "vec_cosine_topk" -> (vCte +
      """,
        |q AS (SELECT e AS qe, nrm AS qnrm FROM n WHERE vec_id = 0)
        |SELECT n.vec_id,
        |  round(list_dot_product(n.e, q.qe) / (n.nrm * q.qnrm), 6) AS cos_sim
        |FROM n, q WHERE n.vec_id <> 0
        |ORDER BY list_dot_product(n.e, q.qe) / (n.nrm * q.qnrm) DESC, n.vec_id
        |LIMIT 10""".stripMargin),

    "vec_cosine_topk_batch" -> (vCte +
      """,
        |q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qnrm
        |      FROM n WHERE vec_id < 5),
        |scored AS (SELECT q.query_id, n.vec_id,
        |    list_dot_product(n.e, q.qe) / (n.nrm * q.qnrm) AS cos,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_dot_product(n.e, q.qe) / (n.nrm * q.qnrm) DESC,
        |        n.vec_id) AS rk
        |  FROM n, q WHERE n.vec_id >= 5)
        |SELECT query_id, vec_id, round(cos, 6) AS cos_sim, rk
        |FROM scored WHERE rk <= 3""".stripMargin),

    "vec_pairwise_join" -> (vCte +
      """
        |SELECT a.vec_id AS id1, b.vec_id AS id2, a.label AS label,
        |  round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cos_sim
        |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.35"""
        .stripMargin),

    "dedupe_embed" -> (vCte +
      """
        |SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cos_sim
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.45"""
        .stripMargin),
  )
}
