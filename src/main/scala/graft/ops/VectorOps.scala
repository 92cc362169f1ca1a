package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity operators (north star): cosine top-k and pairwise
  * similarity joins over `Array[Float]` embedding columns.
  *
  * Math is done with higher-order functions in double precision (floats
  * cast element-wise before multiply) so the DuckDB oracle reproduces the
  * values bit-for-bit modulo final-ulp accumulation, absorbed by round(6).
  *
  * Scale design: norms are computed once per vector BEFORE any join (an
  * O(n·d) projection), so the pairwise stage only pays one dot product per
  * candidate pair. Brute force is the exact baseline; the 100 TB path is
  * blocking (label/partition), and a planned LSH (random-hyperplane) or IVF
  * (k-means-bucket) candidate generator — same verify-exactly pattern as
  * TextDedupe.minhashLshPairs.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double precision — a codegen'd Catalyst expression
    * (graft.functions.FloatVecDot); identical semantics to the HOF form
    * `aggregate(zip_with(a,b,(x,y)->double(x)*double(y)), 0.0, +)` but
    * ~10× faster because it stays inside whole-stage codegen. */
  def dot(a: Column, b: Column): Column =
    graft.functions.FloatVecDot.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Vectors with pre-computed norms (projection, no shuffle). */
  def withNorm(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("__norm", norm(col(vecCol)))

  /** Exact brute-force cosine top-k against a single query vector.
    * The query side is a 1-row broadcast; ranking plans as
    * TakeOrderedAndProject (per-partition heap, k-row driver merge). */
  def cosineTopK(vectors: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String, k: Int): DataFrame = {
    val v = withNorm(vectors, vecCol)
    val q = withNorm(query, queryVecCol)
      .select(col(queryVecCol).as("__qvec"), col("__norm").as("__qnorm"))
    v.crossJoin(broadcast(q))
      .select(col(idCol),
        (dot(col(vecCol), col("__qvec")) / (col("__norm") * col("__qnorm")))
          .as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("cos"), 6).as("cos_sim"))
  }

  /** Batch top-k: the k nearest corpus vectors for EACH of a set of query
    * vectors. Queries broadcast (one crossJoin, no corpus shuffle); ranking
    * is a window over query_id — the shuffle moves only (query, id, score)
    * triples, never vectors. For corpora where even the triples are too
    * big, pre-reduce with a per-partition top-k (groupBy spark_partition_id
    * + query) before the global rank; not needed at this tier. */
  def cosineTopKBatch(vectors: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = withNorm(vectors, vecCol)
    val q = withNorm(queries, qVecCol).select(col(qIdCol).as("query_id"),
      col(qVecCol).as("__qvec"), col("__norm").as("__qnorm"))
    v.crossJoin(broadcast(q))
      .select(col("query_id"), col(idCol),
        (dot(col(vecCol), col("__qvec")) / (col("__norm") * col("__qnorm")))
          .as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col(idCol))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col(idCol),
        round(col("cos"), 6).as("cos_sim"), col("rk"))
  }

  /** 1-bit sign signature of a `dim`-float embedding packed into one
    * BIGINT: bit i set ⟺ e[i] > 0. Pure integer/compare arithmetic — no
    * float math, so the signature is bit-identical in any engine (the
    * corpus is zero-centered per dimension, so sign bits are balanced).
    * Bit 63 makes the long negative; XOR + bit_count are bit-pattern ops,
    * unaffected. Map-only projection. */
  def signPack(vec: Column, dim: Int): Column = {
    require(dim <= 64, s"signPack packs into one long; dim=$dim > 64")
    aggregate(sequence(lit(0), lit(dim - 1)), lit(0L),
      (acc, i) => acc + when(element_at(vec, i + 1) > 0f,
        // functions.shiftleft only takes a literal shift — call the SQL
        // function for a column-valued one
        call_function("shiftleft", lit(1L), i)).otherwise(0L))
  }

  /** Binary-quantization ANN: Hamming-prefilter on 1-bit sign signatures,
    * exact cosine rerank of the top-`candidates` by (hamming, id).
    *
    * The 100 TB story is the SCAN: 64 float dims (256 B + null bitmap)
    * collapse to one 8-byte long, and the prefilter is XOR + POPCNT —
    * a codegen'd integer pipeline over a 32×-smaller column, with the
    * candidate cut planned as TakeOrderedAndProject (per-partition heap,
    * `candidates`-row driver merge). Only the surviving `candidates`
    * rows ever pay a float dot product. Oversampling is the recall knob:
    * on isotropic corpora 1-bit codes are coarse (spec-pinned frontier —
    * 20× oversample holds recall ≥ 0.9 here); on clustered real
    * embeddings 3-5× suffices. Deterministic end to end: both cuts are
    * total orders, so a second engine replays candidates and rerank
    * exactly. */
  def bqTopK(vectors: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String, dim: Int,
      candidates: Int, k: Int): DataFrame = {
    val q = withNorm(query, queryVecCol).select(
      col(queryVecCol).as("__qvec"), col("__norm").as("__qnorm"),
      signPack(col(queryVecCol), dim).as("__qsig"))
    val cand = vectors
      .withColumn("__sig", signPack(col(vecCol), dim))
      .crossJoin(broadcast(q))
      .withColumn("hamming",
        bit_count(col("__sig").bitwiseXOR(col("__qsig"))).cast("long"))
      .orderBy(col("hamming"), col(idCol))
      .limit(candidates)
    cand
      .select(col(idCol), col("hamming"),
        (dot(col(vecCol), col("__qvec")) /
          (norm(col(vecCol)) * col("__qnorm"))).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("hamming"), round(col("cos"), 6).as("cos_sim"))
  }

  /** Batch form of [[bqTopK]]: top-`k` for EACH query, vectors never
    * shuffled. The Hamming pass ranks (query, id, hamming) LONG triples
    * per query (WindowGroupLimit pushes the cut below the exchange —
    * each map task forwards ≤`candidates` rows per query); the bounded
    * |queries|·candidates winner list is then BROADCAST back into a
    * second corpus scan to fetch vectors for the exact rerank (the
    * batch-MMR re-attach discipline) — so the corpus is scanned exactly
    * twice and no exchange ever carries an embedding. */
  def bqTopKBatch(vectors: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, dim: Int,
      candidates: Int, k: Int,
      sigCol: Option[String] = None): DataFrame = {
    // sigCol: serve from signatures PRE-COMPUTED at ingest
    // (StreamOps.bqIngestEachBatch) instead of re-signing the corpus
    // per query — the prefilter scan then reads (id, sig) only
    import org.apache.spark.sql.expressions.Window
    val q = withNorm(queries, qVecCol).select(col(qIdCol).as("query_id"),
        col(qVecCol).as("__qvec"), col("__norm").as("__qnorm"),
        signPack(col(qVecCol), dim).as("__qsig"))
      .localCheckpoint() // bounded query set, two consumers
    val cand = vectors
      .select(col(idCol), sigCol.map(col)
        .getOrElse(signPack(col(vecCol), dim)).as("__sig"))
      .crossJoin(broadcast(q.select(col("query_id"), col("__qsig"))))
      .select(col("query_id"), col(idCol),
        bit_count(col("__sig").bitwiseXOR(col("__qsig"))).cast("long")
          .as("hamming"))
      .withColumn("__hrk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("hamming"), col(idCol))))
      .filter(col("__hrk") <= candidates)
      .select(col("query_id"), col(idCol), col("hamming"))
      .localCheckpoint() // bounded |queries|·candidates winner list
    vectors.join(broadcast(cand), idCol)
      .join(broadcast(q.select("query_id", "__qvec", "__qnorm")),
        "query_id")
      .select(col("query_id"), col(idCol), col("hamming"),
        (dot(col(vecCol), col("__qvec")) /
          (norm(col(vecCol)) * col("__qnorm"))).as("cos"))
      .withColumn("rk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col(idCol))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col(idCol), col("hamming"),
        round(col("cos"), 6).as("cos_sim"), col("rk"))
  }

  /** Retrieval metrics of an approximate candidate list against an
    * exact relevance set: per query, hit count, recall@k and MRR
    * (reciprocal rank of the FIRST relevant candidate). `exact` is
    * (query_id, vec_id); `approx` is (query_id, vec_id, rk) with rk a
    * total-ordered 1-based rank. Hits ride a left-semi join on long
    * pairs; both metrics are single straight-line float ops on exact
    * integers under round6 — fully engine-replayable. Queries with no
    * hits surface as (0, 0.0, 0.0), never dropped. */
  def retrievalMetrics(exact: DataFrame, approx: DataFrame,
      k: Int): DataFrame = {
    val hits = approx.join(exact, Seq("query_id", "vec_id"), "left_semi")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_hits"), min(col("rk")).as("__minrk"))
    exact.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        graft.StableRound.round6(
          coalesce(col("n_hits"), lit(0L)).cast("double")
            / lit(k).cast("double")).as(s"recall_at_$k"),
        graft.StableRound.round6(coalesce(
          lit(1).cast("double") / col("__minrk").cast("double"),
          lit(0.0))).as("mrr"))
  }

  /** ColBERT-style late-interaction MaxSim: score each DOC (a GROUP of
    * corpus vectors keyed by `docCol`) against a multi-vector query as
    * Σ_q max_v cos(q, v) — the retrieval scorer that keeps per-token
    * query granularity without a quadratic token join. Shape at scale:
    * the query side (m vectors) broadcasts, the per-pair cosine is one
    * codegen'd map-side expression over the corpus scan, and BOTH aggs
    * combine map-side — the max is taken per (doc, query-vector) and
    * the shuffle carries only |docs|·m (doc, qid, max6) longs, never
    * vectors. Per-pair cosines snap to the round6 grid BEFORE the max,
    * so max and sum are exact integer ops in any engine.
    *
    * Returns (docCol, n_q, maxsim). */
  def maxSim(corpus: DataFrame, docCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int = 10): DataFrame = {
    val v = withNorm(corpus, vecCol)
    val q = withNorm(queries, qVecCol).select(col(qIdCol).as("__qid"),
      col(qVecCol).as("__qvec"), col("__norm").as("__qnorm"))
    val cos = dot(col(vecCol), col("__qvec")) /
      (col("__norm") * col("__qnorm"))
    v.crossJoin(broadcast(q))
      .select(col(docCol), col("__qid"),
        floor(graft.StableRound.round6(cos) * 1e6 + 0.5).cast("long")
          .as("t6"))
      .groupBy(docCol, "__qid").agg(max("t6").as("m6"))
      .groupBy(docCol).agg(count(lit(1)).as("n_q"), sum("m6").as("s6"))
      // the top-k CUT the name promises (ADVICE r12): distributed
      // TakeOrdered on the exact integer score with id tiebreak —
      // deterministic, never a doc-wide sort
      .orderBy(col("s6").desc, col(docCol)).limit(k)
      .select(col(docCol), col("n_q"),
        graft.StableRound.round6(col("s6").cast("double") / 1e6)
          .as("maxsim"))
  }

  // ---- ANN: random-hyperplane LSH (the 100 TB candidate-generation path)

  /** Deterministic pseudo-random unit-ish hyperplanes (seeded). Public so
    * oracle builders can render the SAME planes as SQL literals — the
    * bucket function is data-independent, which is what makes sign-LSH
    * fully expressible (and hash-checkable) in a second engine. */
  def planes(nBits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)((rnd.nextGaussian()).toFloat))
  }

  /** Sign-LSH bucket id: bit i = sign(v · plane_i). Cosine-similar vectors
    * agree on most signs, so they land in the same or nearby buckets. */
  def lshBucket(vec: Column, nBits: Int, dim: Int, seed: Long = 42L): Column =
    planes(nBits, dim, seed).zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedlit(p)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Approximate cosine top-k: candidates are vectors whose LSH bucket is
    * within hamming distance `probe` of the query's bucket (multi-probe),
    * then exact cosine ranking on candidates only.
    *
    * This is the scale path for `cosineTopK`: instead of scoring all n
    * vectors, score ~n/2^nBits per probed bucket. Recall depends on the
    * similarity level (sign-agreement probability 1-θ/π per bit) — on
    * near-orthogonal random data it is deliberately modest; on genuinely
    * near-duplicate data (cos ≥ 0.9) per-bit agreement is ≥ 0.86 and
    * recall approaches 1. Exact `cosineTopK` stays the correctness oracle.
    *
    * Deployment note: computing the bucket costs nBits dot products, so
    * the win over brute force requires `__bucket` to be a PRECOMPUTED
    * (stored/partitioned-on) column — build it once at ingest, then each
    * query touches only the probed buckets' partitions. Here it is
    * computed inline because the corpus is read-only parquet.
    */
  def annCosineTopK(vectors: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String, k: Int,
      nBits: Int = 8, dim: Int = 64, probe: Int = 1): DataFrame = {
    val v = withNorm(vectors, vecCol)
      .withColumn("__bucket", lshBucket(col(vecCol), nBits, dim))
    val q = withNorm(query, queryVecCol)
      .select(col(queryVecCol).as("__qvec"), col("__norm").as("__qnorm"),
        lshBucket(col(queryVecCol), nBits, dim).as("__qbucket"))
    val cand = v.crossJoin(broadcast(q))
      .filter(bit_count(col("__bucket").bitwiseXOR(col("__qbucket"))) <= probe)
    cand.select(col(idCol),
        (dot(col(vecCol), col("__qvec")) / (col("__norm") * col("__qnorm")))
          .as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("cos"), 6).as("cos_sim"))
  }

  /** Batch ANN: approximate top-k for EACH of a set of query vectors —
    * the candidate-generation shape of embedding near-dedupe at scale
    * (queries broadcast once; each corpus row is scored only against
    * queries whose bucket is within hamming `probe` of its own, then a
    * per-query window ranks the surviving candidates — the shuffle moves
    * only (query, id, score) triples, never vectors). Single-query
    * [[annCosineTopK]] is the k=1-query special case; same planes ⇒ same
    * buckets. */
  def annCosineTopKBatch(vectors: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int,
      nBits: Int = 8, dim: Int = 64, probe: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = withNorm(vectors, vecCol)
      .withColumn("__bucket", lshBucket(col(vecCol), nBits, dim))
    val q = withNorm(queries, qVecCol)
      .select(col(qIdCol).as("query_id"), col(qVecCol).as("__qvec"),
        col("__norm").as("__qnorm"),
        lshBucket(col(qVecCol), nBits, dim).as("__qbucket"))
    v.crossJoin(broadcast(q))
      .filter(bit_count(col("__bucket").bitwiseXOR(col("__qbucket"))) <= probe)
      .select(col("query_id"), col(idCol),
        (dot(col(vecCol), col("__qvec")) / (col("__norm") * col("__qnorm")))
          .as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col(idCol))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col(idCol),
        round(col("cos"), 6).as("cos_sim"), col("rk"))
  }

  /** Exact brute-force MAX-INNER-PRODUCT top-k for a query batch — the
    * recommender-retrieval scoring rule (user·item), which cosine top-k
    * cannot express when corpus norms vary (a long vector can win on
    * raw dot while losing on angle). Ranking is (dot desc, id); the dot
    * is [[dot]] (double accumulation, left-to-right), so ordering parity
    * with the DuckDB oracle carries over from the cosine family. */
  def mipsTopKBatchExact(vectors: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(qIdCol).as("query_id"),
      col(qVecCol).as("__qvec"))
    vectors.crossJoin(broadcast(q))
      .select(col("query_id"), col(idCol),
        dot(col(vecCol), col("__qvec")).as("ip"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("ip").desc, col(idCol))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col(idCol),
        round(col("ip"), 6).as("ip"), col("rk"))
  }

  /** Approximate MIPS top-k via the NORM-AUGMENTATION reduction to
    * cosine (Bachrach et al., RecSys'14): with M = max corpus norm,
    * augmenting x → [x, √(M²−‖x‖²)] and q → [q, 0] makes every corpus
    * vector length M while preserving dot(x', q') = dot(x, q), so
    * augmented-space COSINE order ≡ inner-product order and any
    * angular index (here: sign-LSH over the augmented dim+1 space)
    * becomes a MIPS index. Candidates = hamming ≤ `probe` in augmented
    * bucket space; rerank is the EXACT dot on the original vectors
    * (augmented cosine is monotone in it — no augmented dot needed).
    *
    * Scale shape: buckets are data-independent literals (broadcast
    * planes), M is one 1-row aggregate, the candidate join is
    * bucket-blocked instead of |corpus|×|queries|, and the rerank
    * window runs per query over candidates only — the same contract as
    * [[annCosineTopKBatch]] with one extra broadcast scalar. The
    * max-vector clamp (`greatest(0, M²−‖x‖²)`) absorbs the one case
    * where double rounding could drive the radicand a hair negative —
    * mirrored verbatim in the oracle. */
  def mipsTopKBatch(vectors: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int,
      nBits: Int = 8, dim: Int = 64, probe: Int = 1,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ps = planes(nBits, dim + 1, seed)
    val v = withNorm(vectors, vecCol)
    val m = v.agg(max(col("__norm")).as("__m"))
    val va = v.crossJoin(broadcast(m))
      .withColumn("__aug", sqrt(greatest(lit(0d),
        col("__m") * col("__m") - dot(col(vecCol), col(vecCol)))))
    // corpus bucket over the augmented space: bit i =
    // sign(x·pᵢ[0:dim] + aug·pᵢ[dim]); query augment coord is 0, so the
    // query bucket is plain sign-LSH on the first dim coords
    val cBucket = ps.zipWithIndex.map { case (p, i) =>
      when(dot(col(vecCol), typedlit(p.take(dim)))
        + col("__aug") * lit(p(dim).toDouble) > 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val qBucket = ps.zipWithIndex.map { case (p, i) =>
      when(dot(col(qVecCol), typedlit(p.take(dim))) > 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val q = queries.select(col(qIdCol).as("query_id"),
      col(qVecCol).as("__qvec"), qBucket.as("__qbucket"))
    va.withColumn("__bucket", cBucket)
      .crossJoin(broadcast(q))
      .filter(bit_count(col("__bucket").bitwiseXOR(col("__qbucket"))) <= probe)
      .select(col("query_id"), col(idCol),
        dot(col(vecCol), col("__qvec")).as("ip"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("ip").desc, col(idCol))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col(idCol),
        round(col("ip"), 6).as("ip"), col("rk"))
  }

  /** The deployed form of sign-LSH: land the corpus hive-partitioned BY
    * BUCKET (computed once at ingest), answer queries by reading only the
    * buckets within hamming distance `probe` of the query's bucket — the
    * probe set resolves against directory names (PartitionFilters), so
    * the other ~(1 − probed/2^nBits) of the corpus is never opened. This
    * closes the "bucket must be precomputed" deployment note on
    * [[annCosineTopK]]: the inline form is the semantics, this is the
    * I/O-winning layout. */
  def lshCosineTopKPruned(spark: org.apache.spark.sql.SparkSession,
      vectors: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String, k: Int,
      nBits: Int, dim: Int, probe: Int, layoutDir: String): DataFrame = {
    val success = new org.apache.hadoop.fs.Path(s"$layoutDir/_SUCCESS")
    val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(success)) {
      vectors.withColumn("bucket", lshBucket(col(vecCol), nBits, dim))
        .write.mode("overwrite").partitionBy("bucket").parquet(layoutDir)
    }
    val corpus = spark.read.parquet(layoutDir)
    val q = withNorm(query, queryVecCol)
      .select(col(queryVecCol).as("__qvec"), col("__norm").as("__qnorm"),
        lshBucket(col(queryVecCol), nBits, dim).as("__qbucket"))
    // probe-set enumeration is O(2^nBits) driver arithmetic on the 1-row
    // query's bucket — no data touched
    val qb = q.select("__qbucket").collect()(0).getLong(0)
    val probes = (0 until (1 << nBits))
      .filter(b => java.lang.Long.bitCount(b ^ qb) <= probe)
      .map(_.toLong)
    corpus.filter(col("bucket").isin(probes: _*)) // -> PartitionFilters
      .crossJoin(broadcast(q.drop("__qbucket")))
      .select(col(idCol),
        (dot(col(vecCol), col("__qvec")) /
          (norm(col(vecCol)) * col("__qnorm"))).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("cos"), 6).as("cos_sim"))
  }

  // ---- ANN: IVF (inverted-file) coarse quantizer — the second scale path

  /** Train a coarse quantizer: k spherical-k-means centroids fit on a
    * driver-side sample (FAISS-style — quantizer training uses a bounded
    * sample regardless of corpus size, so this collect is O(sampleN·d),
    * NOT O(corpus)). The sample is drawn by ranking on a seeded hash of the
    * vector and keeping the first `sampleN` — a TakeOrderedAndProject
    * (per-partition heap of sampleN, k-row driver merge), so it is a
    * deterministic uniform-ish sample in ONE pass with no count action and
    * driver memory hard-capped at sampleN·d floats at any corpus size.
    * Cosine metric: vectors and centroids are L2-normalized and Lloyd
    * updates maximize dot product. Deterministic: seeded sample, seeded
    * init, fixed iteration count. */
  /** The hash-ranked, hard-bounded, L2-normalized training sample — ONE
    * scan (TakeOrderedAndProject: per-partition heap of sampleN, k-row
    * driver merge) shared by BOTH quantizer trainers, so composed
    * IVF+PQ training costs a single corpus pass. Driver memory is
    * O(sampleN·d) at any corpus size. */
  private[graft] def sampleUnitVectors(vectors: DataFrame, vecCol: String,
      sampleN: Int, seed: Long): Array[Array[Float]] = {
    def normalize(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (n == 0) v else v.map(x => (x / n).toFloat)
    }
    vectors.select(col(vecCol))
      .orderBy(xxhash64(col(vecCol), lit(seed)))
      .limit(sampleN)
      .collect().map(_.getSeq[Float](0).toArray).map(normalize)
  }

  def ivfTrain(vectors: DataFrame, vecCol: String, nCentroids: Int,
      sampleN: Int = 4096, iters: Int = 8,
      seed: Long = 42L): Array[Array[Float]] =
    ivfTrainOnSample(sampleUnitVectors(vectors, vecCol, sampleN, seed),
      nCentroids, iters, seed)

  /** Lloyd iterations on an already-collected normalized sample (see
    * [[sampleUnitVectors]]); split out so IVF+PQ training shares one
    * sample scan. */
  private[graft] def ivfTrainOnSample(sample: Array[Array[Float]],
      nCentroids: Int, iters: Int = 8,
      seed: Long = 42L): Array[Array[Float]] = {
    def normalize(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (n == 0) v else v.map(x => (x / n).toFloat)
    }
    require(sample.length >= nCentroids, "sample smaller than nCentroids")
    val rnd = new scala.util.Random(seed)
    var centroids = rnd.shuffle(sample.indices.toList).take(nCentroids)
      .map(sample(_)).toArray
    for (_ <- 1 to iters) {
      val sums = Array.fill(nCentroids)(new Array[Double](sample.head.length))
      val counts = new Array[Int](nCentroids)
      sample.foreach { v =>
        var best = 0; var bestDot = Double.MinValue
        for (c <- centroids.indices) {
          var d = 0.0
          for (i <- v.indices) d += v(i).toDouble * centroids(c)(i)
          if (d > bestDot) { bestDot = d; best = c }
        }
        counts(best) += 1
        for (i <- v.indices) sums(best)(i) += v(i)
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c) // keep empty cells stable
        else normalize(sums(c).map(_.toFloat))
      }.toArray
    }
    centroids
  }

  /** Per-row nearest-centroid cell id (map-only projection: nCentroids
    * codegen'd dot products, no shuffle). Centroids are unit vectors, so
    * argmax dot == argmax cosine. */
  def ivfCell(vec: Column, centroids: Array[Array[Float]]): Column = {
    val scores = array(centroids.map(c => dot(vec, typedlit(c.toSeq))): _*)
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** Approximate cosine top-k via IVF: assign every vector to its nearest
    * coarse centroid, probe only the query's `nProbe` nearest cells, exact
    * cosine rerank on those candidates.
    *
    * Scale shape: assignment is a projection (precompute + partition the
    * corpus BY `__cell` at ingest time and a query reads ~nProbe/nCentroids
    * of the data via partition pruning); the probe-set computation is a
    * 1-row broadcast; rerank plans as TakeOrderedAndProject. nProbe =
    * nCentroids degenerates to exact brute force (spec-verified). */
  def ivfCosineTopK(vectors: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, seed: Long = 42L): DataFrame = {
    val centroids = ivfTrain(vectors, vecCol, nCentroids, seed = seed)
    val v = withNorm(vectors, vecCol)
      .withColumn("__cell", ivfCell(col(vecCol), centroids))
    // query probe set: indices of the nProbe highest-scoring centroids,
    // computed as an expression so multi-query batches stay distributed.
    val qScored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct((-dot(col(queryVecCol), typedlit(c.toSeq))).as("neg"),
        lit(i).as("i"))
    }: _*)
    val q = withNorm(query, queryVecCol)
      .select(col(queryVecCol).as("__qvec"), col("__norm").as("__qnorm"),
        transform(slice(sort_array(qScored), 1, nProbe), s => s("i"))
          .as("__probes"))
    v.crossJoin(broadcast(q))
      .filter(array_contains(col("__probes"), col("__cell")))
      .select(col(idCol),
        (dot(col(vecCol), col("__qvec")) / (col("__norm") * col("__qnorm")))
          .as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("cos"), 6).as("cos_sim"))
  }

  /** The deployed form of IVF: land the corpus hive-partitioned BY CELL
    * (`partitionBy("cell")` at ingest), then answer queries by reading only
    * the probed cells' partitions — the `cell IN (probes)` filter resolves
    * against directory names (PartitionFilters), so (nCentroids − nProbe)/
    * nCentroids of the data is never opened. This is what makes IVF an
    * actual I/O win at 100 TB rather than a compute filter.
    *
    * `layoutDir` is written once if absent (idempotent); `centroids` must
    * be the same quantizer used for the layout (pass the ivfTrain result).
    */
  def ivfCosineTopKPruned(spark: org.apache.spark.sql.SparkSession,
      vectors: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String, k: Int,
      centroids: Array[Array[Float]], nProbe: Int,
      layoutDir: String): DataFrame = {
    // Hadoop FS probe (not java.io.File) so the layout works on any
    // filesystem the cluster reads — HDFS/object stores, not just local
    val success = new org.apache.hadoop.fs.Path(s"$layoutDir/_SUCCESS")
    val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(success)) {
      vectors.withColumn("cell", ivfCell(col(vecCol), centroids))
        .write.mode("overwrite").partitionBy("cell").parquet(layoutDir)
    }
    ivfQueryLayout(spark, layoutDir, idCol, vecCol,
      query, queryVecCol, k, centroids, nProbe)
  }

  /** FILTERED ANN — the production retrieval shape (metadata predicate
    * PLUS vector similarity): top-k cosine among corpus rows whose
    * `labelCol` equals `labelVal`, answered from a layout partitioned
    * by (label, cell). The categorical filter becomes a PARTITION
    * dimension rather than a post-filter, which matters twice at scale:
    * (a) I/O — both predicates resolve against directory names
    * (`PartitionFilters: label = L, cell IN (probes)`), so the scan
    * reads (probed cells of one label)/(labels × cells) of the corpus;
    * (b) recall — filtering AFTER probing a label-agnostic layout
    * starves top-k under selective predicates (a label owning 1% of
    * rows yields ~k/100 eligible candidates per probe), while
    * per-(label, cell) partitions make the search exactly an
    * unfiltered IVF over that label's sub-corpus. One quantizer is
    * trained on the WHOLE corpus (pass the ivfTrain result) — labels
    * share geometry; only the layout is label-split. High-cardinality
    * or range predicates belong in row-group stats (the z-order tier),
    * not partitions — this op is the CATEGORICAL case. */
  def ivfFilteredTopK(spark: org.apache.spark.sql.SparkSession,
      vectors: DataFrame, idCol: String, vecCol: String,
      labelCol: String, labelVal: Int,
      query: DataFrame, queryVecCol: String, k: Int,
      centroids: Array[Array[Float]], nProbe: Int,
      layoutDir: String): DataFrame = {
    val success = new org.apache.hadoop.fs.Path(s"$layoutDir/_SUCCESS")
    val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // centroid fingerprint sidecar (underscore-prefixed → invisible to
    // parquet listing, like _SUCCESS): a layout written under OLD
    // centroids must not serve a query probing NEW ones — cell
    // assignment and probe math would disagree, silently degrading
    // recall. A fingerprint mismatch (or a pre-fingerprint layout)
    // forces a rebuild. CORPUS content changes are the caller's cache
    // key (key layoutDir on the source fixture, as the registry does —
    // fingerprinting the corpus here would cost a full pass per query).
    val fpPath = new org.apache.hadoop.fs.Path(s"$layoutDir/_centroids.fp")
    val fpStr = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val bb = java.nio.ByteBuffer.allocate(4)
      centroids.foreach(_.foreach { f =>
        bb.clear(); bb.putFloat(f); md.update(bb.array())
      })
      md.digest().map("%02x".format(_)).mkString
    }
    val fresh = fs.exists(success) && fs.exists(fpPath) && {
      val in = fs.open(fpPath)
      val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      got == fpStr
    }
    if (!fresh) {
      vectors.withColumn("cell", ivfCell(col(vecCol), centroids))
        .write.mode("overwrite").partitionBy(labelCol, "cell")
        .parquet(layoutDir)
      val out = fs.create(fpPath, true)
      try out.write(fpStr.getBytes("UTF-8")) finally out.close()
    }
    ivfQueryLayout(spark, layoutDir, idCol, vecCol, query, queryVecCol,
      k, centroids, nProbe, extraFilter = col(labelCol) === labelVal)
  }

  /** Maintenance compaction for an incrementally-built layout
    * (`cell=K/__batch_id=N`, or `label=L/cell=K/__batch_id=N` from the
    * filtered streaming ingest): drop ONLY the `__batch_id` dimension —
    * one listing entry per (remaining dims) instead of one per batch —
    * preserving every other partition dimension (detected from the
    * directory tree, so a labeled layout keeps its label
    * PartitionFilters), sorted by id within partitions for rerank
    * row-group stats. OFFLINE op by contract: run between
    * streams, not under a live writer (the swap is write-new /
    * delete-old / rename, the standard index-rebuild window — unlike
    * the per-batch folds this needs no replay story because no epoch is
    * in flight). Readers see either the old or the new complete layout:
    * the rename is the commit point. */
  def compactIvfLayout(spark: org.apache.spark.sql.SparkSession,
      layoutDir: String, idCol: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(layoutDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(layoutDir + "__compact_tmp")
    // preserve EVERY partition dimension except the batch one: the
    // streamed layouts are cell=K/__batch_id=N (label-agnostic) or
    // label=L/cell=K/__batch_id=N (the filtered-ANN tier) — flattening
    // a labeled layout to cell-only would silently drop the label
    // PartitionFilters that tier exists for. Dimensions are detected
    // from the directory tree itself (a `label` DATA column in an
    // unpartitioned pq layout must not become a partition column).
    def partDims(p: org.apache.hadoop.fs.Path): Seq[String] = {
      if (!fs.exists(p)) return Nil
      val dirs = fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      val names = dirs.map(_.getPath.getName)
      if (names.nonEmpty && names.forall(_.contains("="))) {
        val dim = names.head.takeWhile(_ != '=')
        if (names.forall(_.startsWith(dim + "=")))
          dim +: partDims(dirs.head.getPath)
        else Nil
      } else Nil
    }
    val dims = partDims(root).filterNot(_ == "__batch_id")
    val df = spark.read.parquet(layoutDir).drop("__batch_id")
    if (dims.nonEmpty)
      df.sortWithinPartitions((dims.map(col) :+ col(idCol)): _*)
        .write.mode("overwrite").partitionBy(dims: _*).parquet(tmp.toString)
    else df.sortWithinPartitions(col(idCol))
      .write.mode("overwrite").parquet(tmp.toString)
    // carry underscore-prefixed sidecars (e.g. the _centroids.fp
    // freshness fingerprint) into the compacted layout — dropping one
    // would make the next fingerprint-gated reader treat the freshly
    // compacted layout as stale and rebuild it, discarding the
    // compaction. _SUCCESS is excluded: the tmp write produced its own.
    fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("_") &&
        s.getPath.getName != "_SUCCESS")
      .foreach { s =>
        org.apache.hadoop.fs.FileUtil.copy(fs, s.getPath, fs,
          new org.apache.hadoop.fs.Path(tmp, s.getPath.getName),
          false, spark.sparkContext.hadoopConfiguration)
      }
    fs.delete(root, true)
    require(fs.rename(tmp, root), s"rename $tmp -> $root failed")
  }

  /** Answer a query from an EXISTING cell-partitioned IVF layout —
    * whatever wrote it (the batch ensure above, or the streaming
    * incremental ingest). Probe selection is driver-side math over the
    * centroid table; the scan reads only the probed cells' partitions
    * (PartitionFilters). */
  def ivfQueryLayout(spark: org.apache.spark.sql.SparkSession,
      layoutDir: String, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String, k: Int,
      centroids: Array[Array[Float]], nProbe: Int,
      extraFilter: Column = lit(true)): DataFrame = {
    val corpus = spark.read.parquet(layoutDir).filter(extraFilter)
    val qScored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct((-dot(col(queryVecCol), typedlit(c.toSeq))).as("neg"),
        lit(i).as("i"))
    }: _*)
    val q = withNorm(query, queryVecCol)
      .select(col(queryVecCol).as("__qvec"), col("__norm").as("__qnorm"),
        transform(slice(sort_array(qScored), 1, nProbe), s => s("i"))
          .as("__probes"))
    val probes = q.select(explode(col("__probes")).as("p"))
      .collect().map(_.getInt(0))
    corpus.filter(col("cell").isin(probes: _*)) // -> PartitionFilters
      .crossJoin(broadcast(q.drop("__probes")))
      .select(col(idCol),
        (dot(col(vecCol), col("__qvec")) /
          (norm(col(vecCol)) * col("__qnorm"))).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("cos"), 6).as("cos_sim"))
  }

  // ---- Product quantization (FAISS-style PQ) — the memory-compression
  // path: a d-dim float corpus stores as M byte-codes per vector (32×
  // smaller at d=64, M=8), queries score codes via per-subspace lookup
  // tables (ADC), exact rerank on the survivors.

  /** Train PQ codebooks: split the (L2-normalized) vectors into `m`
    * subvectors of d/m dims; per subspace, k-means with `k` centroids on
    * a bounded sample (same hash-ranked sampling contract as
    * [[ivfTrain]]: driver memory O(sampleN·d) at ANY corpus size).
    * Returns codebooks(m)(k)(d/m). Deterministic (seeded). */
  def pqTrain(vectors: DataFrame, vecCol: String, m: Int = 8, k: Int = 16,
      sampleN: Int = 4096, iters: Int = 8,
      seed: Long = 42L): Array[Array[Array[Float]]] =
    pqTrainOnSample(sampleUnitVectors(vectors, vecCol, sampleN, seed),
      m, k, iters, seed)

  /** Per-subspace k-means on an already-collected normalized sample —
    * the shared-sample twin of [[pqTrain]]. */
  private[graft] def pqTrainOnSample(sample: Array[Array[Float]],
      m: Int = 8, k: Int = 16, iters: Int = 8,
      seed: Long = 42L): Array[Array[Array[Float]]] = {
    require(sample.length >= k, "sample smaller than k")
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dsub = d / m
    val rnd = new scala.util.Random(seed)
    Array.tabulate(m) { mi =>
      val subs = sample.map(_.slice(mi * dsub, (mi + 1) * dsub))
      var cents = rnd.shuffle(subs.indices.toList).take(k)
        .map(subs(_)).toArray
      for (_ <- 1 to iters) {
        val sums = Array.fill(k)(new Array[Double](dsub))
        val counts = new Array[Int](k)
        subs.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          for (c <- cents.indices) {
            var dist = 0.0
            for (i <- 0 until dsub) {
              val df = v(i).toDouble - cents(c)(i)
              dist += df * df
            }
            if (dist < bestD) { bestD = dist; best = c }
          }
          counts(best) += 1
          for (i <- 0 until dsub) sums(best)(i) += v(i)
        }
        cents = cents.indices.map { c =>
          if (counts(c) == 0) cents(c)
          else sums(c).map(x => (x / counts(c)).toFloat)
        }.toArray
      }
      cents
    }
  }

  /** PQ-encode a NORMALIZED vector column: per subspace, the id of the
    * L2-nearest codebook centroid — an array of `m` small ints (the
    * byte-code column an index stores instead of floats). Map-only:
    * argmin ‖x−c‖² = argmax (x·c − ‖c‖²/2). Production form is the
    * codegen'd expression (graft.functions.PqEncode) — encode is the
    * ingest hot path of the persisted/streaming PQ tiers, and the
    * composed form's lambda bodies evaluate interpreted inside the HOF.
    * VectorOpsSpec pins exact equality between the two. */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    graft.functions.PqEncode.pqEncode(vec, codebooks)

  /** Composed-Column twin of [[pqEncode]] (the spec's equality
    * reference). */
  def pqEncodeComposed(vec: Column, codebooks: Array[Array[Array[Float]]]): Column = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val codes = (0 until m).map { mi =>
      // let-bound: the subvector slice feeds k score expressions (HOF
      // lambdas have no CSE — unbound it would re-slice per centroid)
      let1(slice(vec, mi * dsub + 1, dsub), sub => {
        val scores = array(codebooks(mi).map { c =>
          val half = (c.map(x => x.toDouble * x).sum / 2.0).toFloat
          dot(sub, typedlit(c.toSeq)) - lit(half)
        }: _*)
        (array_position(scores, array_max(scores)) - 1).cast("int")
      })
    }
    array(codes: _*)
  }

  /** ADC (asymmetric distance computation) score: the query precomputes
    * per-subspace lookup tables `lut(m)(c) = q̂_m · centroid_c`; a code
    * array scores as Σ_m lut(m)(code_m) ≈ q̂ · x̂ (= cosine, both sides
    * normalized). M element_at lookups per row — codegen-friendly, no
    * float vectors touched at query time. */
  def pqAdcScore(codes: Column, lut: Array[Array[Float]]): Column =
    lut.zipWithIndex.map { case (t, mi) =>
      element_at(typedlit(t.toSeq),
        element_at(codes, mi + 1) + 1).cast("double")
    }.reduce(_ + _)

  /** PQ-ANN cosine top-k: normalize corpus + query, encode corpus to M
    * byte-codes (at ingest in a deployment — the index IS the codes),
    * ADC-score all codes against the query's lookup tables, keep the
    * top `rerank` candidates (TakeOrderedAndProject), exact-rerank to
    * top `k`. The scan touches only (id, codes) — at 100 TB the float
    * vectors are read for just `rerank` rows. */
  def pqCosineTopK(vectors: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String, k: Int,
      m: Int = 8, kCent: Int = 16, rerank: Int = 40,
      seed: Long = 42L): DataFrame = {
    val codebooks = pqTrain(vectors, vecCol, m, kCent, seed = seed)
    val dsub = codebooks(0)(0).length
    // normalized corpus, encoded once (map-only). The norm is let-bound:
    // inlined into the transform lambda it would recompute the full dot
    // per ELEMENT (the O(d²) HOF no-CSE pitfall)
    val unit = let1(norm(col(vecCol)), nrm =>
      transform(col(vecCol), x => (x.cast("double") / nrm).cast("float")))
    val v = vectors
      .withColumn("__unit", unit)
      .withColumn("__codes", pqEncode(col("__unit"), codebooks))
    // query: 1-row bounded collect to build the M×K lookup tables
    val qv = query.select(col(queryVecCol)).collect()(0)
      .getSeq[Float](0).toArray
    val qn = math.sqrt(qv.map(x => x.toDouble * x).sum)
    val qhat = if (qn == 0) qv else qv.map(x => (x / qn).toFloat)
    val lut = Array.tabulate(m) { mi =>
      codebooks(mi).map { c =>
        var s = 0.0
        for (i <- 0 until dsub) s += qhat(mi * dsub + i).toDouble * c(i)
        s.toFloat
      }
    }
    val cand = v
      .select(col(idCol), col(vecCol),
        pqAdcScore(col("__codes"), lut).as("__adc"))
      .orderBy(col("__adc").desc, col(idCol))
      .limit(rerank)
    // exact rerank on the survivors
    val q = withNorm(query, queryVecCol)
      .select(col(queryVecCol).as("__qvec"), col("__norm").as("__qnorm"))
    cand.crossJoin(broadcast(q))
      .select(col(idCol),
        (dot(col(vecCol), col("__qvec")) / (norm(col(vecCol)) * col("__qnorm")))
          .as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("cos"), 6).as("cos_sim"))
  }

  /** IVF+PQ — the composed FAISS index shape for billion-vector search:
    * the coarse quantizer prunes to `nProbe` of `nCentroids` cells
    * (partition pruning in the deployed layout), PQ codes score the
    * surviving cells' vectors via ADC lookup tables (no floats touched),
    * exact rerank on the top `rerank`. I/O scales with nProbe/nCentroids
    * of the corpus AND each scanned row is M bytes instead of 4·d —
    * the two compressions multiply. Training stays hard-bounded
    * (both quantizers sample via the hash-ranked top-N contract). */
  def ivfPqCosineTopK(vectors: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, m: Int = 8, kCent: Int = 16,
      rerank: Int = 40, seed: Long = 42L): DataFrame = {
    val sample = sampleUnitVectors(vectors, vecCol, 4096, seed)
    val centroids = ivfTrainOnSample(sample, nCentroids, seed = seed)
    val codebooks = pqTrainOnSample(sample, m, kCent, seed = seed)
    val dsub = codebooks(0)(0).length
    val unit = let1(norm(col(vecCol)), nrm =>
      transform(col(vecCol), x => (x.cast("double") / nrm).cast("float")))
    val v = vectors
      .withColumn("__cell", ivfCell(col(vecCol), centroids))
      .withColumn("__codes", pqEncode(unit, codebooks))
    // query driver-side (1-row bounded collect): probe set + ADC tables
    val qv = query.select(col(queryVecCol)).collect()(0)
      .getSeq[Float](0).toArray
    val qn = math.sqrt(qv.map(x => x.toDouble * x).sum)
    val qhat = if (qn == 0) qv else qv.map(x => (x / qn).toFloat)
    val probes = centroids.zipWithIndex.map { case (c, i) =>
      var s = 0.0
      for (j <- c.indices) s += qhat(j).toDouble * c(j)
      (-s, i)
    }.sorted.take(nProbe).map(_._2)
    val lut = Array.tabulate(m) { mi =>
      codebooks(mi).map { c =>
        var s = 0.0
        for (i <- 0 until dsub) s += qhat(mi * dsub + i).toDouble * c(i)
        s.toFloat
      }
    }
    val cand = v.filter(col("__cell").isin(probes.map(Integer.valueOf): _*))
      .select(col(idCol), col(vecCol),
        pqAdcScore(col("__codes"), lut).as("__adc"))
      .orderBy(col("__adc").desc, col(idCol))
      .limit(rerank)
    val q = withNorm(query, queryVecCol)
      .select(col(queryVecCol).as("__qvec"), col("__norm").as("__qnorm"))
    cand.crossJoin(broadcast(q))
      .select(col(idCol),
        (dot(col(vecCol), col("__qvec")) / (norm(col(vecCol)) * col("__qnorm")))
          .as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("cos"), 6).as("cos_sim"))
  }

  // ---- Persisted PQ index (the deployed form of PQ / IVF+PQ) ----------
  // The inline pqCosineTopK/ivfPqCosineTopK forms re-train and re-encode
  // the corpus per query — fine as semantics, a scale-killer as a
  // deployment (the O(corpus) encode negates PQ's purpose: query time
  // should touch only stored byte-codes). These land the index ONCE:
  //   layoutDir/            (id, vec, codes)  [partitionBy(cell) if IVF]
  //   layoutDir/_model/     quantizer centroids + PQ codebooks (parquet;
  //                         "_"-prefixed so data scans never list it)
  // and answer queries from it: the ADC pass reads ONLY (id, codes) —
  // column pruning keeps the float vectors unread — and the exact rerank
  // re-reads the layout with an `id IN (top-rerank ids)` pushed filter,
  // so floats are fetched for just `rerank` rows (row-group stats skip
  // the rest; sort by id at ingest to maximize the skip). With IVF cells
  // the probe filter additionally prunes whole partitions.

  /** Trained quantizers of a persisted PQ layout: `centroids` empty for
    * a flat (non-IVF) PQ index. */
  case class PqIndexModel(centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]])

  private def modelDir(layoutDir: String) = s"$layoutDir/_model"

  private def saveModel(spark: org.apache.spark.sql.SparkSession,
      dir: String, model: PqIndexModel): Unit = {
    import spark.implicits._
    val rows =
      model.centroids.zipWithIndex.toSeq
        .map { case (c, i) => ("ivf", i, c.toSeq) } ++
      model.codebooks.zipWithIndex.toSeq.flatMap { case (cb, mi) =>
        cb.zipWithIndex.map { case (c, i) => (s"pq:$mi", i, c.toSeq) } }
    rows.toDF("part", "idx", "vec").repartition(1)
      .write.mode("overwrite").parquet(dir)
  }

  private def loadModel(spark: org.apache.spark.sql.SparkSession,
      dir: String): PqIndexModel = {
    val rows = spark.read.parquet(dir).collect()
    val centroids = rows.filter(_.getString(0) == "ivf")
      .sortBy(_.getInt(1)).map(_.getSeq[Float](2).toArray)
    val codebooks = rows.filter(_.getString(0).startsWith("pq:"))
      .groupBy(_.getString(0).stripPrefix("pq:").toInt)
      .toArray.sortBy(_._1)
      .map { case (_, rs) =>
        rs.sortBy(_.getInt(1)).map(_.getSeq[Float](2).toArray) }
    PqIndexModel(centroids, codebooks)
  }

  /** Train-only: both quantizers from ONE shared sample scan, no landing
    * — the streaming ingest tier needs the model before any row lands.
    * Same sample/seed contract as [[pqLayoutEnsure]], so a layout built
    * incrementally with this model is code-identical to the batch one. */
  def pqTrainModel(vectors: DataFrame, vecCol: String, nCentroids: Int = 0,
      m: Int = 8, kCent: Int = 16, sampleN: Int = 4096,
      seed: Long = 42L): PqIndexModel = {
    val sample = sampleUnitVectors(vectors, vecCol, sampleN, seed)
    val centroids =
      if (nCentroids > 0) ivfTrainOnSample(sample, nCentroids, seed = seed)
      else Array.empty[Array[Float]]
    PqIndexModel(centroids, pqTrainOnSample(sample, m, kCent, seed = seed))
  }

  /** Map-only encode with a FROZEN model: (id, vec, codes[, cell]) — the
    * projection the batch landing and the streaming incremental ingest
    * share (normalization let-bound: one unit vector per row, not per
    * subspace). */
  def pqEncodeRows(vectors: DataFrame, idCol: String, vecCol: String,
      model: PqIndexModel): DataFrame = {
    val unit = let1(norm(col(vecCol)), nrm =>
      transform(col(vecCol), x => (x.cast("double") / nrm).cast("float")))
    val encoded = vectors.select(col(idCol), col(vecCol))
      .withColumn("codes", let1(unit, u => pqEncode(u, model.codebooks)))
    if (model.centroids.nonEmpty)
      encoded.withColumn("cell", ivfCell(col(vecCol), model.centroids))
    else encoded
  }

  /** Idempotently build the persisted PQ index: train both quantizers on
    * ONE shared sample scan, encode the corpus in a single map-only pass
    * (the normalization is let-bound so the unit vector is computed once
    * per row, not once per subspace), land (id, vec, codes)
    * `partitionBy(cell)` when `nCentroids > 0`, then write the model —
    * model-write-last makes the `_model/_SUCCESS` probe a completeness
    * check for the whole layout. Returns the (loaded or trained) model. */
  def pqLayoutEnsure(spark: org.apache.spark.sql.SparkSession,
      vectors: DataFrame, idCol: String, vecCol: String, layoutDir: String,
      nCentroids: Int = 0, m: Int = 8, kCent: Int = 16,
      sampleN: Int = 4096, seed: Long = 42L): PqIndexModel = {
    val success = new org.apache.hadoop.fs.Path(
      s"${modelDir(layoutDir)}/_SUCCESS")
    val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(success)) return loadModel(spark, modelDir(layoutDir))
    val model = pqTrainModel(vectors, vecCol, nCentroids, m, kCent,
      sampleN, seed)
    val encoded = pqEncodeRows(vectors, idCol, vecCol, model)
    // sortWithinPartitions(id): tight per-row-group id min/max stats, so
    // the rerank stage's pushed id-IN filter skips row groups instead of
    // scanning every float page (no extra shuffle — sort is per-partition).
    // The IVF branch leads with the partition column: otherwise the
    // partitioned writer inserts its own (unstable) cell sort and the id
    // order inside each file is lost (the writeShuffled lesson).
    if (model.centroids.nonEmpty)
      encoded.sortWithinPartitions(col("cell"), col(idCol))
        .write.mode("overwrite").partitionBy("cell").parquet(layoutDir)
    else encoded.sortWithinPartitions(col(idCol))
      .write.mode("overwrite").parquet(layoutDir)
    saveModel(spark, modelDir(layoutDir), model)
    model
  }

  /** Per-subspace ADC lookup tables for a normalized query vector. */
  private def adcLut(codebooks: Array[Array[Array[Float]]],
      qhat: Array[Float]): Array[Array[Float]] = {
    val dsub = codebooks(0)(0).length
    Array.tabulate(codebooks.length) { mi =>
      codebooks(mi).map { c =>
        var s = 0.0
        for (i <- 0 until dsub) s += qhat(mi * dsub + i).toDouble * c(i)
        s.toFloat
      }
    }
  }

  /** The ADC candidate stage over a persisted layout: scan touches ONLY
    * (id, codes) — the float column is never in the ReadSchema — and an
    * IVF model's probe set prunes cell partitions (PartitionFilters).
    * Package-private so specs can assert exactly that on its plan. */
  private[graft] def adcCandidates(spark: org.apache.spark.sql.SparkSession,
      layoutDir: String, model: PqIndexModel, idCol: String,
      qhat: Array[Float], rerank: Int, nProbe: Int): DataFrame = {
    val lut = adcLut(model.codebooks, qhat)
    val layout = spark.read.parquet(layoutDir)
    val probed =
      if (model.centroids.isEmpty) layout
      else {
        val probes = model.centroids.zipWithIndex.map { case (c, i) =>
          var s = 0.0
          for (j <- c.indices) s += qhat(j).toDouble * c(j)
          (-s, i)
        }.sorted.take(nProbe).map(_._2)
        layout.filter(col("cell")
          .isin(probes.map(Integer.valueOf).toIndexedSeq: _*))
      }
    probed
      .select(col(idCol), pqAdcScore(col("codes"), lut).as("__adc"))
      .orderBy(col("__adc").desc, col(idCol))
      .limit(rerank)
  }

  /** Query a persisted PQ layout (see [[pqLayoutEnsure]]): ADC-score the
    * stored codes (scan touches only (id, codes); cells pruned via
    * PartitionFilters when the model has an IVF quantizer), keep the top
    * `rerank`, then exact-rerank by re-reading the layout with the
    * bounded `id IN (...)` pushed filter — float vectors are read for
    * `rerank` rows only. Results are identical to the inline
    * pqCosineTopK/ivfPqCosineTopK given the same seed (same sample ⇒
    * same quantizers ⇒ same codes; spec-asserted). */
  def pqCosineTopKFromLayout(spark: org.apache.spark.sql.SparkSession,
      layoutDir: String, model: PqIndexModel, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String, k: Int,
      rerank: Int = 40, nProbe: Int = 4): DataFrame = {
    // 1-row bounded collect: normalized query, probe set, ADC tables
    val qv = query.select(col(queryVecCol)).collect()(0)
      .getSeq[Float](0).toArray
    val qn = math.sqrt(qv.map(x => x.toDouble * x).sum)
    val qhat = if (qn == 0) qv else qv.map(x => (x / qn).toFloat)
    val cand = adcCandidates(spark, layoutDir, model, idCol, qhat,
      rerank, nProbe)
    // bounded collect (≤ rerank rows) so the float fetch is a PUSHED
    // id-IN filter on the layout scan, not a join over all floats
    val candIds = cand.select(col(idCol)).collect().map(_.get(0))
    val floats = spark.read.parquet(layoutDir)
      .filter(col(idCol).isin(candIds.toIndexedSeq: _*))
      .select(col(idCol), col(vecCol))
    val q = withNorm(query, queryVecCol)
      .select(col(queryVecCol).as("__qvec"), col("__norm").as("__qnorm"))
    floats.crossJoin(broadcast(q))
      .select(col(idCol),
        (dot(col(vecCol), col("__qvec")) / (norm(col(vecCol)) * col("__qnorm")))
          .as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("cos"), 6).as("cos_sim"))
  }

  /** Evaluate `bound` once per row for `body`-many uses (1-element
    * transform let-binding — HOFs have no CSE; see TextDedupe.let1). */
  private def let1(bound: Column, body: Column => Column): Column =
    element_at(transform(array(bound), body), 1)

  /** Symmetric per-vector int8 quantization — the embedding STORAGE
    * operator at 100 TB: a float32 corpus stores 4× smaller as int8 +
    * one float scale per vector, which is what makes billion-vector
    * indexes disk-resident. q_i = round_half_up(x_i·127/max|x|); the
    * scale to dequantize is max|x|/127. Pure column expression (map-only,
    * no shuffle); round_half_up is spelled floor(v+0.5) because that is
    * bit-identical across engines, while native round(double) is not.
    * max|x| is let-bound — inlined it would re-scan the vector per
    * element (O(d²), the HOF no-CSE pitfall). */
  def quantizeInt8(vec: Column): Column =
    let1(array_max(transform(vec, x => abs(x.cast("double")))), maxabs =>
      when(maxabs === 0.0, transform(vec, _ => lit(0)))
        .otherwise(transform(vec, x =>
          floor(x.cast("double") / maxabs * 127.0 + 0.5).cast("int"))))

  /** Pairwise cosine-similarity join with optional equality blocking.
    * blockCol None ⇒ full self-join (exact; quadratic — test scale only). */
  /** IVF-cell-blocked near-duplicate pairs: candidates are generated
    * ONLY within coarse-quantizer cells, then exact-cosine verified —
    * the scale path for semantic dedup, replacing label/all-pairs
    * blocking whose worst block degrades to quadratic. Each vector is
    * assigned to its `nAssign` nearest cells (multi-probe assignment:
    * a pair straddling a cell boundary still shares a cell as long as
    * both rank it among their `nAssign` nearest — this is the recall
    * knob, spec-pinned to 1.0 recall vs the exact tier on clustered
    * data). The within-cell self-join keys on the cell id — the only
    * exchange carries O(n·nAssign) vector rows, and the pair stream
    * is GENERATED inside join partitions and pipelined straight into
    * the codegen'd dot + threshold filter: candidate pairs are never
    * materialized or shuffled. Duplicate candidates from pairs
    * sharing several cells collapse with one distinct on the verified
    * (small) output. The exact verify keeps precision at 1 regardless
    * of the quantizer. Output matches [[pairwiseCosine]] (id1 < id2,
    * round-6 cos_sim) whenever recall is 1.
    *
    * Parameter scaling, MEASURED (r14, sf0.01/sf0.1/sf1 embeddings at
    * this repo's 0.45-threshold entry): recall 1.0 holds at (nc=16,
    * na=6) at every SF and at (nc=32, na=8) at sf1, but every
    * recall-1.0 setting found satisfies na² ≳ nc/2 — i.e. at a 0.45
    * cosine threshold (≈63°, a semantic-similarity band) cell
    * blocking does NOT prune asymptotically on this corpus: pair
    * volume stays Θ(n²·na²/nc), and raising nc to √n scale (the
    * classic IVF balance point) drops recall to 0.67–0.87 at every
    * SF. That is a property of the THRESHOLD, not the plan — matching
    * pairs 63° apart straddle any fine quantization. At real near-dup
    * thresholds (≥0.9, ≈26°) blocking tightens and nc can scale with
    * the corpus; for wide semantic bands the honest choices are a
    * tighter threshold or an explicitly approximate (recall<1)
    * contract. Also measured (r14): rewriting this as an ids-only
    * candidate join + distinct-before-verify is 1.7× SLOWER at sf1
    * (71.5 s vs 42 s isolated) — the distinct materializes and
    * shuffles the Θ(n²) candidate stream that this form merely
    * streams, and the ~2× duplicate-dot saving cannot pay for it.
    * Keep the streaming shape. */
  def ivfPairwiseCosine(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nCentroids: Int = 16, nAssign: Int = 3,
      seed: Long = 42L): DataFrame = {
    val centroids = ivfTrain(vectors, vecCol, nCentroids, seed = seed)
    val v = multiAssign(withNorm(vectors, vecCol), vecCol, centroids, nAssign)
    val a = v.select(v.columns.map(c => col(c).as(s"a_$c")).toIndexedSeq: _*)
    val b = v.select(v.columns.map(c => col(c).as(s"b_$c")).toIndexedSeq: _*)
    a.join(b, col("a___cell") === col("b___cell") &&
        col(s"a_$idCol") < col(s"b_$idCol"))
      .select(col(s"a_$idCol").as("id1"), col(s"b_$idCol").as("id2"),
        (dot(col(s"a_$vecCol"), col(s"b_$vecCol")) /
          (col("a___norm") * col("b___norm"))).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), round(col("cos"), 6).as("cos_sim"))
      .distinct()
  }

  /** Multi-probe cell assignment: one row per (input row, cell) for the
    * `nAssign` nearest coarse centroids — the shared candidate-blocking
    * primitive of [[ivfPairwiseCosine]], [[ivfCosineMatches]] and the
    * streaming embed dedupe. `slice` tolerates nAssign > #centroids
    * (tiny quantizers assign to every cell — recall trivially 1). */
  private[graft] def multiAssign(df: DataFrame, vecCol: String,
      centroids: Array[Array[Float]], nAssign: Int): DataFrame = {
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct((-dot(col(vecCol), typedlit(c.toSeq))).as("neg"),
        lit(i).as("i"))
    }: _*)
    df.withColumn("__cell",
      explode(transform(slice(sort_array(scored), 1, nAssign), s => s("i"))))
  }

  /** Exact-cosine verification of candidate (d1, d2) pairs: keeps pairs
    * whose cosine meets `threshold`, reading d1 vectors from `left` and
    * d2 vectors from `right` (id-pruned by the join — candidates bound
    * the vector reads). */
  private[graft] def verifyCosine(cand: DataFrame, left: DataFrame,
      right: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val l = withNorm(left, vecCol).select(col(idCol).as("d1"),
      col(vecCol).as("__v1"), col("__norm").as("__n1"))
    val r = withNorm(right, vecCol).select(col(idCol).as("d2"),
      col(vecCol).as("__v2"), col("__norm").as("__n2"))
    cand.join(l, "d1").join(r, "d2")
      .filter(dot(col("__v1"), col("__v2")) /
        (col("__n1") * col("__n2")) >= threshold)
      .select("d1", "d2")
  }

  /** Cross-set IVF-blocked cosine matches: which `queries` rows have a
    * `corpus` row at-or-above `threshold` — the candidate engine of
    * INCREMENTAL semantic dedup (a new batch checked against the landed
    * corpus without rescoring corpus×corpus). The quantizer trains on
    * the CORPUS side (the stable distribution); both sides multi-assign
    * to `nAssign` nearest cells and candidates join per cell, so the
    * per-batch cost is |batch|·(cell candidates), never |batch|×|corpus|.
    * Returns distinct (qid, cid, cos_sim) verified pairs. Same recall
    * contract as [[ivfPairwiseCosine]]: exact whenever both ends of a
    * matching pair rank a shared cell among their nAssign nearest. */
  def ivfCosineMatches(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      nCentroids: Int = 16, nAssign: Int = 6,
      seed: Long = 42L): DataFrame = {
    val centroids = ivfTrain(corpus, vecCol, nCentroids, seed = seed)
    def withCells(df: DataFrame): DataFrame =
      multiAssign(withNorm(df, vecCol), vecCol, centroids, nAssign)
    val q = withCells(queries)
    val c = withCells(corpus)
    val a = q.select(q.columns.map(x => col(x).as(s"a_$x")).toIndexedSeq: _*)
    val b = c.select(c.columns.map(x => col(x).as(s"b_$x")).toIndexedSeq: _*)
    a.join(b, col("a___cell") === col("b___cell"))
      .select(col(s"a_$idCol").as("qid"), col(s"b_$idCol").as("cid"),
        (dot(col(s"a_$vecCol"), col(s"b_$vecCol")) /
          (col("a___norm") * col("b___norm"))).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("qid"), col("cid"), round(col("cos"), 6).as("cos_sim"))
      .distinct()
  }

  def pairwiseCosine(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, blockCol: Option[String]): DataFrame = {
    val v = withNorm(vectors, vecCol)
    val aCols = v.columns.map(c => col(c).as(s"a_$c"))
    val bCols = v.columns.map(c => col(c).as(s"b_$c"))
    val a = v.select(aCols.toIndexedSeq: _*)
    val b = v.select(bCols.toIndexedSeq: _*)
    val cond = blockCol match {
      case Some(bc) => col(s"a_$bc") === col(s"b_$bc") &&
        col(s"a_$idCol") < col(s"b_$idCol")
      case None => col(s"a_$idCol") < col(s"b_$idCol")
    }
    val base = a.join(b, cond)
      .select((Seq(col(s"a_$idCol").as("id1"), col(s"b_$idCol").as("id2")) ++
        blockCol.map(bc => col(s"a_$bc").as(bc)).toSeq :+
        (dot(col(s"a_$vecCol"), col(s"b_$vecCol")) /
          (col("a___norm") * col("b___norm"))).as("cos")): _*)
    base.filter(col("cos") >= threshold)
      .withColumn("cos_sim", round(col("cos"), 6))
      .drop("cos")
  }

  /** Gram matrix XᵀX (upper triangle) over quantized integer vectors via
    * a typed [[org.apache.spark.sql.expressions.Aggregator]]: each
    * partition folds its rows into ONE primitive d(d+1)/2 long buffer
    * (zero per-cell allocations), partial buffers map-side combine, and
    * the exchange moves one buffer per partition — a matrix all-reduce,
    * not a cell stream. Measured vs the explode(flatten(transform))
    * formulation at sf1 (20k×64): 11.75 s → the Aggregator form, see
    * PLANS §22a — the struct-per-cell allocation was the entire
    * super-linear term. Result rows (dim_i, dim_j, gram) are identical
    * integers either way. */
  private class GramAgg(d: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        scala.collection.Seq[Long], Array[Long], Seq[(Int, Int, Long)]] {
    def zero: Array[Long] = new Array[Long](d * (d + 1) / 2)
    def reduce(b: Array[Long], x: scala.collection.Seq[Long]): Array[Long] = {
      val xa = x.toArray
      var idx = 0
      var i = 0
      while (i < d) {
        val xi = xa(i)
        var j = i
        while (j < d) { b(idx) += xi * xa(j); idx += 1; j += 1 }
        i += 1
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Seq[(Int, Int, Long)] = {
      val out = Seq.newBuilder[(Int, Int, Long)]
      var idx = 0
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) { out += ((i, j, b(idx))); idx += 1; j += 1 }
        i += 1
      }
      out.result()
    }
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Int, Int, Long)]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[(Int, Int, Long)]]()
  }

  /** Distributed upper-triangle Gram matrix of the quantized (integer
    * 1e-4 units) embedding column: (dim_i, dim_j, gram) rows, exact. */
  def gramMatrix(vecs: DataFrame, vecCol: String): DataFrame = {
    val d = vecs.select(size(col(vecCol))).head.getInt(0)
    val agg = udaf(new GramAgg(d),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[scala.collection.Seq[Long]]())
    vecs
      .select(transform(col(vecCol),
        e => floor(e.cast("double") * 10000d + 0.5d).cast("long")).as("q"))
      .agg(agg(col("q")).as("cells"))
      .select(explode(col("cells")).as("cell"))
      .select(col("cell._1").as("dim_i"), col("cell._2").as("dim_j"),
        col("cell._3").as("gram"))
  }

  /** Top principal component (uncentered PCA) by fixed-point POWER
    * ITERATION on the integer Gram matrix, then a distributed projection
    * scan. The division of labor is the scale argument: the O(n·d²)
    * Gram build is the [[gramMatrix]] all-reduce (the only pass over
    * data), the d×d iteration is driver math on a bounded 2·d² model —
    * exactly where a 64×64 problem belongs — and the scoring pass is
    * map-only with the eigenvector broadcast as a literal.
    *
    * Determinism: every step is integer — the Gram is exact, each
    * matvec is exact int64 (|x| ≤ d·|G|ₘₐₓ·1e5 — headroom to ~1e12 rows
    * at this quantization), and the per-round renormalization to 1e5
    * scale is floor-division (Math.floorDiv here, the pmod formula in
    * the oracle — identical on negatives). The oracle replays the SAME
    * rounds as CTE stages, so the iteration trajectory is hash-checked.
    * Returns the top-k vectors by |projection| with (|score| DESC, id)
    * total order. */
  def pcaPowerTop(vecs: DataFrame, idCol: String, vecCol: String,
      iters: Int = 3, k: Int = 20): DataFrame = {
    val cells = gramMatrix(vecs, vecCol).collect()
    val d = cells.iterator.map(_.getInt(1)).max + 1
    val G = Array.ofDim[Long](d, d)
    cells.foreach { r =>
      val (i, j, g) = (r.getInt(0), r.getInt(1), r.getLong(2))
      G(i)(j) = g; G(j)(i) = g
    }
    var v = Array.fill(d)(100000L)
    for (_ <- 1 to iters) {
      val x = Array.tabulate(d) { i =>
        var s = 0L; var j = 0
        while (j < d) { s += G(i)(j) * v(j); j += 1 }
        s
      }
      val mb = math.max(1L, Math.floorDiv(x.map(math.abs).max, 100000L))
      v = x.map(Math.floorDiv(_, mb))
    }
    vecs
      .select(col(idCol),
        transform(col(vecCol),
          e => floor(e.cast("double") * 10000d + 0.5d).cast("long")).as("q"))
      .select(col(idCol),
        aggregate(zip_with(col("q"), typedlit(v.toSeq),
          (a, b) => a * b), lit(0L), (acc, e) => acc + e).as("pc1_score"))
      .orderBy(abs(col("pc1_score")).desc, col(idCol))
      .limit(k)
  }

  /** Fixed-point integer Lloyd's k-means over an embedding column — the
    * iterative-training-loop primitive (quantizer/prototype fitting) in
    * the message-passing form that survives scale: per round, the k·dim
    * centroid table BROADCASTS to the vectors (never the reverse), the
    * assignment is a partial-aggregatable min over struct(dist, cid),
    * and the centroid update is one map-side-combined (cid, pos) sum.
    * Vectors never leave executors; the only driver state is the k·dim
    * centroid model (the same bounded-model boundary as the PQ/IVF
    * quantizers above).
    *
    * Determinism across engines (the same fixed-point recipe as
    * GraphOps.pagerankFixedPoint): coordinates are quantized once to
    * integer 1e-4 units via the cross-engine half-up `floor(x·1e4 + 0.5)`
    * (exact — a float's 24-bit mantissa ×1e4 fits a double), distances
    * are exact integer sums, ties break on centroid id, and the update
    * is an exact integer floor-division `(Σq − pmod(Σq, n)) div n` —
    * every round is bit-identical on any engine, so a DuckDB oracle can
    * replay the rounds as CTE stages. Empty clusters keep their previous
    * centroid. Seeds = the k lowest-id vectors.
    *
    * Returns one row per centroid: (centroid_id, n_members — from the
    * final assignment —, c_norm2 = Σ cq², c_sum = Σ cq). */
  def kmeansLloyd(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val spark = vecs.sparkSession
    val (cents, _, lastAssign) = lloydRounds(vecs, idCol, vecCol, k, iters)
    val cstats = spark.createDataFrame(
        cents.toSeq.map { case (cid, c) =>
          (cid, c.map(v => v * v).sum, c.sum) })
      .toDF("centroid_id", "c_norm2", "c_sum")
    cstats.join(
        lastAssign.groupBy(col("cid").as("centroid_id"))
          .agg(count(lit(1)).as("n_members")),
        Seq("centroid_id"), "left")
      .na.fill(0L, Seq("n_members"))
      .select("centroid_id", "n_members", "c_norm2", "c_sum")
  }

  /** Corpus-size-derived cluster count for the SemDeDup tier:
    * k = max(8, ⌈n / 250⌉), i.e. a TARGET CELL POPULATION of ~250
    * vectors with a floor of 8 so tiny corpora keep the measured
    * small-SF behavior. This is what makes the tier genuinely
    * sub-quadratic: at fixed k the within-cell candidate volume is
    * Σ n_c(n_c−1)/2 ≈ n²/k — a constant FRACTION of brute force, still
    * Θ(n²) — whereas at fixed cell population it is ≈ n·target/2,
    * LINEAR in n (SemDeDup, Abbas et al. 2023, scales k the same way:
    * 50k clusters at LAION scale). Integer arithmetic (ceil via
    * (n+249)/250) so the DuckDB oracle derives the IDENTICAL k with
    * `GREATEST(8, (count(*) + 249) // 250)` — no float-ceil parity
    * risk. */
  def semdedupK(n: Long): Int = math.max(8L, (n + 249L) / 250L).toInt

  /** Super-cell count for the TWO-LEVEL SemDeDup assignment: the
    * smallest g with g² ≥ k, by integer search — no float sqrt, so the
    * DuckDB oracle derives the IDENTICAL g with `min(i) WHERE i*i >= k`
    * over a row_number stream (no ceil-parity risk). Centroids group
    * into g super-cells and each vector probes exactly one, so one
    * assignment pass costs n·(g + k/g) ≈ 2n·√k distance evaluations
    * instead of the one-level n·k — with the derived k = n/250 that is
    * Θ(n^1.5) total rather than Θ(n²/250) (the round-16 weak mark;
    * SemDedupSpec gates the growth directly). */
  def superK(k: Int): Int = {
    var g = 1
    while (g.toLong * g < k) g += 1
    g
  }

  /** Exact squared integer L2 distance between two equal-length
    * quantized (1e-4-unit long) vectors. */
  private def dist2(x: Column, c: Column): Column =
    aggregate(zip_with(x, c, (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, e) => acc + e)

  /** (dist, cid) structs of `x` against a PACKED centroid array column
    * — argmin/top-n is array_min/array_sort over this array (struct
    * ordering = (dist, cid), the row_number total order the oracle
    * replays). The centroids arrive as DATA (a broadcast-joined struct
    * array), never as an expression-tree literal: a k-entry literal
    * plans fine at k≈10¹ but falls over (codegen/planning) once the
    * derived k reaches 10³⁺ — the round-16 structural finding. */
  private def scoreAll(x: Column, packed: Column): Column =
    transform(packed, s =>
      struct(dist2(x, s.getField("c")).as("dist"),
        s.getField("cid").as("cid")))

  /** The g super-centroids of a centroid relation packed as ONE row
    * holding the sorted (cid, c) struct array. crossJoin(broadcast(·))
    * against a 1-row side is a map-only BroadcastNestedLoopJoin — the
    * relation-shaped replacement for the centroid literal. Super-cell
    * ids are the g lowest centroid ids (a fixed set: cids never change
    * across Lloyd rounds, only their coordinates move). */
  private def packedSupers(cents: DataFrame, g: Int): DataFrame =
    cents.filter(col("cid") < g)
      .agg(sort_array(collect_list(struct(col("cid"), col("c")))).as("scs"))

  /** COARSE level: tag each (vid, x) row with its nearest
    * super-centroid's id (exact integer distance, ties to the lower
    * cid). Map-only after the 1-row broadcast. */
  private def withCoarse(vx: DataFrame, cents: DataFrame, g: Int)
      : DataFrame =
    vx.crossJoin(broadcast(packedSupers(cents, g)))
      .withColumn("scid",
        array_min(scoreAll(col("x"), col("scs"))).getField("cid"))
      .drop("scs")

  /** Per-super-cell candidate arrays: every centroid joins its nearest
    * super-centroid under the same (dist, cid) rule the vectors use,
    * then each super-cell's member centroids pack into one sorted
    * struct array — g rows totalling k·dim longs, broadcast-joined to
    * the vectors for the FINE argmin. (Broadcast is right up to ~10⁷
    * centroids; past that the same join runs as a shuffle on scid —
    * the plan degrades gracefully, never to a literal.) */
  private def superCands(cents: DataFrame, g: Int): DataFrame = {
    val grouped = withCoarse(
        cents.select(col("cid").as("vid"), col("c").as("x")), cents, g)
      .select(col("vid").as("cid"), col("scid"))
    cents.join(grouped, "cid")
      .groupBy("scid")
      .agg(sort_array(collect_list(struct(col("cid"), col("c"))))
        .as("cands"))
  }

  /** The full two-level scored frame: (vid, x, scid, ds) where ds
    * holds the (dist, cid) structs of the probed super-cell's
    * candidates only — n·(k/g) fine evaluations instead of n·k. */
  private def twoLevelScores(vx: DataFrame, cents: DataFrame, g: Int)
      : DataFrame =
    withCoarse(vx, cents, g)
      .join(broadcast(superCands(cents, g)), "scid")
      .withColumn("ds", scoreAll(col("x"), col("cands")))
      .drop("cands")

  private def quantized(vecCol: String): Column =
    transform(col(vecCol),
      e => floor(e.cast("double") * 10000d + 0.5d).cast("long"))

  /** The SemDeDup Lloyd loop, fully RELATIONAL and two-level: the
    * centroid model lives as a k-row DataFrame end to end (seeded from
    * the k lowest-id vectors), each round assigns vectors coarse-to-fine
    * (n·√k work, see [[superK]]) and updates centroids with a
    * map-side-combined (cid, pos) sum folded back by join — NO k·d
    * driver collect anywhere (the round-16 weak mark's second leg) and
    * no literal centroid tree. Fixed-point integer arithmetic
    * throughout (the [[kmeansLloyd]] recipe: 1e-4 quantization, exact
    * integer distances, floor-division update, ties to the lower id,
    * empty cells keep their previous centroid), so every round is
    * bit-identical on any engine and the DuckDB oracle replays the
    * two-level argmin as chained CTEs. Returns (pre-update final-round
    * centroids — the frozen quantizer `lastAssign` was scored
    * against —, final assignment (vid, cid, x), or null when
    * `needAssign` is false).
    *
    * FUSED rounds (r18, guide §2.4/§5): an intermediate round's
    * assignment has exactly ONE consumer — that round's centroid
    * update — so it stays LAZY inside the update's own plan: each of
    * the first iters−1 rounds is ONE eager job (the k-row cents
    * checkpoint, which also truncates the round-to-round lineage)
    * instead of two, and the n-row (vid, cid, x) frame is never
    * materialized to block storage for those rounds. The final round
    * never updates: callers only ever consume the PRE-update model
    * (preFinal) and its assignment, so the old final update was dead
    * work. Jobs per call: 2·iters → iters (assignment-consuming
    * callers) or iters−1 (quantizer-only callers, needAssign=false —
    * the final assignment itself is skipped). Trajectory unchanged:
    * the update folds the identical assignment relation, so every
    * round's centroids — and the oracle replay — are bit-identical. */
  private def lloydRounds2(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, needAssign: Boolean = true)
      : (DataFrame, DataFrame) = {
    val g = superK(k)
    // vx and the final assignment are CORPUS-SIZED (n×d quantized
    // longs / n assignment rows): persist WITH lineage (r18 audit) so
    // a lost block recomputes from the shallow scan+quantize lineage
    // instead of failing the job. The k-row cents stays a
    // localCheckpoint — it is the per-round ITERATIVE frame whose
    // checkpoint is load-bearing for plan/lineage truncation (persist
    // would nest every previous round's plan inside the next).
    val vx = vecs.select(col(idCol).cast("long").as("vid"),
        quantized(vecCol).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents = vx.filter(col("vid") < k)
      .select(col("vid").as("cid"), col("x").as("c"))
      .localCheckpoint()
    for (_ <- 1 until iters) {
      val assign = twoLevelScores(vx, cents, g)
        .select(col("vid"),
          array_min(col("ds")).getField("cid").as("cid"), col("x"))
      val upd = assign
        .select(col("cid"), posexplode(col("x")).as(Seq("pos", "q")))
        .groupBy("cid", "pos")
        .agg(sum("q").as("sq"), count(lit(1)).as("n"))
        .select(col("cid"), col("pos"),
          expr("(sq - pmod(sq, n)) div n").as("cq"))
      val updArr = upd.groupBy("cid")
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("cq")))),
          p => p.getField("cq")).as("cnew"))
      cents = cents.join(updArr, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("cnew"), col("c")).as("c"))
        .localCheckpoint()
    }
    // `cents` is now the frozen quantizer (the pre-update centroids of
    // the final round). The final assignment stays materialized when
    // requested — entries consume the cells relation repeatedly —
    // with lineage, like vx above.
    val lastAssign =
      if (needAssign)
        twoLevelScores(vx, cents, g)
          .select(col("vid"),
            array_min(col("ds")).getField("cid").as("cid"), col("x"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else null
    (cents, lastAssign)
  }

  /** Final two-level Lloyd assignment (id → cell) — the single-cell
    * partitioner of the SemDeDup tier ([[CorpusQueries]]
    * `dedupe_embed_semdedup`). Deterministic and engine-replayable
    * (see [[lloydRounds2]]), so the DuckDB oracle reaches the SAME
    * cell per vector — what makes a hash-checkable oracle for a
    * recall<1 blocking scheme possible at all. */
  def semdedupCells(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame =
    lloydRounds2(vecs, idCol, vecCol, k, iters)._2
      .select(col("vid").as(idCol), col("cid").as("cell"))

  /** The FROZEN quantizer as a RELATION (cid, c): the pre-update
    * centroids of the final Lloyd round — the model
    * [[semdedupCells]]'s assignment was scored against (the
    * post-update model would assign differently). Persist this k-row
    * table and [[semdedupAssignFrozen]] lands any later batch in
    * exactly the cell the batch run would have chosen — the streaming
    * face of the SemDeDup tier rests on this. Never collected: the
    * model stays distributed (parquet/broadcast), which is what lets
    * k scale with the corpus. */
  def semdedupQuantizer(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame =
    lloydRounds2(vecs, idCol, vecCol, k, iters, needAssign = false)._1

  /** Two-level assignment of arbitrary vectors against a frozen
    * quantizer relation — nAssign=1 reproduces [[semdedupCells]]'s
    * relation exactly (same coarse choice, same fine argmin); nAssign>1
    * is the MULTI-PROBE soft assignment (the vector's nAssign nearest
    * cells WITHIN its probed super-cell, rank = (dist, cid) — the
    * oracle's row_number order). One row per (id, cell). */
  def semdedupAssignFrozen(vecs: DataFrame, idCol: String, vecCol: String,
      quant: DataFrame, nAssign: Int): DataFrame = {
    val k = quant.count().toInt // k-row model table: a bounded job
    val g = superK(k)
    val vx = vecs.select(col(idCol).cast("long").as("vid"),
      quantized(vecCol).as("x"))
    twoLevelScores(vx, quant.select(col("cid"), col("c")), g)
      .select(col("vid"),
        explode(slice(array_sort(col("ds")), 1, nAssign)).as("dc"))
      .select(col("vid").as(idCol), col("dc.cid").as("cell"))
  }

  /** Multi-probe final assignment: train, freeze, assign top-nAssign
    * (see [[semdedupAssignFrozen]]). */
  def semdedupCellsN(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, nAssign: Int): DataFrame =
    semdedupAssignFrozen(vecs, idCol, vecCol,
      semdedupQuantizer(vecs, idCol, vecCol, k, iters), nAssign)

  /** Distance-evaluation count of ONE two-level assignment pass over
    * the frozen quantizer: n·g coarse + k·g centroid-grouping +
    * Σ_v |cands(scid_v)| fine — the quantity SemDedupSpec gates for
    * ~n^1.5 growth (candidate volume alone hid the round-16 quadratic:
    * candidates were linear while ASSIGNMENT was still n·k). */
  def semdedupDistanceEvals(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Long = {
    val g = superK(k)
    val quant = semdedupQuantizer(vecs, idCol, vecCol, k, iters)
    val vx = vecs.select(col(idCol).cast("long").as("vid"),
      quantized(vecCol).as("x"))
    val n = vx.count()
    val fine = withCoarse(vx, quant, g)
      .join(superCands(quant, g)
        .select(col("scid"), size(col("cands")).cast("long").as("nc")),
        "scid")
      .agg(sum("nc")).head().getLong(0)
    n * g + k.toLong * g + fine
  }

  /** The LAZY round-1 two-level assignment frame (scored against the
    * seed centroids), for PLAN inspection only: SemDedupSpec gates via
    * [[graft.PlanAudit.NoWideLiteral]] that no wide array literal
    * appears anywhere in it — the centroid relation must arrive by
    * broadcast join. (The production frames are eagerly checkpointed
    * inside [[lloydRounds2]], so the entry's returned plan cannot show
    * these stages — this probe is the inspectable twin.) */
  private[graft] def semdedupAssignProbe(vecs: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val g = superK(k)
    val vx = vecs.select(col(idCol).cast("long").as("vid"),
      quantized(vecCol).as("x"))
    val cents = vx.filter(col("vid") < k)
      .select(col("vid").as("cid"), col("x").as("c"))
    twoLevelScores(vx, cents, g)
      .select(col("vid"),
        array_min(col("ds")).getField("cid").as("cell"))
  }

  /** All per-cell (dist, cid) structs of one quantized vector against
    * a centroid-table LITERAL — used ONLY by the BOUNDED-k
    * [[lloydRounds]] below (`vec_kmeans_lloyd`'s user-specified k≈10¹,
    * where a k·dim literal is the cheapest map-only plan). The
    * derived-k SemDeDup tier must NOT route through this: its k scales
    * with the corpus and a k-entry literal breaks planning — that path
    * is the relational [[lloydRounds2]]. */
  private def distStructs(x: Column,
      cents: Array[(Long, Array[Long])]): Column = {
    val centsLit = typedlit(cents.toSeq.sortBy(_._1)
      .map { case (cid, c) => (cid, c.toSeq) })
    transform(centsLit, cs =>
      struct(
        aggregate(zip_with(x, cs.getField("_2"),
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, e) => acc + e)
          .as("dist"),
        cs.getField("_1").as("cid")))
  }

  /** The BOUNDED-k Lloyd loop (user-specified k, `vec_kmeans_lloyd`):
    * quantize once, `iters` rounds of MAP-ONLY assignment (argmin over
    * a centroid-table literal — no row blow-up, no exchange; the
    * struct order reproduces the previous crossJoin + groupBy-min plan
    * bit-for-bit) + map-side-combined centroid update. Returns (final
    * post-update centroid model, the PRE-update final-round centroids
    * `lastAssign` was scored against, the final assignment frame
    * (vid, cid, x)). */
  private def lloydRounds(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int)
      : (Array[(Long, Array[Long])], Array[(Long, Array[Long])], DataFrame) = {
    val vx = vecs.select(col(idCol).cast("long").as("vid"),
        quantized(vecCol).as("x"))
      .localCheckpoint()
    var cents: Array[(Long, Array[Long])] = vx.filter(col("vid") < k)
      .orderBy("vid").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    var preFinal: Array[(Long, Array[Long])] = cents
    var lastAssign: DataFrame = null
    for (_ <- 1 to iters) {
      preFinal = cents
      val assign = vx
        .select(col("vid"),
          array_min(distStructs(col("x"), cents))
            .getField("cid").as("cid"),
          col("x"))
        .localCheckpoint()
      val upd = assign
        .select(col("cid"), posexplode(col("x")).as(Seq("pos", "q")))
        .groupBy("cid", "pos")
        .agg(sum("q").as("sq"), count(lit(1)).as("n"))
        .select(col("cid"), col("pos"),
          expr("(sq - pmod(sq, n)) div n").as("cq"))
        .collect()
      val updMap = upd.groupBy(_.getLong(0)).map { case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toArray
      }
      cents = cents.map { case (cid, old) =>
        (cid, updMap.getOrElse(cid, old))
      }
      lastAssign = assign
    }
    (cents, preFinal, lastAssign)
  }

  /** MMR (Maximal Marginal Relevance, Carbonell & Goldstein 1998)
    * diversified re-ranking: greedily pick `k` of the top-`m`-by-relevance
    * candidates, each step maximizing λ·rel(q,i) − (1−λ)·max_{s∈S} sim(i,s)
    * — the retrieval-side answer to "the top results are all near-dups of
    * each other" that pairs with the dedupe tiers on the serving path.
    *
    * Exactness: λ is carried as the exact rational 7/10 so every greedy
    * comparison is INTEGER math — rel and pairwise cosines snap to the
    * round6 fixed-point grid (1e-6 longs) in DataFrame land, scores are
    * 7·rel6 − 3·maxsim6 in 1e-7 units, ties break to the lower id. No
    * float comparison anywhere in the selection ⇒ bit-identical in any
    * engine (the DuckDB oracle replays the same k chained argmax steps).
    *
    * Scale shape: relevance scoring is the standard top-m candidate pass
    * (here brute-force: broadcast 1-row query crossJoin +
    * TakeOrderedAndProject; at corpus scale the ANN layouts produce the
    * same bounded candidate frame). The m·(m−1)/2 pairwise sims are
    * computed distributed on the m-row frame; only (id, rel6) and
    * (i, j, sim6) longs — O(m²), never vectors — reach the driver for the
    * greedy loop (the bounded-candidate-collect pattern; for a query
    * BATCH, key both frames by query_id and run this loop per group in
    * flatMapGroups instead). */
  def mmrRerank(vectors: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String, m: Int, k: Int)
      : DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    def i6(c: Column): Column =
      floor(graft.StableRound.round6(c) * 1e6 + 0.5).cast("long")
    val v = withNorm(vectors, vecCol)
    // the greedy below assumes ONE query vector; >1 rows would
    // crossJoin duplicate candidate ids with mixed relevances and the
    // selection would silently return garbage — fail loudly instead
    // (ADVICE r16). limit(2) bounds the guard's job at 2 rows.
    val nq = query.limit(2).count()
    require(nq == 1, s"mmrRerank expects exactly one query row, got " +
      s"${if (nq == 0) "0" else ">=2"} — use mmrRerankBatch for batches")
    val q = withNorm(query, queryVecCol)
      .select(col(queryVecCol).as("__qvec"), col("__norm").as("__qnorm"))
    // top-m by (rel6 DESC, id): rank on the SNAPPED value so the oracle's
    // ordering is replayed exactly even when raw cosines differ in ulps
    val cand = v.crossJoin(broadcast(q))
      .select(col(idCol).cast("long").as("vid"),
        i6(dot(col(vecCol), col("__qvec")) /
          (col("__norm") * col("__qnorm"))).as("ri"),
        col(vecCol).as("__v"))
      .orderBy(col("ri").desc, col("vid"))
      .limit(m)
      .localCheckpoint()
    val cn = withNorm(cand, "__v")
    val a = cn.select(col("vid").as("i"), col("__v").as("va"),
      col("__norm").as("na"))
    val b = cn.select(col("vid").as("j"), col("__v").as("vb"),
      col("__norm").as("nb"))
    val sims = a.join(b, col("i") < col("j"))
      .select(col("i"), col("j"),
        i6(dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("si"))
    val candL = cand.select(col("vid"), col("ri")).as[(Long, Long)].collect()
    val simM = sims.as[(Long, Long, Long)].collect()
      .map { case (i, j, si) => ((i, j), si) }.toMap
    mmrGreedy(candL.toSeq, simM, k)
      .toDF("rank", "vec_id", "relI", "msI")
      .select(Seq(col("rank"), col("vec_id")) ++ mmrScored: _*)
  }

  /** The integer MMR greedy shared by [[mmrRerank]] and
    * [[mmrRerankBatch]]: pick min(k, |cands|) winners of
    * max(7·ri − 3·max_{s∈S} sim) with ties to the lower id — pure long
    * comparisons, engine-replayable. `sims` keys are (lo, hi) id pairs. */
  private def mmrGreedy(cands: Seq[(Long, Long)],
      sims: Map[(Long, Long), Long], k: Int): Seq[(Int, Long, Long, Long)] = {
    def sim(x: Long, y: Long): Long =
      if (x < y) sims((x, y)) else sims((y, x))
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    val remaining = scala.collection.mutable.ArrayBuffer.from(cands)
    for (r <- 1 to math.min(k, cands.length)) {
      val best = remaining.map { case (vid, ri) =>
        val ms = if (selected.isEmpty) 0L
          else selected.iterator.map(s => sim(vid, s._2)).max
        (7L * ri - 3L * ms, vid, ri, ms)
      }.minBy(t => (-t._1, t._2))
      selected += ((r, best._2, best._3, best._4))
      remaining.filterInPlace(_._1 != best._2)
    }
    selected.toSeq
  }

  /** Final double assembly from the fixed-point greedy columns — exact
    * integer-valued doubles divided by decimal powers, identical in any
    * engine. */
  private def mmrScored: Seq[Column] = Seq(
    (col("relI").cast("double") / 1e6).as("relevance"),
    ((lit(7L) * col("relI") - lit(3L) * col("msI")).cast("double") / 1e7)
      .as("mmr_score"))

  private[graft] case class MmrGroup(query_id: Long,
      cands: Seq[(Long, Long)], sims: Seq[((Long, Long), Long)])

  /** Batch MMR: [[mmrRerank]] with NOTHING on the driver — one greedy per
    * query key, run inside flatMap on a packed per-query (cands, sims)
    * relation. Stages: (1) snapped relevance + per-query top-m rank — the
    * shuffle moves (query, id, rel6) longs only, never vectors
    * (cosineTopKBatch's shape); (2) candidate vectors re-attached map-only
    * by broadcasting the bounded |queries|·m candidate list into the
    * corpus scan; (3) per-query pair sims — quadratic in m inside each
    * query group, never across the corpus; (4) collect_list-packed per
    * query and the same integer greedy as the single-query form, per
    * group, in parallel across queries. 100 TB posture: corpus scale
    * only enters stages 1-2 (scan-shaped); everything after is
    * |queries|·m² longs partitioned by query. */
  def mmrRerankBatch(vectors: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, m: Int, k: Int)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = vectors.sparkSession
    import spark.implicits._
    def i6(c: Column): Column =
      floor(graft.StableRound.round6(c) * 1e6 + 0.5).cast("long")
    val v = withNorm(vectors, vecCol)
    val q = withNorm(queries, qVecCol)
      .select(col(qIdCol).cast("long").as("query_id"),
        col(qVecCol).as("__qvec"), col("__norm").as("__qnorm"))
    // both frames are bounded (|queries|·m rows) — materialize them so
    // the CORPUS scan in their lineage runs exactly once each (without
    // the checkpoints every downstream consumer re-executes it: the
    // audit counted 9 corpus scans in this plan)
    val cand = v.crossJoin(broadcast(q))
      .select(col("query_id"), col(idCol).cast("long").as("vid"),
        i6(dot(col(vecCol), col("__qvec")) /
          (col("__norm") * col("__qnorm"))).as("ri"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("ri").desc, col("vid"))))
      .filter(col("rk") <= m)
      .select("query_id", "vid", "ri")
      .localCheckpoint()
    val candV = v.join(broadcast(cand), col(idCol) === col("vid"))
      .select(col("query_id"), col("vid"), col("ri"),
        col(vecCol).as("__v"), col("__norm").as("__n"))
      .localCheckpoint()
    val bs = candV.select(col("query_id").as("__qb"), col("vid").as("j"),
      col("__v").as("vb"), col("__n").as("nb"))
    val sims = candV
      .join(bs, col("query_id") === col("__qb") && col("vid") < col("j"))
      .select(col("query_id"), col("vid").as("i"), col("j"),
        i6(dot(col("__v"), col("vb")) / (col("__n") * col("nb"))).as("si"))
    val packed = candV.groupBy("query_id")
      .agg(collect_list(struct(col("vid").as("_1"), col("ri").as("_2")))
        .as("cands"))
      .join(sims.groupBy("query_id")
        .agg(collect_list(struct(
          struct(col("i").as("_1"), col("j").as("_2")).as("_1"),
          col("si").as("_2"))).as("sims")),
        Seq("query_id"), "left")
    packed.as[MmrGroup].flatMap { g =>
      val simM = Option(g.sims).getOrElse(Seq.empty).toMap
      mmrGreedy(g.cands, simM, k)
        .map { case (r, vid, ri, ms) => (g.query_id, r, vid, ri, ms) }
    }.toDF("query_id", "rank", "vec_id", "relI", "msI")
      .select(Seq(col("query_id"), col("rank"), col("vec_id")) ++
        mmrScored: _*)
  }

  /** Embedding-distribution drift between two corpus snapshots: per key
    * (e.g. label / domain / time bucket), the cosine and L2 distance
    * between the snapshot centroids — the monitoring primitive that
    * catches an embedding-model swap or a source-mix shift before it
    * poisons the ANN layouts downstream.
    *
    * `inFirst` is a boolean Column over the input rows assigning each
    * vector to snapshot A (true) or B (false). Exactness recipe is
    * vec_silhouette's: per-dim centroids snap to round6, every cross-term
    * (ca·cb, ca², cb², (ca−cb)²) snaps to the 1e-6 fixed-point grid and
    * sums as LONGS (order-free), and only the final scalar assembly runs
    * in double — identical in any engine.
    *
    * Scale shape: one posexplode scan → partial-aggregated (key, dim)
    * means (map-side combine; shuffle = |keys|·d rows, never vectors) →
    * |keys|·d-row term relation → |keys|-row join with the count frame.
    * No collect, no quadratic stage; 100 TB-safe by construction. */
  def centroidDrift(vectors: DataFrame, keyCol: String, vecCol: String,
      inFirst: Column): DataFrame = {
    val x = vectors
      .select(col(keyCol), inFirst.as("__a"),
        posexplode(col(vecCol)).as(Seq("__pos", "__raw")))
      .select(col(keyCol), col("__a"), col("__pos"),
        col("__raw").cast("double").as("__v"))
    // counts ride the SAME per-(key, dim) aggregation (each vector
    // contributes one row to every dim, so any dim's conditional count
    // is the snapshot size — max across dims recovers it): ONE corpus
    // scan total. Precondition: vectors are non-empty arrays (pinned by
    // TestdataGuardSpec) — an empty-embedding row would contribute no
    // dims and drop out of the counts.
    val cent = x.groupBy(keyCol, "__pos").agg(
      graft.StableRound.round6(avg(when(col("__a"), col("__v")))).as("ca"),
      graft.StableRound.round6(avg(when(!col("__a"), col("__v")))).as("cb"),
      count(when(col("__a"), 1)).as("__na"),
      count(when(!col("__a"), 1)).as("__nb"))
      .localCheckpoint() // bounded keys·d rows; feeds counts AND sums
    val counts = cent.groupBy(keyCol).agg(
      max("__na").as("n_a"), max("__nb").as("n_b"))
    driftAssemble(cent, counts, keyCol)
  }

  /** Final assembly shared by [[centroidDrift]] and its streaming face:
    * from the per-(key, dim) rounded centroid pair (ca, cb) and the
    * per-key (n_a, n_b) counts, the fixed-point cross-terms sum as longs
    * and only the final scalar runs in double. */
  private[graft] def driftAssemble(cent: DataFrame, counts: DataFrame,
      keyCol: String): DataFrame = {
    def f6(c: Column): Column =
      floor(graft.StableRound.round6(c) * 1e6 + 0.5).cast("long")
    def D(c: Column): Column = c.cast("double") / 1e6
    val sums = cent.select(col(keyCol),
        f6(col("ca") * col("cb")).as("tab"),
        f6(col("ca") * col("ca")).as("taa"),
        f6(col("cb") * col("cb")).as("tbb"),
        f6((col("ca") - col("cb")) * (col("ca") - col("cb"))).as("td"))
      .groupBy(keyCol).agg(sum("tab").as("s_ab"), sum("taa").as("s_aa"),
        sum("tbb").as("s_bb"), sum("td").as("s_d"))
    sums.join(counts, keyCol)
      .select(col(keyCol), col("n_a"), col("n_b"),
        graft.StableRound.round6(D(col("s_ab")) /
          (sqrt(D(col("s_aa"))) * sqrt(D(col("s_bb"))))).as("cos_shift"),
        graft.StableRound.round6(sqrt(D(col("s_d")))).as("l2_shift"))
  }
}
