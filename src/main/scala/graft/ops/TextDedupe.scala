package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.StableRound

/** Near-duplicate detection over documents — the LLM-pipeline dedup family
  * (north star): exact, normalized-exact, exact n-gram Jaccard via inverted
  * index, MinHash+LSH banding, and SimHash hamming-banding.
  *
  * Scale design notes:
  *  - The exact-Jaccard path is a prefix-filtered inverted-index self-join
  *    (Bayardo WWW'07): only each doc's rarest (n − ⌈t·n⌉ + 1) shingles are
  *    indexed, so high-document-frequency shingles never form join buckets
  *    — the exactness proof is in `ngramJaccardPairs`' doc.
  *  - MinHash+LSH replaces the full inverted index with b band buckets per
  *    doc: cost O(docs × b) rows, candidate pairs only within equal band
  *    signatures, then exact verification on the candidates. This is the
  *    100 TB path; the exact path is the oracle-checkable baseline.
  */
object TextDedupe {

  /** 3-token shingle set (distinct) per document — composable reference
    * form. Guarded for short docs. The token array is let-bound (see
    * [[let1]]): HOF lambdas have no CSE/codegen, so a raw `split(text)`
    * referenced n times per shingle re-tokenizes the whole document
    * n·|shingles| times per row — measured 50× on the sf0.1 corpus. */
  def shinglesComposed(text: Column, n: Int = 3): Column =
    let1(split(text, " "), ts => {
      val idxs = sequence(lit(1), size(ts) - (n - 1))
      val mk = transform(idxs, i =>
        concat_ws(" ", (0 until n).map(o => element_at(ts, i + o)): _*))
      array_distinct(when(size(ts) >= n, mk)
        .otherwise(array().cast("array<string>")))
    })

  /** Production form of [[shinglesComposed]]: one codegen'd pass
    * (graft.functions.ShingleArray) — the ngram pipeline evaluates the
    * kernel up to 4× per query, and even let-bound HOFs stay
    * interpreted. TextDedupeSpec pins exact equality. */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.ShingleArray.shingleArray(text, n)

  /** Exploded (id, shingle) inverted-index view. */
  def shingleIndex(docs: DataFrame, idCol: String, textCol: String,
      carryCols: Seq[String] = Nil): DataFrame =
    docs.select((col(idCol) +: carryCols.map(col) :+
      explode(shingles(col(textCol))).as("shingle")): _*)

  /** Exact n-gram Jaccard similarity join: pairs of docs with
    * jaccard(shingles) >= threshold. `blockCol` (e.g. language) bounds the
    * candidate space; pass None for a global join.
    *
    * Exact-but-pruned via PREFIX FILTERING (Bayardo et al., "Scaling Up
    * All Pairs Similarity Search", WWW'07; Xiao et al. PPJoin): under any
    * common total order on shingles, a pair with J >= t must share a token
    * among the first (n − ⌈t·n⌉ + 1) tokens of each side. Ordering by
    * ascending document frequency puts the RAREST shingles in the prefix,
    * so inverted-index buckets stay small — this kills the quadratic
    * hot-shingle blow-up that a naive shingle self-join hits at scale,
    * without losing a single qualifying pair. A length filter
    * (t·|A| ≤ |B| ≤ |A|/t) prunes further before exact verification on
    * the full shingle sets.
    *
    * `broadcastDfreq`: when the distinct-shingle vocabulary fits an
    * executor (true for bounded-domain corpora; NOT for open web text at
    * 100 TB), broadcasting the (shingle, df) table turns the dfreq
    * annotation into a broadcast-hash join and saves a full shuffle of the
    * exploded inverted index — the index is then shuffled only once, by
    * the window key. Default off: the merge join is the
    * arbitrary-vocabulary-safe plan. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, blockCol: Option[String] = None,
      broadcastDfreq: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // materialized ONCE (r17 opt): base has six downstream consumers
    // (dfreq, the prefix join side, the exploded verify index ×2, the
    // length table ×2) and without the checkpoint each re-scanned the
    // source and re-ran the regex tokenize + shingle hashing — the
    // formatted plan showed 8 source scans per call. The stored frame
    // is the hashed-shingle corpus (ids + long arrays, no text), the
    // one relation every later stage derives from; storing it beats
    // recomputing the shingling 8× (guide §2.4/§5 — and unlike a
    // counting relation over a continuous domain, the recompute here
    // is regex-heavy CPU). CORPUS-SIZED, so it persists WITH lineage
    // (r18 audit): on a cluster an executor loss recomputes the lost
    // blocks from the (shallow) scan+shingle lineage instead of
    // failing the job, which a lineage-free localCheckpoint would.
    val base = docs
      .select((col(idCol) +: blockCol.map(col).toSeq :+
        shingles(col(textCol)).as("sharr")): _*)
      .filter(size(col("sharr")) > 0)
      .withColumn("nsh", size(col("sharr")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ex = base.select((col(idCol) +: blockCol.map(col).toSeq :+
      col("nsh") :+ explode(col("sharr")).as("shingle")): _*)
    // global shingle document-frequency → rare-first canonical order
    val dfreq0 = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
    val dfreq = if (broadcastDfreq) broadcast(dfreq0) else dfreq0
    val prefix = ex.join(dfreq, "shingle")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("df"), col("shingle"))))
      .filter(col("rk") <= col("nsh") - ceil(col("nsh") * threshold) + 1)
      .drop("df", "rk")
      // materialize the prefix index partitioned on the join key: the
      // exchange is computed once and ReusedExchange shares it across
      // both self-join sides (otherwise each side re-runs dfreq + window)
      .repartition((col("shingle") +: blockCol.map(col).toSeq): _*)
    val aSide = prefix.toDF(prefix.columns.map(c => s"a_$c"): _*)
    val bSide = prefix.toDF(prefix.columns.map(c => s"b_$c"): _*)
    val lenOk = col("b_nsh") >= ceil(col("a_nsh") * threshold) &&
      col("a_nsh") >= ceil(col("b_nsh") * threshold)
    val joinCond = blockCol match {
      case Some(bc) => col("a_shingle") === col("b_shingle") &&
        col(s"a_$bc") === col(s"b_$bc") &&
        col(s"a_$idCol") < col(s"b_$idCol") && lenOk
      case None => col("a_shingle") === col("b_shingle") &&
        col(s"a_$idCol") < col(s"b_$idCol") && lenOk
    }
    val cand = aSide.join(bSide, joinCond)
      .select(col(s"a_$idCol").as("d1"), col(s"b_$idCol").as("d2"))
      .distinct()
    // EXPLODED-INDEX exact verify (the RID-pair verification of
    // Vernica/Carey/Li's distributed set-similarity join): |A∩B| =
    // count of (pair, shingle) rows whose shingle also indexes the
    // partner doc. Joining the candidate pairs BACK onto the full
    // per-(doc, shingle) index keeps every row in flight NARROW
    // (two ids + one shingle) and the intersection count map-side
    // combinable — measured 2.8 s → 1.7 s at sf0.1 over carrying the
    // full ~3 KB shingle arrays of both sides through the verify joins
    // (array payload, not intersect math, bounded that plan). Pairs
    // with an empty intersection drop at the semi join, which any
    // threshold > 0 filters anyway. No broadcast hints: the doc-length
    // side is |docs| rows — AQE broadcasts it while it fits and keeps
    // the plan shuffle-safe when it doesn't.
    val exIdx = base.select(col(idCol), explode(col("sharr")).as("shingle"))
    val nshT = base.select(col(idCol), col("nsh"))
    val inter = cand
      .join(exIdx.toDF("d1", "shingle"), "d1")
      .join(exIdx.toDF("d2", "shingle"), Seq("d2", "shingle"), "left_semi")
      .groupBy("d1", "d2").agg(count(lit(1)).as("__inter"))
    inter
      .join(nshT.toDF("d1", "__n1"), "d1")
      .join(nshT.toDF("d2", "__n2"), "d2")
      .select(col("d1"), col("d2"),
        StableRound.round4(col("__inter").cast("double")
          / (col("__n1") + col("__n2") - col("__inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact shingle CONTAINMENT join: ordered pairs (src, dst) with
    * C(src→dst) = |S(src) ∩ S(dst)| / |S(src)| ≥ threshold, src ≠ dst.
    *
    * Containment is the doc-in-doc detector Jaccard structurally cannot
    * be: a 40-token quote pasted into a 400-token article has
    * J ≈ 0.1 (invisible at any usable Jaccard threshold) but
    * C(quote→article) ≈ 1.0. Pipelines run it for quote/boilerplate
    * extraction and asymmetric near-dup (keep the superset, drop the
    * contained fragment).
    *
    * Pruning is the ASYMMETRIC prefix filter: if C(src→dst) ≥ t then
    * src misses at most |A| − ⌈t·|A|⌉ shingles, so under ANY global
    * shingle order, one of src's first (|A| − ⌈t·|A|⌉ + 1) shingles is
    * in dst — index only that prefix on the src side (rarest-first
    * order, same df trick as [[ngramJaccardPairs]]) but the FULL
    * inverted index on the dst side (dst's match positions are
    * unconstrained; this is what makes the filter asymmetric). The only
    * length filter is |dst| ≥ ⌈t·|src|⌉ (|A∩B| ≤ |B|); no upper bound
    * exists — a fragment is contained in arbitrarily large docs.
    * Exact verification on full shingle sets follows, as in the
    * Jaccard path. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, blockCol: Option[String] = None,
      broadcastDfreq: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // materialized ONCE (r17 opt): base has six downstream consumers
    // (dfreq, the prefix join side, the exploded verify index ×2, the
    // length table ×2) and without the checkpoint each re-scanned the
    // source and re-ran the regex tokenize + shingle hashing — the
    // formatted plan showed 8 source scans per call. The stored frame
    // is the hashed-shingle corpus (ids + long arrays, no text), the
    // one relation every later stage derives from; storing it beats
    // recomputing the shingling 8× (guide §2.4/§5 — and unlike a
    // counting relation over a continuous domain, the recompute here
    // is regex-heavy CPU).
    val base = docs
      .select((col(idCol) +: blockCol.map(col).toSeq :+
        shingles(col(textCol)).as("sharr")): _*)
      .filter(size(col("sharr")) > 0)
      .withColumn("nsh", size(col("sharr")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ex = base.select((col(idCol) +: blockCol.map(col).toSeq :+
      col("nsh") :+ explode(col("sharr")).as("shingle")): _*)
    val dfreq0 = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
    val dfreq = if (broadcastDfreq) broadcast(dfreq0) else dfreq0
    val prefix = ex.join(dfreq, "shingle")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("df"), col("shingle"))))
      .filter(col("rk") <= col("nsh") - ceil(col("nsh") * threshold) + 1)
      .drop("df", "rk")
    val aSide = prefix.toDF(prefix.columns.map(c => s"a_$c"): _*)
    val bSide = ex.toDF(ex.columns.map(c => s"b_$c"): _*)
    val lenOk = col("b_nsh") >= ceil(col("a_nsh") * threshold)
    val joinCond = blockCol match {
      case Some(bc) => col("a_shingle") === col("b_shingle") &&
        col(s"a_$bc") === col(s"b_$bc") &&
        col(s"a_$idCol") =!= col(s"b_$idCol") && lenOk
      case None => col("a_shingle") === col("b_shingle") &&
        col(s"a_$idCol") =!= col(s"b_$idCol") && lenOk
    }
    val cand = aSide.join(bSide, joinCond)
      .select(col(s"a_$idCol").as("src"), col(s"b_$idCol").as("dst"))
      .distinct()
    val sh = base.select(col(idCol), sort_array(col("sharr")).as("sharr"))
    val verified = cand
      .join(sh.toDF("src", "sh1"), "src")
      .join(sh.toDF("dst", "sh2"), "dst")
    verified.select(col("src"), col("dst"),
        StableRound.round4(
          graft.functions.SortedIntersectCount
            .sortedIntersectCount(col("sh1"), col("sh2")).cast("double")
            / size(col("sh1"))).as("containment"))
      .filter(col("containment") >= threshold)
  }

  // ---- MinHash + LSH --------------------------------------------------

  private val Prime = 2038074743L // large 31-bit prime for permutations

  /** Evaluate `bound` once per row and use it `body`-many times: binds the
    * expression as a lambda variable via a 1-element transform. Without
    * this, CollapseProject inlines a projected column into every consumer
    * and higher-order functions (which have no codegen/CSE) re-evaluate it
    * per use — measured 15× slowdown on the LSH pipeline. */
  private def let1(bound: Column, body: Column => Column): Column =
    element_at(transform(array(bound), body), 1)

  /** k-permutation MinHash signature over the shingle set.
    * Base shingle hash is xxhash64 (codegen'd); permutation i is
    * (a_i·h + b_i) mod p with deterministic seeds. The shingle-hash array
    * is let-bound so it's computed once per row, not once per permutation. */
  def minhashSignature(text: Column, k: Int = 32): Column =
    graft.functions.MinHashSig.minhashSig(
      transform(shingles(text), s => pmod(xxhash64(s), lit(Prime))), k, Prime)

  /** Composed-Column twin of [[minhashSignature]] (the spec's equality
    * reference — the k·n permutation loop evaluated through interpreted
    * HOF lambdas). */
  def minhashSignatureComposed(text: Column, k: Int = 32): Column = {
    val hsExpr = transform(shingles(text), s => pmod(xxhash64(s), lit(Prime)))
    val seedsA = array((0 until k).map(i => lit(2L * i + 1)): _*)
    val seedsB = array((0 until k).map(i => lit(1013904223L * (i + 1) % Prime)): _*)
    let1(hsExpr, hs =>
      when(size(hs) > 0,
        transform(sequence(lit(0), lit(k - 1)), i =>
          array_min(transform(hs, h =>
            pmod(h * element_at(seedsA, i + 1) + element_at(seedsB, i + 1),
              lit(Prime))))))
        .otherwise(lit(null)))
  }

  /** LSH candidate pairs from banding the signature into `bands` bands of
    * k/bands rows, verified with exact Jaccard >= threshold.
    *
    * Default k=32, b=16, r=2: per-pair miss probability (1 − s^r)^b is
    * 3e-12 at s=0.9 and 8e-8 at s=0.8 (the corpus minimum above the 0.5
    * threshold — verified empirically), so the exact-Jaccard oracle is
    * safe. r=2 admits more random band collisions than r=4; they cost one
    * exact verification each and are filtered, which is the right trade
    * until the candidate set itself dominates (then raise r AND k). */
  /** The banded LSH index relation: one (id, band, band_sig) row per
    * band per doc (docs under 3 tokens have no shingle and no rows).
    * Band signatures come from ONE nested let-bound expression: shingle
    * hashes and the k-minhash signature are each evaluated once per
    * row. Shared by the self-join pair path ([[minhashLshPairs]]) and
    * the streaming incremental near-dup key table
    * (`StreamOps.neardupDedupeBatch`), so the two tiers cannot drift. */
  /** The per-doc array of band signatures ([[bandRows]]'s payload
    * before the explode) — also the AT-REST layout of the incremental
    * band index (one array row per doc; ~134 B/doc measured at sf1 —
    * parquet encodes the exploded form about as small, so the packed
    * win is 16× fewer rows through scan/shuffle, not bytes; see
    * IncrementalDedupe). */
  def bandArray(text: Column, k: Int = 32, bands: Int = 16): Column = {
    val r = k / bands
    let1(minhashSignature(text, k), sig =>
      transform(sequence(lit(0), lit(bands - 1)),
        bnd => xxhash64(concat_ws("_",
          (0 until r).map(j => element_at(sig, bnd * r + j + 1)): _*))))
  }

  def bandRows(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 16): DataFrame =
    docs.filter(size(split(col(textCol), " ")) >= 3)
      .select(col(idCol),
        posexplode(bandArray(col(textCol), k, bands))
          .as(Seq("band", "band_sig")))

  /** Exact-Jaccard verification of candidate (d1, d2) pairs against a
    * once-per-doc shingle-set table per side — candidates carry only
    * ids; texts join back AFTER candidate dedup so band-bucket fan-out
    * never multiplies text payloads. Deliberately NOT repartition-
    * materialized: the candidate set is small, AQE broadcasts it into
    * the shingle side, and the shingle arrays are never shuffled. */
  def verifyJaccard(cand: DataFrame, left: DataFrame, right: DataFrame,
      idCol: String, textCol: String, threshold: Double): DataFrame = {
    def sh(df: DataFrame) =
      df.select(col(idCol), sort_array(shingles(col(textCol))).as("sharr"))
    val verified = cand
      .join(sh(left).toDF("d1", "sh1"), "d1")
      .join(sh(right).toDF("d2", "sh2"), "d2")
    val inter = graft.functions.SortedIntersectCount
      .sortedIntersectCount(col("sh1"), col("sh2")).cast("double")
    verified.select(col("d1"), col("d2"),
        StableRound.round4(
          inter / (size(col("sh1")) + size(col("sh2")) - inter))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 32, bands: Int = 16): DataFrame = {
    // repartition on the join keys: the exchange materializes the banded
    // rows ONCE and ReusedExchange shares them across both self-join
    // sides (otherwise each side re-evaluates the signature expression),
    // and the join itself needs no further shuffle.
    val banded = bandRows(docs, idCol, textCol, k, bands)
      .repartition(col("band"), col("band_sig"))
    val a = banded.select(col(idCol).as("d1"), col("band"), col("band_sig"))
    val b = banded.select(col(idCol).as("d2"), col("band"), col("band_sig"))
    val cand = a.join(b, Seq("band", "band_sig"))
      .filter(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
    // measured 1s faster at sf0.1 than forcing a ReusedExchange of the
    // shingle arrays — see verifyJaccard's scaladoc
    verifyJaccard(cand, docs, docs, idCol, textCol, threshold)
  }

  // ---- SimHash --------------------------------------------------------

  /** Per-token 60-bit hash from two independent polynomial hashes mod
    * 30-bit primes: `h = poly(31, 1e9+7) · 2^30 + poly(37, 998244353)`.
    * Deliberately engine-neutral (the same construction as
    * TextOps.fingerprint, and expressible verbatim in DuckDB via
    * list_reduce) — swapping xxhash64 for this is what turns
    * dedupe_simhash from a rows-only check into a full hash oracle.
    * All intermediates stay < 2^36, so the arithmetic never overflows
    * in either engine. The char list is let-bound ([[let1]]) so the two
    * polynomial folds share one split. */
  def tokenHash60(t: Column): Column =
    let1(filter(split(t, ""), ch => length(ch) === 1), chs => {
      def poly(base: Int, mod: Long): Column =
        aggregate(chs, lit(0L),
          (acc, ch) => pmod(acc * base + ascii(ch), lit(mod)))
      poly(31, 1000000007L) * lit(1073741824L) + poly(37, 998244353L)
    })

  /** 60-bit SimHash over the token multiset: bit b of the fingerprint is 1
    * iff the sum over tokens of ±1 (sign of bit b of tokenHash60(token))
    * is positive. Composable reference form — the production path is the
    * fused single-pass expression below. */
  def simhashComposed(text: Column): Column =
    graft.functions.SimHash64.simhash64(
      transform(split(text, " "), t => tokenHash60(t)))

  /** Fused codegen'd form of [[simhashComposed]] (one pass over the raw
    * string, no intermediate arrays — ~5× faster; TextDedupeSpec pins
    * exact equality between the two). */
  def simhash(text: Column): Column =
    graft.functions.SimHashText.simhashText(text)

  /** Near-dup pairs by SimHash hamming distance <= maxHamming, candidate
    * generation by 16-bit chunk banding (pigeonhole: hamming <= 3 implies
    * at least one of 4 chunks equal). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    // let-bound: the 64-vote simhash is evaluated at most twice per row
    // (once per struct-field extract) instead of once per chunk
    val packed = let1(simhash(col(textCol)), sh =>
      struct(sh.as("sh"),
        array((0 until 4).map(i =>
          shiftrightunsigned(sh, i * 16).bitwiseAND(lit(0xFFFFL))): _*)
          .as("chunks")))
    // same barrier trick as minhash: materialize once, reuse per side
    val chunked = docs.select(col(idCol), packed.getField("sh").as("sh"),
      posexplode(packed.getField("chunks")).as(Seq("chunk_idx", "chunk")))
      .repartition(col("chunk_idx"), col("chunk"))
    val a = chunked.select(col(idCol).as("d1"), col("sh").as("sh1"),
      col("chunk_idx"), col("chunk"))
    val b = chunked.select(col(idCol).as("d2"), col("sh").as("sh2"),
      col("chunk_idx"), col("chunk"))
    a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        bit_count(col("sh1").bitwiseXOR(col("sh2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
