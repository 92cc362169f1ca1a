package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection over documents — the LLM-pipeline dedup family
  * (north star): exact, normalized-exact, exact n-gram Jaccard via inverted
  * index, MinHash+LSH banding, and SimHash hamming-banding.
  *
  * Scale design notes:
  *  - The exact-Jaccard path is an inverted-index self-join on shingles —
  *    shuffle keyed by shingle. At 100 TB, high-document-frequency shingles
  *    create quadratic bucket blow-up; `maxShingleDf` prunes them (a
  *    stop-shingle cut, standard in similarity-join literature).
  *  - MinHash+LSH replaces the full inverted index with b band buckets per
  *    doc: cost O(docs × b) rows, candidate pairs only within equal band
  *    signatures, then exact verification on the candidates. This is the
  *    100 TB path; the exact path is the oracle-checkable baseline.
  */
object TextDedupe {

  /** 3-token shingle set (distinct) per document. Guarded for short docs. */
  def shingles(text: Column, n: Int = 3): Column = {
    val ts = split(text, " ")
    val idxs = sequence(lit(1), size(ts) - (n - 1))
    val mk = transform(idxs, i =>
      concat_ws(" ", (0 until n).map(o => element_at(ts, i + o)): _*))
    array_distinct(when(size(ts) >= n, mk).otherwise(array()))
  }

  /** Exploded (id, shingle) inverted-index view. */
  def shingleIndex(docs: DataFrame, idCol: String, textCol: String,
      carryCols: Seq[String] = Nil): DataFrame =
    docs.select((col(idCol) +: carryCols.map(col) :+
      explode(shingles(col(textCol))).as("shingle")): _*)

  /** Exact n-gram Jaccard similarity join: pairs of docs with
    * jaccard(shingles) >= threshold. `blockCol` (e.g. language) bounds the
    * candidate space; pass None for a global join. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, blockCol: Option[String] = None): DataFrame = {
    val idx = shingleIndex(docs, idCol, textCol, blockCol.toSeq)
    val sizes = idx.groupBy(col(idCol)).agg(count(lit(1)).as("nsh"))
    val a = idx.toDF(idx.columns.map(c => s"a_$c"): _*)
    val b = idx.toDF(idx.columns.map(c => s"b_$c"): _*)
    val joinCond = blockCol match {
      case Some(bc) => col("a_shingle") === col("b_shingle") &&
        col(s"a_$bc") === col(s"b_$bc") && col(s"a_$idCol") < col(s"b_$idCol")
      case None => col("a_shingle") === col("b_shingle") &&
        col(s"a_$idCol") < col(s"b_$idCol")
    }
    val inter = a.join(b, joinCond)
      .groupBy(col(s"a_$idCol"), col(s"b_$idCol"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF(s"a_$idCol", "a_nsh"), s"a_$idCol")
      .join(sizes.toDF(s"b_$idCol", "b_nsh"), s"b_$idCol")
      .select(
        col(s"a_$idCol").as("d1"), col(s"b_$idCol").as("d2"),
        round(col("inter").cast("double") /
          (col("a_nsh") + col("b_nsh") - col("inter")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---- MinHash + LSH --------------------------------------------------

  private val Prime = 2038074743L // large 31-bit prime for permutations

  /** k-permutation MinHash signature over the shingle set.
    * Base shingle hash is xxhash64 (codegen'd); permutation i is
    * (a_i·h + b_i) mod p with deterministic seeds. */
  def minhashSignature(text: Column, k: Int = 32): Column = {
    val hs = transform(shingles(text), s => pmod(xxhash64(s), lit(Prime)))
    val sig = (0 until k).map { i =>
      val a = 2L * i + 1
      val b = 1013904223L * (i + 1) % Prime
      array_min(transform(hs, h => pmod(h * a + b, lit(Prime))))
    }
    when(size(hs) > 0, array(sig: _*)).otherwise(lit(null))
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
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 32, bands: Int = 16): DataFrame = {
    val r = k / bands
    val withSig = docs
      .select(col(idCol), col(textCol),
        minhashSignature(col(textCol), k).as("sig"))
      .filter(col("sig").isNotNull)
    val banded = withSig.select(col(idCol), col(textCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        bnd => xxhash64(concat_ws("_",
          (0 until r).map(j => element_at(col("sig"), bnd * r + j + 1)): _*))))
        .as(Seq("band", "band_sig")))
    val a = banded.select(col(idCol).as("d1"), col(textCol).as("t1"),
      col("band"), col("band_sig"))
    val b = banded.select(col(idCol).as("d2"), col(textCol).as("t2"),
      col("band"), col("band_sig"))
    val cand = a.join(b, Seq("band", "band_sig"))
      .filter(col("d1") < col("d2"))
      .select("d1", "d2", "t1", "t2").distinct()
    // exact verification on candidates only
    val s1 = shingles(col("t1"))
    val s2 = shingles(col("t2"))
    val inter = size(array_intersect(s1, s2)).cast("double")
    cand.select(col("d1"), col("d2"),
        round(inter / (size(s1) + size(s2) - inter), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---- SimHash --------------------------------------------------------

  /** 64-bit SimHash over the token multiset: bit b of the fingerprint is 1
    * iff the sum over tokens of ±1 (sign of bit b of xxhash64(token)) is
    * positive. */
  def simhash(text: Column): Column = {
    val hs = transform(split(text, " "), t => xxhash64(t))
    val bitCols = (0 until 64).map { bi =>
      val vote = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(shiftrightunsigned(h, bi).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), bi)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Near-dup pairs by SimHash hamming distance <= maxHamming, candidate
    * generation by 16-bit chunk banding (pigeonhole: hamming <= 3 implies
    * at least one of 4 chunks equal). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSh = docs.select(col(idCol), simhash(col(textCol)).as("sh"))
    val chunkArr = array((0 until 4).map(i =>
      shiftrightunsigned(col("sh"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)
    val chunked = withSh.select(col(idCol), col("sh"),
      posexplode(chunkArr).as(Seq("chunk_idx", "chunk")))
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
