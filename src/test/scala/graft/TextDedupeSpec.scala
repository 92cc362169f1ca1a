package graft

import graft.ops.TextDedupe

class TextDedupeSpec extends SparkSpec {
  import sqlImplicits._

  // d1/d2 near-identical (one token differs), d3 unrelated, d4==d1 exactly
  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the old barn"),
    (2L, "the quick brown fox jumps over the lazy cat near the old barn"),
    (3L, "completely different text with no overlap at all whatsoever here"),
    (4L, "the quick brown fox jumps over the lazy dog near the old barn")
  ).toDF("doc_id", "text")

  test("ngramJaccardPairs finds the planted near-dup and the exact dup") {
    val pairs = TextDedupe.ngramJaccardPairs(docs, "doc_id", "text",
      threshold = 0.3, blockCol = None)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhashLshPairs agrees with exact pairs at high threshold") {
    val exact = TextDedupe.ngramJaccardPairs(docs, "doc_id", "text",
      threshold = 0.5, blockCol = None)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val lsh = TextDedupe.minhashLshPairs(docs, "doc_id", "text",
      threshold = 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
    assert(lsh.contains((1L, 4L)))
  }

  test("simhashPairs: identical docs at hamming 0, unrelated docs absent") {
    // NOTE: for short low-repetition docs the simhash vote margins are
    // thin, so a 1-token diff can flip many bits — only exact dups are
    // guaranteed low-hamming here. Corpus-scale docs (60+ tokens with
    // repeated vocab) land near-dups at hamming 0-3 (verified at sf0.01).
    val got = TextDedupe.simhashPairs(docs, "doc_id", "text", maxHamming = 10)
      .as[(Long, Long, Int)].collect()
      .map(t => ((t._1, t._2), t._3)).toMap
    assert(got((1L, 4L)) == 0)
    assert(!got.contains((1L, 3L)))
    assert(!got.contains((3L, 4L)))
  }

  test("fused SimHashText equals the composed HOF simhash on the real " +
      "corpus (incl. empty/multi-space edge cases)") {
    val edge = Seq((1L, ""), (2L, " "), (3L, "a  b"), (4L, " lead"),
      (5L, "trail "), (6L, "a b c d e")).toDF("doc_id", "text")
    val corpus = Tables.documents(spark, sfDir("0.001"))
      .select("doc_id", "text").unionByName(edge)
    val diff = corpus.select(
      TextDedupe.simhash($"text").as("fused"),
      TextDedupe.simhashComposed($"text").as("composed"))
      .filter($"fused" =!= $"composed").count()
    assert(diff == 0)
  }

  test("codegen ShingleArray equals the composed HOF shingles on the " +
      "real corpus (incl. short/empty/multi-space edge cases)") {
    import org.apache.spark.sql.functions._
    val edge = Seq((1L, ""), (2L, "a b"), (3L, "a b c"), (4L, "a  b c d"),
      (5L, "x x x x x"), (6L, " lead tok here"), (7L, "trail tok here "))
      .toDF("doc_id", "text")
    val corpus = Tables.documents(spark, sfDir("0.001"))
      .select("doc_id", "text").unionByName(edge)
    val diff = corpus.select(
      TextDedupe.shingles(col("text")).as("fused"),
      TextDedupe.shinglesComposed(col("text")).as("composed"))
      .filter(not(col("fused") <=> col("composed"))).count()
    assert(diff == 0)
  }

  test("prefix-filtered join is EXACT: equals brute-force pairs on a " +
      "randomized corpus across thresholds") {
    // seeded random corpus with planted duplicate structure: overlapping
    // token windows from a small vocabulary produce the full range of
    // pairwise jaccards, so the prefix filter's pruning bound is actually
    // exercised (not just hit by trivially-disjoint docs)
    val rnd = new scala.util.Random(12345)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val corpus = (1L to 40L).map { id =>
      val n = 5 + rnd.nextInt(15)
      val start = rnd.nextInt(5)
      (id, (0 until n).map(i => vocab((start + i / 2) % vocab.size))
        .mkString(" "))
    }
    val df = corpus.toDF("doc_id", "text")
    import org.apache.spark.sql.functions._
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val fast = TextDedupe.ngramJaccardPairs(df, "doc_id", "text", t, None)
        .select("d1", "d2", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      // brute force: all pairs via shingle-array crossJoin
      val sh = df.select(col("doc_id"),
        TextDedupe.shingles(col("text")).as("sh"))
        .filter(size(col("sh")) > 0)
      val brute = sh.toDF("d1", "sh1").crossJoin(sh.toDF("d2", "sh2"))
        .filter(col("d1") < col("d2"))
        .select(col("d1"), col("d2"),
          round(size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
            (size(col("sh1")) + size(col("sh2")) -
              size(array_intersect(col("sh1"), col("sh2")))), 4).as("j"))
        .filter(col("j") >= t)
        .as[(Long, Long, Double)].collect().toSet
      assert(fast == brute, s"threshold $t")
    }
  }

  test("docs shorter than shingle size produce no pairs") {
    val tiny = Seq((1L, "one two"), (2L, "one two")).toDF("doc_id", "text")
    val pairs = TextDedupe.ngramJaccardPairs(tiny, "doc_id", "text", 0.1, None)
    assert(pairs.count() == 0)
  }

  test("codegen MinHashSig equals the composed HOF signature on real " +
      "corpus text (incl. empty-shingle null)") {
    import org.apache.spark.sql.functions.{col, not}
    val docs = Tables.documents(spark, sfDir("0.001"))
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((900001L, "one two")).toDF("doc_id", "text"))
    val both = docs.select(col("doc_id"),
      TextDedupe.minhashSignature(col("text")).as("fast"),
      TextDedupe.minhashSignatureComposed(col("text")).as("slow"))
    assert(both.filter(not(col("fast") <=> col("slow"))).count() == 0)
    // the short doc has no shingles -> null signature on both paths
    assert(both.filter(col("doc_id") === 900001L)
      .filter(col("fast").isNull && col("slow").isNull).count() == 1)
  }

  test("containmentPairs: asymmetric doc-in-doc detection Jaccard misses") {
    val frag = "alpha beta gamma delta epsilon zeta" // 4 shingles
    val host = frag + " eta theta iota kappa lambda mu nu xi " +
      "omicron pi rho sigma tau" // frag's shingles all present
    val cdocs = Seq(
      (1L, frag),
      (2L, host),
      (3L, "totally unrelated words that share no shingle with anything")
    ).toDF("doc_id", "text")
    val got = TextDedupe.containmentPairs(cdocs, "doc_id", "text",
      threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    // fragment->host is full containment; host->fragment is far below
    // threshold (asymmetry is the point); nothing touches doc 3
    assert(got == Set((1L, 2L, 1.0)))
    // the same pair is invisible to Jaccard at any usable threshold
    val j = TextDedupe.ngramJaccardPairs(cdocs, "doc_id", "text",
      threshold = 0.5).count()
    assert(j == 0)
  }
}
