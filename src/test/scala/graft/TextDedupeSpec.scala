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

  test("docs shorter than shingle size produce no pairs") {
    val tiny = Seq((1L, "one two"), (2L, "one two")).toDF("doc_id", "text")
    val pairs = TextDedupe.ngramJaccardPairs(tiny, "doc_id", "text", 0.1, None)
    assert(pairs.count() == 0)
  }
}
