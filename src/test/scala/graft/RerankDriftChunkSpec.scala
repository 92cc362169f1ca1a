package graft

import org.apache.spark.sql.functions._
import graft.ops.{TextOps, VectorOps}
import graft.queries.TextQueries

/** Semantics pins for the round-16 session-2 entries.
  *
  * - `vec_mmr_rerank` / VectorOps.mmrRerank: rank 1 is the pure
  *   relevance argmax, and the diversity term genuinely reorders — a
  *   less-relevant-but-diverse candidate beats a near-duplicate of the
  *   rank-1 pick. Greedy scores are non-increasing by construction.
  * - `vec_drift_centroid` / VectorOps.centroidDrift: identical snapshots
  *   score cos_shift=1 / l2_shift=0; negated snapshots score −1 / 2·‖c‖.
  * - `text_chunk_overlap` / TextOps.chunkOverlap: the chunk law — dense
  *   ids, stride starts, window-clipped sizes, full coverage, exact
  *   overlap reconstruction against a Scala re-tokenization.
  */
class RerankDriftChunkSpec extends SparkSpec {
  import sqlImplicits._

  // ---- MMR -----------------------------------------------------------

  /** q on the x-axis; a nearly aligned with q; b a near-duplicate of a
    * (rel 0.94, sim(a,b) ≈ 0.999); c less relevant (rel 0.9) but far
    * from a (sim(a,c) ≈ 0.72). Pure relevance orders a, b, c; MMR at
    * λ=0.7 must pick c at rank 2: 0.7·0.9 − 0.3·0.72 = 0.414 beats
    * 0.7·0.94 − 0.3·0.999 ≈ 0.358. */
  test("mmrRerank: diversity demotes the near-duplicate of rank 1") {
    val q = Seq((0L, Array(1.0f, 0.0f, 0.0f)))
    val corpus = Seq(
      (1L, Array(0.95f, 0.3122f, 0.0f)),   // a: rel ≈ .95
      (2L, Array(0.94f, 0.3412f, 0.0f)),   // b: rel ≈ .94, sim(a,b) ≈ 1
      (3L, Array(0.90f, -0.43589f, 0.0f))) // c: rel ≈ .90, sim(a,c) ≈ .72
    val out = VectorOps.mmrRerank(
      corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
      q.toDF("vec_id", "embedding").select("embedding"), "embedding",
      m = 3, k = 3)
      .orderBy("rank")
      .as[(Int, Long, Double, Double)].collect()
    assert(out.map(_._2).toSeq == Seq(1L, 3L, 2L),
      s"expected diversity order 1,3,2 got ${out.toSeq}")
    // rank 1 is the relevance argmax with no diversity penalty
    assert(out(0)._4 == StableRound6(0.7 * out(0)._3), s"rank1 ${out(0)}")
    // greedy scores never increase
    assert(out.map(_._4).sliding(2).forall(p => p(0) >= p(1)),
      s"scores not non-increasing: ${out.map(_._4).toSeq}")
  }

  test("mmrRerank: k beyond the candidate pool returns the pool, ranked") {
    val q = Seq((0L, Array(1.0f, 0.0f)))
    val corpus = Seq((1L, Array(0.6f, 0.8f)), (2L, Array(0.8f, 0.6f)))
    val out = VectorOps.mmrRerank(
      corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
      q.toDF("vec_id", "embedding").select("embedding"), "embedding",
      m = 10, k = 5)
      .orderBy("rank").as[(Int, Long, Double, Double)].collect()
    assert(out.length == 2 && out.map(_._2).toSeq == Seq(2L, 1L),
      s"got ${out.toSeq}")
  }

  /** 1e-7-grid twin of the integer score assembly, for the rank-1 pin. */
  private def StableRound6(x: Double): Double =
    math.floor(x * 1e7 + 0.5) / 1e7

  test("mmrRerankBatch ≡ mmrRerank per query, nothing driver-side") {
    val emb = Tables.embeddings(spark, sfDir("0.001"))
    val single = VectorOps.mmrRerank(
      emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      emb.filter(col("vec_id") === 0).select("embedding"), "embedding",
      m = 16, k = 5)
      .as[(Int, Long, Double, Double)].collect().toSet
    val batch = VectorOps.mmrRerankBatch(
      emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      emb.filter(col("vec_id") === 0).select("vec_id", "embedding"),
      "vec_id", "embedding", m = 16, k = 5)
      .as[(Long, Int, Long, Double, Double)].collect()
    assert(batch.forall(_._1 == 0L))
    assert(batch.map(r => (r._2, r._3, r._4, r._5)).toSet == single,
      s"batch ${batch.toSeq} vs single $single")
  }

  test("mmrRerankBatch: rank 1 of every query is its relevance argmax") {
    val emb = Tables.embeddings(spark, sfDir("0.001"))
    val out = VectorOps.mmrRerankBatch(
      emb.filter(col("vec_id") >= 3), "vec_id", "embedding",
      emb.filter(col("vec_id") < 3).select("vec_id", "embedding"),
      "vec_id", "embedding", m = 16, k = 5)
      .as[(Long, Int, Long, Double, Double)].collect()
    assert(out.map(_._1).distinct.sorted.toSeq == Seq(0L, 1L, 2L))
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length == 5, s"query $q got ${rows.length} rows")
      val r1 = rows.find(_._2 == 1).get
      // rank 1 carries no diversity penalty and tops the relevance order
      assert(r1._5 == StableRound6(0.7 * r1._4), s"query $q rank1 $r1")
      assert(rows.forall(_._4 <= r1._4), s"query $q rank1 not argmax")
    }
  }

  // ---- centroid drift --------------------------------------------------

  test("centroidDrift: identical snapshots pin 1/0, negated pin -1/2|c|, " +
      "single-snapshot labels emit with null shifts") {
    // label 0: A = B = {[3,4]} → cos 1, l2 0
    // label 1: A = {[3,4]}, B = {[-3,-4]} → cos −1, l2 = 2·5 = 10
    // label 2: A only → (n_a=1, n_b=0, null, null) — must not drop
    val vecs = Seq(
      (0L, Array(3.0f, 4.0f), 0),
      (1L, Array(3.0f, 4.0f), 0),
      (2L, Array(3.0f, 4.0f), 1),
      (3L, Array(-3.0f, -4.0f), 1),
      (4L, Array(1.0f, 0.0f), 2))
    val out = VectorOps.centroidDrift(
      vecs.toDF("vec_id", "embedding", "label"), "label", "embedding",
      col("vec_id") % 2 === 0)
      .orderBy("label")
      .as[(Int, Long, Long, Option[Double], Option[Double])].collect()
    assert(out(0) == ((0, 1L, 1L, Some(1.0), Some(0.0))), s"l0 ${out(0)}")
    assert(out(1) == ((1, 1L, 1L, Some(-1.0), Some(10.0))), s"l1 ${out(1)}")
    assert(out(2) == ((2, 1L, 0L, None, None)), s"l2 ${out(2)}")
  }

  test("stream_drift_centroid keeps single-snapshot labels too") {
    import graft.queries.VectorQueries
    // label 2 exists only in snapshot A (even id), label 3 only in B
    val dir = java.nio.file.Files.createTempDirectory("sdrift").toString
    Seq((0L, Array(3.0f, 4.0f), 0), (1L, Array(3.0f, 4.0f), 0),
        (4L, Array(1.0f, 0.0f), 2), (5L, Array(0.0f, 1.0f), 3))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val batch = VectorQueries.queries("vec_drift_centroid")(spark, dir)
      .as[(Int, Long, Long, Option[Double], Option[Double])]
      .collect().toSet
    val stream = VectorQueries.queries("stream_drift_centroid")(spark, dir)
      .as[(Int, Long, Long, Option[Double], Option[Double])]
      .collect().toSet
    assert(batch.map(_._1) == Set(0, 2, 3), batch.toString)
    assert(stream == batch, s"stream $stream vs batch $batch")
  }

  test("stream_drift_centroid ≡ vec_drift_centroid (live face answers " +
      "like the offline monitor)") {
    import graft.queries.VectorQueries
    val dir = sfDir("0.001")
    val batch = VectorQueries.queries("vec_drift_centroid")(spark, dir)
      .as[(Int, Long, Long, Double, Double)].collect().toSet
    val stream = VectorQueries.queries("stream_drift_centroid")(spark, dir)
      .as[(Int, Long, Long, Double, Double)].collect().toSet
    assert(stream == batch, s"stream $stream vs batch $batch")
  }

  test("centroidDrift: snapshot counts split the corpus") {
    val out = VectorOps.centroidDrift(
      Tables.embeddings(spark, sfDir("0.001")), "label", "embedding",
      col("vec_id") % 2 === 0)
      .agg(sum(col("n_a") + col("n_b"))).as[Long].head()
    val n = Tables.embeddings(spark, sfDir("0.001")).count()
    assert(out == n, s"drift rows cover $out of $n vectors")
  }

  // ---- chunking --------------------------------------------------------

  test("chunkOverlap: the chunk law on a synthetic 50-token doc") {
    val toks = (1 to 50).map(i => s"t$i")
    val docs = Seq((7L, toks.mkString(" "))).toDF("doc_id", "text")
    val out = TextOps.chunkOverlap(docs, "doc_id", "text",
      window = 32, stride = 24)
      .orderBy("chunk_id")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out.length == 3, s"⌈50/24⌉ = 3 chunks, got ${out.length}")
    assert(out(0) == ((7L, 0L, 0L, 32L, toks.take(32).mkString(" "))))
    assert(out(1) == ((7L, 1L, 24L, 26L,
      toks.slice(24, 50).mkString(" "))))
    assert(out(2) == ((7L, 2L, 48L, 2L, toks.slice(48, 50).mkString(" "))))
  }

  test("dedupe_chunks: aligned shared block counts, unaligned does not") {
    val tA = (1 to 64).map(i => s"a$i")   // doc 0: blocks [a1..a32][a33..a64]
    val tB = (1 to 32).map(i => s"b$i") ++ tA.slice(32, 64) // aligned share
    val tC = (1 to 16).map(i => s"c$i") ++ tA.slice(32, 64) ++
      (1 to 16).map(i => s"d$i")          // same span, 16-token offset
    val dir = java.nio.file.Files.createTempDirectory("chunkdup").toString
    Seq((0L, tA.mkString(" ")), (1L, tB.mkString(" ")),
        (2L, tC.mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("synth"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.queries("dedupe_chunks")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(0L) == ((2L, 1L, 0.5)), s"doc0 ${out(0L)}")   // a33..a64 shared
    assert(out(1L) == ((2L, 1L, 0.5)), s"doc1 ${out(1L)}")
    assert(out(2L) == ((2L, 0L, 0.0)), s"doc2 ${out(2L)}")   // unaligned
  }

  test("pipeline_dedupe_cascade: each stage drops exactly its own dup " +
      "kind, in cheap-to-expensive order") {
    val a = (1 to 64).map(i => s"a$i")
    val b = (1 to 32).map(i => s"b$i")
    val c = (1 to 64).map(i => s"c$i")
    // doc 3: near-dup of doc 0 (4 sparse mutations → every block
    // differs, but shingle Jaccard = 52/72 ≈ 0.72 ≥ 0.5)
    val nearDup = a.zipWithIndex.map { case (t, i) =>
      if ((i + 1) % 16 == 0) s"x${i + 1}" else t }
    val docs = Seq(
      (0L, a.mkString(" ")),        // survives everything
      (1L, a.mkString(" ")),        // exact copy → stage 1
      (2L, (a.take(32) ++ b ++ a.slice(32, 64)).mkString(" ")),
                                    // 2 of 3 blocks dup → stage 2
      (3L, nearDup.mkString(" ")),  // near-dup → stage 3
      (4L, c.mkString(" ")))        // fresh → kept
    val dir = java.nio.file.Files.createTempDirectory("cascade").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("synth"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val row = TextQueries.queries("pipeline_dedupe_cascade")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(row == ((5L, 1L, 1L, 1L, 2L, 128L)), row.toString)
  }

  test("chunkDedupeBatch: keep law, cross-batch index probe, and " +
      "replay idempotence") {
    import graft.streaming.StreamOps
    val base = java.nio.file.Files.createTempDirectory("chunkdd").toString
    val idx = s"$base/index"; val out = s"$base/out"
    def doc(id: Long, toks: Seq[String]) = (id, toks.mkString(" "))
    val a = (1 to 64).map(i => s"a$i")   // doc 0: 2 blocks
    val b = (1 to 32).map(i => s"b$i")
    val c = (1 to 16).map(i => s"c$i")
    // batch 0: doc 0 lands fresh; doc 1 shares doc 0's 2nd block
    // (batch-mate probe) among its 3 blocks → 1 of 3 dup → keep
    StreamOps.chunkDedupeBatch(
      Seq(doc(0L, a), doc(1L, b ++ a.slice(32, 64) ++ c))
        .toDF("doc_id", "text"), 0L, "doc_id", "text", idx, out)
    // batch 1: doc 2 = doc 0's both blocks verbatim (cross-batch index
    // probe) → 2 of 2 dup → dropped
    StreamOps.chunkDedupeBatch(
      Seq(doc(2L, a)).toDF("doc_id", "text"), 1L, "doc_id", "text",
      idx, out)
    def read() = spark.read.parquet(out)
      .select("doc_id", "n_chunks", "n_dup_chunks", "keep")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    val first = read()
    assert(first == Set((0L, 2L, 0L, true), (1L, 3L, 1L, true),
      (2L, 2L, 2L, false)), first.toString)
    // replay batch 1 (same id, same rows): at-least-once execution must
    // leave the landed verdicts bit-identical
    StreamOps.chunkDedupeBatch(
      Seq(doc(2L, a)).toDF("doc_id", "text"), 1L, "doc_id", "text",
      idx, out)
    assert(read() == first, "replay changed the landed verdicts")
    // compaction (threshold 1 forces a fold before batch 2's probe):
    // the folded index must gate EXACTLY like the per-batch partitions —
    // doc 3 repeats doc 0's blocks and is still dropped
    StreamOps.chunkDedupeBatch(
      Seq(doc(3L, a)).toDF("doc_id", "text"), 2L, "doc_id", "text",
      idx, out, compactAfter = 1)
    val after = read()
    assert(after == first + ((3L, 2L, 2L, false)), after.toString)
    val parts = new java.io.File(idx).listFiles()
      .map(_.getName).filter(_.startsWith("__batch_id=")).toSet
    assert(parts.exists(_.startsWith("__batch_id=-")),
      s"no folded generation partition in $parts")
  }

  test("chunkOverlap: coverage + overlap reconstruction on driver docs") {
    val dir = sfDir("0.001")
    val out = TextQueries.queries("text_chunk_overlap")(spark, dir)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1)
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out.keySet == docs.keySet, "every doc chunks")
    out.foreach { case (id, chunks) =>
      val toks = docs(id).split(" ", -1)
      val sorted = chunks.sortBy(_._2)
      // dense ids, stride starts, window-clipped sizes
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      sorted.foreach { case (_, cid, start, n, text) =>
        assert(start == cid * 24 && start < toks.length)
        assert(n == math.min(32, toks.length - start) && n >= 1)
        assert(text == toks.slice(start.toInt, (start + n).toInt)
          .mkString(" "), s"doc $id chunk $cid text mismatch")
      }
      // full coverage: the last chunk ends at the doc's last token
      val last = sorted.last
      assert(last._3 + last._4 == toks.length, s"doc $id coverage")
    }
  }
}
