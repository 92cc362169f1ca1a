package graft

import org.apache.spark.sql.functions._
import graft.ops.VectorOps

class VectorOpsSpec extends SparkSpec {
  import sqlImplicits._

  private def vecs() = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f)),  // near query
    (2L, Seq(0.0f, 1.0f, 0.0f)),  // orthogonal
    (3L, Seq(-1.0f, 0.0f, 0.0f)), // opposite
    (4L, Seq(0.8f, 0.2f, 0.1f))   // near query
  ).toDF("vec_id", "embedding")

  test("cosineTopK ranks by cosine, excludes nothing, rounds output") {
    val q = vecs().filter($"vec_id" === 0).select("embedding")
    val got = VectorOps.cosineTopK(vecs().filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, "embedding", k = 2)
      .as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 4L)) // the two near vectors
    assert(got.forall(r => r._2 > 0.9))
  }

  test("pairwiseCosine self-join finds the symmetric near pair once") {
    val got = VectorOps.pairwiseCosine(vecs(), "vec_id", "embedding",
      threshold = 0.9, blockCol = None)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 1L)) && got.contains((1L, 4L)))
    assert(got.forall(p => p._1 < p._2)) // each pair exactly once
  }

  test("ivfPairwiseCosine: recall 1 vs the exact tier on clustered data, " +
      "cell-keyed candidate join (no all-pairs), precision structural") {
    // four well-separated planted clusters, 30 vectors each, dim 8
    val rnd = new scala.util.Random(7)
    val anchors = Seq(
      Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f))
    val rows = for {
      c <- anchors.indices; i <- 0 until 30
    } yield ((c * 30 + i).toLong,
      anchors(c).map(x => x + rnd.nextFloat() * 0.2f).toSeq)
    val df = rows.toDF("vec_id", "embedding")
    val exact = VectorOps.pairwiseCosine(df, "vec_id", "embedding",
      threshold = 0.9, blockCol = None)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val ivf = VectorOps.ivfPairwiseCosine(df, "vec_id", "embedding",
      threshold = 0.9, nCentroids = 8, nAssign = 3)
    val got = ivf.select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "planted clusters must produce exact pairs")
    assert((exact -- got).isEmpty,
      s"recall must be 1.0; missed ${(exact -- got).size} of ${exact.size}")
    // precision is structural (exact verify): no pair below threshold
    assert(got == exact)
    // plan evidence: the candidate join keys on the IVF cell, so the
    // block size is cell-bounded — never an id-only theta join
    val plan = ivf.queryExecution.executedPlan.toString
    assert(plan.contains("a___cell"), s"expected cell join key in:\n$plan")
  }

  test("ivf near-dup regime (dedupe_embed_ivf's r17 re-scope): at " +
      "threshold 0.9 with nCentroids=ceil(sqrt(m)), nAssign=3, the " +
      "planted corpus blocks at recall 1.0 with candidate fraction " +
      "well below 1 (the regime where blocking PAYS — at the 0.45 " +
      "semantic band r14 proved no recall-1.0 blocking prunes)") {
    import org.apache.spark.sql.functions._
    val emb0 = Tables.embeddings(spark, sfDir("0.1"))
      .select("vec_id", "embedding")
    val n = emb0.count()
    val dim = emb0.select(size(col("embedding"))).head().getInt(0)
    val planted = emb0.filter(pmod(col("vec_id"), lit(5)) === 0)
      .select((col("vec_id") + n).as("vec_id"),
        concat(array((element_at(col("embedding"), 1) * lit(0.5f))
            .cast("float")),
          slice(col("embedding"), 2, dim - 1)).as("embedding"))
    val emb = emb0.union(planted)
    val m = n + (n + 4) / 5
    val nc = VectorOps.superK(m.toInt)
    val exact = VectorOps.pairwiseCosine(emb, "vec_id", "embedding",
        threshold = 0.9, blockCol = None)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exact.size == (n + 4) / 5,
      s"every planted pair must clear 0.9: ${exact.size}")
    val got = VectorOps.ivfPairwiseCosine(emb, "vec_id", "embedding",
        threshold = 0.9, nCentroids = nc, nAssign = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got == exact,
      s"recall/precision must be 1.0: missed ${(exact -- got).size}, " +
        s"extra ${(got -- exact).size}")
    // candidate fraction: pairs sharing >=1 of the 3 probed cells
    val cents = VectorOps.ivfTrain(emb, "embedding", nc, seed = 42L)
    val cells = VectorOps.multiAssign(
        VectorOps.withNorm(emb, "embedding"), "embedding", cents, 3)
      .select(col("vec_id"), col("__cell"))
    val cand = cells.as("a").join(cells.as("b"),
        col("a.__cell") === col("b.__cell") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id")).distinct().count()
    val frac = cand.toDouble / (m.toDouble * (m - 1) / 2)
    info(f"m=$m nc=$nc pairs=${exact.size} cand_frac=$frac%.3f")
    // measured 0.174 at m=2400 (shrinks as na^2/sqrt(m): 0.089 at sf1)
    assert(frac < 0.3, s"blocking stopped pruning: cand_frac=$frac")
  }

  test("ivfCosineMatches: cross-set matches equal the brute-force cross " +
      "join on clustered data; corpus is never self-joined") {
    val rnd = new scala.util.Random(11)
    val anchors = Seq(
      Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f))
    def mk(ids: Range) = ids.map { i =>
      (i.toLong,
        anchors(i % 3).map(x => x + rnd.nextFloat() * 0.2f).toSeq)
    }.toDF("vec_id", "embedding")
    val corpus = mk(0 until 60)
    val queries = mk(100 until 130)
    val got = VectorOps.ivfCosineMatches(queries, corpus,
      "vec_id", "embedding", threshold = 0.9, nCentroids = 6, nAssign = 3)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    // brute force cross-set reference
    val cRows = corpus.as[(Long, Seq[Float])].collect()
    val qRows = queries.as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      d / (na * nb)
    }
    val want = (for {
      (qi, qv) <- qRows; (ci, cv) <- cRows if cos(qv, cv) >= 0.9
    } yield (qi, ci)).toSet
    assert(want.nonEmpty)
    assert(got == want,
      s"missed ${(want -- got).size}, spurious ${(got -- want).size}")
  }

  test("annCosineTopK candidates carry exact cosine scores (subset of " +
      "brute force) and find genuinely near duplicates") {
    val d = sfDir("0.001")
    val emb = Tables.embeddings(spark, d)
    val q = emb.filter($"vec_id" === 0).select("embedding")
    val exact = VectorOps.cosineTopK(emb.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, "embedding", k = 50)
      .as[(Long, Double)].collect().toMap
    val ann = VectorOps.annCosineTopK(emb.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, "embedding", k = 10,
      nBits = 8, dim = 64, probe = 1)
      .as[(Long, Double)].collect()
    // every ANN hit that brute force also ranked carries the SAME score
    ann.foreach { case (id, cos) =>
      exact.get(id).foreach(e => assert(math.abs(e - cos) < 1e-9)) }
    assert(ann.nonEmpty)
  }

  test("ivfCosineTopK candidates carry exact cosine scores and probing " +
      "all cells degenerates to exact top-k") {
    val d = sfDir("0.001")
    val emb = Tables.embeddings(spark, d)
    val q = emb.filter($"vec_id" === 0).select("embedding")
    val exact = VectorOps.cosineTopK(emb.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, "embedding", k = 10)
      .as[(Long, Double)].collect().toSeq
    val ivfAll = VectorOps.ivfCosineTopK(emb.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, "embedding", k = 10,
      nCentroids = 8, nProbe = 8) // probe every cell ⇒ exact
      .as[(Long, Double)].collect().toSeq
    assert(ivfAll == exact)
    val exactAll = VectorOps.cosineTopK(emb.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, "embedding", k = 5000)
      .as[(Long, Double)].collect().toMap
    val ivf = VectorOps.ivfCosineTopK(emb.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, "embedding", k = 10,
      nCentroids = 8, nProbe = 2)
      .as[(Long, Double)].collect()
    assert(ivf.nonEmpty)
    // every IVF hit carries the same score brute force computed for it
    ivf.foreach { case (id, cos) =>
      exactAll.get(id).foreach(e => assert(math.abs(e - cos) < 1e-9)) }
  }

  test("ivfCosineTopKPruned (partitioned layout) equals in-memory IVF " +
      "and its plan prunes partitions") {
    val d = sfDir("0.001")
    val emb = Tables.embeddings(spark, d)
    val corpus = emb.filter($"vec_id" =!= 0).select("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 0).select("embedding")
    val centroids = VectorOps.ivfTrain(corpus, "embedding", 8, seed = 42L)
    val dir = s"/tmp/graft_ivf_spec_${System.nanoTime()}"
    val pruned = VectorOps.ivfCosineTopKPruned(spark, corpus, "vec_id",
      "embedding", q, "embedding", k = 10, centroids, nProbe = 2, dir)
    val inMem = VectorOps.ivfCosineTopK(corpus, "vec_id", "embedding",
      q, "embedding", k = 10, nCentroids = 8, nProbe = 2, seed = 42L)
    assert(pruned.as[(Long, Double)].collect().toSeq ==
      inMem.as[(Long, Double)].collect().toSeq)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"))
  }

  test("ivfFilteredTopK: label filter + probes BOTH prune partitions, " +
      "and the result equals brute force over the label's sub-corpus") {
    val d = sfDir("0.001")
    val emb = Tables.embeddings(spark, d)
    val corpus = emb.filter($"vec_id" =!= 0)
      .select("vec_id", "embedding", "label")
    val q = emb.filter($"vec_id" === 0).select("embedding")
    val centroids = VectorOps.ivfTrain(
      corpus.select("vec_id", "embedding"), "embedding", 8, seed = 42L)
    val dir = s"/tmp/graft_ivff_spec_${System.nanoTime()}"
    val got = VectorOps.ivfFilteredTopK(spark, corpus, "vec_id",
      "embedding", "label", 2, q, "embedding", k = 10, centroids,
      nProbe = 8, layoutDir = dir) // probe ALL cells: filtered exact
    val exact = VectorOps.cosineTopK(
      corpus.filter($"label" === 2).select("vec_id", "embedding"),
      "vec_id", "embedding", q, "embedding", k = 10)
    assert(got.as[(Long, Double)].collect().toSeq ==
      exact.as[(Long, Double)].collect().toSeq)
    // no off-label row can appear regardless of probes — the filter is
    // structural (a partition dimension), not a post-hoc cut
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell")
      && plan.contains("label"))
    // selective-probe run still returns only label rows + prunes
    val narrow = VectorOps.ivfFilteredTopK(spark, corpus, "vec_id",
      "embedding", "label", 2, q, "embedding", k = 10, centroids,
      nProbe = 2, layoutDir = dir)
    val labelIds = corpus.filter($"label" === 2)
      .select("vec_id").as[Long].collect().toSet
    assert(narrow.as[(Long, Double)].collect()
      .forall(r => labelIds.contains(r._1)))
    // structural invariance — the entry's core claim: with the SAME
    // quantizer, a corpus stripped of every off-label row yields the
    // IDENTICAL narrow-probe result (off-label rows can never displace,
    // shadow, or dilute a filtered search; the filter is a partition
    // dimension, not a post-hoc cut over shared candidates)
    val dir2 = s"/tmp/graft_ivff_spec2_${System.nanoTime()}"
    val onlyLabel = VectorOps.ivfFilteredTopK(spark,
      corpus.filter($"label" === 2), "vec_id", "embedding", "label", 2,
      q, "embedding", k = 10, centroids, nProbe = 2, layoutDir = dir2)
    assert(onlyLabel.as[(Long, Double)].collect().toSeq ==
      narrow.as[(Long, Double)].collect().toSeq)
  }

  test("ivfFilteredTopK centroid fingerprint: same centroids reuse the " +
      "layout, retrained centroids force a rebuild (no stale cells)") {
    val d = sfDir("0.001")
    val emb = Tables.embeddings(spark, d)
    val corpus = emb.filter($"vec_id" =!= 0)
      .select("vec_id", "embedding", "label")
    val q = emb.filter($"vec_id" === 0).select("embedding")
    val centroids = VectorOps.ivfTrain(
      corpus.select("vec_id", "embedding"), "embedding", 8, seed = 42L)
    val dir = s"/tmp/graft_ivff_fp_${System.nanoTime()}"
    def fp(): String = {
      val src = scala.io.Source.fromFile(s"$dir/_centroids.fp", "UTF-8")
      try src.mkString finally src.close()
    }
    VectorOps.ivfFilteredTopK(spark, corpus, "vec_id", "embedding",
      "label", 2, q, "embedding", 10, centroids, 8, dir).collect()
    val f1 = fp()
    val m1 = new java.io.File(s"$dir/_centroids.fp").lastModified()
    // same centroids: layout reused (sidecar untouched)
    VectorOps.ivfFilteredTopK(spark, corpus, "vec_id", "embedding",
      "label", 2, q, "embedding", 10, centroids, 8, dir).collect()
    assert(fp() == f1 &&
      new java.io.File(s"$dir/_centroids.fp").lastModified() == m1)
    // retrained (here: reordered) centroids: cell ids change, so a
    // stale layout would disagree with the probe math — the
    // fingerprint mismatch forces a rebuild and the result stays the
    // label-filtered exact answer
    val got = VectorOps.ivfFilteredTopK(spark, corpus, "vec_id",
      "embedding", "label", 2, q, "embedding", 10, centroids.reverse,
      8, dir)
    assert(fp() != f1, "sidecar unchanged — stale layout was served")
    val exact = VectorOps.cosineTopK(
      corpus.filter($"label" === 2).select("vec_id", "embedding"),
      "vec_id", "embedding", q, "embedding", k = 10)
    assert(got.as[(Long, Double)].collect().toSeq ==
      exact.as[(Long, Double)].collect().toSeq)
  }

  test("lshCosineTopKPruned (partitioned layout) equals inline LSH " +
      "and its plan prunes partitions") {
    val d = sfDir("0.001")
    val emb = Tables.embeddings(spark, d)
    val corpus = emb.filter($"vec_id" =!= 0).select("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 0).select("embedding")
    val dir = s"/tmp/graft_lsh_spec_${System.nanoTime()}"
    val pruned = VectorOps.lshCosineTopKPruned(spark, corpus, "vec_id",
      "embedding", q, "embedding", k = 10, nBits = 8, dim = 64, probe = 1,
      dir)
    val inline = VectorOps.annCosineTopK(corpus, "vec_id", "embedding",
      q, "embedding", k = 10, nBits = 8, dim = 64, probe = 1)
    assert(pruned.as[(Long, Double)].collect().toSeq ==
      inline.as[(Long, Double)].collect().toSeq)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"))
  }

  test("persisted PQ layout: equals inline PQ and IVF+PQ; ADC scan reads " +
      "only (id, codes); floats fetched via pushed id-IN filter") {
    val d = sfDir("0.001")
    val emb = Tables.embeddings(spark, d)
    val corpus = emb.filter($"vec_id" =!= 0).select("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 0).select("embedding")

    // flat PQ: persisted results == inline re-train/re-encode results
    val dirPq = s"/tmp/graft_pq_spec_${System.nanoTime()}"
    val mPq = VectorOps.pqLayoutEnsure(spark, corpus, "vec_id", "embedding",
      dirPq, nCentroids = 0)
    assert(mPq.centroids.isEmpty && mPq.codebooks.length == 8)
    val gotPq = VectorOps.pqCosineTopKFromLayout(spark, dirPq, mPq,
      "vec_id", "embedding", q, "embedding", k = 10, rerank = 40)
    val inlinePq = VectorOps.pqCosineTopK(corpus, "vec_id", "embedding",
      q, "embedding", k = 10, m = 8, kCent = 16, rerank = 40)
    assert(gotPq.as[(Long, Double)].collect().toSeq ==
      inlinePq.as[(Long, Double)].collect().toSeq)
    // the rerank stage reads floats through a PUSHED bounded id filter
    // and never reads the codes column
    val rerankPlan = gotPq.queryExecution.executedPlan.toString
    assert(rerankPlan.contains("PushedFilters") &&
      rerankPlan.contains("In(vec_id"))
    assert(!rerankPlan.contains("codes"))

    // second ensure call is a pure read (model loaded, nothing re-trained)
    val mPq2 = VectorOps.pqLayoutEnsure(spark, corpus, "vec_id",
      "embedding", dirPq, nCentroids = 0)
    assert(mPq2.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      mPq.codebooks.map(_.map(_.toSeq).toSeq).toSeq)

    // IVF+PQ: persisted == inline, and the ADC stage prunes cell
    // partitions while reading only (id, codes)
    val dirIvf = s"/tmp/graft_ivfpq_spec_${System.nanoTime()}"
    val mIvf = VectorOps.pqLayoutEnsure(spark, corpus, "vec_id",
      "embedding", dirIvf, nCentroids = 8)
    assert(mIvf.centroids.length == 8)
    val gotIvf = VectorOps.pqCosineTopKFromLayout(spark, dirIvf, mIvf,
      "vec_id", "embedding", q, "embedding", k = 10, rerank = 40,
      nProbe = 2)
    val inlineIvf = VectorOps.ivfPqCosineTopK(corpus, "vec_id",
      "embedding", q, "embedding", k = 10, nCentroids = 8, nProbe = 2,
      m = 8, kCent = 16, rerank = 40)
    assert(gotIvf.as[(Long, Double)].collect().toSeq ==
      inlineIvf.as[(Long, Double)].collect().toSeq)
    val qv = q.collect()(0).getSeq[Float](0).toArray
    val qn = math.sqrt(qv.map(x => x.toDouble * x).sum)
    val qhat = qv.map(x => (x / qn).toFloat)
    val adcPlan = VectorOps.adcCandidates(spark, dirIvf, mIvf, "vec_id",
      qhat, rerank = 40, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(adcPlan.contains("PartitionFilters") && adcPlan.contains("cell"))
    assert(adcPlan.contains("codes") && !adcPlan.contains("embedding"),
      "ADC candidate scan must not touch the float vector column")
  }

  test("codegen'd PqEncode equals the composed-Column encoder exactly") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sfDir("0.001"))
    val model = VectorOps.pqTrainModel(emb, "embedding", nCentroids = 0)
    // normalized inputs, like both encode call sites produce
    val unit = transform(col("embedding"),
      x => (x.cast("double") / sqrt(graft.functions.FloatVecDot.dot(
        col("embedding"), col("embedding")))).cast("float"))
    val both = emb.select(col("vec_id"),
      VectorOps.pqEncode(unit, model.codebooks).as("fast"),
      VectorOps.pqEncodeComposed(unit, model.codebooks).as("slow"))
    assert(both.filter(not(col("fast") <=> col("slow"))).count() == 0)
    // and the fast path produces m codes in [0, k)
    val row = both.select("fast").head().getSeq[Int](0)
    assert(row.length == 8 && row.forall(c => c >= 0 && c < 16))
  }

  test("quantizeInt8: symmetric scale, half-up rounding, zero-vector safe") {
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.0f, 0.25f)),
      (2L, Seq(0.0f, 0.0f)),            // zero vector -> all-zero codes
      (3L, Seq(-2.0f, 1.0f))            // negative max-magnitude
    ).toDF("id", "v")
    val got = df.select(col("id"), VectorOps.quantizeInt8(col("v")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // maxabs=1: 127, floor(-63.5+0.5)=-63, 0, floor(31.75+0.5)=32
    assert(got(1L) == Seq(127, -63, 0, 32))
    assert(got(2L) == Seq(0, 0))
    assert(got(3L) == Seq(-127, 64)) // floor(63.5+0.5)=64
    // round-trip error bounded by half a quantization step
    val err = df.filter(col("id") =!= 2).select(col("v"),
        VectorOps.quantizeInt8(col("v")).as("q"))
      .collect().map { r =>
        val v = r.getSeq[Float](0); val q = r.getSeq[Int](1)
        val maxabs = v.map(x => math.abs(x.toDouble)).max
        v.zip(q).map { case (x, c) =>
          math.abs(x.toDouble - c * maxabs / 127.0) }.max
      }.max
    assert(err <= 0.5 * 2.0 / 127.0 + 1e-9)
  }

  test("ivfTrain is deterministic and centroids are unit-norm") {
    val d = sfDir("0.001")
    val emb = Tables.embeddings(spark, d)
    val c1 = VectorOps.ivfTrain(emb, "embedding", 8, seed = 7L)
    val c2 = VectorOps.ivfTrain(emb, "embedding", 8, seed = 7L)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    c1.foreach { c =>
      val n = math.sqrt(c.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-3)
    }
  }

  test("ann with full probe distance degenerates to exact top-k") {
    val d = sfDir("0.001")
    val emb = Tables.embeddings(spark, d)
    val q = emb.filter($"vec_id" === 0).select("embedding")
    val exact = VectorOps.cosineTopK(emb.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, "embedding", k = 10)
      .as[(Long, Double)].collect().toSeq
    val annAll = VectorOps.annCosineTopK(emb.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, "embedding", k = 10,
      nBits = 8, dim = 64, probe = 8) // hamming <= nBits: every bucket
      .as[(Long, Double)].collect().toSeq
    assert(annAll == exact)
  }

  test("annCosineTopKBatch slices equal single-query annCosineTopK " +
      "per query (same planes, same buckets)") {
    val d = sfDir("0.001")
    val emb = Tables.embeddings(spark, d)
    val corpus = emb.filter($"vec_id" >= 5).select("vec_id", "embedding")
    val queries = emb.filter($"vec_id" < 3).select("vec_id", "embedding")
    val batch = VectorOps.annCosineTopKBatch(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 4, nBits = 8, dim = 64, probe = 1)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSeq).toMap
    (0L until 3L).foreach { qid =>
      val single = VectorOps.annCosineTopK(corpus, "vec_id", "embedding",
        emb.filter($"vec_id" === qid).select("embedding"), "embedding",
        k = 4, nBits = 8, dim = 64, probe = 1)
        .as[(Long, Double)].collect().toSeq
      assert(batch.getOrElse(qid, Seq.empty) == single, s"query $qid")
    }
  }

  test("PQ: codes are bounded small ints, training is deterministic, " +
      "and rerank-all degenerates to exact top-k") {
    val d = sfDir("0.001")
    val emb = Tables.embeddings(spark, d)
    val corpus = emb.filter($"vec_id" =!= 0).select("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 0).select("embedding")
    val cb1 = VectorOps.pqTrain(corpus, "embedding", m = 8, k = 16, seed = 7L)
    val cb2 = VectorOps.pqTrain(corpus, "embedding", m = 8, k = 16, seed = 7L)
    assert(cb1.map(_.map(_.toSeq).toSeq).toSeq ==
      cb2.map(_.map(_.toSeq).toSeq).toSeq) // deterministic
    assert(cb1.length == 8 && cb1(0).length == 16 && cb1(0)(0).length == 8)
    // codes: m ints in [0, k) — the 8-byte storage claim
    val codes = corpus.select(
      VectorOps.pqEncode(col("embedding"), cb1).as("c"))
      .select(explode($"c").as("ci")).as[Int].collect()
    assert(codes.forall(c => c >= 0 && c < 16))
    // rerank = corpus size ⇒ the ADC preselection cannot drop anything:
    // result equals exact brute force
    val n = corpus.count().toInt
    val pqAll = VectorOps.pqCosineTopK(corpus, "vec_id", "embedding",
      q, "embedding", k = 10, m = 8, kCent = 16, rerank = n)
      .as[(Long, Double)].collect().toSeq
    val exact = VectorOps.cosineTopK(corpus, "vec_id", "embedding",
      q, "embedding", k = 10).as[(Long, Double)].collect().toSeq
    assert(pqAll == exact)
    // IVF+PQ with probe-all + rerank-all also degenerates to exact
    val ivfpqAll = VectorOps.ivfPqCosineTopK(corpus, "vec_id", "embedding",
      q, "embedding", k = 10, nCentroids = 8, nProbe = 8,
      m = 8, kCent = 16, rerank = n)
      .as[(Long, Double)].collect().toSeq
    assert(ivfpqAll == exact)
  }

  test("planted corpus has true neighbors and ANN recall@10 is genuinely " +
      "asserted — including the negative control") {
    import graft.queries.VectorQueries
    val d = sfDir("0.001")
    val (corpus, query) = VectorQueries.plantedCorpus(spark, d)
    // the fixture does what it claims: >= 10 true neighbors at cos >= 0.99
    // (the raw synthetic corpus maxes out at 0.513, so recall on it was
    // untestable — this is the round-3 fix)
    val exact = VectorOps.cosineTopK(corpus, "vec_id", "embedding",
      query, "embedding", k = 10).as[(Long, Double)].collect()
    assert(exact.length == 10 && exact.forall(_._2 >= 0.99))
    assert(exact.forall(_._1 >= 100000)) // all planted ids
    // positive: LSH ANN over the planted corpus achieves the bound
    val ann = VectorOps.annCosineTopK(corpus, "vec_id", "embedding",
      query, "embedding", k = 10, nBits = 8, dim = 64, probe = 1)
    val okCol = VectorQueries.annotateRecall(ann,
      VectorOps.cosineTopK(corpus, "vec_id", "embedding", query,
        "embedding", k = 10), k = 10, minRecall = 0.9)
      .select("recall_ok").distinct().as[Boolean].collect().toSeq
    assert(okCol == Seq(true))
    // negative control: a deliberately broken "ANN" (bottom-10 by cosine)
    // must flip recall_ok to false through the SAME machinery — proving
    // the assertion can actually fail
    val worst = VectorOps.cosineTopK(corpus, "vec_id", "embedding",
      query, "embedding", k = corpus.count().toInt)
      .orderBy(col("cos_sim").asc).limit(10)
    val badCol = VectorQueries.annotateRecall(worst,
      VectorOps.cosineTopK(corpus, "vec_id", "embedding", query,
        "embedding", k = 10), k = 10, minRecall = 0.9)
      .select("recall_ok").distinct().as[Boolean].collect().toSeq
    assert(badCol == Seq(false))
  }

  test("maxSim: doc covering every query vector scores m; orthogonal doc scores 0") {
    // query = the 3 axis vectors; doc 1 contains all three axes (each
    // query vector finds a perfect match → MaxSim = 3.0), doc 2 covers
    // one axis plus an orthogonal filler → MaxSim = 1.0, doc 3 is
    // entirely orthogonal → MaxSim = 0.0
    def axis(i: Int) = Seq.tabulate(4)(j => if (j == i) 1.0f else 0.0f)
    val queries = (0 to 2).map(i => (i.toLong, axis(i)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1, axis(0)), (1, axis(1)), (1, axis(2)),
      (2, axis(0)), (2, axis(3)),
      (3, axis(3)), (3, axis(3)))
      .toDF("label", "embedding")
    val got = VectorOps.maxSim(corpus, "label", "embedding",
        queries, "vec_id", "embedding")
      .as[(Int, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1) == ((1, 3L, 3.0)), got(1).toString)
    assert(got(2) == ((2, 3L, 1.0)), got(2).toString)
    assert(got(3) == ((3, 3L, 0.0)), got(3).toString)
  }

  test("signPack: packed bits equal the per-dim sign pattern, including " +
      "bit 63 (negative long); zeros pack as 0-bits") {
    // dim 64: positives at positions 0, 5, 63; a zero at 1; negatives rest
    val v = Array.tabulate(64) {
      case 0 => 1.0f; case 5 => 0.25f; case 63 => 2.0f
      case 1 => 0.0f; case _ => -1.0f
    }.toSeq
    val got = Seq((1L, v)).toDF("vec_id", "embedding")
      .select(VectorOps.signPack(col("embedding"), 64))
      .as[Long].head()
    assert(got == ((1L << 0) + (1L << 5) + (1L << 63)))
    assert(got < 0, "bit 63 must land in the sign bit")
  }

  test("bqTopK with candidates >= corpus degenerates to exact cosine " +
      "top-k; hamming column is the true sign-disagreement count") {
    val corpus = vecs().filter($"vec_id" =!= 0)
    val q = vecs().filter($"vec_id" === 0).select("embedding")
    val bq = VectorOps.bqTopK(corpus, "vec_id", "embedding",
      q, "embedding", dim = 3, candidates = 100, k = 2)
      .as[(Long, Long, Double)].collect()
    val exact = VectorOps.cosineTopK(corpus, "vec_id", "embedding",
      q, "embedding", k = 2).as[(Long, Double)].collect()
    assert(bq.map(r => (r._1, r._3)).toSeq == exact.toSeq)
    // query signs: (+,0,0) -> bits {0}; id 2 (0,1,0) -> bits {1}:
    // hamming 2; id 3 (-1,0,0) -> bits {}: hamming 1
    val byId = VectorOps.bqTopK(corpus, "vec_id", "embedding",
      q, "embedding", dim = 3, candidates = 100, k = 4)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(byId(2L) == 2L && byId(3L) == 1L)
  }

  test("bqTopKBatch slices equal single-query bqTopK (the serving-fleet " +
      "form changes the plan, never the answer)") {
    val emb = spark.read
      .parquet(s"${sfDir("0.001")}/embeddings.parquet")
    val corpus = emb.filter($"vec_id" >= 3)
    val batch = VectorOps.bqTopKBatch(corpus, "vec_id", "embedding",
      emb.filter($"vec_id" < 3).select("vec_id", "embedding"),
      "vec_id", "embedding", dim = 64, candidates = 50, k = 5)
      .as[(Long, Long, Long, Double, Long)].collect()
      .groupBy(_._1)
    assert(batch.keySet == Set(0L, 1L, 2L))
    for (qid <- Seq(0L, 1L, 2L)) {
      val single = VectorOps.bqTopK(corpus, "vec_id", "embedding",
        emb.filter($"vec_id" === qid).select("embedding"), "embedding",
        dim = 64, candidates = 50, k = 5)
        .as[(Long, Long, Double)].collect().toSeq
      val slice = batch(qid).sortBy(_._5).map(r => (r._2, r._3, r._4)).toSeq
      assert(slice == single, s"query $qid slice diverges")
    }
  }

  test("vec_ann_bq frontier: 20x-oversampled 1-bit rerank recovers the " +
      "exact top-10 on the bench corpus") {
    val emb = spark.read
      .parquet(s"${sfDir("0.001")}/embeddings.parquet")
    val corpus = emb.filter($"vec_id" =!= 0)
    val q = emb.filter($"vec_id" === 0).select("embedding")
    val bq = VectorOps.bqTopK(corpus, "vec_id", "embedding",
      q, "embedding", dim = 64, candidates = 200, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val exact = VectorOps.cosineTopK(corpus, "vec_id", "embedding",
      q, "embedding", k = 10).select("vec_id").as[Long].collect().toSet
    // measured 10/10 at sf0.001 (9/10 at sf0.1); leave drill headroom
    assert((bq intersect exact).size >= 8,
      s"BQ recall collapsed: ${(bq intersect exact).size}/10")
  }

  test("vec_matryoshka_eval: the 64-dim anchor is perfect, and the " +
      "16-dim pass matches a driver-side truncated-cosine recomputation") {
    val d = sfDir("0.001")
    val got = SparkEntry.queries("vec_matryoshka_eval")(spark, d)
      .as[(Int, Long, Long, Double, Double)].collect()
    assert(got.length == 9)
    got.filter(_._1 == 64).foreach { case (_, q, n, r, m) =>
      assert(n == 10L && r == 1.0 && m == 1.0, s"64-dim anchor query $q")
    }
    // driver-side 16-dim recomputation from raw vectors
    val emb = Tables.embeddings(spark, d)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dp = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dp / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val corpus = emb.filter(_._1 >= 3)
    val queries = emb.filter(_._1 < 3)
    val expected = queries.map { case (qid, qv) =>
      def topk(dims: Int) = corpus
        .map { case (id, v) => (id, cos(v.take(dims), qv.take(dims))) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
      val exact = topk(64).toSet
      val hits = topk(16).zipWithIndex.filter(p => exact(p._1))
      qid -> ((hits.length.toLong,
        if (hits.isEmpty) 0.0 else 1.0 / (hits.map(_._2).min + 1)))
    }.toMap
    got.filter(_._1 == 16).foreach { case (_, q, n, r, m) =>
      val (en, em) = expected(q)
      assert(n == en, s"query $q n_hits")
      assert(math.abs(r - en / 10.0) < 1e-6, s"query $q recall")
      assert(math.abs(m - em) < 1e-6, s"query $q mrr")
    }
  }

  test("vec_recall_eval matches an independent driver-side recomputation " +
      "from the two retrieval lists") {
    val d = sfDir("0.001")
    val emb = Tables.embeddings(spark, d)
    val corpus = emb.filter(col("vec_id") >= 3)
    val qs = emb.filter(col("vec_id") < 3).select("vec_id", "embedding")
    val exactSets = VectorOps.cosineTopKBatch(corpus, "vec_id",
        "embedding", qs, "vec_id", "embedding", k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val approx = VectorOps.bqTopKBatch(corpus, "vec_id", "embedding",
        qs, "vec_id", "embedding", dim = 64, candidates = 200, k = 10)
      .select("query_id", "vec_id", "rk").as[(Long, Long, Long)].collect()
    val expected = approx.groupBy(_._1).map { case (q, rows) =>
      val hits = rows.filter(r => exactSets(q)(r._2))
      val mrr = if (hits.isEmpty) 0.0 else 1.0 / hits.map(_._3).min
      q -> ((hits.length.toLong, hits.length / 10.0, mrr))
    }
    val got = SparkEntry.queries("vec_recall_eval")(spark, d)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
    assert(got.length == expected.size)
    got.foreach { case (q, nHits, recall, mrr) =>
      val (eh, er, em) = expected(q)
      assert(nHits == eh, s"query $q n_hits")
      assert(math.abs(recall - er) < 1e-6, s"query $q recall")
      assert(math.abs(mrr - em) < 1e-6, s"query $q mrr")
    }
  }
}

class KMeansLloydSpec extends SparkSpec {
  import sqlImplicits._

  test("kmeansLloyd converges on planted clusters; members partition") {
    // two tight planted clusters far apart + the 2 seeds inside them
    val rnd = new scala.util.Random(11)
    def around(base: Float) =
      Seq.fill(4)(base + rnd.nextFloat() * 0.01f - 0.005f)
    val rows = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, around(1f)) else (i, around(-1f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = graft.ops.VectorOps.kmeansLloyd(df, "vec_id", "embedding",
      k = 2, iters = 3).collect()
    assert(got.length == 2)
    // every vector assigned exactly once
    assert(got.map(_.getLong(1)).sum == 40L)
    // seed 0 (even, +1 cluster) captures the 20 even ids; seed 1 the odds
    val byId = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(0L) == 20L && byId(1L) == 20L)
    // centroid of the +1 cluster has positive sum, the -1 negative
    val sums = got.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(sums(0L) > 0L && sums(1L) < 0L)
  }

  test("kmeansLloyd carries empty clusters unchanged") {
    // 3 seeds but all mass near seed 0: seeds 1,2 lose all members in
    // round 1 and must keep their ORIGINAL coordinates
    val rows = Seq(
      (0L, Seq(1.0f, 1.0f)), (1L, Seq(0.9f, 0.9f)), (2L, Seq(0.95f, 1.0f)),
      (3L, Seq(1.05f, 1.0f)), (4L, Seq(1.0f, 0.95f)))
    val df = rows.toDF("vec_id", "embedding")
    val got = graft.ops.VectorOps.kmeansLloyd(df, "vec_id", "embedding",
      k = 3, iters = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // seeds 1 (0.9,0.9) and 2 (0.95,1.0): every vector is closer to the
    // evolving centroid near (1,1)-mass center than... rather: assert the
    // invariant that matters — all 5 vectors live somewhere and any
    // centroid with 0 members kept integer coords equal to its seed
    assert(got.values.map(_._1).sum == 5L)
    val seed1Norm2 = 9000L * 9000L * 2   // (0.9·1e4)² ×2 dims
    if (got(1L)._1 == 0L) assert(got(1L)._2 == seed1Norm2)
  }
}

class PcaPowerSpec extends SparkSpec {
  import sqlImplicits._

  test("pcaPowerTop ranks vectors by |component| along the planted " +
      "dominant direction") {
    // dominant variance along dim 0; dims 1-3 carry small noise
    val rnd = new scala.util.Random(5)
    val rows = (0L until 30L).map { i =>
      val main = (if (i % 2 == 0) 1f else -1f) * (0.05f + 0.01f * (i % 10))
      (i, Seq(main, rnd.nextFloat() * 0.01f, rnd.nextFloat() * 0.01f,
        rnd.nextFloat() * 0.01f))
    }
    val got = graft.ops.VectorOps.pcaPowerTop(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
      iters = 3, k = 5).collect()
    assert(got.length == 5)
    // the top-5 by |pc1_score| must be the 5 largest |dim0| loadings
    // (ids 8,9,18,19,28,29 carry 0.13/0.14 — top5 = subset of those)
    val expectTop = rows.sortBy(r => -math.abs(r._2.head)).take(5)
      .map(_._1).toSet
    assert(got.map(_.getLong(0)).forall(expectTop.contains))
    // scores of opposite-sign loadings have opposite signs
    val scores = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val posId = got.map(_.getLong(0)).find(_ % 2 == 0)
    val negId = got.map(_.getLong(0)).find(_ % 2 == 1)
    for (p <- posId; n <- negId)
      assert(scores(p).sign != scores(n).sign)
  }

  test("MIPS ranks by norm x angle where cosine ranks by angle alone") {
    // id 1: unit vector parallel to the query; id 2: a 2x-norm vector
    // 25 degrees off. Cosine prefers 1; raw inner product prefers 2
    // (2 * cos(25 deg) = 1.81 > 1) — the divergence MIPS exists for.
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(1.8126f, 0.8452f, 0.0f)), // 2 * (cos25, sin25)
      (3L, Seq(0.0f, 0.2f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = Seq((0L, Seq(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val mips = VectorOps.mipsTopKBatchExact(corpus, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 1).collect()
    assert(mips.head.getLong(1) == 2L)
    val cos = VectorOps.cosineTopKBatch(corpus, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 1).collect()
    assert(cos.head.getLong(1) == 1L)
  }

  test("augmented-LSH MIPS matches exact MIPS on a separated corpus") {
    val rnd = new scala.util.Random(3)
    // 40 random unit-ish vectors + 5 big-norm vectors near the query
    // direction: the planted big-norm items are the exact MIPS top-5
    // and the augmented index must retrieve all of them
    val qv = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val corpus = ((0 until 40).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat * 0.3f))) ++
      (0 until 5).map(i => (100L + i,
        qv.map(x => x * 2.0f + rnd.nextGaussian().toFloat * 0.02f))))
      .toDF("vec_id", "embedding")
    val q = Seq((0L, qv)).toDF("vec_id", "embedding")
    val ann = VectorOps.mipsTopKBatch(corpus, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, nBits = 8, dim = 16, probe = 2)
      .collect().map(_.getLong(1)).toSet
    val exact = VectorOps.mipsTopKBatchExact(corpus, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5)
      .collect().map(_.getLong(1)).toSet
    assert(exact == (100L until 105L).toSet)
    assert(ann == exact)
  }
}
