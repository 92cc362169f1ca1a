package graft

import org.apache.spark.sql.functions._
import graft.ops.VectorOps

/** Contract of the bounded-recall SemDeDup tier (`dedupe_embed_semdedup`):
  *
  *  - precision is STRUCTURAL (within-cell pairs are exact-cosine
  *    verified, so every emitted pair is in the exact relation);
  *  - the candidate volume is sub-quadratic (Σ n_c·(n_c−1)/2 well below
  *    the brute-force n·(n−1)/2 — this is the whole point of the tier);
  *  - recall against the exact pair relation is < 1 by design and must
  *    sit in the measured band pinned here (drift below the floor means
  *    the quantizer or the fixed-point recipe changed);
  *  - the cell assignment is deterministic (bit-identical re-runs), the
  *    property the DuckDB Lloyd-replay oracle rests on.
  *
  * k is DERIVED FROM CORPUS SIZE ([[VectorOps.semdedupK]]: target cell
  * population ≈250, floor 8) — the property that makes the tier
  * sub-quadratic IN n rather than a constant fraction of brute force,
  * asserted here directly as candidate GROWTH across a 10× corpus
  * blow-up (≪ the 100× pair growth). At the in-suite SFs (n=500,
  * 2000) the derived k is the floor 8, so the recall bands below are
  * unchanged from the fixed-k measurements.
  *
  * Measured recall (pair-level, threshold 0.45, k=8, iters=3), pinned
  * in the dedupe_embed_semdedup scaladoc and PLANS §27:
  * sf0.001 = sf0.01 (same 500-vector table) and sf0.1 are asserted
  * here; sf1 is measured by the isolated protocol and recorded in PLANS.
  */
class SemDedupSpec extends SparkSpec {

  private def measure(sfDir: String): (Double, Double) = {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val exact = VectorOps.pairwiseCosine(emb, "vec_id", "embedding",
      threshold = 0.45, blockCol = None)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cells = VectorOps.semdedupCells(emb, "vec_id", "embedding",
      k = VectorOps.semdedupK(emb.count()), iters = 3)
    val sem = VectorOps.pairwiseCosine(emb.join(cells, "vec_id"),
      "vec_id", "embedding", threshold = 0.45, blockCol = Some("cell"))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision structural: every within-cell verified pair IS exact
    assert(sem.subsetOf(exact),
      s"semdedup emitted a pair outside the exact relation at $sfDir")
    // sub-quadratic candidate volume: Σ n_c·(n_c−1)/2 vs n·(n−1)/2
    val n = emb.count()
    val cand = cells.groupBy("cell").count()
      .agg(sum(expr("count * (count - 1) / 2"))).collect()(0).getDouble(0)
    val frac = cand / (n.toDouble * (n - 1) / 2)
    val recall = sem.size.toDouble / exact.size
    info(f"$sfDir: n=$n exact=${exact.size} sem=${sem.size} " +
      f"recall=$recall%.3f candidate_frac=$frac%.3f")
    (recall, frac)
  }

  test("semdedup tier: structural precision, sub-quadratic candidates, " +
      "pinned recall band at sf0.001 and sf0.1") {
    val (r1, f1) = measure(sfDir("0.001"))
    val (r2, f2) = measure(sfDir("0.1"))
    // candidate volume must be far below brute force — balanced k=8
    // cells would give 1/8 = 0.125; allow skew up to 2× balanced
    assert(f1 < 0.25 && f2 < 0.25,
      s"candidate fraction not sub-quadratic: $f1 / $f2")
    // recall band: measured this session (sf0.001 = 2/7 = 0.286,
    // sf0.1 = 54/144 = 0.375 — see PLANS §27). Floors are set WELL
    // below the measured values because the driver can regenerate
    // /root/testdata between rounds (the r8→r9 lesson): the floor
    // exists to catch recipe regressions (broken blocking → recall 0),
    // not distributional drift; recall 1.0 would mean the blocking
    // stopped blocking (or the threshold moved).
    assert(r1 >= 0.05 && r1 < 1.0, s"sf0.001 recall out of band: $r1")
    assert(r2 >= 0.10 && r2 < 1.0, s"sf0.1 recall out of band: $r2")
  }

  test("derived k: floor 8 below 2000, then one cell per 250 vectors") {
    assert(VectorOps.semdedupK(1) == 8)
    assert(VectorOps.semdedupK(500) == 8)
    assert(VectorOps.semdedupK(2000) == 8)
    assert(VectorOps.semdedupK(2001) == 9)
    assert(VectorOps.semdedupK(8000) == 32)
    assert(VectorOps.semdedupK(20000) == 80)
  }

  test("candidate volume grows ~linearly in n, not quadratically: " +
      "10x corpus => well under 100x candidates") {
    // 10× corpus from sf0.1 by cyclic rotation (the same replica idea
    // the sf1 generator uses): replica r of vector v is v rolled r
    // positions — same norm, same within-replica pair structure,
    // genuinely different directions across replicas. No dependence on
    // any fixture constant: the assertion is purely structural.
    val base = Tables.embeddings(spark, sfDir("0.1"))
      .select("vec_id", "embedding")
    val n1 = base.count()
    val dim = base.select(size(col("embedding"))).head().getInt(0)
    val big = base.crossJoin(
        spark.range(10).toDF("r").withColumn("r", col("r").cast("int")))
      .select((col("vec_id") + col("r").cast("long") * n1).as("vec_id"),
        concat(
          slice(col("embedding"), col("r") + 1, lit(dim) - col("r")),
          slice(col("embedding"), lit(1), col("r"))).as("embedding"))
    val n2 = big.count()
    assert(n2 == 10 * n1)
    def candidates(emb: org.apache.spark.sql.DataFrame, n: Long): Double =
      VectorOps.semdedupCells(emb, "vec_id", "embedding",
          k = VectorOps.semdedupK(n), iters = 3)
        .groupBy("cell").count()
        .agg(sum(expr("count * (count - 1) / 2"))).head().getDouble(0)
    val c1 = candidates(base, n1)
    val c2 = candidates(big, n2)
    val growth = c2 / c1
    info(f"n=$n1 cand=$c1%.0f  n=$n2 cand=$c2%.0f  growth=$growth%.1fx " +
      f"(pair growth = ${(n2.toDouble * (n2 - 1)) / (n1.toDouble * (n1 - 1))}%.0fx)")
    // balanced cells would give exactly 10×; allow skew headroom but
    // stay far below the 100× a fixed k would produce
    assert(growth < 30.0,
      s"candidate growth $growth not sub-quadratic (fixed-k regression?)")
  }

  test("multi-probe (nAssign=2) pair relation is a STRICT superset of " +
      "single-probe: the nearest cell is among the top-2, so every " +
      "single-probe pair survives; measured recall lift is the bonus") {
    val emb = Tables.embeddings(spark, sfDir("0.1"))
      .select("vec_id", "embedding")
    val k = VectorOps.semdedupK(emb.count())
    def pairs(nAssign: Int): Set[(Long, Long)] = {
      val cells =
        if (nAssign == 1) VectorOps.semdedupCells(
          emb, "vec_id", "embedding", k, 3)
        else VectorOps.semdedupCellsN(
          emb, "vec_id", "embedding", k, 3, nAssign)
      VectorOps.pairwiseCosine(emb.join(cells, "vec_id"),
          "vec_id", "embedding", threshold = 0.45, blockCol = Some("cell"))
        .select("id1", "id2").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val single = pairs(1)
    val multi = pairs(2)
    assert(single.subsetOf(multi),
      s"multi-probe lost ${(single -- multi).size} single-probe pairs")
    info(s"single=${single.size} multi=${multi.size} " +
      s"(+${multi.size - single.size} recovered cross-cell pairs)")
  }

  test("TOTAL distance-eval growth is ~n^1.5, not quadratic: 10x corpus " +
      "=> well under 100x assignment work (the round-16 gap: candidates " +
      "were linear while Lloyd assignment was still n*k)") {
    val base = Tables.embeddings(spark, sfDir("0.1"))
      .select("vec_id", "embedding")
    val n1 = base.count()
    val dim = base.select(size(col("embedding"))).head().getInt(0)
    val big = base.crossJoin(
        spark.range(10).toDF("r").withColumn("r", col("r").cast("int")))
      .select((col("vec_id") + col("r").cast("long") * n1).as("vec_id"),
        concat(
          slice(col("embedding"), col("r") + 1, lit(dim) - col("r")),
          slice(col("embedding"), lit(1), col("r"))).as("embedding"))
    val n2 = big.count()
    val e1 = VectorOps.semdedupDistanceEvals(base, "vec_id", "embedding",
      VectorOps.semdedupK(n1), iters = 3)
    val e2 = VectorOps.semdedupDistanceEvals(big, "vec_id", "embedding",
      VectorOps.semdedupK(n2), iters = 3)
    val growth = e2.toDouble / e1
    info(f"n=$n1 evals=$e1  n=$n2 evals=$e2  growth=$growth%.1fx " +
      f"(n^1.5 growth = ${math.pow(10, 1.5)}%.1fx, n^2 = 100x)")
    // ideal n^1.5 is 31.6x for a 10x corpus; allow skew headroom (a
    // popular super-cell inflates the fine term) but stay far below
    // the 100x a one-level assignment would produce
    assert(growth < 45.0,
      s"distance-eval growth $growth not ~n^1.5 (one-level regression?)")
  }

  test("the assignment plan carries NO wide literal: the centroid model " +
      "arrives as a broadcast-joined relation, never an expression tree " +
      "(k-entry literals break planning once k scales with the corpus)") {
    val emb = Tables.embeddings(spark, sfDir("0.1"))
      .select("vec_id", "embedding")
    val probe = VectorOps.semdedupAssignProbe(emb, "vec_id", "embedding",
      k = VectorOps.semdedupK(emb.count()))
    val nodes = PlanAudit.collectNodes(probe.queryExecution.executedPlan)
    // d=64-long vectors appear only as DATA; nothing wider than one
    // vector's worth of leaves may be a literal
    PlanAudit.NoWideLiteral(maxLeaves = 256).violation(nodes).foreach(v =>
      fail(s"semdedup assignment probe: $v"))
    // and the probe really assigns (sanity that the gate gates the
    // real pipeline, not an empty frame)
    assert(probe.count() == emb.count())
  }

  test("cell assignment is deterministic across re-runs") {
    val emb = Tables.embeddings(spark, sfDir("0.001"))
      .select("vec_id", "embedding")
    val a = VectorOps.semdedupCells(emb, "vec_id", "embedding", 8, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = VectorOps.semdedupCells(emb, "vec_id", "embedding", 8, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }
}
