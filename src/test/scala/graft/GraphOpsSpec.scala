package graft

import org.apache.spark.sql.functions._
import graft.ops.GraphOps

class GraphOpsSpec extends SparkSpec {
  import sqlImplicits._

  test("coOccurrencePairs matches the self-join pair set on small baskets") {
    val items = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 40L),
      (3L, 50L) // singleton basket -> no pairs
    ).toDF("o", "p")
    val got = GraphOps.coOccurrencePairs(items, "o", "p")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((10L, 20L), (10L, 30L), (10L, 40L), (20L, 30L)))
  }

  test("coOccurrencePairs dedupes duplicate (basket, item) rows inside " +
      "its own aggregation (r17 opt: callers no longer pre-distinct)") {
    // same baskets as above but with every row duplicated and one row
    // tripled — the pair MULTISET must equal the distinct input's
    val items = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 40L),
      (3L, 50L)).toDF("o", "p")
    val dups = items.union(items).union(items.limit(1))
    val got = GraphOps.coOccurrencePairs(dups, "o", "p")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((10L, 20L), (10L, 30L), (10L, 40L), (20L, 30L)))
    // requireExact counts DISTINCT items per basket, so duplicates do
    // not trip the cap guard
    assert(GraphOps.coOccurrencePairs(dups, "o", "p", cap = 3,
      requireExact = true).count() == 4)
  }

  test("modularity: planted two-clique graph scores the closed form; " +
      "the all-one-community and singleton partitions score their nulls") {
    // two 5-cliques bridged by one edge: m=21, within(by-clique)=20,
    // per-clique degree sums 21 each -> Q = (4·21·20 − 2·21²)/(4·21²)
    //   = 798/1764 = 0.452381 (exact at round6)
    def clique(ids: Seq[Long]) =
      for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = (clique(1L to 5L) ++ clique(6L to 10L) ++ Seq((5L, 6L)))
      .toDF("u", "v")
    val byClique = (1L to 10L).map(i => (i, if (i <= 5) 1L else 2L))
      .toDF("id", "label")
    val got = GraphOps.modularity(edges, "u", "v", byClique, "id", "label")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((2L, 21L, 20L, 0.452381)))
    // one community holding everything: Q = m/m − (2m/2m)² = 0 exactly
    val allOne = (1L to 10L).map(i => (i, 0L)).toDF("id", "label")
    val gotOne = GraphOps.modularity(edges, "u", "v", allOne, "id", "label")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(gotOne == Seq((1L, 21L, 21L, 0.0)))
    // singletons: we=0, Q = −Σdeg²/(4m²) < 0 — the degenerate floor
    val single = (1L to 10L).map(i => (i, i)).toDF("id", "label")
    val gotS = GraphOps.modularity(edges, "u", "v", single, "id", "label")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(gotS.head._1 == 10L && gotS.head._3 == 0L
      && gotS.head._4 < 0.0)
    // r17 opt: a precomputed degree table yields the identical report
    // (the share-one-aggregation path graph_modularity uses)
    val deg = edges.select(col("u"))
      .union(edges.select(col("v").as("u")))
      .groupBy("u").agg(count(lit(1)).as("dg"))
    val gotPre = GraphOps.modularity(edges, "u", "v", byClique,
        "id", "label", degrees = Some(deg))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(gotPre == got)
  }

  test("kcorePeel: pendant chains peel away, the dense core survives " +
      "with within-core degrees") {
    // K4 (1-4 complete) + pendant path 4-5-6: the 3-core is exactly K4
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("u", "v")
    val got = GraphOps.kcorePeel(edges, "u", "v", k = 3, rounds = 4)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    // k=2: the path dies (5 and 6 peel in successive rounds), K4 stays
    val got2 = GraphOps.kcorePeel(edges, "u", "v", k = 2, rounds = 4)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got2 == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    // k larger than any degree: empty, not an error
    assert(GraphOps.kcorePeel(edges, "u", "v", k = 9, rounds = 2)
      .count() == 0)
  }

  test("graph_kcore entry: 5 rounds is the fixpoint on the bench graph " +
      "(round 6 changes nothing)") {
    val items = Tables.lineitem(spark, sfDir("0.001"))
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val g = GraphOps.coOccurrencePairs(items, "o", "p")
      .groupBy("u", "v").agg(count(lit(1)).as("s"))
      .filter(col("s") >= 2).select("u", "v").localCheckpoint()
    val r5 = GraphOps.kcorePeel(g, "u", "v", k = 3, rounds = 5)
      .as[(Long, Long)].collect().toSet
    val r6 = GraphOps.kcorePeel(g, "u", "v", k = 3, rounds = 6)
      .as[(Long, Long)].collect().toSet
    assert(r5 == r6, "peel not converged at the entry's round count")
    assert(r5.nonEmpty, "3-core unexpectedly empty — entry is vacuous")
  }

  test("bfsLayers: closed-form path graph — hop distances settle within " +
      "rounds, unreached vertices absent, multi-source takes the min") {
    // path 1-2-3-4-5-6-7
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L)).toDF("u", "v")
    val got = GraphOps.bfsLayers(edges, "u", "v",
        Seq(1L).toDF("id"), "id", rounds = 4)
      .as[(Long, Long)].collect().sorted.toSeq
    // 4 rounds reach exactly hops <= 4; 6 and 7 are absent, not infinite
    assert(got == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L)))
    // multi-source: distance to the NEAREST seed
    val got2 = GraphOps.bfsLayers(edges, "u", "v",
        Seq(1L, 7L).toDF("id"), "id", rounds = 4)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got2 == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 2L),
      (6L, 1L), (7L, 0L)))
  }

  test("graph_bfs_layers entry: 4 rounds is the fixpoint on the bench " +
      "graph (round 5 changes nothing)") {
    val items = Tables.lineitem(spark, sfDir("0.001"))
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val g = GraphOps.coOccurrencePairs(items, "o", "p")
      .groupBy("u", "v").agg(count(lit(1)).as("s"))
      .filter(col("s") >= 2).select("u", "v").localCheckpoint()
    val seeds = g.select(col("u").as("id"))
      .union(g.select(col("v").as("id")))
      .distinct().orderBy("id").limit(3).localCheckpoint()
    val r4 = GraphOps.bfsLayers(g, "u", "v", seeds, "id", rounds = 4)
      .as[(Long, Long)].collect().toSet
    val r5 = GraphOps.bfsLayers(g, "u", "v", seeds, "id", rounds = 5)
      .as[(Long, Long)].collect().toSet
    assert(r4 == r5, "BFS not converged at the entry's round count")
    assert(r4.size > 3, "BFS reached nothing beyond the seeds — vacuous")
  }

  test("hub basket: expansion is capped, not quadratic, and the plan is " +
      "explode-based with no per-basket self-join") {
    // one pathological 5000-item hub basket + a normal 3-item basket
    val hub = (0 until 5000).map(i => (99L, i.toLong))
    val normal = Seq((1L, 1L), (1L, 2L), (1L, 3L))
    val items = (hub ++ normal).toDF("o", "p")
    val pairs = GraphOps.coOccurrencePairs(items, "o", "p", cap = 64)
    // hub contributes C(64,2)=2016 pairs (its 64 smallest ids), never
    // C(5000,2)=12.5M; the normal basket is exact (C(3,2)=3)
    assert(pairs.count() == 2016 + 3)
    // capped hub keeps its 64 SMALLEST item ids: every hub pair has v<=63
    val hubPairs = pairs.except(
      Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("u", "v"))
    assert(hubPairs.filter(col("v") > 63).count() == 0)
    // exactness below the cap: the normal basket's pairs survive intact
    assert(pairs.as[(Long, Long)].collect().toSet
      .intersect(Set((1L, 2L), (1L, 3L), (2L, 3L))).size == 3)
    // plan evidence: pairs come from Generate (explode) over a hash-agg
    // basket table — no join anywhere in the builder
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), s"expected explode in:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }

  test("requireExact: passes under the cap, raises loudly beyond it") {
    val small = Seq((1L, 1L), (1L, 2L), (1L, 3L)).toDF("o", "p")
    // under the cap: identical pair set, guard silent
    assert(GraphOps.coOccurrencePairs(small, "o", "p", cap = 8,
      requireExact = true).count() == 3)
    // beyond the cap: the entry fails instead of silently diverging
    // from an uncapped oracle
    val big = (0 until 10).map(i => (1L, i.toLong)).toDF("o", "p")
    val e = intercept[Exception] {
      GraphOps.coOccurrencePairs(big, "o", "p", cap = 4,
        requireExact = true).count()
    }
    assert(e.getMessage != null)
  }

  test("cap keeps the smallest item ids deterministically") {
    val items = (0 until 100).reverse.map(i => (7L, i.toLong)).toDF("o", "p")
    val pairs = GraphOps.coOccurrencePairs(items, "o", "p", cap = 5)
    val got = pairs.as[(Long, Long)].collect().toSet
    val want = (for {
      u <- 0 until 5; v <- (u + 1) until 5
    } yield (u.toLong, v.toLong)).toSet
    assert(got == want)
  }

  test("pagerankFixedPoint: symmetry, mass conservation, and star-center " +
      "dominance on hand graphs") {
    // path a-b-c: ends are symmetric, middle dominates
    val path = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val r = GraphOps.pagerankFixedPoint(path, "u", "v", iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(r(1L) == r(3L), "symmetric endpoints must tie exactly")
    assert(r(2L) > r(1L), "path middle must outrank the ends")
    // floor losses only: total mass within 1e-6 relative of 1.0
    val total = r.values.sum
    assert(math.abs(total - 1000000000000L) < 1000000L,
      s"mass drifted: $total")
    // star: center collects 0.85 of the leaves' mass
    val star = (2L to 6L).map(l => (1L, l)).toDF("u", "v")
    val rs = GraphOps.pagerankFixedPoint(star, "u", "v", iters = 5)
      .as[(Long, Long)].collect().toMap
    assert((2L to 6L).map(rs).toSet.size == 1, "leaves must tie exactly")
    assert(rs(1L) > 3 * rs(2L), "star center must dominate")
  }

  test("pagerankFixedPoint is bit-identical across runs") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val a = GraphOps.pagerankFixedPoint(g, "u", "v")
      .as[(Long, Long)].collect().toMap
    val b = GraphOps.pagerankFixedPoint(g, "u", "v")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  // K5 on {0..4} oriented by vertex id: C(5,3)=10 triangles; plus an
  // isolated oriented edge (100,101) contributing none
  private def orientedK5 = {
    val k5 = for { u <- 0L until 5L; v <- (u + 1) until 5L } yield (u, v)
    (k5 :+ (100L, 101L)).toDF("src", "dst")
  }

  test("edgeIteratorTriangles counts K5 and returns 0 on empty edges") {
    assert(GraphOps.edgeIteratorTriangles(orientedK5)
      .as[Long].head() == 10L)
    assert(GraphOps.edgeIteratorTriangles(
      Seq.empty[(Long, Long)].toDF("src", "dst")).as[Long].head() == 0L)
  }

  test("broadcast fallback: no-hint plan is shuffle joins on src/dst " +
      "with no wedge materialization") {
    // force the optimizer's hand: without the threshold override the
    // tiny test adjacency would auto-broadcast and the spec would pin
    // nothing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val noHint = GraphOps.edgeIteratorTriangles(orientedK5,
        broadcastAdj = false)
      val plan = noHint.queryExecution.executedPlan.toString
      // both probe joins run as shuffle joins (sort-merge or shuffled
      // hash) keyed on src/dst — the edge-linear fallback shape
      val shuffleJoins = "(SortMergeJoin|ShuffledHashJoin)".r
        .findAllIn(plan).size
      assert(shuffleJoins == 2,
        s"expected 2 shuffle joins, got $shuffleJoins in:\n$plan")
      assert(!plan.contains("BroadcastHashJoin") &&
        !plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"broadcast/cartesian leaked into the fallback plan:\n$plan")
      // no wedge materialization: the probe stays an array_intersect
      // over adjacency lists — nothing explodes per-wedge rows
      assert(!plan.contains("Generate"),
        s"unexpected explode (wedge stream?) in:\n$plan")
      assert(plan.contains("array_intersect"),
        s"probe lost the array_intersect form:\n$plan")
      // same answer as the broadcast shape
      assert(noHint.as[Long].head() == 10L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("graph_avg_nbr_degree: star graph gives knn(1)=hub degree, knn(hub)=1") {
    // three 2-item baskets all containing part 1 → star: 1—2, 1—3, 1—4
    val dir = java.nio.file.Files.createTempDirectory("knn").toString
    Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.queries.GraphQueries.queries("graph_avg_nbr_degree")(
        spark, dir)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // leaves (deg 1): only neighbor is the hub (deg 3) → knn = 3
    // hub (deg 3): all neighbors are leaves (deg 1) → knn = 1
    assert(got(1L) == ((1L, 3L, 3.0)), got(1L).toString)
    assert(got(3L) == ((3L, 1L, 1.0)), got(3L).toString)
  }

  test("labelPropagation: two bridged triangles settle into two " +
      "communities (finer than components)") {
    // triangles {1,2,3} and {4,5,6} joined by bridge 3—4: one connected
    // component, but 3 deterministic LPA rounds (hand-replayed: ties to
    // the smallest label) split it at the bridge
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("u", "v")
    val got = GraphOps.labelPropagation(edges, "u", "v", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), got.toString)
  }

  test("labelPropagation: a clique collapses to its smallest id") {
    val edges = (for (i <- 1 to 4; j <- (i + 1) to 4)
      yield (i.toLong, j.toLong)).toDF("u", "v")
    val got = GraphOps.labelPropagation(edges, "u", "v", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L), got.toString)
  }
}
