package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.GraphOps

/** Graph analytics over a co-occurrence graph derived from the fact
  * table — the relational face of the entity-graph work a training-data
  * pipeline does (co-purchase affinity, link-graph shape metrics).
  *
  * The graph: vertices = parts, undirected edge (u, v) iff u and v ever
  * appear in the same order (the classic market-basket projection of the
  * order→part bipartite relation, reference analogue: the groupby
  * surfaces of `datapump.py:287-327` have no graph tier — this extends
  * the engine the way SURVEY §2.9 extends dedupe).
  */
object GraphQueries extends QueryPack {

  def queries: Map[String, Q] = Map(
    // triangle count + degree-sum wedge count — the two shape metrics
    // every link-graph health report starts with. The scale design is
    // the point: edges are DEGREE-ORIENTED (low (deg,id) → high) before
    // the wedge self-join, so each vertex's out-degree is bounded by
    // O(√m) on any graph (arboricity argument) and the wedge
    // intermediate is O(m^1.5) WORST-case instead of Σdeg² — the
    // difference between a plan that survives a power-law web graph and
    // one that dies on its hottest hub. The oracle counts the same
    // orientation-INVARIANT quantities via the simple id-ordered 3-way
    // join (fine in a single-node engine, ruinous on a hub at scale).
    //   - n_paths2 (wedges, Σ deg·(deg−1)/2) comes off the degree table
    //     map-side — no join.
    //   - each triangle {a≺b≺c} is counted exactly once: only its
    //     ≺-minimal vertex has two out-edges into it.
    "graph_triangle_count" -> ((s, d) => {
      // raw (o, p) — coOccurrencePairs dedupes inside its own basket
      // aggregation (collect_set), so the old pre-distinct() exchange
      // is gone (r17 opt round, guide §2.4)
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      // hub-capped pair builder (GraphOps.coOccurrencePairs): bounded
      // per-task expansion instead of the quadratic per-order self-join.
      // The edge set feeds FOUR consumers (deg, orientation join, n_edges,
      // the closing wedge∩edge join) — materialize it once instead of
      // re-running the pair expansion per consumer (same idiom as
      // pagerankFixedPoint; on a cluster this is executor-local storage,
      // not a driver collect).
      val edges = GraphOps.coOccurrencePairs(items, "o", "p")
        .distinct().localCheckpoint()
      val deg = edges.select(col("u").as("x"))
        .union(edges.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("deg"))
        .localCheckpoint() // ku + kv + n_paths2: 3 consumers, agg once
      // total-order orientation key: (deg, id) packed into one long —
      // ids are key-space ints (< 2^32), deg < 2^31, no collision
      val ku = deg.select(col("x").as("u"),
        (col("deg") * lit(1L << 32) + col("u")).as("ku"))
      val kv = deg.select(col("x").as("v"),
        (col("deg") * lit(1L << 32) + col("v")).as("kv"))
      val oriented = edges.join(ku, "u").join(kv, "v").select(
        when(col("ku") < col("kv"), col("u")).otherwise(col("v"))
          .as("src"),
        when(col("ku") < col("kv"), col("v")).otherwise(col("u"))
          .as("dst"))
        .localCheckpoint() // read by the adjacency build AND the probe scan
      val nV = items.select("p").distinct()
        .agg(count(lit(1)).as("n_vertices"))
      val nE = edges.agg(count(lit(1)).as("n_edges"))
      // Σ deg(deg−1) is even; halve AFTER the exact integer sum (a
      // per-row `/2` would be double division in Spark)
      val nP = deg.agg(sum(col("deg") * (col("deg") - 1)).as("s"))
        .select((col("s") / 2).cast("long").as("n_paths2"))
      // EDGE-ITERATOR triangle probe (GraphOps.edgeIteratorTriangles):
      // never materializes the wedge stream — at sf0.1 that stream was
      // 41M rows and its generation+shuffle was the hottest stage of
      // the whole query; the probe is one map-side array-intersect scan
      // over the m edges against the adjacency table. The
      // broadcast-vs-shuffle choice is made EXPLICITLY from m (a
      // count over the already-checkpointed edge blocks — no extra
      // scan): the adjacency is exactly m entries, so m is the
      // broadcast size signal, and AQE's generic 10MB threshold gets
      // this wrong in both directions (measured at sf1/12M edges:
      // no-hint plans shuffle joins at 19-25 s vs 3-6 s broadcast).
      // Past the bound — adjacency beyond comfortable driver/executor
      // memory — the same plan runs as shuffle joins keyed on src/dst
      // with edge-linear rows in flight (shape pinned by GraphOpsSpec).
      val m = edges.count()
      // shuffle width scales with m (GraphOps.trianglePartitions): the
      // probe join's per-task payload carries both endpoints' adjacency
      // arrays, so a fixed session width turns a 10x edge set into 10x
      // heavier tasks (the r17 sf10 OOM); None below the bound keeps
      // small-SF plans byte-identical
      val nT = GraphOps.edgeIteratorTriangles(oriented,
        broadcastAdj = m <= 50000000L,
        parts = GraphOps.trianglePartitions(s, m))
      nV.crossJoin(nE).crossJoin(nP).crossJoin(nT)
    }),

    // local clustering coefficient per node — the "how cliquish is each
    // neighborhood" metric (community-structure health, spam-node
    // screening). Per-node triangle counts come from the edge-iterator
    // probe with per-corner attribution (GraphOps.perNodeTriangles):
    // the contribution stream is 2m + 3T rows — triangle-LINEAR, the
    // output lower bound — and the wedge stream never exists. Same
    // explicit m-based broadcast-vs-shuffle adjacency choice as the
    // triangle count. lcc = 2t/(deg·(deg−1)) is one per-row double
    // division of exact integers (deterministic IEEE in both engines)
    // under round6; deg<2 nodes define lcc=0. Output is |V| rows.
    "graph_clustering_coeff" -> ((s, d) => {
      // raw (o, p) — coOccurrencePairs dedupes inside its own basket
      // aggregation (collect_set), so the old pre-distinct() exchange
      // is gone (r17 opt round, guide §2.4)
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val edges = GraphOps.coOccurrencePairs(items, "o", "p")
        .distinct().localCheckpoint()
      val deg = edges.select(col("u").as("x"))
        .union(edges.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("deg"))
        .localCheckpoint() // ku + kv + the lcc join: 3 consumers
      val ku = deg.select(col("x").as("u"),
        (col("deg") * lit(1L << 32) + col("u")).as("ku"))
      val kv = deg.select(col("x").as("v"),
        (col("deg") * lit(1L << 32) + col("v")).as("kv"))
      val oriented = edges.join(ku, "u").join(kv, "v").select(
        when(col("ku") < col("kv"), col("u")).otherwise(col("v"))
          .as("src"),
        when(col("ku") < col("kv"), col("v")).otherwise(col("u"))
          .as("dst"))
        .localCheckpoint()
      val m = edges.count()
      // same data-scaled width as graph_triangle_count (r17 sf10 fix)
      val tri = GraphOps.perNodeTriangles(oriented,
        broadcastAdj = m <= 50000000L,
        parts = GraphOps.trianglePartitions(s, m))
      deg.join(tri, Seq("x"), "left")
        .na.fill(0L, Seq("n_tri"))
        .select(col("x"), col("deg").cast("long").as("deg"),
          col("n_tri"),
          when(col("deg") >= 2, graft.StableRound.round6(
            (col("n_tri") * 2).cast("double")
              / (col("deg") * (col("deg") - 1)).cast("double")))
            .otherwise(lit(0.0)).as("lcc"))
    }),

    // degree assortativity — the hub-mixing coefficient (do high-degree
    // nodes attach to each other, like social graphs, or to leaves,
    // like the web?): Pearson over the symmetrized endpoint-degree
    // pairs. Symmetry collapses the moments (Sy=Sx, Syy=Sxx), so FOUR
    // exact DECIMAL(38,0) sums over the m edges suffice — one edge-list
    // scan joined twice against the tiny degree table, one mirrored
    // double assembly. No wedge, no pair explosion: O(m) at any scale.
    "graph_assortativity" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val dec = DecimalType(38, 0)
      // raw (o, p) — coOccurrencePairs dedupes inside its own basket
      // aggregation (collect_set), so the old pre-distinct() exchange
      // is gone (r17 opt round, guide §2.4)
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val edges = GraphOps.coOccurrencePairs(items, "o", "p")
        .distinct().localCheckpoint()
      val deg = edges.select(col("u").as("x"))
        .union(edges.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("deg"))
        .localCheckpoint() // du + dv: 2 consumers, agg once
      val du = deg.select(col("x").as("u"), col("deg").as("du"))
      val dv = deg.select(col("x").as("v"), col("deg").as("dv"))
      def D(c: org.apache.spark.sql.Column) = c.cast("double")
      edges.join(du, "u").join(dv, "v")
        .agg(count(lit(1)).cast(dec).as("m"),
          sum((col("du") + col("dv")).cast(dec)).as("sx"),
          sum(col("du").cast(dec) * col("du")
            + col("dv").cast(dec) * col("dv")).as("sxx"),
          sum(col("du").cast(dec) * col("dv") * 2).as("sxy"))
        .select(col("m").cast("long").as("n_edges"),
          graft.StableRound.round6(
            (D(col("m")) * 2 * D(col("sxy")) - D(col("sx")) * D(col("sx")))
              / (D(col("m")) * 2 * D(col("sxx"))
                 - D(col("sx")) * D(col("sx")))).as("assortativity"))
    }),

    // common-neighbors link prediction over the REPEAT-co-purchase graph
    // (edge support ≥ 2 — single co-occurrence is noise at basket scale,
    // and the support filter is also the scale lever: it collapses the
    // hub degrees that make naive wedge joins explode; the sym-join here
    // runs on a graph whose Σdeg² is ~10⁴, not ~10⁸). Scores every
    // non-adjacent pair by |common neighbors|, top-20 deterministic via
    // the (score, u, v) total order. The symmetrized join is the honest
    // semantics — common-neighbor counting needs ALL middles, so unlike
    // the triangle entry there is no orientation trick; support-filter
    // (or hub-cap) first is how this survives a power-law graph.
    "graph_common_neighbors" -> ((s, d) => {
      // raw (o, p) — coOccurrencePairs dedupes inside its own basket
      // aggregation (collect_set), so the old pre-distinct() exchange
      // is gone (r17 opt round, guide §2.4)
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      // materialized: g feeds the left-anti join AND both symmetrized
      // halves (4 consumers of the pair expansion otherwise)
      val g = GraphOps.coOccurrencePairs(items, "o", "p")
        .groupBy("u", "v")
        .agg(count(lit(1)).as("s"))
        .filter(col("s") >= 2)
        .select("u", "v")
        .localCheckpoint()
      val sym = g.select(col("u").as("x"), col("v").as("y"))
        .union(g.select(col("v").as("x"), col("u").as("y")))
        .localCheckpoint() // self-joined below: two reads
      val cand = sym.as("a")
        .join(sym.as("b"),
          col("a.x") === col("b.x") && col("a.y") < col("b.y"))
        .groupBy(col("a.y").as("u"), col("b.y").as("v"))
        .agg(count(lit(1)).as("n_common"))
      cand.join(g, Seq("u", "v"), "left_anti")
        .orderBy(col("n_common").desc, col("u"), col("v"))
        .limit(20)
    }),

    // LINK PREDICTION scoring: neighborhood Jaccard |N(u)∩N(v)| /
    // |N(u)∪N(v)| for non-adjacent candidate pairs — common-neighbors'
    // normalized twin (raw counts favor hubs; Jaccard corrects by
    // degree). Same wedge-join candidate gen (degree-orientation bounds
    // it), then two broadcast-size degree joins; the score is one exact
    // int division (identical correctly-rounded double on both engines)
    // under round6, and the top-20 cut is total-ordered by
    // (jaccard, u, v).
    "graph_jaccard_neighbors" -> ((s, d) => {
      // raw (o, p) — coOccurrencePairs dedupes inside its own basket
      // aggregation (collect_set), so the old pre-distinct() exchange
      // is gone (r17 opt round, guide §2.4)
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      // materialized like graph_common_neighbors: g has 3 consumers,
      // sym has 3 (self-join twice + degree table)
      val g = GraphOps.coOccurrencePairs(items, "o", "p")
        .groupBy("u", "v")
        .agg(count(lit(1)).as("s"))
        .filter(col("s") >= 2)
        .select("u", "v")
        .localCheckpoint()
      val sym = g.select(col("u").as("x"), col("v").as("y"))
        .union(g.select(col("v").as("x"), col("u").as("y")))
        .localCheckpoint()
      val deg = sym.groupBy(col("x")).agg(count(lit(1)).as("deg"))
      sym.as("a")
        .join(sym.as("b"),
          col("a.x") === col("b.x") && col("a.y") < col("b.y"))
        .groupBy(col("a.y").as("u"), col("b.y").as("v"))
        .agg(count(lit(1)).as("n_common"))
        .join(g, Seq("u", "v"), "left_anti")
        .join(deg.select(col("x").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("x").as("v"), col("deg").as("dv")), "v")
        .withColumn("jaccard", graft.StableRound.round6(
          col("n_common").cast("double")
            / (col("du") + col("dv") - col("n_common")).cast("double")))
        .orderBy(col("jaccard").desc, col("u"), col("v"))
        .limit(20)
        .select("u", "v", "n_common", "du", "dv", "jaccard")
    }),

    // degree distribution of the same graph — the power-law fingerprint
    // (how hub-heavy is this corpus?). Two exact aggs riding one
    // exchange class; output is #distinct-degrees rows, tiny at any SF.
    "graph_degree_dist" -> ((s, d) => {
      // raw (o, p) — coOccurrencePairs dedupes inside its own basket
      // aggregation (collect_set), so the old pre-distinct() exchange
      // is gone (r17 opt round, guide §2.4)
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val edges = GraphOps.coOccurrencePairs(items, "o", "p")
        .distinct().localCheckpoint() // read twice by the degree union
      edges.select(col("u").as("x")).union(edges.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("deg"))
        .groupBy("deg").agg(count(lit(1)).as("n_vertices"))
    }),

    // AVERAGE NEIGHBOR DEGREE by degree class — the assortativity
    // PROFILE knn(k) (graph_assortativity reduces this curve to one
    // scalar; the curve shows WHERE mixing breaks: a dip at high k =
    // hubs surrounded by leaves, the spam/botnet shape). Edge-linear:
    // the 2m-row incidence list joins the degree table on the neighbor
    // key (co-partitioned hash join), the per-node collapse is one
    // map-side-combined agg, and the only float — each node's mean
    // neighbor degree, an exact-integer ratio — snaps to round6
    // fixed-point longs before the final per-degree-class average, so
    // the cross-node sum is an integer sum.
    "graph_avg_nbr_degree" -> ((s, d) => {
      // raw (o, p) — coOccurrencePairs dedupes inside its own basket
      // aggregation (collect_set), so the old pre-distinct() exchange
      // is gone (r17 opt round, guide §2.4)
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      // requireExact: this entry's oracle enumerates UNCAPPED a.p < b.p
      // pairs — fail loudly if a basket ever outgrows the cap instead
      // of silently diverging (ADVICE r12)
      val edges = GraphOps.coOccurrencePairs(items, "o", "p",
          requireExact = true)
        .distinct().localCheckpoint() // degree union + incidence list
      val deg = edges.select(col("u").as("x"))
        .union(edges.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("deg"))
      val inc = edges.select(col("u").as("x"), col("v").as("y"))
        .union(edges.select(col("v").as("x"), col("u").as("y")))
      val perNode = inc
        .join(deg.select(col("x").as("y"), col("deg").as("dy")), "y")
        .groupBy("x")
        .agg(count(lit(1)).as("dx"), sum("dy").as("sy"))
        .select(col("dx"),
          floor(graft.StableRound.round6(
            col("sy").cast("double") / col("dx").cast("double"))
            * 1e6 + 0.5).cast("long").as("m6"))
      perNode.groupBy(col("dx").as("deg"))
        .agg(count(lit(1)).as("n_nodes"),
          graft.StableRound.round6(sum(col("m6")).cast("double") / 1e6
            / count(lit(1)).cast("double")).as("knn"))
    }),

    // PageRank over the repeat-co-purchase graph — centrality the
    // degree table can't see (a vertex is important if its NEIGHBORS
    // are). Bit-deterministic fixed-point iteration (int64 ranks scaled
    // 1e12, floor-div damping — see GraphOps.pagerankFixedPoint); the
    // oracle unrolls the same 5 rounds as integer CTE stages. Top-20 by
    // the (rank, id) total order, so the LIMIT cut is unambiguous.
    "graph_pagerank" -> ((s, d) => {
      // raw (o, p) — coOccurrencePairs dedupes inside its own basket
      // aggregation (collect_set), so the old pre-distinct() exchange
      // is gone (r17 opt round, guide §2.4)
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val g = GraphOps.coOccurrencePairs(items, "o", "p")
        .groupBy("u", "v").agg(count(lit(1)).as("s"))
        .filter(col("s") >= 2).select("u", "v")
        .localCheckpoint() // symmetrization inside pagerank reads it twice
      GraphOps.pagerankFixedPoint(g, "u", "v", iters = 5)
        .orderBy(col("rank_fp").desc, col("id"))
        .limit(20)
        .select(col("id").as("part_id"), col("rank_fp"))
    }),

    // connected components of the same graph, labelled by min part id —
    // the market-segmentation face of the dedupe-cluster closure. Uses
    // the O(log n) large-star/small-star rounds (no diameter
    // assumption — a co-purchase chain can be arbitrarily long);
    // oracle = the recursive-CTE closure, engine-independent because
    // the component labelling (min id) is canonical.
    "graph_components" -> ((s, d) => {
      // raw (o, p) — coOccurrencePairs dedupes inside its own basket
      // aggregation (collect_set), so the old pre-distinct() exchange
      // is gone (r17 opt round, guide §2.4)
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val g = GraphOps.coOccurrencePairs(items, "o", "p")
        .groupBy("u", "v").agg(count(lit(1)).as("s"))
        .filter(col("s") >= 2).select("u", "v")
        .localCheckpoint() // vertex union + CC input: 3 reads
      val verts = g.select(col("u").as("id"))
        .union(g.select(col("v").as("id"))).distinct()
      graft.ops.Clusters.connectedComponentsStar(verts,
          g.select(col("u").as("src"), col("v").as("dst")))
        .select(col("id").as("part_id"), col("label").as("component_id"),
          (col("id") === col("label")).as("is_rep"))
    }),

    // k-core decomposition (k=3, 5 synchronous peel rounds) of the same
    // co-purchase graph — the densest-substructure screen degree alone
    // can't see (a hub with 100 degree-1 neighbors has no 3-core). The
    // entry is DEFINED as the 5-round peel so the oracle replays the
    // trajectory exactly (the pagerank/LPA fixed-round discipline);
    // GraphOpsSpec pins that 5 rounds IS the fixpoint on this graph
    // (round 6 changes nothing) plus the closed-form triangle+tail law.
    "graph_kcore" -> ((s, d) => {
      // raw (o, p) — coOccurrencePairs dedupes inside its own basket
      // aggregation (collect_set), so the old pre-distinct() exchange
      // is gone (r17 opt round, guide §2.4)
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val g = GraphOps.coOccurrencePairs(items, "o", "p")
        .groupBy("u", "v").agg(count(lit(1)).as("s"))
        .filter(col("s") >= 2).select("u", "v")
      GraphOps.kcorePeel(g, "u", "v", k = 3, rounds = 5)
    }),

    // multi-source BFS layers (4 rounds) from the 3 smallest part ids of
    // the co-purchase graph: hop distance to the nearest seed — the
    // "blast radius" primitive (recall expansion from a seed set,
    // contamination spread, recommendation distance). Defined as the
    // 4-round relaxation so the oracle replays the trajectory as chained
    // CTEs (the pagerank/kcore discipline); GraphOpsSpec pins a
    // closed-form path graph and that round 5 changes nothing here.
    "graph_bfs_layers" -> ((s, d) => {
      // raw (o, p) — coOccurrencePairs dedupes inside its own basket
      // aggregation (collect_set), so the old pre-distinct() exchange
      // is gone (r17 opt round, guide §2.4)
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val g = GraphOps.coOccurrencePairs(items, "o", "p")
        .groupBy("u", "v").agg(count(lit(1)).as("s"))
        .filter(col("s") >= 2).select("u", "v")
        .localCheckpoint() // seed derivation + symmetrization both read it
      val seeds = g.select(col("u").as("id"))
        .union(g.select(col("v").as("id")))
        .distinct().orderBy("id").limit(3)
      GraphOps.bfsLayers(g, "u", "v", seeds, "id", rounds = 4)
        .select(col("id").as("part_id"), col("dist"))
    }),

    // community detection by deterministic synchronous label propagation
    // (3 rounds, ties to the smallest label — the determinism is what
    // lets DuckDB replay the trajectory): finer than components (LPA
    // splits a connected blob into dense cores), the grouping a corpus
    // pipeline uses to stratify near-duplicate families or co-purchase
    // modules. Community size joined back on the final labels.
    "graph_label_propagation" -> ((s, d) => {
      // raw (o, p) — coOccurrencePairs dedupes inside its own basket
      // aggregation (collect_set), so the old pre-distinct() exchange
      // is gone (r17 opt round, guide §2.4)
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      // requireExact: the oracle enumerates UNCAPPED a.p < b.p pairs —
      // fail loudly if a basket outgrows the cap (the triangle-count
      // discipline, ADVICE r12)
      val g = GraphOps.coOccurrencePairs(items, "o", "p",
          requireExact = true)
        .groupBy("u", "v").agg(count(lit(1)).as("s"))
        .filter(col("s") >= 2).select("u", "v")
        .localCheckpoint() // symmetrization inside LPA reads it twice
      val labels = GraphOps.labelPropagation(g, "u", "v", iters = 3)
        .localCheckpoint() // community-size join reads it twice
      val sizes = labels.groupBy("label")
        .agg(count(lit(1)).as("community_size"))
      labels.join(sizes, "label")
        .select(col("id").as("part_id"),
          col("label").as("community_id"), col("community_size"))
    }),

    // modularity Q (Newman 2004) as a partition-quality A/B: the same
    // metric scored over BOTH community assignments this pack produces —
    // connected components vs 3-round synchronous LPA.
    // Q = Σ_c [e_c/m − (deg_c/2m)²], folded to (4m·Σe_c − Σdeg_c²)/(4m²)
    // so every term is an exact integer (within-edges, degree sums,
    // Σdeg_c²) and the ONLY float op is the final division — both
    // engines evaluate the identical straight line. The honest verdict
    // on THIS graph is the point: one giant component holds ~all edges
    // (we=m but the null-model term cancels it, Q≈0.007) and the pinned
    // synchronous-LPA trajectory fragments (440 communities, we≈1.5% of
    // m, Q≈0.008) — the metric reports that neither partition beats the
    // degree-sequence null model, which is exactly what a quality gauge
    // must say about a structureless blob (GraphOpsSpec pins a planted
    // two-clique graph where it reports Q≫0). Scale shape: degrees and
    // labels join on ids (long pairs), the single-row aggregates
    // broadcast — nothing quadratic, no vectors.
    "graph_modularity" -> ((s, d) => {
      // raw (o, p) — coOccurrencePairs dedupes inside its own basket
      // aggregation (collect_set), so the old pre-distinct() exchange
      // is gone (r17 opt round, guide §2.4)
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val g = GraphOps.coOccurrencePairs(items, "o", "p",
          requireExact = true)
        .groupBy("u", "v").agg(count(lit(1)).as("s"))
        .filter(col("s") >= 2).select("u", "v")
        .localCheckpoint() // CC, LPA, m, within-edges, degrees read it
      val verts = g.select(col("u").as("id"))
        .union(g.select(col("v").as("id"))).distinct()
      val cc = graft.ops.Clusters.connectedComponentsStar(verts,
        g.select(col("u").as("src"), col("v").as("dst")))
      val lpa = GraphOps.labelPropagation(g, "u", "v", iters = 3)
      // label-independent degree table computed ONCE for both reports
      // (r17 opt: was re-aggregated per modularity call)
      val deg = g.select(col("u"))
        .union(g.select(col("v").as("u")))
        .groupBy("u").agg(count(lit(1)).as("dg"))
        .localCheckpoint()
      def report(labels: org.apache.spark.sql.DataFrame, tag: String) =
        GraphOps.modularity(g, "u", "v", labels, "id", "label",
          degrees = Some(deg))
          .select(lit(tag).as("method"), col("n_communities"),
            col("n_edges"), col("edges_within"), col("modularity"))
      report(cc, "components").unionAll(report(lpa, "lpa3"))
        .orderBy("method")
    }),

    // association rules over the repeat-co-purchase pairs: support,
    // directional confidence, lift — the market-basket report
    // (Agrawal/Srikant's metrics, pair itemsets). Every ratio is exact
    // ints → one straight-line double op, so the lift ORDER BY is
    // engine-stable; top-50 under the (lift, u, v) total order.
    "agg_market_basket" -> ((s, d) => {
      // materialized: items feeds 3 consumers (order count, item counts,
      // pair expansion) — one distinct shuffle instead of three
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct().localCheckpoint()
      val nOrders = items.select("o").distinct()
        .agg(count(lit(1)).as("n"))
      val pc = items.groupBy(col("p")).agg(count(lit(1)).as("cp"))
      val pairs = GraphOps.coOccurrencePairs(items, "o", "p")
        .groupBy("u", "v").agg(count(lit(1)).as("cuv"))
        .filter(col("cuv") >= 2)
      pairs
        .join(pc.select(col("p").as("u"), col("cp").as("cu")), "u")
        .join(pc.select(col("p").as("v"), col("cp").as("cv")), "v")
        .crossJoin(broadcast(nOrders))
        .select(col("u"), col("v"), col("cuv"),
          graft.StableRound.round6(
            col("cuv").cast("double") / col("n")).as("support"),
          graft.StableRound.round6(
            col("cuv").cast("double") / col("cu")).as("conf_uv"),
          graft.StableRound.round6(
            col("cuv").cast("double") / col("cv")).as("conf_vu"),
          graft.StableRound.round6(
            col("cuv").cast("double") * col("n") / (col("cu") * col("cv")))
            .as("lift"))
        .orderBy(col("lift").desc, col("u"), col("v"))
        .limit(50)
    }))

  /** Shared replay of the repeat-co-purchase graph + 3 synchronous LPA
    * rounds (`items … g, sym, l0 … l3`, no leading WITH so the
    * modularity oracle can prepend WITH RECURSIVE) — the trajectory both
    * the LPA entry and the modularity report are defined over. */
  private val lpaBody: String = {
    val rounds = (1 to 3).map { r =>
      s""",
        |n$r AS (SELECT s.x, l.lbl, count(*) AS c
        |  FROM sym s JOIN l${r - 1} l ON l.x = s.y GROUP BY 1, 2),
        |l$r AS (SELECT x, lbl FROM (SELECT x, lbl,
        |    row_number() OVER (PARTITION BY x ORDER BY c DESC, lbl)
        |      AS rn FROM n$r) WHERE rn = 1)""".stripMargin
    }.mkString
    s"""items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      |  FROM lineitem),
      |g AS (SELECT a.p AS u, b.p AS v
      |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |sym AS (SELECT u AS x, v AS y FROM g
      |  UNION ALL SELECT v, u FROM g),
      |l0 AS (SELECT DISTINCT x, x AS lbl FROM sym)$rounds""".stripMargin
  }

  private val lpaCte: String = "WITH " + lpaBody

  def oracle: Map[String, String] = Map(
    // id-ordered 3-way join — orientation-invariant counts, so the
    // simple form must agree exactly with the degree-oriented plan
    "graph_triangle_count" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p),
        |deg AS (SELECT x, count(*) AS deg FROM (
        |    SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
        |  GROUP BY 1),
        |verts AS (SELECT count(DISTINCT p) AS n_vertices FROM items),
        |en AS (SELECT count(*) AS n_edges FROM e),
        |p2 AS (SELECT CAST(sum(deg * (deg - 1)) // 2 AS BIGINT)
        |    AS n_paths2 FROM deg),
        |tri AS (SELECT count(*) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e1.v = e2.u
        |            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT n_vertices, n_edges, n_paths2, n_triangles
        |FROM verts, en, p2, tri""".stripMargin,

    // id-ordered 3-way triangle enumeration, each triple unnested to its
    // three corners; lcc assembly mirrored per-row
    "graph_clustering_coeff" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
         |  FROM lineitem),
         |e AS (SELECT DISTINCT a.p AS u, b.p AS v
         |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p),
         |deg AS (SELECT x, count(*) AS deg FROM (
         |    SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
         |  GROUP BY 1),
         |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
         |  FROM e e1 JOIN e e2 ON e1.v = e2.u
         |            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
         |t AS (SELECT x, count(*) AS n_tri
         |  FROM (SELECT unnest([a, b, c]) AS x FROM tri) GROUP BY 1)
         |SELECT deg.x, CAST(deg.deg AS BIGINT) AS deg,
         |  CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_tri,
         |  CASE WHEN deg.deg >= 2 THEN ${graft.StableRound.sql6(
              "CAST(COALESCE(t.n_tri, 0) * 2 AS DOUBLE) " +
                "/ CAST(deg.deg * (deg.deg - 1) AS DOUBLE)")}
         |    ELSE 0.0 END AS lcc
         |FROM deg LEFT JOIN t ON t.x = deg.x""".stripMargin,

    // symmetric moments over endpoint degrees; hugeint ≡ DECIMAL(38,0)
    "graph_assortativity" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
         |  FROM lineitem),
         |e AS (SELECT DISTINCT a.p AS u, b.p AS v
         |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p),
         |deg AS (SELECT x, count(*) AS deg FROM (
         |    SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
         |  GROUP BY 1),
         |s AS (SELECT count(*) AS m,
         |    sum(du.deg + dv.deg) AS sx,
         |    sum(du.deg * du.deg + dv.deg * dv.deg) AS sxx,
         |    sum(du.deg * dv.deg * 2) AS sxy
         |  FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v)
         |SELECT CAST(m AS BIGINT) AS n_edges,
         |  ${graft.StableRound.sql6(
              "(CAST(m AS DOUBLE) * 2 * CAST(sxy AS DOUBLE) " +
                "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) " +
                "/ (CAST(m AS DOUBLE) * 2 * CAST(sxx AS DOUBLE) " +
                "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))")}
         |    AS assortativity
         |FROM s""".stripMargin,

    "graph_common_neighbors" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |g AS (SELECT a.p AS u, b.p AS v
        |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (SELECT u AS x, v AS y FROM g
        |  UNION ALL SELECT v AS x, u AS y FROM g),
        |cand AS (SELECT a.y AS u, b.y AS v, count(*) AS n_common
        |  FROM sym a JOIN sym b ON a.x = b.x AND a.y < b.y
        |  GROUP BY 1, 2),
        |ne AS (SELECT cand.u, cand.v, cand.n_common FROM cand
        |  LEFT JOIN g ON cand.u = g.u AND cand.v = g.v
        |  WHERE g.u IS NULL)
        |SELECT u, v, n_common FROM ne
        |ORDER BY n_common DESC, u, v LIMIT 20""".stripMargin,

    "graph_jaccard_neighbors" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |g AS (SELECT a.p AS u, b.p AS v
        |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (SELECT u AS x, v AS y FROM g
        |  UNION ALL SELECT v AS x, u AS y FROM g),
        |deg AS (SELECT x, CAST(count(*) AS BIGINT) AS deg
        |  FROM sym GROUP BY 1),
        |cand AS (SELECT a.y AS u, b.y AS v,
        |    CAST(count(*) AS BIGINT) AS n_common
        |  FROM sym a JOIN sym b ON a.x = b.x AND a.y < b.y
        |  GROUP BY 1, 2),
        |ne AS (SELECT cand.u, cand.v, cand.n_common FROM cand
        |  LEFT JOIN g ON cand.u = g.u AND cand.v = g.v
        |  WHERE g.u IS NULL),
        |j AS (SELECT ne.u, ne.v, ne.n_common, du.deg AS du, dv.deg AS dv,
        |    ${graft.StableRound.sql6("CAST(n_common AS DOUBLE) " +
             "/ CAST(du.deg + dv.deg - n_common AS DOUBLE)")} AS jaccard
        |  FROM ne JOIN deg du ON du.x = ne.u JOIN deg dv ON dv.x = ne.v)
        |SELECT u, v, n_common, du, dv, jaccard FROM j
        |ORDER BY jaccard DESC, u, v LIMIT 20""".stripMargin,

    "graph_degree_dist" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p),
        |deg AS (SELECT x, count(*) AS deg FROM (
        |    SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
        |  GROUP BY 1)
        |SELECT deg, count(*) AS n_vertices FROM deg GROUP BY 1"""
        .stripMargin,

    // per-node mean neighbor degree round6-snapped to fixed point
    // before the cross-node average — integer sums only
    "graph_avg_nbr_degree" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p),
        |deg AS (SELECT x, count(*) AS deg FROM (
        |    SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
        |  GROUP BY 1),
        |inc AS (SELECT u AS x, v AS y FROM e
        |  UNION ALL SELECT v AS x, u AS y FROM e),
        |pn AS (SELECT inc.x, count(*) AS dx, sum(d2.deg) AS sy
        |  FROM inc JOIN deg d2 ON d2.x = inc.y GROUP BY 1),
        |m AS (SELECT dx, CAST(floor(${graft.StableRound.sql6(
             "CAST(sy AS DOUBLE) / CAST(dx AS DOUBLE)")}
        |    * 1000000 + 0.5) AS BIGINT) AS m6 FROM pn)
        |SELECT dx AS deg, CAST(count(*) AS BIGINT) AS n_nodes,
        |  ${graft.StableRound.sql6(
             "CAST(sum(m6) AS DOUBLE) / 1000000.0 " +
               "/ CAST(count(*) AS DOUBLE)")} AS knn
        |FROM m GROUP BY 1""".stripMargin,

    // the same 5 integer rounds unrolled as CTE stages; `//` in DuckDB
    // and `div` in Spark are the same floor division on positives
    "graph_pagerank" -> {
      val pre =
        """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
          |  FROM lineitem),
          |g AS (SELECT a.p AS u, b.p AS v
          |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |sym AS (SELECT u AS x, v AS y FROM g
          |  UNION ALL SELECT v, u FROM g),
          |deg AS (SELECT x, count(*) AS deg FROM sym GROUP BY 1),
          |consts AS (SELECT 1000000000000 // count(*) AS r0,
          |    (15 * (1000000000000 // count(*))) // 100 AS base
          |  FROM deg),
          |r0v AS (SELECT x, r0 AS r FROM deg, consts)""".stripMargin
      val rounds = (1 to 5).map { i =>
        val prev = if (i == 1) "r0v" else s"r${i - 1}"
        s""",
           |c$i AS (SELECT r.x, r.r // d.deg AS c
           |  FROM $prev r JOIN deg d ON r.x = d.x),
           |r$i AS (SELECT s.y AS x, base + (85 * sum(c.c)) // 100 AS r
           |  FROM sym s JOIN c$i c ON s.x = c.x, consts
           |  GROUP BY s.y, base)""".stripMargin
      }.mkString
      // CAST: DuckDB's sum(BIGINT) makes r HUGEINT from round 1 on, and
      // pandas renders HUGEINT as float64 ("5.0e12" vs Spark's int64) —
      // value-equal, format-different, hash-FAIL on the driver (r8/r9).
      // Values stay ≤ ~8.5e13 (rank mass conserved at ~1e12), so the
      // BIGINT cast is lossless.
      pre + rounds +
        "\nSELECT x AS part_id, CAST(r AS BIGINT) AS rank_fp FROM r5" +
        "\nORDER BY r DESC, x LIMIT 20"
    },

    "graph_components" ->
      """WITH RECURSIVE items AS (SELECT DISTINCT l_orderkey AS o,
        |    l_partkey AS p FROM lineitem),
        |g AS (SELECT a.p AS u, b.p AS v
        |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (SELECT u AS src, v AS dst FROM g
        |  UNION ALL SELECT v, u FROM g),
        |verts AS (SELECT DISTINCT src AS x FROM e),
        |r AS (SELECT x AS v, x AS l FROM verts
        |  UNION
        |  SELECT e.dst AS v, r.l AS l FROM r JOIN e ON e.src = r.v)
        |SELECT v AS part_id, min(l) AS component_id,
        |  (v = min(l)) AS is_rep
        |FROM r GROUP BY v""".stripMargin,

    // the 3 synchronous LPA rounds as chained CTEs; argmax = row_number
    // over (count DESC, label ASC) — the same deterministic tie-break
    // GraphOps.labelPropagation's max_by struct encodes
    // the same 5 peel rounds as chained CTE stages
    "graph_kcore" -> {
      val rounds = (1 to 5).map { r =>
        s""",
          |kp$r AS (SELECT x FROM e${r - 1} GROUP BY x
          |  HAVING count(*) >= 3),
          |e$r AS (SELECT e.x, e.y FROM e${r - 1} e
          |  JOIN kp$r a ON e.x = a.x JOIN kp$r b ON e.y = b.x)""".stripMargin
      }.mkString
      s"""WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |g AS (SELECT a.p AS u, b.p AS v
        |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e0 AS (SELECT u AS x, v AS y FROM g
        |  UNION ALL SELECT v, u FROM g)$rounds
        |SELECT x AS id, count(*) AS core_degree FROM e5 GROUP BY 1""".stripMargin
    },

    "graph_bfs_layers" -> {
      val rounds = (1 to 4).map { r =>
        s""",
          |d$r AS (SELECT id, min(dist) AS dist FROM (
          |  SELECT id, dist FROM d${r - 1}
          |  UNION ALL
          |  SELECT s.y AS id, d.dist + 1 AS dist
          |  FROM sym s JOIN d${r - 1} d ON s.x = d.id) GROUP BY id)"""
          .stripMargin
      }.mkString
      s"""WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |g AS (SELECT a.p AS u, b.p AS v
        |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (SELECT u AS x, v AS y FROM g
        |  UNION ALL SELECT v, u FROM g),
        |d0 AS (SELECT id, CAST(0 AS BIGINT) AS dist FROM
        |  (SELECT DISTINCT x AS id FROM sym ORDER BY 1 LIMIT 3))$rounds
        |SELECT id AS part_id, dist FROM d4""".stripMargin
    },

    "graph_label_propagation" ->
      s"""$lpaCte,
        |cs AS (SELECT lbl, count(*) AS community_size FROM l3 GROUP BY 1)
        |SELECT l3.x AS part_id, l3.lbl AS community_id, cs.community_size
        |FROM l3 JOIN cs ON l3.lbl = cs.lbl""".stripMargin,

    // both partitions replayed in one statement (WITH RECURSIVE for the
    // min-label component closure + the chained LPA rounds), each folded
    // to (4m·we − Σdeg_c²)/(4m²): every CTE below the shared chain is
    // integer-exact, the final division is the single float op mirrored
    // on the Spark side
    "graph_modularity" -> {
      def q(lblRel: String, tag: String) =
        s"""SELECT '$tag' AS method, s$tag.nc AS n_communities,
          |  m.m AS n_edges, w$tag.we AS edges_within,
          |  ${graft.StableRound.sql6(
               s"CAST(4 * m.m * w$tag.we - s$tag.sdc AS DOUBLE)" +
               " / CAST(4 * m.m * m.m AS DOUBLE)")} AS modularity
          |FROM s$tag, m, w$tag""".stripMargin
      def parts(lblRel: String, tag: String) =
        s"""w$tag AS (SELECT count(*) AS we FROM g
          |  JOIN $lblRel a ON g.u = a.x JOIN $lblRel b ON g.v = b.x
          |  WHERE a.lbl = b.lbl),
          |d$tag AS (SELECT $lblRel.lbl, sum(deg.dg) AS degsum
          |  FROM deg JOIN $lblRel ON deg.x = $lblRel.x GROUP BY 1),
          |s$tag AS (SELECT CAST(sum(degsum * degsum) AS BIGINT) AS sdc,
          |    count(*) AS nc FROM d$tag)""".stripMargin
      s"""WITH RECURSIVE $lpaBody,
        |r AS (SELECT x AS v, x AS l FROM (SELECT DISTINCT x FROM sym)
        |  UNION
        |  SELECT sym.y AS v, r.l AS l FROM r JOIN sym ON sym.x = r.v),
        |cc AS (SELECT v AS x, min(l) AS lbl FROM r GROUP BY v),
        |m AS (SELECT count(*) AS m FROM g),
        |deg AS (SELECT x, count(*) AS dg FROM sym GROUP BY 1),
        |${parts("cc", "components")},
        |${parts("l3", "lpa3")}
        |${q("cc", "components")}
        |UNION ALL
        |${q("l3", "lpa3")}
        |ORDER BY method""".stripMargin
    },

    "agg_market_basket" -> {
      def r6(e: String) = graft.StableRound.sql6(e)
      s"""WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |n AS (SELECT count(DISTINCT o) AS n FROM items),
        |pc AS (SELECT p, count(*) AS cp FROM items GROUP BY 1),
        |pairs AS (SELECT a.p AS u, b.p AS v, count(*) AS cuv
        |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT u, v, cuv,
        |  ${r6("CAST(cuv AS DOUBLE) / n")} AS support,
        |  ${r6("CAST(cuv AS DOUBLE) / cu.cp")} AS conf_uv,
        |  ${r6("CAST(cuv AS DOUBLE) / cv.cp")} AS conf_vu,
        |  ${r6("CAST(cuv AS DOUBLE) * n / (cu.cp * cv.cp)")} AS lift
        |FROM pairs
        |JOIN pc cu ON pairs.u = cu.p
        |JOIN pc cv ON pairs.v = cv.p, n
        |ORDER BY ${r6("CAST(cuv AS DOUBLE) * n / (cu.cp * cv.cp)")} DESC,
        |  u, v LIMIT 50""".stripMargin
    })
}
