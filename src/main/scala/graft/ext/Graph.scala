package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * DataFrame-native graph analytics — the web/domain-graph layer of a
 * large-scale curation pipeline. Common Crawl-class corpora carry a link
 * graph next to the documents, and the canonical curation signals over it
 * are PageRank-style centrality (domain quality priors for sampling weights
 * — the reference's dashboard ranks sources by raw count at
 * `/root/reference/dashbord/dashbord.py:99-100`; a link-aware prior is the
 * scale-grade version of that signal) and triangle/clustering statistics
 * (link-farm and spam-cluster detection). Here both run as pure
 * DataFrame/Catalyst plans over an edge relation — no GraphX, no RDDs, no
 * driver-side adjacency — so they inherit AQE, broadcast planning, and
 * columnar shuffle like every other operator in the library.
 *
 * Scale posture:
 *  - An iteration of PageRank is `edges ⋈ ranks` (one hash join keyed on
 *    `src`) + one `groupBy(dst)` partial+final aggregation + one left join
 *    back to the vertex set — three key shuffles, each on a key the next
 *    iteration reuses. Out-degrees are folded into the edge relation ONCE
 *    before the loop (not re-joined per iteration), and each iteration's
 *    rank relation is eagerly materialized so the plan for iteration k+1
 *    starts from a scan, not from a k-deep lineage re-derivation (on a
 *    cluster this is the stage checkpoint you'd write between iterations).
 *  - All rank arithmetic is FIXED-POINT (integer units of 1e-9): `div` on
 *    BIGINT, never double sums. PageRank is a giant floating-point
 *    summation whose low bits depend on aggregation order; integer units
 *    make every iteration bit-deterministic on any cluster layout AND
 *    byte-replayable by the DuckDB oracle. The truncation per edge
 *    contribution leaks ≤ 1 unit (1e-9) of mass — it dissipates, never
 *    accumulates, because each iteration renormalizes from the teleport
 *    term.
 *  - Triangle counting directs each undirected edge from its (degree, id)-
 *    smaller endpoint to the larger (degeneracy orientation), so the wedge
 *    self-join is bounded by Σ_v outdeg(v)² with outdeg ≤ O(√m) on any
 *    graph — the standard guard against the high-degree-hub blowup that
 *    makes the naive wedge join quadratic on skewed web graphs.
 */
object Graph {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Rank unit: 1 vertex of initial mass = 1e9 units, so ranks print as
   * nano-PageRank integers. With damping 85/100 the intermediate product
   * `rank * dampNum` stays below 2^63 for total graph mass up to ~1e17
   * units ≈ 1e8 vertices per unit of initial mass — beyond that, raise the
   * unit granularity down (smaller `unit`) before raising vertex count. */
  val Unit9 = 1000000000L

  /** Directed purchase graph: customer → supplier, one edge per distinct
   * (customer, supplier) trading relation observed in the order book.
   * Vertex ids are prefixed (`c…` / `s…`) so the two key spaces cannot
   * collide. Suppliers have no out-edges — the dangling-mass path of
   * [[pagerank]] is exercised by construction, not as an edge case. */
  def purchaseEdges(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
      .distinct() // dedup the narrow long pair BEFORE widening to strings
      .select(
        concat(lit("c"), col("ck")).as("src"),
        concat(lit("s"), col("sk")).as("dst"))

  /** Undirected co-purchase graph over parts: `u < v` iff parts u and v
   * appear in the same order. Canonicalized (u < v), distinct. The
   * "documents that share a container" graph shape — its distinct-pair
   * cardinality is bounded by Σ_order C(items, 2), and the per-order item
   * count is small and bounded by construction (an order has few lines),
   * so the expansion is never quadratic in the corpus. */
  def coPurchaseEdges(lineitem: DataFrame): DataFrame = {
    val a = lineitem.select(col("l_orderkey").as("k"), col("l_partkey").as("u"))
    val b = lineitem.select(col("l_orderkey").as("k"), col("l_partkey").as("v"))
    a.join(b, Seq("k")).where(col("u") < col("v"))
      .select("u", "v").distinct()
  }

  /** Item-item cosine similarity over a (basket, item) relation — the
   * memory-based collaborative-filtering kernel (Sarwar et al., WWW
   * 2001): sim(u, v) = c_uv / √(c_u·c_v), with c_uv the number of
   * baskets containing both items and c_u/c_v each item's basket count
   * (binary-rating cosine). The "customers who bought X also bought Y"
   * primitive, one density step past [[coPurchaseEdges]]' mere
   * adjacency.
   *
   * The co-occurrence expansion is Σ_basket C(items, 2); `maxBasket`
   * skips baskets above the cap (the maxBucket/maxDegree discipline —
   * a mega-basket contributes C(n,2) pairs of the WEAKEST signal, since
   * co-occurrence inside a huge basket carries little affinity), so the
   * expansion is bounded by maxBasket·|rows|. Counts are exact BIGINTs;
   * the score is one fixed-shape double (int-exact product under the
   * IEEE sqrt, one divide — the n13 discipline) micro-quantized for the
   * deterministic top-k cut. Output: top-`topK` by (sim_micro DESC,
   * u, v): (u, v, c_uv, c_u, c_v, sim_micro). */
  def itemSimilarity(baskets: DataFrame, maxBasket: Int = 64,
      topK: Int = 50): DataFrame =
    itemPairScores(baskets, maxBasket)
      .orderBy(desc("sim_micro"), asc("u"), asc("v"))
      .limit(topK)

  /** The shared scored-pair relation behind [[itemSimilarity]] (global
   * top-k) and [[itemNeighbors]] (per-item top-k): unordered co-basket
   * pairs under the `maxBasket` expansion cap, cosine-scored against
   * UNCAPPED marginals. */
  private def itemPairScores(baskets: DataFrame,
      maxBasket: Int): DataFrame = {
    require(maxBasket >= 2, s"maxBasket must be >= 2, got $maxBasket")
    val bi = Dedup.materialize(
      baskets.select(col("basket"), col("item")).distinct())
    val sized = bi.groupBy("basket").agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBasket).select("basket")
    val kept = bi.join(sized, Seq("basket"), "left_semi")
    val cuv = kept.select(col("basket"), col("item").as("u"))
      .join(kept.select(col("basket"), col("item").as("v")), Seq("basket"))
      .where(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("c_uv"))
    // item degrees over the UNCAPPED relation — the cap bounds the pair
    // expansion, not the marginals (same contract as linkPredictions'
    // Jaccard denominator)
    val deg = bi.groupBy(col("item")).agg(count(lit(1)).as("c"))
    cuv
      .join(deg.select(col("item").as("u"), col("c").as("c_u")), Seq("u"))
      .join(deg.select(col("item").as("v"), col("c").as("c_v")), Seq("v"))
      .select(col("u"), col("v"), col("c_uv"), col("c_u"), col("c_v"),
        floor(col("c_uv").cast("double") /
            sqrt((col("c_u") * col("c_v")).cast("double")) * lit(1e6) +
            lit(0.5)).cast("long").as("sim_micro"))
  }

  /** Per-item top-k co-purchase neighbors — the SERVING artifact of
   * item-item CF ([[itemSimilarity]]'s global top-k is the diagnostic;
   * a recommender needs every item's OWN neighbor list): the scored
   * pair relation symmetrized, then one per-item window rank under the
   * deterministic (sim DESC, nbr ASC) order. Output:
   * (item, nbr, sim_micro, rank ≤ kPerItem). */
  def itemNeighbors(baskets: DataFrame, maxBasket: Int = 64,
      kPerItem: Int = 10): DataFrame = {
    require(kPerItem >= 1, s"kPerItem must be >= 1, got $kPerItem")
    val sc = itemPairScores(baskets, maxBasket)
      .select("u", "v", "sim_micro")
    val sym = sc.select(col("u").as("item"), col("v").as("nbr"),
        col("sim_micro"))
      .unionByName(sc.select(col("v").as("item"), col("u").as("nbr"),
        col("sim_micro")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("item")
      .orderBy(desc("sim_micro"), asc("nbr"))
    sym.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kPerItem)
  }

  /** Leave-none-out hit-rate eval of a neighbor model on a DISJOINT
   * test basket set: per test basket (≥ 2 distinct items) the SEED is
   * its minimum item, a hit is any OTHER basket item appearing in the
   * seed's neighbor list — the offline eval every bought-X-also-bought
   * deployment runs before swapping models. Train/test disjointness is
   * the caller's contract (build `neighbors` on a split the test
   * baskets are excluded from — evaluating on training baskets
   * measures memorization). One basket-grain agg + one keyed semi-join
   * + two 1-row aggs. Output: (n_baskets, n_hits, hitrate_ppm). */
  def recHitRate(neighbors: DataFrame, test: DataFrame): DataFrame = {
    val ti = test.select(col("basket"), col("item")).distinct()
    val sized = Dedup.materialize(
      ti.groupBy("basket")
        .agg(count(lit(1)).as("bsz"), min("item").as("seed"))
        .filter(col("bsz") >= 2).select("basket", "seed"))
    val rest = ti.join(sized, Seq("basket"))
      .filter(col("item") =!= col("seed"))
    val nb = neighbors.select(col("item").as("__ni"),
      col("nbr").as("__nn"))
    val hits = rest.join(nb,
        rest("seed") === nb("__ni") && rest("item") === nb("__nn"),
        "left_semi")
      .select("basket").distinct()
      .agg(count(lit(1)).as("n_hits"))
    sized.agg(count(lit(1)).as("n_baskets"))
      .crossJoin(broadcast(hits))
      .select(col("n_baskets"), col("n_hits"),
        expr("(n_hits * 1000000) div n_baskets").as("hitrate_ppm"))
  }

  /**
   * Fixed-point PageRank over a directed edge relation `(src, dst)`.
   *
   * Semantics (all BIGINT, deterministic):
   *  - every vertex starts at `unit` (1e9) rank units;
   *  - per iteration, a vertex with out-degree d sends each out-neighbor
   *    `(rank * dampNum) div (dampDen * d)` units;
   *  - dangling mass (ranks of vertices with no out-edges) is redistributed
   *    uniformly: `(dampNum * danglingSum) div (dampDen * n)` per vertex;
   *  - the teleport term is `((dampDen - dampNum) * unit) div dampDen`.
   *
   * The dangling sum is a one-row scalar aggregate per iteration (driver
   * sees 8 bytes, never rows). Edge and out-degree relations are
   * materialized once before the loop; each iteration's output is
   * materialized so lineage stays one stage deep.
   */
  def pagerank(
      edges: DataFrame,
      iters: Int,
      unit: Long = Unit9,
      dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame =
    pagerankCore(edges, None, iters, unit, dampNum, dampDen)

  /**
   * Personalized (seed-teleport) PageRank — the "expand from a trusted
   * seed set" centrality used to grow a curation whitelist from known-good
   * domains: teleport mass AND dangling mass land uniformly on the seed
   * vertices instead of the whole graph, so rank concentrates in the
   * seeds' link neighborhood. Semantics are [[pagerank]]'s fixed-point
   * arithmetic with the teleport target narrowed; with `seeds` = all
   * vertices the two are ARITHMETICALLY identical (the shared core below
   * divides the same integer products), which `GraphSpec` pins.
   *
   * `seeds` (one `vertex` column) is intersected with the graph's vertex
   * set — a seed with no edges carries no mass and does not count toward
   * the teleport split. Seed membership is static, so it is baked into the
   * vertex relation once, like dangling-ness.
   */
  def pagerankPersonalized(
      edges: DataFrame,
      seeds: DataFrame,
      iters: Int,
      unit: Long = Unit9,
      dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame =
    pagerankCore(edges, Some(seeds), iters, unit, dampNum, dampDen)

  private def pagerankCore(
      edges: DataFrame,
      seedsOpt: Option[DataFrame],
      iters: Int,
      unit: Long,
      dampNum: Long,
      dampDen: Long): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")

    val e = Dedup.materialize(edges.select("src", "dst").distinct())
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // Dangling-ness and seed membership are STATIC — bake both into the
    // vertex relation once so the loop never re-derives them (a
    // per-iteration anti-join would be a whole extra shuffle × iterations
    // for properties that never change).
    val vertBase = e.select(col("src").as("vertex"))
      .union(e.select(col("dst").as("vertex"))).distinct()
      .join(outdeg.select(col("src").as("vertex"),
        lit(true).as("__has_out")), Seq("vertex"), "left")
    val flagged = seedsOpt match {
      case None => vertBase.withColumn("__seed", lit(true))
      case Some(s) => vertBase.join(
        s.select(col("vertex")).distinct()
          .withColumn("__seed_hit", lit(true)),
        Seq("vertex"), "left")
        .withColumn("__seed", col("__seed_hit").isNotNull)
    }
    val vertices = Dedup.materialize(flagged.select(
      col("vertex"), col("__has_out").isNull.as("is_dangling"),
      col("__seed").as("is_seed")))
    // ONE aggregate job yields every static scalar the loop needs —
    // vertex count, seed count, and the dangling VERTEX count (initial
    // ranks are uniform, so iteration 1's dangling mass is exactly
    // danglingCount·unit with no extra pass).
    val stats = vertices.agg(
      count(lit(1)).as("n"),
      sum(when(col("is_seed"), 1L).otherwise(0L)).as("ns"),
      sum(when(col("is_dangling"), 1L).otherwise(0L)).as("nd")).first()
    val n = stats.getLong(0)
    require(n > 0, "pagerank over an empty edge relation")
    val seedCount = stats.getLong(1)
    require(seedCount > 0, "no seed vertex is present in the graph")
    val danglingCount = stats.getLong(2)
    // Fold out-degree into the edge relation once — iterations join the
    // rank relation against this single weighted-edge table.
    val weighted = Dedup.materialize(e.join(outdeg, "src"))
    // Teleport lands on seeds only: (1−d) of the INITIAL total mass
    // (n·unit), split over the seed count. With seeds = all vertices this
    // reduces exactly to ((dampDen−dampNum)·unit) div dampDen — the
    // global-PageRank base — because the numerator is an exact multiple
    // of dampDen·n by construction.
    val seedBase = ((dampDen - dampNum) * n * unit) / (dampDen * seedCount)

    var ranks = vertices.withColumn("rank", lit(unit))
    // The dangling mass each iteration redistributes is carried IN THE
    // DATAFLOW as a 1-row aggregate over the previous iterate (broadcast
    // into the rank update), not as a driver-side Observation readout:
    // the readout form forced one EAGER job per iteration just to learn
    // an 8-byte scalar the plan itself can compute, and on this host the
    // scheduler's per-job constant (bench `sched` canary, 0.2-0.45 s/job)
    // dominated the sub-second iteration bodies. Same integer arithmetic
    // — `(dampNum·danglingMass) div (dampDen·seedCount)` with every
    // factor non-negative, so SQL `div` ≡ the former driver `/` — and
    // the lazy checkpoint still truncates each iterate's plan; only the
    // per-iteration job boundary is gone (GraphSpec pins the outputs).
    // The mass tripwire moved in-plan with the same strictness upgrade
    // as labelPropagation's id gate: fixed-point truncation only ever
    // LEAKS mass, so total rank above the initial n·unit means broken
    // arithmetic (overflow, a negative rank) and now refuses loudly
    // instead of logging.
    for (i <- 1 to iters) {
      val dm = ranks.agg(
        coalesce(sum(when(col("is_dangling"), col("rank"))
          .otherwise(lit(0L))), lit(0L)).as("__dm"),
        coalesce(sum("rank"), lit(0L)).as("__mass"))
      val contribs = weighted
        .join(ranks, weighted("src") === ranks("vertex"))
        .groupBy("dst")
        .agg(sum(expr(s"(rank * ${dampNum}L) div (${dampDen}L * outdeg)"))
          .as("contrib"))
      ranks = Dedup.materializeLazy(
        vertices.join(contribs, vertices("vertex") === contribs("dst"), "left")
          .crossJoin(broadcast(dm))
          .select(
            col("vertex"), col("is_dangling"), col("is_seed"),
            (when(col("is_seed"),
              when(assert_true(col("__mass") <= lit(n * unit),
                lit(s"pagerank iteration $i: total mass exceeds the " +
                  s"initial ${n * unit} — fixed-point arithmetic should " +
                  "only ever leak mass; suspect overflow")).isNull,
                lit(seedBase) +
                  expr(s"(${dampNum}L * __dm) div " +
                    s"(${dampDen}L * ${seedCount}L)")))
              .otherwise(lit(0L)) + coalesce(col("contrib"), lit(0L)))
              .as("rank")))
    }
    ranks.select("vertex", "rank")
  }

  /** HITS hubs & authorities (Kleinberg, JACM 1999) in integer fixed
   * point: the mutually-recursive pair — a good hub points at good
   * authorities, a good authority is pointed at by good hubs — that
   * separates the two roles PageRank's single score conflates (on the
   * purchase graph: broad-basket customers vs widely-bought-from
   * suppliers). Per round, authority(v) = Σ_{u→v} hub(u) then
   * hub(v) = Σ_{v→w} authority(w), each rescaled to ≈`unit` by L∞
   * (divide by `max div unit` — one truncating integer division, NO
   * product, so the arithmetic never overflows: sums are bounded by
   * n·unit, not n·unit²; both engines replay `div`/`//` identically on
   * the non-negative domain). L∞ in place of the paper's L2 keeps the
   * iteration rational — the direction converges to the same principal
   * eigenvectors, only the scale convention differs, and an irrational
   * L2 norm has no bit-replayable form.
   *
   * Scale shape per round: two keyed joins of the edge relation against
   * the current score (the pagerank contrib shape), two vertex-grain
   * hash-aggs, two 1-row broadcast maxima; each iterate materialized
   * (the pagerank checkpoint posture). Output: (vertex, hub_q, auth_q)
   * over all vertices — 0 for roles a vertex never plays (no out-edges
   * ⇒ hub 0, no in-edges ⇒ authority 0). */
  def hits(edges: DataFrame, iters: Int = 2,
      unit: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(unit >= 1L, s"unit must be >= 1, got $unit")
    val e = Dedup.materialize(edges.select("src", "dst").distinct())
    val verts = Dedup.materialize(
      e.select(col("src").as("vertex"))
        .union(e.select(col("dst").as("vertex"))).distinct())
    var hubs = verts.withColumn("h", lit(unit))
    var auths: DataFrame = verts.withColumn("a", lit(0L))
    for (_ <- 1 to iters) {
      val aRaw = e.join(hubs, e("src") === hubs("vertex"))
        .groupBy("dst").agg(sum("h").as("a_raw"))
      val am = aRaw.agg(max("a_raw").as("am"))
      // fixed-iteration loop, no driver readout per round: the lazy
      // checkpoint truncates the plan identically but folds each round's
      // eager job into the final action (see materializeLazy)
      auths = Dedup.materializeLazy(
        aRaw.crossJoin(broadcast(am))
          .select(col("dst").as("vertex"),
            expr(s"a_raw div greatest(am div ${unit}L, 1L)").as("a")))
      val hRaw = e.join(auths, e("dst") === auths("vertex"))
        .groupBy("src").agg(sum("a").as("h_raw"))
      val hm = hRaw.agg(max("h_raw").as("hm"))
      hubs = Dedup.materializeLazy(
        verts.join(hRaw.withColumnRenamed("src", "vertex"),
          Seq("vertex"), "left")
          .crossJoin(broadcast(hm))
          .select(col("vertex"),
            coalesce(expr(s"h_raw div greatest(hm div ${unit}L, 1L)"),
              lit(0L)).as("h")))
    }
    hubs.join(auths, Seq("vertex"), "left")
      .select(col("vertex"), col("h").as("hub_q"),
        coalesce(col("a"), lit(0L)).as("auth_q"))
  }

  /**
   * Degree-skew pre-flight for an undirected edge relation — the
   * d17/d19/dq5-style "measure before you run" audit of [[triangleStats]]
   * (and of any neighborhood join over the graph): per power-of-two degree
   * bucket, the vertex count, degree extrema, and that bucket's share of
   * the naive wedge bound Σ C(deg, 2) — the cost ceiling an UNORIENTED
   * wedge join would pay, concentrated in the top buckets exactly when the
   * graph has hubs. One shuffle (the degree aggregation); bucket-grain
   * output. Buckets derive from the BINARY WIDTH of the degree
   * (`length(bin(deg))` = ⌊log₂ deg⌋ + 1) — pure integer arithmetic, no
   * floating log whose ulps could flip a power-of-two boundary
   * cross-engine.
   */
  def degreeStats(edges: DataFrame): DataFrame =
    degrees(canonicalEdges(edges))
      .groupBy(length(expr("bin(deg)")).as("deg_bucket"))
      .agg(
        count(lit(1)).as("n_vertices"),
        min("deg").as("min_deg"),
        max("deg").as("max_deg"),
        sum(expr("(deg * (deg - 1L)) div 2L")).as("wedge_bound"))

  /** Canonical undirected form shared by [[degreeStats]] and
   * [[triangleStats]]: (least, greatest), self-loops dropped, distinct.
   * Callers SHOULD already pass this shape, but a reversed duplicate
   * ((b,a) beside (a,b)) would double-count triangles and a self-loop
   * would corrupt the degree relation — normalize instead of trusting. */
  private def canonicalEdges(edges: DataFrame): DataFrame =
    edges.select(least(col("u"), col("v")).as("u"),
      greatest(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

  /** Undirected degree per vertex of a canonical edge relation. */
  private def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("vertex"))
      .union(e.select(col("v").as("vertex")))
      .groupBy("vertex").agg(count(lit(1)).as("deg"))

  /**
   * Triangle + clustering summary of an undirected, canonical (`u < v`,
   * distinct) edge relation — one output row:
   * `(n_vertices, n_edges, n_wedges, n_triangles, global_clustering)`.
   *
   * Counting uses the degeneracy orientation: each edge points from its
   * (degree, id)-lexicographically smaller endpoint to the larger, so
   * every vertex's ORIENTED out-degree is ≤ O(√m) whatever its raw degree
   * — the hub guard — and each triangle is charged to exactly one edge
   * (compact-forward: the common out-neighbors of the edge's endpoints).
   * `n_wedges` (open + closed paths of length 2) is Σ_v C(deg v, 2),
   * computed from the degree relation without any join;
   * `global_clustering` = 3·triangles / wedges, the one non-integer output,
   * rounded where double division of exact integers is reproducible.
   */
  def triangleStats(edges: DataFrame): DataFrame = {
    // Defensive canonicalization (narrow): callers SHOULD pass (u < v,
    // distinct); [[canonicalEdges]] normalizes instead of trusting.
    val e = Dedup.materialize(canonicalEdges(edges))
    val deg = Dedup.materialize(degrees(e))

    // Orient: keep (lo, hi) by (deg, id) order.
    val du = deg.select(col("vertex").as("u"), col("deg").as("du"))
    val dv = deg.select(col("vertex").as("v"), col("deg").as("dv"))
    val oriented = Dedup.materialize(
      e.join(du, "u").join(dv, "v")
        .select(
          when(col("du") < col("dv") ||
               (col("du") === col("dv") && col("u") < col("v")),
            struct(col("u").as("lo"), col("v").as("hi")))
            .otherwise(struct(col("v").as("lo"), col("u").as("hi")))
            .as("d"))
        .select(col("d.lo").as("lo"), col("d.hi").as("hi")))

    // Compact-forward counting: a triangle {a,b,c} with orientation
    // a→b, a→c, b→c is found exactly once, at edge (a,b), as the common
    // out-neighbor c of both endpoints. Materializing per-vertex
    // out-adjacency ARRAYS and intersecting per edge keeps the
    // intermediate at |E| rows (each carrying two ≤O(√m) arrays) instead
    // of shuffling the Σ outdeg² wedge expansion — at sf0.1 that is 880k
    // array intersections vs a 4·10⁷-row wedge shuffle.
    val adj = Dedup.materialize(
      oriented.groupBy("lo").agg(collect_set("hi").as("nbr")))
    val triangles = oriented
      .join(adj.select(col("lo").as("__u"), col("nbr").as("__nu")),
        col("lo") === col("__u"))
      .join(adj.select(col("lo").as("__v"), col("nbr").as("__nv")),
        col("hi") === col("__v"), "left")
      .select(when(col("__nv").isNull, lit(0))
        .otherwise(size(array_intersect(col("__nu"), col("__nv"))))
        .as("t"))
      .agg(sum("t").as("n_triangles"))

    val summary = deg.agg(
      count(lit(1)).as("n_vertices"),
      sum(expr("(deg * (deg - 1L)) div 2L")).as("n_wedges"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))

    // The cross joins combine three ONE-ROW aggregates into the summary
    // row — broadcast singletons, not a data-path cartesian product.
    // Empty-graph semantics: the integral columns coalesce to 0 (sum over
    // zero rows is NULL in SQL) and the clustering coefficient is NULL
    // exactly when the wedge count is 0 — 0/0 is undefined, and leaving
    // it to engine division-by-zero behavior would let Spark (NULL) and
    // another engine (NaN/Inf) disagree.
    summary.crossJoin(nEdges).crossJoin(triangles)
      .select(
        col("n_vertices"), col("n_edges"),
        coalesce(col("n_wedges"), lit(0L)).as("n_wedges"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("global_clustering",
        when(col("n_wedges") > 0,
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)))
  }

  /** Connected-component census of an undirected edge relation: the
   * component-size histogram `(size, n_components)` — the one-glance
   * fragmentation readout of a graph (is it one giant component, or
   * confetti?), and the link-farm scale signal next to
   * [[triangleStats]]'s clustering coefficient. Components come from the
   * star-rounds machinery ([[Dedup.dupClusters]] — O(log² n)
   * shuffle-bounded rounds); the census is two component-count-sized
   * hash-aggs on top. Only vertices incident to an edge participate (an
   * edge relation carries no isolated vertices by construction). */
  def componentCensus(edges: DataFrame): DataFrame = {
    val e = canonicalEdges(edges)
      .select(col("u").as("doc_a"), col("v").as("doc_b"))
    Dedup.dupClusters(e)
      .groupBy("cluster").agg(count(lit(1)).as("size"))
      .groupBy("size").agg(count(lit(1)).as("n_components"))
      .orderBy("size")
  }

  /** k-core extraction (Seidman 1983): the maximal subgraph in which
   * every vertex keeps degree ≥ k, by iterative peeling — drop all
   * vertices under k, recompute degrees, repeat. The link-analysis
   * density filter (spam/link-farm cores, "is this domain embedded in a
   * dense cluster or hanging off one hub?") beside
   * [[triangleStats]]' closure and [[componentCensus]]' connectivity.
   *
   * The k-core is UNIQUE and peel-order-independent, so any round count
   * at or past the fixpoint yields the same subgraph — the engine runs
   * to a WITNESSED fixpoint (edge sets only shrink, so an unchanged
   * count IS convergence — no hash needed), while the oracle unrolls a
   * fixed round budget (idempotent once converged). Per round: one
   * degree hash-agg + two semi-joins; every iterate is materialized (the
   * pagerank checkpoint posture), rounds are O(peel depth) ≤ O(max
   * degeneracy), each shuffle-bounded — nothing quadratic, nothing
   * driver-side but the scalar witness. Output: (vertex, core_deg) —
   * the k-core members with their core-internal degree (all ≥ k by
   * construction). */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    var e = Dedup.materialize(canonicalEdges(edges))
    var prev = e.count()
    var converged = prev == 0L
    var it = 0
    while (!converged && it < maxIter) {
      val keep = degrees(e).filter(col("deg") >= k).select("vertex")
      val next = Dedup.materialize(
        e.join(keep.select(col("vertex").as("u")), Seq("u"), "left_semi")
          .join(keep.select(col("vertex").as("v")), Seq("v"), "left_semi"))
      val c = next.count()
      converged = c == prev
      prev = c
      e = next
      it += 1
    }
    if (!converged)
      log.warn(s"kCore: peeling did NOT converge after $maxIter rounds")
    degrees(e).select(col("vertex"), col("deg").as("core_deg"))
  }

  /** Label-packing radix for [[labelPropagation]]'s (count, label) argmax:
   * labels (= vertex ids) occupy the low 40 bits, neighbor-label counts
   * ride above — one BIGINT `max` both engines evaluate identically
   * (the t24/winnow key trick; a struct comparator would not replay in
   * SQL). Guarded at runtime, not assumed. */
  val LabelPackRadix = 1L << 40

  /**
   * Synchronous label propagation (Raghavan, Albert & Kumara, 2007 — the
   * LPA community detector): every vertex starts labeled with its own id;
   * each iteration, every vertex adopts the most frequent label among its
   * neighbors, ties to the SMALLEST label — the deterministic synchronous
   * variant (the published async/random-order form trades determinism for
   * oscillation resistance; at `iters` fixed rounds the synchronous form
   * is exactly replayable, which is what the gate needs). Densely
   * intra-connected vertex sets converge onto one label within a couple
   * of rounds — communities, as opposed to [[componentCensus]]'s mere
   * connectivity and [[triangleStats]]'s local closure.
   *
   * Determinism: the per-vertex argmax packs `(count, label)` into one
   * BIGINT (`cnt·2⁴⁰ + (2⁴⁰−1−label)`, max = most frequent, ties to the
   * smaller label — guarded by an `assert_true` on the label range, the
   * winnow-key discipline) so a plain `max` aggregate decides it
   * identically under any partitioning AND in the oracle's unrolled CTEs.
   *
   * Scale shape per iteration: one join of the symmetrized edge relation
   * against the current labeling ON the neighbor key (degree-bounded
   * fan-out, the pagerank contrib shape), one (vertex, label)-grain
   * hash-agg, one vertex-grain argmax agg — three exchanges, nothing
   * quadratic; each iterate is materialized so lineage stays one stage
   * deep (the pagerank checkpoint posture). Output: the final labeling's
   * community census `(label, n_members)`. */
  def labelPropagation(edges: DataFrame, iters: Int = 2): DataFrame =
    labelAssignments(edges, iters)
      .groupBy("label").agg(count(lit(1)).as("n_members"))

  /** [[labelPropagation]]'s underlying (vertex, label) assignment — the
   * relation [[modularity]] scores. Same synchronous rounds, packed
   * argmax, and per-iterate materialization. */
  def labelAssignments(edges: DataFrame, iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = canonicalEdges(edges)
    val sym = Dedup.materialize(
      e.select(col("u").as("vertex"), col("v").as("nbr"))
        .unionByName(e.select(col("v").as("vertex"), col("u").as("nbr"))))
    var labels = Dedup.materialize(
      sym.select("vertex").distinct()
        .select(col("vertex"),
          when(assert_true(col("vertex") >= 0 &&
              col("vertex") < lit(LabelPackRadix),
            lit(s"labelPropagation: vertex id outside [0, $LabelPackRadix)" +
              " overflows the packed argmax key")).isNull,
            col("vertex")).as("label")))
    for (_ <- 1 to iters) {
      // fixed-iteration, no per-round driver readout → lazy checkpoint
      // (plan truncation unchanged, per-round eager job folded away)
      labels = Dedup.materializeLazy(
        sym.join(labels.withColumnRenamed("vertex", "nbr"), Seq("nbr"))
          .groupBy("vertex", "label").agg(count(lit(1)).as("cnt"))
          .groupBy("vertex")
          .agg(max(col("cnt") * lit(LabelPackRadix) +
            (lit(LabelPackRadix - 1) - col("label"))).as("k"))
          .select(col("vertex"),
            (lit(LabelPackRadix - 1) - pmod(col("k"), lit(LabelPackRadix)))
              .as("label")))
    }
    labels
  }

  /** Newman modularity of a vertex partition (Newman & Girvan, Phys.
   * Rev. E 2004), per community: Q_c = e_c/m − (d_c/2m)² — intra-edge
   * share minus the share a degree-preserving random rewiring would
   * produce. Σ_c Q_c ∈ [−1/2, 1) is THE partition-quality number for a
   * community detector: it turns [[labelPropagation]] (which always
   * outputs SOME labeling) into a measured claim, and lets two
   * labelings be compared on equal terms.
   *
   * `labels`: (vertex, label) — [[labelAssignments]] or any other
   * partition of the edge relation's vertices. Determinism: e_c, d_c,
   * and m are exact BIGINTs; Q_c is one fixed-shape double expression
   * over them, micro-quantized to `q_micro` (1e9 units) so the
   * per-community rows — and any sum over them — replay bit-for-bit.
   * Scale shape: one degree agg, one label-keyed degree-sum agg, one
   * double label join on the edge relation + equality filter + count —
   * all keyed exchanges on |E| or |V| rows; m broadcasts as a 1-row
   * scalar. Output: (label, n_members, e_intra, d_total, q_micro). */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = Dedup.materialize(canonicalEdges(edges))
    val lab = labels.select("vertex", "label")
    val m = e.agg(count(lit(1)).as("m"))
    val dTot = degrees(e)
      .join(lab, Seq("vertex"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_members"), sum("deg").as("d_total"))
    val eIntra = e
      .join(lab.select(col("vertex").as("u"), col("label").as("lu")), Seq("u"))
      .join(lab.select(col("vertex").as("v"), col("label").as("lv")), Seq("v"))
      .filter(col("lu") === col("lv"))
      .groupBy(col("lu").as("label"))
      .agg(count(lit(1)).as("e_intra"))
    dTot.join(eIntra, Seq("label"), "left")
      .crossJoin(broadcast(m))
      .select(col("label"), col("n_members"),
        coalesce(col("e_intra"), lit(0L)).as("e_intra"), col("d_total"),
        floor((coalesce(col("e_intra"), lit(0L)).cast("double") / col("m") -
          (col("d_total").cast("double") * col("d_total")) /
            ((lit(4.0) * col("m")) * col("m"))) * lit(1e9) + lit(0.5))
          .cast("long").as("q_micro"))
  }

  /** Transitive closure with BFS depths by SEMI-NAIVE evaluation (the
   * Datalog Δ-iteration, Bancilhon 1985): each round joins only the
   * FRONTIER — pairs first derived last round — against the edge
   * relation, anti-joins the accumulated closure to keep the genuinely
   * new pairs, and stops when a round derives nothing. The naive
   * alternative re-joins the ENTIRE closure every round — O(closure)
   * redundant work per iteration that semi-naive provably skips; at
   * 100 TB the frontier is the only relation that shuffles per round,
   * and it SHRINKS as the reachability saturates. The hierarchy /
   * BOM-explosion / org-chart primitive (`WITH RECURSIVE` in engines
   * that have it — the oracle replays exactly that).
   *
   * `edges`: directed (parent, child); self-loops dropped. Output:
   * (ancestor, descendant, depth) with depth = SHORTEST hop count (BFS
   * rounds guarantee minimality: a pair always appears first at its
   * shortest depth; later, longer derivations die in the anti-join).
   * Cycles are safe — a cycle's pairs saturate (including self-
   * reachability (v, v, |cycle|)) and the frontier empties; `maxIter`
   * only backstops pathological diameters, with the kCore warn-not-fail
   * contract.
   *
   * Scale shape per round: one frontier ⋈ edges equi-join (frontier-
   * sized fan-out), one distinct, one anti-join against the closure —
   * all keyed exchanges, nothing quadratic in the graph; every iterate
   * is materialized (the pagerank checkpoint posture) and the only
   * driver traffic is the scalar frontier count that witnesses the
   * fixpoint. */
  def reachability(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val e = Dedup.materialize(
      edges.select(col("parent"), col("child"))
        .filter(col("parent") =!= col("child")).distinct())
    var closure = Dedup.materialize(
      e.select(col("parent").as("ancestor"), col("child").as("descendant"),
        lit(1).as("depth")))
    var frontier = closure
    var remaining = maxIter - 1
    var done = frontier.count() == 0L
    while (!done && remaining > 0) {
      val fresh = Dedup.materialize(
        frontier.join(e, frontier("descendant") === e("parent"))
          .select(frontier("ancestor"), e("child").as("descendant"),
            (frontier("depth") + lit(1)).as("depth"))
          .distinct()
          .join(closure.select("ancestor", "descendant"),
            Seq("ancestor", "descendant"), "left_anti"))
      done = fresh.count() == 0L
      if (!done) {
        closure = Dedup.materialize(closure.unionByName(fresh))
        frontier = fresh
      }
      remaining -= 1
    }
    if (!done)
      log.warn(s"reachability: frontier non-empty after $maxIter rounds")
    closure
  }

  /** Hill maximum-likelihood tail-exponent estimate (Hill 1975; the
   * power-law-degree audit of Clauset-Shalizi-Newman): over the
   * degrees ≥ `dMin`, α̂ = 1 + n / Σ ln(d/dMin) — a scale-free graph
   * reads α ≈ 2–3, a link farm or bot ring pushes the tail heavier
   * (α ↓), an Erdős–Rényi-ish graph decays too fast for the fit to
   * mean much (α large). The one-number complement to graph0's degree
   * histogram.
   *
   * Determinism: the sum runs at DISTINCT-DEGREE grain — per degree d,
   * its ln(d/dMin) micro-quantizes once (the PSI discipline) and
   * multiplies the exact BIGINT vertex count m_d, so Σ is an exact
   * integer whatever the partitioning; α̂ is one fixed-shape double
   * over (n, S_micro). All-at-dMin tails (S = 0) yield NULL, not Inf.
   * Input is a (vertex, deg) relation ([[degreeStats]]' grain); two
   * hash-aggs, nothing corpus-sized.
   * Output 1 row: (n_tail, d_min, s_micro, alpha_micro). */
  def hillAlpha(degrees: DataFrame, dMin: Long = 2L): DataFrame = {
    require(dMin >= 1, s"dMin must be >= 1, got $dMin")
    val byDeg = degrees.filter(col("deg") >= dMin)
      .groupBy("deg").agg(count(lit(1)).as("m"))
    val agg = byDeg.agg(sum("m").as("n_tail"),
      sum(col("m") *
        floor(org.apache.spark.sql.functions.log(
          col("deg").cast("double") / lit(dMin.toDouble)) *
          lit(1e6) + lit(0.5)).cast("long")).as("s_micro"))
    agg.select(col("n_tail"), lit(dMin).as("d_min"), col("s_micro"),
      when(col("s_micro") === 0L, lit(null).cast("long"))
        .otherwise(floor((lit(1.0) + col("n_tail").cast("double") /
          (col("s_micro").cast("double") / lit(1e6))) * lit(1e6) +
          lit(0.5)).cast("long")).as("alpha_micro"))
  }

  /** Strongly connected components by mutual reachability: node u and v
   * share an SCC iff each reaches the other, so the component relation
   * is the transitive closure intersected with its own transpose — one
   * self-join of [[reachability]]'s output on swapped keys, then a
   * min-label hash-agg (component id = smallest member, the
   * [[graft.ext.Dedup.dupClusters]] keeper convention) and a
   * component-grain size join. The directed complement to the
   * undirected component census: cycles (mutual dependency, retry
   * loops, circular references) become components, DAG nodes stay
   * singletons.
   *
   * Cost is closure-bounded: Σ|reach(v)| pairs — the audit-slice grain
   * of graph8 (bounded subgraphs, lineage/dependency graphs), NOT a
   * 100-TB social graph; the closure itself runs semi-naive
   * (frontier-only joins, shrinking rounds) and inherits
   * [[reachability]]'s `maxIter` contract — a closure truncated at the
   * bound (loudly WARN-logged there) under-merges components, so size
   * `maxIter` to the graph's diameter (cycle length bounds it for the
   * gate graphs). Nodes appear iff they carry a non-self edge.
   * Output: (node, scc_id, scc_size). */
  def scc(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val e = Dedup.materialize(
      edges.select(col("parent"), col("child"))
        .filter(col("parent") =!= col("child")).distinct())
    val r = reachability(e, maxIter)
      .select(col("ancestor").as("u"), col("descendant").as("v"))
    val mutual = r.join(
      r.select(col("v").as("u"), col("u").as("v")), Seq("u", "v"))
    val nodes = e.select(col("parent").as("u"))
      .unionByName(e.select(col("child").as("u"))).distinct()
    val assign = nodes.join(mutual, Seq("u"), "left")
      .groupBy("u").agg(min("v").as("__mv"))
      .select(col("u").as("node"),
        least(coalesce(col("__mv"), col("u")), col("u")).as("scc_id"))
    val sizes = assign.groupBy("scc_id")
      .agg(count(lit(1)).as("scc_size"))
    assign.join(sizes, "scc_id")
      .select(col("node"), col("scc_id"), col("scc_size"))
  }

  /**
   * Link prediction over an undirected edge relation: for every NON-edge
   * pair with at least one common neighbor, the three classic proximity
   * scores — common-neighbor count, Adamic-Adar (Σ 1/ln deg(w) over the
   * shared neighbors w; high-degree hubs contribute least), and the
   * neighborhood Jaccard `cn / (deg u + deg v − cn)` — then the global
   * top-`topK` by Adamic-Adar (deterministic `(u, v)` tie-break).
   *
   * Candidate generation IS the wedge expansion (unlike [[triangleStats]],
   * which only scores existing edges and can intersect adjacency arrays,
   * non-edges have to be discovered through their wedge centers), so its
   * cost is Σ_w C(deg w, 2). The `maxDegree` hub guard bounds that
   * expansion to ≤ maxDegree·|E| rows: centers above the cap are skipped,
   * which is the standard approximation — a hub's per-wedge Adamic-Adar
   * weight `1/ln(deg)` is the smallest in the graph, and its wedge count
   * C(deg, 2) the largest, the worst cost/signal ratio there is. `cn` is
   * therefore a lower bound on a graph with uncapped hubs; the full
   * (uncapped) degrees still feed the Jaccard denominator.
   *
   * Determinism: Adamic-Adar is micro-quantized per CENTER
   * (`floor(1e6/ln(deg) + 0.5)`, one deterministic double op per center —
   * the t11 log-quantization pattern) so the per-pair score is an exact
   * BIGINT sum; Jaccard is round-half-up integer arithmetic, no doubles.
   */
  /**
   * Bounded-hop weighted single-source shortest paths (Bellman-Ford with
   * the frontier optimization — only vertices IMPROVED in round k relax
   * their out-edges in round k+1, the same semi-naive discipline as
   * [[reachability]]). `edges` carries `(src, dst, w)` with non-negative
   * BIGINT weights; `seeds` carries `(node)` rows that start at distance
   * 0. Returns `(node, dist, hops)` — the weight-minimal distance within
   * `maxHops` relaxation rounds and the hop count of that minimal path
   * (hops as the deterministic tie-break among equal-weight paths).
   *
   * Scale posture: each round is frontier ⋈ edges (keyed on `src`) + a
   * `(node)` min-agg + a join against the settled relation to keep only
   * strict improvements — three keyed shuffles on a frontier that SHRINKS
   * as distances settle, never the full vertex set after the early
   * rounds. Every iterate is eagerly materialized ([[Dedup.materialize]])
   * so round k+1 plans from a scan, not a k-deep lineage. Distances are
   * exact BIGINT sums — no floating point anywhere, so the result is
   * partitioning-independent and byte-replayable by a recursive-CTE
   * oracle. The loop exits early the first round no vertex improves.
   */
  def sssp(edges: DataFrame, seeds: DataFrame, maxHops: Int = 6): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = Dedup.materialize(
      edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
        .filter(col("src") =!= col("dst"))
        .groupBy("src", "dst").agg(min("w").as("w")))
    var settled = Dedup.materialize(
      seeds.select(col("node")).distinct()
        .select(col("node"), lit(0L).as("dist"), lit(0).as("hops")))
    var frontier = settled
    var round = 0
    var done = frontier.isEmpty
    while (!done && round < maxHops) {
      // candidate relaxations from the frontier, reduced to the best
      // (dist, hops) per target before comparing against settled
      val cand = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node"),
          (frontier("dist") + e("w")).as("dist"),
          (frontier("hops") + lit(1)).as("hops"))
        .groupBy("node")
        .agg(min(struct(col("dist"), col("hops"))).as("best"))
        .select(col("node"), col("best.dist").as("dist"),
          col("best.hops").as("hops"))
      val improved = Dedup.materialize(
        cand.join(settled.select(col("node"), col("dist").as("old_dist"),
            col("hops").as("old_hops")), Seq("node"), "left")
          .filter(col("old_dist").isNull || col("dist") < col("old_dist") ||
            (col("dist") === col("old_dist") && col("hops") < col("old_hops")))
          .select("node", "dist", "hops"))
      done = improved.isEmpty
      if (!done) {
        settled = Dedup.materialize(
          settled.join(improved.select("node"), Seq("node"), "left_anti")
            .unionByName(improved))
        frontier = improved
      }
      round += 1
    }
    if (!done)
      log.warn(s"sssp: frontier non-empty after $maxHops rounds — " +
        "distances are exact only for paths within the hop bound")
    settled
  }

  def linkPredictions(edges: DataFrame, maxDegree: Int = 256,
      topK: Int = 50): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must be >= 2, got $maxDegree")
    val e = Dedup.materialize(canonicalEdges(edges))
    val deg = Dedup.materialize(degrees(e))
    val sym = e.select(col("u").as("ctr"), col("v").as("nb"))
      .union(e.select(col("v").as("ctr"), col("u").as("nb")))
    // deg >= 2: a degree-1 center spans no wedge, and ln(1) = 0 would
    // poison its (unused) weight with a division by zero.
    val ctrW = sym
      .join(deg.filter(col("deg").between(2, maxDegree))
        .select(col("vertex").as("ctr"), col("deg")), "ctr")
      .withColumn("aaq",
        floor(lit(1e6) /
            org.apache.spark.sql.functions.log(col("deg").cast("double")) +
            lit(0.5))
          .cast("long"))
      .select("ctr", "nb", "aaq")
    val wedges = ctrW
      .join(ctrW.select(col("ctr"), col("nb").as("nb2")), "ctr")
      .where(col("nb") < col("nb2"))
    val cand = wedges
      .groupBy(col("nb").as("u"), col("nb2").as("v"))
      .agg(count(lit(1)).as("cn"), sum("aaq").as("aa_micro"))
      .join(e, Seq("u", "v"), "left_anti") // existing edges aren't predictions
    cand
      .join(deg.select(col("vertex").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("vertex").as("v"), col("deg").as("dv")), "v")
      .withColumn("jacc4",
        expr("(20000 * cn + (du + dv - cn)) div (2 * (du + dv - cn))"))
      .select("u", "v", "cn", "aa_micro", "jacc4")
      .orderBy(col("aa_micro").desc, col("u"), col("v"))
      .limit(topK)
  }

  /** Per-vertex LOCAL clustering coefficient — the link-farm / community
   * fingerprint at vertex grain above [[triangleStats]]'s one global
   * number: coef(v) = triangles through v / C(deg v, 2) in exact ppm
   * (`(2e6·n_tri) div (deg·(deg−1))` — n_tri ≤ C(deg, 2) keeps the
   * product tiny). A shop whose co-purchase neighbors all co-purchase
   * each other (coef → 1e6) is a bundle; a hub bridging unrelated
   * products (coef → 0) is a connector — the per-vertex split of the
   * global census.
   *
   * Same compact-forward machinery as [[triangleStats]] (degeneracy
   * orientation, per-edge adjacency-array intersection — never the
   * Σ deg² wedge shuffle), with the found triangles EXPLODED to credit
   * all three corners: one extra |triangles|-row explode + a vertex-
   * grain hash-agg on top of the census cost. Vertices with deg < 2
   * (coefficient undefined) are dropped. Output:
   * (vertex, deg, n_tri, coef_ppm). */
  def clusteringCoefficients(edges: DataFrame): DataFrame = {
    val e = Dedup.materialize(canonicalEdges(edges))
    val deg = Dedup.materialize(degrees(e))
    val du = deg.select(col("vertex").as("u"), col("deg").as("du"))
    val dv = deg.select(col("vertex").as("v"), col("deg").as("dv"))
    val oriented = Dedup.materialize(
      e.join(du, "u").join(dv, "v")
        .select(
          when(col("du") < col("dv") ||
               (col("du") === col("dv") && col("u") < col("v")),
            struct(col("u").as("lo"), col("v").as("hi")))
            .otherwise(struct(col("v").as("lo"), col("u").as("hi")))
            .as("d"))
        .select(col("d.lo").as("lo"), col("d.hi").as("hi")))
    val adj = Dedup.materialize(
      oriented.groupBy("lo").agg(collect_set("hi").as("nbr")))
    val tri = oriented
      .join(adj.select(col("lo").as("__u"), col("nbr").as("__nu")),
        col("lo") === col("__u"))
      .join(adj.select(col("lo").as("__v"), col("nbr").as("__nv")),
        col("hi") === col("__v"), "left")
      .select(col("lo"), col("hi"),
        explode(coalesce(array_intersect(col("__nu"), col("__nv")),
          array().cast("array<long>"))).as("w"))
    val credits = tri.select(col("lo").as("vertex"))
      .unionByName(tri.select(col("hi").as("vertex")))
      .unionByName(tri.select(col("w").as("vertex")))
      .groupBy("vertex").agg(count(lit(1)).as("n_tri"))
    deg.join(credits, Seq("vertex"), "left")
      .filter(col("deg") >= 2)
      .select(col("vertex"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("coef_ppm",
        expr("(2000000 * n_tri) div (deg * (deg - 1))"))
  }

  /** Degree assortativity (Newman 2002, the Pearson-of-degrees form over
   * edge endpoints): do hubs attach to hubs (r → 1, social graphs) or to
   * leaves (r → −1, hub-and-spoke / star topologies)? The one-number
   * mixing summary beside [[clusteringCoefficients]]' per-vertex view —
   * a co-purchase graph that turns disassortative is centralizing on
   * anchor products.
   *
   * Exactness: the four edge-grain moment sums (m, Σ(du+dv),
   * Σ(du²+dv²), Σ du·dv) are exact BIGINTs (overflow raises loudly
   * under ANSI — the cuped pooled-moment exposure class); r is ONE
   * fixed-shape double over them, micro-quantized half-up. A regular
   * graph (zero degree variance) yields NULL, not NaN. Over the
   * symmetric incidence list the two orientations contribute equally,
   * so summing (du+dv) per CANONICAL edge needs no doubling anywhere —
   * the oracle replays the identical shape. Two keyed joins of the
   * degree relation onto the edge list + one 1-row agg.
   * Output: (m, s1, s2, sp, assort_micro). */
  def assortativity(edges: DataFrame): DataFrame = {
    val e = Dedup.materialize(canonicalEdges(edges))
    val deg = degrees(e)
    val j = e
      .join(deg.select(col("vertex").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("vertex").as("v"), col("deg").as("dv")), "v")
    val s = j.agg(count(lit(1)).as("m"),
      sum(col("du") + col("dv")).as("s1"),
      sum(col("du") * col("du") + col("dv") * col("dv")).as("s2"),
      sum(col("du") * col("dv")).as("sp"))
    // fixed-shape double combination (the cuped discipline): μ is the
    // mean endpoint degree over the 2m incidences; the oracle writes
    // the literally identical sub-expressions
    val mD = col("m").cast("double")
    val mu = col("s1").cast("double") / (lit(2.0) * mD)
    val num = col("sp").cast("double") / mD - mu * mu
    val den = col("s2").cast("double") / (lit(2.0) * mD) - mu * mu
    s.select(col("m"), col("s1"), col("s2"), col("sp"),
      when(den === 0.0, lit(null).cast("long"))
        .otherwise(floor(num / den * lit(1e6) + lit(0.5)).cast("long"))
        .as("assort_micro"))
  }

  /** Stationary distribution of a first-order Markov chain by a FIXED
   * number of exact-integer power-iteration steps — "where does a user
   * session settle": the long-run occupancy readout over the s7
   * transition matrix, the chain-level summary above per-hop
   * probabilities (and [[pagerank]]'s structure without teleportation —
   * user behavior chains don't jump uniformly).
   *
   * Exactness (the pagerank ppm discipline, taken further — NO doubles
   * anywhere): mass is carried in integer ppm; each step distributes a
   * state's mass as `(π_i · n_ij) div n_i` per out-edge — deterministic
   * truncating division both engines replay exactly, with the
   * sub-ppm remainder (< out-degree per state per step) reported as
   * `lost_ppm` on its own row rather than silently smeared. States with
   * no outgoing transitions hold their mass (self-loop — the absorbing
   * convention). A fixed `iters` (not convergence-tested) keeps the
   * oracle an unrolled CTE chain.
   *
   * Scale shape: state-grain relations throughout (|types| rows, a few
   * dozen at most); per step one broadcast-sized join + one hash-agg.
   * Input: transition counts `(e_from, e_to, n)`. Output: one row per
   * state (state, pi_ppm) plus the `("(lost)", lost_ppm)` row — masses
   * sum to exactly 1e6 by construction. */
  def markovStationary(transitions: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 8,
      s"iters must be in [1, 8] (oracle-unroll bound), got $iters")
    // the transition relation is |states|²-bounded but its DERIVATION is
    // corpus-scale (a per-user window sort in the s16 caller) — each
    // iteration references it twice (stepped + held), so without a
    // lineage cut the plan re-runs the corpus sort ~2·iters times
    // (plan-audited: the formatted plan carried hundreds of exchanges).
    // One localCheckpoint of the tiny relation makes every iteration a
    // states-sized join tree.
    val tr = Dedup.materialize(transitions)
    val outM = tr.groupBy(col("e_from"))
      .agg(sum("n").as("n_out"))
    val p = tr.join(outM, Seq("e_from"))
    val states = tr.select(col("e_from").as("state"))
      .unionByName(tr.select(col("e_to").as("state")))
      .distinct()
    // uniform init in exact ppm; the div remainder seeds the lost row
    val ns = states.agg(count(lit(1)).as("__ns"))
    var pi = states.crossJoin(broadcast(ns))
      .select(col("state"), expr("1000000 div __ns").as("pi_ppm"))
    for (_ <- 1 to iters) {
      val stepped = pi
        .join(p, pi("state") === p("e_from"), "inner")
        .select(col("e_to").as("state"),
          expr("(pi_ppm * n) div n_out").as("pi_ppm"))
      val held = pi.join(outM, pi("state") === outM("e_from"), "left_anti")
        .select(col("state"), col("pi_ppm"))
      pi = stepped.unionByName(held)
        .groupBy("state").agg(sum("pi_ppm").as("pi_ppm"))
    }
    // every state row (zero-mass states included) + the conservation row
    val full = states.join(pi, Seq("state"), "left")
      .select(col("state"), coalesce(col("pi_ppm"), lit(0L)).as("pi_ppm"))
    val lost = full.agg((lit(1000000L) - sum("pi_ppm")).as("pi_ppm"))
      .select(lit("(lost)").as("state"), col("pi_ppm"))
    full.unionByName(lost)
  }
}
