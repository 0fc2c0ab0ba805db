package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.ext.Graph

/**
 * Graph analytics vs independent in-memory references: fixed-point PageRank
 * against a driver-side scalar replay of the same integer semantics, and
 * the degeneracy-oriented triangle count against brute-force triple
 * enumeration, both on seeded random graphs.
 */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side replay of Graph.pagerank's fixed-point semantics. */
  private def refPagerank(
      edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val e = edges.distinct
    val vs = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = vs.length.toLong
    val out = e.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    var rank = vs.map(_ -> 1000000000L).toMap
    for (_ <- 1 to iters) {
      val dm = vs.filterNot(out.contains).map(rank).sum
      val share = (85L * dm) / (100L * n)
      val contrib = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map(t => (rank(t._1) * 85L) / (100L * out(t._1))).sum
      }
      rank = vs.map(v =>
        v -> (150000000L + contrib.getOrElse(v, 0L) + share)).toMap
    }
    rank
  }

  test("pagerank matches the scalar fixed-point reference on random graphs") {
    val rnd = new Random(7)
    for (_ <- 1 to 3) {
      val nv = 30 + rnd.nextInt(40)
      val edges = (1 to 400).map(_ =>
        (s"v${rnd.nextInt(nv)}", s"v${rnd.nextInt(nv)}"))
        .filter(e => e._1 != e._2)
      val got = Graph.pagerank(edges.toDF("src", "dst"), iters = 3)
        .as[(String, Long)].collect().toMap
      assert(got == refPagerank(edges, 3))
    }
  }

  /** Driver-side replay of pagerankPersonalized's fixed-point semantics. */
  private def refPpr(edges: Seq[(String, String)], seeds: Set[String],
      iters: Int): Map[String, Long] = {
    val e = edges.distinct
    val vs = (e.map(_._1) ++ e.map(_._2)).distinct
    val inGraphSeeds = vs.filter(seeds).toSet
    val n = vs.length.toLong
    val sn = inGraphSeeds.size.toLong
    val out = e.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    var rank = vs.map(_ -> 1000000000L).toMap
    for (_ <- 1 to iters) {
      val dm = vs.filterNot(out.contains).map(rank).sum
      val base = (15L * n * 1000000000L) / (100L * sn)
      val share = (85L * dm) / (100L * sn)
      val contrib = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map(t => (rank(t._1) * 85L) / (100L * out(t._1))).sum
      }
      rank = vs.map(v => v -> ((if (inGraphSeeds(v)) base + share else 0L)
        + contrib.getOrElse(v, 0L))).toMap
    }
    rank
  }

  test("personalized pagerank matches the scalar reference; seeds outside " +
      "the graph are ignored") {
    val rnd = new Random(29)
    val nv = 40
    val edges = (1 to 300).map(_ =>
      (s"v${rnd.nextInt(nv)}", s"v${rnd.nextInt(nv)}"))
      .filter(e => e._1 != e._2)
    val seeds = Set("v1", "v2", "v3", "ghost-not-in-graph")
    val got = Graph.pagerankPersonalized(
      edges.toDF("src", "dst"),
      seeds.toSeq.toDF("vertex"), iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got == refPpr(edges, seeds, 3))
  }

  test("personalized pagerank with seeds = all vertices IS global pagerank") {
    val rnd = new Random(31)
    val edges = (1 to 200).map(_ =>
      (s"v${rnd.nextInt(25)}", s"v${rnd.nextInt(25)}"))
      .filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst")
    val allVerts = (edges.map(_._1) ++ edges.map(_._2)).distinct.toDF("vertex")
    val global = Graph.pagerank(df, iters = 3)
      .as[(String, Long)].collect().toMap
    val ppr = Graph.pagerankPersonalized(df, allVerts, iters = 3)
      .as[(String, Long)].collect().toMap
    assert(ppr == global)
  }

  test("pagerank mass is conserved up to truncation leak") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
    val ranks = Graph.pagerank(edges.toDF("src", "dst"), iters = 5)
      .as[(String, Long)].collect()
    val total = ranks.map(_._2).sum
    // 3 vertices * 1e9 units initial mass; truncation only ever leaks
    // downward, bounded by (edges + vertices) units per iteration.
    assert(total <= 3000000000L)
    assert(total > 3000000000L - 1000L)
  }

  test("triangleStats matches brute-force enumeration on random graphs") {
    val rnd = new Random(13)
    for (_ <- 1 to 3) {
      val nv = 20 + rnd.nextInt(30)
      val edges = (1 to 300).map { _ =>
        val a = rnd.nextInt(nv).toLong; val b = rnd.nextInt(nv).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val adj = edges.toSet
      val vs = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
      val triples = for {
        i <- vs.indices; j <- (i + 1) until vs.length
        k <- (j + 1) until vs.length
        if adj((vs(i), vs(j))) && adj((vs(j), vs(k))) && adj((vs(i), vs(k)))
      } yield 1
      val deg = (edges.map(_._1) ++ edges.map(_._2))
        .groupBy(identity).map(_._2.length.toLong)
      val row = Graph.triangleStats(edges.toDF("u", "v"))
        .select("n_vertices", "n_edges", "n_wedges", "n_triangles")
        .as[(Long, Long, Long, Long)].head()
      assert(row == ((vs.length.toLong, edges.length.toLong,
        deg.map(d => d * (d - 1) / 2).sum, triples.length.toLong)))
    }
  }

  test("degreeStats matches a brute-force histogram and sums to the " +
      "wedge bound") {
    val rnd = new Random(17)
    val edges = (1 to 300).map { _ =>
      val a = rnd.nextInt(40).toLong; val b = rnd.nextInt(40).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map { case (_, g) => g.length.toLong }.toSeq
    val expected = deg.groupBy(d => java.lang.Long.toBinaryString(d).length)
      .map { case (b, ds) =>
        (b, ds.length.toLong, ds.min, ds.max, ds.map(d => d * (d - 1) / 2).sum)
      }.toSet
    val got = Graph.degreeStats(edges.toDF("u", "v"))
      .as[(Int, Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.toSeq.map(_._5).sum ==
      deg.map(d => d * (d - 1) / 2).sum)
  }

  test("componentCensus matches a union-find reference on random graphs") {
    val rnd = new Random(31)
    for (trial <- 1 to 3) {
      val nv = 30 + rnd.nextInt(40)
      val edges = (1 to (20 + rnd.nextInt(60))).map { _ =>
        val a = rnd.nextInt(nv).toLong; val b = rnd.nextInt(nv).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val parent = collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
      val expected = verts.groupBy(find).map(_._2.size.toLong)
        .groupBy(identity).map { case (sz, g) => (sz, g.size.toLong) }
      val got = Graph.componentCensus(edges.toDF("u", "v"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("linkPredictions matches the brute-force scorer on random graphs") {
    val rnd = new Random(29)
    for (cap <- Seq(8, 1000)) {
      val nv = 20 + rnd.nextInt(20)
      val edges = (1 to 200).map { _ =>
        val a = rnd.nextInt(nv).toLong; val b = rnd.nextInt(nv).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val adj = edges.toSet
      val nbrs = (edges ++ edges.map(e => (e._2, e._1)))
        .groupBy(_._1).map { case (v, g) => v -> g.map(_._2).toSet }
      val deg = nbrs.map { case (v, n) => v -> n.size.toLong }
      val scores = collection.mutable.Map.empty[(Long, Long), (Long, Long)]
      for ((w, n) <- nbrs if n.size >= 2 && n.size <= cap) {
        val aaq = math.floor(1e6 / math.log(n.size.toDouble) + 0.5).toLong
        val sn = n.toSeq.sorted
        for (i <- sn.indices; j <- (i + 1) until sn.length) {
          val k = (sn(i), sn(j))
          val (c, a) = scores.getOrElse(k, (0L, 0L))
          scores(k) = (c + 1, a + aaq)
        }
      }
      val expected = scores.toSeq.collect {
        case ((u, v), (cn, aa)) if !adj((u, v)) =>
          val un = deg(u) + deg(v) - cn
          (u, v, cn, aa, (20000 * cn + un) / (2 * un))
      }.sortBy { case (u, v, _, aa, _) => (-aa, u, v) }
      val got = Graph.linkPredictions(edges.toDF("u", "v"),
          maxDegree = cap, topK = 100000)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      assert(got == expected, s"cap=$cap")
    }
  }

  test("triangleStats canonicalizes reversed duplicates and self-loops") {
    val clean = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val dirty = clean ++ Seq((2L, 1L), (3L, 1L), (5L, 5L))
    val a = Graph.triangleStats(clean.toDF("u", "v")).collect().toSeq
    val b = Graph.triangleStats(dirty.toDF("u", "v")).collect().toSeq
    assert(a == b)
  }

  test("triangleStats on a triangle-free bipartite graph") {
    val edges = for (a <- 0L to 4L; b <- 10L to 13L) yield (a, b)
    val row = Graph.triangleStats(edges.toDF("u", "v"))
      .select("n_triangles").as[Long].head()
    assert(row == 0L)
  }

  test("kCore matches an iterative-peel reference on random graphs; " +
    "cores nest") {
    val rnd = new Random(57)
    for (trial <- 1 to 3) {
      val nv = 25 + rnd.nextInt(30)
      val edges = (1 to (60 + rnd.nextInt(120))).map { _ =>
        val a = rnd.nextInt(nv).toLong; val b = rnd.nextInt(nv).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      def peel(k: Int): Map[Long, Long] = {
        var e = edges
        var changed = true
        while (changed) {
          val deg = (e.map(_._1) ++ e.map(_._2))
            .groupBy(identity).map { case (v, g) => v -> g.size }
          val keep = deg.filter(_._2 >= k).keySet
          val e2 = e.filter(p => keep(p._1) && keep(p._2))
          changed = e2.size != e.size
          e = e2
        }
        (e.map(_._1) ++ e.map(_._2)).groupBy(identity)
          .map { case (v, g) => v -> g.size.toLong }
      }
      for (k <- Seq(2, 3)) {
        val got = Graph.kCore(edges.toDF("u", "v"), k)
          .as[(Long, Long)].collect().toMap
        assert(got == peel(k), s"trial $trial k=$k")
      }
      // nesting: the (k+1)-core is a subgraph of the k-core
      assert(peel(3).keySet.subsetOf(peel(2).keySet), s"trial $trial")
    }
  }

  test("kCore is partition-independent and empty below the peel floor") {
    val e = (0L to 5L).combinations(2).map(p => (p(0), p(1))).toSeq
      .toDF("u", "v") // K6: every vertex degree 5
    val a = Graph.kCore(e, 5).orderBy("vertex").collect().toSeq
    val b = Graph.kCore(e.repartition(7), 5).orderBy("vertex")
      .collect().toSeq
    assert(a == b && a.size == 6, "K6 is its own 5-core")
    assert(Graph.kCore(e, 6).count() == 0L, "no 6-core in K6")
  }

  test("reachability: exact closure with BFS depths on a branching chain") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L))
      .toDF("parent", "child")
    val got = Graph.reachability(e)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set(
      (1L, 2L, 1), (2L, 3L, 1), (3L, 4L, 1), (1L, 5L, 1),
      (1L, 3L, 2), (2L, 4L, 2), (1L, 4L, 3)))
  }

  test("reachability: diamond DAG keeps one pair at the SHORTEST depth") {
    import spark.implicits._
    // 1→2→4 and 1→3→4 (two depth-2 paths) plus a direct 1→4 edge: the
    // pair (1,4) must surface once at depth 1, the BFS-minimal, and the
    // longer derivations must die in the anti-join.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (1L, 4L))
      .toDF("parent", "child")
    val got = Graph.reachability(e)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got((1L, 4L)) == 1, s"shortest depth must win: $got")
    assert(got.count(_._1._1 == 1L) == 3, "ancestor 1 reaches {2,3,4} once each")
  }

  test("reachability: cycles saturate and terminate (self-reachability)") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("parent", "child")
    val got = Graph.reachability(e)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got.size == 9, s"3-cycle closure is all 9 ordered pairs: $got")
    assert(got((1L, 1L)) == 3 && got((1L, 3L)) == 2,
      s"cycle depths must be walk lengths: $got")
  }

  test("HITS: better-connected hub and authority dominate; roles zero out") {
    import spark.implicits._
    // h1 points at both authorities, h2 at one; a1 is cited by both hubs,
    // a2 by one. After any number of rounds h1 > h2 and a1 > a2; pure
    // hubs carry authority 0 and pure authorities hub 0.
    val e = Seq(("h1", "a1"), ("h1", "a2"), ("h2", "a1"))
      .toDF("src", "dst")
    val r = Graph.hits(e, iters = 2)
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2)))
      .toMap
    assert(r("h1")._1 > r("h2")._1, s"two-authority hub must lead: $r")
    assert(r("a1")._2 > r("a2")._2, s"two-hub authority must lead: $r")
    assert(r("h1")._2 == 0L && r("a1")._1 == 0L,
      s"pure roles must zero the other score: $r")
    // rescale divides by (max div unit), so the max lands in [unit, 2·unit)
    assert(r("h1")._1 >= 1000000L && r("h1")._1 < 2000000L &&
      r("a1")._2 >= 1000000L && r("a1")._2 < 2000000L,
      s"L-inf rescale keeps the max of each role within [unit, 2*unit): $r")
  }

  test("HITS is partition-independent") {
    import spark.implicits._
    val rnd = new Random(7)
    val e = (0 until 60).map(_ =>
      (s"u${rnd.nextInt(10)}", s"v${rnd.nextInt(10)}")).distinct
      .toDF("src", "dst")
    val a = Graph.hits(e, iters = 3).orderBy("vertex").collect().toSeq
    val b = Graph.hits(e.repartition(7), iters = 3).orderBy("vertex")
      .collect().toSeq
    assert(a == b)
  }

  test("modularity: two clean cliques score exactly 0.5; one blob scores 0") {
    import spark.implicits._
    // Two disjoint K4s: m = 12, per community e_c = 6, d_c = 12 →
    // Q_c = 6/12 − (12/24)² = 0.25 each, ΣQ = 0.5 exactly.
    def k4(off: Long) = (off until off + 4).toSeq.combinations(2)
      .map(p => (p(0), p(1))).toSeq
    val e = (k4(0) ++ k4(10)).toDF("u", "v")
    val labels = (0L until 4L).map(v => (v, 0L))
      .++((10L until 14L).map(v => (v, 1L))).toDF("vertex", "label")
    val rows = Graph.modularity(e, labels).collect()
    assert(rows.map(_.getLong(4)).sum == 500000000L,
      s"two-clique partition must score Q = 0.5: ${rows.toSeq}")
    val one = Graph.modularity(e, labels.withColumn("label", lit(7L)))
      .collect()
    assert(one.length == 1 && one(0).getLong(4) == 0L,
      s"the all-in-one partition must score Q = 0: ${one.toSeq}")
  }

  test("modularity: LP labels on two bridged cliques recover the split") {
    import spark.implicits._
    def k4(off: Long) = (off until off + 4).toSeq.combinations(2)
      .map(p => (p(0), p(1))).toSeq
    val e = (k4(0) ++ k4(10) :+ (3L, 10L)).toDF("u", "v")
    val q = Graph.modularity(e, Graph.labelAssignments(e, iters = 2))
      .collect()
    assert(q.length == 2, s"LP must find the two communities: ${q.toSeq}")
    assert(q.map(_.getLong(4)).sum > 300000000L,
      s"bridged-clique Q must stay high: ${q.toSeq}")
    val q2 = Graph.modularity(e.repartition(7),
      Graph.labelAssignments(e.repartition(5), iters = 2))
      .orderBy("label").collect().toSeq
    assert(q2 == q.sortBy(_.getLong(0)).toSeq, "partition-independent")
  }

  test("TextRank shape: a hub word outranks peripheral words") {
    import spark.implicits._
    // Star-shaped co-occurrence: "core" is adjacent to every satellite,
    // satellites only to core. PageRank over the symmetrized word graph
    // must put the hub first — the TextRank keyword contract.
    val bg = (0 until 8).map(i => ("core", s"sat$i"))
    val edges = (bg ++ bg.map(_.swap)).toDF("src", "dst")
    val top = Graph.pagerank(edges, iters = 3)
      .orderBy(desc("rank"), asc("vertex")).limit(1)
      .collect()(0).getString(0)
    assert(top == "core", s"hub word must rank first, got $top")
  }

  test("itemSimilarity: perfect co-occurrence scores 1e6; popularity " +
      "normalization demotes the ubiquitous item; cap binds pairs only") {
    import spark.implicits._
    // items 1,2 always together (4 baskets); item 9 in EVERY basket
    // (degree 8). Raw co-count ties (1,9) with (1,2) at 4, but cosine
    // divides by sqrt(deg): sim(1,2) = 4/sqrt(16) = 1.0 while
    // sim(1,9) = 4/sqrt(4*8) ~ 0.707 — the popularity correction that
    // raw co-purchase counts miss.
    val baskets = (0L until 4L).flatMap(b =>
      Seq((b, 1L), (b, 2L), (b, 9L))) ++
      (4L until 8L).flatMap(b => Seq((b, 3L + b % 2), (b, 9L)))
    val out = Graph.itemSimilarity(baskets.toDF("basket", "item"),
        maxBasket = 64, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5))
      .toMap
    assert(out((1L, 2L)) == 1000000L, s"always-together = exactly 1: $out")
    assert(out((1L, 9L)) == 707107L, s"popularity-demoted: $out")
    // a mega-basket above the cap adds NO pairs but still counts in
    // the marginals: adding one 70-item basket containing 1 must not
    // create new pairs for its exclusive items
    val mega = (0L until 70L).map(i => (99L, 100L + i)) :+ ((99L, 1L))
    val capped = Graph.itemSimilarity(
      (baskets ++ mega).toDF("basket", "item"), maxBasket = 64, topK = 100)
      .collect()
    assert(!capped.exists(r => r.getLong(0) >= 100L),
      "over-cap basket items must not pair")
    val s12 = capped.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    assert(s12.getLong(3) == 5L,
      s"marginals stay uncapped (item 1 now in 5 baskets): $s12")
  }

  test("purchase edges are distinct and prefixed; co-purchase canonical") {
    val orders = Tables.ordersLike(spark)
    val lineitem = Tables.lineitemLike(spark)
    val pe = Graph.purchaseEdges(orders, lineitem)
    assert(pe.count() == pe.distinct().count())
    assert(pe.filter(!col("src").startsWith("c") ||
      !col("dst").startsWith("s")).isEmpty)
    val ce = Graph.coPurchaseEdges(lineitem)
    assert(ce.filter(col("u") >= col("v")).isEmpty)
    assert(ce.count() == ce.distinct().count())
  }

  test("itemNeighbors + recHitRate: per-item lists, hits, disjoint eval") {
    // train: items 1,2 co-occur twice; 1,3 once -> 1's neighbors are
    // [2 (sim high), 3]; 2's are [1, 3? no -> only 1]; via basket b3
    // 1,3 co-occur
    val train = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L)).toDF("basket", "item")
    val nb = Graph.itemNeighbors(train, maxBasket = 64, kPerItem = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1))
      .toMap
    assert(nb((1L, 1)) == 2L, "1's top neighbor is 2 (2 shared baskets)")
    assert(nb((1L, 2)) == 3L)
    assert(nb((2L, 1)) == 1L)
    assert(nb((3L, 1)) == 1L)
    // test: basket {1, 2} -> seed 1, rest {2} in 1's list -> hit;
    // basket {2, 3} -> seed 2, rest {3} NOT in 2's list -> miss;
    // singleton basket {1} excluded from the denominator
    val test = Seq((20L, 1L), (20L, 2L), (21L, 2L), (21L, 3L),
      (22L, 1L)).toDF("basket", "item")
    val r = Graph.recHitRate(
      Graph.itemNeighbors(train, maxBasket = 64, kPerItem = 1), test)
      .collect().head
    assert(r.toSeq == Seq(2L, 1L, 500000L), s"got ${r.toSeq}")
  }

  test("hillAlpha: planted tail, dMin filter, flat-tail NULL") {
    // degrees: four vertices at d=2 (= dMin, ln 1 = 0 mass), one at
    // d=4: S = ln 2 -> alpha = 1 + 5/ln2 ~ 8.2135
    val deg = (Seq.fill(4)(2L) :+ 4L).zipWithIndex
      .map { case (d, i) => (i.toLong, d) }.toDF("vertex", "deg")
    val r = Graph.hillAlpha(deg, dMin = 2L).collect().head
    assert(r.getLong(0) == 5L)
    assert(r.getLong(2) == 693147L)
    val a = r.getLong(3)
    assert(a > 8213000L && a < 8214000L, s"alpha was $a")
    // d=1 vertices sit below dMin and must not enter the tail
    val withLow = deg.unionByName(Seq((99L, 1L)).toDF("vertex", "deg"))
    assert(Graph.hillAlpha(withLow, 2L).collect().head.getLong(0) == 5L)
    // a tail entirely at dMin: S = 0 -> NULL, never Inf
    val flat = Seq((1L, 2L), (2L, 2L)).toDF("vertex", "deg")
    assert(Graph.hillAlpha(flat, 2L).collect().head.get(3) == null)
  }

  test("scc: cycles form components, DAG tails stay singletons") {
    // 3-cycle 1→2→3→1, tail 4→1 (reaches the cycle, never returns),
    // 2-cycle 5↔6 bridged one-way from the 3-cycle (3→5), chain 7→8
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (5L, 6L),
      (6L, 5L), (3L, 5L), (7L, 8L)).toDF("parent", "child")
    val out = Graph.scc(e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for (i <- 1L to 3L) assert(out(i) == ((1L, 3L)), s"$i: ${out(i)}")
    assert(out(4L) == ((4L, 1L)), "a tail into a cycle is NOT in it")
    assert(out(5L) == ((5L, 2L)) && out(6L) == ((5L, 2L)))
    assert(out(7L) == ((7L, 1L)) && out(8L) == ((8L, 1L)))
    // self-loops alone create no component and no node
    val selfOnly = Seq((9L, 9L)).toDF("parent", "child")
    assert(Graph.scc(selfOnly).isEmpty)
    // partition independence
    val out2 = Graph.scc(e.repartition(7)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out2 == out)
  }

  private object Tables {
    def ordersLike(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(s"$Sf/orders.parquet")
    def lineitemLike(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(s"$Sf/lineitem.parquet")
  }
}
