package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Behavior locks for the round-8 additions: PCA power iteration,
 * 2-D skyline, EWMA anomaly, label propagation. Their VALUES are
 * oracle-gated (e11/e12, sp23, x8, graph6); these pin the semantics the
 * oracles can't express — qualitative contracts and partition
 * independence. */
class Round8Spec extends SparkTestBase {
  import spark.implicits._

  test("pcaPower recovers a planted dominant direction") {
    // corpus concentrated along axis 2 of 8 dims (plus small fixed noise
    // on axis 5): the principal direction must put its max weight there
    val vecs = (0 until 40).map { i =>
      val sign = if (i % 2 == 0) 1f else -1f
      val e = Array.fill(8)(0f)
      e(2) = sign * 1f
      e(5) = 0.05f * (i % 3)
      (i.toLong, e)
    }.toDF("vec_id", "embedding")
    val v = Spectral.pcaPowerDirection(vecs, dim = 8)
    val top = v.map(math.abs).zipWithIndex.maxBy(_._1)._2
    assert(top == 2, s"dominant axis must be 2, got ${v.toSeq}")
    assert(v.map(math.abs).max == 1000000L, "renormalized to max|v| = 1e6")
  }

  test("pcaPower and pcaProject are partition-independent") {
    val vecs = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val a = Spectral.pcaPowerDirection(vecs).toSeq
    val b = Spectral.pcaPowerDirection(vecs.repartition(13)).toSeq
    assert(a == b, "identical integer trajectory under any partitioning")
    val pa = Spectral.pcaProject(vecs).orderBy("vec_id").collect().toSeq
    val pb = Spectral.pcaProject(vecs.repartition(7)).orderBy("vec_id")
      .collect().toSeq
    assert(pa == pb)
  }

  test("skyline2d equals the brute dominance definition; duplicate " +
    "frontier points all survive") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.tabulate(200)(i =>
      (i.toLong, rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)) :+
      (990L, 29L, 29L) :+ (991L, 29L, 29L) // duplicate frontier point
    val df = pts.toDF("id", "x", "y")
    val expected = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, ox, oy) =>
        ox >= x && oy >= y && (ox > x || oy > y) }
    }.map(_._1).toSet
    val got = Selection.skyline2d(df, "id", "x", "y")
      .select("id").as[Long].collect().toSet
    assert(got == expected)
    assert(got.contains(990L) && got.contains(991L),
      "equal frontier points do not dominate each other")
  }

  test("ewmaAnomaly: dyadic weights, warmup suppression, spike fires on " +
    "a surge only") {
    // flat series of 4s, one 100-surge late, one early outlier inside the
    // warmup window (must NOT flag)
    val rows = (0 until 30).map { i =>
      val v = if (i == 5) 100L else if (i == 25) 100L else 4L
      ("k", i.toLong, v)
    }.toDF("grp", "ord", "n")
    val out = TimeSeries.ewmaAnomaly(rows, "grp", "ord", "n")
      .collect().map(r => r.getLong(1) -> (r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(!out(5L)._2, "warmup rows never flag")
    assert(out(25L)._2, "the late surge must flag")
    assert(out.filterKeys(k => k != 25L).forall(!_._2._2),
      s"only the surge flags: ${out.filter(_._2._2)}")
    // steady state: EWMA of a constant-4 series converges to 4 exactly
    // (dyadic sums: 4·(1/2 + ... + 1/2^13) = 4 − 2^-11·4... near 4)
    assert(math.abs(out(24L)._1 - 4.0) < 0.01, out(24L)._1.toString)
  }

  test("ewmaAnomaly is partition-independent") {
    val rows = (0 until 40).map(i =>
      (s"g${i % 3}", i.toLong / 3, (i % 7).toLong)).toDF("grp", "ord", "n")
      .groupBy("grp", "ord").agg(max("n").as("n"))
    val a = TimeSeries.ewmaAnomaly(rows, "grp", "ord", "n")
      .orderBy("grp", "ord").collect().toSeq
    val b = TimeSeries.ewmaAnomaly(rows.repartition(5), "grp", "ord", "n")
      .orderBy("grp", "ord").collect().toSeq
    assert(a == b)
  }

  test("labelPropagation: two dense cliques joined by one bridge edge " +
    "converge to two communities") {
    // cliques {1..4} and {10..13}, bridge 4-10: after 2 synchronous
    // rounds each clique coalesces onto its minimum label; the census is
    // two 4-communities (connected components would report ONE of 8)
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ ((4L, 10L)))
      .toDF("u", "v")
    val census = Graph.labelPropagation(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(census.values.sum == 8L, s"all vertices labeled: $census")
    assert(census.size == 2, s"two communities, got $census")
    // sanity vs components: the same graph is ONE connected component
    val cc = Graph.componentCensus(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(8L -> 1L))
  }

  test("CMS never underestimates; exact in the no-collision regime; " +
    "counters merge by (r, b) sum") {
    val toks = (0 until 300).map(i => Tuple1(s"tok${i % 17}")).toDF("tok")
    val counters = Sketches.cmsCounters(toks, "tok")
    assert(counters.count() <= Sketches.CmsDepth.toLong * Sketches.CmsWidth)
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("n"))
    val est = Sketches.cmsEstimate(counters, exact.select("tok"), "tok")
      .join(exact, Seq("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.forall { case (_, cms, n) => cms >= n },
      s"CMS must never underestimate: ${est.filter(e => e._2 < e._3).toSeq}")
    // 17 distinct keys into 1024 buckets × 4 rows: the min row is
    // collision-free here, so estimates are exact
    assert(est.forall { case (_, cms, n) => cms == n }, est.toSeq.toString)
    // mergeability: counters of two halves summed == counters of the whole
    val h1 = Sketches.cmsCounters(toks.limit(150), "tok")
    val h2 = Sketches.cmsCounters(toks.exceptAll(toks.limit(150)), "tok")
    val merged = h1.unionByName(h2).groupBy("r", "b")
      .agg(org.apache.spark.sql.functions.sum("c").as("c"))
      .orderBy("r", "b").collect().toSeq
    assert(merged == counters.orderBy("r", "b").collect().toSeq)
  }

  test("Bloom pre-filter: no false negatives, bit image bounded by the " +
    "bit space") {
    val ref = (0 until 200).map(i => Tuple1(s"ref$i")).toDF("k")
    val bits = Sketches.bloomBits(ref, "k")
    assert(bits.count() <= Sketches.BloomBits.toLong)
    // every reference key itself passes (no false negatives by
    // construction); disjoint keys mostly don't (FP rate small at this
    // density: 600 bits of 32768)
    val docKeys = ((0 until 200).map(i => (1L, s"ref$i")) ++
      (0 until 200).map(i => (2L, s"other$i"))).toDF("doc_id", "k")
    val hits = Sketches.bloomPrefilterHits(docKeys, bits, "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits(1L) == 200L, s"all reference keys must pass: $hits")
    assert(hits.getOrElse(2L, 0L) < 20L,
      s"disjoint keys should rarely pass at this density: $hits")
  }

  test("knnOutliers: a planted isolated vector ranks as the top outlier") {
    val rnd = new scala.util.Random(7)
    // a tight cluster near axis 0 ... and one vector on axis 3, alone
    val vecs = ((0 until 30).map { i =>
      val e = Array.tabulate(4)(j =>
        if (j == 0) 1f else rnd.nextFloat() * 0.1f)
      (i.toLong, e)
    } :+ (99L, Array(0f, 0f, 0f, 1f))).toDF("vec_id", "embedding")
    val out = Similarity.knnOutliers(vecs, k = 3, topN = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.head._1 == 99L,
      s"the isolated vector must be the top outlier, got ${out.toSeq}")
    assert(out.map(_._2).sliding(2).forall { case Array(a, b) => a <= b },
      "outliers come lowest-kth-sim first")
  }

  test("zonemapPruneAudit: clustering on the predicate column collapses " +
    "files_hit; row-scrambled layout scans everything") {
    // scr is a pseudo-random row permutation key (37 coprime to 4001), so
    // ordering by it scatters `a` uniformly across every file
    val df = (0 until 4000).map { i =>
      (i.toLong, (i % 64).toLong, ((i * 37L) % 4001).toLong)
    }.toDF("id", "a", "scr")
    val out = Profile.zonemapPruneAudit(df,
      Seq("by_a" -> Seq(col("a"), col("id")),
        "by_scr" -> Seq(col("scr"), col("id"))),
      fileRows = 500, preds = Seq(("a", 10L, 11L)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out("by_a")._1 == 8L && out("by_scr")._1 == 8L)
    assert(out("by_a")._2 <= 2L,
      s"a-clustered layout must prune to the predicate's files: $out")
    assert(out("by_scr")._2 == 8L,
      s"scrambled layout cannot skip anything: $out")
  }

  test("standardize: per-dimension mean ~0 and std ~1 under dimStats " +
    "parameters") {
    val vecs = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val stats = Spectral.dimStats(vecs).orderBy("pos")
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    val z = Spectral.standardize(vecs, stats)
      .select(posexplode(col("z")).as(Seq("pos", "z")))
      .groupBy("pos")
      .agg(avg("z").as("m"), stddev_pop(col("z")).as("sd"))
      .collect()
    assert(z.forall(r => math.abs(r.getDouble(1)) < 0.01),
      "standardized mean must be ~0 per dim")
    assert(z.forall(r => math.abs(r.getDouble(2) - 1.0) < 0.01),
      "standardized std must be ~1 per dim")
  }

  test("labelPropagation is partition-independent") {
    val rnd = new scala.util.Random(3)
    val edges = Seq.tabulate(120)(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).toDF("u", "v")
    val a = Graph.labelPropagation(edges, iters = 2)
      .orderBy("label").collect().toSeq
    val b = Graph.labelPropagation(edges.repartition(7), iters = 2)
      .orderBy("label").collect().toSeq
    assert(a == b)
  }

  // ─────────────────────── PPJoin (d31/d32) ─────────────────────────

  /** Brute-force reference: every pair with set-Jaccard ≥ t, computed
   * in plain Scala from the (doc_id, sh) relation — fully independent
   * of the prefix machinery under test. */
  private def bruteJaccardPairs(sets: Seq[(Long, String)], t: Double)
      : Set[(Long, Long, Double)] = {
    val byDoc = sets.groupBy(_._1).map { case (d, xs) =>
      d -> xs.map(_._2).toSet }
    val ids = byDoc.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      a = byDoc(ids(i)); b = byDoc(ids(j))
      inter = (a & b).size
      jac = BigDecimal(inter.toDouble / (a.size + b.size - inter))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jac >= t
    } yield (ids(i), ids(j), jac)).toSet
  }

  test("ppjoinPairs (shingle grain) equals brute-force Jaccard on the " +
    "real corpus at two thresholds") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    for (t <- Seq(0.5, 0.35)) {
      val sh = Dedup.shinglesN(docs, 3).localCheckpoint()
      val brute = Dedup.jaccard(
          Dedup.rareShingleCandidates(sh, maxDf = Int.MaxValue), sh)
        .filter(col("jac") >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val got = Dedup.ppjoinPairs(docs, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got == brute,
        s"t=$t: missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
      assert(got.nonEmpty, s"t=$t must find the corpus near-dups")
    }
  }

  test("ppjoinPairsFromSets equals brute force on random word sets, " +
    "including exact-boundary pairs") {
    val rnd = new scala.util.Random(17)
    val vocab = (0 until 40).map(i => f"w$i%02d")
    val random = (0L until 60L).flatMap { d =>
      rnd.shuffle(vocab).take(3 + rnd.nextInt(12)).map(w => (d, w))
    }
    // planted boundary pair at jac exactly 0.5: {a,b,c} vs {b,c,d}
    val planted = Seq((100L, "a"), (100L, "b"), (100L, "c"),
      (101L, "b"), (101L, "c"), (101L, "d"),
      (102L, "c"), (102L, "x"), (102L, "y"), (102L, "z"), (102L, "q"))
    val rows = random ++ planted
    val sets = rows.toDF("doc_id", "sh").localCheckpoint()
    val brute = bruteJaccardPairs(rows, 0.5)
    val got = Dedup.ppjoinPairsFromSets(sets, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    assert(got.contains((100L, 101L, 0.5)),
      "the exact-boundary jac=0.5 pair must survive the prefix bounds")
    assert(!got.exists(p => p._1 == 102L || p._2 == 102L))
  }

  test("ppjoin maxBlock cap only removes pairs (subset), never corrupts") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val all = Dedup.ppjoinPairs(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.ppjoinPairs(docs, 0.5, maxBlock = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(all))
  }

  test("ppjoinPairs is partition-independent") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val a = Dedup.ppjoinPairs(docs, 0.5)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val b = Dedup.ppjoinPairs(docs.repartition(13), 0.5)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(a == b)
  }

  test("ppjoinStats profiles the prefix index the join would pay") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val r = Dedup.ppjoinStats(docs, 0.5, maxBlock = 100).collect()(0)
    assert(r.getLong(0) > 0, "prefix index must have blocks")
    assert(r.getLong(1) >= 1, "max block at least 1")
    assert(r.getLong(2) >= r.getLong(4),
      "uncapped candidate cost >= capped cost")
  }

  // ──────────────── Sorted-neighborhood (d33) ───────────────────────

  /** Brute SNM candidate set: sort in plain Scala (ASCII inputs, so
   * String order == the engine's binary UTF-8 order), window pairs —
   * independent of the globalOrder/explode/join machinery under test. */
  private def snmBrute(rows: Seq[(Long, String)],
      keys: Seq[String => String], w: Int): Set[(Long, Long)] =
    keys.flatMap { k =>
      val sorted = rows.sortBy { case (id, nm) => (k(nm), id) }
      for {
        i <- sorted.indices
        j <- (i + 1) until math.min(i + w, sorted.size)
      } yield (math.min(sorted(i)._1, sorted(j)._1),
        math.max(sorted(i)._1, sorted(j)._1))
    }.toSet

  test("sortedNeighborPairs candidate topology equals brute 2-pass SNM " +
    "on the real customer relation") {
    val cust = spark.read.parquet(s"$Sf/customer.parquet")
      .filter(col("c_custkey") <= 300)
    val rows = cust.select("c_custkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val brute = snmBrute(rows,
      Seq(identity[String], (s: String) => s.reverse), w = 5)
    // customer names all share the "Customer#" head, so every candidate
    // has jw far above the tiny floor: the filter keeps the whole set
    // and the comparison pins pure adjacency logic
    val got = Dedup.sortedNeighborPairs(cust, "c_custkey", "c_name",
        Seq(col("c_name"), reverse(col("c_name"))),
        window = 5, minSim = 0.0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    assert(got.size <= 2 * rows.size * 4, "n*(w-1) per pass bound")
  }

  test("a head-edited pair escapes the name-order pass but is caught " +
    "by the reversed-name pass") {
    val rows = Seq((1L, "abcdef9"), (2L, "zbcdef9")) ++
      (3L to 14L).map(i => (i, s"${('b' + i).toChar}x${i}000"))
    val df = rows.toDF("id", "nm")
    val onePass = Dedup.sortedNeighborPairs(df, "id", "nm",
        Seq(col("nm")), window = 2, minSim = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!onePass.contains((1L, 2L)),
      "w=2 single name-order pass must miss the head-edited pair")
    val twoPass = Dedup.sortedNeighborPairs(df, "id", "nm",
        Seq(col("nm"), reverse(col("nm"))), window = 2, minSim = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(twoPass.contains((1L, 2L)),
      "the reversed-name pass sorts 9fedcba|9fedcbz adjacent")
  }

  test("sortedNeighborPairs is partition-independent and threshold-" +
    "monotone") {
    val cust = spark.read.parquet(s"$Sf/customer.parquet")
      .filter(col("c_custkey") <= 300)
    def run(d: org.apache.spark.sql.DataFrame, t: Double) =
      Dedup.sortedNeighborPairs(d, "c_custkey", "c_name",
          Seq(col("c_name"), reverse(col("c_name"))), window = 4,
          minSim = t)
        .orderBy("id_a", "id_b").collect().toSeq
    assert(run(cust, 0.9) == run(cust.repartition(11), 0.9))
    val strict = run(cust, 0.99).map(r => (r.getLong(0), r.getLong(1)))
    val loose = run(cust, 0.9).map(r => (r.getLong(0), r.getLong(1)))
    assert(strict.toSet.subsetOf(loose.toSet))
  }

  // ──────────────── Weighted sampling (sp25) ────────────────────────

  test("weightedSample is deterministic, partition-independent, and " +
    "without replacement") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "n_chars")
    val a = Sampling.weightedSample(docs, "doc_id", "n_chars", 40)
      .collect().map(_.getLong(0)).toSeq
    val b = Sampling.weightedSample(docs.repartition(13), "doc_id",
        "n_chars", 40)
      .collect().map(_.getLong(0)).toSeq
    assert(a.sorted == b.sorted,
      "A-ES top-k must not depend on partitioning")
    assert(a.distinct.size == 40, "without replacement: 40 distinct ids")
  }

  test("weightedSample: overwhelming weight always selected; " +
    "non-positive weights never") {
    val rows = (1L to 200L).map(i => (i, 10L)) ++
      Seq((999L, 1000000000000L), (998L, 0L), (997L, -5L))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", 5)
      .collect().map(_.getLong(0)).toSet
    assert(got.contains(999L),
      "a weight 10^11x the rest has arrival ~0: always in the sample")
    assert(!got.contains(998L) && !got.contains(997L),
      "zero/negative weights have no inclusion probability")
    assert(got.size == 5)
  }

  // ──────────────── Hilbert curve key (z3/z4) ───────────────────────

  /** The classic scalar top-down Hilbert d-index — the independent
   * reference for the engine's aggregate-fold expression. */
  private def hilbertRef(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbertKey matches the scalar reference, is a bijection, and " +
    "steps one grid cell at a time") {
    val bits = 5
    val n = 1 << bits
    val pts = for { x <- 0 until n; y <- 0 until n }
      yield (x.toLong, y.toLong)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.sources.WriteLayout.hilbertKey(col("x"), col("y"), bits)
          .as("d"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == hilbertRef(bits, x, y),
        s"($x, $y): got ${got((x, y))}, want ${hilbertRef(bits, x, y)}") }
    assert(got.values.toSet == (0L until n.toLong * n).toSet,
      "the curve visits every cell exactly once")
    val byD = got.toSeq.map { case ((x, y), d) => (d, (x, y)) }
      .sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"consecutive keys must be grid neighbors: ($x1,$y1)->($x2,$y2)")
    case _ => ()
    }
  }

  // ──────────────── File-grain Bloom skipping (z6) ──────────────────

  test("fileBloomPruneAudit: pass set covers the true hits and prunes; " +
    "a key-clustered layout concentrates the key into ~one file") {
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    val scattered = graft.ext.Profile.fileBloomPruneAudit(li,
      Seq(col("l_orderkey"), col("l_linenumber")), 500,
      "l_partkey", "17").head()
    assert(scattered.getLong(1) >= scattered.getLong(2),
      "Bloom never false-negatives")
    assert(scattered.getLong(2) >= 1, "probe key must exist in fixture")
    assert(scattered.getLong(1) < scattered.getLong(0),
      "the index must prune files zones cannot")
    val clustered = graft.ext.Profile.fileBloomPruneAudit(li,
      Seq(col("l_partkey"), col("l_orderkey"), col("l_linenumber")), 500,
      "l_partkey", "17").head()
    assert(clustered.getLong(2) <= 2,
      "a partkey-sorted layout holds the key in ~one file")
    assert(clustered.getLong(1) >= clustered.getLong(2))
  }

  // ──────────────── Apriori 2-itemsets (t35) ────────────────────────

  test("itemsetPairs matches a brute co-occurrence count and prunes " +
    "below-support pairs") {
    // docs: {x y}, {x y z}, {x z}, {y q}, {x y} -> sup(x)=4 sup(y)=4
    // sup(z)=2 sup(q)=1; pairs: xy=3, xz=2, yz=1, yq=1
    val docs = Seq(
      (1L, "x y"), (2L, "x y z"), (3L, "x z"), (4L, "y q"),
      (5L, "y x"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.itemsetPairs(docs, minSup = 2, k = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == Set(("x", "y"), ("x", "z")),
      s"yz and yq are below support 2: ${got.keySet}")
    val (supXy, supX, supY, liftXy) = got(("x", "y"))
    assert(supXy == 3 && supX == 4 && supY == 4)
    // lift = 3 * 5 / (4 * 4) = 0.9375
    assert(liftXy == 937500L, s"lift $liftXy")
    val (supXz, _, supZ, liftXz) = got(("x", "z"))
    assert(supXz == 2 && supZ == 2)
    // lift = 2 * 5 / (4 * 2) = 1.25 -> genuinely associated
    assert(liftXz == 1250000L)
    // partition independence
    val b = TextAnalysis.itemsetPairs(docs.repartition(5), 2, 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(b == got.map { case (k2, v) => (k2._1, k2._2, v._1) }.toSet)
  }

  // ──────────────── Conversation assembly (s6) ──────────────────────

  test("conversationAssembly orders turns (event_id breaks ts ties), " +
    "splits on the gap, and is partition-independent") {
    val ns = 1000000000L
    val rows = Seq(
      (1L, 10L * ns, 7L, "click", "a"),
      (2L, 20L * ns, 7L, "view", "b"),
      (3L, 20L * ns, 7L, "view", "c"),
      (4L, 10000L * ns, 7L, "buy", "d"),
      (5L, 30L * ns, 8L, "click", "e"))
    val events = rows.toDF("event_id", "ts", "user_id", "event_type",
      "props")
    val got = TextAnalysis.conversationAssembly(events)
      .orderBy("user_id", "session_id").collect()
    assert(got.length == 3)
    assert(got(0).getLong(2) == 3 &&
      got(0).getString(5) == "click:a\nview:b\nview:c",
      s"turn order: ${got(0).getString(5)}")
    assert(got(1).getString(5) == "buy:d", "the 2h gap starts session 2")
    assert(got(2).getString(5) == "click:e")
    val b = TextAnalysis.conversationAssembly(events.repartition(5))
      .orderBy("user_id", "session_id").collect().toSeq
    assert(got.toSeq == b)
  }

  // ──────────────── Graph-ANN beam search (n24) ─────────────────────

  test("nswSearch: the beam walk reaches past the entry neighborhood, " +
    "recalls well on the exact kNN graph, and is partition-independent") {
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 10)
    val graphRel = Similarity.knnBrute(emb, emb, 6)
      .select("q_id", "n_id").localCheckpoint()
    val got = Similarity.nswSearch(qs, emb, graphRel,
      Seq(0L, 1L, 2L, 3L, 4L), k = 3, beam = 16, hops = 4)
      .localCheckpoint()
    val brute = Similarity.knnBrute(qs, emb, 3)
    val recall = Similarity.recallAtK(got, brute, 3)
      .agg(avg(col("recall"))).head().getDouble(0)
    // the fixture's embeddings are random (no manifold for the graph to
    // follow — the hard case for greedy walks); the 4-hop/beam-16 walk
    // still has to beat entry-neighborhood chance by a wide margin
    assert(recall >= 0.5,
      s"4-hop beam over the exact 6-NN graph must recall >= 0.5: $recall")
    // the walk must actually walk: some returned neighbor is neither an
    // entry point nor a direct graph neighbor of one
    val near = Set(0L, 1L, 2L) ++ graphRel
      .filter(col("q_id") < 3).select("n_id")
      .collect().map(_.getLong(0))
    val returned = got.select("n_id").collect().map(_.getLong(0)).toSet
    assert((returned -- near).nonEmpty,
      "beam search stuck in the entry neighborhood")
    val b = Similarity.nswSearch(qs.repartition(5), emb.repartition(7),
        graphRel, Seq(0L, 1L, 2L, 3L, 4L), k = 3, beam = 16, hops = 4)
      .orderBy("q_id", "rank").collect().toSeq
    assert(got.orderBy("q_id", "rank").collect().toSeq == b)
  }

  // ──────────────── Tokenizer fertility audit (t31) ─────────────────

  test("fertilityBySource: word totals match a raw recount and the " +
    "permille is the exact floor ratio") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val audit = Bpe.fertilityBySource(docs, Bpe.FrozenMerges)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(audit.nonEmpty)
    // independent word recount for every group from the raw text
    val raw = docs.select("source", "lang", "text").collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
      .map { case (k, rows) => k ->
        rows.map(_.getString(2).split(" ").count(_.nonEmpty).toLong).sum }
    audit.foreach { case (k, (nDocs, nWords, nBpe, permille)) =>
      assert(nWords == raw(k), s"$k word recount")
      assert(permille == 1000 * nBpe / nWords, s"$k permille formula")
      assert(nBpe >= nWords, "BPE can only split words, never merge " +
        "across whitespace")
      assert(nDocs > 0)
    }
  }

  // ──────────────── Leakage-proof grouped split (sp26) ──────────────

  test("groupedSplit keeps every group in one split and leaves " +
    "ungrouped rows on their hashSplit assignment") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val clusters = Dedup.dupClusters(
      Dedup.minhashDedupPairs(docs, 0.5, maxBucket = Int.MaxValue)
        .select("doc_a", "doc_b")).localCheckpoint()
    val out = Sampling.groupedSplit(docs.select("doc_id"), "doc_id",
      clusters, "doc_id", "cluster").localCheckpoint()
    // no cluster straddles two splits — the leakage sp4 audits, gone
    val straddling = out.join(clusters, "doc_id")
      .groupBy("cluster")
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(straddling == 0L, "every cluster must live in ONE split")
    assert(clusters.count() > 0, "fixture must actually have clusters")
    // rows outside any cluster keep the plain hashSplit assignment
    val plain = Sampling.hashSplit(docs.select("doc_id"), "doc_id")
      .withColumnRenamed("split", "plain_split")
    val moved = out.join(clusters, Seq("doc_id"), "left_anti")
      .join(plain, "doc_id")
      .filter(col("split") =!= col("plain_split")).count()
    assert(moved == 0L, "ungrouped rows must not move")
  }

  // ──────────────── CMS join-size estimate (dq7) ────────────────────

  test("cmsJoinSizeEstimate never underestimates; collision overshoot " +
    "stays sketch-bounded") {
    val rnd = new scala.util.Random(7)
    val as = (0 until 500).map(_ => s"k${rnd.nextInt(40)}").toDF("k")
    val bs = (0 until 300).map(_ => s"k${rnd.nextInt(60)}").toDF("k")
    val est = graft.ext.Sketches.cmsJoinSizeEstimate(
        graft.ext.Sketches.cmsCounters(as, "k"),
        graft.ext.Sketches.cmsCounters(bs, "k"))
      .head().getLong(0)
    val tru = as.join(bs, "k").count()
    assert(est >= tru, s"AMS/CMS inner product must not undershoot: " +
      s"est=$est true=$tru")
    // expected collision mass per row is |A|·|B|/width ≈ 146; the min
    // over 4 independent rows stays well under 2× at this scale
    assert(est <= 2 * tru, s"overshoot out of family: est=$est true=$tru")
    // disjoint key spaces: the true size is 0, the estimate is pure
    // collision mass — small, and never negative
    val cs = (0 until 300).map(i => s"zz$i").toDF("k")
    val dEst = graft.ext.Sketches.cmsJoinSizeEstimate(
        graft.ext.Sketches.cmsCounters(as, "k"),
        graft.ext.Sketches.cmsCounters(cs, "k"))
      .head().getLong(0)
    assert(dEst >= 0 && dEst <= 2000, s"disjoint estimate $dEst")
  }

  // ──────────────── HyperLogLog registers (t32/t33) ─────────────────

  test("hllRegisters merge by (reg, max); the estimate tracks exact " +
    "counts in both regimes") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val sh = Dedup.shingles(docs).localCheckpoint()
    val exact = sh.select(countDistinct(col("sh"))).head().getLong(0)
    val est = graft.ext.Sketches.hllEstimate(
      graft.ext.Sketches.hllRegisters(sh, "sh")).head().getLong(1)
    assert(math.abs(est - exact).toDouble / exact < 0.1,
      s"raw-regime estimate est=$est exact=$exact")
    // shard merge: registers of the union == (reg, MAX) of the parts
    val p1 = sh.filter(col("doc_id") % 2 === 0)
    val p2 = sh.filter(col("doc_id") % 2 =!= 0)
    val merged = graft.ext.Sketches.hllRegisters(p1, "sh")
      .unionByName(graft.ext.Sketches.hllRegisters(p2, "sh"))
      .groupBy("reg").agg(max("max_rho").as("max_rho"))
      .orderBy("reg").collect().toSeq
    val whole = graft.ext.Sketches.hllRegisters(sh, "sh")
      .orderBy("reg").collect().toSeq
    assert(merged == whole)
    // linear-counting regime: 40 distinct keys, nearly-empty registers
    val smalls = (0 until 40).map(i => s"s$i").toDF("sh")
    val se = graft.ext.Sketches.hllEstimate(
      graft.ext.Sketches.hllRegisters(smalls, "sh")).head().getLong(1)
    assert(math.abs(se - 40) <= 6, s"LC estimate $se for 40 distinct")
  }

  test("hllRegistersBy: a single-group relation is byte-identical to " +
    "hllRegisters; per-group estimates track per-group exacts") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val sh = Dedup.shingles(docs).localCheckpoint()
    val one = sh.withColumn("g", lit("all"))
    val grouped = graft.ext.Sketches.hllRegistersBy(one, "g", "sh")
      .select("reg", "max_rho").orderBy("reg").collect().toSeq
    val flat = graft.ext.Sketches.hllRegisters(sh, "sh")
      .orderBy("reg").collect().toSeq
    assert(grouped == flat, "single group == the flat sketch")
    // per-group accuracy on the real source split
    val keyed = sh.join(docs.select("doc_id", "source"), "doc_id")
      .localCheckpoint()
    val est = graft.ext.Sketches.hllEstimateBy(
        graft.ext.Sketches.hllRegistersBy(keyed, "source", "sh"),
        "source")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = keyed.groupBy("source")
      .agg(countDistinct(col("sh")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (srcKey, n) =>
      val e = est(srcKey)
      assert(math.abs(e - n).toDouble / n < 0.15,
        s"$srcKey: est=$e exact=$n")
    }
  }

  // ──────────────── Embedding-drop drift (e16) ──────────────────────

  test("embedding drift: identical slices score ~0, a planted shift " +
    "along the frozen axis registers loudly") {
    def drift(ref: org.apache.spark.sql.DataFrame,
        cur: org.apache.spark.sql.DataFrame): Long = {
      val width = 1000000L
      val v = Spectral.pcaPowerDirection(ref, dim = 8)
      graft.ext.Profile.psiFromBuckets(
          graft.ext.Profile.bucketCounts(
            Spectral.pcaProjectWith(ref, v),
            "proj_q", width).toDF("bucket", "n_ref"),
          graft.ext.Profile.bucketCounts(
            Spectral.pcaProjectWith(cur, v),
            "proj_q", width).toDF("bucket", "n_cur"))
        .agg(sum(col("psi_micro"))).head().getLong(0)
    }
    val base = (0 until 200).map { i =>
      val e = Array.tabulate(8)(j =>
        (math.sin(i * 0.37 + j) * 0.9).toFloat)
      (i.toLong, e)
    }
    val ref = base.toDF("vec_id", "embedding")
    val same = base.map { case (id, e) => (id + 1000L, e) }
      .toDF("vec_id", "embedding")
    val shifted = base.map { case (id, e) =>
      (id + 2000L, e.zipWithIndex.map { case (v, j) =>
        if (j == 0) v + 2.0f else v }) }
      .toDF("vec_id", "embedding")
    assert(drift(ref, same) == 0L,
      "an identical distribution must score exactly 0")
    assert(drift(ref, shifted) > 250000L,
      "a +2.0 shift on one axis must exceed PSI 0.25")
  }

  // ──────────────── Exact linear probe (e14/e15) ────────────────────

  test("linearProbe solution satisfies the normal equations exactly") {
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet")
    val train = Sampling.hashSample(emb, "vec_id", 10)
    val probe = Spectral.linearProbe(train).orderBy("feature").collect()
    val nums = probe.map(r => BigInt(r.getString(1)))
    val den = BigInt(probe(0).getString(2))
    assert(den > 0)
    // recompute A, b independently in plain Scala from the raw rows
    val rows = train.select("embedding", "label").collect().map { r =>
      val e = r.getSeq[Float](0)
      val x = Array.tabulate(3)(j =>
        math.floor(e(j).toDouble * 100 + 0.5).toLong) :+ 1L
      (x, if (r.getInt(1) == 0) 1L else 0L)
    }
    val d = 4
    val A = Array.tabulate(d, d) { (i, j) =>
      BigInt(rows.map(r => r._1(i) * r._1(j)).sum) +
        (if (i == j) BigInt(100) else BigInt(0))
    }
    val b = Array.tabulate(d)(i => BigInt(rows.map(r => r._1(i) * r._2).sum))
    // A·num == den·b componentwise — the Cramer guarantee, checked exact
    for (i <- 0 until d) {
      val lhs = (0 until d).map(j => A(i)(j) * nums(j))
        .foldLeft(BigInt(0))(_ + _)
      assert(lhs == den * b(i), s"normal-equation row $i violated")
    }
  }

  test("linearProbe recovers a planted linear signal and scores rank it") {
    val vecs = (0 until 120).map { i =>
      val x0 = if (i % 2 == 0) 0.8f else -0.8f
      (i.toLong, Array(x0, 0.1f * (i % 5), 0.05f * (i % 3), 0f),
        if (i % 2 == 0) 0 else 1)
    }.toDF("vec_id", "embedding", "label")
    val probe = Spectral.linearProbe(vecs, dims = 3, lambdaInt = 100,
      targetLabel = 0)
    val wm = Spectral.probeWeightsMicro(probe)
    assert(wm(0) > 0, s"x0 carries the signal: ${wm.toSeq}")
    val top = Spectral.linearProbeScores(vecs, wm, 10)
      .collect().map(_.getLong(0))
    assert(top.length == 10 && top.forall(_ % 2 == 0),
      "top-scored rows must be the planted positives")
    val wp = Spectral.probeWeightsMicro(
      Spectral.linearProbe(vecs.repartition(7), dims = 3,
        lambdaInt = 100, targetLabel = 0))
    assert(wm.toSeq == wp.toSeq, "weights partition-independent")
  }

  // ──────────────── Ranking evaluation (t29) ────────────────────────

  test("rankEval matches hand-computed metrics on a fixture") {
    val ranking = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3),
      (3L, 30L, 1), (3L, 31L, 2))
      .toDF("q_id", "doc_id", "rank")
    val gold = Seq((1L, 10L), (1L, 12L), (1L, 14L), (2L, 99L), (3L, 30L))
      .toDF("q_id", "doc_id")
    val got = Retrieval.rankEval(ranking, gold, 3)
      .orderBy("q_id").collect()
    // q=1: hits {10@1, 12@3}; disc(1)=1000000, disc(2)=630930,
    // disc(3)=500000 -> dcg 1500000, idcg(3 rel) 2130930
    val r1 = got(0)
    assert(r1.getLong(1) == 3 && r1.getLong(2) == 2)
    assert(r1.getDouble(3) == 0.6667, "recall 2/3")
    assert(r1.getLong(4) == 1000000L, "first hit at rank 1")
    assert(r1.getLong(5) == 1500000L, s"dcg ${r1.getLong(5)}")
    assert(r1.getLong(6) == 2130930L, s"idcg ${r1.getLong(6)}")
    assert(r1.getDouble(7) == 0.7039)
    // q=2: nothing relevant retrieved
    val r2 = got(1)
    assert(r2.getLong(2) == 0 && r2.getDouble(3) == 0.0 &&
      r2.getLong(4) == 0L && r2.getLong(5) == 0L &&
      r2.getDouble(7) == 0.0)
    // q=3: perfect single-relevant ranking
    val r3 = got(2)
    assert(r3.getDouble(3) == 1.0 && r3.getLong(4) == 1000000L &&
      r3.getDouble(7) == 1.0)
  }

  test("rankEval is partition-independent and ignores ranks past k") {
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 5)
    val ranking = Similarity.knnBrute(qs, emb, 20)
      .select(col("q_id"), col("n_id").as("doc_id"), col("rank"))
    val gold = qs.select(col("vec_id").as("q_id"), col("label").as("__ql"))
      .join(emb.select(col("vec_id").as("doc_id"), col("label")),
        col("label") === col("__ql") && col("doc_id") =!= col("q_id"))
      .select("q_id", "doc_id")
    val a = Retrieval.rankEval(ranking, gold, 10)
      .orderBy("q_id").collect().toSeq
    val b = Retrieval.rankEval(ranking.repartition(9), gold.repartition(5),
        10).orderBy("q_id").collect().toSeq
    assert(a == b)
    // metrics at k=10 must not see ranks 11..20
    val cut = Retrieval.rankEval(ranking.filter(col("rank") <= 10), gold,
        10).orderBy("q_id").collect().toSeq
    assert(a == cut)
  }

  test("cusum: sustained small drift alarms; a single spike resets") {
    // In-control mean 10, target 10, slack 2, threshold 12. Key "drift"
    // shifts to 15 from ord 10 (excess +3/step -> S crosses 12 within 5
    // steps and stays up); key "spike" has ONE +30 excursion (S jumps
    // but a spike that large trips once) then decays back to 0 at rate
    // -2/step below target. Key "flat" never alarms.
    val flat = (0 until 20).map(i => ("flat", i, 10L))
    val drift = (0 until 20).map(i => ("drift", i, if (i < 10) 10L else 15L))
    val spike = (0 until 20).map(i => ("spike", i, if (i == 5) 40L else 10L))
    val rows = (flat ++ drift ++ spike).toDF("grp", "ord", "n")
    val out = TimeSeries.cusum(rows, "grp", "ord", "n",
        target = 10L, slack = 2L, threshold = 12L)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(3), r.getBoolean(4)))
      .toMap
    assert((0 until 20).forall(i => !out(("flat", i))._2), "flat never alarms")
    assert(out(("drift", 14))._2 && out(("drift", 19))._2,
      s"sustained +3 excess must alarm by ord 14 and stay: $out")
    assert(!out(("drift", 9))._2, "no alarm before the shift")
    assert(out(("spike", 5))._1 == 28L && out(("spike", 5))._2,
      "one +30 excursion trips once (S = 40-12)")
    assert(!out(("spike", 19))._2 && out(("spike", 19))._1 == 0L,
      s"S must decay back to 0 after the spike: ${out(("spike", 19))}")
  }

  test("CUPED: removes covariate imbalance exactly when y tracks x; " +
      "zero pre-variance degrades to the raw readout") {
    // y = x for every user and x is arm-imbalanced (odd users, arm 1,
    // have systematically larger pre-period x): the RAW arm means differ
    // by construction, but θ = 1 exactly, so the CUPED means must
    // coincide — the covariate-imbalance removal, isolated.
    def ev(u: Long, ts: Long, v: Double) = (ts, u, v)
    val rows = (0L until 20L).flatMap { u =>
      val x = 10.0 * (u + 1)
      Seq(ev(u, u, x), ev(u, 1000L + u, x))
    }.toDF("ts", "user_id", "value")
    val r = Experiment.cuped(rows)
      .collect().map(x => x.getLong(0) ->
        (x.getDouble(2), x.getDouble(3), x.getDouble(4))).toMap
    assert(r(0L)._1 != r(1L)._1, s"raw means must show the imbalance: $r")
    assert(r(0L)._3 == 1.0 && r(1L)._3 == 1.0, s"theta must be 1: $r")
    assert(math.abs(r(0L)._2 - r(1L)._2) < 1e-6,
      s"CUPED means must coincide when y = x: $r")

    // constant pre-period -> var(x) = 0 -> θ = 0 and CUPED = raw
    val flat = (0L until 10L).flatMap { u =>
      Seq(ev(u, u, 7.0), ev(u, 1000L + u, (u % 3).toDouble))
    }.toDF("ts", "user_id", "value")
    val f = Experiment.cuped(flat).collect()
    assert(f.forall(_.getDouble(4) == 0.0), "theta must degrade to 0")
    assert(f.forall(x => x.getDouble(2) == x.getDouble(3)),
      "CUPED must equal the raw mean under zero pre-variance")
  }

  test("Benford audit: geometric data hugs the law, uniform data flags; " +
      "power-of-ten boundaries keep exact digits") {
    // 1.5^k spans magnitudes multiplicatively -> near-Benford; uniform
    // 100..999 puts every digit at ~1/9 (111111 micro) -> digit 1
    // deviates by ~190k micro. Exact powers of ten (10, 100, 1000) must
    // land on digit 1 — the floor(log10) ulp trap the string path avoids.
    val geo = (0 until 200).map(k => math.pow(1.5, (k % 40) + 1))
      .toDF("v")
    val g = Profile.benfordAudit(geo, "v")
      .collect().map(r => r.getInt(0) -> r.getLong(4)).toMap
    assert(g(1) < 60000L, s"geometric digit-1 deviation must be small: $g")
    val uni = (100 until 1000).map(_.toDouble).toDF("v")
    val u = Profile.benfordAudit(uni, "v")
      .collect().map(r => r.getInt(0) -> (r.getLong(2), r.getLong(4))).toMap
    assert(u(1)._1 == 111111L && u(1)._2 > 150000L,
      s"uniform data must deviate on digit 1: $u")
    val pow = Seq(10.0, 100.0, 1000.0, 0.5, 9.999).toDF("v")
    val p = Profile.benfordAudit(pow, "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(p == Map(1 -> 3L, 9 -> 1L),
      s"powers of ten are digit 1, sub-1 rows drop, 9.999 is digit 9: $p")
  }

  test("RBO: identical lists score the exact truncated mass; top " +
      "disagreements cost more than tail ones; disjoint lists score 0") {
    def rk(q: Long, ids: Seq[Long]) =
      ids.zipWithIndex.map { case (n, i) => (q, n, i + 1) }
    val base = rk(0L, 1L to 10L)
    val a = base.toDF("q_id", "n_id", "rank")
    // swap OUT rank 1 vs swap out rank 10 (replace with an unshared id)
    val swapTop = rk(0L, 99L +: (2L to 10L)).toDF("q_id", "n_id", "rank")
    val swapTail = rk(0L, (1L to 9L) :+ 99L).toDF("q_id", "n_id", "rank")
    val ident = Retrieval.rbo(a, a, 10).collect()(0)
    val exact = Retrieval.rboWeightsMicro(10, 0.9).map(_._2).sum
    assert(ident.getLong(1) == 10L && ident.getLong(2) == exact,
      s"identical lists must score the exact truncated mass: $ident")
    val top = Retrieval.rbo(a, swapTop, 10).collect()(0).getLong(2)
    val tail = Retrieval.rbo(a, swapTail, 10).collect()(0).getLong(2)
    assert(top < tail,
      s"a rank-1 disagreement must cost more than a rank-10 one: " +
        s"$top vs $tail")
    val disjoint = rk(0L, 11L to 20L).toDF("q_id", "n_id", "rank")
    val z = Retrieval.rbo(a, disjoint, 10).collect()(0)
    assert(z.getLong(1) == 0L && z.getLong(2) == 0L,
      s"disjoint lists must appear with 0: $z")
  }

  test("SRM: balanced arms pass, a 60/40 split at n=1000 flags") {
    // users 0..999 -> exactly 500/500, chi2 = 0; dropping 100 even users
    // (the "arm-0 logging loss" failure mode) -> 400/500, chi2 ~ 11.1
    def evs(users: Seq[Long]) =
      users.map(u => (u, u)).toDF("user_id", "ts")
    val ok = Experiment.srmCheck(evs(0L until 1000L)).collect()(0)
    assert(ok.getLong(0) == 500L && ok.getDouble(2) == 0.0 &&
      !ok.getBoolean(3), s"balanced arms must pass: $ok")
    val bad = Experiment.srmCheck(
      evs((0L until 1000L).filterNot(u => u % 2 == 0 && u < 200L)))
      .collect()(0)
    assert(bad.getLong(0) == 400L && bad.getLong(1) == 500L &&
      bad.getBoolean(3) && bad.getDouble(2) > 10.0,
      s"60/40-ish split must flag: $bad")
  }

  test("seasonal baseline: a habitual daily peak never flags; the same " +
      "count at a normally-quiet hour does") {
    // 10 days; hour 9 carries 20 events EVERY day (the habitual peak);
    // hour 3 is silent except day 7, which carries the same 20 events.
    // A trailing smoother would flag every morning ramp; the seasonal
    // baseline flags only the off-rhythm burst.
    val h = 3600L * 1000000000L
    val rows = (0 until 10).flatMap { day =>
      val nine = (0 until 20).map(i =>
        ("view", day * 24L * h + 9L * h + i, 1L))
      val three = if (day == 7) (0 until 20).map(i =>
        ("view", day * 24L * h + 3L * h + i, 1L)) else Seq.empty
      nine ++ three
    }.toDF("event_type", "ts", "x")
    val out = TimeSeries.seasonalDeviation(rows, "event_type", "ts")
      .collect().map(r => (r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getBoolean(5))).toMap
    assert((0 until 10).forall(d => !out((d.toLong, 9L))._2),
      s"the habitual peak must never flag: $out")
    assert(out((7L, 3L)) == ((20L, true)),
      s"the off-rhythm burst must flag: $out")
  }

  test("MAD outliers: 50% breakdown — fences hold with 40% garbage " +
      "where mean/stddev fences collapse") {
    // 60 clean values at 10.00 +/- 0.30 and 40 garbage at 1000.0: the
    // median stays in the clean mass, MAD stays tiny, and all 40 garbage
    // rows flag. A mean/stddev z-score would put the mean near 406 and
    // the stddev near 487 — z(1000) ~ 1.2, NOTHING flags.
    val clean = (0 until 60).map(i => 10.0 + 0.01 * (i % 61 - 30))
    val junk = Seq.fill(40)(1000.0)
    val r = Profile.madOutlierStats((clean ++ junk).toDF("v"), "v")
      .collect()(0)
    assert(r.getLong(0) == 100L)
    assert(r.getLong(1) >= 970L && r.getLong(1) <= 1029L,
      s"median must sit in the clean mass (centi-units): ${r.getLong(1)}")
    assert(r.getLong(3) == 40L,
      s"exactly the garbage must flag: ${r.getLong(3)}")
    // exact order-statistic median on a tiny hand case: values 1,2,2,9
    // -> lower median 2.00, MAD of |v-2| = {1,0,0,7} -> lower median 0
    val tiny = Profile.madOutlierStats(
      Seq(1.0, 2.0, 2.0, 9.0).toDF("v"), "v").collect()(0)
    assert(tiny.getLong(1) == 200L && tiny.getLong(2) == 0L,
      s"hand-computed medians: $tiny")
  }

  test("k-anonymity audit: singleton classes and constant-sensitive " +
      "classes both surface") {
    // class (1,a): size 1 (the re-identifiable row); class (2,b): size 4
    // but l-diversity 1 (the homogeneity leak); class (3,c): size 4,
    // diverse.
    val rows = (Seq((1, "a", 10L)) ++
      (0 until 4).map(_ => (2, "b", 99L)) ++
      (0 until 4).map(i => (3, "c", 50L + i)))
      .toDF("nat", "seg", "sens")
    val out = Profile.kAnonymityAudit(rows, Seq("nat", "seg"), "sens")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
    assert(out(1) == ((1L, 1L, 1L)), s"size-1 bucket: $out")
    // both size-4 classes land in bucket 3 (binary width of 4);
    // min l-diversity there must expose the constant-sensitive class
    assert(out(3) == ((2L, 8L, 1L)), s"size-4 bucket: $out")
  }

  test("Zipf fit: a planted power law recovers its exponent; a uniform " +
      "vocabulary fits slope ~ 0") {
    // frequencies c(r) = round(2000 / r^0.8) for ranks 1..40: the OLS in
    // log-log space must recover ~ -0.8. Build the corpus by repeating
    // token t_r c(r) times.
    val zipfDocs = (1 to 40).flatMap { r =>
      val c = math.round(2000.0 / math.pow(r, 0.8)).toInt
      Seq.fill(c)(f"t$r%03d")
    }.grouped(50).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val z = TextAnalysis.zipfFit(zipfDocs, k = 40).collect()(0)
    assert(math.abs(z.getDouble(1) - (-0.8)) < 0.05,
      s"planted exponent must recover: ${z.getDouble(1)}")
    val flatDocs = (0 until 50).map(i =>
      (i.toLong, (0 until 40).map(j => f"u$j%03d").mkString(" ")))
      .toDF("doc_id", "text")
    val fz = TextAnalysis.zipfFit(flatDocs, k = 40).collect()(0)
    assert(math.abs(fz.getDouble(1)) < 0.01,
      s"uniform vocabulary must fit ~ 0: ${fz.getDouble(1)}")
  }

  test("detectorAgreement: masks partition the pair universe and ignore " +
      "detector-internal multiplicity") {
    val d1 = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("doc_a", "doc_b")
    // d2 carries a duplicate row and a weight-like extra column — the
    // distinct projection must neutralize both
    val d2 = Seq((1L, 2L, 9), (1L, 2L, 9), (4L, 5L, 1))
      .toDF("doc_a", "doc_b", "w")
    val d4 = Seq((1L, 2L), (4L, 5L)).toDF("doc_a", "doc_b")
    val out = Dedup.detectorAgreement(Seq(1 -> d1, 2 -> d2, 4 -> d4))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(7L -> 1L, 1L -> 2L, 6L -> 1L),
      s"masks: (1,2) all three; (1,3),(2,3) LSH-only; (4,5) 2+4: $out")
    intercept[IllegalArgumentException] {
      Dedup.detectorAgreement(Seq(3 -> d1))
    }
  }

  test("equi-depth quantiles: exact order statistics on 1..100; the " +
      "5th decile equals the MAD audit's lower median") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val q = Profile.orderStatQuantiles(df, "v", 10)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(q == (1 to 10).map(j => j -> j * 1000L).toMap,
      s"decile j of 1..100 is exactly 10j (centi-units): $q")
    // duplicates collapse to the same distinct value but keep their mass
    val dup = (Seq.fill(99)(1.0) ++ Seq(5.0)).toDF("v")
    val qd = Profile.orderStatQuantiles(dup, "v", 4)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(qd == Map(1 -> 100L, 2 -> 100L, 3 -> 100L, 4 -> 500L),
      s"99x mass holds three quartiles, the max takes the last: $qd")
    val med = Profile.madOutlierStats(df, "v").collect()(0).getLong(1)
    assert(q(5) == med, "q5 of k=10 must equal the lower median")
  }

  test("cusum is partition-independent") {
    val rows = (0 until 40).map(i =>
      (s"g${i % 3}", i / 3, (i % 7).toLong)).toDF("grp", "ord", "n")
    val a = TimeSeries.cusum(rows, "grp", "ord", "n", 3L, 1L, 5L)
      .orderBy("grp", "ord").collect().toSeq
    val b = TimeSeries.cusum(rows.repartition(7), "grp", "ord", "n",
        3L, 1L, 5L)
      .orderBy("grp", "ord").collect().toSeq
    assert(a == b)
  }
}
