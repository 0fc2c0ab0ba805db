package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Hand-computed micro-cases for the round-9 analytics operators:
 * attribution (last-touch / linear split), RFM quintiles, sweep-line
 * interval merge, KMV sketch estimator + set ops, bounded-hop SSSP. The
 * gate cross-validates each against DuckDB at sf0.01; these pin the
 * semantics a hash-compare can't explain when it breaks. */
class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private val us = 1000L // helper: micros -> the nanos the events carry

  // one user: view@1s, click@2s, purchase@3s (value 10.00),
  // purchase@4s (no touch after — click@2s still within window),
  // second user: purchase with NO preceding touch
  private def mkEvents(rows: Seq[(Long, Long, String, Double)]) =
    rows.zipWithIndex.map { case ((uid, tsSec, typ, v), i) =>
      (i.toLong, tsSec * 1000000L * us, uid, typ, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("lastTouch credits the most recent in-window touch, else (none)") {
    val ev = mkEvents(Seq(
      (1L, 1L, "view", 0.0),
      (1L, 2L, "click", 0.0),
      (1L, 3L, "purchase", 10.0),  // last touch = click@2
      (1L, 4L, "purchase", 5.0),   // still click@2
      (2L, 1L, "purchase", 7.0),   // no touch at all
      (3L, 1L, "view", 0.0),
      (3L, 2L, "purchase", 1.0)))  // view wins for user 3
    val m = Attribution.lastTouch(ev, lookbackDays = 7)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("click") == ((2L, 15000000L)))
    assert(m("view") == ((1L, 1000000L)))
    assert(m("(none)") == ((1L, 7000000L)))
    assert(m.size == 3)
  }

  test("lastTouch honors the lookback horizon") {
    // touch 8 days before the purchase -> outside a 7-day window
    val ev = mkEvents(Seq(
      (1L, 1000L, "click", 0.0),
      (1L, 1000L + 8L * 86400, "purchase", 3.0)))
    val m = Attribution.lastTouch(ev, lookbackDays = 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("(none)" -> 1L))
  }

  test("linearTouch splits exactly and the books balance") {
    // 2 views + 1 click before a 10.00 purchase: shares 2/3 and 1/3 of
    // 10,000,000 micro = 6,666,666 + 3,333,333, remainder 1
    val ev = mkEvents(Seq(
      (1L, 1L, "view", 0.0),
      (1L, 2L, "view", 0.0),
      (1L, 3L, "click", 0.0),
      (1L, 4L, "purchase", 10.0),
      (2L, 1L, "purchase", 7.0))) // untouched
    val m = Attribution.linearTouch(ev, lookbackDays = 7)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("view") == ((6666666L, 1L)))
    assert(m("click") == ((3333333L, 1L)))
    assert(m("(remainder)") == ((1L, 1L)))
    assert(m("(none)") == ((7000000L, 1L)))
    // conservation: every micro of every purchase lands somewhere
    assert(m.values.map(_._1).sum == 17000000L)
  }

  test("rfmSegments: quintiles deterministic, segment rollup conserves") {
    val orders = (1 to 10).map { k =>
      (k.toLong, k.toLong, // one order per customer, custkey = orderkey
        java.sql.Timestamp.valueOf(f"2025-01-${k}%02d 00:00:00"),
        k * 10.0)
    }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = Attribution.rfmSegments(orders).collect()
    assert(out.map(_.getLong(3)).sum == 10L) // all customers present
    // monotone metrics + one order each: r,f ties broken by custkey;
    // m_score follows value: customer 10 (highest spend, most recent)
    // must land in (5, f, 5)
    val top = out.filter(r => r.getInt(0) == 5 && r.getInt(2) == 5)
    assert(top.map(_.getLong(4)).sum >= 9000000L * 10 / 100)
    // micro conservation
    assert(out.map(_.getLong(4)).sum == (1 to 10).map(_ * 10000000L).sum)
  }

  test("rfmSegments: loud bound on customer cardinality (r9 verdict #4)") {
    // the three global ntile windows single-partition sort at customer
    // grain — past maxCustomers the operator must REFUSE loudly, the
    // Profile.boundedCumCounts contract, never silently single-thread
    val orders = (1 to 10).map { k =>
      (k.toLong, k.toLong,
        java.sql.Timestamp.valueOf(f"2025-01-${k}%02d 00:00:00"),
        k * 10.0)
    }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val e = intercept[Exception] {
      Attribution.rfmSegments(orders, maxCustomers = 5L).collect()
    }
    assert(e.getMessage.contains("customer cardinality") ||
      Option(e.getCause).exists(_.getMessage.contains("customer cardinality")))
  }

  test("mergedIntervals: islands, coverage, idle — the bridged case") {
    // [1,10) [2,3) [4,20): one island (the 3rd starts before max-end 10)
    // then [30,40): second island. covered = 19+10, span = 39, idle = 10
    val iv = Seq((1L, 1L, 10L), (1L, 2L, 3L), (1L, 4L, 20L),
      (1L, 30L, 40L)).toDF("user_id", "iv_start", "iv_end")
    val r = TimeSeries.mergedIntervals(iv, "user_id", "iv_start", "iv_end")
      .collect().head
    assert(r.getAs[Long]("n_intervals") == 4L)
    assert(r.getAs[Long]("n_islands") == 2L)
    assert(r.getAs[Long]("covered") == 29L)
    assert(r.getAs[Long]("span") == 39L)
    assert(r.getAs[Long]("idle") == 10L)
  }

  test("kmv: under-k sketches are exact; estimator formula otherwise") {
    val small = (1 to 100).map(i => s"k$i").toDF("k")
    val est = Sketches.kmvEstimate(Sketches.kmvSketch(small, "k"))
      .collect().head
    assert(est.getAs[Long]("k_used") == 100L)
    assert(est.getAs[Long]("est_distinct") == 100L) // exact under k
    val big = (1 to 5000).map(i => s"k$i").toDF("k")
    val sketch = Sketches.kmvSketch(big, "k")
    assert(sketch.count() == Sketches.KmvK)
    val e2 = Sketches.kmvEstimate(sketch).collect().head
    val est2 = e2.getAs[Long]("est_distinct")
    // (k-1)*2^48 / h_k replay + estimator accuracy at k=512 (se ~ 4.4%)
    val expected = (Sketches.KmvK - 1L) * (1L << 48) /
      e2.getAs[Long]("kth_hash")
    assert(est2 == expected)
    assert(math.abs(est2 - 5000L) < 1000L, s"estimate $est2 too far")
  }

  test("kmvSetOps: disjoint sets estimate zero intersection; self is full") {
    val a = (1 to 2000).map(i => s"a$i").toDF("k")
    val b = (1 to 2000).map(i => s"b$i").toDF("k")
    val ska = Sketches.kmvSketch(a, "k")
    val skb = Sketches.kmvSketch(b, "k")
    val disjoint = Sketches.kmvSetOps(ska, skb).collect().head
    assert(disjoint.getAs[Long]("k_both") == 0L)
    assert(disjoint.getAs[Long]("est_inter") == 0L)
    val self = Sketches.kmvSetOps(ska, ska).collect().head
    assert(self.getAs[Long]("jaccard_milli") == 1000L)
    val estU = disjoint.getAs[Long]("est_union")
    assert(math.abs(estU - 4000L) < 800L, s"union estimate $estU")
  }

  test("clusterAgreement: contingency arithmetic on a hand case") {
    // universe 1..6; detector clusters {1,2,3} {4,5}; truth {1,2} {4,5}
    // pairs_a = 3+1 = 4, pairs_b = 1+1 = 2, both = C(2,2 in same both):
    // (1,2) in both; (4,5) in both -> 2. total = 15.
    val u = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val a = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "cluster")
    val b = Seq((1L, 1L), (2L, 1L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "cluster")
    val r = Dedup.clusterAgreement(u, a, b).collect().head
    assert(r.getAs[Long]("n_docs") == 6L)
    assert(r.getAs[Long]("pairs_a") == 4L)
    assert(r.getAs[Long]("pairs_b") == 2L)
    assert(r.getAs[Long]("pairs_both") == 2L)
    assert(r.getAs[Long]("precision_ppm") == 500000L)
    assert(r.getAs[Long]("recall_ppm") == 1000000L)
    assert(r.getAs[Long]("f1_ppm") == 666666L)
    // rand = (15 - 4 - 2 + 4)/15 = 13/15
    assert(r.getAs[Long]("rand_ppm") == 1000000L * 13 / 15)
    // identical clusterings: perfect scores
    val p = Dedup.clusterAgreement(u, a, a).collect().head
    assert(p.getAs[Long]("precision_ppm") == 1000000L)
    assert(p.getAs[Long]("recall_ppm") == 1000000L)
    assert(p.getAs[Long]("rand_ppm") == 1000000L)
  }

  test("assocRules: direction asymmetry and confidence filter") {
    // 'a' appears in 10 docs, 'b' in 5, together in 5: conf(b->a)=100%,
    // conf(a->b)=50%
    val docs = (1 to 10).map { i =>
      (i.toLong, if (i <= 5) "a b" else "a x")
    }.toDF("doc_id", "text")
    val rules = TextAnalysis.assocRules(docs, minSup = 5,
      minConfPpm = 0L, k = 100)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("conf_ppm"), r.getAs[Long]("sup_ant"))).toMap
    assert(rules(("b", "a")) == ((1000000L, 5L)))
    assert(rules(("a", "b")) == ((500000L, 10L)))
    // minConf filter drops the weak direction
    // (a,x) is also frequent: x->a is the other 100% rule; both weak
    // a->* directions (50%) must drop
    val strict = TextAnalysis.assocRules(docs, minSup = 5,
      minConfPpm = 600000L, k = 100).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(strict == Set(("b", "a"), ("x", "a")))
  }

  test("timeSplit: cutoff, embargo band, exhaustive cover") {
    val df = (0L to 100L).map(t => (t, t)).toDF("id", "tsu")
    // span 0..100, cut = 80; embargo 10 -> train < 70, embargo [70,80)
    val out = Sampling.timeSplit(df, "tsu", trainPct = 80, embargo = 10L)
      .collect().map(r => r.getAs[Long]("tsu") -> r.getAs[String]("split"))
      .toMap
    assert(out(69L) == "train")
    assert(out(70L) == "embargo")
    assert(out(79L) == "embargo")
    assert(out(80L) == "test")
    assert(out(100L) == "test")
    assert(out.size == 101)
  }

  test("noisyCounts: deterministic replay, zero-centered-ish, exact grid") {
    val df = (1 to 1000).map(i => ("g" + (i % 10), i)).toDF("g", "v")
    val r1 = Privacy.noisyCounts(df, Seq("g"), epsilonMicro = 1000000L,
      seed = 7L).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("noise_micro"),
        r.getAs[Long]("n_released_micro"))).toMap
    val r2 = Privacy.noisyCounts(df, Seq("g"), epsilonMicro = 1000000L,
      seed = 7L).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("noise_micro"),
        r.getAs[Long]("n_released_micro"))).toMap
    assert(r1 == r2, "same seed must replay the same release")
    val r3 = Privacy.noisyCounts(df, Seq("g"), epsilonMicro = 1000000L,
      seed = 8L).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("noise_micro")).toMap
    assert(r3 != r1.map { case (k, v) => k -> v._1 },
      "a fresh seed must draw fresh noise")
    // released = true*1e6 + noise, exactly
    r1.foreach { case (_, (noise, rel)) =>
      assert(rel == 100L * 1000000L + noise)
    }
    // at eps=1 the expected |noise| is 1e6 micro; all draws should sit
    // well inside 15x that (p ~ 3e-7 per group otherwise)
    assert(r1.values.forall { case (n, _) => math.abs(n) < 15000000L })
  }

  test("containmentPairs: full inclusion scores 1e6 where Jaccard dilutes") {
    // doc 2 is a verbatim prefix of doc 1: every doc-2 shingle is in
    // doc 1, so containment = 1e6 while Jaccard = 4/13
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o"),
      (2L, "a b c d e f")).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs)
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val r = Dedup.containmentPairs(pairs, sh).collect().head
    assert(r.getAs[Long]("n_inter") == 4L)
    assert(r.getAs[Long]("cont_ppm") == 1000000L)
    val jac = Dedup.jaccard(pairs, sh).collect().head.getAs[Double]("jac")
    assert(jac < 0.5, s"Jaccard must dilute on containment, got $jac")
  }

  test("windowFunnel: window binds, any view can start, strict order") {
    def ev(uid: Long, tSec: Long, typ: String, i: Long) =
      (i, tSec * 1000000000L, uid, typ, 0.0)
    val rows = Seq(
      // user 1: view@0, click@10s, purchase@20s -> level 3 (window 60s)
      ev(1, 0, "view", 1), ev(1, 10, "click", 2), ev(1, 20, "purchase", 3),
      // user 2: view@0, click@100s (outside 60s) -> level 1
      ev(2, 0, "view", 4), ev(2, 100, "click", 5),
      // user 3: FIRST view@0 never converts in-window, but second
      // view@200 -> click@210 -> purchase@215 does -> level 3
      ev(3, 0, "view", 6), ev(3, 100, "click", 7),
      ev(3, 200, "view", 8), ev(3, 210, "click", 9),
      ev(3, 215, "purchase", 10),
      // user 4: purchase BEFORE the click -> only level 2
      ev(4, 0, "view", 11), ev(4, 5, "purchase", 12), ev(4, 10, "click", 13))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val m = Attribution.windowFunnel(rows, windowUs = 60000000L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m == Map(1L -> 3, 2L -> 1, 3L -> 3, 4L -> 2), s"got $m")
  }

  test("growthAccounting: flows and the accounting identity") {
    // user 1 active days 0,1,3; user 2 active day 1 only
    val rows = Seq((1L, 0L), (1L, 1L), (1L, 3L), (2L, 1L))
      .zipWithIndex.map { case ((u, d), i) =>
        (i.toLong, d * 86400000000000L, u, "view", 0.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val m = Attribution.growthAccounting(rows).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(m(0L) == ((1L, 0L, 0L, 0L)))            // u1 new
    assert(m(1L) == ((1L, 1L, 0L, 0L)))            // u2 new, u1 retained
    assert(m(2L) == ((0L, 0L, 0L, 2L)))            // both churn off day 1
    assert(m(3L) == ((0L, 0L, 1L, 0L)))            // u1 resurrects
    assert(m(4L) == ((0L, 0L, 0L, 1L)))            // u1 churns after end
    // identity: active(d) = active(d-1) + new - churned + resurrected
    val active = Map(0L -> 1L, 1L -> 2L, 2L -> 0L, 3L -> 1L, 4L -> 0L)
    for (d <- 1L to 4L) {
      val (nw, _, rs, ch) = m.getOrElse(d, (0L, 0L, 0L, 0L))
      assert(active(d) == active(d - 1) + nw - ch + rs, s"identity at $d")
    }
  }

  test("keySkewAudit: hand Gini, uniform floor, hot-key ceiling") {
    // keys a,a,a,b,c: sorted counts [1,1,3], S = 1+2+9 = 12,
    // G = 2*12/(3*5) - 4/3 -> ppm 1600000 - 1333333 = 266667
    val df = Seq("a", "a", "a", "b", "c").toDF("k")
    val r = Profile.keySkewAudit(df, "k").collect().head
    assert(r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("n_rows") == 5L)
    assert(r.getAs[Long]("max_count") == 3L)
    assert(r.getAs[Long]("top1_ppm") == 600000L)
    assert(r.getAs[Long]("gini_ppm") == 266667L)
    // perfectly uniform -> 0
    val u = Seq("a", "b", "c", "d").toDF("k")
    assert(Profile.keySkewAudit(u, "k").collect().head
      .getAs[Long]("gini_ppm") == 0L)
    // extreme: one key holds nearly everything -> approaches 1e6
    val hot = (Seq.fill(1000)("hot") ++ Seq("x", "y", "z")).toDF("k")
    assert(Profile.keySkewAudit(hot, "k").collect().head
      .getAs[Long]("gini_ppm") > 700000L)
  }

  test("maintainJoin: delta-maintained view equals full recompute") {
    val a0 = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 300L))
      .toDF("id", "fk", "v")
    val b = Seq((10L, "ten"), (20L, "twenty"), (30L, "thirty"))
      .toDF("fk", "nm")
    val view0 = a0.join(b, "fk").select("id", "fk", "v", "nm")
    // delete id 1, update id 2 (value + FK MOVE 10 -> 30), insert id 4
    val a1 = Seq((2L, 30L, 201L), (3L, 20L, 300L), (4L, 20L, 400L))
      .toDF("id", "fk", "v")
    val changes = Incremental.snapshotChanges(a0, a1, "id",
      Seq("fk", "v"), version = 1L)
    val maintained = Incremental.maintainJoin(view0, b, changes,
      "id", "op", "fk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    val recomputed = a1.join(b, "fk").select("id", "fk", "v", "nm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(maintained == recomputed)
    assert(maintained.exists(_ == ((2L, 30L, 201L, "thirty"))),
      "the FK-move row must land in its new group")
  }

  test("bootstrapCi: deterministic, brackets the mean, orders correctly") {
    val ev = (1 to 200).map { i =>
      (i.toLong, i.toLong * 1000000L, i.toLong % 50, "purchase",
        10.0 + (i % 7))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    def run() = Experiment.bootstrapCi(ev, "user_id", "value").collect().head
    val r1 = run()
    val r2 = run()
    assert(r1 == r2, "same seed must replay the identical interval")
    val (n, mean, lo, hi) = (r1.getAs[Long]("n_users"),
      r1.getAs[Long]("mean_micro"), r1.getAs[Long]("lo_micro"),
      r1.getAs[Long]("hi_micro"))
    assert(n == 50L)
    assert(lo <= hi)
    assert(lo <= mean && mean <= hi,
      s"interval [$lo, $hi] must bracket the point mean $mean")
    // the interval is non-degenerate on heterogeneous users
    assert(hi > lo)
    // Poisson thresholds: monotone; last = CDF(7)·2^48, whose deficit is
    // P(X ≥ 8) ≈ 1.02e-5 of the 48-bit space (≈ 2.9e9 < 2^33)
    val t = Experiment.PoissonCdf48
    assert(t.sliding(2).forall(p => p(0) < p(1)))
    assert(t.last > (1L << 48) - (1L << 33))
  }

  test("naiveBayes: separable corpora classify diagonally; ties break low") {
    // classes with disjoint vocabularies train/test perfectly
    val docs = (0 until 40).map { i =>
      val lang = if (i % 2 == 0) "aa" else "bb"
      val text = if (lang == "aa") "apple apple pie" else "zebra zoo zebra"
      (i.toLong, text, lang)
    }.toDF("doc_id", "text", "lang")
    val m = NaiveBayes.confusion(docs, "lang", col("doc_id") % 4 < 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m.keySet == Set(("aa", "aa"), ("bb", "bb")),
      s"separable corpora must classify diagonally, got $m")
    assert(m.values.sum == 20L) // every test doc predicted exactly once
    // a test doc of pure OOV tokens: every class scores only smoothing
    // floors + prior; identical totals tie -> lexicographically smallest
    val withOov = docs.unionByName(
      Seq((100L, "qq qq", "bb")).toDF("doc_id", "text", "lang"))
    val m2 = NaiveBayes.confusion(withOov, "lang",
        col("doc_id") % 4 < 2 && col("doc_id") < 100)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // both classes have 10 training docs (equal priors) and equal token
    // totals, so the OOV doc ties exactly and "aa" < "bb" wins
    assert(m2(("bb", "aa")) == 1L, s"OOV tie must break to 'aa', got $m2")
  }

  test("sssp: weighted distances, hop tie-break, early exit") {
    // 1 -> 2 (w 5), 1 -> 3 (w 1), 3 -> 2 (w 1): best dist to 2 is 2 via
    // 2 hops; 2 -> 4 (w 1) extends. Also a strictly-worse longer path
    // 1 -> 4 direct (w 10) must lose.
    val e = Seq((1L, 2L, 5L), (1L, 3L, 1L), (3L, 2L, 1L), (2L, 4L, 1L),
      (1L, 4L, 10L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    val m = Graph.sssp(e, seeds, maxHops = 6)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(m(1L) == ((0L, 0)))
    assert(m(3L) == ((1L, 1)))
    assert(m(2L) == ((2L, 2)))
    assert(m(4L) == ((3L, 3)))
    // equal-weight paths: fewer hops wins the tie-break
    val e2 = Seq((1L, 9L, 2L), (1L, 8L, 1L), (8L, 9L, 1L))
      .toDF("src", "dst", "w")
    val m2 = Graph.sssp(e2, Seq(1L).toDF("node"), maxHops = 6)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(m2(9L) == ((2L, 1)), "equal dist must keep the 1-hop path")
  }

  test("groupedOrderStats: per-key exact quartiles, keyed isolation") {
    // key a: 1..10 -> ranks ceil(j·10/4) = 3,5,8,10 -> values 3,5,8,10
    // key b: constant 7 -> every quartile is 7
    val d = ((1L to 10L).map(v => ("a", v)) ++
      (1 to 3).map(_ => ("b", 7L))).toDF("k", "v")
    val m = Profile.groupedOrderStats(d, "k", "v", 4)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(m(("a", 1)) == 3L && m(("a", 2)) == 5L &&
      m(("a", 3)) == 8L && m(("a", 4)) == 10L)
    for (q <- 1 to 4) assert(m(("b", q)) == 7L)
    assert(m.size == 8)
    // duplicates shift ranks exactly: 1,1,1,9 -> median (q=2, rank 2) = 1
    val dup = Seq(("c", 1L), ("c", 1L), ("c", 1L), ("c", 9L))
      .toDF("k", "v")
    val md = Profile.groupedOrderStats(dup, "k", "v", 2)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(md(1) == 1L && md(2) == 9L)
    // partition independence
    val m2 = Profile.groupedOrderStats(d.repartition(7), "k", "v", 4)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(m2 == m)
  }

  test("groupedOrderStats plan: every window partitions by key (no " +
    "single-partition sort)") {
    val d = (1L to 100L).map(v => (s"k${v % 5}", v)).toDF("k", "v")
    val opt = Profile.groupedOrderStats(d, "k", "v", 4)
      .queryExecution.optimizedPlan
    val wins = opt.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty, "expected a Window in the plan")
    // dq11's documented caveat (one global partition over distinct
    // values) is removed here BY SHAPE: the cumulative window must
    // carry the key partition spec
    assert(wins.forall(_.partitionSpec.nonEmpty),
      s"found an unpartitioned window:\n$opt")
  }

  test("constraintAudit: nulls, surplus copies, null-fails-check") {
    val df = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(10L)),
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(10L)),
      (java.lang.Long.valueOf(2L), null.asInstanceOf[java.lang.Long]),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(5L)))
      .toDF("k", "v")
    val m = Profile.constraintAudit(df,
        notNull = Seq("k", "v"),
        uniqueKeys = Seq(Seq("k")),
        checks = Seq("v_small" -> (col("v") < 8)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("not_null:k") == 1L)
    assert(m("not_null:v") == 1L)
    // k values (1,1,2,null): 4 rows, 3 distinct structs -> 1 surplus
    assert(m("unique:k") == 1L)
    // v < 8: 10,10 fail; null fails (unknown is not a pass); 5 passes
    assert(m("check:v_small") == 3L)
    assert(m.size == 4)
  }

  test("conformalCoverage: exact order-stat radius, coverage count") {
    // calibration |resid| = 1..10 -> k = ceil(11·0.9) = 10 -> q = 10;
    // test {5, 10, 11} -> 2 of 3 covered
    val rows = ((1L to 10L).map(r => (r, true)) ++
      Seq((5L, false), (10L, false), (11L, false)))
      .toDF("resid", "is_cal")
    val r = Experiment.conformalCoverage(rows, "resid", "is_cal", 90)
      .collect().head
    assert(r.toSeq == Seq(10L, 3L, 10L, 2L, 666666L))
    // alpha 50: k = ceil(11·0.5) = 6 -> q = 6; covers only the 5
    val r2 = Experiment.conformalCoverage(rows, "resid", "is_cal", 50)
      .collect().head
    assert(r2.getLong(2) == 6L && r2.getLong(3) == 1L)
    // negative residuals fold into |.|; ties at the radius count as
    // covered (<=)
    val neg = Seq((-3L, true), (3L, true), (-2L, true), (2L, true),
      (-3L, false), (4L, false)).toDF("resid", "is_cal")
    val r3 = Experiment.conformalCoverage(neg, "resid", "is_cal", 90)
      .collect().head
    assert(r3.getLong(2) == 3L, s"q was ${r3.getLong(2)}")
    assert(r3.getLong(3) == 1L)
    // grain bound fails loudly
    val wide = (1L to 50L).map(r => (r * 1000L, true))
      .toDF("resid", "is_cal")
      .unionByName(Seq((1L, false)).toDF("resid", "is_cal"))
    intercept[Exception] {
      Experiment.conformalCoverage(wide, "resid", "is_cal", 90,
        maxDistinct = 10L).collect()
    }
  }

  test("eventTrigrams: consecutive-only paths, deterministic top-k") {
    val ev = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (1L, 4L, "view"),
      (2L, 1L, "view"), (2L, 2L, "click"), (2L, 3L, "purchase"))
      .zipWithIndex.map { case ((u, t0, ty), i) =>
        (i.toLong, t0 * 1000000000L, u, ty, 0.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Attribution.eventTrigrams(ev, 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(out(("view", "click", "purchase")) == 2L)
    assert(out(("click", "purchase", "view")) == 1L)
    assert(out.size == 2, "windows never cross users or skip events")
    // the top-k cut is count-then-path deterministic
    val top = Attribution.eventTrigrams(ev, 1).collect().head
    assert((top.getString(0), top.getString(1), top.getString(2)) ==
      (("view", "click", "purchase")))
  }

  test("calibrationBins: hand bins, constant-score degeneracy") {
    val d = (0L to 9L).map(s => (s, if (s >= 5) 1L else 0L))
      .toDF("sc", "y")
    val m = Experiment.calibrationBins(d, "sc", "y", nBins = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m(0L) == ((5L, 2L, 0L)))
    assert(m(1L) == ((5L, 7L, 1000000L)))
    // constant score: single bin 0, no division blowup
    val c = Seq((7L, 1L), (7L, 0L)).toDF("sc", "y")
    val mc = Experiment.calibrationBins(c, "sc", "y", nBins = 10)
      .collect()
    assert(mc.length == 1 && mc.head.getLong(0) == 0L &&
      mc.head.getLong(3) == 500000L)
    // bins never exceed [0, nBins): max score lands in the top bin
    val w = (0L to 100L).map(s => (s, 0L)).toDF("sc", "y")
    val bins = Experiment.calibrationBins(w, "sc", "y", nBins = 7)
      .collect().map(_.getLong(0))
    assert(bins.min == 0L && bins.max == 6L)
  }

  test("mutualInfo: independence floor, dependence ceiling") {
    // perfectly dependent 2x2: MI = ln 2 (in nano-nats)
    val dep = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("x", "y")
    val rd = Profile.mutualInfo(dep, "x", "y").collect().head
    assert(rd.getLong(0) == 4L && rd.getLong(3) == 2L)
    assert(rd.getLong(4) == 693147180L, s"got ${rd.getLong(4)}")
    // independent uniform 2x2: every cell term is exactly 0
    val ind = Seq(("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"))
      .toDF("x", "y")
    val ri = Profile.mutualInfo(ind, "x", "y").collect().head
    assert(ri.getLong(4) == 0L && ri.getLong(3) == 4L)
    // partition independence (exact integer sum)
    val rp = Profile.mutualInfo(dep.repartition(5), "x", "y")
      .collect().head
    assert(rp.getLong(4) == rd.getLong(4))
  }

  test("cohortRetention: hand triangle, ppm exactness") {
    val day = 86400L * 1000000L * us // one day of event-ts nanos
    // users 1,2 start day 0; user 1 returns day 1; user 3 starts day 1
    // and returns day 2
    val ev = Seq((1L, 0L), (2L, 0L), (1L, 1L), (3L, 1L), (3L, 2L),
      (1L, 1L)) // duplicate same-day activity must not double count
      .zipWithIndex.map { case ((u, d), i) =>
        (i.toLong, d * day + i, u, "view", 0.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val m = Attribution.cohortRetention(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(m((0L, 0L)) == ((2L, 2L, 1000000L)))
    assert(m((0L, 1L)) == ((2L, 1L, 500000L)))
    assert(m((1L, 0L)) == ((1L, 1L, 1000000L)))
    assert(m((1L, 1L)) == ((1L, 1L, 1000000L)))
    assert(m.size == 4, "no empty cells, no day-0 double counting")
  }

  test("snapshotDrift: null rate, distinct, mode share per column") {
    val ref = Seq(("a", "x"), ("a", "y"), ("b", null))
      .toDF("k", "p")
    val cur = Seq(("a", null), ("c", null), ("c", null), ("c", "z"))
      .toDF("k", "p")
    val m = Profile.snapshotDrift(ref, cur, Seq("k", "p"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    // k: ref n=3 nulls=0 distinct=2 mode a(2/3); cur n=4 distinct=2
    // mode c(3/4)
    assert(m("k") == Seq(3L, 4L, 0L, 0L, 2L, 2L, 666666L, 750000L))
    // p: ref 1 null of 3, distinct 2, mode share 1/3; cur 3 nulls of 4,
    // distinct 1, mode z (1/4)
    assert(m("p") == Seq(3L, 4L, 333333L, 750000L, 2L, 1L, 333333L,
      250000L))
  }

  test("rougeN: clipped overlap, F1 hand value, zero-gram guards") {
    // cand "a b a b" bigrams: {a b:2, b a:1}; ref "a b c" bigrams:
    // {a b:1, b c:1} -> overlap clipped = 1; P = 1/3, R = 1/2,
    // F1 = 2·(1/3)(1/2)/(1/3+1/2) = 0.4
    val p = Seq((1L, "a b a b", "a b c")).toDF("pair_id", "cand", "ref")
    val r = TextAnalysis.rougeN(p, 2).collect().head
    assert(r.toSeq == Seq(1L, 3L, 2L, 1L, 333333L, 500000L, 400000L),
      s"got ${r.toSeq}")
    // identical texts: perfect scores
    val same = Seq((2L, "x y z", "x y z")).toDF("pair_id", "cand", "ref")
    val rs = TextAnalysis.rougeN(same, 2).collect().head
    assert(rs.getLong(4) == 1000000L && rs.getLong(5) == 1000000L &&
      rs.getLong(6) == 1000000L)
    // a one-token candidate has zero bigrams: zero scores, never NaN
    val short = Seq((3L, "x", "x y z")).toDF("pair_id", "cand", "ref")
    val rz = TextAnalysis.rougeN(short, 2).collect().head
    assert(rz.getLong(1) == 0L && rz.getLong(4) == 0L &&
      rz.getLong(6) == 0L)
    // clipping: repeating a reference bigram in cand earns it once
    val clip = Seq((4L, "q r q r q r", "q r s")).toDF("pair_id",
      "cand", "ref")
    val rc = TextAnalysis.rougeN(clip, 2).collect().head
    assert(rc.getLong(3) == 1L, s"clipped overlap was ${rc.getLong(3)}")
    // unigram mode
    val u = TextAnalysis.rougeN(p, 1).collect().head
    assert(u.getLong(1) == 4L && u.getLong(2) == 3L &&
      u.getLong(3) == 2L) // a:min(2,1)=1, b:min(2,1)=1, c:0
  }

  test("vocabRichness: hand f1/f2, all-singleton and converged corpora") {
    // tokens: a a a b b c d -> N=7, D=4, f1=2 (c,d), f2=1 (b)
    // chao1 = 4 + 2*1 div (2*2) = 4; gt = 2e6 div 7 = 285714
    val d = Seq((1L, "a a a b"), (2L, "b c d")).toDF("doc_id", "text")
    val r = TextAnalysis.vocabRichness(d).collect().head
    assert(r.toSeq == Seq(7L, 4L, 2L, 1L, 4L, 285714L, 500000L))
    // all singletons: chao1 = D + D(D-1)/2 — far above observed
    val s = Seq((1L, "p q r s")).toDF("doc_id", "text")
    val rs = TextAnalysis.vocabRichness(s).collect().head
    assert(rs.getLong(4) == 4L + 6L)
    assert(rs.getLong(5) == 1000000L)
    // converged corpus (no singletons): estimate equals observed
    val c = Seq((1L, "m m n n")).toDF("doc_id", "text")
    val rc = TextAnalysis.vocabRichness(c).collect().head
    assert(rc.getLong(4) == rc.getLong(1) && rc.getLong(5) == 0L)
  }

  test("kaplanMeier: textbook table, censoring excluded from deaths") {
    // lifetimes: deaths at t=1 (1 of 5) and t=3 (1 of 3); censorings at
    // t=2 and t=5; one more subject survives to t=5 censored.
    //   t=1: n=5, d=1 -> S = 4/5
    //   t=2: n=4, d=0, c=1 -> S unchanged
    //   t=3: n=3, d=1 -> S = 4/5 * 2/3 = 8/15
    //   t=5: n=2, d=0, c=2 -> S unchanged
    val lt = Seq((1L, 1L), (2L, 0L), (3L, 1L), (5L, 0L), (5L, 0L))
      .toDF("t", "death")
    val rows = Attribution.kaplanMeier(lt, "t", "death")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(rows(1L)._1 == 5L && rows(1L)._2 == 1L)
    assert(rows(2L)._1 == 4L && rows(2L)._2 == 0L && rows(2L)._3 == 1L)
    assert(rows(3L)._1 == 3L && rows(3L)._2 == 1L)
    assert(rows(5L)._1 == 2L && rows(5L)._3 == 2L)
    assert(rows(1L)._5 == 0.8)
    assert(rows(2L)._5 == 0.8, "pure censoring must not move S")
    assert(math.abs(rows(3L)._5 - 8.0 / 15.0) < 2e-6)
    assert(rows(5L)._5 == rows(3L)._5)
    // log_surv is monotone nonincreasing
    val logs = Attribution.kaplanMeier(lt, "t", "death")
      .orderBy("t").collect().map(_.getLong(4))
    assert(logs.sliding(2).forall(p => p(1) <= p(0)))
    // total extinction: sentinel drives S to exactly 0.0, never NaN
    val ext = Seq((1L, 1L), (2L, 1L)).toDF("t", "death")
    val er = Attribution.kaplanMeier(ext, "t", "death")
      .orderBy("t").collect()
    assert(er.last.getDouble(5) == 0.0)
    assert(er.head.getDouble(5) == 0.5)
    // bounded-grain contract: too many distinct lifetimes fails LOUDLY
    val wide = (1 to 50).map(i => (i.toLong, 1L)).toDF("t", "death")
    val ex = intercept[Exception] {
      Attribution.kaplanMeier(wide, "t", "death", maxDistinctT = 10L)
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("diffInDiff: removes the selection gap a raw diff keeps") {
    // arm0 (user 0): 1.0 -> 2.0; arm1 (user 1): 1.0 -> 5.0
    // DiD = (5-1) - (2-1) = 3.0 -> 3,000,000 micro
    val ev = Seq(
      (1L, 0L, 0L, "purchase", 1.0), (2L, 100L, 0L, "purchase", 2.0),
      (3L, 0L, 1L, "purchase", 1.0), (4L, 100L, 1L, "purchase", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Experiment.diffInDiff(ev).collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 2.0)
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 5.0)
    assert(r.getLong(6) == 3000000L)
    // a level gap with parallel trends: DiD must read 0 even though the
    // raw post-period diff is 9
    val lvl = Seq(
      (1L, 0L, 0L, "p", 1.0), (2L, 100L, 0L, "p", 2.0),
      (3L, 0L, 1L, "p", 10.0), (4L, 100L, 1L, "p", 11.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Experiment.diffInDiff(lvl).collect().head.getLong(6) == 0L)
    // an arm missing entirely: NULL, never a 0-division
    val solo = Seq((1L, 0L, 0L, "p", 1.0), (2L, 100L, 0L, "p", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Experiment.diffInDiff(solo).collect().head.get(6) == null)
  }

  test("interArrivalBurstiness: metronome -1, bursts positive, floors") {
    def ev(uid: Long, secs: Seq[Long], base: Long = 0L) =
      secs.zipWithIndex.map { case (t0, i) =>
        (base + i.toLong, t0 * 1000000000L, uid, "view", 0.0)
      }
    val rows = (ev(1L, Seq(0L, 10L, 20L, 30L)) ++        // metronome
      ev(2L, Seq(0L, 0L, 0L, 30L), 100L) ++              // bursty
      ev(3L, Seq(0L, 5L), 200L))                          // 1 gap: dropped
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val m = TimeSeries.interArrivalBurstiness(rows, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getAs[java.lang.Long]("b_micro"))))
      .toMap
    assert(m(1L) == ((3L, 10L, -1000000L)))
    // gaps 0,0,30: mu=10, sigma=sqrt(200) -> B = 0.171572... -> 171572
    assert(m(2L)._1 == 3L && m(2L)._2 == 10L)
    assert(m(2L)._3 > 170000L && m(2L)._3 < 175000L,
      s"bursty B was ${m(2L)._3}")
    assert(!m.contains(3L), "a single gap carries no variance signal")
    // all events at one instant: sigma + mu = 0 -> NULL
    val z = ev(9L, Seq(0L, 0L, 0L))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rz = TimeSeries.interArrivalBurstiness(z, "user_id", "ts")
      .collect().head
    assert(rz.get(3) == null)
  }

  test("keyedTrend: exact rational slope, flooring, degenerate NULL") {
    // y = 3t + 7 exactly -> slope_milli = 3000; one key flat -> 0;
    // one key with a single point -> NULL
    val s = ((0L to 9L).map(t0 => ("up", t0, 3 * t0 + 7)) ++
      (0L to 5L).map(t0 => ("flat", t0, 4L)) ++
      Seq(("one", 5L, 9L)))
      .toDF("k", "ord", "v")
    val m = TimeSeries.keyedTrend(s, "k", "ord", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getAs[java.lang.Long]("slope_milli")))).toMap
    assert(m("up") == ((10L, 3000L)))
    assert(m("flat") == ((6L, 0L)))
    assert(m("one") == ((1L, null)))
    // non-integer slope floors: y = t/2 over t=0..3 (0,0,1,1) ->
    // slope = 2/5 -> 400 milli
    val h = (0L to 3L).map(t0 => ("h", t0, t0 / 2))
      .toDF("k", "ord", "v")
    assert(TimeSeries.keyedTrend(h, "k", "ord", "v")
      .collect().head.getLong(2) == 400L)
    // ord re-basing: shifting all ords must not move the slope
    val sh = ((100L to 109L).map(t0 => ("up", t0, 3 * (t0 - 100) + 7)))
      .toDF("k", "ord", "v")
    assert(TimeSeries.keyedTrend(sh, "k", "ord", "v")
      .collect().head.getLong(2) == 3000L)
    // TRUNCATING division on a NEGATIVE non-exact slope rounds toward
    // ZERO (not down): ords (0,1,2,4), values (0,1,0,0) -> n=4, Σt=7,
    // Σc=1, Σtt=21, Σtc=1 -> num=-3, den=35 -> -3000 div 35 = -85 in
    // BOTH engines (Spark div and DuckDB // truncate; floor would be -86)
    val neg = Seq(("n", 0L, 0L), ("n", 1L, 1L), ("n", 2L, 0L),
      ("n", 4L, 0L)).toDF("k", "ord", "v")
    assert(TimeSeries.keyedTrend(neg, "k", "ord", "v")
      .collect().head.getLong(2) == -85L)
  }

  test("keyedTrend: loud bound on cross-moment overflow") {
    // one key whose re-based ords and values push n·Σtc past the
    // exact-BIGINT envelope: the guard must fail the job loudly, never
    // wrap to a silently wrong slope (r9 advice). Per-row products and
    // the moment sums themselves stay inside BIGINT (Σtt = Σtc = 5e18)
    // so it is exactly the guarded n·Σ product that trips.
    val big = Seq(("x", 0L, 0L), ("x", 1000000000L, 1000000000L),
      ("x", 2000000000L, 2000000000L))
      .toDF("k", "ord", "v")
    val e = intercept[Exception] {
      TimeSeries.keyedTrend(big, "k", "ord", "v").collect()
    }
    assert(e.getMessage.contains("exact-BIGINT") ||
      Option(e.getCause).exists(_.getMessage.contains("exact-BIGINT")))
  }

  test("welch: hand t/df, zero-diff case, degenerate guards") {
    // users 0,2 -> arm0 (totals 100, 300 centi); users 1,3 -> arm1
    def ev(vals: (Long, Double)*) = vals.zipWithIndex.map {
      case ((uid, v), i) => (i.toLong, 1000000L + i, uid, "purchase", v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    // equal means: v0=20000, v1=0, se2=10000 -> t=0, df = 1e8/1e8 = 1
    val r1 = Experiment.welch(ev((0L, 1.0), (2L, 3.0), (1L, 2.0),
      (3L, 2.0))).collect().head
    assert(r1.getLong(0) == 2L && r1.getLong(1) == 2L)
    assert(r1.getDouble(2) == 2.0 && r1.getDouble(3) == 2.0)
    assert(r1.getLong(4) == 0L)
    assert(r1.getLong(5) == 1000000L)
    // shifted arm1 (400, 600 centi): v0=v1=20000, se2=20000,
    // t = -300/sqrt(20000) = -2.1213203..., df = 4e8/2e8 = 2
    val r2 = Experiment.welch(ev((0L, 1.0), (2L, 3.0), (1L, 4.0),
      (3L, 6.0))).collect().head
    assert(r2.getLong(4) == -2121320L, s"t_micro was ${r2.getLong(4)}")
    assert(r2.getLong(5) == 2000000L)
    // an arm with a single user: guarded to NULL, never a 0/0 NaN
    val r3 = Experiment.welch(ev((0L, 1.0), (2L, 3.0), (1L, 4.0)))
      .collect().head
    assert(r3.get(4) == null && r3.get(5) == null)
    // both arms constant: zero pooled variance -> NULL
    val r4 = Experiment.welch(ev((0L, 5.0), (2L, 5.0), (1L, 5.0),
      (3L, 5.0))).collect().head
    assert(r4.get(4) == null && r4.get(5) == null)
  }

  test("autocorrelation: alternating series, constant series, partitions") {
    // x = 0,10,0,10,... (n=8): x̄=5, den = 8·25 = 200.
    // lag 1: 7 pairs, each (x−5)(y−5) = −25 → r = −175/200 = −0.875
    // lag 2: 6 pairs, each +25 → r = 150/200 = 0.75
    val alt = (1 to 8).map(i => ("k", i.toLong, if (i % 2 == 1) 0L else 10L))
      .toDF("key", "ord", "v")
    val m = TimeSeries.autocorrelation(alt, "key", "ord", "v", maxLag = 2)
      .collect().map(r => r.getInt(1) ->
        (r.getLong(2), r.getAs[java.lang.Long]("acf_micro"))).toMap
    assert(m(1) == ((7L, -875000L)))
    assert(m(2) == ((6L, 750000L)))
    // constant series: zero variance -> NULL, never NaN
    val const = (1 to 6).map(i => ("c", i.toLong, 4L)).toDF("key", "ord", "v")
    val c = TimeSeries.autocorrelation(const, "key", "ord", "v", maxLag = 2)
      .collect()
    assert(c.forall(_.get(3) == null))
    // partition independence: repartitioned input, identical panel
    val m2 = TimeSeries.autocorrelation(alt.repartition(5), "key", "ord",
        "v", maxLag = 2)
      .collect().map(r => r.getInt(1) ->
        (r.getLong(2), r.getAs[java.lang.Long]("acf_micro"))).toMap
    assert(m2 == m)
  }

  test("waterfillBudget: caps dominant strata, keeps small strata whole") {
    val docs = ((1 to 10).map(i => (i.toLong, "a")) ++
      (1 to 20).map(i => (100L + i, "b")) ++
      (1 to 100).map(i => (1000L + i, "c")))
      .toDF("doc_id", "lang")
    // budget 50: a(10) and b(20) fit whole; cap lands at
    // (50 - 30) div 1 = 20 on c -> allocs 10/20/20, exactly the budget
    val m = Sampling.waterfillBudget(docs, "lang", budget = 50L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[java.lang.Long]("cap"), r.getLong(3))).toMap
    assert(m("a") == ((10L, 20L, 10L)))
    assert(m("b") == ((20L, 20L, 20L)))
    assert(m("c") == ((100L, 20L, 20L)))
    // budget covers everything: cap is null, every stratum kept whole
    val whole = Sampling.waterfillBudget(docs, "lang", budget = 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[java.lang.Long]("cap"), r.getLong(3))).toMap
    assert(whole("a") == ((null, 10L)))
    assert(whole("c") == ((null, 100L)))
    // budget 0: cap 0, nothing allocated
    val zero = Sampling.waterfillBudget(docs, "lang", budget = 0L)
      .collect().map(r => r.getLong(3))
    assert(zero.forall(_ == 0L))
    // property: sum(alloc) never exceeds the budget; when a cap binds,
    // the undershoot is strictly less than the number of capped strata
    // (C maximal => raising it by 1 would overshoot, and each capped
    // stratum absorbs at most 1 of that raise)
    for (b <- Seq(1L, 7L, 29L, 50L, 99L, 130L, 500L)) {
      val rows = Sampling.waterfillBudget(docs, "lang", b).collect()
      val total = rows.map(_.getLong(3)).sum
      val capped = rows.count(r => r.getLong(1) > r.getLong(3))
      assert(total <= b, s"budget $b: allocated $total overshoots")
      if (capped > 0)
        assert(b - total < capped,
          s"budget $b: allocated $total, slack exceeds $capped capped strata")
      else assert(total == 130L,
        s"budget $b: uncapped run must keep every doc, got $total")
    }
  }

  test("distinctNgramDiversity: hand counts over a template-heavy corpus") {
    // doc 1: "x y x y"  -> unigrams 4 (distinct 2), bigrams 3
    //   ("x y","y x","x y" -> distinct 2), trigrams 2 (distinct 2)
    // doc 2: "x y"      -> unigrams 2 (distinct 2), bigram "x y", no tri
    val docs = Seq((1L, "x y x y"), (2L, "x y")).toDF("doc_id", "text")
    val m = TextAnalysis.distinctNgramDiversity(docs)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m(1) == ((6L, 2L, 333333L)))
    assert(m(2) == ((4L, 2L, 500000L)))
    assert(m(3) == ((2L, 2L, 1000000L)))
    // partition independence: repartitioned input, identical panel
    val m2 = TextAnalysis.distinctNgramDiversity(docs.repartition(7))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m2 == m)
  }
}
