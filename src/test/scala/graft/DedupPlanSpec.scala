package graft

import org.apache.spark.sql.catalyst.expressions.ArrayTransform
import org.apache.spark.sql.catalyst.plans.logical.Join

import graft.ext.Dedup

/** Plan-level regression locks for the dedup pipeline's scale posture:
 * the shingle derivation must stay inside codegen (no interpreted
 * higher-order functions), and jaccard must not force broadcast hints on
 * corpus-cardinality relations (driver OOM at scale — round-1 finding). */
class DedupPlanSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = (1 to 30)
    .map(i => (i.toLong, (1 to 20).map(j => s"w${(i + j) % 13}").mkString(" ")))
    .toDF("doc_id", "text")

  test("shingle derivation contains no interpreted higher-order function") {
    val analyzed = Dedup.shingles(docs).queryExecution.analyzed
    val hofs = analyzed.collect {
      case p if p.expressions.exists(_.collectFirst { case t: ArrayTransform => t }.isDefined) => p
    }
    assert(hofs.isEmpty, "ArrayTransform found — shingling left WholeStageCodegen")
  }

  test("simhashPairs plans a band-equality join, never a cartesian product") {
    val plan = Dedup.simhashPairs(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"all-pairs join shape found in:\n$plan")
  }

  test("rp-cell knn prunes unused columns and pushes the query filter") {
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet")
    val plan = graft.ext.Similarity
      .knnRp(emb.filter($"vec_id" < 10), emb, 3)
      .queryExecution.executedPlan.toString
    // embeddings carries a `label` column the rp path never touches — the
    // scan must not read it (IVF posture: featherweight derivation scan)
    val scans = plan.linesIterator.filter(_.contains("ReadSchema")).toList
    assert(scans.nonEmpty && scans.forall(!_.contains("label")),
      s"label column not pruned from scans:\n${scans.mkString("\n")}")
    assert(plan.contains("vec_id"), "pushed query-id filter missing")
    assert(!plan.contains("CartesianProduct"))
  }

  test("reliable checkpoint mode produces identical pairs (cluster posture)") {
    // graft.checkpoint.reliable=true switches every pipeline materialization
    // from localCheckpoint (executor blocks) to a RELIABLE checkpoint in the
    // session checkpoint dir — the posture a multi-hour cluster run needs.
    // Previously untested (round-3 verdict #8).
    val nearDup = docs.union(
      Seq((1001L, (1 to 20).map(j => s"w${(1 + j) % 13}").mkString(" ")))
        .toDF("doc_id", "text"))
    val expected = Dedup.minhashDedupPairs(nearDup, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty)

    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft_reliable_ckpt").toString
    val priorDir = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(ckptDir)
    spark.conf.set(Dedup.ReliableCheckpointConf, "true")
    try {
      val got = Dedup.minhashDedupPairs(nearDup, 0.8)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(got == expected)
      // the reliable checkpoint actually wrote to the configured dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "no files under the reliable checkpoint dir")
    } finally {
      spark.conf.unset(Dedup.ReliableCheckpointConf)
      priorDir.foreach(spark.sparkContext.setCheckpointDir)
    }
  }

  test("property: chain graphs converge well inside the round bound") {
    // Pathological worst case for plain label propagation: an n-link chain
    // needs n rounds; the pointer-jumping rounds must cut that to
    // O(log n) — a 256-node chain inside 12 rounds, nowhere near the
    // default 25 (round-3 verdict #9). Plain ScalaCheck generators under
    // fixed seeds, same discipline as SpineProperties.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genChain: Gen[Seq[Long]] = for {
      n <- Gen.choose(2, 256)
      ids <- Gen.pick(n, 1 to 100000)
    } yield new scala.util.Random(n).shuffle(ids.map(_.toLong).toList)
    val chains = (1 to 4).flatMap(i =>
      genChain.apply(Gen.Parameters.default, Seed(i.toLong)))
    for (chain <- chains) {
      val edges = chain.sliding(2).collect { case Seq(a, b) => (a, b) }.toSeq
      val pairs = edges.toDF("doc_a", "doc_b")
      val labels = Dedup.dupClusters(pairs, maxIter = 12)
        .as[(Long, Long)].collect()
      val expectedMin = chain.min
      assert(labels.length == chain.length)
      assert(labels.forall(_._2 == expectedMin),
        s"chain of ${chain.length} did not fully converge in 12 rounds")
    }
  }

  test("shinglesN assembles all leads over ONE window sort at any width") {
    // 12 leads over the same window spec must collapse into a single
    // Window node (one per-partition sort) — 12 separate sorts would make
    // the 13-gram scan pay 12x its sort cost.
    val plan = Dedup.shinglesN(docs, 13).queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.length == 1, s"expected one Window node:\n$plan")
    assert(windows.head.windowExpressions.length == 12)
  }

  test("winnowFingerprints rides ONE exchange end-to-end") {
    // the selection window, the full-window guard and the distinct must
    // all reuse positionedShingles' doc_id repartition — a second
    // exchange would mean the sketch pays the corpus shuffle twice
    // string-count: under AQE the adaptive root does not expose the
    // inner plan as a child, so a node collect() sees zero exchanges
    val plan = Dedup.winnowFingerprints(docs, 3, 4)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1,
      s"expected one exchange:\n$plan")
  }

  test("property: random graphs cluster to exact union-find components") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val ids = Seq.fill(60)(rnd.nextInt(100000).toLong).distinct
      val edges = Seq.fill(70)(
        (ids(rnd.nextInt(ids.size)), ids(rnd.nextInt(ids.size))))
        .filter(e => e._1 != e._2)
      // union-find reference
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val inPair = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val byRoot = inPair.groupBy(find)
      val expected = byRoot.values.flatMap { comp =>
        val m = comp.min
        comp.map(_ -> m)
      }.toMap
      val got = Dedup.dupClusters(edges.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"seed $seed")
    }
  }

  test("removeDuplicateSpans cuts the non-keeper span, keeps the rest") {
    val in = Seq(
      (1L, "a b c d e f g h"),          // keeper of the shared span
      (2L, "x y a b c d e z"),          // loses "a b c d e", keeps the rest
      (3L, "p q r s t u"))              // untouched
      .toDF("doc_id", "text")
    val out = graft.ext.Dedup.removeDuplicateSpans(in, 4)
      .as[(Long, Int, String)].collect()
      .map { case (k, n, t) => k -> ((n, t)) }.toMap
    assert(out(1L) == ((8, "a b c d e f g h")))
    assert(out(2L) == ((3, "x y z")))
    assert(out(3L) == ((6, "p q r s t u")))
  }

  test("removeDuplicateSpans: a fully-duplicated doc comes back empty, not dropped") {
    val in = Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("doc_id", "text")
    val out = graft.ext.Dedup.removeDuplicateSpans(in, 5)
      .as[(Long, Int, String)].collect()
      .map { case (k, n, t) => k -> ((n, t)) }.toMap
    assert(out(1L) == ((5, "a b c d e")))
    assert(out(2L) == ((0, "")))
  }

  test("removeDuplicateSpansToFixpoint catches spans created by cut adjacency") {
    // cutting "D1 D2 D3" out of doc 3 makes "a b" adjacent to "c" — a NEW
    // 3-token span duplicating doc 1 that the single pass cannot see
    val in = Seq(
      (1L, "a b c"),
      (2L, "D1 D2 D3"),
      (3L, "a b D1 D2 D3 c z1 z2"))
      .toDF("doc_id", "text")
    val once = graft.ext.Dedup.removeDuplicateSpans(in, 3)
      .as[(Long, Int, String)].collect().map(r => r._1 -> r._3).toMap
    assert(once(3L) == "a b c z1 z2")       // boundary-created dup survives
    val fixed = graft.ext.Dedup.removeDuplicateSpansToFixpoint(in, 3)
      .as[(Long, Int, String)].collect().map(r => r._1 -> r._3).toMap
    assert(fixed == Map(1L -> "a b c", 2L -> "D1 D2 D3", 3L -> "z1 z2"))
    // the fixpoint guarantee: no 3-token span appears in two output docs
    val wins = fixed.toSeq.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
        .map(w => (w.mkString(" "), id))
    }
    wins.groupBy(_._1).foreach { case (sh, occ) =>
      assert(occ.map(_._2).distinct.size == 1, s"span '$sh' in two docs") }
  }

  test("property: no duplicated >=w-token span survives across any two docs") {
    val w = 5
    for (seed <- Seq(7, 21, 42)) {
      val rnd = new scala.util.Random(seed)
      val base = Array.tabulate(30) { i =>
        Seq.fill(20 + rnd.nextInt(40))(s"v${rnd.nextInt(50)}")
      }
      // plant cross-doc duplicates: splice a >=w-token slice of doc a into b
      for (_ <- 0 until 10) {
        val a = rnd.nextInt(base.length)
        val b = (a + 1 + rnd.nextInt(base.length - 1)) % base.length
        val len = w + rnd.nextInt(8)
        val from = rnd.nextInt(math.max(1, base(a).length - len))
        val span = base(a).slice(from, from + len)
        val at = rnd.nextInt(base(b).length + 1)
        base(b) = base(b).take(at) ++ span ++ base(b).drop(at)
      }
      val in = base.zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
        .toSeq.toDF("doc_id", "text")
      val out = graft.ext.Dedup.removeDuplicateSpans(in, w)
      val crossDocDups = graft.ext.Dedup.shinglesN(
          out.select($"doc_id", $"text_dedup".as("text")), w)
        .groupBy("sh")
        .agg(org.apache.spark.sql.functions.countDistinct("doc_id").as("nd"))
        .filter($"nd" > 1).count()
      assert(crossDocDups == 0, s"seed $seed: duplicated $w-token span survived")
    }
  }

  test("decontamination plans a shingle-keyed join, never all-pairs") {
    val bench = docs.filter($"doc_id" % 7 === 0)
    val plan = Dedup.decontaminationHits(docs, bench, minOverlap = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"all-pairs join shape found in:\n$plan")
  }

  test("property: rareShingleCandidates equals the brute-force reference") {
    // The single-exchange rewrite (join + same-key groupBy + in-group pair
    // expansion) must emit EXACTLY the naive inverted-index pairs: all
    // (a, b), a < b, sharing at least one shingle with df in [2, maxDf].
    for (seed <- Seq(3, 17, 99); maxDf <- Seq(2, 3, 5)) {
      val rnd = new scala.util.Random(seed)
      val corpus = (1 to 40).map { i =>
        (i.toLong, Seq.fill(8 + rnd.nextInt(12))(s"w${rnd.nextInt(60)}").mkString(" "))
      }.toDF("doc_id", "text")
      val sh = Dedup.shingles(corpus)
      val rows = sh.as[(Long, String)].collect()
      val byShingle = rows.groupBy(_._2).values
        .map(g => g.map(_._1).distinct.toSeq).toSeq
      val expected = byShingle
        .filter(d => d.length >= 2 && d.length <= maxDf)
        .flatMap(d => for (a <- d; b <- d if a < b) yield (a, b))
        .toSet
      val got = Dedup.rareShingleCandidates(sh, maxDf)
        .as[(Long, Long)].collect().toSet
      assert(got == expected, s"seed $seed maxDf $maxDf")
    }
  }

  test("jaccard plan carries no forced broadcast hints") {
    val sh = Dedup.shingles(docs).persist()
    sh.count()
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val optimized = Dedup.jaccard(pairs, sh).queryExecution.optimizedPlan
    val hinted = optimized.collect {
      case j: Join if j.hint.leftHint.exists(_.strategy.isDefined) ||
        j.hint.rightHint.exists(_.strategy.isDefined) => j
    }
    assert(hinted.isEmpty,
      "forced join-strategy hint found — broadcast decisions belong to AQE here")
  }
}
