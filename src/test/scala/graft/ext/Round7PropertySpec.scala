package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-7 operators vs INDEPENDENT brute-force references computed in
 * plain Scala (the PSL-spec discipline: a second implementation nobody
 * shares code with, over seeded random inputs). */
class Round7PropertySpec extends SparkTestBase {

  import spark.implicits._

  test("peakConcurrency equals the O(n²) interval-overlap reference") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val dur = 50L
      val events = Seq.tabulate(300)(i =>
        (s"k${rnd.nextInt(4)}", rnd.nextInt(500).toLong))
      // reference: concurrency is maximized at some interval start; for
      // each start s count intervals with ts <= s < ts + dur
      val expected = events.groupBy(_._1).map { case (k, es) =>
        val starts = es.map(_._2)
        val atStart = starts.distinct.map(s =>
          s -> starts.count(t => t <= s && s < t + dur))
        val peak = atStart.map(_._2).max
        k -> ((peak.toLong, atStart.filter(_._2 == peak).map(_._1).min))
      }
      val got = TimeSeries.peakConcurrency(
          events.toDF("k", "ts"), "k", "ts", dur)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got == expected, s"seed $seed")
    }
  }

  test("sourceOverlap equals the brute shingle-set reference") {
    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e")
      val docs = Seq.tabulate(60)(i => (i.toLong,
        Seq.fill(3 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "),
        s"s${rnd.nextInt(3)}"))
      val shingleSets = docs.groupBy(_._3).map { case (src, ds) =>
        src -> ds.flatMap { case (_, text, _) =>
          val w = text.split(" ")
          if (w.length < 3) Nil else w.sliding(3).map(_.mkString(" ")).toSeq
        }.toSet
      }
      val expected = (for {
        (sa, setA) <- shingleSets; (sb, setB) <- shingleSets
        if sa < sb
        both = (setA intersect setB).size if both > 0
      } yield (sa, sb) -> ((setA.size.toLong, setB.size.toLong,
        both.toLong))).toMap
      val got = Dedup.sourceOverlap(docs.toDF("doc_id", "text", "source"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got == expected, s"seed $seed")
    }
  }

  test("psiDrift totals equal the direct Laplace-smoothed formula") {
    for (seed <- Seq(5, 13)) {
      val rnd = new scala.util.Random(seed)
      val ref = Seq.fill(400)(rnd.nextInt(120).toLong)
      val cur = Seq.fill(300)(rnd.nextInt(150).toLong)
      val width = 25L
      def hist(xs: Seq[Long]) =
        xs.groupBy(v => math.floor(v.toDouble / width).toLong)
          .view.mapValues(_.size.toLong).toMap
      val (hr, hc) = (hist(ref), hist(cur))
      val buckets = (hr.keySet ++ hc.keySet).toSeq.sorted
      val (nr, nc, b) = (ref.size.toLong, cur.size.toLong,
        buckets.size.toLong)
      val expected = buckets.map { bk =>
        val p = (hr.getOrElse(bk, 0L) + 1).toDouble / (nr + b).toDouble
        val q = (hc.getOrElse(bk, 0L) + 1).toDouble / (nc + b).toDouble
        math.floor((p - q) * math.log(p / q) * 1e6 + 0.5).toLong
      }.sum
      val got = Profile.psiDrift(ref.toDF("v"), cur.toDF("v"), "v", width)
        .agg(sum("psi_micro")).first().getLong(0)
      assert(got == expected, s"seed $seed")
    }
  }

  test("phraseSearch equals the sliding-window brute count, " +
    "overlaps included") {
    // hand case: "x y x y x" holds phrase (x,y,x) at positions 0 AND 2 —
    // overlapping occurrences both count
    val hand = Seq((0L, "x y x y x")).toDF("doc_id", "text")
    val handGot = Retrieval.phraseSearch(hand, Seq("x", "y", "x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(handGot == Map(0L -> 2L))

    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d")
      val docs = Seq.tabulate(80)(i =>
        (i.toLong, Seq.fill(30)(vocab(rnd.nextInt(4))).mkString(" ")))
      val phrase = Seq("a", "b", "a")
      val expected = docs.map { case (id, text) =>
        id -> text.split(" ").sliding(phrase.length)
          .count(_.sameElements(phrase)).toLong
      }.filter(_._2 > 0).toMap
      val got = Retrieval.phraseSearch(docs.toDF("doc_id", "text"), phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed $seed")
    }
  }

  // independent seededHash twin for the winnowing reference (MessageDigest,
  // no Spark expressions shared with the implementation under test)
  private def refHash(sh: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${Dedup.WinnowSeed}:$sh".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  private def refWinnow(text: String, width: Int,
      win: Int): Set[(Int, Long)] = {
    val toks = text.split(" ")
    if (toks.length < width) return Set.empty
    val keys = toks.sliding(width).zipWithIndex.map { case (g, p) =>
      refHash(g.mkString(" ")) * Dedup.WinnowPosPack +
        (Dedup.WinnowPosPack - 1 - p)
    }.toVector
    // short-doc clamp (r7 advice #1): a doc with >= 1 shingle but fewer
    // than `win` of them selects the min of its single partial window
    (0 to math.max(keys.length - win, 0))
      .map(t => keys.slice(t, t + win).min)
      .toSet.map { k: Long =>
        ((Dedup.WinnowPosPack - 1 - (k % Dedup.WinnowPosPack)).toInt,
          k / Dedup.WinnowPosPack)
      }
  }

  test("winnowFingerprints equals the brute window-min reference") {
    for (seed <- Seq(5, 23)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f")
      // lengths straddle the below-width / single-window / general cases
      val docs = Seq.tabulate(60)(i => (i.toLong,
        Seq.fill(2 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")))
      val expected = docs.flatMap { case (id, text) =>
        refWinnow(text, 3, 4).map { case (p, f) => (id, p, f) }
      }.toSet
      val got = Dedup.winnowFingerprints(docs.toDF("doc_id", "text"), 3, 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("short docs select at least one fingerprint (r7 advice #1)") {
    // 4 tokens at width 3 = 2 shingles < win 4: before the clamp these
    // docs had NO full window and vanished from the sketch entirely —
    // two identical short docs could never pair in winnowCandidates
    val docs = Seq((0L, "p q r s"), (1L, "p q r s"), (2L, "u v w"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(Set(0L, 1L, 2L).forall(id => fps.exists(_._1 == id)),
      s"every doc with >= 1 shingle selects >= 1 fingerprint, got ${fps.toSeq}")
    // the partial window selects its MIN, so identical docs share it
    val pairs = Dedup.winnowCandidates(docs, 3, 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((0L, 1L)), pairs.toSeq.toString)
  }

  test("winnowCandidates equals the brute shared-fingerprint reference") {
    for (seed <- Seq(4, 17)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d")     // tiny vocab → shared fps
      val docs = Seq.tabulate(50)(i => (i.toLong,
        Seq.fill(6 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")))
      val maxPostings = 10
      val fpSets = docs.map { case (id, text) =>
        id -> refWinnow(text, 3, 4).map(_._2)
      }.toMap
      val df = fpSets.toSeq.flatMap(_._2.toSeq)
        .groupBy(identity).map { case (f, os) => f -> os.size }
      val live = df.collect {
        case (f, n) if n >= 2 && n <= maxPostings => f
      }.toSet
      val expected = (for {
        (a, fa) <- fpSets; (b, fb) <- fpSets if a < b
        shared = (fa intersect fb intersect live).size if shared >= 2
      } yield (a, b) -> shared.toLong).toMap
      val got = Dedup.winnowCandidates(docs.toDF("doc_id", "text"),
          3, 4, minShared = 2, maxPostings = maxPostings)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      assert(got == expected, s"seed $seed")
    }
  }

  test("winnowing guarantee: a shared run of win+width-1 tokens " +
      "always shares a fingerprint") {
    for (seed <- Seq(2, 9, 31)) {
      val rnd = new scala.util.Random(seed)
      // disjoint private vocabularies; the planted 6-token run (win=4,
      // width=3 → floor 4+3−1) is the ONLY cross-doc material
      val run = Seq.fill(6)(s"r${rnd.nextInt(3)}").mkString(" ")
      def noise(p: String, n: Int) =
        Seq.fill(n)(s"$p${rnd.nextInt(50)}").mkString(" ")
      val a = s"${noise("x", 1 + rnd.nextInt(10))} $run ${noise("x", 1 + rnd.nextInt(10))}"
      val b = s"${noise("y", 1 + rnd.nextInt(10))} $run ${noise("y", 1 + rnd.nextInt(10))}"
      val fps = Dedup.winnowFingerprints(
          Seq((0L, a), (1L, b)).toDF("doc_id", "text"), 3, 4)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      val fa = fps.collect { case (0L, f) => f }.toSet
      val fb = fps.collect { case (1L, f) => f }.toSet
      assert((fa intersect fb).nonEmpty, s"seed $seed")
    }
  }
}
