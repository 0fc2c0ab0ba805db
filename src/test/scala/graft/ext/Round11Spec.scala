package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-11 new-operator hand cases: isotonic calibration via the exact
 * bin-grain minimax (pinned against a reference sequential
 * pool-adjacent-violators implementation on exact rationals). */
class Round11Spec extends SparkTestBase {
  import spark.implicits._

  /** Reference weighted PAV on exact rationals: per input bin the fitted
   * (numerator, denominator) pair. */
  private def pavRef(bins: Seq[(Long, Long)]): Seq[(BigInt, BigInt)] = {
    val blocks = scala.collection.mutable.ListBuffer.empty[(BigInt, BigInt)]
    val sizes = scala.collection.mutable.ListBuffer.empty[Int]
    for ((w, y) <- bins) {
      var cw = BigInt(w); var cy = BigInt(y); var cn = 1
      while (blocks.nonEmpty &&
          blocks.last._2 * cw >= cy * blocks.last._1) {
        val (pw, py) = blocks.remove(blocks.size - 1)
        cn += sizes.remove(sizes.size - 1)
        cw += pw; cy += py
      }
      blocks += ((cw, cy)); sizes += cn
    }
    blocks.toSeq.zip(sizes).flatMap { case ((sw, sy), n) =>
      Seq.fill(n)((sy, sw))
    }
  }

  /** Rows for a bin spec: score = bin ordinal (scores 0..B-1 with
   * nBins = B make bin == score), w rows of which y are positive. */
  private def rowsOf(bins: Seq[(Long, Long)]) =
    bins.zipWithIndex.flatMap { case ((w, y), b) =>
      (0L until w).map(r => (b.toLong, if (r < y) 1L else 0L))
    }.toDF("s", "y")

  test("isotonicCalibration: the classic two-bin violation pools to " +
    "the joint average; a monotone input passes through unchanged") {
    val viol = Experiment.isotonicCalibration(
        rowsOf(Seq((1L, 1L), (1L, 0L))), "s", "y", nBins = 2)
      .orderBy("bin").collect().map(r => (r.getLong(4))).toSeq
    assert(viol == Seq(500000L, 500000L), s"pooled halves: $viol")
    val mono = Experiment.isotonicCalibration(
        rowsOf(Seq((4L, 0L), (4L, 2L), (4L, 4L))), "s", "y", nBins = 3)
      .orderBy("bin").collect()
      .map(r => (r.getLong(3), r.getLong(4))).toSeq
    assert(mono.forall { case (raw, iso) => raw == iso },
      s"already-monotone rates must be fixed points: $mono")
  }

  test("isotonicCalibration: minimax equals the sequential PAV on exact " +
    "rationals (seeded random bins), and the output is monotone") {
    val bins = (0 until 12).map { i =>
      val h = (i * 2654435761L) >>> 9
      val w = 1L + (h % 5)
      (w, (h >> 11) % (w + 1))
    }
    val exp = pavRef(bins).map { case (sy, sw) =>
      (sy * BigInt(1000000) / sw).toLong
    }
    val got = Experiment.isotonicCalibration(rowsOf(bins), "s", "y",
        nBins = 12)
      .orderBy("bin").collect().map(_.getLong(4)).toSeq
    assert(got == exp, s"minimax $got != sequential PAV $exp")
    assert(got == got.sorted, "isotonic output must be nondecreasing")
    // raw rates round-trip: per-bin n/pos match the construction
    val raw = Experiment.isotonicCalibration(rowsOf(bins), "s", "y",
        nBins = 12)
      .orderBy("bin").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(raw == bins.map(b => (b._1, b._2)).toSeq)
  }

  /** (key, n, pos) expanded to labeled rows. */
  private def rateRows(keys: (String, Long, Long)*) =
    keys.flatMap { case (k, n, pos) =>
      (0L until n).map(i => (k, if (i < pos) 1L else 0L))
    }.toDF("k", "y")

  test("ebBetaShrink: evidence-proportional pull toward the prior " +
    "mean; degenerate priors yield NULL, never NaN") {
    // A: 50/100 (low rate, big n), B: 4/4 (perfect rate, tiny n),
    // C: 100/100 (perfect rate, big n). The tiny-n perfect key must
    // shrink BELOW the big-n perfect key; the low-rate key pulls UP.
    val m = Experiment.ebBetaShrink(
        rateRows(("A", 100L, 50L), ("B", 4L, 4L), ("C", 100L, 100L)),
        "k", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(m("A")._1 == 500000L && m("B")._1 == 1000000L)
    val (ebA, ebB, ebC) = (m("A")._2, m("B")._2, m("C")._2)
    assert(ebA >= 0 && ebB >= 0 && ebC >= 0, s"fit must exist: $m")
    assert(ebB < ebC, s"tiny-n perfect key must shrink harder: $m")
    assert(ebA > 500000L && ebA < 1000000L,
      s"low-rate key pulls toward the prior mean: $ebA")
    assert(ebC < 1000000L && ebC > ebA)
    // zero rate variance across keys -> no fittable prior -> NULL
    val flat = Experiment.ebBetaShrink(
        rateRows(("A", 10L, 5L), ("B", 20L, 10L)), "k", "y")
      .collect()
    assert(flat.forall(_.isNullAt(4)), "v = 0 must yield NULL eb_ppm")
    // a single key -> NULL
    val one = Experiment.ebBetaShrink(rateRows(("A", 10L, 5L)), "k", "y")
      .collect()
    assert(one.forall(_.isNullAt(4)))
  }

  test("twoProportionZ: hand z on a 2x2 conversion table; a " +
    "zero-variance pool yields NULL, never NaN") {
    def ev(rows: (Long, String)*) =
      rows.zipWithIndex.map { case ((u, t), i) =>
        (i.toLong, 1000L + i, u, t, 0.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
    // arm0 = users {0, 2}: one converts; arm1 = users {1, 3}: both do.
    // p0 = 1/2, p1 = 1, pooled 3/4 -> z = 0.5/sqrt(0.1875)
    val r = Experiment.twoProportionZ(ev(
      (0L, "purchase"), (0L, "view"), (2L, "view"),
      (1L, "purchase"), (3L, "purchase"))).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L &&
      r.getLong(2) == 2L && r.getLong(3) == 2L)
    assert(r.getLong(4) == 500000L && r.getLong(5) == 1000000L)
    val z = (1.0 - 0.5) / math.sqrt(0.75 * 0.25 * (0.5 + 0.5))
    assert(r.getLong(6) == math.floor(z * 1e6 + 0.5).toLong,
      s"hand z: ${r.getLong(6)}")
    // everyone converts -> pooled p = 1 -> zero variance -> NULL
    val all = Experiment.twoProportionZ(
      ev((0L, "purchase"), (1L, "purchase"))).collect().head
    assert(all.isNullAt(6))
  }

  test("mannKendall: hand S/ties/z, sign symmetry, degenerate NULLs, " +
    "loud grain refusals") {
    def ser(rows: (String, Long, Long)*) = rows.toDF("k", "t", "v")
    // strictly increasing 1,2,3: S = 3, no ties, z = 2/sqrt(66/18)
    val up = TimeSeries.mannKendall(
      ser(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L)), "k", "t", "v")
      .collect().head
    assert(up.getLong(1) == 3L && up.getLong(2) == 3L &&
      up.getLong(3) == 0L)
    val zUp = 2.0 / math.sqrt((3.0 * 2 * 11 - 0) / 18.0)
    assert(up.getLong(4) == math.floor(zUp * 1e6 + 0.5).toLong)
    // tie case 1,1,2: S = 2, tie term 2*1*9 = 18, z = 1/sqrt(48/18)
    val tied = TimeSeries.mannKendall(
      ser(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 2L)), "k", "t", "v")
      .collect().head
    assert(tied.getLong(2) == 2L && tied.getLong(3) == 18L)
    val zT = 1.0 / math.sqrt((66.0 - 18) / 18.0)
    assert(tied.getLong(4) == math.floor(zT * 1e6 + 0.5).toLong)
    // mirrored series: z flips sign exactly (continuity correction is
    // symmetric)
    val down = TimeSeries.mannKendall(
      ser(("a", 1L, 3L), ("a", 2L, 2L), ("a", 3L, 1L)), "k", "t", "v")
      .collect().head
    assert(down.getLong(2) == -3L && down.getLong(4) == -up.getLong(4))
    // all-tied and single-point series: Var = 0 -> NULL, never NaN
    val flat = TimeSeries.mannKendall(
      ser(("a", 1L, 5L), ("a", 2L, 5L), ("b", 1L, 9L)), "k", "t", "v")
      .collect().map(r => r.getString(0) -> r.isNullAt(4)).toMap
    assert(flat("a") && flat("b"))
    // duplicate ord (grain violation) and the O(n²) bound both refuse
    intercept[Exception] {
      TimeSeries.mannKendall(
        ser(("a", 1L, 1L), ("a", 1L, 2L)), "k", "t", "v").collect()
    }
    intercept[Exception] {
      TimeSeries.mannKendall(
        ser(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L)), "k", "t", "v",
        maxPoints = 2L).collect()
    }
  }
}
