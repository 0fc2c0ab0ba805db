package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Cross-engine envelope fuzz (r11 verdict #6): commit 2284268 fixed the
 * Spark-wraps-vs-DuckDB-raises divergence class case-by-case (sketch
 * domain, EB prior); this suite generalizes the check — push boundary
 * magnitudes through every VALUE-bounded exact operator and assert
 * LOUD-REFUSAL-OR-EXACT: inside the documented envelope the result must
 * equal an independently computed exact reference; at or past the
 * boundary the operator must refuse with its documented message, never
 * return a silently wrapped value. Plain ScalaCheck generators under
 * fixed seeds (the SpineProperties discipline — the scalatest bridge is
 * not in the offline cache), so failures replay exactly.
 *
 * Coverage note: the ROW-COUNT envelopes (percentileRanks' 9e12 per-key
 * rows, ebBetaShrink's 9e10) guard counts no test can physically
 * generate; their refusal legs are compile-checked by inspection and
 * their exactness legs are covered here (percentileRanks) and by the
 * oracle gate (dq29). Everything VALUE-triggered gets both legs. */
class EnvelopeFuzzSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic samples: one per seed 1..n. */
  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** assert_true surfaces as a SparkException wrapping the message —
   * collect every message down the cause chain. */
  private def loudMsg(e: Throwable): String = {
    def walk(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ walk(t.getCause)
    walk(e).mkString(" | ")
  }

  private val top = (1L << 62) - 1L // largest in-domain sketch value

  /** Magnitude mix: tiny, mid, wide, and a band hugging the 2^62 rim —
   * the shapes where shift/bucket arithmetic can silently wrap. */
  private val genMagnitude: Gen[Long] = Gen.oneOf(
    Gen.choose(0L, 100L),
    Gen.choose(0L, 1L << 20),
    Gen.choose(0L, 1L << 45),
    Gen.choose(top - 1000L, top))

  private val genVec: Gen[List[Long]] =
    Gen.nonEmptyListOf(genMagnitude).map(_.take(60))

  private val genSignedVec: Gen[List[Long]] = Gen.nonEmptyListOf(
    for { m <- genMagnitude; s <- Gen.oneOf(1L, -1L) } yield m * s)
    .map(_.take(60))

  test("quantileSketch: exact cover + envelope on any in-domain mix, " +
    "including values hugging 2^62") {
    samples(genVec, 20).foreach { vals =>
      val sk = Sketches.quantileSketch(vals.toDF("v"), "v")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      vals.foreach { v =>
        assert(sk.count { case (lo, hi, _) => v >= lo && v <= hi } == 1,
          s"value $v not covered exactly once")
      }
      sk.foreach { case (lo, hi, _) =>
        assert((hi - lo + 1) * 32 <= math.max(lo, 32L),
          s"bucket [$lo, $hi] leaves the 2^-5 envelope")
      }
      assert(sk.map(_._3).sum == vals.size.toLong)
    }
  }

  test("quantileSketch: every out-of-domain poison refuses loudly, " +
    "never wraps") {
    val poisons = Seq(-1L, Long.MinValue, 1L << 62, Long.MaxValue)
    samples(genVec, 3).foreach { vals =>
      poisons.foreach { p =>
        val e = intercept[Exception] {
          Sketches.quantileSketch((p :: vals).toDF("v"), "v").collect()
        }
        assert(loudMsg(e).contains("2^62"),
          s"poison $p must hit the documented domain message")
      }
    }
  }

  test("quantileSketchSigned: cover + no-straddle + |v| envelope on any " +
    "signed in-domain mix; rim poisons refuse loudly") {
    samples(genSignedVec, 20).foreach { vals =>
      val sk = Sketches.quantileSketchSigned(vals.toDF("v"), "v")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      vals.foreach { v =>
        assert(sk.count { case (lo, hi, _) => v >= lo && v <= hi } == 1,
          s"value $v not covered exactly once")
      }
      sk.foreach { case (lo, hi, _) =>
        assert(lo >= 0L || hi <= 0L, s"bucket [$lo, $hi] straddles zero")
        assert((hi - lo + 1) * 32 <=
          math.max(math.min(math.abs(lo), math.abs(hi)), 32L),
          s"bucket [$lo, $hi] leaves the |v| envelope")
      }
      assert(sk.map(_._3).sum == vals.size.toLong)
    }
    Seq(1L << 62, -(1L << 62), Long.MinValue, Long.MaxValue).foreach { p =>
      val e = intercept[Exception] {
        Sketches.quantileSketchSigned(Seq(p, 1L, -1L).toDF("v"), "v")
          .collect()
      }
      assert(loudMsg(e).contains("2^62"),
        s"poison $p must hit the documented domain message")
    }
  }

  test("twoLevelRankSelect: exact deciles on signed mixes inside ±2^62; " +
    "magnitude at the rim refuses loudly") {
    val genModest: Gen[List[Long]] = Gen.nonEmptyListOf(for {
      m <- Gen.oneOf(Gen.choose(0L, 1000L), Gen.choose(0L, 1L << 40))
      s <- Gen.oneOf(1L, -1L)
    } yield m * s).map(_.take(80))
    samples(genModest, 8).foreach { vals =>
      val counts = vals.toDF("vq").groupBy("vq")
        .agg(count(lit(1)).as("c"))
      val got = Profile.twoLevelRankSelect(counts, 1 to 10, 9L, 10L,
          bucketShift = 20, maxGrain = Profile.MaxOrderStatDistinct,
          opName = "envelopeFuzz")
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val sorted = vals.sorted
      val n = sorted.size
      (1 to 10).foreach { q =>
        val rank = (q.toLong * n + 9) / 10
        val (gotRank, gotV) = got(q)
        assert(gotRank == rank, s"q=$q rank $gotRank != $rank")
        assert(gotV == sorted(rank.toInt - 1),
          s"q=$q: $gotV != exact ${sorted(rank.toInt - 1)} in $vals")
      }
    }
    // the shift-to-nonnegative bound: |v| at Long.MaxValue/2 refuses
    Seq(Long.MaxValue / 2, Long.MinValue / 2).foreach { p =>
      val counts = Seq(p, 0L, 1L).toDF("vq").groupBy("vq")
        .agg(count(lit(1)).as("c"))
      val e = intercept[Exception] {
        Profile.twoLevelRankSelect(counts, Seq(1), 1L, 2L,
          bucketShift = 20, maxGrain = Profile.MaxOrderStatDistinct,
          opName = "envelopeFuzz").collect()
      }
      assert(loudMsg(e).contains("2^62"),
        s"magnitude $p must hit the documented shift-overflow message")
    }
  }

  test("mannKendall: exact S + tie term vs brute force inside the grain " +
    "bound; one point over (or a duplicate ord) refuses loudly") {
    val genSeries: Gen[List[Long]] =
      Gen.listOfN(25, Gen.choose(-50L, 50L))
    samples(genSeries, 10).foreach { vs =>
      val rows = vs.zipWithIndex.map { case (v, t) => ("k", t.toLong, v) }
      val got = TimeSeries.mannKendall(
          rows.toDF("key", "t", "v"), "key", "t", "v", maxPoints = 25L)
        .collect().head
      val s = (for {
        i <- vs.indices; j <- vs.indices if i < j
      } yield math.signum((vs(j) - vs(i)).toDouble).toLong).sum
      val ties = vs.groupBy(identity).values
        .map(g => g.size.toLong * (g.size - 1L) * (g.size * 2L + 5L)).sum
      assert(got.getLong(2) == s, s"S ${got.getLong(2)} != $s for $vs")
      assert(got.getLong(3) == ties)
    }
    val over = (0 to 25).map(t => ("k", t.toLong, t.toLong))
    val e1 = intercept[Exception] {
      TimeSeries.mannKendall(over.toDF("key", "t", "v"), "key", "t", "v",
        maxPoints = 25L).collect()
    }
    assert(loudMsg(e1).contains("points per key"))
    val dup = Seq(("k", 1L, 1L), ("k", 1L, 2L), ("k", 2L, 3L))
    val e2 = intercept[Exception] {
      TimeSeries.mannKendall(dup.toDF("key", "t", "v"), "key", "t", "v")
        .collect()
    }
    assert(loudMsg(e2).contains("grain"))
  }

  test("ksTwoSampleBy: per-group rows equal the global ksTwoSample on " +
    "each group's slices (in-envelope leg); the per-group maxDistinct " +
    "grain bound refuses loudly (refusal leg)") {
    val genKeyed: Gen[List[(String, Long, Boolean)]] =
      Gen.nonEmptyListOf(for {
        k <- Gen.oneOf("a", "b", "c")
        v <- Gen.choose(-40L, 40L)
        side <- Gen.oneOf(true, false)
      } yield (k, v, side)).map(_.take(120))
    samples(genKeyed, 8).foreach { rows =>
      val ref = rows.filter(_._3).map(r => (r._1, r._2))
      val cur = rows.filterNot(_._3).map(r => (r._1, r._2))
      val got = Profile.ksTwoSampleBy(
          ref.toDF("g", "v"), cur.toDF("g", "v"), "g", "v")
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))))
        .toMap
      val keys = (ref.map(_._1) ++ cur.map(_._1)).distinct
      assert(got.keySet == keys.toSet)
      keys.foreach { k =>
        val g = Profile.ksTwoSample(
            ref.filter(_._1 == k).map(_._2).toDF("v"),
            cur.filter(_._1 == k).map(_._2).toDF("v"), "v")
          .collect().head
        // a group absent on one side: the global form on that slice
        // produces the same (n, 0, 0, NULL) shape — compare verbatim
        assert(got(k) == ((g.getLong(0), g.getLong(1), g.getLong(2),
          if (g.isNullAt(3)) None else Some(g.getLong(3)))),
          s"group $k: ${got(k)} != global")
      }
    }
    val wide = (1L to 7L).map(("hot", _))
    val e = intercept[Exception] {
      Profile.ksTwoSampleBy(wide.toDF("g", "v"),
          Seq(("hot", 3L)).toDF("g", "v"), "g", "v", maxDistinct = 5L)
        .collect()
    }
    assert(loudMsg(e).contains("merged distinct"),
      "a >maxDistinct group must hit the documented grain message")
  }

  test("percentileRanks: pct_ppm is the exact integer cume_dist ppm on " +
    "random keyed mixes (the in-envelope leg of the 9e12 contract)") {
    val genKeyed: Gen[List[(String, Long)]] = Gen.nonEmptyListOf(for {
      k <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(-1000L, 1000L)
    } yield (k, v)).map(_.take(120))
    samples(genKeyed, 10).foreach { rows =>
      val got = Profile.percentileRanks(
          rows.toDF("k", "v"), "k", "v")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      rows.groupBy(_._1).foreach { case (k, kvs) =>
        val vals = kvs.map(_._2)
        val n = vals.size.toLong
        val byV = vals.groupBy(identity).view.mapValues(_.size.toLong)
          .toSeq.sortBy(_._1)
        var cum = 0L
        byV.foreach { case (v, c) =>
          cum += c
          val (gc, gn, gppm) = got((k, v))
          assert(gc == c && gn == n, s"($k,$v): counts ($gc,$gn)")
          assert(gppm == cum * 1000000L / n,
            s"($k,$v): ppm $gppm != ${cum * 1000000L / n}")
        }
      }
    }
  }

  test("theilSen: median pairwise slope equals brute force on random " +
    "series (truncating-division micro convention)") {
    val genSeries: Gen[List[Long]] =
      Gen.choose(2, 15).flatMap(n =>
        Gen.listOfN(n, Gen.choose(-10000L, 10000L)))
    samples(genSeries, 12).foreach { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) =>
        ("k", (i.toLong + 1) * 3, v) } // uneven-looking but distinct ords
      val got = TimeSeries.theilSen(
          rows.toDF("key", "t", "v"), "key", "t", "v")
        .collect().head
      val slopes = (for {
        i <- rows.indices; j <- rows.indices if i < j
      } yield ((rows(j)._3 - rows(i)._3) * 1000000L) /
        (rows(j)._2 - rows(i)._2)).sorted
      val med = slopes((slopes.size + 1) / 2 - 1)
      assert(got.getLong(2) == slopes.size.toLong)
      assert(got.getLong(3) == med,
        s"slope ${got.getLong(3)} != brute $med for $vs")
    }
  }

  test("spearman: rho equals brute-force midrank d² on random pairs") {
    val genPairs: Gen[List[(Long, Long)]] = Gen.choose(2, 40).flatMap(n =>
      Gen.listOfN(n, for {
        x <- Gen.choose(-50L, 50L); y <- Gen.choose(-50L, 50L)
      } yield (x, y)))
    def ranks2(vs: Seq[Long]): Map[Long, Long] = {
      val byV = vs.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      var cum = 0L
      byV.map { case (v, c) => cum += c; v -> (2 * cum - c + 1) }.toMap
    }
    samples(genPairs, 12).foreach { ps =>
      val got = Experiment.spearman(ps.toDF("x", "y"), "x", "y")
        .collect().head
      val rx = ranks2(ps.map(_._1)); val ry = ranks2(ps.map(_._2))
      val d2q = ps.map { case (x, y) =>
        val d = rx(x) - ry(y); d * d }.sum
      val n = ps.size.toDouble
      val rho = 1.0 - 1.5 * d2q.toDouble / (n * (n * n - 1.0))
      assert(got.getLong(1) == d2q)
      assert(got.getLong(2) == math.floor(rho * 1e6 + 0.5).toLong,
        s"rho ${got.getLong(2)} != brute for $ps")
    }
  }

  test("kruskalWallis: H equals brute-force midrank computation on " +
    "random grouped values (sorted-group fold)") {
    val genRows: Gen[List[(String, Long)]] = Gen.choose(4, 50).flatMap(n =>
      Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b", "c"); v <- Gen.choose(-20L, 20L)
      } yield (g, v)))
    samples(genRows, 12).foreach { rows =>
      if (rows.map(_._1).distinct.size >= 2) {
        val got = Experiment.kruskalWallis(rows.toDF("g", "v"), "g", "v")
          .collect().head
        val byV = rows.map(_._2).groupBy(identity).view
          .mapValues(_.size.toLong).toSeq.sortBy(_._1)
        var cum = 0L
        val r2 = byV.map { case (v, c) =>
          cum += c; v -> (2 * cum - c + 1) }.toMap
        val tie = byV.map { case (_, c) => c * c * c - c }.sum
        val n = rows.size.toDouble
        // the operator's documented fold: ascending group key
        val ssq = rows.groupBy(_._1).toSeq.sortBy(_._1)
          .foldLeft(0.0) { case (acc, (_, g)) =>
            val s2 = g.map(r => r2(r._2)).sum.toDouble
            acc + s2 * s2 / g.size.toDouble
          }
        val h = 3.0 * ssq / (n * (n + 1.0)) - 3.0 * (n + 1.0)
        assert(got.getLong(2) == tie)
        assert(got.getLong(3) == math.floor(h * 1e6 + 0.5).toLong,
          s"H ${got.getLong(3)} != brute for $rows")
      }
    }
  }

  test("wilcoxonSignedRank: W2+/z equal brute force on random pairs") {
    val genPairs: Gen[List[(Long, Long)]] = Gen.choose(2, 40).flatMap(n =>
      Gen.listOfN(n, for {
        x <- Gen.choose(-30L, 30L); y <- Gen.choose(-30L, 30L)
      } yield (x, y)))
    samples(genPairs, 12).foreach { ps =>
      val got = Experiment.wilcoxonSignedRank(ps.toDF("x", "y"), "x", "y")
        .collect().head
      val ds = ps.map { case (x, y) => y - x }.filter(_ != 0L)
      val byA = ds.map(math.abs).groupBy(identity).view
        .mapValues(_.size.toLong).toSeq.sortBy(_._1)
      var cum = 0L
      val r2 = byA.map { case (a, c) =>
        cum += c; a -> (2 * cum - c + 1) }.toMap
      val w2 = ds.filter(_ > 0).map(d => r2(math.abs(d))).sum
      val tie = byA.map { case (_, c) => c * c * c - c }.sum
      assert(got.getLong(0) == ds.size.toLong)
      assert(got.getLong(1) == w2)
      assert(got.getLong(2) == tie)
      if (ds.nonEmpty) {
        val n = ds.size.toDouble
        val v = n * (n + 1.0) * (2.0 * n + 1.0) / 6.0 - tie.toDouble / 12.0
        val z = (w2.toDouble - n * (n + 1.0) / 2.0) / math.sqrt(v)
        assert(got.getLong(3) == math.floor(z * 1e6 + 0.5).toLong,
          s"z ${got.getLong(3)} != brute for $ps")
      } else assert(got.isNullAt(3))
    }
  }

  test("kendallTau: C/D/tie-pairs/tau-b equal brute force on random " +
    "series, including rim-magnitude values (comparison-only domain)") {
    val genSeries: Gen[List[(Long, Long)]] = Gen.choose(2, 30).flatMap(n =>
      Gen.listOfN(n, for {
        x <- Gen.oneOf(Gen.choose(-20L, 20L),
          Gen.oneOf(Long.MinValue, Long.MaxValue, 1L << 62))
        y <- Gen.choose(-20L, 20L)
      } yield (x, y)))
    samples(genSeries, 12).foreach { ps =>
      val rows = ps.zipWithIndex.map { case ((x, y), i) =>
        (i.toLong, x, y) }
      val got = Experiment.kendallTau(
          rows.toDF("t", "x", "y"), "t", "x", "y")
        .collect().head
      val pairs = for {
        i <- ps.indices; j <- ps.indices if i < j
      } yield java.lang.Long.compare(ps(j)._1, ps(i)._1).sign *
        java.lang.Long.compare(ps(j)._2, ps(i)._2).sign
      val c = pairs.count(_ == 1).toLong
      val d = pairs.count(_ == -1).toLong
      def tp(vs: Seq[Long]): Long = vs.groupBy(identity).values
        .map(g => g.size.toLong * (g.size - 1) / 2).sum
      val (tx, ty) = (tp(ps.map(_._1)), tp(ps.map(_._2)))
      val n0 = ps.size.toLong * (ps.size - 1) / 2
      assert(got.getLong(1) == c && got.getLong(2) == d &&
        got.getLong(3) == tx && got.getLong(4) == ty)
      val den = (n0 - tx).toDouble * (n0 - ty).toDouble
      if (den > 0.0) {
        val tau = (c - d).toDouble / math.sqrt(den)
        assert(got.getLong(5) == math.floor(tau * 1e6 + 0.5).toLong,
          s"tau ${got.getLong(5)} != brute for $ps")
      } else assert(got.isNullAt(5))
    }
  }

  test("friedman: exact q_num/q_den equal brute-force within-block " +
    "midrank computation on random complete blocks") {
    val genBlocks: Gen[List[List[Long]]] = Gen.choose(2, 12).flatMap(n =>
      Gen.listOfN(n, Gen.listOfN(4, Gen.choose(0L, 6L))))
    samples(genBlocks, 12).foreach { blocks =>
      val rows = blocks.zipWithIndex.flatMap { case (vs, b) =>
        vs.zipWithIndex.map { case (v, j) => (s"b$b", s"t$j", v) } }
      val got = Experiment.friedman(rows.toDF("b", "j", "v"),
          "b", "j", "v")
        .collect().head
      val k = 4L; val n = blocks.size.toLong
      // per-block x2 midranks
      val r2 = blocks.map { vs =>
        val byV = vs.groupBy(identity).view.mapValues(_.size.toLong)
          .toSeq.sortBy(_._1)
        var cum = 0L
        val m = byV.map { case (v, c) =>
          cum += c; v -> (2 * cum - c + 1) }.toMap
        vs.map(m)
      }
      val r2j = (0 until 4).map(j => r2.map(_(j)).sum)
      val num = (k - 1) * (r2j.map(s => s * s).sum - n * n * k *
        (k + 1) * (k + 1))
      val den = r2.flatten.map(r => r * r).sum - n * k * (k + 1) * (k + 1)
      assert(got.getLong(0) == n && got.getLong(1) == k)
      assert(got.getLong(2) == num && got.getLong(3) == den,
        s"num/den ${got.getLong(2)}/${got.getLong(3)} != $num/$den")
      if (den > 0)
        assert(got.getLong(4) ==
          math.floor(num.toDouble / den.toDouble * 1e6 + 0.5).toLong)
      else assert(got.isNullAt(4))
    }
  }

  test("cvmTwoSample / wassersteinTwoSample / energyDistance: micro " +
    "readouts equal BigInt brute force on random SIGNED mixes incl. " +
    "the 2^62 rim (the DECIMAL(38,0) moments + documented fixed-shape " +
    "readouts, no wrap at any value range)") {
    val genPair: Gen[(List[Long], List[Long])] = for {
      a <- genSignedVec
      b <- genSignedVec
    } yield (a, b)
    samples(genPair, 6).foreach { case (a, b) =>
      val (na, nb) = (a.size.toLong, b.size.toLong)
      val vs = (a ++ b).distinct.sorted
      var (ca, cb) = (0L, 0L)
      var t = BigInt(0)
      var w = BigInt(0)
      var (exy, exx, eyy) = (BigInt(0), BigInt(0), BigInt(0))
      vs.zipWithIndex.foreach { case (v, i) =>
        val (cr, cc) = (a.count(_ == v).toLong, b.count(_ == v).toLong)
        ca += cr; cb += cc
        val d = BigInt(ca) * nb - BigInt(cb) * na
        t += d * d * (cr + cc)
        if (i + 1 < vs.size) {
          val gap = BigInt(vs(i + 1)) - BigInt(v)
          w += d.abs * gap
          exy += (BigInt(ca) * (nb - cb) + BigInt(cb) * (na - ca)) * gap
          exx += BigInt(ca) * (na - ca) * gap
          eyy += BigInt(cb) * (nb - cb) * gap
        }
      }
      val tMicro = math.floor(t.toDouble * 1e6 /
        (na.toDouble * nb.toDouble *
          ((na.toDouble + nb.toDouble) * (na.toDouble + nb.toDouble))) +
        0.5).toLong
      val wMicro = math.floor(w.toDouble * 1e6 /
        (na.toDouble * nb.toDouble) + 0.5).toLong
      val cg = Profile.cvmTwoSample(a.toDF("v"), b.toDF("v"), "v")
        .collect().head
      val wg = Profile.wassersteinTwoSample(a.toDF("v"), b.toDF("v"), "v")
        .collect().head
      assert(cg.getLong(0) == na && cg.getLong(1) == nb &&
        cg.getLong(2) == vs.size.toLong)
      assert(cg.getLong(3) == tMicro, s"cvm ${cg.getLong(3)} != $tMicro")
      assert(wg.getLong(3) == wMicro, s"w1 ${wg.getLong(3)} != $wMicro")
      val eMicro = math.floor(
        (2.0 * exy.toDouble / (na.toDouble * nb.toDouble) -
          2.0 * exx.toDouble / (na.toDouble * na.toDouble) -
          2.0 * eyy.toDouble / (nb.toDouble * nb.toDouble)) * 1e6 +
        0.5).toLong
      val eg = Profile.energyDistance(a.toDF("v"), b.toDF("v"), "v")
        .collect().head
      assert(eg.getLong(3) == eMicro,
        s"energy ${eg.getLong(3)} != $eMicro")
    }
  }

  test("cochranQ: exact q_num/q_den equal brute force on random " +
    "complete binary panels") {
    val genPanel: Gen[List[List[Long]]] = Gen.listOfN(6,
      Gen.listOfN(4, Gen.oneOf(0L, 1L)))
    samples(genPanel, 6).foreach { panel =>
      val rows = panel.zipWithIndex.flatMap { case (blk, b) =>
        blk.zipWithIndex.map { case (v, j) => (s"b$b", s"t$j", v) } }
      val got = Experiment.cochranQ(rows.toDF("b", "j", "v"),
        "b", "j", "v").collect().head
      val k = 4L
      val n = 6L
      val cj = (0 until 4).map(j => panel.map(_(j)).sum)
      val ri = panel.map(_.sum)
      val tTot = cj.sum
      val num = (k - 1) * (k * cj.map(c => c * c).sum - tTot * tTot)
      val den = k * tTot - ri.map(r => r * r).sum
      assert(got.getLong(0) == n && got.getLong(1) == k &&
        got.getLong(2) == tTot)
      assert(got.getLong(3) == num && got.getLong(4) == den,
        s"${got.getLong(3)}/${got.getLong(4)} != $num/$den")
      if (den > 0)
        assert(got.getLong(5) ==
          math.floor(num.toDouble / den.toDouble * 1e6 + 0.5).toLong)
      else assert(got.isNullAt(5))
    }
  }

  test("pageTrend: exact l2 equals brute-force within-block x2 " +
    "midranks dotted with lexical positions on random panels") {
    val genPanel: Gen[List[List[Long]]] = Gen.listOfN(5,
      Gen.listOfN(4, Gen.choose(0L, 5L)))
    samples(genPanel, 6).foreach { panel =>
      val rows = panel.zipWithIndex.flatMap { case (blk, b) =>
        blk.zipWithIndex.map { case (v, j) => (s"b$b", s"t$j", v) } }
      val got = Experiment.pageTrend(rows.toDF("b", "j", "v"),
        "b", "j", "v").collect().head
      // brute x2 midranks per block, dotted with positions 1..4
      def ranks2(vs: Seq[Long]): Seq[Long] = {
        val sorted = vs.sorted
        vs.map { v =>
          val below = sorted.count(_ < v)
          val eq = sorted.count(_ == v)
          2L * below + eq + 1L
        }
      }
      val l2 = panel.map(ranks2).map(r2 =>
        r2.zipWithIndex.map { case (r, j) => (j + 1L) * r }.sum).sum
      val e2 = 5L * 4L * 5L * 5L / 2L
      assert(got.getLong(2) == l2, s"l2 ${got.getLong(2)} != $l2")
      assert(got.getLong(3) == e2)
      val anyTie = panel.exists(blk =>
        blk.groupBy(identity).values.exists(_.size > 1))
      assert(got.getLong(4) == (if (anyTie) 1L else 0L))
    }
  }

  test("isotonicCalibration: both refusal legs are loud — the nBins " +
    "require and the score-range x nBins BIGINT envelope (exactness is " +
    "the ml6 oracle's job)") {
    val df = Seq((1L, 1L), (2L, 0L)).toDF("s", "y")
    val e1 = intercept[IllegalArgumentException] {
      Experiment.isotonicCalibration(df, "s", "y", nBins = 101)
    }
    assert(e1.getMessage.contains("nBins"))
    val wide = Seq((0L, 1L), (Long.MaxValue / 10 + 1L, 0L)).toDF("s", "y")
    val e2 = intercept[Exception] {
      Experiment.isotonicCalibration(wide, "s", "y", nBins = 10).collect()
    }
    assert(loudMsg(e2).contains("overflow"),
      "rim score range must hit the documented overflow message")
  }
}
