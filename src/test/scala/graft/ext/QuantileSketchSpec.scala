package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The mergeable quantile-sketch relation (r10 verdict #1): bucket math,
 * the bracketing guarantee against exact order statistics, exact
 * union-mergeability, the grouped form, the relative-error envelope, and
 * the bounded-rows claim. The streaming (complete-mode) twin lives in
 * StreamingSpec beside the CMS/HLL twins. */
class QuantileSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("quantileSketch buckets: exact singletons below 2^6, dyadic " +
    "[lo, hi] covers above, bounded rows") {
    // small values (< 2^(m+1) = 64) get width-1 buckets; larger values
    // land in dyadic ranges whose width never exceeds lo / 2^5
    val vals = Seq(0L, 1L, 63L, 64L, 65L, 100L, 1000L, 1000000L,
      (1L << 40) + 12345L)
    val sk = Sketches.quantileSketch(vals.toDF("v"), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every input value is covered by exactly one bucket
    vals.foreach { v =>
      val hits = sk.filter { case (lo, hi, _) => v >= lo && v <= hi }
      assert(hits.length == 1, s"value $v must land in exactly one " +
        s"bucket, got ${hits.toSeq}")
    }
    // singletons below 64
    assert(sk.contains((0L, 0L, 1L)) && sk.contains((63L, 63L, 1L)))
    // 64 and 65 share the width-2 bucket [64, 65] (s = 1)
    assert(sk.contains((64L, 65L, 2L)))
    // the relative-error envelope on every bucket: width·32 ≤ max(lo, 32)
    sk.foreach { case (lo, hi, _) =>
      assert((hi - lo + 1) * 32 <= math.max(lo, 32L),
        s"bucket [$lo, $hi] leaves the 2^-5 relative envelope")
    }
    assert(sk.length <= Sketches.qSketchMaxBuckets(5))
  }

  test("quantileSketch: negative and >= 2^62 values refuse loudly " +
    "(the domain where both engines' shifts are well-defined)") {
    def msg(e: Exception): String =
      e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    val neg = intercept[Exception] {
      Sketches.quantileSketch(Seq(-1L, 2L).toDF("v"), "v").collect()
    }
    assert(msg(neg).contains("2^62"))
    val big = intercept[Exception] {
      Sketches.quantileSketch(Seq(1L << 62, 2L).toDF("v"), "v").collect()
    }
    assert(msg(big).contains("2^62"))
    // the top of the domain still buckets exactly
    val top = Sketches.quantileSketch(Seq((1L << 62) - 1L).toDF("v"), "v")
      .collect().head
    assert(top.getLong(0) <= (1L << 62) - 1L &&
      top.getLong(1) == (1L << 62) - 1L)
  }

  test("quantileSketchMerge: union+sum equals the sketch of the " +
    "concatenation, bit-identically") {
    val a = (0 until 500).map(i => (i.toLong * 37) % 10000)
    val b = (0 until 700).map(i => (i.toLong * 91) % 100000)
    val merged = Sketches.quantileSketchMerge(
        Sketches.quantileSketch(a.toDF("v"), "v"),
        Sketches.quantileSketch(b.toDF("v"), "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val whole = Sketches.quantileSketch((a ++ b).toDF("v"), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(merged == whole, "merge must be exact — same buckets, " +
      "same counts")
  }

  test("quantileSketchQuantiles: every bucket BRACKETS the exact order " +
    "statistic, at the matching rank") {
    // a skewed mix: many small values, a heavy tail
    val vals = (1 to 2000).map(i => (i.toLong * i) % 50021) ++
      (1 to 50).map(i => 1000000L + i * 7919)
    val df = vals.toDF("v")
    val sk = Sketches.quantileSketchQuantiles(
        Sketches.quantileSketch(df, "v"), k = 10)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // exact lower order statistics at the same ranks, by hand
    val sorted = vals.sorted
    val n = sorted.length
    (1 to 10).foreach { q =>
      val rank = (q * n + 9) / 10
      val exact = sorted(rank.toInt - 1)
      val (skRank, lo, hi) = sk(q)
      assert(skRank == rank, s"q=$q rank: $skRank != $rank")
      assert(lo <= exact && exact <= hi,
        s"q=$q: exact $exact outside sketch bucket [$lo, $hi]")
      assert((hi - lo + 1) * 32 <= math.max(lo, 32L),
        s"q=$q: bucket [$lo, $hi] leaves the relative envelope")
    }
  }

  test("quantileSketchSigned: sign-mirrored buckets cover every value, " +
    "never straddle zero, keep the |v| relative envelope") {
    val vals = Seq(-1000000L, -100000L, -999L, -64L, -63L, -1L, 0L, 1L,
      63L, 64L, 100L, 99999L, (1L << 40) + 7L, -(1L << 40) - 7L)
    val sk = Sketches.quantileSketchSigned(vals.toDF("v"), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    vals.foreach { v =>
      val hits = sk.filter { case (lo, hi, _) => v >= lo && v <= hi }
      assert(hits.length == 1,
        s"value $v must land in exactly one bucket, got ${hits.toSeq}")
    }
    sk.foreach { case (lo, hi, _) =>
      assert(lo <= hi && (lo >= 0L || hi <= 0L),
        s"bucket [$lo, $hi] straddles zero")
      assert((hi - lo + 1) * 32 <=
        math.max(math.min(math.abs(lo), math.abs(hi)), 32L),
        s"bucket [$lo, $hi] leaves the 2^-5 relative envelope on |v|")
    }
    // small-magnitude values (|v| < 64) are exact singletons on BOTH sides
    assert(sk.contains((-63L, -63L, 1L)) && sk.contains((0L, 0L, 1L)) &&
      sk.contains((63L, 63L, 1L)))
    // the negative of a positive value gets the mirrored bucket
    val pv = (1L << 40) + 7L
    val pos = sk.find { case (lo, hi, _) => pv >= lo && pv <= hi }
    val neg = sk.find { case (lo, hi, _) => -pv >= lo && -pv <= hi }
    assert(pos.isDefined && neg.isDefined &&
      neg.get._1 == -pos.get._2 && neg.get._2 == -pos.get._1)
  }

  test("quantileSketchSigned: nonnegative input is bucket-identical to " +
    "quantileSketch; merge stays exact; domain refuses at ±2^62") {
    val vals = (0 until 800).map(i => (i.toLong * 53) % 70000)
    val signed = Sketches.quantileSketchSigned(vals.toDF("v"), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = Sketches.quantileSketch(vals.toDF("v"), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(signed == plain)
    val a = (0 until 400).map(i => (i.toLong * 37) % 9000 - 4500)
    val b = (0 until 300).map(i => (i.toLong * 91) % 80000 - 40000)
    val merged = Sketches.quantileSketchMerge(
        Sketches.quantileSketchSigned(a.toDF("v"), "v"),
        Sketches.quantileSketchSigned(b.toDF("v"), "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val whole = Sketches.quantileSketchSigned((a ++ b).toDF("v"), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == whole)
    def msg(e: Exception): String =
      e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    val neg = intercept[Exception] {
      Sketches.quantileSketchSigned(Seq(-(1L << 62), 2L).toDF("v"), "v")
        .collect()
    }
    assert(msg(neg).contains("2^62"))
    val big = intercept[Exception] {
      Sketches.quantileSketchSigned(Seq(1L << 62, 2L).toDF("v"), "v")
        .collect()
    }
    assert(msg(big).contains("2^62"))
  }

  test("quantileSketchQuantiles(signed = true): deciles of a signed " +
    "distribution bracket the exact order statistics; mid stays inside " +
    "the bracket and is exact on singleton buckets") {
    val vals = (1 to 1500).map(i => ((i.toLong * i * 31) % 20011) - 10005) ++
      (1 to 60).map(i => -3000000L - i * 7919) ++
      (1 to 60).map(i => 3000000L + i * 104729)
    val df = vals.toDF("v")
    val sk = Sketches.quantileSketchQuantiles(
        Sketches.quantileSketchSigned(df, "v"), k = 10, signed = true)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val sorted = vals.sorted
    val n = sorted.length
    (1 to 10).foreach { q =>
      val rank = (q * n + 9) / 10
      val exact = sorted(rank - 1)
      val (skRank, lo, hi, mid) = sk(q)
      assert(skRank == rank, s"q=$q rank: $skRank != $rank")
      assert(lo <= exact && exact <= hi,
        s"q=$q: exact $exact outside sketch bucket [$lo, $hi]")
      assert(lo <= mid && mid <= hi, s"q=$q: mid $mid outside [$lo, $hi]")
      assert(mid == lo + (hi - lo) / 2, s"q=$q: mid convention broken")
      if (lo == hi) assert(mid == exact)
    }
  }

  test("quantileSketchBy: a single-group relation matches the ungrouped " +
    "sketch; per-group quartiles bracket per-group exacts") {
    val a = (1 to 300).map(i => ("a", (i.toLong * 17) % 1000))
    val b = (1 to 400).map(i => ("b", 10000L + (i.toLong * 23) % 90000))
    val df = (a ++ b).toDF("g", "v")
    val single = Sketches.quantileSketchBy(
        df.filter(col("g") === "a"), "g", "v")
      .select("lo", "hi", "c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val ungrouped = Sketches.quantileSketch(
        df.filter(col("g") === "a").select("v"), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(single == ungrouped)
    val quart = Sketches.quantileSketchQuantilesBy(
        Sketches.quantileSketchBy(df, "g", "v"), k = 4)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    Seq("a" -> a.map(_._2).sorted, "b" -> b.map(_._2).sorted)
      .foreach { case (g, sorted) =>
        val n = sorted.length
        (1 to 4).foreach { q =>
          val rank = (q * n + 3) / 4
          val exact = sorted(rank - 1)
          val (skRank, lo, hi) = quart((g, q))
          assert(skRank == rank)
          assert(lo <= exact && exact <= hi,
            s"group $g q=$q: $exact outside [$lo, $hi]")
        }
      }
  }
}
