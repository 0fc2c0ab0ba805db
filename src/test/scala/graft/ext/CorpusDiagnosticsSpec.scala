package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-7 corpus diagnostics: cross-source overlap, PSI drift, the
 * temperature-mixture α family, and the pipe2 training-assembly manifest. */
class CorpusDiagnosticsSpec extends SparkTestBase {

  import spark.implicits._

  test("sourceOverlap: hand-built corpus with known shared shingles") {
    // srcA doc 1 and srcB doc 2 share exactly the shingle set of the
    // identical text; srcC is disjoint vocabulary.
    val docs = Seq(
      (1L, "a b c d e", "srcA"),
      (2L, "a b c d e", "srcB"),
      (3L, "p q r s t", "srcC")).toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlap(docs)
      .orderBy("source_a", "source_b").collect()
    // only the (srcA, srcB) pair shares anything: 3 shingles each, all 3
    // shared -> jaccard 1.0, containment 1.0
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "srcA" && r.getString(1) == "srcB")
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L && r.getLong(4) == 3L)
    assert(r.getDouble(5) == 1.0 && r.getDouble(6) == 1.0)
  }

  test("sourceOverlap: containment >= jaccard, both in (0, 1]") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val rows = Dedup.sourceOverlap(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val jac = r.getDouble(5); val cont = r.getDouble(6)
      assert(jac > 0.0 && jac <= 1.0, s"jaccard out of range: $jac")
      assert(cont >= jac && cont <= 1.0, s"containment $cont < jaccard $jac")
    }
  }

  test("psiDrift: identical relations score ~0, disjoint score large") {
    val a = Seq.tabulate(200)(i => (i.toLong, (i % 7) * 10L))
      .toDF("id", "v")
    val same = Profile.psiDrift(a, a, "v", 10L)
      .agg(sum("psi_micro")).first().getLong(0)
    assert(same == 0L, s"identical distributions must give PSI 0, got $same")
    val b = a.withColumn("v", col("v") + 1000L)
    val far = Profile.psiDrift(a, b, "v", 10L)
      .agg(sum(col("psi_micro").cast("double") / 1e6)).first().getDouble(0)
    assert(far > 0.25, s"disjoint distributions must exceed 0.25, got $far")
    // every per-bucket contribution is non-negative by construction
    val negs = Profile.psiDrift(a, b, "v", 10L)
      .filter(col("psi_micro") < 0).count()
    assert(negs == 0L)
  }

  test("temperatureMixtureRates: alphaLog2=1 is sqrtMixtureRates; " +
    "deeper alpha flattens rates monotonically") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val viaSqrt = Sampling.sqrtMixtureRates(docs, "lang")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val viaTemp = Sampling.temperatureMixtureRates(docs, "lang", 1)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(viaSqrt == viaTemp)
    // rate_k = floor(100 * r^(1/2^k)) with r <= 1 is nondecreasing in k
    val byAlpha = (1 to 4).map(k =>
      Sampling.temperatureMixtureRates(docs, "lang", k)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap)
    byAlpha.sliding(2).foreach { case Seq(lo, hi) =>
      lo.keySet.foreach(k =>
        assert(hi(k) >= lo(k), s"rates must flatten with alpha: $k"))
    }
  }

  test("epochShuffles: each epoch is a full permutation, and epochs " +
    "genuinely differ") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val out = Sampling.epochShuffles(docs, epochs = 2).cache()
    val n = docs.count()
    // every epoch holds positions 0..n-1 exactly once
    (0 to 1).foreach { e =>
      val pos = out.filter(col("epoch") === e).select("pos")
        .as[Long].collect().sorted
      assert(pos.toSeq == (0L until n), s"epoch $e not a permutation")
    }
    // and the two orders are not the same permutation
    val o0 = out.filter(col("epoch") === 0).orderBy("pos")
      .select("doc_id").as[Long].collect().toSeq
    val o1 = out.filter(col("epoch") === 1).orderBy("pos")
      .select("doc_id").as[Long].collect().toSeq
    assert(o0 != o1, "epochs must reshuffle")
    out.unpersist()
  }

  test("peakConcurrency: half-open intervals — an end frees its slot " +
    "before a coincident start takes it") {
    val ev = Seq(
      // key "a": [0,100) [100,200) [150,250) -> peak 2, first at t=150
      ("a", 0L), ("a", 100L), ("a", 150L),
      // key "b": [0,100) [100,200) back-to-back -> never concurrent
      ("b", 0L), ("b", 100L)).toDF("k", "ts")
    val out = TimeSeries.peakConcurrency(ev, "k", "ts", durationNs = 100L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out("a") == ((2L, 150L)), s"got ${out("a")}")
    assert(out("b") == ((1L, 0L)), s"got ${out("b")}")
  }

  test("removeBoilerplate: hot grams cut everywhere (no keeper), " +
    "rare text survives") {
    val docs = Seq(
      (1L, "click here a b c"),
      (2L, "click here d e f"),
      (3L, "click here g h i"),
      (4L, "j k l m n")).toDF("doc_id", "text")
    val out = Dedup.removeBoilerplate(docs, width = 2, minDf = 3)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // 'click here' is in 3 docs -> cut from ALL of them, including the
    // first occurrence (contrast removeDuplicateSpans, which keeps one)
    assert(out(1L) == "a b c" && out(2L) == "d e f" && out(3L) == "g h i")
    assert(out(4L) == "j k l m n")
    // under-threshold grams are untouched: raising minDf past the df
    // leaves every doc intact
    assert(Dedup.removeBoilerplate(docs, 2, 4)
      .join(docs, "doc_id")
      .filter(col("text_dedup") =!= col("text")).count() == 0L)
  }

  test("snapshotDiff: added/removed/changed with null-safe value compare") {
    val prev = Seq((1L, Some("a")), (2L, Some("b")), (3L, None))
      .toDF("doc_id", "v")
    val cur = Seq((2L, Some("b2")), (3L, None), (4L, Some("d")))
      .toDF("doc_id", "v")
    val out = Incremental.snapshotDiff(prev, cur, "doc_id", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // key 3 (null == null) is unchanged and therefore absent
    assert(out == Map(1L -> "removed", 2L -> "changed", 4L -> "added"))
  }

  test("snapshotChanges: apply(prev, changes) reconstructs cur exactly") {
    val prev = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))
      .toDF("doc_id", "t", "l")
    val cur = Seq((2L, "b2", "y"), (3L, "c", "z"), (4L, "d", "w"))
      .toDF("doc_id", "t", "l")
    val changes = Incremental.snapshotChanges(prev, cur, "doc_id",
      Seq("t", "l"), version = 7L)
    // the emitted ops are exactly the i4 classification with payloads
    val ops = changes.select("doc_id", "op").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ops == Map(1L -> "D", 2L -> "U", 4L -> "I"))
    // the round-trip property that makes it a CDC bridge
    val rebuilt = Incremental.apply(prev,
      Incremental.latestPerKey(changes, "doc_id", "version", "op",
        Seq("t", "l")),
      "doc_id", "op", Seq("t", "l"))
    assert(rebuilt.collect().map(_.toString).sorted.toSeq ==
      cur.collect().map(_.toString).sorted.toSeq)
  }

  test("maintainAgg: group-moving update, delete, insert — incremental " +
    "equals recompute; emptied groups drop out") {
    val base = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "B", 30L))
      .toDF("id", "grp", "v")
    val changes = Seq(
      (2L, 1L, "U", Some("B"), Some(25L)), // moves A -> B, value change
      (3L, 1L, "D", None, None),           // B loses its only other row
      (4L, 1L, "I", Some("A"), Some(5L)))
      .toDF("id", "version", "op", "grp", "v")
    val prevAgg = base.groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    val out = Incremental.maintainAgg(prevAgg, base, changes,
        "id", "op", "grp", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // new table: (1,A,10),(2,B,25),(4,A,5)
    assert(out == Map("A" -> ((2L, 15L)), "B" -> ((1L, 25L))))
    // deleting the last A rows empties the group entirely
    val drain = Seq((1L, 1L, "D", Option.empty[String], Option.empty[Long]),
      (2L, 1L, "D", Option.empty[String], Option.empty[Long]))
      .toDF("id", "version", "op", "grp", "v")
    val left = Incremental.maintainAgg(prevAgg, base, drain,
        "id", "op", "grp", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(left == Map("B" -> ((1L, 30L))), "group A must drop at n = 0")
  }

  test("time-travel diff: snapshotDiff between two mergeSink versions " +
    "recovers exactly the applied change set") {
    // versions built through the sink, then diffed AS-OF: the families
    // compose — the diff of two immutable snapshots is the change set
    // that separated them (modulo D rows for keys absent in both).
    val dir = java.nio.file.Files.createTempDirectory("tt_diff").toString
    val sink = Incremental.mergeSink(dir, "id", "version", "op", Seq("v"))
    val b0 = Seq((1L, 1L, "I", "a"), (2L, 1L, "I", "b"), (3L, 1L, "I", "c"))
      .toDF("id", "version", "op", "v")
    val b1 = Seq((2L, 2L, "U", "b2"), (3L, 2L, "D", null.asInstanceOf[String]),
      (4L, 2L, "I", "d")).toDF("id", "version", "op", "v")
    sink.write(b0, 0L)
    sink.write(b1, 1L)
    val diff = Incremental.snapshotDiff(
      Incremental.baseAsOf(spark, dir, 0L),
      Incremental.baseAsOf(spark, dir, 1L), "id", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("qlDirichletTopK: tf and length ordering, OOV terms drop") {
    // d1 matches 'apple' twice in 4 tokens; d2 once in 4; d3 never.
    val docs = Seq(
      (1L, "apple apple pie crust"),
      (2L, "apple cherry cherry cherry"),
      (3L, "date elderberry fig grape")).toDF("doc_id", "text")
    val r = Retrieval.qlDirichletTopK(docs, Seq("apple"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    assert(r.map(_._1).toSeq == Seq(1L, 2L),
      s"higher tf at equal length must rank first; no-match docs " +
        s"excluded; got ${r.toSeq}")
    assert(r.head._2 > r.last._2)
    // an OOV query term contributes p=0 and must DROP, leaving scores
    // bit-identical
    val withOov = Retrieval.qlDirichletTopK(docs,
      Seq("apple", "zz_never_seen"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    assert(withOov.toSeq == r.toSeq)
    // length normalization: the same tf in a LONGER doc scores lower
    val len = Seq(
      (1L, "apple pie"),
      (2L, "apple pie pie pie pie pie pie pie")).toDF("doc_id", "text")
    val lr = Retrieval.qlDirichletTopK(len, Seq("apple"), 2)
      .collect().map(_.getLong(0))
    assert(lr.toSeq == Seq(1L, 2L))
  }

  test("rm3TopK: expansion recalls a doc the literal query cannot match") {
    // query 'apple' matches only d1; RM1 expansion from d1 surfaces
    // 'banana', which recalls d2 in the second pass.
    val docs = Seq(
      (1L, "apple banana banana"),
      (2L, "banana cherry cherry"),
      (3L, "date elderberry fig")).toDF("doc_id", "text")
    val bm = Retrieval.bm25TopK(docs, Seq("apple"), 3)
      .select("doc_id").as[Long].collect().toSet
    assert(bm == Set(1L))
    val rm3 = Retrieval.rm3TopK(docs, Seq("apple"), 3,
      fbDocs = 1, fbTerms = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(rm3.contains(1L) && rm3.contains(2L),
      s"expansion must recall the banana doc, got $rm3")
    assert(!rm3.contains(3L), "an unrelated doc must stay unmatched")
    // deterministic: a second run returns the identical ranking
    val r1 = Retrieval.rm3TopK(docs, Seq("apple"), 3).collect().toSeq
    val r2 = Retrieval.rm3TopK(docs, Seq("apple"), 3).collect().toSeq
    assert(r1 == r2)
  }

  test("mmrRerank: the diversity step skips a near-duplicate that pure " +
    "relevance would keep") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)),            // query
      (1L, Array(0.99f, 0.14f, 0f)),      // top candidate
      (2L, Array(0.98f, 0.15f, 0.01f)),   // near-dup of 1, rel #2
      (3L, Array(0.7f, 0f, 0.7f)))        // diverse, rel #3
      .toDF("vec_id", "embedding")
    val brute = Similarity.knnBrute(vecs.filter($"vec_id" === 0), vecs, 2)
      .select("n_id").as[Long].collect().toSet
    assert(brute == Set(1L, 2L), "pure relevance keeps the near-dup pair")
    val mmr = Retrieval.mmrRerank(vecs.filter($"vec_id" === 0), vecs,
        k = 2, fetch = 3)
      .orderBy("step").select("n_id").as[Long].collect().toSeq
    assert(mmr == Seq(1L, 3L),
      s"MMR must pick the relevant-but-diverse doc at step 2, got $mmr")
  }

  test("kcenterSelect: one pick per cluster, radii non-increasing") {
    // three tight clusters; greedy k-center must take one point from
    // each before ever returning to a cluster
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0.99f, 0.02f, 0f)),
      (10L, Array(0f, 1f, 0f)), (11L, Array(0.02f, 0.99f, 0f)),
      (20L, Array(0f, 0f, 1f)), (21L, Array(0f, 0.02f, 0.99f)))
      .toDF("vec_id", "embedding")
    val out = Selection.kcenterSelect(vecs, k = 3)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.head == ((1, 1L, 20000L)), "seed = min id, sentinel radius")
    val clusters = out.map(_._2 / 10).toSet
    assert(clusters == Set(0L, 1L, 2L),
      s"k=3 must cover all three clusters, got ${out.toSeq}")
    assert(out.map(_._3).sliding(2).forall { case Array(a, b) => b <= a },
      "the k-center radius sequence is non-increasing")
    // k past the candidate count: return what exists, never a NULL row
    val over = Selection.kcenterSelect(vecs, k = 10).collect()
    assert(over.length == 6 && over.forall(!_.anyNull),
      "over-asking must cap at the candidate count with no null rows")
  }

  test("kcenterSelect sampleN: absolute bound respected, deterministic " +
    "under repartitioning (r7 verdict #2)") {
    val vecs = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = 12
    val a = Selection.kcenterSelect(vecs, k = 3, sampleN = n)
      .orderBy("step").collect().toSeq
    // the selection drew from a candidate set of EXACTLY sampleN vectors:
    // every pick is inside the deterministic md5-rank prefix
    val prefix = vecs
      .orderBy(md5(concat(lit("kcn:"), col("vec_id").cast("string"))).asc,
        col("vec_id").asc)
      .limit(n).select("vec_id").as[Long].collect().toSet
    assert(prefix.size == n)
    assert(a.map(_.getLong(1)).forall(prefix.contains),
      s"picks must come from the sampleN prefix, got ${a.map(_.getLong(1))}")
    // same rows from any partitioning of the corpus
    val b = Selection.kcenterSelect(vecs.repartition(13), k = 3, sampleN = n)
      .orderBy("step").collect().toSeq
    assert(a == b, "sampleN selection must be partition-independent")
    // sampleN wins over samplePct when both are given
    val c = Selection.kcenterSelect(vecs.repartition(5), k = 3,
      samplePct = 1, sampleN = n).orderBy("step").collect().toSeq
    assert(a == c, "sampleN must take precedence over samplePct")
  }

  test("trainingAssembly: manifest conserves the packed chunk tokens") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val budget = 256
    val train = Sampling.hashSplit(docs, "doc_id")
      .filter(col("split") === "train")
    val mixed = Sampling.temperatureMixtureSample(
      train, "doc_id", "source", alphaLog2 = 2)
    val chunkToks = Sampling.chunkDocuments(mixed, 32, 8)
      .agg(sum(col("n_toks").cast("long")), count(lit(1))).first()
    val manifest = Curation.trainingAssembly(docs, alphaLog2 = 2,
      chunkSize = 32, overlap = 8, budget = budget)
    val agg = manifest
      .agg(sum("n_tokens"), sum("n_chunks")).first()
    assert(agg.getLong(0) == chunkToks.getLong(0),
      "token totals must survive the assembly")
    assert(agg.getLong(1) == chunkToks.getLong(1),
      "chunk counts must survive the assembly")
    // within a bucket, every non-final pack starts because its
    // predecessor's exclusive running sum crossed the budget: cumulative
    // tokens through pack p-1 must be >= p * budget
    val viol = manifest
      .withColumn("cum_thru",
        sum("n_tokens").over(org.apache.spark.sql.expressions.Window
          .partitionBy("bucket").orderBy("pack_id")))
      .withColumn("next_exists",
        lead("pack_id", 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("bucket").orderBy("pack_id")).isNotNull)
      .filter(col("next_exists") &&
        col("cum_thru") < (col("pack_id") + 1) * budget)
      .count()
    assert(viol == 0L, "a pack closed before its budget filled")
  }

  test("phraseDetect: planted collocation outranks independent pairs and " +
      "matches a brute-force replay") {
    // "new york" always adjacent (a true phrase); "the cat" co-occur but
    // also apart; filler tokens are frequent everywhere.
    val docs = (1 to 40).map { i =>
      (i.toLong, s"the cat new york sat on the mat t$i the cat ran new york")
    }.toDF("doc_id", "text")
    val out = TextAnalysis.phraseDetect(docs, minCount = 5L, delta = 2L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap

    // Brute-force replay on the driver.
    val texts = (1 to 40).map(i =>
      s"the cat new york sat on the mat t$i the cat ran new york")
    val toks = texts.flatMap(_.split(" "))
    val n = toks.length.toLong
    val uni = toks.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val bi = texts.flatMap(t => t.split(" ").sliding(2).map(_.mkString(" ")))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      .filter(_._2 >= 5L)
    val expect = bi.map { case (bg, cab) =>
      val Array(a, b) = bg.split(" ")
      bg -> (cab, uni(a), uni(b),
        BigDecimal(((cab - 2L).toDouble * n) / (uni(a).toDouble * uni(b)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(out == expect)
    // The planted phrase scores above every pair of independent fillers.
    assert(out("new york")._4 > out("the cat")._4)
  }
}
