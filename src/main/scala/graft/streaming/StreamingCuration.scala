package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Incremental, Sampling, Similarity, TextAnalysis}

/**
 * Incrementally MAINTAINED curation table (round-6 verdict #5): the
 * [[graft.ext.Curation.curationReport]] dispositions kept current under a
 * document stream, with each micro-batch's delta MERGED into the versioned
 * table ([[Incremental.mergeSink]]) instead of the whole report being
 * recomputed — the difference between a nightly 100-TB recuration and a
 * per-batch increment proportional to the batch.
 *
 * Why the report is incrementally maintainable at all — under the sink's
 * ingest contract (append-only stream, monotonically increasing `doc_id`s,
 * static benchmark/eval sets), every disposition except `neardup_keeper` is
 * STABLE once computed:
 *
 *  - `lang_ok` / `quality_ok` / `split` / `embed_contaminated` /
 *    `contaminated` are functions of the document (against static
 *    bench/eval sides) — batch-local by definition;
 *  - `exact_keeper` and `span_kept` key off min-(doc_id[, pos]) keepers:
 *    a later batch only adds LARGER doc_ids, so an established keeper can
 *    never be displaced — a new doc is simply a non-keeper wherever its
 *    text hash / window fingerprint was already seen;
 *  - `neardup_keeper` is the one non-monotone signal: a new document can
 *    BRIDGE two existing near-dup clusters, and the merged cluster keeps
 *    only the smaller minimum — the other cluster's keeper flips to loser.
 *    The sink re-derives components over the accumulated EDGE relation
 *    (near-dup pairs — corpus-sized state none of this keeps: edges are the
 *    tiny verified-duplicate graph, not the corpus) and emits `U` rows for
 *    exactly the flipped documents.
 *
 * Per-batch state, all under `stateDir`, all batch-keyed (`<kind>/b=<id>`,
 * overwrite) so a foreachBatch REPLAY rewrites its own legs byte-identically
 * instead of double-appending — same idempotence discipline as
 * [[Incremental.mergeSink]]'s version directories:
 *
 *  - `sh`       — the batch's distinct width-[[Dedup.ShingleWidth]] shingles
 *                 (feeds near-dup candidate verification of LATER batches);
 *  - `bands`    — the batch's LSH bands (the accumulated inverted index new
 *                 batches probe for candidates);
 *  - `fps`      — the batch's distinct span-window fingerprints (the
 *                 ExactSubstr keeper state);
 *  - `texthash` — the batch's distinct text hashes (exact-dedup keeper
 *                 state);
 *  - `edges`    — near-dup pairs first verified by this batch;
 *  - `clusters` — the full (doc_id, cluster) labeling after this batch
 *                 (diffed against the previous batch's to find flips).
 *
 * Equivalence with the one-shot report: exact, except that the LSH bucket
 * cap applies to bucket sizes AS OF each batch — a bucket that exceeds
 * `maxBucket` only once later batches land keeps the pairs it yielded while
 * under the cap (the one-shot run drops the whole bucket). Deliberate:
 * dedup decisions already acted on downstream aren't retractable, and the
 * conservative side here is keeping more verified-duplicate edges, never
 * missing cheaper ones. When no bucket ever exceeds the cap the outputs are
 * identical (StreamingCurationSpec proves it over a 3-batch stream).
 *
 * 100-TB shape per batch: every derivation is batch-sized except (a) the
 * candidate probe, which joins the batch's bands against the accumulated
 * band index ON the band key (inverted-index lookup, not a corpus scan),
 * (b) jaccard verification, which [[Dedup.jaccard]] semi-joins down to
 * candidate docs' shingles before anything corpus-sized moves, and (c) the
 * component relabeling, which runs over the accumulated EDGE set (near-dup
 * pairs only). The stored shingle/band/fp state is exactly the inverted
 * index an ExactSubstr/MinHash service maintains; at cluster scale each
 * `b=<id>` leg is a partition of that index, compacted at the same
 * maintenance cadence as [[Incremental.vacuum]].
 */
object StreamingCuration {

  /** Payload columns of the curation table, in [[graft.ext.Curation]]'s
   * output order (key `doc_id` excluded). */
  val PayloadCols: Seq[String] = Seq("lang_ok", "quality_ok", "exact_keeper",
    "neardup_keeper", "contaminated", "span_kept", "embed_contaminated",
    "split", "keep")

  /** Bound the state-leg fan-out (the maintenance job the batch-keyed legs
   * need, exactly as [[Incremental.vacuum]] bounds the merge-sink version
   * chain): per state kind, fold every leg EXCEPT the newest into a single
   * leg at the fold boundary. The newest leg never folds, so a checkpoint
   * replay of the last micro-batch — the only batch that can replay —
   * still overwrites only its own leg and the fold can never be clobbered
   * by a replay. `clusters` legs are full relabelings, not deltas, so
   * folding there means deleting all but the newest labeling.
   *
   * Same exclusive-access contract and staged-swap discipline as
   * [[graft.ext.AnnIndex.vacuumDeletes]]: stage to a `.tmp` dir (invisible
   * to the `b=` listing), rename the boundary leg to `.bak`, rename the
   * staged fold in, then delete `.bak` and the folded legs; a crash at any
   * point leaves either the old legs or the complete fold on disk (the
   * `.bak`/`.tmp` survivors are swept by the recovery pass at the start of
   * the next compaction). Run at maintenance cadence with no in-flight
   * batch. Returns the per-kind number of legs folded. */
  def compactState(spark: SparkSession, stateDir: String): Map[String, Int] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Map.empty
    val kinds = fs.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
    kinds.map { kind =>
      val kindPath = new org.apache.hadoop.fs.Path(s"$stateDir/$kind")
      // recovery: a .bak with no live boundary leg is a crash between the
      // two renames — restore it; orphaned .tmp is a dead stage — drop it
      fs.listStatus(kindPath).toSeq.map(_.getPath).foreach { p =>
        if (p.getName.endsWith(".bak")) {
          val live = new org.apache.hadoop.fs.Path(kindPath,
            p.getName.stripSuffix(".bak"))
          if (!fs.exists(live)) fs.rename(p, live) else fs.delete(p, true)
        } else if (p.getName.endsWith(".tmp")) fs.delete(p, true)
      }
      val ids = fs.listStatus(kindPath).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("b="))
        .map(_.getPath.getName.stripPrefix("b=").toLong).sorted
      val fold = ids.dropRight(1)
      kind -> (if (fold.size < 2) 0
      else if (kind == "clusters") {
        // full relabelings: only the newest folded leg has meaning
        fold.init.foreach(id => fs.delete(
          new org.apache.hadoop.fs.Path(s"$stateDir/$kind/b=$id"), true))
        fold.size - 1
      } else {
        val target = fold.last
        val merged = fold.map(id =>
            spark.read.parquet(s"$stateDir/$kind/b=$id"))
          .reduce(_ unionByName _).distinct()
        val tmp = new org.apache.hadoop.fs.Path(
          s"$stateDir/$kind/b=$target.tmp")
        val live = new org.apache.hadoop.fs.Path(s"$stateDir/$kind/b=$target")
        val bak = new org.apache.hadoop.fs.Path(
          s"$stateDir/$kind/b=$target.bak")
        merged.write.mode("overwrite").parquet(tmp.toString)
        fs.rename(live, bak)
        fs.rename(tmp, live)
        fs.delete(bak, true)
        fold.init.foreach(id => fs.delete(
          new org.apache.hadoop.fs.Path(s"$stateDir/$kind/b=$id"), true))
        fold.size - 1
      })
    }.toMap
  }

  /** The foreachBatch sink: maintains `tableDir` (an
   * [[Incremental.mergeSink]]-versioned table of curation dispositions,
   * newest version = the current report) and `stateDir` (the incremental
   * keeper/index state). Parameters mirror
   * [[graft.ext.Curation.curationReport]]; `bench`, and `embeddings` when
   * given, must be STATIC — a changed benchmark invalidates stability of
   * the contamination signals and needs a batch recuration. Retention:
   * run [[Incremental.vacuum]]`(spark, tableDir, keepLast)` at maintenance
   * cadence; the state legs compact the same way (union + rewrite). */
  def curationSink(tableDir: String, stateDir: String, bench: DataFrame,
      targetLang: String = "en", minJaccard: Double = 0.5,
      minOverlap: Int = 5, maxBucket: Int = 100, spanWidth: Int = 8,
      embeddings: Option[(DataFrame, DataFrame)] = None,
      minCos: Double = 0.3, embedCellCol: String = "label"):
      StreamingEtl.BatchSink =
    StreamingEtl.BatchSink(s"curation:$tableDir", (batch0, batchId) => {
      val spark = batch0.sparkSession
      val batch = batch0.select("doc_id", "text")

      def legPath(kind: String, id: Long) = s"$stateDir/$kind/b=$id"
      def priorIds(kind: String): Seq[Long] = {
        val p = new org.apache.hadoop.fs.Path(s"$stateDir/$kind")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(p)) Seq.empty
        else fs.listStatus(p).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("b="))
          .map(_.getPath.getName.stripPrefix("b=").toLong)
          .filter(_ < batchId).sorted
      }
      // batch-keyed overwrite = replay-idempotent; reading the leg back
      // also serves as the stage materialization every multi-consumer
      // intermediate needs (the write IS the checkpoint)
      def putLeg(kind: String, df: DataFrame): DataFrame = {
        df.write.mode("overwrite").parquet(legPath(kind, batchId))
        spark.read.parquet(legPath(kind, batchId))
      }
      def priorLegs(kind: String, likeNew: DataFrame): DataFrame =
        priorIds(kind) match {
          case Seq() => likeNew.filter(lit(false))
          case ids => ids.map(id => spark.read.parquet(legPath(kind, id)))
            .reduce(_ unionByName _)
        }

      // ---- batch-local index state. The width-`spanWidth` window relation
      // is derived ONCE and feeds both the fingerprint leg and the span
      // cut below (it is the batch's dominant per-byte derivation).
      val newSh = putLeg("sh", Dedup.shingles(batch))
      val newBands = putLeg("bands",
        Dedup.lshBands(Dedup.minhashSignature(newSh)))
      val wins = Dedup.materialize(
        Dedup.positionedFingerprints(batch, spanWidth))
      val newFps = putLeg("fps", wins.select("fp").distinct())
      val newTh = putLeg("texthash",
        batch.select(md5(col("text")).as("th")).distinct())
      val priorSh = priorLegs("sh", newSh)
      val priorBands = priorLegs("bands", newBands)
      val priorFps = priorLegs("fps", newFps)
      val priorTh = priorLegs("texthash", newTh)

      // ---- near-dup: batch bands probe the accumulated band index.
      // Inverted-index shape: the index is first semi-joined down to the
      // BUCKETS THIS BATCH TOUCHES, so the bucket-size window (the cap)
      // and the candidate self-join run over probed buckets only — the
      // per-batch cost is proportional to the batch's bucket fan-out, not
      // the accumulated index (which at cluster scale is stored bucketed
      // by (band, band_hash), making the probe a co-located join).
      val probed = newBands.select("band", "band_hash").distinct()
      val touched = priorBands.unionByName(newBands)
        .join(probed, Seq("band", "band_hash"), "left_semi")
      val bounded = touched.withColumn("__n",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy("band", "band_hash")))
        .filter(col("__n") <= maxBucket).drop("__n")
      val newBounded = bounded.join(batch.select("doc_id"), Seq("doc_id"),
        "left_semi")
      val cands = bounded.as("a").join(newBounded.as("b"),
          col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val newEdges = putLeg("edges",
        Dedup.jaccard(cands, priorSh.unionByName(newSh))
          .filter(col("jac") >= minJaccard).select("doc_a", "doc_b"))
      val priorClusters = priorIds("clusters").lastOption match {
        case Some(id) => spark.read.parquet(legPath("clusters", id))
        case None => newEdges.select(col("doc_a").as("doc_id"),
          col("doc_b").as("cluster")).filter(lit(false))
      }
      val clusters = putLeg("clusters",
        Dedup.dupClusters(priorLegs("edges", newEdges).unionByName(newEdges)))

      // ---- batch-local dispositions (stable once computed — see above)
      val lang = batch.select(col("doc_id"),
        (TextAnalysis.langId(col("text")) === lit(targetLang)).as("lang_ok"))
      val quality = TextAnalysis.gopherRules(batch)
        .select(col("doc_id"), col("pass").as("quality_ok"))
      val exactKeepers = batch
        .withColumn("th", md5(col("text")))
        .join(priorTh, Seq("th"), "left_anti")
        .groupBy("th").agg(min("doc_id").as("doc_id"))
        .select(col("doc_id"), lit(true).as("exact_keeper"))
      // the benchmark is STATIC (sink contract): its shingle relation is
      // derived once, persisted beside the state, and re-read by every
      // later batch instead of re-tokenizing the benchmark per batch. The
      // _SUCCESS marker guards a crashed partial write (rewritten then).
      val benchShPath = s"$stateDir/bench_sh"
      val benchSh = {
        val ok = new org.apache.hadoop.fs.Path(s"$benchShPath/_SUCCESS")
        if (!ok.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .exists(ok))
          Dedup.shingles(bench).toDF("bench_id", "sh")
            .write.mode("overwrite").parquet(benchShPath)
        spark.read.parquet(benchShPath)
      }
      val contaminated =
        Dedup.decontaminationHitsShingled(newSh, benchSh, minOverlap)
          .filter(col("doc_id") =!= col("bench_id"))
          .select("doc_id").distinct()
          .withColumn("contaminated", lit(true))
      val spanKept = Dedup.removeDuplicateSpansFromWins(batch, spanWidth,
          wins, Some(priorFps))
        .select(col("doc_id"), col("n_kept").as("span_kept"))
      val embedHits = embeddings.map { case (corpus, eval) =>
        Similarity.embedDecontaminationHits(
          corpus.join(batch.select(col("doc_id").as("vec_id")),
            Seq("vec_id"), "left_semi"),
          eval, minCos, embedCellCol)
          .select(col("vec_id").as("doc_id"))
          .withColumn("embed_contaminated", lit(true))
      }
      val losers = clusters.filter(col("doc_id") =!= col("cluster"))
        .select("doc_id")
      val newRows = embedHits.foldLeft(
          Sampling.hashSplit(
            lang.join(quality, Seq("doc_id"))
              .join(exactKeepers, Seq("doc_id"), "left")
              .join(spanKept, Seq("doc_id"))
              .join(contaminated, Seq("doc_id"), "left")
              .join(losers.withColumn("__loser", lit(true)),
                Seq("doc_id"), "left"),
            "doc_id"))(
          (df, hits) => df.join(hits, Seq("doc_id"), "left"))
        .select(col("doc_id"), col("lang_ok"), col("quality_ok"),
          coalesce(col("exact_keeper"), lit(false)).as("exact_keeper"),
          coalesce(col("__loser"), lit(false)).unary_!.as("neardup_keeper"),
          coalesce(col("contaminated"), lit(false)).as("contaminated"),
          col("span_kept"),
          (if (embedHits.isDefined)
             coalesce(col("embed_contaminated"), lit(false))
           else lit(false)).as("embed_contaminated"),
          col("split"))
        .withColumn("keep",
          col("lang_ok") && col("quality_ok") && col("exact_keeper") &&
            col("neardup_keeper") && !col("contaminated") &&
            !col("embed_contaminated"))

      // ---- keeper→loser flips among PRIOR docs (cluster bridge merges).
      // Monotone ids make this the only possible disposition change: edges
      // are only added, so a loser never becomes a keeper, and only docs
      // newly labeled loser (vs the previous labeling) flip.
      val priorLosers = priorClusters
        .filter(col("doc_id") =!= col("cluster")).select("doc_id")
      val flipped = losers
        .join(priorLosers, Seq("doc_id"), "left_anti")
        .join(batch.select("doc_id"), Seq("doc_id"), "left_anti")
      val uRows =
        if (Incremental.listVersions(spark, tableDir).isEmpty)
          newRows.filter(lit(false))
        else Incremental.baseAsOf(spark, tableDir, batchId - 1)
          .join(flipped, Seq("doc_id"), "left_semi")
          .withColumn("neardup_keeper", lit(false))
          .withColumn("keep", lit(false))

      // ---- merge the delta into the versioned table
      val changes =
        newRows.withColumn("__op", lit("I"))
          .unionByName(uRows.withColumn("__op", lit("U")))
          .withColumn("__v", lit(batchId))
      Incremental.mergeSink(tableDir, "doc_id", "__v", "__op", PayloadCols)
        .write(changes, batchId)
    })
}
