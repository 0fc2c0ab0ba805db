package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, EntityResolution, Incremental}

/**
 * Incrementally MAINTAINED golden-record table (round-7 verdict #7):
 * [[graft.ext.EntityResolution.resolveEntities]] kept current under a
 * record stream, with each micro-batch's delta MERGED into the versioned
 * entity table ([[Incremental.mergeSink]]) instead of the whole corpus
 * being re-resolved — the [[StreamingCuration]] machinery (accumulated
 * edge relation, full-relabel diff, batch-keyed replay-idempotent state
 * legs) generalized from keep/drop dispositions to golden records.
 *
 * Ingest contract (same as the curation sink): append-only stream,
 * monotonically increasing record ids. Under it, the per-batch delta is
 * EXACTLY characterizable — unlike curation's mostly-stable dispositions,
 * entity rows are NOT stable (a new record can join an entity, flip its
 * keeper, or BRIDGE two existing entities), but every change is confined
 * to entities touched by the batch:
 *
 *  - new pairs can only involve a batch record (ids are monotone, so an
 *    old×old pair would already have been found) — the per-batch probe is
 *    `accumulated × batch`, never a corpus self-join
 *    ([[Dedup.jaroWinklerPairsVs]]);
 *  - an entity's id (component-min record id) only ever DECREASES, and
 *    only when components merge: the surviving entity is the smaller min,
 *    the absorbed entity's id vanishes — a `D` row;
 *  - survivorship changes only for entities holding a batch record or a
 *    relabeled record — re-running the one-pass struct-min agg
 *    ([[EntityResolution.survivorship]]) over exactly those entities'
 *    members reproduces the batch recompute for them.
 *
 * Equivalence with the one-shot [[EntityResolution.resolveEntities]] on
 * the accumulated corpus: exact, except that the JW `maxBlock` hot-block
 * cap applies to block sizes AS OF each batch — a block that exceeds the
 * cap only once later batches land keeps the pairs it yielded while under
 * the cap, where the one-shot run drops the whole block (the same
 * deliberate divergence as StreamingCuration's bucket cap: merge
 * decisions already acted on aren't retractable, and the conservative
 * side is keeping verified matches). When no block ever exceeds the cap
 * the outputs are identical (StreamingEntityResolutionSpec proves it over
 * a 3-batch stream).
 *
 * State under `stateDir`, batch-keyed (`<kind>/b=<id>`, overwrite — a
 * foreachBatch replay rewrites its own legs byte-identically):
 *  - `records`  — the batch's normalized records (the survivorship
 *                 attributes; the accumulated legs are the member store
 *                 touched-entity recomputes read);
 *  - `edges`    — JW-matched pairs first found by this batch;
 *  - `clusters` — the full (doc_id, cluster) labeling after this batch
 *                 (diffed against the previous to find relabeled records).
 *
 * 100-TB shape per batch: the pair probe is the batch's blocks against
 * the accumulated relation ON the block key (inverted-index lookup — at
 * cluster scale the record state is stored bucketed by block, making it a
 * co-located join) with the B²-bounding cap; component relabeling runs
 * over the accumulated EDGE graph (verified matches only, not the
 * corpus); the survivorship recompute reads ONLY touched entities'
 * members (a semi-join into the bucketed record state); and the merge
 * applies an entity-grain change set. Nothing corpus-proportional rides
 * the increment path except the edge-graph relabel, which is
 * match-graph-sized by construction.
 */
object StreamingEntityResolution {

  /** The foreachBatch sink maintaining `tableDir` as the versioned
   * golden-record table (key `entity_id`; payload = keeper attributes +
   * additive facts, [[EntityResolution.resolveEntities]]'s output
   * schema). Batches must carry `idCol`, `nameCol`, `qualityCol` and
   * every `carryCols` column. Retention: [[Incremental.vacuum]] on
   * `tableDir` and [[StreamingCuration.compactState]]-style folding of
   * the state legs at maintenance cadence. */
  def goldenSink(tableDir: String, stateDir: String, idCol: String,
      nameCol: String, qualityCol: String, carryCols: Seq[String],
      blockPrefix: Int, minSim: Double, maxBlock: Int = 10000):
      StreamingEtl.BatchSink =
    StreamingEtl.BatchSink(s"golden:$tableDir", (batch0, batchId) => {
      val spark = batch0.sparkSession
      val payloadCols = Seq("keeper_id", nameCol, qualityCol) ++
        carryCols ++ Seq("total_q100", "n_records")

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

      // ---- normalized record state (the survivorship attributes)
      val newRecords = putLeg("records", batch0.select(
        col(idCol).as("__id") +: col(nameCol).as("__nm") +:
          col(qualityCol).as("__q") +: carryCols.map(col): _*))
      val priorRecords = priorLegs("records", newRecords)
      val allRecords = priorRecords.unionByName(newRecords)

      // ---- new match edges: accumulated × batch on the block key, the
      // maxBlock cap keyed on the accumulated side AS OF this batch
      val newEdges = putLeg("edges",
        Dedup.jaroWinklerPairsVs(
            allRecords.select(col("__id"), col("__nm")),
            newRecords.select(col("__id"), col("__nm")),
            "__id", "__nm", blockPrefix, minSim, maxBlock)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b")))

      // ---- relabel the accumulated (match-graph-sized) component state
      val priorClusters = priorIds("clusters").lastOption match {
        case Some(id) => spark.read.parquet(legPath("clusters", id))
        case None => newEdges.select(col("doc_a").as("doc_id"),
          col("doc_b").as("cluster")).filter(lit(false))
      }
      val clusters = putLeg("clusters",
        Dedup.dupClusters(priorLegs("edges", newEdges).unionByName(newEdges)))

      // ---- records whose component label changed (bridge merges and
      // first-time matches): the diff of two match-graph-sized labelings
      val relabeled = clusters.as("n")
        .join(priorClusters.as("p"), col("n.doc_id") === col("p.doc_id"),
          "left")
        .filter(col("p.doc_id").isNull || col("p.cluster") =!= col("n.cluster"))
        .select(col("n.doc_id").as("__id"),
          col("p.cluster").as("old_cluster"))

      // ---- touched entities (new labeling): entities holding a batch
      // record or a relabeled record
      val assigned = allRecords
        .join(clusters.select(col("doc_id").as("__id"),
          col("cluster").as("entity_id")), Seq("__id"), "left")
        .withColumn("entity_id", coalesce(col("entity_id"), col("__id")))
      val touchedIds = newRecords.select("__id")
        .unionByName(relabeled.select("__id")).distinct()
      val touchedEntities = assigned
        .join(touchedIds, Seq("__id"), "left_semi")
        .select("entity_id").distinct()

      // ---- survivorship over ONLY the touched entities' members
      val golden = EntityResolution.survivorship(
        assigned.join(touchedEntities, Seq("entity_id"), "left_semi"),
        nameCol, qualityCol, carryCols)

      // ---- absorbed entities: a relabeled record's OLD entity id that no
      // longer labels anything (delta-sized — only a bridge merge can
      // retire an id, and only of a relabeled record's previous entity)
      val priorSingletonEnts = relabeled
        .filter(col("old_cluster").isNull)      // previously unmatched...
        .join(priorRecords, Seq("__id"), "left_semi") // ...but not new
        .select(col("__id").as("entity_id"))
      val absorbed = relabeled
        .filter(col("old_cluster").isNotNull)
        .select(col("old_cluster").as("entity_id"))
        .unionByName(priorSingletonEnts)
        .distinct()
        // "still an entity id" = that record is still its component's
        // min: one keyed anti-join, no corpus-grain distinct
        .join(assigned.filter(col("__id") === col("entity_id"))
          .select("entity_id"), Seq("entity_id"), "left_anti")

      // ---- entity-grain change set into the versioned table
      val hasPrior = Incremental.listVersions(spark, tableDir)
        .exists(_ < batchId)
      val upserts = golden.withColumn("__op",
        if (!hasPrior) lit("I") else lit("U"))
      val deletes =
        if (!hasPrior) upserts.filter(lit(false))
        else Incremental.baseAsOf(spark, tableDir, batchId - 1)
          .join(absorbed, Seq("entity_id"), "left_semi")
          .withColumn("__op", lit("D"))
      val changes = upserts.unionByName(deletes)
        .withColumn("__v", lit(batchId))
      Incremental.mergeSink(tableDir, "entity_id", "__v", "__op",
        payloadCols).write(changes, batchId)
    })
}
