package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage → golden records), the MDM
 * composition over this engine's own primitives: the reference pipeline
 * treats every arriving envelope as a distinct user profile
 * (`/root/reference/Real_Time_Data.py` keys Cassandra/Mongo writes by the
 * envelope's own id, so re-registrations and typo'd duplicates survive as
 * separate rows); resolving those near-duplicate profile records into one
 * canonical entity is the classic downstream step this module adds.
 *
 * Stages (one DAG, nothing all-pairs):
 *  1. candidate pairs — prefix blocking + the native Jaro-Winkler kernel
 *     ([[Dedup.jaroWinklerPairs]]): comparisons bounded per block, and
 *     the `maxBlock` hot-block cap (exposed here, NOT hard-disabled —
 *     the round-6 pipe1 lesson) bounds the degenerate low-entropy-name
 *     case where one block holds the corpus; [[Dedup.jwBlockStats]] is
 *     the pre-flight that sizes it.
 *  2. transitive closure — matched pairs feed the star-rounds connected
 *     components ([[Dedup.dupClusters]]): O(log² n) shuffle-bounded
 *     rounds; the entity id is the component-minimum record id.
 *  3. survivorship — ONE struct-min hash-agg per entity picks the golden
 *     record (highest `qualityCol`, ties to the smaller id) and carries
 *     its attributes; additive facts (`total_<qualityCol>`, `n_records`)
 *     aggregate in the same pass. No window sort, no join-back.
 *
 * Unmatched records pass through as their own single-record entities
 * (left join + coalesce), so the output is a complete entity table, not
 * just the merged subset.
 */
object EntityResolution {

  /** Resolve `records` into golden-record entities.
   *
   * Output: `entity_id` (component-min record id), `keeper_id`,
   * `<nameCol>`, `<qualityCol>` and each `carryCols` column from the
   * keeper record, `total_q100` (entity-sum of the quality column
   * micro-quantized to integer hundredths BEFORE summing — double
   * addition is summation-order dependent, exact BIGINT sums are not),
   * `n_records`.
   *
   * @param qualityCol numeric NON-NULL column ranking records within an
   *                   entity (highest survives; deterministic id
   *                   tie-break). Null quality would make the struct-min
   *                   ordering engine-specific (Spark sorts null struct
   *                   fields first, SQL engines' `ORDER BY q DESC` default
   *                   null placement varies) — coalesce a sentinel before
   *                   calling if the column is nullable.
   */
  def resolveEntities(
      records: DataFrame,
      idCol: String,
      nameCol: String,
      qualityCol: String,
      carryCols: Seq[String],
      blockPrefix: Int,
      minSim: Double,
      maxBlock: Int = 10000): DataFrame = {
    val reserved = Set("entity_id", "k", "total_q100", "n_records",
      "__id", "__nm", "__q")
    // the guard covers EVERY caller-named column, not just carryCols
    // (r7 advice #3: an idCol named "entity_id" or a carryCol duplicating
    // nameCol silently produced ambiguous/duplicate output columns)
    for (c <- Seq(idCol, nameCol, qualityCol) ++ carryCols)
      require(!reserved(c),
        s"column name '$c' collides with the reserved output names " +
          reserved.mkString(", "))
    require(carryCols.distinct == carryCols,
      s"carryCols contains duplicates: ${carryCols.mkString(", ")}")
    for (c <- carryCols)
      require(c != nameCol && c != qualityCol && c != idCol,
        s"carryCol '$c' duplicates idCol/nameCol/qualityCol — those " +
          "columns already carry through the keeper struct")
    val pairs = Dedup
      .jaroWinklerPairs(records, idCol, nameCol, blockPrefix, minSim,
        maxBlock)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val clusters = Dedup.dupClusters(pairs)
      .select(col("doc_id").as("__id"), col("cluster").as("entity_id"))

    val base = records.select(
      col(idCol).as("__id") +: col(nameCol).as("__nm") +:
        col(qualityCol).as("__q") +: carryCols.map(col): _*)
    val assigned = base
      .join(clusters, Seq("__id"), "left")
      .withColumn("entity_id", coalesce(col("entity_id"), col("__id")))
    survivorship(assigned, nameCol, qualityCol, carryCols)
  }

  /** The survivorship agg over an already-ASSIGNED relation
   * (`__id`, `__nm`, `__q`, carry…, `entity_id`) — stage 3 alone, the
   * seam [[graft.streaming.StreamingEntityResolution]] re-runs per batch
   * over only the TOUCHED entities' members. One struct-min hash-agg:
   * ORDER BY quality DESC, id ASC without a window sort; the keeper's
   * attributes ride the struct through the agg; additive facts
   * (`total_q100`, `n_records`) aggregate in the same pass. */
  private[graft] def survivorship(assigned: DataFrame, nameCol: String,
      qualityCol: String, carryCols: Seq[String]): DataFrame = {
    val keeper = struct(
      (-col("__q")).as("__negq") +: col("__id").as("__kid") +:
        col("__nm").as("__knm") +:
        carryCols.map(c => col(c).as(s"__c_$c")): _*)
    assigned
      .groupBy("entity_id")
      .agg(
        min(keeper).as("k"),
        sum(floor(col("__q") * lit(100) + lit(0.5)).cast("long"))
          .as("total_q100"),
        count(lit(1)).as("n_records"))
      .select(
        col("entity_id") +: col("k.__kid").as("keeper_id") +:
          col("k.__knm").as(nameCol) +:
          (-col("k.__negq")).as(qualityCol) +:
          carryCols.map(c => col(s"k.__c_$c").as(c)) :+
          col("total_q100") :+ col("n_records"): _*)
  }
}
