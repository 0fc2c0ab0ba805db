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
