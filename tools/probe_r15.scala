// r15 before/after probe: targeted walls + plan dumps for the queries
// this optimization round touches (run once on the inherited classes for
// the "before" leg, once on the rebuilt classes for "after").
// Drive via spark-shell -I tools/probe_r15.scala (classpath as in
// tools/verify_local.sh); SPARK_GRAFT_PLANS_DIR names the dump dir.
import org.apache.spark.sql.functions._

val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val plansDir = java.nio.file.Paths.get(
  sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "target/plans_r15"))
java.nio.file.Files.createDirectories(plansDir)
val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")

// warm the IO path the same way Bench does
Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
  .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())

def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
  java.nio.file.Files.write(plansDir.resolve(s"${name}_$suffix.txt"),
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))

val osBean = (java.lang.management.ManagementFactory.getOperatingSystemMXBean
  .asInstanceOf[com.sun.management.OperatingSystemMXBean])
def time3(name: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
  for (i <- 1 to 3) {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    // timed action = .count(), matching Bench's methodology exactly so
    // before/after probe walls are comparable with the bench artifact
    val t0 = System.nanoTime
    val c1 = osBean.getProcessCpuTime
    mk().count()
    val w = (System.nanoTime - t0) / 1e9
    val c = (osBean.getProcessCpuTime - c1) / 1e9
    println(f"PROBE $name run$i wall $w%.2f s cpu $c%.2f s")
  }
}

val queries = Seq("d21_lsh_recall", "dq9_mad_outliers",
  "pipe1_curation_report", "pipe5_data_card", "d10_quality_dedup",
  "d31_ppjoin", "d36_cluster_agreement", "graph2_triangles",
  "d8_simhash_pairs", "d5_simhash", "d34_detector_agreement",
  "n1_knn_brute", "e17_dbscan", "n25_lof", "sp24_hard_negatives",
  "graph1_pagerank", "d6_dup_clusters", "d22_source_overlap",
  "rec1_cf_hitrate", "graph9_hits", "graph7_kcore", "graph0_degree_stats")

for (n <- queries) {
  spark.sparkContext.setJobDescription(s"probe:$n")
  dump(n, graft.SparkEntry.queries(n)(spark, sfDir))
  time3(n, () => graft.SparkEntry.queries(n)(spark, sfDir))
}
System.exit(0)
