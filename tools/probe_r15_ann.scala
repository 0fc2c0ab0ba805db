// r15 ANN index-search + graph1 probe at the 10x (sf1) corpus: the
// r14 verdict #2 target (stored-index searches run their ADC scoring at
// the index file's split count — serial at bench scale) and the verdict
// #6 graph1 inverse-scaling diagnosis. Requires target/bench_sf1 from a
// prior bench run. Drive via spark-shell -I tools/probe_r15_ann.scala;
// SPARK_GRAFT_PLAN_SUFFIX names the dump leg (before/after).
import org.apache.spark.sql.functions._
import graft.ext._

val dir10 = "/root/repo/target/bench_sf1"
val plansDir = java.nio.file.Paths.get(
  sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "target/plans_r15"))
java.nio.file.Files.createDirectories(plansDir)
val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
graft.functions.GraftFunctions.register(spark)

def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
  java.nio.file.Files.write(plansDir.resolve(s"${name}_$suffix.txt"),
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))

val osBean = (java.lang.management.ManagementFactory.getOperatingSystemMXBean
  .asInstanceOf[com.sun.management.OperatingSystemMXBean])
def time2(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
  for (i <- 1 to 2) {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val t0 = System.nanoTime
    val c1 = osBean.getProcessCpuTime
    mk.count()
    val w = (System.nanoTime - t0) / 1e9
    val c = (osBean.getProcessCpuTime - c1) / 1e9
    println(f"PROBE $name run$i wall $w%.2f s cpu $c%.2f s")
  }
}

def emb = spark.read.parquet(s"$dir10/embeddings.parquet")
def q8 = emb.filter(col("vec_id") < 8)

// untimed index builds (the amortized deployment cost, as in Bench setup)
val idxDir = s"$dir10/probe_ivfpq_index"
val pqDir = s"$dir10/probe_pq_index"
val resDir = s"$dir10/probe_residual_index"
val sq8Dir = s"$dir10/probe_sq8_index"
AnnIndex.buildIvfPq(emb, idxDir)
AnnIndex.buildPq(emb, pqDir)
AnnIndex.buildIvfAdcResidual(emb, resDir)
AnnIndex.buildIvfSq8(emb, sq8Dir)
println("PROBE index builds done")

dump("ann_index_search_pq_adc", AnnIndex.searchPqAdc(q8, spark, pqDir, 3))
time2("ann_index_search_pq_adc") { AnnIndex.searchPqAdc(q8, spark, pqDir, 3) }
dump("ann_index_search_ivfpq", AnnIndex.searchIvfPq(q8, spark, idxDir, 3))
time2("ann_index_search_ivfpq") { AnnIndex.searchIvfPq(q8, spark, idxDir, 3) }
time2("ann_index_search_ivfpq_multiprobe") {
  AnnIndex.searchIvfPqMultiProbe(q8, spark, idxDir, 3) }
time2("ann_index_search_ivfpq_rerank") {
  AnnIndex.searchIvfPqRerank(q8, spark, idxDir, 3, rerank = 10) }
dump("ann_index_search_residual_np2",
  AnnIndex.searchIvfAdcResidual(q8, spark, resDir, 3, nprobe = 2))
time2("ann_index_search_residual_np2") {
  AnnIndex.searchIvfAdcResidual(q8, spark, resDir, 3, nprobe = 2) }
time2("ann_index_search_ivfsq8") {
  AnnIndex.searchIvfSq8(q8, spark, sq8Dir, 3) }
// whole-corpus searches (the n23/n25 compositional shapes — every corpus
// vector queries the stored index)
time2("ann_index_whole_corpus_ivfpq") {
  AnnIndex.searchIvfPq(emb, spark, idxDir, 5) }

// graph1 at sf1 (verdict #6): the sched canary brackets the probe — run
// this script at BOTH core counts and compare canary-clean walls
// inline sched canary (ms/job over 20 trivial 2-stage shuffle jobs) so
// the graph1 walls are readable against the window's per-job constant
def schedMs(): Double = {
  val t0 = System.nanoTime
  (1 to 20).foreach { _ =>
    spark.range(0, 64, 1, 4).groupBy((col("id") % 8).as("k"))
      .count().count()
  }
  (System.nanoTime - t0) / 1e6 / 20
}
println(f"PROBE sched_pre ${schedMs()}%.0f ms/job")
time2("graph1_pagerank_sf1") {
  Graph.pagerank(
    Graph.purchaseEdges(
      spark.read.parquet(s"$dir10/orders.parquet"),
      spark.read.parquet(s"$dir10/lineitem.parquet")), iters = 3) }
println(f"PROBE sched_post ${schedMs()}%.0f ms/job")
System.exit(0)
