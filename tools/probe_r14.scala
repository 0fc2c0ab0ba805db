// Fresh-context timing probe for the r13 small-query wall creep
// (VERDICT r13 "What's wrong" #2): at3/s10-s14/d12/n1/graph13/n20 read
// 1.6-2.1x over r11 with a flat ckpt canary and untouched definitions.
// A fresh JVM + warmed IO isolates the queries from Bench's shared
// session (suspected block-manager/memory-sink crowding, the r9 shape):
// fresh walls at r11 level => crowding; fresh walls at r13 level =>
// real, needs a named cause.
// Run: see tools/verify_local.sh for the classpath; drive via
//   spark-shell -I tools/probe_r14.scala   (or scala -cp ...)
val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
// warm the IO path the same way Bench does
Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
  .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
for (n <- Seq("at3_rfm_segments", "s10_retention_km", "s11_event_trigrams",
    "s12_cohort_retention", "s14_burstiness", "d12_incremental_dedup",
    "n1_knn_brute", "graph13_scc", "n20_knn_ivfadc_rerank",
    "s13_funnel_latency")) {
  for (i <- 1 to 3) {
    val t0 = System.nanoTime
    graft.SparkEntry.queries(n)(spark, sfDir).count()
    println(f"PROBE $n run$i ${(System.nanoTime - t0) / 1e9}%.2f s")
  }
}
System.exit(0)
