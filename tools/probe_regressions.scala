// Fresh-context timing probe for the r2->r3 small-query regressions
// (t4_fingerprint, sp1_hash_split, p5_age_filter, st1_stream_spine).
// Run: see tools/verify_local.sh for the classpath; drive via spark-shell -I.
val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
// warm the IO path the same way Bench does
Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
  .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
for (n <- Seq("t4_fingerprint", "sp1_hash_split", "p5_age_filter",
    "st1_stream_spine", "st2_email_topk")) {
  for (i <- 1 to 3) {
    val t0 = System.nanoTime
    graft.SparkEntry.queries(n)(spark, sfDir).count()
    println(f"PROBE $n run$i ${(System.nanoTime - t0) / 1e9}%.2f s")
  }
}
System.exit(0)
