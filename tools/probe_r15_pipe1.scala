// r15 pipe1 stage breakdown: time each curation signal sub-relation
// separately (guide §1 — find WHERE the 5.97 s goes before touching the
// composition). Drive via spark-shell -I tools/probe_r15_pipe1.scala.
import org.apache.spark.sql.functions._
import graft.ext._

val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
Seq("documents", "embeddings")
  .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
graft.functions.GraftFunctions.register(spark)

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

def docs = spark.read.parquet(s"$sfDir/documents.parquet")
def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
def bench = docs.filter(col("doc_id") % 20 === 0)

time2("lang") { docs.select(col("doc_id"),
  (TextAnalysis.langId(col("text")) === lit("en")).as("lang_ok")) }
time2("quality_gopher") { TextAnalysis.gopherRules(docs) }
time2("exact_dedup") { Dedup.exactDedup(docs) }
time2("neardup_survivors") { Dedup.dedupSurvivors(docs,
  Dedup.dupClusters(
    Dedup.minhashDedupPairsFromShingles(Dedup.shingles(docs), 0.5, 100)
      .select("doc_a", "doc_b"))) }
time2("contaminated") {
  Dedup.decontaminationHitsFromShingles(Dedup.shingles(docs), bench, 5)
    .filter(col("doc_id") =!= col("bench_id")).select("doc_id").distinct() }
time2("span_kept") { Dedup.removeDuplicateSpans(docs, 8) }
time2("embed_hits") { Similarity.embedDecontaminationHits(
  emb.filter(col("vec_id") >= 10), emb.filter(col("vec_id") < 10),
  0.3, "label") }
time2("quality_score_t8") { QualityModel.score(docs) }
time2("xent_t14") { TextAnalysis.unigramCrossEntropy(docs) }
time2("pipe1_full") { Curation.curationReport(docs, bench,
  embeddings = Some((emb.filter(col("vec_id") >= 10),
    emb.filter(col("vec_id") < 10))), withSignals = true) }
time2("pipe1_mat") { Curation.curationReport(docs, bench,
  embeddings = Some((emb.filter(col("vec_id") >= 10),
    emb.filter(col("vec_id") < 10))), withSignals = true,
  materializeShared = true) }
time2("pipe5_full") { Curation.curationReport(docs, bench,
  embeddings = Some((emb.filter(col("vec_id") >= 10),
    emb.filter(col("vec_id") < 10))))
  .agg(count(lit(1)).as("n_docs")) }
System.exit(0)
