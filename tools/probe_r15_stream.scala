// r15 streaming-commit-IO experiment (r14 verdict #9): measure the
// MemoryStream -> profileStream -> foreachBatch spine with and without
// asyncProgressTrackingEnabled (public Spark 3.4+ API, SPARK-39591) —
// walCommit + commitOffsets were ~20% of per-batch cost in the bench's
// durationMs breakdown. Drive via spark-shell -I.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
val perBatch = 10000
val nBatches = 5

def runSpine(async: Boolean): Unit = {
  val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
  val profiles = graft.streaming.StreamingEtl.profileStream(
    mem.toDF().select(col("value")), graft.queries.Tables.AsOfDate)
  val ckpt = java.nio.file.Files.createTempDirectory("probe_stream_ckpt").toString
  val seen = new java.util.concurrent.atomic.AtomicLong(0)
  var w = profiles.writeStream
    .outputMode("append")
    .option("checkpointLocation", ckpt)
    .trigger(Trigger.ProcessingTime(0))
  if (async) w = w
    .option("asyncProgressTrackingEnabled", "true")
    .option("asyncProgressTrackingCheckpointIntervalMs", "0")
  val query = w.foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
      seen.addAndGet(b.count()); ()
    }.start()
  val chunks = graft.sources.EnvelopeGenerator
    .generate((nBatches + 1) * perBatch).grouped(perBatch).toSeq
  mem.addData(chunks.head)
  query.processAllAvailable()
  val t0 = System.nanoTime
  chunks.tail.foreach { c => mem.addData(c); query.processAllAvailable() }
  val wall = (System.nanoTime - t0) / 1e9
  val sums = scala.collection.mutable.LinkedHashMap.empty[String, Long]
  val progresses = query.recentProgress.toSeq
  progresses.foreach(p => p.durationMs.forEach((k, v) =>
    sums += (k -> (sums.getOrElse(k, 0L) + v))))
  query.stop()
  println(f"PROBE stream async=$async eps ${nBatches * perBatch / wall}%.0f " +
    f"wall $wall%.2f s seen ${seen.get} breakdown " +
    sums.map { case (k, v) => s"$k=${v / progresses.size}" }.mkString(","))
}

for (i <- 1 to 2) runSpine(async = false)
for (i <- 1 to 2)
  try runSpine(async = true)
  catch { case e: Throwable =>
    println(s"PROBE stream async=true REFUSED: ${e.getMessage}") }
System.exit(0)
