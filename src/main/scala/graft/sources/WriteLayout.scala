package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * At-rest layout strategy for the write path — the other half of scan
 * pruning: `PushdownSpec` pins that filters reach the scan, this pins that
 * the STORED table gives them something to prune.
 *
 * The 100-TB posture for a fact table:
 *  - **Hive-partition by the dominant filter column(s)** (almost always the
 *    date / ingest-batch column): queries with a partition predicate skip
 *    whole directories before any file is opened (`PartitionFilters` in the
 *    scan, vs `PushedFilters` which still opens footers).
 *  - **Sort within partitions by the secondary filter key**: parquet
 *    row-group min/max stats become selective, so even non-partition
 *    predicates skip row groups.
 *  - **zstd compression**: ~30 % smaller than snappy at comparable decode
 *    speed — at 100 TB the difference is tens of TB of storage and scan IO.
 *  - **Bound file sizes** (`maxRecordsPerFile`): one file per partition
 *    value creates multi-GB files (no scan parallelism within a partition);
 *    unbounded small files create a metadata storm. Bounded records per
 *    file keeps both splits and the file count sane.
 *
 * Companion to `Bucketing` (which owns the join-key layout): partition for
 * PRUNING, bucket for JOINS.
 */
object WriteLayout {

  /**
   * Partition-transform planner (the Iceberg-style transform menu —
   * year/month/day/hour/bucket/truncate/identity — evaluated AGAINST THE
   * DATA before anything is written): for each candidate transform,
   * one row of the numbers that decide a partition layout at 100 TB —
   * partition count (too many = metadata storm + small files; too few =
   * no pruning), the largest partition's row count and its exact ppm
   * share of the table (skew: one hot partition serializes every
   * downstream scan of it), and the mean rows per partition.
   *
   * ONE scan: every candidate's key is emitted per row via a narrow
   * posexplode, then a single (transform, key) hash-agg and a
   * transform-grain rollup — evaluating k candidates costs one pass,
   * not k. Exact integers throughout.
   *
   * Output: (transform, n_partitions, n_rows, max_rows, top_share_ppm,
   * mean_rows) ordered by transform name.
   */
  def partitionPlan(df: DataFrame,
      candidates: Seq[(String, Column)]): DataFrame = {
    require(candidates.nonEmpty, "partitionPlan needs >= 1 candidate")
    val keyed = df.select(posexplode(array(
      candidates.map { case (_, c) => c.cast("string") }: _*))
      .as(Seq("tix", "key")))
    val names = candidates.map(_._1)
    val nameCol = names.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (n, i)) => when(col("tix") === i, lit(n)).otherwise(acc)
    }
    keyed.groupBy(col("tix"), col("key"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("tix"))
      .agg(count(lit(1)).as("n_partitions"),
        sum("cnt").as("n_rows"),
        max("cnt").as("max_rows"))
      .select(nameCol.as("transform"), col("n_partitions"), col("n_rows"),
        col("max_rows"),
        expr("(1000000 * max_rows) div n_rows").as("top_share_ppm"),
        expr("n_rows div n_partitions").as("mean_rows"))
      .orderBy("transform")
  }

  /** Write `df` as a pruning-friendly partitioned parquet table. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L,
      compression: String = "zstd"): Unit =
    df
      // co-locate each partition value before partitionBy: otherwise every
      // task writes a file per value it happens to hold (files = tasks ×
      // values, the classic small-file explosion)
      .repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("compression", compression)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)

  /** Z-order (Morton) key: bit-interleave `cols`, each contributing
   * `bitsPerCol` bits LSB-first round-robin — rows close in EVERY
   * dimension land close in the one-dimensional key, so a single
   * range-cluster + within-partition sort gives row-group min/max
   * selectivity on ALL the interleaved columns at once (the multi-column
   * layout a lexicographic sort can't provide: its second column prunes
   * nothing outside runs of equal first column). Inputs must already sit
   * in [0, 2^bitsPerCol) — scale or rank first ([[writeZOrdered]] does).
   * Pure shift/mask builtin composition: codegen'd, deterministic,
   * replayable in any engine with integer bit ops. */
  def zorderKey(cols: Seq[Column], bitsPerCol: Int): Column = {
    require(cols.nonEmpty, "need at least one column")
    require(bitsPerCol >= 1 && bitsPerCol * cols.size <= 63,
      s"interleaved width must fit a signed long, got ${cols.size} cols x $bitsPerCol bits")
    val k = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bitsPerCol
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Hilbert-curve key for 2-D clustering: maps (x, y), each in
   * [0, 2^bits), to the point's distance along the order-`bits` Hilbert
   * curve — the space-filling curve whose consecutive keys are ALWAYS
   * adjacent cells (step distance 1), where Morton order takes long
   * diagonal jumps at power-of-two boundaries. The practical effect on a
   * zone-map layout: file key-ranges cover more compact rectangles, so a
   * box predicate intersects fewer files than under [[zorderKey]] at the
   * same file size ([[graft.ext.Profile.zonemapPruneAudit]] measures
   * exactly this, natural vs Morton vs Hilbert, in the z4 gate).
   *
   * The classic top-down bit algorithm (quadrant index + rotate/reflect
   * per level) as the engine's native codegen'd
   * [[graft.functions.HilbertKey]] expression — the walk is a loop
   * carrying (x, y, d) state, which as builtins costs `bits` interpreted
   * lambda frames + a struct allocation per level PER EVALUATION, and a
   * clustering write evaluates the key through range-sampling AND the
   * sort (z4's fold form measured ~24× the one-pass price at sf0.1); the
   * native loop is ~6 long ops per level inside WholeStageCodegen. The
   * oracle replays the identical walk as `bits` chained CTEs. Inputs
   * must already sit in [0, 2^bits) — scale or rank first, as with
   * [[zorderKey]]. Sessions not built with `GraftExtensions` need
   * `GraftFunctions.register` before analysis (the jaroWinkler
   * contract). */
  def hilbertKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && 2 * bits <= 62,
      s"2*bits must fit a signed long, got $bits")
    graft.functions.GraftFunctions.hilbert(
      x.cast("long"), y.cast("long"), bits)
  }

  /** Small-file compaction PLAN over a (dir, path, bytes) file-listing
   * relation: contiguous running-sum bin fill to `targetBytes` — the
   * sp2 token-packing arithmetic on byte grain, path order preserved
   * inside each dir so a clustered layout's sort survives the rewrite.
   * The window partitions by `dir` (per-partition-directory planning,
   * parallel across a partitioned table's directories — file listings
   * are metadata-grain, but a 100-TB table still has millions of them
   * spread over thousands of dirs). Output: input + `out_file` (the
   * compacted file ordinal within its dir). The "should I pay the
   * rewrite?" audit is one agg over this plan: files before vs
   * `max(out_file)+1` after. */
  def compactionPlan(files: DataFrame, targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("dir").orderBy("path")
    files
      .withColumn("__cum", sum(col("bytes")).over(w) - col("bytes"))
      .withColumn("out_file", expr(s"__cum div ${targetBytes}L"))
      .drop("__cum")
  }

  /** Execute a compaction of a FLAT parquet table directory: group the
   * part files by the [[compactionPlan]] arithmetic (name order,
   * running-byte fill), rewrite each group as one file, and publish with
   * the engine's staged-swap discipline (`AnnIndex.stageAndSwap` at
   * DIRECTORY grain): stage the full rewrite under `$dir.tmp`, rename
   * live→`.bak`, `.tmp`→live, drop `.bak` — readers see the old table
   * or the new one, never a mix, and [[recoverCompaction]] repairs any
   * crash point. One read+write job per OUTPUT file (the Delta OPTIMIZE
   * shape — each job's input is bounded by `targetBytes`); row content
   * is preserved exactly, file count drops to ⌈bytes/target⌉. Returns
   * (files before, files after); a table already at ≤ 1 file per
   * target-bin is left untouched. */
  def compactTable(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetBytes: Long): (Int, Int) = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(dir)
    val fs = live.getFileSystem(conf)
    val parts = fs.listStatus(live)
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
    // the plan, driver-side over metadata: contiguous name-order fill —
    // the same running-sum-div arithmetic compactionPlan speaks
    // relationally, applied to this one directory
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.mutable.ArrayBuffer[org.apache.hadoop.fs.FileStatus]]
    var cum = 0L
    var lastBin = -1L
    parts.foreach { f =>
      val bin = cum / targetBytes
      cum += f.getLen
      if (bin != lastBin) { groups +=
        scala.collection.mutable.ArrayBuffer(f); lastBin = bin }
      else groups.last += f
    }
    if (groups.size >= parts.length) return (parts.length, parts.length)
    val tmp = new org.apache.hadoop.fs.Path(s"$dir.tmp")
    val bak = new org.apache.hadoop.fs.Path(s"$dir.bak")
    fs.delete(tmp, true)
    fs.mkdirs(tmp)
    groups.zipWithIndex.foreach { case (g, i) =>
      val dest = new org.apache.hadoop.fs.Path(
        f"$dir.tmp/part-compact-$i%05d.parquet")
      if (g.size == 1) {
        // singleton bin: nothing to merge — byte-copy instead of a
        // decode/re-encode job (a mostly-compacted table costs only its
        // genuinely mergeable bins, the Delta OPTIMIZE contract)
        org.apache.hadoop.fs.FileUtil.copy(fs, g(0).getPath, fs, dest,
          false, conf)
      } else {
        // union of per-file single-partition reads, NOT one multi-file
        // read: Spark scans parquet splits in SIZE order (descending),
        // so a bare read would interleave the name order and destroy
        // the clustering sort this op promises to preserve; union
        // children keep their order and the final coalesce(1)
        // concatenates child partitions in that order. (Residual
        // caveat: a single input file bigger than
        // spark.sql.files.maxPartitionBytes can still reorder its OWN
        // row groups — small-file compaction inputs are below that by
        // definition of the problem.)
        val stage = s"$dir.tmp/_g$i"
        g.map(f => spark.read.parquet(f.getPath.toString).coalesce(1))
          .reduce(_ union _)
          .coalesce(1).write.mode("overwrite").parquet(stage)
        val part = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
          .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        require(part.length == 1,
          s"coalesce(1) must yield one file, got ${part.length}")
        fs.rename(part(0).getPath, dest)
        fs.delete(new org.apache.hadoop.fs.Path(stage), true)
      }
    }
    if (!fs.rename(live, bak))
      throw new java.io.IOException(s"compact: rename $live -> $bak failed")
    if (!fs.rename(tmp, live))
      throw new java.io.IOException(s"compact: rename $tmp -> $live failed")
    fs.delete(bak, true)
    (parts.length, groups.size)
  }

  /** Repair a crashed [[compactTable]] — the `recoverSwap` three-case
   * logic at directory grain: live present → drop leftovers (swap never
   * started or fully completed); no live but `.tmp` → the crash hit
   * between the renames, the staged rewrite is complete: promote it;
   * only `.bak` → restore it. */
  def recoverCompaction(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(dir)
    val tmp = new org.apache.hadoop.fs.Path(s"$dir.tmp")
    val bak = new org.apache.hadoop.fs.Path(s"$dir.bak")
    val fs = live.getFileSystem(conf)
    if (fs.exists(live)) {
      fs.delete(tmp, true); fs.delete(bak, true)
    } else if (fs.exists(tmp) &&
        !fs.listStatus(tmp).exists(_.getPath.getName.startsWith("_g"))) {
      fs.rename(tmp, live); fs.delete(bak, true)
    } else if (fs.exists(bak)) {
      fs.delete(tmp, true); fs.rename(bak, live)
    }
  }

  /** Z-order-clustered parquet write: each clustering column min-max
   * scales to `bitsPerCol` bits (bounds from ONE tiny agg — layout
   * parameters on the driver, same posture as an IVF codebook), rows
   * range-partition AND sort by the interleaved key. `numFiles` bounds
   * output parallelism/file count. The key column itself is dropped
   * before the write — it is layout, not data. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      bitsPerCol: Int = 16, numFiles: Int = 32,
      compression: String = "zstd"): Unit = {
    require(!df.columns.contains("__z"),
      "input already has a __z column — rename it before z-ordering")
    val aggs = zCols.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head
    if (bounds.isNullAt(0)) {
      // empty input: nothing to cluster — write the empty dataset as-is
      // (same behavior as writePartitioned on empty input, not an NPE)
      df.write.option("compression", compression)
        .mode("overwrite").parquet(path)
      return
    }
    val maxVal = (1L << bitsPerCol) - 1
    val scaled = zCols.zipWithIndex.map { case (c, idx) =>
      val lo = bounds.getLong(idx * 2)
      val hi = bounds.getLong(idx * 2 + 1)
      val span = math.max(1L, hi - lo)
      // scale in DOUBLE: long arithmetic overflows for spans past ~2^47
      // ((v-lo)*maxVal wraps silently), corrupting the clustering.
      // Rounding error at 2^53+ spans only blurs bucket edges — the key is
      // layout, not data — and the clamp pins the documented
      // [0, 2^bitsPerCol) precondition regardless.
      least(lit(maxVal), greatest(lit(0L),
        floor((col(c).cast("double") - lit(lo.toDouble)) * maxVal / span)
          .cast("long")))
    }
    df.withColumn("__z", zorderKey(scaled, bitsPerCol))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .option("compression", compression)
      .mode("overwrite")
      .parquet(path)
  }
}
