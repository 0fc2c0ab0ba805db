package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 *  - Brute-force cosine top-k: the exact baseline — a broadcast of the query
 *    set against a full scan of the corpus, one window per query for the
 *    top-k cut. Linear in corpus size; the right answer up to ~10^7 vectors
 *    per executor-scan when the query set is small.
 *  - IVF-style cell-restricted search: candidates limited to the query's
 *    coarse cell (here the materialized `label` column stands in for the
 *    assigned centroid id — exactly how an IVF index is stored at rest:
 *    a cell id column + cell-partitioned layout). Turns the scan into a
 *    partition-pruned lookup; recall trades off with cell count.
 *
 * All arithmetic is element-wise double math in index order (codegen'd
 * builtins — `zip_with`/`aggregate`), so results replay bit-for-bit in the
 * DuckDB oracle.
 */
object Similarity {

  /** Dot product of two float-array columns in double precision — the
   * codegen'd native expression (graft.functions.FloatVecDot). Requires
   * `GraftFunctions.register(spark)` on the session (GraftSession does it;
   * query defs re-register defensively). Bit-identical to the builtin
   * composition `aggregate(zip_with(a,b,(x,y)=>x*y), 0d, _+_)`. */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.vecDot(a, b)

  /** The builtin-only composition (kept for cross-checking the native
   * expression in tests). */
  def dotBuiltin(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity (double). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact brute-force top-k neighbors for each query vector.
   * `queries`/`corpus`: (id, embedding). Self-matches excluded.
   * Norms are precomputed per side — one sqrt per vector instead of two
   * dot products per PAIR (same doubles, so results are unchanged; the
   * per-pair work drops to a single fused dot product). */
  def knnBrute(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      sqrt(dot(col("embedding"), col("embedding"))).as("q_norm"))
    // Query side broadcast EXPLICITLY (the documented bounded-query-set
    // posture) so the streamed side is the corpus — spread to the
    // parallelism floor, since the O(q·n) scoring otherwise runs inside
    // however few splits the corpus scan yields (ONE at bench scale).
    val c = Dedup.spread(corpus).select(col("vec_id").as("n_id"),
      col("embedding").as("n_emb"),
      sqrt(dot(col("embedding"), col("embedding"))).as("n_norm"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(dot(col("q_emb"), col("n_emb")) / (col("q_norm") * col("n_norm")), 4).as("sim"))
    topKBySim(scored, k, "sim")
  }

  /** Graph-based ANN: greedy BEAM search over a k-NN neighbor graph —
   * the NSW/HNSW search paradigm (Malkov & Yashunin) in its flat,
   * deterministic form, completing the engine's ANN inventory beside
   * the space-partitioning families (IVF cells) and the code-compression
   * families (PQ/SQ): each query starts at fixed `entryPoints`, and for
   * `hops` rounds expands its current beam's out-neighbors in `graph`,
   * re-scores the candidates exactly, and keeps the `beam` best
   * (sim DESC, id — the TypedTopK order, so the walk is bit-deterministic
   * and oracle-replayable round by round). Output: top-`k` of the final
   * beam, [[knnBrute]]'s shape.
   *
   * Why it scales: per round each query touches ≤ beam·outdeg + beam
   * candidates — the vectors READ are O(queries·hops·beam·outdeg),
   * never the corpus, and unlike IVF there is no cell-boundary recall
   * cliff (the walk crosses cells by construction). `graph` is any
   * (q_id → src, n_id → dst) neighbor relation: [[knnBrute]] output at
   * gate scale, an [[AnnIndex]] search at build scale — the kNN-graph
   * build composes with every existing search path. Plan shape per
   * round: one bounded join into the graph, one join to fetch candidate
   * vectors (candidate-sized, behind the distinct), one top-k agg;
   * each round's beam is materialized (the pagerank posture — the next
   * round's join must not re-derive the whole walk). */
  def nswSearch(queries: DataFrame, corpus: DataFrame, graph: DataFrame,
      entryPoints: Seq[Long], k: Int, beam: Int = 8,
      hops: Int = 3): DataFrame = {
    require(entryPoints.nonEmpty, "nswSearch needs at least one entry point")
    require(beam >= k, s"beam ($beam) must be >= k ($k)")
    require(hops >= 1, s"hops must be >= 1, got $hops")
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"),
      sqrt(dot(col("embedding"), col("embedding"))).as("q_norm"))
    val c = corpus.select(col("vec_id").as("n_id"),
      col("embedding").as("n_emb"),
      sqrt(dot(col("embedding"), col("embedding"))).as("n_norm"))
    val g = graph.select(col("q_id").as("src"), col("n_id").as("dst"))
    def score(cand: DataFrame): DataFrame =
      cand.join(c, "n_id").join(q, "q_id")
        .filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"),
          round(dot(col("q_emb"), col("n_emb")) /
            (col("q_norm") * col("n_norm")), 4).as("sim"))
    val session = queries.sparkSession
    import session.implicits._
    // seeds: the fixed entry points PLUS each query's own out-neighbors
    // when it is a graph vertex — the HNSW ep∪N(q) convention. Besides
    // the recall bump, this closes an edge: a query that IS the sole
    // entry point would otherwise start with an empty beam (self-scores
    // are excluded) and silently vanish from the output.
    val entry = q.select(col("q_id"))
      .crossJoin(broadcast(entryPoints.toDF("n_id")))
      .union(q.select(col("q_id"))
        .join(g, col("q_id") === col("src"))
        .select(col("q_id"), col("dst").as("n_id")))
      .distinct()
    var beamDf = Dedup.materialize(topKBySim(score(entry), beam, "sim"))
    for (_ <- 1 to hops) {
      val cand = beamDf.join(g, beamDf("n_id") === g("src"))
        .select(col("q_id"), col("dst").as("n_id"))
        .union(beamDf.select(col("q_id"), col("n_id")))
        .distinct()
      beamDf = Dedup.materialize(topKBySim(score(cand), beam, "sim"))
    }
    topKBySim(beamDf.select("q_id", "n_id", "sim"), k, "sim")
  }

  /** k-NN-distance outliers over ANY (q_id, n_id, sim, rank) neighbor
   * relation: each vector's k-th-neighbor similarity is its local-density
   * proxy (the classic kNN outlier score, Ramaswamy et al. 2000 — the
   * embedding-curation step that drops mislabeled/garbage vectors BEFORE
   * they seed codebooks or prototypes); the `topN` lowest k-th-sims are
   * the outliers, ties to the smaller id. Compositional by design: feed
   * [[knnBrute]] for the exact gate form, or any [[AnnIndex]] search for
   * the 100-TB form — the cut is one filter + TakeOrderedAndProject over
   * a relation the search already bounded to k rows per vector.
   * `scoreCol`/`higherIsCloser` adapt to the relation's score: the brute
   * paths emit cosine `sim` (higher = closer → outliers have the LOWEST
   * k-th score), the index ADC paths emit `dist_q` (lower = closer →
   * outliers have the HIGHEST). */
  def knnOutliersFrom(knn: DataFrame, k: Int, topN: Int,
      scoreCol: String = "sim", higherIsCloser: Boolean = true): DataFrame =
    knn.filter(col("rank") === k)
      .select(col("q_id").as("vec_id"), col(scoreCol).as(s"kth_$scoreCol"))
      .orderBy(
        if (higherIsCloser) col(s"kth_$scoreCol").asc
        else col(s"kth_$scoreCol").desc,
        col("vec_id").asc)
      .limit(topN)

  /** [[knnOutliersFrom]] over the exact brute-force neighbors. */
  def knnOutliers(vecs: DataFrame, k: Int, topN: Int): DataFrame =
    knnOutliersFrom(knnBrute(vecs, vecs, k), k, topN)

  /** Local Outlier Factor (Breunig et al., SIGMOD 2000) over ANY
   * (q_id, n_id, sim, rank) neighbor relation — the DENSITY-NORMALIZED
   * outlier score [[knnOutliersFrom]]'s raw k-th-distance cannot express:
   * a point at the edge of a tight cluster and a point inside a diffuse
   * one can share the same k-distance, but only the first has neighbors
   * whose own densities dwarf its own (LOF ≫ 1). The embedding-curation
   * cut for corpora with clusters of very different density.
   *
   *   reach_k(p,o) = max(kdist(o), d(p,o))
   *   lrd(p)       = |N(p)| / Σ_{o∈N(p)} reach_k(p,o)
   *   LOF(p)       = (Σ_{o∈N(p)} lrd(o)) / lrd(p) / |N(p)|
   *
   * N(p) here is the EXACTLY-k neighbor set the relation carries
   * (rank ≤ k under the deterministic (sim DESC, id) order) — the
   * practical fixed-k variant; ties beyond rank k do not expand the set
   * as in the paper's Def. 4 (documented deviation, standard in
   * implementations).
   *
   * Determinism: distances quantize to 4-decimal integers (the relation's
   * own `sim` rounding), reach distances are integer max's, and lrd
   * micro-quantizes to a BIGINT (1e12/avg-reach scale) BEFORE the
   * neighbor sum — so the only double chain is one fixed-shape
   * (sum / lrd / n) expression over exact integers, bit-replayable by an
   * independent engine at any partitioning. Duplicate pile-ups (Σ reach
   * = 0, k+1 coincident vectors) clamp the denominator to 1 instead of
   * emitting ∞ — those points score maximally dense, LOF ≈ 1.
   *
   * Scale shape: three joins keyed on the vector id + two hash-aggs over
   * the k·|V|-row neighbor relation — everything is |V|- or k·|V|-sized,
   * nothing quadratic. Compositional like [[knnOutliersFrom]]: feed
   * [[knnBrute]] at gate scale or an [[AnnIndex]] search at corpus scale
   * (any recall loss degrades the DIAGNOSTIC smoothly — LOF only reads
   * the relation it is given). Output: top-`topN` by (lof DESC, vec_id):
   * (vec_id, kdist_q, lrd_q, lof). */
  def lofFrom(knn: DataFrame, k: Int, topN: Int,
      distQCol: Option[String] = None): DataFrame = {
    // LOF consumes integer DISTANCES: by default the 4-decimal cosine
    // distance recovered exactly from the relation's round(·, 4) `sim`;
    // an AnnIndex search passes its own ADC integer distance column
    // (`distQCol = Some("dist_q")`) — same math, index-scale source.
    val dQ = distQCol.map(col).getOrElse(
      round((lit(1.0) - col("sim")) * lit(1e4), 0).cast("long"))
    val kd = knn.filter(col("rank") === k)
      .select(col("q_id").as("id"), dQ.as("kdist_q"))
    val reach = knn
      .select(col("q_id"), col("n_id"), dQ.as("d_q"))
      .join(kd.select(col("id").as("n_id"), col("kdist_q").as("n_kdist_q")),
        Seq("n_id"))
      .select(col("q_id"),
        greatest(col("n_kdist_q"), col("d_q")).as("reach_q"))
    val lrd = Dedup.materialize(reach.groupBy("q_id")
      .agg(count(lit(1)).as("n_nb"), sum("reach_q").as("s_reach"))
      .select(col("q_id").as("id"), col("n_nb"),
        floor((col("n_nb").cast("double") * lit(1e12)) /
          greatest(col("s_reach"), lit(1L)) + lit(0.5)).cast("long")
          .as("lrd_q")))
    knn.select(col("q_id"), col("n_id"))
      .join(lrd.select(col("id").as("n_id"), col("lrd_q").as("n_lrd_q")),
        Seq("n_id"))
      .groupBy("q_id")
      .agg(sum("n_lrd_q").as("s_lrd"), count(lit(1)).as("n_nb"))
      .join(lrd.select(col("id").as("q_id"), col("lrd_q")), Seq("q_id"))
      .join(kd.select(col("id").as("q_id"), col("kdist_q")), Seq("q_id"))
      .select(col("q_id").as("vec_id"), col("kdist_q"), col("lrd_q"),
        round(col("s_lrd").cast("double") / col("lrd_q") / col("n_nb"), 6)
          .as("lof"))
      .orderBy(desc("lof"), asc("vec_id"))
      .limit(topN)
  }

  /** [[lofFrom]] over the exact brute-force neighbors. */
  def lofOutliers(vecs: DataFrame, k: Int, topN: Int): DataFrame =
    lofFrom(Dedup.materialize(knnBrute(vecs, vecs, k)), k, topN)

  /** ε-neighborhood relation for density clustering: all ordered pairs
   * (a_id, b_id), a ≠ b, with round-4 cosine ≥ `simEps` (the e7
   * cross-engine rounding convention). Symmetric by construction. This
   * brute form is the GATE/oracle baseline (the documented bounded brute
   * pattern, like [[knnBrute]]); at corpus scale feed [[dbscanFrom]]
   * from a blocked candidate relation instead — IVF cell co-residents
   * ([[knnCell]]), LSH buckets, or an [[AnnIndex]] search — DBSCAN's
   * semantics only need the neighbor SET, not how it was enumerated. */
  def epsNeighbors(vecs: DataFrame, simEps: Double): DataFrame = {
    val a = vecs.select(col("vec_id").as("a_id"),
      col("embedding").as("a_emb"),
      sqrt(dot(col("embedding"), col("embedding"))).as("a_norm"))
    // Streamed side spread to the parallelism floor (the knnBrute
    // posture): the O(n²) scoring otherwise runs inside however few
    // splits the scan yields (one at bench scale).
    val b = Dedup.spread(vecs).select(col("vec_id").as("b_id"),
      col("embedding").as("b_emb"),
      sqrt(dot(col("embedding"), col("embedding"))).as("b_norm"))
    // zero-norm guard: a zero vector's cosine is 0/0 = NaN, and Spark's
    // NaN >= eps filter DROPS the pair while DuckDB orders NaN greater
    // than any value and would KEEP it — the explicit predicate makes
    // the "no zero vectors pair up" contract identical in both engines.
    broadcast(a).crossJoin(b).filter(col("a_id") =!= col("b_id") &&
        col("a_norm") > 0 && col("b_norm") > 0)
      .select(col("a_id"), col("b_id"),
        round(dot(col("a_emb"), col("b_emb")) /
          (col("a_norm") * col("b_norm")), 4).as("sim"))
      .filter(col("sim") >= simEps)
  }

  /** DBSCAN (Ester et al. 1996) over ANY symmetric neighbor relation —
   * the density clustering that needs NO cluster count and leaves
   * low-density points unclustered (vs k-means-style cells, which
   * conscript every point): core points have ≥ `minPts` neighbors
   * INCLUDING themselves (degree ≥ minPts−1); clusters are the
   * connected components of the core-core subgraph (min-core-id
   * labeled, via the same O(log² n) star-rounds machinery as
   * [[Dedup.dupClusters]]); border points (non-core with a core
   * neighbor) adopt the MINIMUM cluster id among their core neighbors
   * — a deterministic refinement of the paper's arrival-order tie —
   * and everything else is noise.
   *
   * `nbrs` must be DISTINCT symmetric ordered pairs without
   * self-pairs ([[epsNeighbors]] at gate scale; any blocked candidate
   * relation at corpus scale — deduplicate a multi-block enumeration
   * first, or duplicate pairs inflate degrees and mint false cores). Scale shape: one degree hash-agg, two semi-joins to
   * cut the core-core subgraph, star-rounds CC (shuffle-bounded), one
   * min hash-agg for borders — nothing corpus² beyond what the caller's
   * neighbor enumeration already paid.
   * Output: (vec_id, role ∈ core|border|noise, cluster — null on noise). */
  def dbscanFrom(points: DataFrame, nbrs: DataFrame,
      minPts: Int): DataFrame = {
    require(minPts >= 2, s"minPts must be >= 2, got $minPts")
    val deg = nbrs.groupBy(col("a_id").as("vec_id"))
      .agg(count(lit(1)).as("__deg"))
    val cores = deg.filter(col("__deg") >= minPts - 1).select("vec_id")
    val ccEdges = nbrs
      .join(cores.select(col("vec_id").as("a_id")), "a_id")
      .join(cores.select(col("vec_id").as("b_id")), "b_id")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"))
    val comp = Dedup.dupClusters(ccEdges)
      .select(col("doc_id").as("vec_id"), col("cluster"))
    // isolated cores (dense but no core neighbor) root their own cluster
    val coreClusters = cores.join(comp, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster"), col("vec_id")).as("cluster"))
    val viaCore = nbrs
      .join(coreClusters.select(col("vec_id").as("b_id"),
        col("cluster").as("__nc")), "b_id")
      .groupBy(col("a_id").as("vec_id"))
      .agg(min("__nc").as("__bc"))
    points.select(col("vec_id"))
      .join(coreClusters.select(col("vec_id"),
        col("cluster").as("__cc")), Seq("vec_id"), "left")
      .join(viaCore, Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("__cc").isNotNull, lit("core"))
          .when(col("__bc").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("__cc"), col("__bc")).as("cluster"))
  }

  /** [[dbscanFrom]] over the exact brute ε-neighborhood — the gate
   * composition. */
  def dbscan(vecs: DataFrame, simEps: Double, minPts: Int): DataFrame =
    dbscanFrom(vecs, Dedup.materialize(epsNeighbors(vecs, simEps)),
      minPts)

  /** Contrastive hard-negative mining: per query, the `k` most-similar
   * corpus vectors carrying a DIFFERENT `labelCol` — the negatives that
   * actually teach a contrastive/embedding model (same-label neighbors
   * are positives; random negatives are too easy to carry gradient). The
   * label predicate applies BEFORE the top-k cut, so every query gets k
   * eligible negatives when the corpus holds that many — the
   * [[knnIvfPqFiltered]] pre-filter contract with a per-query predicate.
   * Exact brute form (the gate); at corpus scale mine per label stratum
   * through the [[AnnIndex]] filtered searches (allowed = the complement
   * of the stratum), batching queries by label so the filter relation
   * stays one broadcast per batch. Output: (q_id, n_id, sim, rank). */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
      labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), col(labelCol).as("__ql"),
      sqrt(dot(col("embedding"), col("embedding"))).as("q_norm"))
    val c = Dedup.spread(corpus).select(col("vec_id").as("n_id"),
      col("embedding").as("n_emb"), col(labelCol).as("__nl"),
      sqrt(dot(col("embedding"), col("embedding"))).as("n_norm"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .filter(!(col("__ql") <=> col("__nl")))
      .select(col("q_id"), col("n_id"),
        round(dot(col("q_emb"), col("n_emb")) /
          (col("q_norm") * col("n_norm")), 4).as("sim"))
    topKBySim(scored, k, "sim")
  }

  /** Random-hyperplane plane matrix for in-engine cell derivation: `bits`
   * planes × `dim` weights, every weight derived from md5 of
   * `"rp:<seed>:<plane>:<dim>"` and quantized to the 1/1000 grid
   * (`k/1000.0`, k ∈ [-1000, 1000]). The quantization is what makes the
   * assignment ORACLE-REPLAYABLE: a 3-decimal literal parses to the
   * identical IEEE double in any engine (DuckDB included), so the sign of
   * the projection — and therefore the cell id — is bit-for-bit
   * reproducible outside Spark. Fixed seed ⇒ same planes on every run,
   * every cluster. */
  def rpPlanes(dim: Int, bits: Int, seed: String = "rp"): Array[Array[Double]] =
    Array.tabulate(bits) { p =>
      Array.tabulate(dim) { d =>
        (md5u32(s"rp:$seed:$p:$d") % 2001 - 1000) / 1000.0
      }
    }

  /** First 4 md5 bytes as an unsigned 32-bit value — the same
   * `('0x' || substr(md5(s), 1, 8))::BIGINT` the dedup oracles replay. */
  private def md5u32(s: String): Long = {
    val b = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  /** Sign-bucket cell id from random hyperplanes: bit p = [emb · w_p > 0],
   * cell = Σ bit_p · 2^p — the b-bit SimHash-for-vectors bucketing that
   * turns raw embeddings into an IVF-style coarse partitioning with NO
   * trained centroids and no driver-side state. Each projection runs through
   * the native codegen'd vecDot (double-weight side), so the derivation is a
   * single narrow map over the corpus — embarrassingly parallel, one pass,
   * no shuffle. Closes the round-2 gap: `knnCell`/`cosineDedupPairs` no
   * longer need a caller-supplied cell column. */
  def rpCell(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (w, p) =>
      when(dot(emb, lit(w)) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** ANN over raw embeddings end-to-end: derive cells for corpus AND queries
   * from the same planes, then cell-restricted top-k. The scale path a user
   * with only an embedding column actually runs. */
  def knnRp(queries: DataFrame, corpus: DataFrame, k: Int,
      bits: Int = 4, dim: Int = 64, seed: String = "rp",
      maxCell: Int = 10000): DataFrame = {
    val planes = rpPlanes(dim, bits, seed)
    knnCell(
      queries.withColumn("__rp_cell", rpCell(col("embedding"), planes)),
      corpus.withColumn("__rp_cell", rpCell(col("embedding"), planes)),
      "__rp_cell", k, maxCell)
  }

  /** Multi-probe variant of `knnRp`: each query searches its own cell PLUS
   * the `bits` Hamming-1 neighbor cells (one sign-bit flip each) — the
   * standard recall repair for sign-bucket ANN. A query that lies near a
   * hyperplane has true neighbors on both sides of it; probing the flipped
   * cells recovers them at a bounded (bits+1)× candidate cost, still
   * O(|corpus| / 2^bits) per probe. Corpus vectors keep exactly one cell, so
   * probe candidate sets are disjoint — no dedup pass needed before the
   * top-k cut. */
  def knnRpMultiProbe(queries: DataFrame, corpus: DataFrame, k: Int,
      bits: Int = 4, dim: Int = 64, seed: String = "rp",
      maxCell: Int = 10000): DataFrame =
    knnCell(multiProbeCells(queries, rpPlanes(dim, bits, seed), "__rp_cell"),
      corpus.withColumn("__rp_cell",
        rpCell(col("embedding"), rpPlanes(dim, bits, seed))),
      "__rp_cell", k, maxCell)

  /** The multi-probe query expansion: each query row explodes to its base
   * rp cell plus the `bits` Hamming-1 flips, under `cellCol`. Shared by the
   * fused [[knnRpMultiProbe]]/[[knnIvfPqMultiProbe]] and the prebuilt-index
   * searches ([[AnnIndex.searchRpMultiProbe]]/
   * [[AnnIndex.searchIvfPqMultiProbe]]), so the index round-trip probes
   * EXACTLY the cells the fused form does. */
  private[ext] def multiProbeCells(queries: DataFrame,
      planes: Array[Array[Double]], cellCol: String): DataFrame = {
    val bits = planes.length
    val flips = array((lit(0) +: (0 until bits).map(p => lit(1 << p))): _*)
    queries
      .withColumn("__rp_base", rpCell(col("embedding"), planes))
      .withColumn("__flip", explode(flips))
      .withColumn(cellCol, col("__rp_base").bitwiseXOR(col("__flip")))
      .drop("__rp_base", "__flip")
  }

  /** Per-cell centroids — the M-step of Lloyd's k-means over the
   * rp-derived cells (`rpCell` is the E-step's assignment): element-wise
   * mean of every member embedding. Together they form one full k-means
   * iteration in-engine; iterate and the rp signature bootstraps a real
   * trained IVF codebook, all in two shuffles per round (posexplode is
   * narrow; the groupBy is a partial-aggregatable hash-agg over
   * (cell, pos) — cells × dim rows, tiny at any corpus scale).
   *
   * Determinism: element values are quantized to integer MILLIONTHS
   * (`floor(v·1e6 + 0.5)` — floor, not round: half-rounding conventions
   * differ across engines) and summed as exact BIGINTs, so double
   * summation order cannot perturb the centroid; the mean divides the
   * exact sum once at the end. Output: (cell, pos, n, s, c). */
  def cellCentroids(vecs: DataFrame, bits: Int = 4, dim: Int = 64,
      seed: String = "rp"): DataFrame = {
    val planes = rpPlanes(dim, bits, seed)
    // deliberately NOT spread: the M-step is explode + partial-aggregable
    // hash-agg (KB-scale output), and an extra exchange inside each of the
    // m per-subspace training jobs cost more at bench scale than the
    // narrow pass it parallelized (measured: +0.8 s/query on the PQ
    // family); the expensive per-vector folds live in the encode/search
    // paths, which carry the parallelism floor at their corpus boundary.
    centroidsOf(vecs
      .select(rpCell(col("embedding"), planes).as("cell"),
        col("embedding")))
  }

  /** The M-step over an ARBITRARY (cell, embedding) assignment — the
   * rp-seeded form above is round 0; later Lloyd rounds feed the
   * `nearestCell` re-assignment back through this. Same exact-BIGINT
   * micro-grid arithmetic, same (cell, pos, n, s, c) output. */
  def centroidsOf(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("cell"), col("pos"),
        floor(col("v").cast("double") * lit(1e6) + lit(0.5)).cast("long").as("vq"))
      .groupBy("cell", "pos")
      .agg(count(lit(1)).as("n"), sum("vq").as("s"))
      .select(col("cell"), col("pos"), col("n"), col("s"),
        (col("s").cast("double") / lit(1e6) / col("n")).as("c"))

  /** Element-wise quantization of an embedding to the integer-MICRO grid
   * (`floor(v·1e6 + 0.5)` per element — floor, not round: half-rounding
   * conventions differ across engines). The grid all trained-IVF distance
   * arithmetic runs on: squared distances between micro-grid vectors are
   * EXACT integers, so comparisons (and therefore cell assignments) are
   * engine-independent — no order-dependent double summation anywhere. */
  def quantizeMicro(emb: Column): Column =
    transform(emb, v => floor(v.cast("double") * lit(1e6) + lit(0.5)).cast("long"))

  /** Pivot `cellCentroids` long output to one array row per cell, each
   * element snapped to the micro grid (`floor(s/n + 0.5)` — a single
   * IEEE-deterministic double division + floor per element). The snapped
   * codebook is what the E-step measures against: exact-integer distances,
   * deterministic ties. */
  def centroidArrays(centroids: DataFrame): DataFrame =
    centroids
      .select(col("cell"), struct(col("pos"),
        floor(col("s") / col("n") + lit(0.5)).cast("long").as("cq")).as("pc"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(col("pc"))), p => p.getField("cq"))
        .as("cq"))

  /** Train-and-fetch the IVF codebook: rp sign buckets seed the cell
   * assignment (E-step 0), `cellCentroids` is the M-step, and the snapped
   * per-cell arrays come back to the driver. The collect is MODEL
   * PARAMETERS, not data — 2^bits cells × dim longs (a few KB), the same
   * posture as holding a trained IVF codebook in any vector index; the
   * data-path stays fully distributed. */
  def codebook(vecs: DataFrame, bits: Int = 4, dim: Int = 64,
      seed: String = "rp"): Array[(Int, Array[Long])] =
    fetchCodebook(centroidArrays(cellCentroids(vecs, bits, dim, seed)))

  private def fetchCodebook(arrays: DataFrame): Array[(Int, Array[Long])] =
    arrays.collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1).toArray)
      .sortBy(_._1)

  /** Multi-round Lloyd training: rp sign buckets seed round 1's M-step;
   * every further round re-assigns the corpus with the current codebook
   * (one narrow pass) and re-trains (one tiny hash-agg) — 2 shuffle-light
   * jobs per round, driver state = the codebook only. `rounds = 1` is
   * exactly `codebook`. Convergence note: k-means inertia is monotone
   * non-increasing up to the micro-grid snap, so a handful of rounds is the
   * practical regime; the per-round cost is flat in corpus size. */
  def trainCodebook(vecs: DataFrame, bits: Int = 4, dim: Int = 64,
      seed: String = "rp", rounds: Int = 1): Array[(Int, Array[Long])] = {
    require(rounds >= 1, "need rounds >= 1")
    var cb = codebook(vecs, bits, dim, seed)
    for (_ <- 2 to rounds) {
      val assigned = vecs.select(
        nearestCell(col("embedding"), cb).as("cell"), col("embedding"))
      cb = fetchCodebook(centroidArrays(centroidsOf(assigned)))
    }
    cb
  }

  /** E-step in the LARGE-codebook regime (the `nearestCell` Scaladoc
   * caveat as code): broadcast the codebook relation and take the keyed
   * min — same exact-integer distances, same smaller-cell tie-break, one
   * extra exchange at vec grain instead of a K-branch literal expression.
   * `centroids` is `centroidArrays` output. Returns (vec_id, cell). */
  def assignCellsJoin(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs
      .select(col("vec_id"), quantizeMicro(col("embedding")).as("__vq"))
      .crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("cell"),
        aggregate(zip_with(col("__vq"), col("cq"), (a, b) => (a - b) * (a - b)),
          lit(0L), _ + _).as("__d"))
      .groupBy("vec_id")
      .agg(min(struct(col("__d"), col("cell"))).as("__m"))
      .select(col("vec_id"), col("__m.cell").as("cell"))

  /** Lloyd E-step as a pure expression: nearest codebook centroid by exact
   * integer squared distance on the micro grid, ties to the smaller cell id.
   * The codebook is inlined as array literals, so assignment is a narrow
   * codegen'd map — NO shuffle, no join: the whole corpus re-assigns in one
   * pass. (At codebook sizes past a few thousand cells the literal fold
   * stops being codegen-friendly; that regime wants a broadcast join +
   * min_by instead — same semantics, one extra exchange on the small side.) */
  def nearestCell(emb: Column, cb: Array[(Int, Array[Long])]): Column =
    nearestCellStruct(emb, cb).getField("cell")

  /** As `nearestCell` but returning the full (d, cell) struct — `d` is the
   * exact integer squared distance on the micro grid (the per-vector
   * inertia contribution). */
  def nearestCellStruct(emb: Column, cb: Array[(Int, Array[Long])]): Column = {
    require(cb.nonEmpty, "empty codebook")
    val vq = quantizeMicro(emb)
    val scored = cb.map { case (cell, cq) =>
      struct(
        aggregate(zip_with(vq, lit(cq), (a, b) => (a - b) * (a - b)),
          lit(0L), _ + _).as("d"),
        lit(cell).as("cell"))
    }
    if (scored.length == 1) scored.head else least(scored: _*)
  }

  /** Post-training IVF diagnostics: per trained cell, member count and
   * exact integer inertia (Σ squared micro-grid distance to the assigned
   * centroid) after one Lloyd round. THE numbers an IVF deployment watches —
   * cell balance bounds worst-case probe cost (a dominant cell is a hot
   * partition), inertia tracks codebook fit across training rounds. One
   * narrow assignment pass + one tiny hash-agg; exact integers, so the
   * oracle replays it bit-for-bit. */
  def ivfStats(vecs: DataFrame, bits: Int = 4, dim: Int = 64,
      seed: String = "rp", rounds: Int = 1): DataFrame = {
    val cb = trainCodebook(vecs, bits, dim, seed, rounds)
    Dedup.spread(vecs)
      .select(nearestCellStruct(col("embedding"), cb).as("a"))
      .select(col("a.cell").as("cell"), col("a.d").as("dq"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), sum("dq").as("inertia_q"))
  }

  /** SSL-prototypes diversification pruning (Sorscher et al. 2022, "Beyond
   * neural scaling laws"; applied to LLM pre-training data as the second
   * half of D4, Tirumala et al. 2023): within each trained k-means cell,
   * drop the most PROTOTYPICAL vectors — those nearest their cell centroid,
   * the redundant "easy" mass — and keep the far tail that carries the
   * cluster's diversity. Returns the kept rows (vec_id, cell, dq).
   *
   * Threshold semantics, deterministic and rank-free: per cell,
   * `thr` = the smallest distance whose cumulative member count over the
   * cell's distance HISTOGRAM reaches ceil(dropFrac·n); rows with
   * dq <= thr drop, boundary ties dropping together (so at least
   * ceil(dropFrac·n) members drop — a whole cell, if every member sits at
   * one distance). Scale posture: the published per-cluster-rank form sorts
   * every member within its cluster — a hot cell is a hot sort partition.
   * Here members are never sorted: assignment is the narrow codegen'd
   * `nearestCellStruct` pass, the histogram is one hash-agg keyed
   * (cell, dq), and the running sum orders only DISTINCT distance rows per
   * cell (bounded by member count, in practice far smaller). Distances are
   * exact micro-grid integers, so the oracle replays every drop decision
   * bit-for-bit. */
  def protoPrune(vecs: DataFrame, dropFrac: Double, bits: Int = 4,
      dim: Int = 64, seed: String = "rp", rounds: Int = 1): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac < 1.0,
      s"dropFrac must be in [0, 1), got $dropFrac")
    val cb = trainCodebook(vecs, bits, dim, seed, rounds)
    // assignment fold spread to the parallelism floor: K·dim work per row
    // otherwise runs inside the scan's (possibly single) split
    val assigned = Dedup.spread(vecs)
      .select(col("vec_id"), nearestCellStruct(col("embedding"), cb).as("a"))
      .select(col("vec_id"), col("a.cell").as("cell"), col("a.d").as("dq"))
    if (dropFrac == 0.0) return assigned
    val hist = assigned.groupBy("cell", "dq").agg(count(lit(1)).as("c"))
    val thr = hist
      .withColumn("cum", sum("c").over(
        Window.partitionBy("cell").orderBy("dq")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum("c").over(Window.partitionBy("cell")))
      .filter(col("cum") >= ceil(lit(dropFrac) * col("n")))
      .groupBy("cell").agg(min("dq").as("thr"))
    assigned.join(thr, Seq("cell")).filter(col("dq") > col("thr"))
      .select("vec_id", "cell", "dq")
  }

  /** Trained-IVF kNN: one full Lloyd iteration in-engine — rp sign buckets
   * seed the assignment, `cellCentroids` trains the codebook, `nearestCell`
   * re-assigns corpus AND queries to their trained cell — then the same
   * cell-restricted top-k as `knnCell`. This is the n2 caveat fully closed:
   * cells are no longer read (n2) or merely hashed (n3) but TRAINED from
   * the corpus, the way a real IVF index is built. */
  def knnIvfTrained(queries: DataFrame, corpus: DataFrame, k: Int,
      bits: Int = 4, dim: Int = 64, seed: String = "rp",
      maxCell: Int = 10000, rounds: Int = 1): DataFrame = {
    val cb = trainCodebook(corpus, bits, dim, seed, rounds)
    knnCell(
      queries.withColumn("__tc", nearestCell(col("embedding"), cb)),
      corpus.withColumn("__tc", nearestCell(col("embedding"), cb)),
      "__tc", k, maxCell)
  }

  /** Recall@k of an approximate top-k against the exact one: per query, the
   * fraction of the exact neighbor set the approximate search recovered.
   * THE governing metric for any ANN deployment — cell pruning and probe
   * counts are tuned against this number, so the engine ships it as an
   * operator instead of leaving it to ad-hoc notebooks. Join on (q_id,
   * n_id) over two k-bounded relations: cost is O(|queries|·k), nothing
   * corpus-sized. */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val hits = exact.select("q_id", "n_id")
      .join(approx.select("q_id", "n_id"), Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
    exact.select("q_id").distinct()
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall", round(col("n_hits").cast("double") / k, 4))
  }

  /** Symmetric int8 quantization for embedding storage: per-vector scale =
   * max |x|, each element mapped to floor(x/scale·127 + 0.5) ∈ [-127, 127].
   * `floor(+0.5)` rather than `round()` deliberately: round-half
   * conventions differ across engines (half-up vs half-even vs
   * half-away), while floor is IEEE-identical everywhere — the oracle
   * replays the quantization bit-for-bit. All-zero vectors quantize to
   * zeros (scale 0 guarded). At 100 TB the embedding table is usually the
   * largest one; int8 + a scale column is the standard 4× storage/scan-IO
   * cut, and dequantization stays a narrow map. */
  def quantizeInt8(vecs: DataFrame): DataFrame =
    vecs
      .select(col("vec_id"), col("embedding"), int8Scale.as("scale"))
      .select(col("vec_id"), col("scale"), int8Codes.as("q"))

  /** The int8 quantization EXPRESSIONS, factored so [[quantizeInt8]] and
   * the cell-carrying SQ8 projection ([[sq8Codes]]) share one definition
   * — the e2 oracle replays these trees, and two copies would drift. */
  private def int8Scale: Column =
    array_max(transform(col("embedding"), v => abs(v.cast("double"))))
  private def int8Codes: Column =
    transform(col("embedding"), v =>
      when(col("scale") === 0, lit(0L))
        .otherwise(floor(v.cast("double") / col("scale") * lit(127.0) + lit(0.5)))
        .cast("int"))

  /** ONE-PASS SQ8 + rp-cell projection `(vec_id, cell, scale, q)` — cell
   * and codes are both pure per-row functions of the embedding, so they
   * come out of a single narrow scan (a vec_id self-join to attach the
   * cell would pay an extra corpus scan plus a shuffle — r7 review). */
  private[ext] def sq8Codes(vecs: DataFrame,
      planes: Array[Array[Double]]): DataFrame =
    vecs
      .select(col("vec_id"), col("embedding"),
        rpCell(col("embedding"), planes).as("cell"), int8Scale.as("scale"))
      .select(col("vec_id"), col("cell"), col("scale"), int8Codes.as("q"))

  /** Exact SQ8 reconstruction self-error per vector, for the drift log
   * ([[AnnIndex.appendIvfSq8]]): Σ_dims |127·vμ_i − q_i·scaleμ| — the
   * absolute quantization error on the micro grid, scaled by 127 so the
   * whole statistic is a pure BIGINT (no division). SQ8 has no trained
   * codebook, so the drift axis here is DYNAMIC RANGE, not centroid
   * fit: per-dim resolution is scale/254, and a batch whose vectors
   * carry an outlier dimension inflates `scale` and coarsens every
   * other dimension's reconstruction — which this absolute error
   * surfaces exactly (error grows ∝ scale), where a scale-RELATIVE
   * error would be bounded by construction and blind to it. Emitted
   * under the shared drift column name so [[AnnIndex.driftLog]]'s
   * schema covers all three index families. */
  private[ext] def sq8SelfError(vecs: DataFrame): DataFrame =
    vecs
      .select(col("vec_id"), col("embedding"), int8Scale.as("scale"))
      .select(col("vec_id"), quantizeMicro(col("embedding")).as("vmu"),
        floor(col("scale") * lit(1e6) + lit(0.5)).cast("long").as("smu"),
        int8Codes.as("q"))
      .select(col("vec_id"),
        aggregate(
          zip_with(col("vmu"), col("q"),
            (vm, qi) => abs(vm * lit(127L) - qi.cast("long") * col("smu"))),
          lit(0L), _ + _).as("adc_err"))

  /** Deterministic within-cell truncation to `maxCell` members, ordered by
   * a hash of the id (a pseudo-random but replayable sample). Mirrors
   * `Dedup.lshCandidates`'s bucket cap: one degenerate cell (a dominant
   * label) otherwise makes every within-cell join O(B²)/unbounded. Unlike
   * LSH buckets (where over-cap buckets are droppable — their docs share
   * tighter buckets), a cell here is the ONLY route to its members, so we
   * sample it down instead of dropping it: bounded cost, graceful recall
   * degradation. `maxCell = Int.MaxValue` disables.
   *
   * Implementation is a bounded-heap k-sample per cell (TypedTopK over the
   * hash order), NOT `row_number() over (partition by cell)`: the window
   * form shuffles and SORTS every cell member before the cap cut — on a
   * dominant cell at 100× that is a multi-million-row sort to keep 10k
   * (round-4 verdict #4, the last window sort on a corpus-sized relation).
   * The aggregate keeps a maxCell-bounded heap per cell per partition
   * map-side, so only capped ids cross the wire; the kept-id relation
   * (≤ cells × maxCell rows) then semi-joins back to recover the full
   * member rows. Order contract preserved: the heap keeps the k smallest
   * (hash, id) — the hash's TOP 53 bits exactly representable in the
   * aggregate's double ord (sign-flipped: TypedTopK keeps largest), ties
   * broken by smaller id, which is the window form's (hash ASC, id ASC)
   * front up to hashes colliding in their top 53 bits (odds ~B²/2^54 per
   * cell — and a collision only matters when the cap binds exactly
   * between the two collided rows). */
  private def capCell(vecs: DataFrame, idCol: String, maxCell: Int): DataFrame =
    if (maxCell == Int.MaxValue) vecs
    else {
      graft.functions.GraftFunctions.register(vecs.sparkSession)
      val keep = vecs
        .groupBy(col("cell"))
        .agg(graft.functions.GraftFunctions.topK(
          -shiftright(xxhash64(col(idCol)), 11).cast("double"),
          col(idCol).cast("long"), maxCell).as("top"))
        .select(col("cell"), explode(col("top")).as("t"))
        .select(col("cell"), col("t.id").as(idCol))
      vecs.join(keep, Seq("cell", idCol), "left_semi")
    }

  /** IVF-style search: same scoring, but candidates restricted to the
   * query's cell (`cellCol`), pruning the scan by the cell partitioning.
   * Corpus cells are capped at `maxCell` candidates (see capCell). */
  def knnCell(queries: DataFrame, corpus: DataFrame, cellCol: String, k: Int,
      maxCell: Int = 10000): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      col(cellCol).as("cell"),
      sqrt(dot(col("embedding"), col("embedding"))).as("q_norm"))
    val c = capCell(
      Dedup.spread(corpus)
        .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
          col(cellCol).as("cell"),
          sqrt(dot(col("embedding"), col("embedding"))).as("n_norm")),
      "n_id", maxCell)
    val scored = q.join(c, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(dot(col("q_emb"), col("n_emb")) / (col("q_norm") * col("n_norm")), 4).as("sim"))
    topKBySim(scored, k, "sim")
  }

  /** kNN over PRE-QUANTIZED int8 vectors (`(vec_id, q)` — e2's stored
   * representation): the corpus scan reads 1-byte codes instead of 4-byte
   * floats, and the per-vector scales CANCEL in cosine
   * (cos ≈ intdot / √(intnorm·intnorm)), so no dequantization happens
   * anywhere — consuming the stored quantized table directly is what
   * makes the 4× IO cut real at query time. All dot products and norms
   * are exact integers; the one sqrt+divide per pair is
   * IEEE-deterministic, so the ranking replays bit-for-bit in the oracle.
   * Zero vectors (norm 0) have no cosine direction and are EXCLUDED from
   * both sides — without the guard their 0/0 similarity is NaN, which
   * Spark's descending sort ranks above every real neighbor. Same
   * documented bounded-query-set posture as [[knnBrute]]. */
  def knnInt8Quantized(queries: DataFrame, corpus: DataFrame,
      k: Int): DataFrame = {
    val q = int8Prep(queries, "q_id", "qq", "qn", Nil)
    val c = int8Prep(Dedup.spread(corpus), "n_id", "cq", "cn", Nil)
    topKBySim(
      broadcast(q).crossJoin(c).filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"), int8Sim.as("sim8")),
      k, "sim8")
  }

  /** Shared int8 norm-prep and scales-cancel cosine EXPRESSIONS — one
   * definition for the flat ([[knnInt8Quantized]]) and cell-pruned
   * ([[ivfSq8Search]]) paths, so a scoring fix can never drift between
   * them (r7 review). */
  private def int8Prep(df: DataFrame, idAs: String, qAs: String,
      nAs: String, carry: Seq[String]): DataFrame =
    df.select(col("vec_id").as(idAs) +: col("q").as(qAs) +:
        aggregate(col("q"), lit(0L), (a, v) => a + (v * v).cast("long"))
          .as(nAs) +: carry.map(col): _*)
      .filter(col(nAs) > 0)

  private def int8Sim: Column =
    round(
      aggregate(zip_with(col("qq"), col("cq"),
        (a, b) => (a * b).cast("long")), lit(0L), _ + _).cast("double")
        / (sqrt(col("qn")) * sqrt(col("cn"))), 4)

  /** Convenience form over raw float embeddings: quantizes both sides
   * inline, then searches the codes. For the actual IO win, store
   * [[quantizeInt8]]'s output and call [[knnInt8Quantized]]. */
  def knnInt8(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    knnInt8Quantized(quantizeInt8(queries), quantizeInt8(corpus), k)

  /** IVF + SQ8: rp-cell candidate pruning over int8 codes — n13's
   * scales-cancel scoring restricted to the query's cell (the FAISS
   * `IVF,SQ8` composition: coarse quantizer for pruning, scalar
   * quantizer for the 4× at-rest representation; vs PQ, SQ8 keeps
   * per-DIMENSION resolution so its distances are far closer to exact —
   * the usual pick when memory allows a byte per dimension).
   * Candidates prune to the cell, dots/norms stay exact integers, the
   * one sqrt+divide per pair is IEEE-deterministic. The index round-trip
   * is [[AnnIndex.buildIvfSq8]]/[[AnnIndex.searchIvfSq8]]. */
  def knnIvfSq8(queries: DataFrame, corpus: DataFrame, k: Int,
      bits: Int = 4, dim: Int = 64, seed: String = "rp"): DataFrame = {
    val planes = rpPlanes(dim, bits, seed)
    ivfSq8Search(sq8Codes(queries, planes), sq8Codes(corpus, planes), k)
  }

  /** The shared IVF-SQ8 scoring body over `(vec_id, q, cell)`-shaped
   * sides — [[knnIvfSq8]] (fused) and [[AnnIndex.searchIvfSq8]] (stored
   * codes) both land here, so the round trip is bit-identical by
   * construction. Prep and cosine are the SAME expressions as the flat
   * int8 path ([[int8Prep]]/[[int8Sim]]); only the join key differs.
   * Zero vectors excluded as in [[knnInt8Quantized]]. */
  private[ext] def ivfSq8Search(queries: DataFrame, corpus: DataFrame,
      k: Int): DataFrame = {
    val q = int8Prep(queries, "q_id", "qq", "qn", Seq("cell"))
    val c = int8Prep(Dedup.spread(corpus), "n_id", "cq", "cn", Seq("cell"))
    topKBySim(
      q.join(c, Seq("cell"))
        .filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"), int8Sim.as("sim8")),
      k, "sim8")
  }

  // ---- product quantization (PQ) ----

  /** Subvector `m` of an embedding: elements [m·subDim, (m+1)·subDim). */
  def subvec(emb: Column, m: Int, subDim: Int): Column =
    slice(emb, m * subDim + 1, subDim)

  /** Per-subspace PQ codebooks: the embedding splits into `m` contiguous
   * subvectors of `subDim` dims; each subspace trains its own small
   * codebook with the SAME rp-seeded M-step as the IVF path (`codebook`,
   * seeded `"$seed$i"` per subspace) on the micro grid. Driver state is
   * m · 2^bits · subDim longs — model parameters, a few KB; the training
   * passes stay fully distributed (one narrow projection + one tiny
   * hash-agg per subspace). */
  def pqCodebooks(vecs: DataFrame, m: Int = 4, subDim: Int = 16,
      bits: Int = 2, seed: String = "pq"): Array[Array[(Int, Array[Long])]] =
    Array.tabulate(m) { i =>
      codebook(
        vecs.select(col("vec_id"),
          subvec(col("embedding"), i, subDim).as("embedding")),
        bits, subDim, s"$seed$i")
    }

  /** PQ encoding: each vector compresses to `m` small code columns
   * `c0..c{m-1}` — the id of the nearest subspace centroid by EXACT
   * integer squared micro-grid distance (ties to the smaller id, both
   * engines). A pure narrow codegen'd pass, no shuffle; at 100 TB this is
   * the (dim·4 bytes → m codes) rewrite that makes the ANN corpus
   * memory-resident. */
  def pqEncode(vecs: DataFrame,
      cbs: Array[Array[(Int, Array[Long])]], subDim: Int): DataFrame =
    vecs.select(
      col("vec_id") +:
        cbs.indices.map(i =>
          nearestCell(subvec(col("embedding"), i, subDim), cbs(i))
            .as(s"c$i")): _*)

  /** Per-vector ADC reconstruction error: the exact integer micro-grid
   * distance between a vector and its own PQ codes' centroids — the
   * quantization error the codes carry into every ADC search. ONE narrow
   * codegen'd pass (encode + distance over the same scan, no join). This
   * is the drift signal for no-retrain index maintenance
   * ([[AnnIndex.appendIvfPq]]): rows appended under frozen codebooks that
   * no longer fit the data show a rising mean error, and the per-batch
   * log of this statistic is what tells an operator the index needs a
   * rebuild (round-6 verdict #2). Exact integers end-to-end, so the
   * oracle replays it bit-for-bit. */
  def adcSelfError(vecs: DataFrame, cbs: Array[Array[(Int, Array[Long])]],
      subDim: Int): DataFrame =
    vecs.select(
        col("vec_id") +: col("embedding") +:
          cbs.indices.map(i =>
            nearestCell(subvec(col("embedding"), i, subDim), cbs(i))
              .as(s"c$i")): _*)
      .select(col("vec_id"), adcDist(col("embedding"), cbs, subDim).as("adc_err"))

  /** ADC distance expression: Σ_m d²(query subvector m, codebook_m[c_m]) —
   * the codebook inlined as literals (a when-chain per subspace selected
   * by the corpus row's code column `c{i}`), exact integer on the micro
   * grid. Shared by the flat ADC search and the IVF-PQ composition. */
  def adcDist(qEmb: Column, cbs: Array[Array[(Int, Array[Long])]],
      subDim: Int): Column =
    cbs.indices.map { i =>
      val qq = quantizeMicro(subvec(qEmb, i, subDim))
      val cases = cbs(i).map { case (cell, cq) =>
        when(col(s"c$i") === cell,
          aggregate(zip_with(qq, lit(cq), (a, b) => (a - b) * (a - b)),
            lit(0L), _ + _))
      }
      coalesce(cases: _*)
    }.reduce(_ + _)

  // ──────────── ADC distance tables (per-QUERY, not per-pair) ─────────

  /** Per-query ADC distance-table columns — the PQ paper's precomputed-
   * table trick (Jégou et al., §ADC): for each subspace i and codebook
   * cell c, the exact integer distance d²(q_i, codebook_i[c]) as column
   * `__dt_{i}_{c}`, projected ONCE PER QUERY ROW before the candidate
   * join. [[adcDist]] evaluates the same subDim-element fold per
   * CANDIDATE PAIR — ~|cells|× redundant once a query meets more than a
   * handful of candidates (the n23 probe meets ~|cell| ≈ corpus/2^bits
   * of them). `qSub(i)` supplies subspace i of the query on the exact
   * micro grid, so the zip/fold arithmetic — and therefore every
   * distance — is bit-identical to [[adcDist]]; only the evaluation
   * point moves from pair grain to query grain. */
  private def adcTableCols(qSub: Int => Column,
      cbs: Array[Array[(Int, Array[Long])]]): Seq[Column] =
    for { i <- cbs.indices; (cell, cq) <- cbs(i) } yield
      aggregate(zip_with(qSub(i), lit(cq), (a, b) => (a - b) * (a - b)),
        lit(0L), _ + _).as(s"__dt_${i}_$cell")

  /** The per-pair side of the table trick: Σ_i a scalar when-chain
   * selecting `__dt_{i}_{c_i}` by the candidate's code column — pure
   * codegen'd comparisons, no array touched per pair. */
  private def adcTableLookup(
      cbs: Array[Array[(Int, Array[Long])]]): Column =
    cbs.indices.map { i =>
      coalesce(cbs(i).map { case (cell, _) =>
        when(col(s"c$i") === cell, col(s"__dt_${i}_$cell")) }: _*)
    }.reduce(_ + _)

  /** Bounded-heap top-k cut over (q_id, n_id, <simCol>) — LARGEST
   * similarity first, ties to the smaller neighbor id. Replaces the
   * `row_number() over (partition by q_id order by sim desc)` cut: the
   * window form shuffles and sorts EVERY scored candidate pair before
   * discarding all but k, while the TypedTopK aggregate keeps a k-bounded
   * heap per query per partition, so only k rows/query/partition cross the
   * wire — the cut that survives a 100× corpus (round-3 verdict #3). Same
   * (sim DESC, n_id ASC) order, same rounded-double sim values, so the
   * oracle hash is unchanged. NULL similarities are dropped by the
   * aggregate (a null dot product means malformed input, e.g. mismatched
   * embedding lengths) — a query whose candidates ALL score null emits no
   * rows. Registers the native functions defensively so externally-built
   * sessions work. */
  private def topKBySim(scored: DataFrame, k: Int, simCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(scored.sparkSession)
    scored
      .groupBy("q_id")
      .agg(graft.functions.GraftFunctions.topK(
        col(simCol).cast("double"), col("n_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.id").as("n_id"),
        col("col.ord").as(simCol),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Bounded-heap top-k cut over (q_id, n_id, dist_q) — smallest distance
   * first, ties to the smaller neighbor id. Registration as in
   * [[topKBySim]]. */
  private def topKByDist(scored: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(scored.sparkSession)
    scored
      .groupBy("q_id")
      .agg(graft.functions.GraftFunctions.topK(
        -col("dist_q").cast("double"), col("n_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.id").as("n_id"),
        (-col("col.ord")).cast("long").as("dist_q"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Asymmetric-distance (ADC) kNN over PQ codes: the query stays exact
   * (micro grid); each corpus vector contributes only its codes, so
   * scoring reads m SMALL INTS per corpus row instead of the full vector
   * (the PQ scan-IO win), stays narrow/codegen'd, and every distance is an
   * exact integer (bit-identical replay in the oracle). Top-k per query
   * via the bounded-heap TypedTopK on -dist (ties → smaller neighbor id),
   * so the shuffle carries k rows per query per partition — never the
   * scored corpus. Queries must be registered for `topK`
   * (GraftFunctions.register). */
  def knnPqAdc(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 4, subDim: Int = 16, bits: Int = 2,
      seed: String = "pq"): DataFrame = {
    val cbs = pqCodebooks(corpus, m, subDim, bits, seed)
    adcSearchEncoded(queries, pqEncode(Dedup.spread(corpus), cbs, subDim),
      cbs, subDim, k)
  }

  /** The ADC search body over an ALREADY-ENCODED corpus (`(vec_id,
   * c0..c{m-1})`) — shared by the fused [[knnPqAdc]] and the prebuilt-index
   * path ([[AnnIndex.searchPqAdc]]), so build-once/search-many returns
   * bit-identical results to train-at-query-time. */
  private[ext] def adcSearchEncoded(queries: DataFrame, enc: DataFrame,
      cbs: Array[Array[(Int, Array[Long])]], subDim: Int, k: Int): DataFrame = {
    val q = queries.select(
      col("vec_id").as("q_id") +:
        adcTableCols(i => quantizeMicro(subvec(col("embedding"), i,
          subDim)), cbs): _*)
    topKByDist(
      broadcast(q).crossJoin(enc)
        .filter(col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          adcTableLookup(cbs).as("dist_q")),
      k)
  }

  /** IVF-PQ: the canonical production vector-index shape — candidates
   * restrict to the query's rp cell (the IVF part: the scan prunes to
   * ~1/2^bits of the corpus) and scoring reads ONLY the PQ codes (the PQ
   * part: m small ints per candidate, codebook inlined). Both halves are
   * the already-oracle-verified n3 and n11 paths composed; exact integer
   * distances keep the ranking engine-independent. */
  def knnIvfPq(queries: DataFrame, corpus: DataFrame, k: Int,
      bits: Int = 4, dim: Int = 64, seed: String = "rp",
      m: Int = 4, subDim: Int = 16, pqBits: Int = 2,
      pqSeed: String = "pq"): DataFrame = {
    val planes = rpPlanes(dim, bits, seed)
    val cbs = pqCodebooks(corpus, m, subDim, pqBits, pqSeed)
    ivfPqSearchEncoded(queries,
      encodeIvfPq(Dedup.spread(corpus), planes, cbs, subDim),
      planes, cbs, subDim, k)
  }

  /** Filtered ANN — the metadata-predicate + vector search every vector
   * store advertises, in its PRE-FILTER form: the `allowed` id relation
   * (the result of an arbitrary metadata predicate, one `vec_id` column)
   * restricts candidates BEFORE the top-k cut, so each query still
   * receives k eligible neighbors whenever its probed cell holds that
   * many — the post-filter alternative (cut, then filter) silently
   * returns fewer than k. The codebooks still train on the FULL corpus:
   * the filter is a query-time predicate, not a different index.
   *
   * Scale shape: one semi-join of the cell-pruned candidate lists against
   * the predicate relation — broadcast under AQE when the predicate is
   * selective, shuffle otherwise; everything downstream is byte-identical
   * to [[knnIvfPq]]. The index round-trip is
   * [[AnnIndex.searchIvfPqFiltered]]. */
  def knnIvfPqFiltered(queries: DataFrame, corpus: DataFrame,
      allowed: DataFrame, k: Int,
      bits: Int = 4, dim: Int = 64, seed: String = "rp",
      m: Int = 4, subDim: Int = 16, pqBits: Int = 2,
      pqSeed: String = "pq"): DataFrame = {
    val planes = rpPlanes(dim, bits, seed)
    val cbs = pqCodebooks(corpus, m, subDim, pqBits, pqSeed)
    ivfPqSearchEncoded(queries,
      encodeIvfPq(Dedup.spread(corpus), planes, cbs, subDim)
        .join(allowed.select("vec_id").distinct(), Seq("vec_id"), "left_semi"),
      planes, cbs, subDim, k)
  }

  /** The IVF-PQ at-rest projection — codes + rp cell in ONE narrow pass:
   * encoding and cell assignment are both per-row expressions over the
   * same scan; a vec_id self-join of two projections would shuffle the
   * whole corpus for nothing. Shared by the fused paths, the index build
   * ([[AnnIndex.buildIvfPq]]), and incremental maintenance
   * ([[AnnIndex.appendIvfPq]]), so appended rows encode EXACTLY as
   * built rows do. */
  private[ext] def encodeIvfPq(corpus: DataFrame,
      planes: Array[Array[Double]], cbs: Array[Array[(Int, Array[Long])]],
      subDim: Int): DataFrame =
    corpus.select(
      col("vec_id") +:
        cbs.indices.map(i =>
          nearestCell(subvec(col("embedding"), i, subDim), cbs(i))
            .as(s"c$i")) :+
        rpCell(col("embedding"), planes).as("cell"): _*)

  /** The IVF-PQ search body over an already cell-assigned, code-encoded
   * corpus (`(vec_id, c0.., cell)`) — shared by the fused [[knnIvfPq]] and
   * [[AnnIndex.searchIvfPq]]. */
  private[ext] def ivfPqSearchEncoded(queries: DataFrame, enc: DataFrame,
      planes: Array[Array[Double]], cbs: Array[Array[(Int, Array[Long])]],
      subDim: Int, k: Int): DataFrame =
    ivfPqSearchAssigned(
      queries.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"),
        rpCell(col("embedding"), planes).as("cell")),
      enc, cbs, subDim, k)

  /** As [[ivfPqSearchEncoded]] but over queries that ALREADY carry their
   * probe cell(s) (`(q_id, q_emb, cell)`, possibly several rows per query
   * under multi-probe — corpus vectors hold exactly one cell, so probe
   * candidate sets are disjoint and the top-k cut needs no dedup). */
  private[ext] def ivfPqSearchAssigned(q: DataFrame, enc: DataFrame,
      cbs: Array[Array[(Int, Array[Long])]], subDim: Int, k: Int): DataFrame =
    topKByDist(
      q.select(
          col("q_id") +: col("cell") +:
            adcTableCols(i => quantizeMicro(subvec(col("q_emb"), i,
              subDim)), cbs): _*)
        .join(enc, "cell")
        .filter(col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          adcTableLookup(cbs).as("dist_q")),
      k)

  /** Multi-probe IVF-PQ: the [[knnRpMultiProbe]] recall repair applied to
   * the production IVF-PQ composition — each query scores its own rp cell
   * plus the `bits` Hamming-1 flips, still over PQ codes only. Bounded
   * (bits+1)× candidate cost, and the index round-trip
   * ([[AnnIndex.searchIvfPqMultiProbe]]) returns bit-identical rows. */
  def knnIvfPqMultiProbe(queries: DataFrame, corpus: DataFrame, k: Int,
      bits: Int = 4, dim: Int = 64, seed: String = "rp",
      m: Int = 4, subDim: Int = 16, pqBits: Int = 2,
      pqSeed: String = "pq"): DataFrame = {
    val planes = rpPlanes(dim, bits, seed)
    val cbs = pqCodebooks(corpus, m, subDim, pqBits, pqSeed)
    ivfPqSearchAssigned(
      multiProbeCells(queries, planes, "cell")
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("cell")),
      encodeIvfPq(Dedup.spread(corpus), planes, cbs, subDim),
      cbs, subDim, k)
  }

  /** IVF-PQ search with exact re-ranking — the IVFADC+R composition
   * (Jégou/Douze/Schmid's PQ paper, §re-ranking): the ADC pass
   * retrieves `rerank` candidates per query on CODES only (narrow scan,
   * integer distances), then exactly those k·rerank rows — never the
   * corpus — fetch their raw vectors for an exact cosine re-score. Repairs
   * the PQ quantization error in the final ranking at a bounded extra
   * cost: the raw-vector join touches |queries|·rerank rows, so the wide
   * embedding column is read only behind the candidate semi-join. Output
   * matches [[knnBrute]]'s shape (`sim` rounded to the same 4-decimal
   * grid), making recall directly comparable via [[recallAtK]]. */
  def knnIvfPqRerank(queries: DataFrame, corpus: DataFrame, k: Int,
      rerank: Int = 10, bits: Int = 4, dim: Int = 64, seed: String = "rp",
      m: Int = 4, subDim: Int = 16, pqBits: Int = 2,
      pqSeed: String = "pq"): DataFrame =
    rerankExact(
      knnIvfPq(queries, corpus, rerank, bits, dim, seed, m, subDim, pqBits,
        pqSeed),
      queries, corpus, k)

  /** Semantic (embedding-space) decontamination — the eval-set leak scan
   * in EMBEDDING space: a corpus vector within `minCos` cosine of ANY
   * eval-set vector is contaminated (paraphrased or re-formatted eval
   * leakage that the n-gram scans of `Dedup.decontaminationHits` cannot
   * see — the semantic-dedup idea pointed across corpora, the
   * decontamination stage of recent embedding-curated datasets). Blocked
   * on `cellCol` like [[cosineDedupPairs]] (both sides must share a cell
   * to compare — documented recall trade of every blocked scan; use
   * trained cells or multi-probe assignment upstream to tighten it).
   *
   * Cost shape at 100 TB: the eval side is MBs (eval suites), so AQE
   * broadcasts it and the corpus never shuffles; the per-corpus-row work
   * is |eval ∩ cell| fused cosines inside codegen. Returns
   * (vec_id, n_hits, max_sim) per CONTAMINATED corpus vector — feed an
   * anti-join to apply, mirroring decontaminationHits/decontaminate. */
  def embedDecontaminationHits(corpus: DataFrame, eval: DataFrame,
      minCos: Double, cellCol: String): DataFrame =
    corpus.select(col(cellCol).as("cell"), col("vec_id"),
        col("embedding").as("c_emb"))
      .join(eval.select(col(cellCol).as("cell"),
        col("embedding").as("e_emb")), Seq("cell"))
      .select(col("vec_id"), round(cosine(col("c_emb"), col("e_emb")), 4).as("sim"))
      .filter(col("sim") >= minCos)
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_hits"), max("sim").as("max_sim"))

  /** Apply semantic decontamination: corpus rows hitting NO eval vector at
   * `minCos`. An eval vector present in the corpus trivially self-matches
   * at cosine 1 and is (correctly) dropped. */
  def embedDecontaminate(corpus: DataFrame, eval: DataFrame,
      minCos: Double, cellCol: String): DataFrame =
    corpus.join(
      embedDecontaminationHits(corpus, eval, minCos, cellCol)
        .select("vec_id"),
      Seq("vec_id"), "left_anti")

  /** Multi-probe IVFADC+R — the production read path in FULL: the
   * multi-probe ADC pass ([[knnIvfPqMultiProbe]]) retrieves `rerank`
   * candidates per query from the (bits+1) probed lists (recall repair at
   * the CANDIDATE stage — a dropped true neighbor cannot be re-ranked
   * back), then exactly those candidates fetch raw vectors for the exact
   * cosine re-score (quantization-error repair at the RANKING stage).
   * The two repairs are orthogonal and both bounded: (bits+1)× candidate
   * cost, |queries|·rerank re-score rows. Index round-trip:
   * [[AnnIndex.searchIvfPqMultiProbeRerank]] returns bit-identical rows. */
  def knnIvfPqMultiProbeRerank(queries: DataFrame, corpus: DataFrame,
      k: Int, rerank: Int = 10, bits: Int = 4, dim: Int = 64,
      seed: String = "rp", m: Int = 4, subDim: Int = 16, pqBits: Int = 2,
      pqSeed: String = "pq"): DataFrame =
    rerankExact(
      knnIvfPqMultiProbe(queries, corpus, rerank, bits, dim, seed, m,
        subDim, pqBits, pqSeed),
      queries, corpus, k)

  /** Exact cosine re-score of an ANN candidate list: join the (q_id, n_id)
   * candidates back to raw vectors on BOTH sides, score, and cut to k by
   * the bounded heap. The candidate relation is |queries|·rerank rows —
   * AQE broadcasts it against the corpus scan, so the corpus is read once,
   * filtered by the broadcast join, and no corpus-sized shuffle exists on
   * the re-rank path. Shared by the fused [[knnIvfPqRerank]] and the
   * prebuilt-index [[AnnIndex.searchIvfPqRerank]] (bit-identical rows). */
  private[ext] def rerankExact(cands: DataFrame, queries: DataFrame,
      corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"),
      sqrt(dot(col("embedding"), col("embedding"))).as("q_norm"))
    val c = corpus.select(col("vec_id").as("n_id"),
      col("embedding").as("n_emb"),
      sqrt(dot(col("embedding"), col("embedding"))).as("n_norm"))
    topKBySim(
      cands.select("q_id", "n_id")
        .join(c, "n_id")
        .join(q, "q_id")
        .select(col("q_id"), col("n_id"),
          round(dot(col("q_emb"), col("n_emb")) /
            (col("q_norm") * col("n_norm")), 4).as("sim")),
      k, "sim")
  }

  // ---- residual PQ: IVFADC in its published form ----

  /** Integer-MILLIS rp plane weights (the [[rpPlanes]] derivation without
   * the /1000 — same md5 seeds, same signs). Residual vectors live on the
   * exact integer micro grid, so dotting them with INTEGER plane weights
   * keeps the whole projection an exact BIGINT: the sign — and therefore
   * the training-cell assignment — cannot be perturbed by summation order
   * in ANY engine. (The float [[rpCell]] needs double dots because raw
   * embeddings are floats; residuals don't.) */
  def rpPlanesMillis(dim: Int, bits: Int, seed: String): Array[Array[Long]] =
    Array.tabulate(bits) { p =>
      Array.tabulate(dim) { d => md5u32(s"rp:$seed:$p:$d") % 2001 - 1000 }
    }

  /** Exact integer dot of a micro-grid vector with integer plane weights. */
  private def dotQ(vq: Column, w: Array[Long]): Column =
    aggregate(zip_with(vq, lit(w), (a, b) => a * b), lit(0L), _ + _)

  /** Sign-bucket cell of a micro-grid (integer) vector — [[rpCell]] for
   * residuals, with exact-integer projections throughout. */
  def rpCellQ(vq: Column, planes: Array[Array[Long]]): Column =
    planes.zipWithIndex.map { case (w, p) =>
      when(dotQ(vq, w) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Residual of an embedding vs its assigned coarse centroid, on the
   * micro grid: `quantizeMicro(emb) − coarse[cell]` — an exact BIGINT
   * vector (both operands are micro-grid integers; no float subtraction
   * anywhere). The codebook inlines as a when-chain keyed by the row's
   * cell column, so the derivation stays a narrow codegen'd map. */
  private[ext] def residualQ(emb: Column, cellCol: Column,
      coarse: Array[(Int, Array[Long])]): Column = {
    val vq = quantizeMicro(emb)
    coalesce(coarse.map { case (cell, cq) =>
      when(cellCol === cell, zip_with(vq, lit(cq), (a, b) => a - b))
    }: _*)
  }

  /** Nearest centroid for an ALREADY-integer (micro-grid) subvector —
   * [[nearestCellStruct]] minus the quantization step. Exact integer
   * squared distances, ties to the smaller cell id. */
  def nearestCellQ(sq: Column, cb: Array[(Int, Array[Long])]): Column = {
    require(cb.nonEmpty, "empty codebook")
    val scored = cb.map { case (cell, cq) =>
      struct(
        aggregate(zip_with(sq, lit(cq), (a, b) => (a - b) * (a - b)),
          lit(0L), _ + _).as("d"),
        lit(cell).as("cell"))
    }
    (if (scored.length == 1) scored.head else least(scored: _*))
      .getField("cell")
  }

  /** Per-subspace PQ codebooks over RESIDUAL vectors (`(vec_id, rq)` with
   * `rq` exact micro-grid integers): integer-plane sign buckets seed the
   * assignment, the M-step sums the already-integer values (no
   * re-quantization) and snaps means to the grid. Same driver-state
   * posture as [[pqCodebooks]] — a few KB of model parameters. */
  def pqCodebooksResidual(residuals: DataFrame, m: Int = 4,
      subDim: Int = 16, bits: Int = 2,
      seed: String = "pqr"): Array[Array[(Int, Array[Long])]] =
    Array.tabulate(m) { i =>
      val sub = slice(col("rq"), i * subDim + 1, subDim)
      val planes = rpPlanesMillis(subDim, bits, s"$seed$i")
      fetchCodebook(centroidArrays(
        residuals.select(rpCellQ(sub, planes).as("cell"), sub.as("sq"))
          .select(col("cell"), posexplode(col("sq")).as(Seq("pos", "vq")))
          .groupBy("cell", "pos")
          .agg(count(lit(1)).as("n"), sum("vq").as("s"))))
    }

  /** Residual ADC distance: Σ_m d²(query-residual subvector m,
   * residual-codebook_m[c_m]) — [[adcDist]] with the query side already an
   * exact integer residual (no quantization at score time). */
  def adcDistResidual(qr: Column, cbs: Array[Array[(Int, Array[Long])]],
      subDim: Int): Column =
    cbs.indices.map { i =>
      val qs = slice(qr, i * subDim + 1, subDim)
      val cases = cbs(i).map { case (cell, cq) =>
        when(col(s"c$i") === cell,
          aggregate(zip_with(qs, lit(cq), (a, b) => (a - b) * (a - b)),
            lit(0L), _ + _))
      }
      coalesce(cases: _*)
    }.reduce(_ + _)

  /** IVFADC in its PUBLISHED form (Jégou, Douze, Schmid, PAMI 2011, §IVFADC):
   * PQ codes encode the RESIDUAL `x − c(cell)` of each vector against its
   * trained coarse centroid, not the raw vector — residual energy is far
   * below vector energy, so the same code budget quantizes much finer (the
   * reason FAISS' IVFPQ defaults to residual encoding). [[knnIvfPq]] is
   * kept as the cheaper no-residual variant (one fewer training pass, rp
   * cells need no centroids); this is the full composition:
   *
   *  1. coarse quantizer = the n7 trained codebook (rp-seeded Lloyd round,
   *     exact-integer E-step);
   *  2. residuals on the exact micro grid (integer subtraction);
   *  3. per-subspace residual codebooks ([[pqCodebooksResidual]]);
   *  4. search: the query assigns to its coarse cell, forms its OWN
   *     residual against that centroid, and ADC-scores candidates of the
   *     same cell on codes only ([[adcDistResidual]]).
   *
   * Everything stays exact integers end-to-end — training assignments,
   * encodings, and search distances all replay bit-for-bit in the oracle.
   *
   * Scale shape: one corpus pass assigns + derives residuals
   * (materialized — the relation feeds PQ training AND encoding, the same
   * two consumers FAISS makes two passes for); training aggregates are
   * cells×subDim-sized; the search joins on the coarse cell so candidates
   * prune to ~1/2^bits of the corpus, scored on m small ints per row;
   * bounded-heap top-k. At 100 TB you'd train the codebooks on a hash
   * sample ([[graft.ext.Sampling.hashSample]]) and encode the full corpus —
   * the dataflow is unchanged. */
  def knnIvfAdcResidual(queries: DataFrame, corpus: DataFrame, k: Int,
      bits: Int = 4, dim: Int = 64, seed: String = "rp",
      m: Int = 4, subDim: Int = 16, pqBits: Int = 2,
      pqSeed: String = "pqr", nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val coarse = codebook(corpus, bits, dim, seed)
    val residuals = Dedup.materialize(
      corpus.select(col("vec_id"), col("embedding"),
        nearestCell(col("embedding"), coarse).as("cell"))
        .select(col("vec_id"), col("cell"),
          residualQ(col("embedding"), col("cell"), coarse).as("rq")))
    val cbs = pqCodebooksResidual(residuals, m, subDim, pqBits, pqSeed)
    ivfAdcResidualSearch(queries,
      encodeResidual(residuals, cbs, subDim), coarse, cbs, subDim, k, nprobe)
  }

  /** Residual IVFADC with exact re-ranking — the +R stage on the RESIDUAL
   * family ([[knnIvfPqRerank]]'s composition over [[knnIvfAdcResidual]]):
   * the residual-ADC pass retrieves `rerank` candidates per query on codes
   * only, then exactly those |queries|·rerank rows fetch raw vectors for
   * the exact cosine re-score via [[rerankExact]]. Unlike the raw-PQ
   * family, the residual index persists NO raw-vector copy — the re-rank
   * joins back to the SOURCE corpus relation, which is the posture you
   * want at 100 TB: the index stays codes-only (~40× smaller at rest) and
   * the wide embedding column is read once, behind the broadcast
   * candidate semi-join, from the table that already exists. Output
   * matches [[knnBrute]]'s shape for [[recallAtK]]. */
  def knnIvfAdcResidualRerank(queries: DataFrame, corpus: DataFrame,
      k: Int, rerank: Int = 10, bits: Int = 4, dim: Int = 64,
      seed: String = "rp", m: Int = 4, subDim: Int = 16, pqBits: Int = 2,
      pqSeed: String = "pqr", nprobe: Int = 1): DataFrame =
    rerankExact(
      knnIvfAdcResidual(queries, corpus, rerank, bits, dim, seed, m,
        subDim, pqBits, pqSeed, nprobe),
      queries, corpus, k)

  /** Per-vector residual-ADC reconstruction error over a
   * `(vec_id, cell, rq)` relation: the exact integer distance between
   * each residual and its own residual-PQ codes' centroids —
   * [[adcSelfError]] for the residual family, and the drift signal
   * [[AnnIndex.appendIvfAdcResidual]] logs per batch (r7 verdict #4: the
   * append+drift lifecycle covered only IVF-PQ). One narrow codegen'd
   * pass; exact integers, so the statistic is partition-independent. */
  private[ext] def adcSelfErrorResidual(residuals: DataFrame,
      cbs: Array[Array[(Int, Array[Long])]], subDim: Int): DataFrame =
    residuals.select(
        col("vec_id") +: col("rq") +:
          cbs.indices.map(i =>
            nearestCellQ(slice(col("rq"), i * subDim + 1, subDim), cbs(i))
              .as(s"c$i")): _*)
      .select(col("vec_id"),
        adcDistResidual(col("rq"), cbs, subDim).as("adc_err"))

  /** Residual code assignment over a `(vec_id, cell, rq)` relation — one
   * narrow pass; shared by the fused path and [[AnnIndex
   * .buildIvfAdcResidual]] so built rows encode exactly as fused rows. */
  private[ext] def encodeResidual(residuals: DataFrame,
      cbs: Array[Array[(Int, Array[Long])]], subDim: Int): DataFrame =
    residuals.select(
      col("vec_id") +: col("cell") +:
        cbs.indices.map(i =>
          nearestCellQ(slice(col("rq"), i * subDim + 1, subDim), cbs(i))
            .as(s"c$i")): _*)

  /** The residual-IVFADC search body over an already-encoded corpus
   * (`(vec_id, cell, c0..)`): each query probes its `nprobe` nearest
   * coarse centroids (the FAISS `nprobe` knob — trained cells have no
   * Hamming structure, so the rp-cell flip heuristic doesn't apply) and
   * forms a PER-PROBE residual against the probed centroid, since ADC
   * distance is only defined relative to the cell the candidate is stored
   * under. Corpus rows hold exactly one cell, so probe candidate sets are
   * disjoint — no dedup before the top-k cut. Shared by the fused
   * [[knnIvfAdcResidual]] and [[AnnIndex.searchIvfAdcResidual]]. */
  private[ext] def ivfAdcResidualSearch(queries: DataFrame, enc: DataFrame,
      coarse: Array[(Int, Array[Long])],
      cbs: Array[Array[(Int, Array[Long])]], subDim: Int, k: Int,
      nprobe: Int): DataFrame = {
    val q = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("cell",
        explode(nearestCells(col("q_emb"), coarse, nprobe)))
      .withColumn("qr", residualQ(col("q_emb"), col("cell"), coarse))
    topKByDist(
      q.select(
          col("q_id") +: col("cell") +:
            adcTableCols(i => slice(col("qr"), i * subDim + 1, subDim),
              cbs): _*)
        .join(enc, "cell")
        .filter(col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          adcTableLookup(cbs).as("dist_q")),
      k)
  }

  /** The `nprobe` nearest coarse centroids of an embedding, closest first
   * — exact integer distances, (d, cell) struct sort so ties break to the
   * smaller cell id in any engine. A pure narrow expression (the codebook
   * inlines as literals), like [[nearestCell]] = the nprobe-1 case. */
  def nearestCells(emb: Column, cb: Array[(Int, Array[Long])],
      nprobe: Int): Column = {
    require(cb.nonEmpty, "empty codebook")
    val vq = quantizeMicro(emb)
    val scored = array(cb.map { case (cell, cq) =>
      struct(
        aggregate(zip_with(vq, lit(cq), (a, b) => (a - b) * (a - b)),
          lit(0L), _ + _).as("d"),
        lit(cell).as("cell"))
    }: _*)
    transform(slice(array_sort(scored), 1, nprobe), s => s.getField("cell"))
  }

  /** Embedding near-dup pairs: same-cell blocking, cosine ≥ threshold.
   * Cells are capped at `maxCell` members before the self-join, bounding
   * the within-cell cost at maxCell²/2 pairs (see capCell). */
  /** Cross-label semantic overlap matrix — [[graft.ext.Dedup.sourceOverlap]]'s
   * embedding-space sibling: per label pair, the ≥ `minCos` near-dup
   * vector pairs crossing the boundary and the distinct vectors on each
   * side that participate, with `containment` = the larger covered
   * fraction. Two labels whose vectors are mutual near-dups are the same
   * content under different tags (mixture weights treating them as
   * independent double-draw it); on a labeled eval set this is the
   * class-confusability audit.
   *
   * Blocking must be label-INDEPENDENT (cross-label pairs are the point,
   * so [[cosineDedupPairs]]'s same-cell-column trick is unavailable): rp
   * sign cells at the given geometry — pairs split across cells are
   * missed, the same recall trade every rp-bucketed path makes and the
   * one [[graft.ext.Dedup.lshRecall]] prices on the text side. Within-cell
   * work is quadratic, so on a real corpus this is a SAMPLED diagnostic
   * (`samplePct`, d21 discipline) with `capCell` bounding any hot cell;
   * per-label denominators count the relation actually scanned (post
   * sample/cap), keeping the reported fractions internally consistent. */
  def labelOverlap(vecs: DataFrame, minCos: Double,
      bits: Int = 4, dim: Int = 64, seed: String = "rp",
      samplePct: Int = 100, maxCell: Int = 10000): DataFrame = {
    val sampled =
      if (samplePct >= 100) vecs
      else Sampling.hashSample(vecs, "vec_id", samplePct)
    val planes = rpPlanes(dim, bits, seed)
    val v = graft.ext.Dedup.materialize(capCell(
      sampled.filter(col("label").isNotNull)
        .select(rpCell(col("embedding"), planes).as("cell"),
          col("vec_id"), col("label"), col("embedding")),
      "vec_id", maxCell))
    val per = v.groupBy("label").agg(countDistinct("vec_id").as("n"))
    val a = v.select(col("cell"), col("vec_id").as("id_a"),
      col("label").as("label_a"), col("embedding").as("emb_a"))
    val b = v.select(col("cell"), col("vec_id").as("id_b"),
      col("label").as("label_b"), col("embedding").as("emb_b"))
    a.join(b, Seq("cell"))
      .filter(col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"), col("id_a"), col("id_b"),
        round(cosine(col("emb_a"), col("emb_b")), 4).as("sim"))
      .filter(col("sim") >= minCos)
      .groupBy("label_a", "label_b")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct("id_a").as("covered_a"),
        countDistinct("id_b").as("covered_b"))
      .join(broadcast(per.toDF("label_a", "n_a")), Seq("label_a"))
      .join(broadcast(per.toDF("label_b", "n_b")), Seq("label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        col("n_pairs"), col("covered_a"), col("covered_b"),
        round(greatest(
          col("covered_a").cast("double") / col("n_a"),
          col("covered_b").cast("double") / col("n_b")), 4)
          .as("containment"))
  }

  def cosineDedupPairs(vecs: DataFrame, cellCol: String, minCos: Double,
      maxCell: Int = 10000): DataFrame = {
    val capped = capCell(
      vecs.select(col(cellCol).as("cell"), col("vec_id"), col("embedding")),
      "vec_id", maxCell)
    val a = capped.select(col("cell"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = capped.select(col("cell"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("emb_a"), col("emb_b")), 4).as("sim"))
      .filter(col("sim") >= minCos)
  }
}
