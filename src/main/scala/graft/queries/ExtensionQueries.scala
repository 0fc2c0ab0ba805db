package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.{Curation, Dedup, Retrieval, Sampling, Selection, Similarity, TextAnalysis}
import Tables.t

/**
 * North-star extensions (training-data pipeline operators): deduplication,
 * similarity search, text analysis. Every query here has a full DuckDB
 * oracle — the MinHash/SimHash pipelines hash via md5 so the oracle replays
 * the identical arithmetic in SQL.
 */
object ExtensionQueries {

  /** Random-hyperplane cell parameters shared by the n3 query and its
   * oracle: 4 bits → 16 cells over the 64-dim embeddings. */
  private val RpBits = 4
  private val RpDim = 64
  private val RpSeed = "rp"

  /** Product-quantization parameters shared by n10/n11 and their oracles:
   * 4 subspaces × 16 dims, 2 rp bits → ≤4 centroids per subspace. */
  private val PqM = 4
  private val PqSubDim = 16
  private val PqBits = 2
  private val PqSeed = "pq"

  /** Seed family for the RESIDUAL PQ codebooks (n18) — distinct from the
   * raw-vector PQ seed so the two quantizers train independent cells. */
  private val ResPqSeed = "pqr"

  /** Sliding-window chunking parameters shared by sp7/d11 and their
   * oracles (step = size − overlap). */
  private val ChunkSize = 32
  private val ChunkOverlap = 8
  private val ChunkStep = ChunkSize - ChunkOverlap

  /** Window width (tokens) for the d18 ExactSubstr span-removal contract. */
  private val SpanW = 8

  /** DuckDB chunking CTE chain (sp7's arithmetic), ending in
   * `c(doc_id, chunk_id, ct)`. Shared by sp7 and d11 so the two oracles
   * can never drift onto different chunk configurations. */
  private lazy val ChunkCtes: String =
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents),
        s AS (SELECT doc_id, toks,
                     unnest(generate_series(0, len(toks) - 1, $ChunkStep)) AS start
              FROM w),
        f AS (SELECT * FROM s
              WHERE start = 0 OR start + $ChunkOverlap < len(toks)),
        c AS (SELECT doc_id, CAST(start / $ChunkStep AS INTEGER) AS chunk_id,
                     toks[start + 1 : start + $ChunkSize] AS ct
              FROM f)"""

  /** DuckDB mirror of Similarity.pqEncode's final assembly (expects the
   * `a{i}` CTEs from [[PqSubspaceCtes]]): one row per vector with its m
   * codes. Shared by n10/n11/n12. */
  private lazy val PqEncCte: String = {
    val joins = (1 until PqM).map(i => s"JOIN a$i USING (vec_id)").mkString(" ")
    val cols = (0 until PqM).map(i => s"a$i.c$i").mkString(", ")
    s"enc AS (SELECT a0.vec_id, $cols FROM a0 $joins)"
  }

  /** DuckDB mirror of knnPqAdc's per-query LUTs (expects `q(q_id, emb)`
   * and the `cb{i}` CTEs): exact integer distance from each query
   * subvector to each subspace centroid. Shared by n11/n12 so a distance
   * fix can never reach one oracle and miss the other. */
  private lazy val PqLutCtes: String =
    (0 until PqM).map { i =>
      val lo = i * PqSubDim + 1
      val hi = (i + 1) * PqSubDim
      s"""lut$i AS (
            SELECT qv.q_id, cb.cell,
                   CAST(list_dot_product(qv.vq, qv.vq)
                     - 2 * list_dot_product(qv.vq, cb.cq)
                     + list_dot_product(cb.cq, cb.cq) AS BIGINT) AS d
            FROM (SELECT q_id,
                         list_transform(emb[$lo:$hi],
                           x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT)::DOUBLE) AS vq
                  FROM q) qv CROSS JOIN cb$i cb)"""
    }.mkString(",\n")

  /** ADC pair scoring joins + total distance, shared by n11/n12. */
  private lazy val PqAdcJoins: String =
    (0 until PqM).map(i =>
      s"JOIN lut$i l$i ON l$i.q_id = q.q_id AND l$i.cell = enc.c$i")
      .mkString("\n                ")
  private lazy val PqAdcDist: String =
    (0 until PqM).map(i => s"l$i.d").mkString(" + ")

  /** Self-ADC (reconstruction-error) joins + distance for e9: every vector
   * scores against its OWN codes, so the pairing is 1:1 by vec_id and the
   * `v{i}`/`cb{i}` relations join directly — no per-query LUTs. */
  private lazy val PqSelfAdcJoins: String =
    (0 until PqM).map(i =>
      s"JOIN v$i USING (vec_id) JOIN cb$i ON cb$i.cell = enc.c$i")
      .mkString("\n                 ")
  private lazy val PqSelfAdcDist: String =
    (0 until PqM).map(i =>
      s"""CAST(list_dot_product(v$i.vq, v$i.vq)
            - 2 * list_dot_product(v$i.vq, cb$i.cq)
            + list_dot_product(cb$i.cq, cb$i.cq) AS BIGINT)""")
      .mkString(" + ")

  /** DuckDB mirror of Similarity.pqCodebooks + pqEncode, one CTE chain per
   * subspace (expects a prior `e(vec_id, emb)` CTE): rp-cell seed over the
   * subvector slice, exact-integer M-step, micro-grid snap, argmin
   * assignment ending in `a{i}(vec_id, c{i})`. */
  private lazy val PqSubspaceCtes: String =
    (0 until PqM).map { i =>
      val lo = i * PqSubDim + 1
      val hi = (i + 1) * PqSubDim
      val cell = sqlRpCell(s"emb[$lo:$hi]",
        Similarity.rpPlanes(PqSubDim, PqBits, s"$PqSeed$i"))
      s"""sub$i AS (SELECT vec_id, emb[$lo:$hi] AS es,
                           CAST($cell AS INTEGER) AS cell
                    FROM e),
          x$i AS (SELECT cell,
                         unnest([{'pos': j - 1, 'v': es[j]}
                                 for j in generate_series(1, len(es))]) AS u
                  FROM sub$i),
          g$i AS (SELECT cell, CAST(u.pos AS INTEGER) AS pos, count(*) AS n,
                         CAST(sum(CAST(floor(u.v * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s
                  FROM x$i GROUP BY 1, 2),
          cb$i AS (SELECT cell,
                          list(CAST(floor(s / n + 0.5) AS BIGINT)::DOUBLE ORDER BY pos) AS cq
                   FROM g$i GROUP BY cell),
          v$i AS (SELECT vec_id,
                         list_transform(es, x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT)::DOUBLE) AS vq
                  FROM sub$i),
          a$i AS (SELECT vec_id, cell AS c$i FROM (
                    SELECT v.vec_id, cb.cell,
                           row_number() OVER (PARTITION BY v.vec_id
                             ORDER BY list_dot_product(v.vq, v.vq)
                               - 2 * list_dot_product(v.vq, cb.cq)
                               + list_dot_product(cb.cq, cb.cq), cb.cell) AS rn
                    FROM v$i v CROSS JOIN cb$i cb) WHERE rn = 1)"""
    }.mkString(",\n")

  /** DuckDB mirror of the residual-PQ chain (n18): expects the
   * [[sqlAsg1Ctes]] relations (`v(vec_id, vq)`, `cb(cell, cq)`,
   * `asg(vec_id, cell, dist)`) in scope. Emits `rq` (exact-BIGINT
   * residuals vs the assigned coarse centroid), per-subspace residual
   * codebooks `rcb{i}` (integer-millis plane seeding — exact-integer
   * sign projections — then the snap-to-grid M-step), code assignments
   * `ra{i}`, and the encoded relation `renc(vec_id, cell, c0..)`. */
  private lazy val ResidualPqCtes: String = {
    val subs = (0 until PqM).map { i =>
      val lo = i * PqSubDim + 1
      val hi = (i + 1) * PqSubDim
      val planes = Similarity.rpPlanesMillis(PqSubDim, PqBits, s"$ResPqSeed$i")
      val cellExpr = planes.zipWithIndex.map { case (w, p) =>
        val lits = w.mkString("[", ", ", "]")
        s"""(CASE WHEN list_dot_product(rs::DOUBLE[], $lits::DOUBLE[]) > 0
                  THEN ${1 << p} ELSE 0 END)"""
      }.mkString(" + ")
      s"""rc$i AS (SELECT vec_id, rq[$lo:$hi] AS rs,
                          CAST($cellExpr AS INTEGER) AS cell
                   FROM rq),
          rx$i AS (SELECT cell,
                          unnest([{'pos': j - 1, 'v': rs[j]}
                                  for j in generate_series(1, len(rs))]) AS u
                   FROM rc$i),
          rg$i AS (SELECT cell, CAST(u.pos AS INTEGER) AS pos, count(*) AS n,
                          CAST(sum(u.v) AS BIGINT) AS s
                   FROM rx$i GROUP BY 1, 2),
          rcb$i AS (SELECT cell,
                           list(CAST(floor(s / n + 0.5) AS BIGINT)::DOUBLE
                             ORDER BY pos) AS cq
                    FROM rg$i GROUP BY cell),
          ra$i AS (SELECT vec_id, cell AS c$i FROM (
                     SELECT rc.vec_id, rcb.cell,
                            row_number() OVER (PARTITION BY rc.vec_id
                              ORDER BY list_dot_product(rc.rsd, rc.rsd)
                                - 2 * list_dot_product(rc.rsd, rcb.cq)
                                + list_dot_product(rcb.cq, rcb.cq),
                                rcb.cell) AS rn
                     FROM (SELECT vec_id, rs::DOUBLE[] AS rsd FROM rc$i) rc
                     CROSS JOIN rcb$i rcb) WHERE rn = 1)"""
    }.mkString(",\n")
    val encJoins = (1 until PqM).map(i => s"JOIN ra$i USING (vec_id)")
      .mkString(" ")
    val encCols = (0 until PqM).map(i => s"ra$i.c$i").mkString(", ")
    s"""rq AS (SELECT a.vec_id, a.cell,
                      [CAST(v.vq[j] AS BIGINT) - CAST(cb.cq[j] AS BIGINT)
                       for j in generate_series(1, len(v.vq))] AS rq
               FROM asg a JOIN v USING (vec_id) JOIN cb ON cb.cell = a.cell),
        $subs,
        renc AS (SELECT rq.vec_id, rq.cell, $encCols
                 FROM rq JOIN ra0 USING (vec_id) $encJoins)"""
  }

  /** Shared DuckDB CTE prefix: distinct word-shingles per doc, mirroring
   * Dedup.shingles — the width-3 instance of [[sqlShinglesCteN]] (one
   * template; a tokenization fix cannot silently diverge between the
   * 3-gram and 13-gram oracles). */
  private val ShinglesCte: String = sqlShinglesCteN(3, "sh")

  /** Width-parameterized form of [[ShinglesCte]], mirroring
   * Dedup.shinglesN: CTE `name` = distinct `width`-word shingles over the
   * `src` relation (default: the documents table; d21 passes its sampled
   * CTE). */
  private def sqlShinglesCteN(width: Int, name: String,
      src: String = "documents"): String = {
    val concat = (0 until width).map(i => s"w[i+$i]").mkString(" || ' ' || ")
    s"""words_$name AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM $src),
        ${name}0 AS (
          SELECT doc_id,
                 unnest([$concat
                         for i in generate_series(1, len(w) - ${width - 1})]) AS sh
          FROM words_$name WHERE len(w) >= $width),
        $name AS (SELECT DISTINCT doc_id, sh FROM ${name}0)"""
  }

  /** DuckDB mirror of Dedup.seededHash. */
  private def sqlHash(shExpr: String, seed: Int): String =
    s"('0x' || substr(md5('$seed:' || $shExpr), 1, 8))::BIGINT"

  /** DuckDB mirror of [[graft.ext.Spectral]]'s 3-iteration fixed-point
   * power trajectory over the `embeddings` table: micro-grid quantization,
   * per-doc dot (su_i), dim-grain weighted sum (s_i), HUGEINT max-abs
   * renormalization (v_i) — every integer step identical to the engine's
   * (BIGINT `//` and HUGEINT `//` truncate toward zero exactly like
   * Spark's `div` / Scala BigInt division). */
  private val PcaCtes: String = pcaCtesWhere("TRUE")

  /** [[PcaCtes]] with a WHERE predicate on the TRAINING slice — the
   * direction trains on the filtered vectors (e16 trains on the
   * reference slice only, then projects both slices with it). */
  private def pcaCtesWhere(pred: String): String = {
    val head = s"""xq AS (
        SELECT vec_id, CAST(pos - 1 AS INTEGER) AS pos,
               CAST(floor(x * 1000000 + 0.5) AS BIGINT) AS xq
        FROM (SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
                     generate_subscripts(embedding, 1) AS pos
              FROM embeddings WHERE $pred)),
      su1 AS (SELECT vec_id,
                     CAST(sum(xq * 1000000) AS BIGINT) // 1000000 AS su
              FROM xq GROUP BY vec_id)"""
    val iters = (1 to 3).map { i =>
      val sv = s"""s$i AS (SELECT x.pos, CAST(sum(x.xq * u.su) AS BIGINT) AS s
                FROM xq x JOIN su$i u USING (vec_id) GROUP BY x.pos),
        v$i AS (SELECT pos,
                       CAST((CAST(s AS HUGEINT) * 1000000) //
                            (SELECT max(abs(s)) FROM s$i) AS BIGINT) AS v
                FROM s$i)"""
      val nextSu =
        if (i >= 3) ""
        else s""",
        su${i + 1} AS (SELECT x.vec_id,
                       CAST(sum(x.xq * v.v) AS BIGINT) // 1000000 AS su
                FROM xq x JOIN v$i v USING (pos) GROUP BY x.vec_id)"""
      sv + nextSu
    }.mkString(",\n", ",\n", "")
    head + iters
  }

  /** DuckDB mirror of Dedup.minhashSignature + Dedup.lshBands. */
  private val BandsCte: String = {
    val minCols = (0 until Dedup.NumHashes)
      .map(s => s"min(CASE WHEN seed = $s THEN h END) AS m$s").mkString(", ")
    val bandSelects = (0 until Dedup.Bands).map { b =>
      val ms = (0 until Dedup.RowsPerBand)
        .map(r => s"m${b * Dedup.RowsPerBand + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws(':', $ms)) AS band_hash FROM sig"
    }.mkString(" UNION ALL ")
    s"""hashes AS (
          SELECT doc_id, seed,
                 ('0x' || substr(md5(seed::VARCHAR || ':' || sh), 1, 8))::BIGINT AS h
          FROM sh CROSS JOIN (SELECT unnest(generate_series(0, ${Dedup.NumHashes - 1})) AS seed)),
        sig AS (SELECT doc_id, $minCols FROM hashes GROUP BY doc_id),
        bands AS ($bandSelects)"""
  }

  /** DuckDB mirror of Dedup.simhash, ending in `fp(doc_id, simhash)`. */
  private val SimhashCte: String = {
    val votes = (0 until 32)
      .map(i => s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
      .mkString(", ")
    val assemble = (0 until 32)
      .map(i => s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    s"""tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        h AS (SELECT doc_id, ${sqlHash("w", 0)} AS h FROM tok),
        votes AS (SELECT doc_id, $votes FROM h GROUP BY doc_id),
        fp AS (SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM votes)"""
  }

  /** DuckDB mirror of Dedup.winnowCandidates (width 3, win 4, minShared
   * 2, maxPostings 100), ending in `wn_pairs(doc_a, doc_b, n_shared)` —
   * shared by d28 and the d34 detector-Venn so the detector and its
   * agreement entry can never silently diverge. */
  private lazy val WinnowPairsCtes: String =
    s"""wn_w AS (SELECT doc_id, string_split(text, ' ') AS w
                 FROM documents),
        wn_p AS (SELECT doc_id, w,
                        unnest(generate_series(0, len(w) - 3)) AS pos
                 FROM wn_w WHERE len(w) >= 3),
        wn_k AS (SELECT doc_id, pos,
                   ${sqlHash(
                     "array_to_string(w[pos + 1 : pos + 3], ' ')",
                     Dedup.WinnowSeed)}
                     * 1048576 + (1048575 - pos) AS key
                 FROM wn_p),
        wn_s AS (SELECT doc_id, pos,
                        min(key) OVER (PARTITION BY doc_id
                          ORDER BY pos ROWS BETWEEN CURRENT ROW
                          AND 3 FOLLOWING) AS selk,
                        max(pos) OVER (PARTITION BY doc_id) AS maxpos
                 FROM wn_k),
        wn_d AS (SELECT DISTINCT doc_id, selk FROM wn_s
                 WHERE pos <= greatest(maxpos - 3, 0)),
        wn_f AS (SELECT DISTINCT doc_id, selk // 1048576 AS fp
                 FROM wn_d),
        wn_ok AS (SELECT fp FROM (
                    SELECT fp, count(*) AS df FROM wn_f GROUP BY fp)
                  WHERE df BETWEEN 2 AND 100),
        wn_pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS n_shared
          FROM wn_f a JOIN wn_f b
            ON a.fp = b.fp AND a.doc_id < b.doc_id
          WHERE a.fp IN (SELECT fp FROM wn_ok)
          GROUP BY 1, 2
          HAVING count(*) >= 2)"""

  /** Shared DuckDB CTE chain ending in `gq(doc_id, n_words, mean_word_len,
   * hash_ratio, ellipsis_ratio, alpha_word_frac, n_stop_kinds, pass)` —
   * the exact Gopher rule panel of t15, reused verbatim by the composed
   * pipeline oracle so a rule change cannot silently diverge between
   * them. */
  private lazy val GopherCtes: String = {
    val stops = TextAnalysis.GopherStops.map(w => s"'$w'").mkString(", ")
    s"""tk AS (SELECT doc_id, text,
                      string_split(text, ' ') AS toks
               FROM documents),
        m AS (SELECT doc_id,
                     CAST(len(toks) AS INTEGER) AS n_words,
                     round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                           / len(toks), 4) AS mean_word_len,
                     round(CAST(length(text)
                             - length(replace(text, '#', '')) AS DOUBLE)
                           / len(toks), 4) AS hash_ratio,
                     round(CAST((length(text)
                             - length(replace(text, '...', ''))) / 3
                             AS DOUBLE)
                           / len(toks), 4) AS ellipsis_ratio,
                     round(CAST(len(list_filter(toks,
                             w -> regexp_matches(w, '[A-Za-z]')))
                             AS DOUBLE)
                           / len(toks), 4) AS alpha_word_frac,
                     CAST(len(list_filter([$stops],
                            s -> list_contains(toks, s)))
                          AS INTEGER) AS n_stop_kinds
              FROM tk),
        gq AS (SELECT *,
                      (n_words >= 50 AND n_words <= 100000
                       AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                       AND hash_ratio <= 0.1 AND ellipsis_ratio <= 0.1
                       AND alpha_word_frac >= 0.8
                       AND n_stop_kinds >= 2) AS pass
               FROM m)"""
  }

  /** DuckDB mirror of TextAnalysis.langId: stopword-coverage CASE over the
   * fixed language order (each language wins only by beating-or-tying every
   * later one). Shared by t3 and the t7 confusion table. */
  private val LangPredSql: String = {
    val langs = Seq("en", "de", "es", "fr", "zh")
    def score(l: String) = {
      val lex = TextAnalysis.Lexicons(l).map(w => s"'$w'").mkString(", ")
      s"(CAST(len(list_filter(string_split(text, ' '), x -> list_contains([$lex], x))) AS DOUBLE) / len(string_split(text, ' ')))"
    }
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val laters = langs.drop(i + 1).map(o => s"${score(l)} >= ${score(o)}").mkString(" AND ")
      s"WHEN $laters THEN '$l'"
    }.mkString(" ")
    s"CASE $cases ELSE '${langs.last}' END"
  }

  /** DuckDB cosine mirror of Similarity.cosine (explicit, not the builtin
   * list_cosine_similarity, to replay the same fp association). */
  private def sqlCos(a: String, b: String): String =
    s"round(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 4)"

  /** DuckDB mirror of Spectral.linearProbe's training arithmetic (d = 4,
   * λ = 100, target label 0, the 10% `sample`-salt hash sample): the
   * centi-grid feature projection, the Gram/moment hash-agg (HUGEINT
   * sums), and the five Cramer determinants as fully-unrolled Leibniz
   * expansions — the 24-term sums of 4-entry products the engine
   * computes in BigInt, generated here with the same permutation
   * enumeration so both engines add identical integers. */
  private def probeDetsSql: String = {
    val d = 4
    def sign(p: Seq[Int]): Int = {
      var inv = 0
      for (i <- p.indices; j <- (i + 1) until p.size)
        if (p(i) > p(j)) inv += 1
      if (inv % 2 == 0) 1 else -1
    }
    def detSql(m: IndexedSeq[IndexedSeq[String]]): String =
      (0 until d).permutations.map { p =>
        val prod = p.zipWithIndex.map { case (c, r) => m(r)(c) }
          .mkString(" * ")
        s"${if (sign(p) > 0) "+" else "-"} ($prod)"
      }.mkString(" ")
    val a = IndexedSeq.tabulate(d, d) { (i, j) =>
      val base = s"a_${math.min(i, j)}_${math.max(i, j)}"
      if (i == j) s"($base + 100)" else base
    }
    val den = detSql(a)
    val nums = (0 until d).map { i =>
      detSql(IndexedSeq.tabulate(d, d)((r, c) =>
        if (c == i) s"b_$r" else a(r)(c)))
    }
    val gramCols =
      (for { i <- 0 until d; j <- i until d }
        yield s"sum(x$i * x$j) AS a_${i}_$j") ++
        (0 until d).map(i => s"sum(x$i * y) AS b_$i")
    s"""f AS (SELECT
            CAST(floor(CAST(embedding[1] AS DOUBLE) * 100 + 0.5)
              AS BIGINT) AS x0,
            CAST(floor(CAST(embedding[2] AS DOUBLE) * 100 + 0.5)
              AS BIGINT) AS x1,
            CAST(floor(CAST(embedding[3] AS DOUBLE) * 100 + 0.5)
              AS BIGINT) AS x2,
            CAST(1 AS BIGINT) AS x3,
            CAST(CASE WHEN label = 0 THEN 1 ELSE 0 END AS BIGINT) AS y
          FROM embeddings
          WHERE ('0x' || substr(md5('sample:' || vec_id::VARCHAR), 1, 8))::BIGINT % 100 < 10),
        g AS (SELECT ${gramCols.mkString(", ")} FROM f),
        dets AS (SELECT ($den) AS den,
                 ${nums.zipWithIndex.map { case (n, i) => s"($n) AS n$i" }
          .mkString(", ")}
                 FROM g)"""
  }

  /** DuckDB mirror of Similarity.rpCell: the same quantized plane weights
   * (exact 3-decimal literals → identical IEEE doubles) dotted in index
   * order, sign bits assembled into the cell id. */
  private def sqlRpCell(embExpr: String, planes: Array[Array[Double]]): String =
    planes.zipWithIndex.map { case (w, p) =>
      val lits = w.map(v =>
        java.math.BigDecimal.valueOf(math.round(v * 1000), 3).toPlainString)
        .mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product($embExpr, $lits::DOUBLE[]) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")

  /** DuckDB CTE chain replaying `Similarity.trainCodebook(rounds = 1)` +
   * the per-vector nearest-centroid assignment over a source relation
   * `src(vec_id, embedding)`: seeds cells by rp sign buckets, trains the
   * exact-integer centroid codebook, assigns every vector by squared
   * micro-grid distance (ties to the smaller cell). Ends in
   * `asg(vec_id, cell, dist)`. Shared by n8 and e5 so their oracles can
   * never drift onto different codebooks. */
  private def sqlAsg1Ctes(src: String): String = {
    val cell = sqlRpCell("embedding::DOUBLE[]",
      Similarity.rpPlanes(RpDim, RpBits, RpSeed))
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
                     CAST($cell AS INTEGER) AS cell
              FROM $src),
        x AS (SELECT cell,
                     unnest([{'pos': i - 1, 'v': emb[i]}
                             for i in generate_series(1, len(emb))]) AS u
              FROM e),
        g AS (SELECT cell, CAST(u.pos AS INTEGER) AS pos, count(*) AS n,
                     CAST(sum(CAST(floor(u.v * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s
              FROM x GROUP BY 1, 2),
        cb AS (SELECT cell,
                      list(CAST(floor(s / n + 0.5) AS BIGINT)::DOUBLE ORDER BY pos) AS cq
               FROM g GROUP BY cell),
        v AS (SELECT vec_id,
                     list_transform(emb, x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT)::DOUBLE) AS vq
              FROM e),
        d AS (SELECT v.vec_id, cb.cell,
                     list_dot_product(v.vq, v.vq)
                       - 2 * list_dot_product(v.vq, cb.cq)
                       + list_dot_product(cb.cq, cb.cq) AS dist
              FROM v CROSS JOIN cb),
        asg AS (SELECT vec_id, cell, dist FROM (
                  SELECT vec_id, cell, dist,
                         row_number() OVER (PARTITION BY vec_id
                           ORDER BY dist, cell) AS rn
                  FROM d) WHERE rn = 1)"""
  }

  /** DuckDB replay of `Similarity.protoPrune` given a WITH-prefix whose
   * chain ends in `asg(vec_id, cell, dist)` (see [[sqlAsg1Ctes]]): the
   * per-cell distance histogram, its running count, the dropFrac-quantile
   * threshold, and the kept rows (boundary ties drop together). Shared by
   * e5 and e6 so the two prune derivations cannot drift. */
  private def sqlProtoPruneSql(withCtes: String, frac: Double): String =
    s"""$withCtes,
        hist AS (SELECT cell, CAST(dist AS BIGINT) AS dq, count(*) AS c
                 FROM asg GROUP BY 1, 2),
        cum AS (SELECT cell, dq,
                       sum(c) OVER (PARTITION BY cell ORDER BY dq) AS cum,
                       sum(c) OVER (PARTITION BY cell) AS n
                FROM hist),
        thr AS (SELECT cell, min(dq) AS thr FROM cum
                WHERE cum >= ceil($frac * n) GROUP BY cell)
        SELECT a.vec_id, a.cell, CAST(a.dist AS BIGINT) AS dq
        FROM asg a JOIN thr t USING (cell)
        WHERE CAST(a.dist AS BIGINT) > t.thr"""

  /** Shared CTE chain ending in `lsh_pairs` (the verified near-dup pairs at
   * Jaccard >= 0.5), parameterized by the LSH bucket cap so the CAPPED
   * production default of `Dedup.lshCandidates` is itself oracle-replayable
   * (pipe1), while the uncapped variant keeps serving d3/d6/d7/sp4. One
   * shared derivation — the two variants cannot drift. */
  private def lshPairsCtesWithCap(cap: Option[Int]): String = {
    val bnd = cap match {
      case Some(c) =>
        s"""bnd AS (SELECT doc_id, band, band_hash FROM (
              SELECT doc_id, band, band_hash,
                     count(*) OVER (PARTITION BY band, band_hash) AS bsz
              FROM bands) WHERE bsz <= $c)"""
      case None =>
        "bnd AS (SELECT doc_id, band, band_hash FROM bands)"
    }
    s"""$ShinglesCte, $BandsCte, $bnd,
        cands AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bnd a JOIN bnd b
            ON a.band = b.band AND a.band_hash = b.band_hash
           AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT c.doc_a, c.doc_b, count(*) AS n_inter
          FROM cands c
          JOIN sh sa ON sa.doc_id = c.doc_a
          JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
          GROUP BY 1, 2),
        lsh_pairs AS (
          SELECT i.doc_a, i.doc_b,
                 round(CAST(n_inter AS DOUBLE) / (na.n + nb.n - n_inter), 4) AS jac
          FROM inter i
          JOIN sizes na ON na.doc_id = i.doc_a
          JOIN sizes nb ON nb.doc_id = i.doc_b
          WHERE round(CAST(n_inter AS DOUBLE) / (na.n + nb.n - n_inter), 4) >= 0.5)"""
  }

  private val LshPairsCtes: String = lshPairsCtesWithCap(None)

  /** DuckDB mirror of `Bpe.encodeWordExpr(w, FrozenMerges)` — generated
   * from the SAME Scala merge list as the Spark expression (a model edit
   * cannot reach one side only): char-spaced start, then each merge as a
   * doubled whole-symbol replace. Evaluates over a lambda variable `w`. */
  private lazy val BpeEncodeSql: String = {
    val start = """' ' || regexp_replace(w, '(.)', '\1 ', 'g') || '</w> '"""
    graft.ext.Bpe.FrozenMerges.foldLeft(start) { case (s, (a, b)) =>
      val from = s" $a $b "
      val to = s" $a$b "
      s"replace(replace($s, '$from', '$to'), '$from', '$to')"
    }
  }

  /** DuckDB replay of `Retrieval.bm25TopK`'s scoring for the 3-term demo
   * query, ending in `bm(doc_id, n_terms, bm25_q, bm25)` — every matching
   * doc, no top-k cut (each consumer cuts). Shared by t17 and the t18
   * hybrid fusion so the two oracles cannot drift onto different BM25
   * arithmetic. */
  private lazy val Bm25Ctes: String =
    """dl AS (SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
              FROM documents),
       stats AS (SELECT CAST(sum(dl) AS BIGINT) AS sum_dl,
                        count(*) AS n_docs
                 FROM dl),
       tok AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
                      unnest(string_split(text, ' ')) AS tok
               FROM documents),
       tf AS (SELECT doc_id, dl, tok, count(*) AS tf
              FROM tok
              WHERE tok IN ('spark', 'vector', 'stream')
              GROUP BY 1, 2, 3),
       dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
       sc AS (SELECT doc_id,
                     CAST(floor(
                       CAST(CAST(floor(ln(1e0
                             + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                               / (CAST(df AS DOUBLE) + 0.5))
                           * 1e6 + 0.5) AS BIGINT) AS DOUBLE)
                       * (CAST(tf AS DOUBLE) * 2.2e0
                           / (CAST(tf AS DOUBLE)
                              + 1.2e0 * (0.25e0
                                  + 0.75e0 * CAST(dl AS DOUBLE)
                                    / (CAST(sum_dl AS DOUBLE)
                                       / CAST(n_docs AS DOUBLE)))))
                       + 0.5) AS BIGINT) AS s_q
              FROM tf JOIN dfreq USING (tok) CROSS JOIN stats),
       bm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
                     CAST(sum(s_q) AS BIGINT) AS bm25_q,
                     CAST(sum(s_q) AS DOUBLE) / 1e6 AS bm25
              FROM sc GROUP BY doc_id)"""

  /** The t24/pipe3 greedy-MMR key decode: winner id + objective from the
   * packed BIGINT (floored mod/div — identical arithmetic to the Spark
   * side's pmod/div). */
  private val MmrM: Long = 1L << 21
  private def sqlMmrDecode(src: String, step: Int): String =
    s"""SELECT q_id, $step AS step,
               $MmrM - 1 - ((key % $MmrM + $MmrM) % $MmrM) AS n_id,
               (key - ((key % $MmrM + $MmrM) % $MmrM)) // $MmrM AS mmr4
        FROM $src"""

  /** Unrolled greedy-MMR rounds 2..`kTo` over CTEs `cand (q_id, n_id,
   * rel4)`, `psims (q_id, c_a, c_b, sim4)` and `res1` — shared by t24 and
   * pipe3 so the two compositions replay the identical selection
   * arithmetic. */
  private def sqlMmrSteps(kTo: Int): String =
    (2 to kTo).map { i =>
      val prev = s"res${i - 1}"
      s"""ms$i AS (SELECT p.q_id, p.c_a, max(p.sim4) AS ms4
                   FROM psims p JOIN $prev s
                     ON p.q_id = s.q_id AND p.c_b = s.n_id
                   GROUP BY 1, 2),
          sc$i AS (SELECT c.q_id, c.n_id, c.rel4 - m.ms4 AS mmr4
                   FROM cand c JOIN ms$i m
                     ON c.q_id = m.q_id AND c.n_id = m.c_a
                   WHERE NOT EXISTS (SELECT 1 FROM $prev s
                     WHERE s.q_id = c.q_id AND s.n_id = c.n_id)),
          k$i AS (SELECT q_id,
                         max(mmr4 * $MmrM + ($MmrM - 1 - n_id)) AS key
                  FROM sc$i GROUP BY q_id),
          sel$i AS (${sqlMmrDecode(s"k$i", i)}),
          res$i AS (SELECT * FROM res${i - 1}
                    UNION ALL SELECT * FROM sel$i)"""
    }.mkString(",\n")

  /** The capped chain at the production default (`maxBucket = 100`) —
   * what a real curation run executes ([[graft.ext.Curation]]). */
  private val LshPairsCappedCtes: String =
    lshPairsCtesWithCap(Some(100))

  /** DuckDB replay of `Dedup.removeDuplicateSpans(_, w)` reduced to the
   * per-doc survivor count: CTE chain ending in `span_agg(doc_id,
   * n_kept)` covering EVERY document (uncut docs report their full token
   * count). `_sp`-suffixed names so the chain composes into statements
   * that already use the Gopher/LSH CTE families (pipe1). Shares the d18
   * derivation shape: every-position fingerprint windows, global keeper =
   * first (doc_id, pos), kept token = one not covered by any non-keeper
   * window. */
  private def sqlSpanKeptCtes(w: Int): String =
    s"""w_sp AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
        s_sp AS (SELECT doc_id, toks,
                        unnest(generate_series(0, len(toks) - $w)) AS pos
                 FROM w_sp),
        wins_sp AS (SELECT doc_id, pos,
                           md5(array_to_string(
                             toks[pos + 1 : pos + $w], ' ')) AS fp
                    FROM s_sp),
        r_sp AS (SELECT doc_id, pos,
                        count(*) OVER (PARTITION BY fp) AS n,
                        row_number() OVER (PARTITION BY fp
                          ORDER BY doc_id, pos) AS rn
                 FROM wins_sp),
        cut_sp AS (SELECT doc_id, pos FROM r_sp WHERE n > 1 AND rn > 1),
        cov_sp AS (SELECT DISTINCT doc_id, pos + d AS cp
                   FROM cut_sp,
                        (SELECT unnest(generate_series(0, ${w - 1})) AS d)),
        tok_sp AS (SELECT doc_id, toks,
                          unnest(generate_series(1, len(toks))) AS i
                   FROM w_sp),
        kept_sp AS (SELECT t.doc_id, t.i, t.toks[t.i] AS tk
                    FROM tok_sp t LEFT JOIN cov_sp c
                      ON c.doc_id = t.doc_id AND c.cp = t.i - 1
                    WHERE c.doc_id IS NULL),
        span_agg AS (SELECT w.doc_id,
                            CAST(coalesce(k.n_kept, 0) AS INTEGER) AS n_kept,
                            coalesce(k.text_dedup, '') AS text_dedup
                     FROM w_sp w LEFT JOIN
                       (SELECT doc_id, count(*) AS n_kept,
                               string_agg(tk, ' ' ORDER BY i) AS text_dedup
                        FROM kept_sp GROUP BY doc_id) k USING (doc_id))"""

  /** The pipe1 oracle statement — shared verbatim by `pipe1_curation_report`
   * and wrapped in one outer aggregate by `pipe5_data_card` (the corpus-grain
   * report over the same per-doc dispositions — one derivation, two gates). */
  private lazy val Pipe1Sql: String = s"""WITH RECURSIVE $LshPairsCappedCtes,
               edges AS (
                 SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
                 UNION ALL
                 SELECT doc_b, doc_a FROM lsh_pairs),
               reach(src, dst) AS (
                 SELECT src, dst FROM edges
                 UNION
                 SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
               clusters AS (
                 SELECT src AS doc_id, least(src, min(dst)) AS cluster
                 FROM reach GROUP BY src),
               neardup_losers AS (
                 SELECT doc_id FROM clusters WHERE doc_id <> cluster),
               exact_keepers AS (
                 SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
               bsh AS (SELECT doc_id AS bench_id, sh FROM sh
                       WHERE doc_id % 20 = 0),
               hits AS (
                 SELECT s.doc_id, b.bench_id, count(*) AS n
                 FROM sh s JOIN bsh b ON s.sh = b.sh AND s.doc_id <> b.bench_id
                 GROUP BY 1, 2
                 HAVING count(*) >= 5),
               contaminated_ids AS (SELECT DISTINCT doc_id FROM hits),
               ${sqlSpanKeptCtes(SpanW)},
               ehits AS (
                 SELECT DISTINCT c.vec_id AS doc_id
                 FROM (SELECT vec_id, label, embedding::DOUBLE[] AS c_emb
                       FROM embeddings WHERE vec_id >= 10) c
                 JOIN (SELECT label, embedding::DOUBLE[] AS e_emb
                       FROM embeddings WHERE vec_id < 10) ev USING (label)
                 WHERE ${sqlCos("c.c_emb", "ev.e_emb")} >= 0.3),
               $GopherCtes,
               l AS (SELECT doc_id, $LangPredSql AS lang_pred FROM documents),
               qm_w AS (
                 SELECT doc_id,
                        ('0x' || substr(md5('qv:' ||
                           (('0x' || substr(md5('qw:' || tok), 1, 8))::BIGINT % ${graft.ext.QualityModel.NumBuckets})::VARCHAR
                         ), 1, 8))::BIGINT % 2001 - 1000 AS w_m
                 FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                       FROM documents)),
               qm AS (
                 SELECT doc_id,
                        CAST(CAST(sum(w_m) AS BIGINT) AS DOUBLE) / 1000.0
                          / count(*) AS quality_score
                 FROM qm_w GROUP BY doc_id),
               ux_tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                          FROM documents),
               ux_c AS (SELECT tok, count(*) AS c FROM ux_tok GROUP BY tok),
               ux_n AS (SELECT count(*) AS n_total FROM ux_tok),
               ux_w AS (SELECT doc_id,
                               CAST(floor(-ln(CAST(c AS DOUBLE) / n_total) * 1e6
                                 + 0.5) AS BIGINT) AS nll_q
                        FROM ux_tok JOIN ux_c USING (tok) CROSS JOIN ux_n),
               ux AS (SELECT doc_id,
                             round(CAST(sum(nll_q) AS DOUBLE) / 1e6 / count(*), 6)
                               AS xent
                      FROM ux_w GROUP BY doc_id),
               flags AS (
                 SELECT d.doc_id,
                        (l.lang_pred = 'en') AS lang_ok,
                        gq.pass AS quality_ok,
                        (d.doc_id IN (SELECT doc_id FROM exact_keepers))
                          AS exact_keeper,
                        (d.doc_id NOT IN (SELECT doc_id FROM neardup_losers))
                          AS neardup_keeper,
                        (d.doc_id IN (SELECT doc_id FROM contaminated_ids))
                          AS contaminated,
                        sa.n_kept AS span_kept,
                        (d.doc_id IN (SELECT doc_id FROM ehits))
                          AS embed_contaminated,
                        CASE WHEN ('0x' || substr(md5('split:' || d.doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 80 THEN 'train'
                             WHEN ('0x' || substr(md5('split:' || d.doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 90 THEN 'val'
                             ELSE 'test' END AS split,
                        qm.quality_score,
                        ux.xent
                 FROM documents d
                 JOIN l USING (doc_id)
                 JOIN gq USING (doc_id)
                 JOIN span_agg sa USING (doc_id)
                 JOIN qm USING (doc_id)
                 JOIN ux USING (doc_id))
               SELECT doc_id, lang_ok, quality_ok, exact_keeper,
                      neardup_keeper, contaminated, span_kept,
                      embed_contaminated, split,
                      (lang_ok AND quality_ok AND exact_keeper
                       AND neardup_keeper AND NOT contaminated
                       AND NOT embed_contaminated) AS keep,
                      quality_score, xent
               FROM flags"""

  val defs: Map[String, QueryDef] = Map(

    // ---- deduplication ----

    "d1_exact_dedup" -> QueryDef(
      (s, dir) => Dedup.exactDedup(t(s, dir, "documents")),
      Some("""SELECT min(doc_id) AS doc_id, count(*) AS n_copies
              FROM documents GROUP BY text"""),
      "exact dedup: hash-groupBy text, deterministic keeper"),

    "d2_minhash_bands" -> QueryDef(
      (s, dir) => Dedup.lshBands(Dedup.minhashSignature(
        Dedup.shingles(t(s, dir, "documents")))),
      Some(s"""WITH $ShinglesCte, $BandsCte
               SELECT doc_id, band, band_hash FROM bands"""),
      "MinHash signatures + LSH band hashes (md5-replayable)"),

    // The maxBucket tuning diagnostic: bucket-size distribution + the
    // candidate-pair upper bound (sum sz*(sz-1)/2) of the band self-join —
    // the numbers that decide the cap BEFORE the join runs. All exact
    // integers (bit-for-bit oracle replay).
    "d17_lsh_bucket_stats" -> QueryDef(
      (s, dir) => Dedup.lshBucketStats(t(s, dir, "documents")),
      Some(s"""WITH $ShinglesCte, $BandsCte,
               b AS (SELECT band, band_hash, count(*) AS sz
                     FROM bands GROUP BY 1, 2)
               SELECT count(*) AS n_buckets,
                      CAST(sum(sz) AS BIGINT) AS n_rows,
                      CAST(max(sz) AS BIGINT) AS max_bucket,
                      CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
                        AS n_singleton,
                      CAST(sum(CASE WHEN sz > 100 THEN 1 ELSE 0 END) AS BIGINT)
                        AS n_over_cap,
                      CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS pair_bound
               FROM b"""),
      "LSH bucket-size distribution + candidate-pair bound (cap tuning)"),

    // The OTHER banding diagnostic: empirical recall/precision of the LSH
    // candidate stage against complete ground truth on a deterministic
    // hash-sample (complete because any Jaccard > 0 pair shares a shingle,
    // so the uncapped shared-shingle expansion reaches every pair; the
    // quadratic corner is affordable only because it is sample-bounded —
    // the published way to read the b×r S-curve off a real corpus). 50%
    // here: near-dup PAIRS survive a p-sample at ~p², and the sf0.01
    // corpus holds only 25 truth pairs — 20% would gate the arithmetic on
    // a 1-pair truth set. The sf1 bench probe runs the scale-default 20%.
    "d21_lsh_recall" -> QueryDef(
      (s, dir) => Dedup.lshRecall(t(s, dir, "documents"), minJaccard = 0.5,
        samplePct = 50),
      Some(s"""WITH ds AS (
                 SELECT doc_id, text FROM documents
                 WHERE ('0x' || substr(md5('sample:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 50),
               ${sqlShinglesCteN(3, "sh", "ds")},
               $BandsCte,
               sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
               tc AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                      FROM sh a JOIN sh b
                        ON a.sh = b.sh AND a.doc_id < b.doc_id),
               inter AS (SELECT t.doc_a, t.doc_b, count(*) AS n_inter
                         FROM tc t
                         JOIN sh sa ON sa.doc_id = t.doc_a
                         JOIN sh sb ON sb.doc_id = t.doc_b AND sb.sh = sa.sh
                         GROUP BY 1, 2),
               truth AS (SELECT i.doc_a, i.doc_b
                         FROM inter i
                         JOIN sizes na ON na.doc_id = i.doc_a
                         JOIN sizes nb ON nb.doc_id = i.doc_b
                         WHERE round(CAST(n_inter AS DOUBLE)
                                 / (na.n + nb.n - n_inter), 4) >= 0.5),
               cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                        FROM bands a JOIN bands b
                          ON a.band = b.band AND a.band_hash = b.band_hash
                         AND a.doc_id < b.doc_id),
               hit AS (SELECT t.doc_a FROM truth t
                       JOIN cand c
                         ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b),
               n AS (SELECT (SELECT count(*) FROM ds) AS n_sample,
                            (SELECT count(*) FROM truth) AS n_truth,
                            (SELECT count(*) FROM cand) AS n_cand,
                            (SELECT count(*) FROM hit) AS n_hit)
               SELECT n_sample, n_truth, n_cand, n_hit,
                      CASE WHEN n_truth > 0
                           THEN round(CAST(n_hit AS DOUBLE) / n_truth, 4)
                      END AS recall,
                      CASE WHEN n_cand > 0
                           THEN round(CAST(n_hit AS DOUBLE) / n_cand, 4)
                      END AS cand_precision
               FROM n"""),
      "LSH banding recall/precision vs exact Jaccard truth on a 20% sample"),

    // The third leg of the banding toolkit: d17 measures the deployed
    // scheme's bucket skew, d21 measures its empirical recall, d25 computes
    // the ANALYTIC S-curve for every (b × r) factorization of the 12-hash
    // signature so the scheme is chosen before any corpus is touched.
    // Powers expand as left-associative multiplication chains and the
    // threshold (1/b)^(1/r) as sqrt/cbrt compositions — IEEE-reproducible
    // arithmetic, no libm pow — so DuckDB replays every double exactly.
    "d25_lsh_plan" -> QueryDef(
      (s, _) => Dedup.lshPowerCurve(s),
      Some("""WITH combos(b, r) AS (VALUES (1, 12), (2, 6), (3, 4), (4, 3),
                                           (6, 2), (12, 1)),
              grid AS (SELECT b, r, CAST(k * 5 AS INTEGER) AS s_pct
                       FROM combos, range(1, 20) t(k)),
              s1 AS (SELECT b, r, s_pct, s_pct / 100.0 AS s FROM grid),
              s2 AS (SELECT b, r, s_pct,
                            CASE r WHEN 1 THEN s
                                   WHEN 2 THEN s * s
                                   WHEN 3 THEN s * s * s
                                   WHEN 4 THEN s * s * s * s
                                   WHEN 6 THEN s * s * s * s * s * s
                                   WHEN 12 THEN s * s * s * s * s * s
                                              * s * s * s * s * s * s
                            END AS sr,
                            CASE WHEN b = 1 AND r = 12
                                   THEN round(cbrt(sqrt(sqrt(1.0 / 1))), 4)
                                 WHEN b = 2 AND r = 6
                                   THEN round(cbrt(sqrt(1.0 / 2)), 4)
                                 WHEN b = 3 AND r = 4
                                   THEN round(sqrt(sqrt(1.0 / 3)), 4)
                                 WHEN b = 4 AND r = 3
                                   THEN round(cbrt(1.0 / 4), 4)
                                 WHEN b = 6 AND r = 2
                                   THEN round(sqrt(1.0 / 6), 4)
                                 WHEN b = 12 AND r = 1
                                   THEN round(1.0 / 12, 4)
                            END AS s_threshold
                     FROM s1),
              s3 AS (SELECT b, r, s_pct, 1.0 - sr AS q, s_threshold FROM s2)
              SELECT b, r, s_pct,
                     round(1.0 - (CASE b WHEN 1 THEN q
                                         WHEN 2 THEN q * q
                                         WHEN 3 THEN q * q * q
                                         WHEN 4 THEN q * q * q * q
                                         WHEN 6 THEN q * q * q * q * q * q
                                         WHEN 12 THEN q * q * q * q * q * q
                                                    * q * q * q * q * q * q
                                  END), 6) AS p_candidate,
                     s_threshold
              FROM s3"""),
      "analytic LSH S-curve + threshold for every banding of the signature"),

    // maxBucket is disabled here because the DuckDB oracle joins bands with
    // no bucket cap — a bucket over the default cap would silently diverge
    // the two sides. Production paths keep the default cap.
    "d3_lsh_pairs" -> QueryDef(
      (s, dir) => Dedup.minhashDedupPairs(t(s, dir, "documents"), 0.5,
        maxBucket = Int.MaxValue),
      Some(s"""WITH $LshPairsCtes
               SELECT doc_a, doc_b, jac FROM lsh_pairs"""),
      "MinHash-LSH candidates verified at Jaccard >= 0.5"),

    // Connected components over the verified near-dup pairs: each doc gets
    // the min doc_id of its component (the canonical keeper) — iterative
    // min-label propagation on the Spark side, transitive-closure recursive
    // CTE in the oracle. Both converge to the same labeling.
    "d6_dup_clusters" -> QueryDef(
      (s, dir) => Dedup.dupClusters(
        Dedup.minhashDedupPairs(t(s, dir, "documents"), 0.5,
          maxBucket = Int.MaxValue).select("doc_a", "doc_b")),
      Some(s"""WITH RECURSIVE $LshPairsCtes,
               edges AS (
                 SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
                 UNION ALL
                 SELECT doc_b, doc_a FROM lsh_pairs),
               reach(src, dst) AS (
                 SELECT src, dst FROM edges
                 UNION
                 SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
               SELECT src AS doc_id, least(src, min(dst)) AS cluster
               FROM reach GROUP BY src"""),
      "near-dup cluster assignment (connected components, min-label keeper)"),

    // Quality-aware survivor selection: instead of d7's min-id keeper, each
    // near-dup cluster keeps its BEST member (longest text, ties to the
    // smaller id) — the selection step real dedup pipelines run so boiler-
    // plate stubs don't survive over full documents. One struct-min
    // hash-agg over the cluster assignment (argmax without a window sort).
    "d10_quality_dedup" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val clusters = Dedup.dupClusters(
          Dedup.minhashDedupPairs(docs, 0.5, maxBucket = Int.MaxValue)
            .select("doc_a", "doc_b"))
        clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
          .groupBy("cluster")
          .agg(
            min(struct((-col("n_chars")).as("neg"), col("doc_id"))).as("m"),
            count(lit(1)).as("n_members"))
          .select(col("cluster"), col("m.doc_id").as("keeper"),
            (-col("m.neg")).as("keeper_chars"), col("n_members"))
      },
      Some(s"""WITH RECURSIVE $LshPairsCtes,
               edges AS (
                 SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
                 UNION ALL
                 SELECT doc_b, doc_a FROM lsh_pairs),
               reach(src, dst) AS (
                 SELECT src, dst FROM edges
                 UNION
                 SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
               cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster
                      FROM reach GROUP BY src),
               scored AS (
                 SELECT cl.cluster, cl.doc_id, d.n_chars,
                        row_number() OVER (PARTITION BY cl.cluster
                          ORDER BY d.n_chars DESC, cl.doc_id) AS rn
                 FROM cl JOIN documents d USING (doc_id))
               SELECT cluster,
                      max(CASE WHEN rn = 1 THEN doc_id END) AS keeper,
                      max(CASE WHEN rn = 1 THEN n_chars END) AS keeper_chars,
                      count(*) AS n_members
               FROM scored GROUP BY cluster"""),
      "quality-aware dedup keeper: argmax text length per near-dup cluster"),

    // Chunk-granularity exact dedup (the "paragraph dedup" step between
    // document dedup and packing): sliding-window chunks fingerprinted and
    // grouped — duplicated spans surface even when the containing docs are
    // only near-dups. One hash-agg over the chunk relation; fingerprints,
    // not chunk text, carry through the shuffle.
    "d11_chunk_dedup" -> QueryDef(
      (s, dir) => graft.ext.Sampling
        .chunkDocuments(t(s, dir, "documents"),
          chunkSize = ChunkSize, overlap = ChunkOverlap)
        .groupBy(md5(col("chunk")).as("chunk_fp"))
        .agg(count(lit(1)).as("n_copies"),
          countDistinct("doc_id").as("n_docs"),
          min(struct(col("doc_id"), col("chunk_id"))).as("k"))
        .filter(col("n_copies") > 1)
        .select(col("chunk_fp"), col("n_copies"), col("n_docs"),
          col("k.doc_id").as("keeper_doc"),
          col("k.chunk_id").as("keeper_chunk")),
      Some(s"""WITH $ChunkCtes,
                ch AS (SELECT doc_id, chunk_id,
                              md5(array_to_string(ct, ' ')) AS chunk_fp
                       FROM c),
                agg AS (SELECT chunk_fp, count(*) AS n_copies,
                               count(DISTINCT doc_id) AS n_docs
                        FROM ch GROUP BY 1 HAVING count(*) > 1),
                k AS (SELECT chunk_fp, doc_id AS keeper_doc,
                             chunk_id AS keeper_chunk,
                             row_number() OVER (PARTITION BY chunk_fp
                               ORDER BY doc_id, chunk_id) AS rn
                      FROM ch)
              SELECT a.chunk_fp, a.n_copies, a.n_docs,
                     k.keeper_doc, k.keeper_chunk
              FROM agg a JOIN k ON a.chunk_fp = k.chunk_fp AND k.rn = 1"""),
      "chunk-level exact dedup: duplicated spans across near-dup documents"),

    // ExactSubstr span REMOVAL (the contract d11 only flags): duplicated
    // >= SpanW-token spans are cut from all-but-one occurrence while the
    // rest of each document survives. The oracle replays the whole
    // fingerprint -> keeper -> cut derivation, rebuilding kept text from
    // the uncovered token positions (a different but value-identical
    // formulation of the engine's merged-span substring arithmetic).
    "d18_span_dedup" -> QueryDef(
      (s, dir) => Dedup.removeDuplicateSpans(t(s, dir, "documents"), SpanW),
      Some(s"""WITH ${sqlSpanKeptCtes(SpanW)}
               SELECT doc_id, n_kept, text_dedup FROM span_agg"""),
      "ExactSubstr span removal: duplicated spans cut from all-but-one occurrence"),

    // Boilerplate n-gram REMOVAL (the repair form of t13's diagnostic):
    // every occurrence of a bigram present in >= 30 distinct documents is
    // cut from every document - no keeper, the C4/RefinedWeb treatment of
    // corpus-frequent chrome. Shares the d18 cut machinery; the oracle
    // rebuilds kept text from uncovered token positions.
    "d23_remove_boilerplate" -> QueryDef(
      (s, dir) => Dedup.removeBoilerplate(t(s, dir, "documents"),
        width = 2, minDf = 30),
      Some("""WITH w_bp AS (SELECT doc_id, string_split(text, ' ') AS toks
                            FROM documents),
              s_bp AS (SELECT doc_id, toks,
                              unnest(generate_series(0, len(toks) - 2)) AS pos
                       FROM w_bp),
              wins_bp AS (SELECT doc_id, pos,
                                 md5(array_to_string(
                                   toks[pos + 1 : pos + 2], ' ')) AS fp
                          FROM s_bp),
              hot_bp AS (SELECT fp FROM (
                           SELECT fp, count(DISTINCT doc_id) AS df
                           FROM wins_bp GROUP BY fp)
                         WHERE df >= 30),
              cut_bp AS (SELECT doc_id, pos FROM wins_bp
                         WHERE fp IN (SELECT fp FROM hot_bp)),
              cov_bp AS (SELECT DISTINCT doc_id, pos + d AS cp
                         FROM cut_bp,
                              (SELECT unnest(generate_series(0, 1)) AS d)),
              tok_bp AS (SELECT doc_id, toks,
                                unnest(generate_series(1, len(toks))) AS i
                         FROM w_bp),
              kept_bp AS (SELECT t.doc_id, t.i, t.toks[t.i] AS tk
                          FROM tok_bp t LEFT JOIN cov_bp c
                            ON c.doc_id = t.doc_id AND c.cp = t.i - 1
                          WHERE c.doc_id IS NULL)
              SELECT w.doc_id,
                     CAST(coalesce(k.n_kept, 0) AS INTEGER) AS n_kept,
                     coalesce(k.text_dedup, '') AS text_dedup
              FROM w_bp w LEFT JOIN
                (SELECT doc_id, count(*) AS n_kept,
                        string_agg(tk, ' ' ORDER BY i) AS text_dedup
                 FROM kept_bp GROUP BY doc_id) k USING (doc_id)"""),
      "boilerplate bigram removal: corpus-frequent grams cut everywhere"),

    // Incremental-ingest dedup (the nightly-batch shape): a NEW batch
    // dedupes against the fingerprints of the already-ingested corpus —
    // no re-clustering of history, just one keyed anti-join against the
    // stored fingerprint relation (bloom/semi-prunable at scale) plus
    // first-wins within the batch itself. History never rescans its text.
    "d12_incremental_dedup" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val historyFps = docs.filter(col("doc_id") < 250)
          .select(md5(col("text")).as("fp")).distinct()
        val batch = docs.filter(col("doc_id") >= 250)
          .select(col("doc_id"), md5(col("text")).as("fp"))
        val withinBatch = batch.groupBy("fp")
          .agg(min("doc_id").as("doc_id"))
        withinBatch.join(historyFps, Seq("fp"), "left_anti")
          .select("doc_id", "fp")
      },
      Some("""WITH hist AS (
                SELECT DISTINCT md5(text) AS fp FROM documents
                WHERE doc_id < 250),
              batch AS (
                SELECT md5(text) AS fp, min(doc_id) AS doc_id
                FROM documents WHERE doc_id >= 250 GROUP BY 1)
              SELECT doc_id, fp FROM batch
              WHERE NOT EXISTS (SELECT 1 FROM hist WHERE hist.fp = batch.fp)"""),
      "incremental dedup: new batch vs stored corpus fingerprints"),

    // Benchmark DECONTAMINATION — the eval-set leak scan run before
    // training (GPT-3 appendix C contract): corpus docs sharing >= 5
    // distinct shingles with a benchmark doc are contaminated. The
    // "benchmark" here is a deterministic slice of the corpus (doc_id
    // % 20 == 0), so the near-dup structure of the fixtures produces real
    // cross-doc hits; self-hits are excluded from the HITS view (a doc
    // trivially overlaps itself).
    "d13_decontaminate" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // the benchmark is a corpus slice: ONE materialized tokenization
        // serves both join sides (the oracle's bsh CTE has always been
        // derived from its sh CTE the same way)
        val sh = Dedup.shingles(docs).localCheckpoint()
        Dedup.decontaminationHitsShingled(sh,
            sh.filter(col("doc_id") % 20 === 0).toDF("bench_id", "sh"),
            minOverlap = 5)
          .filter(col("doc_id") =!= col("bench_id"))
      },
      Some(s"""WITH $ShinglesCte,
               bsh AS (SELECT doc_id AS bench_id, sh FROM sh
                       WHERE doc_id % 20 = 0)
               SELECT s.doc_id, b.bench_id, count(*) AS n_overlap
               FROM sh s JOIN bsh b ON s.sh = b.sh AND s.doc_id <> b.bench_id
               GROUP BY 1, 2
               HAVING count(*) >= 5"""),
      "benchmark decontamination: n-gram overlap hits vs an eval slice"),

    // Decontamination APPLIED: the surviving corpus. Benchmark members
    // self-match and are correctly dropped along with their near-dups.
    "d14_decontaminate_apply" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bench = docs.filter(col("doc_id") % 20 === 0)
        Dedup.decontaminate(docs, bench, minOverlap = 5).select("doc_id")
      },
      Some(s"""WITH $ShinglesCte,
               bsh AS (SELECT doc_id AS bench_id, sh FROM sh
                       WHERE doc_id % 20 = 0),
               hits AS (
                 SELECT s.doc_id FROM sh s JOIN bsh b ON s.sh = b.sh
                 GROUP BY s.doc_id, b.bench_id
                 HAVING count(*) >= 5)
               SELECT doc_id FROM documents
               WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM hits)"""),
      "decontamination applied: corpus docs clean of eval-set overlap"),

    // The PUBLISHED decontamination contract: ANY shared 13-gram flags the
    // doc (GPT-3 appendix C lineage uses wide n with overlap 1 — at 13
    // words a collision is essentially never coincidence). Exercises the
    // width-parameterized shingle path end-to-end against a matching
    // 13-gram oracle CTE.
    "d16_decontaminate_13gram" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // d16 sf1 constant (r6 verdict #3), two fixes: (a) the benchmark
        // is a corpus slice, so ONE materialized tokenization serves both
        // join sides (the oracle's bsh CTE always did); (b) the 13-gram is
        // md5-FINGERPRINTED before the distinct — at width 13 the raw
        // shingle is ~100 bytes and dominated every exchange/agg/join key
        // (measured ~20% of the probe wall). The oracle hashes the same
        // way, so counts replay exactly even under a hash collision.
        val sh = Dedup.hashedShinglesN(docs, 13).localCheckpoint()
        Dedup.decontaminationHitsShingled(sh,
            sh.filter(col("doc_id") % 20 === 0).toDF("bench_id", "sh"),
            minOverlap = 1)
          .filter(col("doc_id") =!= col("bench_id"))
      },
      Some(s"""WITH ${sqlShinglesCteN(13, "sh13")},
               sh13h AS (SELECT DISTINCT doc_id, md5(sh) AS sh FROM sh13),
               bsh AS (SELECT doc_id AS bench_id, sh FROM sh13h
                       WHERE doc_id % 20 = 0)
               SELECT s.doc_id, b.bench_id, count(*) AS n_overlap
               FROM sh13h s JOIN bsh b ON s.sh = b.sh AND s.doc_id <> b.bench_id
               GROUP BY 1, 2
               HAVING count(*) >= 1"""),
      "13-gram decontamination: the published eval-leak scan contract"),

    // The leak scan pointed the OTHER way (PaLM/GPT-4 contamination
    // tables): per EVAL doc, the fraction of its distinct shingles seen
    // anywhere in the (bench-excluded) training corpus — the graded
    // benchmark-dirtiness report behind published clean/dirty eval splits.
    "d20_bench_contamination" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sh = Dedup.shingles(docs).localCheckpoint()
        Dedup.benchContaminationReport(
          sh.filter(col("doc_id") % 20 =!= 0),
          sh.filter(col("doc_id") % 20 === 0).toDF("bench_id", "sh"),
          minFrac = 0.05)
      },
      Some(s"""WITH $ShinglesCte,
               bsh AS (SELECT doc_id AS bench_id, sh FROM sh
                       WHERE doc_id % 20 = 0),
               csh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 20 <> 0),
               j AS (SELECT b.bench_id, b.sh,
                            CASE WHEN c.sh IS NULL THEN 0 ELSE 1 END AS seen
                     FROM bsh b LEFT JOIN csh c ON b.sh = c.sh)
               SELECT bench_id,
                      CAST(count(*) AS BIGINT) AS n_shingles,
                      CAST(sum(seen) AS BIGINT) AS n_seen,
                      round(sum(seen)::DOUBLE / count(*), 4) AS frac_seen,
                      round(sum(seen)::DOUBLE / count(*), 4) >= 0.05 AS dirty
               FROM j GROUP BY 1"""),
      "benchmark dirtiness: per-eval-doc fraction of shingles seen in the corpus"),

    // Cross-source overlap matrix: distinct-shingle Jaccard + containment
    // per source pair — "are these two sources the same crawl?", the audit
    // run before mixture weights are set (high containment ⇒ independent
    // weights double-draw the same content). The pair expansion is an
    // in-group sorted-set walk over per-shingle SOURCE sets (bounded by
    // |sources|, skew-free by construction) — never a corpus self-join.
    "d22_source_overlap" -> QueryDef(
      (s, dir) => Dedup.sourceOverlap(t(s, dir, "documents")),
      Some(s"""WITH $ShinglesCte,
               ssh AS (SELECT DISTINCT d.source, s.sh
                       FROM sh s JOIN documents d USING (doc_id)
                       WHERE d.source IS NOT NULL),
               per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_sh
                       FROM ssh GROUP BY source),
               j AS (SELECT a.source AS source_a, b.source AS source_b,
                            CAST(count(*) AS BIGINT) AS n_both
                     FROM ssh a JOIN ssh b
                       ON a.sh = b.sh AND a.source < b.source
                     GROUP BY 1, 2)
               SELECT source_a, source_b, pa.n_sh AS n_a, pb.n_sh AS n_b,
                      n_both,
                      round(n_both::DOUBLE / (pa.n_sh + pb.n_sh - n_both), 4)
                        AS jaccard,
                      round(n_both::DOUBLE / least(pa.n_sh, pb.n_sh), 4)
                        AS containment
               FROM j
               JOIN per pa ON j.source_a = pa.source
               JOIN per pb ON j.source_b = pb.source"""),
      "cross-source shingle overlap: Jaccard + containment per source pair"),

    // Apply the dedup: documents surviving near-dup removal = every cluster
    // keeper plus every unpaired doc.
    "d7_dedup_apply" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = Dedup.minhashDedupPairs(docs, 0.5, maxBucket = Int.MaxValue)
          .select("doc_a", "doc_b")
        Dedup.dedupSurvivors(docs, Dedup.dupClusters(pairs))
      },
      Some(s"""WITH RECURSIVE $LshPairsCtes,
               edges AS (
                 SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
                 UNION ALL
                 SELECT doc_b, doc_a FROM lsh_pairs),
               reach(src, dst) AS (
                 SELECT src, dst FROM edges
                 UNION
                 SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
               clusters AS (
                 SELECT src AS doc_id, least(src, min(dst)) AS cluster
                 FROM reach GROUP BY src)
               SELECT doc_id FROM documents
               WHERE doc_id NOT IN
                 (SELECT doc_id FROM clusters WHERE doc_id <> cluster)"""),
      "documents surviving near-dup removal (keepers + unpaired)"),

    "d4_ngram_jaccard" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // Eager localCheckpoint: materialization barrier + no cache-entry
        // residue across invocations (see Dedup.minhashDedupPairs).
        val sh = Dedup.shingles(docs).localCheckpoint()
        Dedup.jaccard(Dedup.rareShingleCandidates(sh, maxDf = 5), sh)
          .filter(col("jac") >= 0.3)
      },
      Some(s"""WITH $ShinglesCte,
               rare AS (
                 SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
                 WHERE df BETWEEN 2 AND 5),
               pairs AS (
                 SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                 WHERE a.sh IN (SELECT sh FROM rare)),
               sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
               inter AS (
                 SELECT p.doc_a, p.doc_b, count(*) AS n_inter
                 FROM pairs p
                 JOIN sh sa ON sa.doc_id = p.doc_a
                 JOIN sh sb ON sb.doc_id = p.doc_b AND sb.sh = sa.sh
                 GROUP BY 1, 2)
               SELECT i.doc_a, i.doc_b,
                      round(CAST(n_inter AS DOUBLE) / (na.n + nb.n - n_inter), 4) AS jac
               FROM inter i
               JOIN sizes na ON na.doc_id = i.doc_a
               JOIN sizes nb ON nb.doc_id = i.doc_b
               WHERE round(CAST(n_inter AS DOUBLE) / (na.n + nb.n - n_inter), 4) >= 0.3"""),
      "exact n-gram Jaccard with rare-shingle candidate blocking"),

    // The asymmetric sibling d4 can't see: containment inter/min(|A|,|B|)
    // catches a short doc quoted whole inside a long one (Jaccard ->
    // |small|/|big| -> under any threshold). Same rare-shingle candidate
    // blocking, exact ppm integers.
    "d37_containment" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sh = Dedup.shingles(docs).localCheckpoint()
        Dedup.containmentPairs(
          Dedup.rareShingleCandidates(sh, maxDf = 5), sh)
          .filter(col("cont_ppm") >= 500000L)
      },
      Some(s"""WITH $ShinglesCte,
               rare AS (
                 SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
                 WHERE df BETWEEN 2 AND 5),
               pairs AS (
                 SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                 WHERE a.sh IN (SELECT sh FROM rare)),
               sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                         FROM sh GROUP BY doc_id),
               inter AS (
                 SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS n_inter
                 FROM pairs p
                 JOIN sh sa ON sa.doc_id = p.doc_a
                 JOIN sh sb ON sb.doc_id = p.doc_b AND sb.sh = sa.sh
                 GROUP BY 1, 2)
               SELECT i.doc_a, i.doc_b, na.n AS n_a, nb.n AS n_b, n_inter,
                      CAST((1000000 * n_inter) // least(na.n, nb.n)
                        AS BIGINT) AS cont_ppm
               FROM inter i
               JOIN sizes na ON na.doc_id = i.doc_a
               JOIN sizes nb ON nb.doc_id = i.doc_b
               WHERE (1000000 * n_inter) // least(na.n, nb.n) >= 500000"""),
      "shingle containment pairs (asymmetric quote/inclusion detection)"),

    // Doc-grain memorization-risk panel (Lee et al. 2022): the ppm of a
    // document's 13-grams unique to it. Low novelty = assembled from
    // corpus-repeated spans.
    "d38_novelty_panel" -> QueryDef(
      (s, dir) => Dedup.noveltyPanel(t(s, dir, "documents"), width = 13),
      Some(s"""WITH ${sqlShinglesCteN(13, "sh13")},
               df AS (SELECT sh, CAST(count(*) AS BIGINT) AS df
                      FROM sh13 GROUP BY sh),
               d AS (SELECT s.doc_id,
                            CAST(count(*) AS BIGINT) AS n_grams,
                            CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END)
                              AS BIGINT) AS n_shared
                     FROM sh13 s JOIN df ON df.sh = s.sh
                     GROUP BY s.doc_id)
               SELECT doc_id, n_grams, n_shared,
                      CAST((1000000 * (n_grams - n_shared)) // n_grams
                        AS BIGINT) AS novelty_ppm
               FROM d"""),
      "per-doc 13-gram novelty (memorization-risk panel)"),

    // Blocking-quality evaluation (Christen 2012): reduction ratio +
    // pairs completeness of d35's prefix-12 blocking against full
    // quadratic Damerau<=1 truth on the bounded 300-customer audit
    // slice (the d21 sample-bounded discipline: truth must be
    // enumerated to be truth).
    "d39_blocking_quality" -> QueryDef(
      (s, dir) => Dedup.blockingQuality(
        t(s, dir, "customer").filter(col("c_custkey") <= 300),
        "c_custkey", "c_name", blockPrefix = 12, maxDist = 1),
      Some("""WITH c AS (SELECT c_custkey AS id, c_name AS nm,
                                substr(c_name, 1, 12) AS blk
                         FROM customer WHERE c_custkey <= 300),
              n AS (SELECT CAST(count(*) AS BIGINT) AS n_records,
                           CAST(count(*) * (count(*) - 1) // 2 AS BIGINT)
                             AS total_pairs
                    FROM c),
              cd AS (SELECT CAST(coalesce(sum(bsz * (bsz - 1) // 2), 0)
                       AS BIGINT) AS cand_pairs
                     FROM (SELECT count(*) AS bsz FROM c GROUP BY blk)),
              tr AS (SELECT
                       CAST(coalesce(sum(CASE WHEN
                         damerau_levenshtein(a.nm, b.nm) <= 1
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS true_pairs,
                       CAST(coalesce(sum(CASE WHEN
                         damerau_levenshtein(a.nm, b.nm) <= 1
                         AND a.blk = b.blk THEN 1 ELSE 0 END), 0)
                         AS BIGINT) AS covered_pairs
                     FROM c a JOIN c b ON a.id < b.id)
              SELECT n_records, total_pairs, cand_pairs, true_pairs,
                     covered_pairs,
                     CAST(CASE WHEN total_pairs > 0 THEN
                       (1000000 * (total_pairs - cand_pairs)) // total_pairs
                       END AS BIGINT) AS reduction_ppm,
                     CAST(CASE WHEN true_pairs > 0 THEN
                       (1000000 * covered_pairs) // true_pairs END
                       AS BIGINT) AS completeness_ppm
              FROM n, cd, tr"""),
      "blocking quality: reduction ratio + pairs completeness vs truth"),

    "d5_simhash" -> QueryDef(
      (s, dir) => Dedup.simhash(t(s, dir, "documents")),
      Some(s"""WITH $SimhashCte
               SELECT doc_id, simhash FROM fp"""),
      "32-bit SimHash fingerprint per document"),

    // SimHash CONSUMED: near-dup pairs at Hamming <= 3. The Spark side finds
    // candidates through the lossless 4-band pigeonhole blocking (no
    // all-pairs join); the oracle is the brute-force all-pairs filter, so a
    // green hash also PROVES the blocking loses no pair at this radius.
    "d8_simhash_pairs" -> QueryDef(
      (s, dir) => Dedup.simhashPairs(t(s, dir, "documents")),
      Some(s"""WITH $SimhashCte
               SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
               FROM fp a JOIN fp b ON a.doc_id < b.doc_id
               WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""),
      "SimHash near-dup pairs via lossless band blocking (Hamming <= 3)"),

    // SimHash band-bucket distribution — d17's cap-tuning diagnostic for
    // the pigeonhole blocking: exact bucket-size summary + the candidate-
    // pair bound that ceilings d8's self-join cost. Measures whether a
    // corpus's fingerprint skew needs simhashPairs' maxBucket cap BEFORE
    // the join runs.
    "d19_simhash_bucket_stats" -> QueryDef(
      (s, dir) => Dedup.simhashBucketStats(t(s, dir, "documents")),
      Some(s"""WITH $SimhashCte,
               bands AS (SELECT doc_id, b.band,
                                (simhash >> (b.band * 8)) & 255 AS band_val
                         FROM fp, (SELECT unnest([0, 1, 2, 3]) AS band) b),
               sz AS (SELECT band, band_val, count(*) AS sz
                      FROM bands GROUP BY 1, 2)
               SELECT count(*) AS n_buckets,
                      CAST(sum(sz) AS BIGINT) AS n_rows,
                      CAST(max(sz) AS BIGINT) AS max_bucket,
                      CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
                        AS n_singleton,
                      CAST(sum(CASE WHEN sz > 100 THEN 1 ELSE 0 END) AS BIGINT)
                        AS n_over_cap,
                      CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS pair_bound
               FROM sz"""),
      "SimHash band-bucket distribution + candidate-pair bound (cap tuning)"),

    // ---- similarity search ----

    "n1_knn_brute" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.knnBrute(emb.filter(col("vec_id") < 10), emb, 5)
      },
      Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe
                          FROM embeddings WHERE vec_id < 10),
               c AS (SELECT vec_id AS n_id, embedding::DOUBLE[] AS ne FROM embeddings),
               scored AS (
                 SELECT q_id, n_id, ${sqlCos("qe", "ne")} AS sim
                 FROM q CROSS JOIN c WHERE q_id <> n_id),
               r AS (SELECT q_id, n_id, sim,
                            CAST(row_number() OVER (PARTITION BY q_id
                              ORDER BY sim DESC, n_id) AS INTEGER) AS rank
                     FROM scored)
               SELECT q_id, n_id, sim, rank FROM r WHERE rank <= 5"""),
      "brute-force cosine top-5 (exact ANN baseline)"),

    // k-NN-distance outliers (Ramaswamy et al. 2000): each vector's
    // 5th-neighbor cosine is its local-density proxy; the 20 lowest are
    // the outliers — the embedding-curation cut that drops garbage
    // vectors before codebook/prototype training. Compositional: the
    // gate runs the exact brute form, the scale form feeds any AnnIndex
    // search into knnOutliersFrom (the cut is a filter + TakeOrdered
    // over an already-k-bounded relation).
    "n23_knn_outlier" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Similarity.knnOutliers(t(s, dir, "embeddings"), k = 5, topN = 20)
      },
      Some(s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                          FROM embeddings),
               p AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
                            ${sqlCos("a.emb", "b.emb")} AS sim
                     FROM v a JOIN v b ON a.vec_id <> b.vec_id),
               r AS (SELECT q_id, n_id, sim,
                            row_number() OVER (PARTITION BY q_id
                              ORDER BY sim DESC, n_id) AS rk
                     FROM p)
               SELECT q_id AS vec_id, sim AS kth_sim FROM r
               WHERE rk = 5
               ORDER BY kth_sim ASC, vec_id ASC LIMIT 20"""),
      "k-NN-distance embedding outliers: 20 lowest 5th-neighbor cosines"),

    // Local Outlier Factor (Breunig et al., SIGMOD 2000): the density-
    // NORMALIZED outlier score — reach-distances are integer max's over
    // the 4-decimal distance grid, lrd micro-quantizes to BIGINT before
    // the neighbor sum, so the only double chain is one fixed-shape
    // (sum / lrd / n) expression both engines replay bit-for-bit.
    // Fixed-k neighbor sets (rank <= 5 under (sim DESC, id)); duplicate
    // pile-ups clamp the reach denominator to 1 instead of emitting inf.
    "n25_lof" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Similarity.lofOutliers(t(s, dir, "embeddings"), k = 5, topN = 20)
      },
      Some(s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                          FROM embeddings),
               p AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
                            ${sqlCos("a.emb", "b.emb")} AS sim
                     FROM v a JOIN v b ON a.vec_id <> b.vec_id),
               r AS MATERIALIZED (
                 SELECT q_id, n_id, sim,
                        row_number() OVER (PARTITION BY q_id
                          ORDER BY sim DESC, n_id) AS rk
                 FROM p),
               knn AS (SELECT q_id, n_id,
                              CAST(round((1.0e0 - sim) * 1e4, 0) AS BIGINT)
                                AS d_q
                       FROM r WHERE rk <= 5),
               kd AS (SELECT q_id AS id,
                             CAST(round((1.0e0 - sim) * 1e4, 0) AS BIGINT)
                               AS kdist_q
                      FROM r WHERE rk = 5),
               reach AS (SELECT k.q_id,
                                greatest(kd.kdist_q, k.d_q) AS reach_q
                         FROM knn k JOIN kd ON kd.id = k.n_id),
               lrd AS (SELECT q_id AS id,
                              CAST(count(*) AS BIGINT) AS n_nb,
                              CAST(floor((CAST(count(*) AS DOUBLE) * 1e12)
                                  / greatest(sum(reach_q), 1) + 0.5)
                                AS BIGINT) AS lrd_q
                       FROM reach GROUP BY q_id),
               sl AS (SELECT k.q_id,
                             CAST(sum(l.lrd_q) AS BIGINT) AS s_lrd,
                             CAST(count(*) AS BIGINT) AS n_nb
                      FROM knn k JOIN lrd l ON l.id = k.n_id
                      GROUP BY k.q_id)
               SELECT sl.q_id AS vec_id, kd.kdist_q, lp.lrd_q,
                      round(CAST(sl.s_lrd AS DOUBLE) / lp.lrd_q / sl.n_nb, 6)
                        AS lof
               FROM sl JOIN lrd lp ON lp.id = sl.q_id
                       JOIN kd ON kd.id = sl.q_id
               ORDER BY lof DESC, vec_id LIMIT 20"""),
      "Local Outlier Factor: density-normalized embedding outliers, top 20"),

    // Graph-based ANN (the NSW/HNSW search paradigm, flat deterministic
    // form): greedy beam walk over an exact kNN graph — entry points
    // (0, 1), 2 hops, beam 6, top-3. The oracle replays the graph build
    // AND every round of the walk (MATERIALIZED — each round references
    // its beam multiple times); both engines keep (sim DESC, id) beams,
    // so the walk is bit-identical round by round.
    "n24_nsw_search" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings").filter(col("vec_id") < 800)
        val qs = emb.filter(col("vec_id") < 5)
        val graphRel = graft.ext.Dedup.materialize(
          Similarity.knnBrute(emb, emb, 4).select("q_id", "n_id"))
        Similarity.nswSearch(qs, emb, graphRel, Seq(0L, 1L),
          k = 3, beam = 6, hops = 2)
      },
      Some {
        def beamCte(s: String, b: String, lim: Int): String =
          s"""$b AS MATERIALIZED (SELECT q_id, n_id, sim FROM (
                 SELECT q_id, n_id, sim,
                        row_number() OVER (PARTITION BY q_id
                          ORDER BY sim DESC, n_id) AS rk
                 FROM $s) WHERE rk <= $lim)"""
        def roundCtes(i: Int, prevBeam: String): String =
          s"""cand$i AS (SELECT DISTINCT q_id, n_id FROM (
                 SELECT b.q_id, g.dst AS n_id
                 FROM $prevBeam b JOIN g ON b.n_id = g.src
                 UNION ALL SELECT q_id, n_id FROM $prevBeam)),
              s$i AS (SELECT d.q_id, d.n_id,
                             ${sqlCos("q.qe", "c.ne")} AS sim
                      FROM cand$i d JOIN c ON c.n_id = d.n_id
                           JOIN q ON q.q_id = d.q_id
                      WHERE d.q_id <> d.n_id),
              ${beamCte(s"s$i", s"b$i", 6)}"""
        s"""WITH c AS MATERIALIZED (
                SELECT vec_id AS n_id, embedding::DOUBLE[] AS ne
                FROM embeddings WHERE vec_id < 800),
            q AS MATERIALIZED (
                SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe
                FROM embeddings WHERE vec_id < 5),
            gs AS MATERIALIZED (
                SELECT a.n_id AS src, b.n_id AS dst,
                       row_number() OVER (PARTITION BY a.n_id
                         ORDER BY ${sqlCos("a.ne", "b.ne")} DESC, b.n_id)
                         AS rk
                FROM c a JOIN c b ON a.n_id <> b.n_id),
            g AS MATERIALIZED (SELECT src, dst FROM gs WHERE rk <= 4),
            c0 AS (SELECT DISTINCT q_id, n_id FROM (
                   SELECT q.q_id, e.n_id
                   FROM q CROSS JOIN (VALUES (0), (1)) e(n_id)
                   UNION ALL
                   SELECT q.q_id, g.dst AS n_id
                   FROM q JOIN g ON g.src = q.q_id)),
            s0 AS (SELECT d0.q_id, d0.n_id,
                          ${sqlCos("q.qe", "c.ne")} AS sim
                   FROM c0 d0 JOIN c ON c.n_id = d0.n_id
                        JOIN q ON q.q_id = d0.q_id
                   WHERE d0.q_id <> d0.n_id),
            ${beamCte("s0", "b0", 6)},
            ${roundCtes(1, "b0")},
            ${roundCtes(2, "b1")}
            SELECT q_id, n_id, sim,
                   CAST(row_number() OVER (PARTITION BY q_id
                     ORDER BY sim DESC, n_id) AS INTEGER) AS rank
            FROM b2 QUALIFY rank <= 3"""
      },
      "graph-based ANN: NSW beam walk over an exact kNN graph"),

    "n2_knn_ivf" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.knnCell(emb.filter(col("vec_id") < 10), emb, "label", 3)
      },
      Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe, label
                          FROM embeddings WHERE vec_id < 10),
               c AS (SELECT vec_id AS n_id, embedding::DOUBLE[] AS ne, label FROM embeddings),
               scored AS (
                 SELECT q_id, n_id, ${sqlCos("qe", "ne")} AS sim
                 FROM q JOIN c USING (label) WHERE q_id <> n_id),
               r AS (SELECT q_id, n_id, sim,
                            CAST(row_number() OVER (PARTITION BY q_id
                              ORDER BY sim DESC, n_id) AS INTEGER) AS rank
                     FROM scored)
               SELECT q_id, n_id, sim, rank FROM r WHERE rank <= 3"""),
      "IVF-style cell-restricted cosine top-3"),

    // ANN from RAW embeddings end-to-end (round-2 verdict "next" #1): the
    // engine derives the coarse cells itself — 4 seeded random hyperplanes,
    // sign-bit bucket = cell — instead of reading a pre-assigned label
    // column. The oracle replays the identical plane weights (quantized to
    // exact 3-decimal literals) and the identical index-order double
    // arithmetic, so the derived cell ids — and hence the candidate sets and
    // ranks — match bit-for-bit.
    "n3_knn_rp" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.knnRp(emb.filter(col("vec_id") < 10), emb, 3,
          bits = RpBits, dim = RpDim, seed = RpSeed)
      },
      Some {
        val cell = sqlRpCell("embedding::DOUBLE[]",
          Similarity.rpPlanes(RpDim, RpBits, RpSeed))
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
                              $cell AS cell
                       FROM embeddings),
            q AS (SELECT vec_id AS q_id, emb AS qe, cell FROM e WHERE vec_id < 10),
            c AS (SELECT vec_id AS n_id, emb AS ne, cell FROM e),
            scored AS (
              SELECT q_id, n_id, ${sqlCos("qe", "ne")} AS sim
              FROM q JOIN c USING (cell) WHERE q_id <> n_id),
            r AS (SELECT q_id, n_id, sim,
                         CAST(row_number() OVER (PARTITION BY q_id
                           ORDER BY sim DESC, n_id) AS INTEGER) AS rank
                  FROM scored)
            SELECT q_id, n_id, sim, rank FROM r WHERE rank <= 3"""
      },
      "ANN with in-engine random-hyperplane cell derivation (no label column)"),

    // Multi-probe ANN: same derived cells as n3, but each query also probes
    // its 4 Hamming-1 neighbor cells (one sign flip each) — recall repair
    // for queries near a hyperplane, candidate cost bounded at 5 cells. The
    // oracle unnests the identical probe list.
    "n4_knn_multiprobe" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.knnRpMultiProbe(emb.filter(col("vec_id") < 10), emb, 3,
          bits = RpBits, dim = RpDim, seed = RpSeed)
      },
      Some {
        val cell = sqlRpCell("embedding::DOUBLE[]",
          Similarity.rpPlanes(RpDim, RpBits, RpSeed))
        val probes = (Seq("cell") ++ (0 until RpBits).map(p => s"xor(cell, ${1 << p})"))
          .mkString("[", ", ", "]")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
                              $cell AS cell
                       FROM embeddings),
            q AS (SELECT vec_id AS q_id, emb AS qe, cell FROM e WHERE vec_id < 10),
            qp AS (SELECT q_id, qe, unnest($probes) AS cell FROM q),
            c AS (SELECT vec_id AS n_id, emb AS ne, cell FROM e),
            scored AS (
              SELECT q_id, n_id, ${sqlCos("qe", "ne")} AS sim
              FROM qp JOIN c USING (cell) WHERE q_id <> n_id),
            r AS (SELECT q_id, n_id, sim,
                         CAST(row_number() OVER (PARTITION BY q_id
                           ORDER BY sim DESC, n_id) AS INTEGER) AS rank
                  FROM scored)
            SELECT q_id, n_id, sim, rank FROM r WHERE rank <= 3"""
      },
      "multi-probe ANN: derived cell + 4 Hamming-1 probes per query"),

    "e1_embed_dedup" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Similarity.cosineDedupPairs(t(s, dir, "embeddings"), "label", 0.4)
      },
      Some(s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                      ${sqlCos("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")} AS sim
               FROM embeddings a JOIN embeddings b
                 ON a.label = b.label AND a.vec_id < b.vec_id
               WHERE ${sqlCos("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")} >= 0.4"""),
      "embedding-cosine near-dup pairs (cell-blocked)"),

    // Principal component by exact fixed-point power iteration (the
    // PageRank treatment applied to PCA): 3 iterations from the all-ones
    // direction, each one corpus pass (per-doc dot + dim-grain weighted
    // sum), renormalized to max|v| = 1e6 in 128-bit integer arithmetic
    // (BigInt / HUGEINT, both truncating toward zero) — the whole
    // trajectory replays bit-for-bit in the oracle's unrolled CTEs. No
    // dim x dim covariance is ever materialized.
    "e11_pca_power" -> QueryDef(
      (s, dir) => graft.ext.Spectral.pcaPower(t(s, dir, "embeddings")),
      Some(s"""WITH $PcaCtes
               SELECT CAST(pos AS INTEGER) AS pos, v FROM v3"""),
      "principal component via exact fixed-point power iteration"),

    // The corpus projected onto the e11 direction: per-vector micro-grid
    // coordinate (xq . v) div 1e6 — the 1-D axis drift monitors and
    // binning stages key on. The projection itself is a narrow codegen'd
    // map (corpus-safe at any n); the direction re-derives through the
    // same exact trajectory.
    "e12_pca_project" -> QueryDef(
      (s, dir) => graft.ext.Spectral.pcaProject(t(s, dir, "embeddings")),
      Some(s"""WITH $PcaCtes
               SELECT x.vec_id,
                      CAST(sum(x.xq * v.v) AS BIGINT) // 1000000 AS proj_q
               FROM xq x JOIN v3 v USING (pos)
               GROUP BY x.vec_id"""),
      "corpus projection onto the power-iteration principal axis"),

    // Embedding-drop drift monitor: train the principal axis on the
    // REFERENCE slice only, project BOTH slices with that frozen
    // direction, PSI over the 1-D projection histogram — "is the new
    // embedding drop distributed like the last one?" closed from three
    // already-gated components (e11 direction, e12 projection, dq4 PSI)
    // so no arithmetic is new; the oracle replays the whole composition.
    "e16_embedding_drift" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val ref = emb.filter(col("label") % 2 === 0)
        val cur = emb.filter(col("label") % 2 =!= 0)
        val width = 1000000L
        // train ONCE on the reference slice; both projections share the
        // held axis (re-training per slice doubles the 3-pass cost)
        val v = graft.ext.Spectral.pcaPowerDirection(ref)
        graft.ext.Profile.psiFromBuckets(
          graft.ext.Profile.bucketCounts(
            graft.ext.Spectral.pcaProjectWith(ref, v),
            "proj_q", width).toDF("bucket", "n_ref"),
          graft.ext.Profile.bucketCounts(
            graft.ext.Spectral.pcaProjectWith(cur, v),
            "proj_q", width).toDF("bucket", "n_cur"))
      },
      Some(s"""WITH ${pcaCtesWhere("label % 2 = 0")},
               xqa AS (SELECT vec_id, CAST(pos - 1 AS INTEGER) AS pos,
                              CAST(floor(x * 1000000 + 0.5) AS BIGINT)
                                AS xq
                       FROM (SELECT vec_id,
                                    unnest(embedding::DOUBLE[]) AS x,
                                    generate_subscripts(embedding, 1)
                                      AS pos
                             FROM embeddings)),
               pra AS (SELECT x.vec_id,
                              CAST(sum(x.xq * v.v) AS BIGINT) // 1000000
                                AS proj_q
                       FROM xqa x JOIN v3 v USING (pos)
                       GROUP BY x.vec_id),
               pr AS (SELECT p.proj_q FROM pra p
                      JOIN embeddings e ON e.vec_id = p.vec_id
                      WHERE e.label % 2 = 0),
               pc AS (SELECT p.proj_q FROM pra p
                      JOIN embeddings e ON e.vec_id = p.vec_id
                      WHERE e.label % 2 = 1),
               rb AS (SELECT CAST(floor(CAST(proj_q AS DOUBLE) / 1000000)
                               AS BIGINT) AS bucket,
                             CAST(count(*) AS BIGINT) AS n_ref
                      FROM pr GROUP BY 1),
               cb AS (SELECT CAST(floor(CAST(proj_q AS DOUBLE) / 1000000)
                               AS BIGINT) AS bucket,
                             CAST(count(*) AS BIGINT) AS n_cur
                      FROM pc GROUP BY 1),
               j AS (SELECT coalesce(rb.bucket, cb.bucket) AS bucket,
                            CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
                            CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur
                     FROM rb FULL OUTER JOIN cb
                       ON rb.bucket = cb.bucket),
               tt AS (SELECT CAST(sum(n_ref) AS BIGINT) AS nr,
                             CAST(sum(n_cur) AS BIGINT) AS nc,
                             CAST(count(*) AS BIGINT) AS b FROM j),
               pq AS (SELECT bucket, n_ref, n_cur,
                             CAST(n_ref + 1 AS DOUBLE)
                               / CAST(nr + b AS DOUBLE) AS p,
                             CAST(n_cur + 1 AS DOUBLE)
                               / CAST(nc + b AS DOUBLE) AS q
                      FROM j CROSS JOIN tt)
               SELECT bucket, n_ref, n_cur,
                      CAST(floor((p - q) * ln(p / q) * 1e6 + 0.5)
                        AS BIGINT) AS psi_micro,
                      round(CAST(floor((p - q) * ln(p / q) * 1e6 + 0.5)
                        AS BIGINT) / 1e6, 6) AS psi
               FROM pq"""),
      "embedding-drop drift: PSI over a frozen-axis 1-D projection"),

    // Per-dimension whitening statistics (Spectral.standardize's
    // parameters): exact-integer mean + correctly-rounded integer std per
    // dimension — the variance numerator n·Σx²−(Σx)² is an exact BIGINT
    // and the one integer division lands it back under 2^53 before the
    // IEEE sqrt, so both engines round identically.
    "e13_dim_stats" -> QueryDef(
      (s, dir) => graft.ext.Spectral.dimStats(t(s, dir, "embeddings")),
      Some("""WITH xq AS (
                SELECT vec_id, CAST(pos - 1 AS INTEGER) AS pos,
                       CAST(floor(x * 1000000 + 0.5) AS BIGINT) AS xq
                FROM (SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
                             generate_subscripts(embedding, 1) AS pos
                      FROM embeddings)),
              st AS (SELECT pos, CAST(count(*) AS BIGINT) AS n,
                            CAST(sum(xq) AS BIGINT) AS s,
                            CAST(sum(xq * xq) AS BIGINT) AS ss
                     FROM xq GROUP BY pos)
              SELECT pos, n, s // n AS mean_q,
                     CAST(floor(sqrt(CAST((n * ss - s * s) // (n * n)
                       AS DOUBLE)) + 0.5) AS BIGINT) AS std_q
              FROM st"""),
      "per-dimension embedding whitening stats (exact mean, rounded std)"),

    // Exact normal-equations ridge probe (e14) + train-on-sample /
    // score-everything split (e15): the oracle unrolls the SAME Leibniz
    // determinant expansions in HUGEINT that the engine sums in BigInt —
    // closed-form training replayed exactly, no float drift anywhere.
    "e14_linear_probe" -> QueryDef(
      (s, dir) => graft.ext.Spectral.linearProbe(
        Sampling.hashSample(t(s, dir, "embeddings"), "vec_id", 10)),
      Some(s"""WITH ${probeDetsSql}
               SELECT * FROM (
                 SELECT CAST(0 AS INTEGER) AS feature,
                        CAST(n0 AS VARCHAR) AS w_num,
                        CAST(den AS VARCHAR) AS w_den FROM dets
                 UNION ALL SELECT CAST(1 AS INTEGER), CAST(n1 AS VARCHAR),
                        CAST(den AS VARCHAR) FROM dets
                 UNION ALL SELECT CAST(2 AS INTEGER), CAST(n2 AS VARCHAR),
                        CAST(den AS VARCHAR) FROM dets
                 UNION ALL SELECT CAST(3 AS INTEGER), CAST(n3 AS VARCHAR),
                        CAST(den AS VARCHAR) FROM dets)"""),
      "exact ridge probe: Cramer/Leibniz weights as integer rationals"),

    "e15_probe_scores" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val probe = graft.ext.Spectral.linearProbe(
          Sampling.hashSample(emb, "vec_id", 10))
        graft.ext.Spectral.linearProbeScores(emb,
          graft.ext.Spectral.probeWeightsMicro(probe), 20)
      },
      Some {
        def wExpr(n: String): String =
          s"""CASE WHEN $n < 0
                THEN -(((-($n)) * 2000000 + den) // (2 * den))
                ELSE (($n) * 2000000 + den) // (2 * den) END"""
        s"""WITH ${probeDetsSql},
            w AS (SELECT ${wExpr("n0")} AS w0, ${wExpr("n1")} AS w1,
                         ${wExpr("n2")} AS w2, ${wExpr("n3")} AS w3
                  FROM dets),
            sc AS (SELECT e.vec_id,
                          w.w0 * CAST(floor(CAST(e.embedding[1] AS DOUBLE)
                            * 100 + 0.5) AS BIGINT) +
                          w.w1 * CAST(floor(CAST(e.embedding[2] AS DOUBLE)
                            * 100 + 0.5) AS BIGINT) +
                          w.w2 * CAST(floor(CAST(e.embedding[3] AS DOUBLE)
                            * 100 + 0.5) AS BIGINT) +
                          w.w3 AS score
                   FROM embeddings e CROSS JOIN w)
            SELECT vec_id, CAST(score AS BIGINT) AS score_cmicro
            FROM sc ORDER BY score DESC, vec_id LIMIT 20"""
      },
      "probe scoring: micro-grid weights over the full corpus, top-20"),

    // Cross-label semantic overlap matrix (d22's embedding-space sibling):
    // per label pair, >= 0.3-cosine pairs crossing the boundary + covered
    // vectors per side. Blocking is rp sign cells (label-independent -
    // cross-label pairs are the point); sampled-quadratic diagnostic at
    // scale, exact at gate scale.
    "e10_label_overlap" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Similarity.labelOverlap(t(s, dir, "embeddings"), minCos = 0.3,
          bits = RpBits, dim = RpDim, seed = RpSeed)
      },
      Some {
        val cell = sqlRpCell("embedding::DOUBLE[]",
          Similarity.rpPlanes(RpDim, RpBits, RpSeed))
        s"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb,
                              CAST($cell AS INTEGER) AS cell
                       FROM embeddings WHERE label IS NOT NULL),
            per AS (SELECT label, CAST(count(DISTINCT vec_id) AS BIGINT) AS n
                    FROM v GROUP BY label),
            p AS (SELECT a.label AS label_a, b.label AS label_b,
                         a.vec_id AS id_a, b.vec_id AS id_b
                  FROM v a JOIN v b
                    ON a.cell = b.cell AND a.label < b.label
                  WHERE ${sqlCos("a.emb", "b.emb")} >= 0.3),
            g AS (SELECT label_a, label_b,
                         CAST(count(*) AS BIGINT) AS n_pairs,
                         CAST(count(DISTINCT id_a) AS BIGINT) AS covered_a,
                         CAST(count(DISTINCT id_b) AS BIGINT) AS covered_b
                  FROM p GROUP BY 1, 2)
            SELECT label_a, label_b, pa.n AS n_a, pb.n AS n_b,
                   n_pairs, covered_a, covered_b,
                   round(greatest(covered_a::DOUBLE / pa.n,
                                  covered_b::DOUBLE / pb.n), 4)
                     AS containment
            FROM g
            JOIN per pa ON g.label_a = pa.label
            JOIN per pb ON g.label_b = pb.label"""
      },
      "cross-label semantic overlap: rp-cell-blocked cosine containment matrix"),

    // DBSCAN density clustering over the embedding corpus: ε = 0.3
    // round-4 cosine, minPts = 5. The cluster-count-free companion to
    // e4's threshold components — cores need DENSITY (≥ 4 neighbors),
    // so chains of sparse one-off matches stay noise instead of
    // daisy-chaining clusters together. Oracle replays neighbor
    // enumeration, degree cut, recursive-CTE components over core-core
    // edges (the d6 pattern), and the min-cluster border adoption.
    "e17_dbscan" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Similarity.dbscan(t(s, dir, "embeddings"), simEps = 0.3,
          minPts = 5)
      },
      Some("""WITH RECURSIVE
              v AS (SELECT vec_id, embedding::DOUBLE[] AS e
                    FROM embeddings),
              nb AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id
                     FROM v a, v b
                     WHERE a.vec_id <> b.vec_id
                       AND list_dot_product(a.e, a.e) > 0
                       AND list_dot_product(b.e, b.e) > 0
                       AND round(list_dot_product(a.e, b.e)
                             / (sqrt(list_dot_product(a.e, a.e))
                                * sqrt(list_dot_product(b.e, b.e))), 4)
                           >= 0.3),
              dg AS (SELECT a_id AS vec_id,
                            CAST(count(*) AS BIGINT) AS deg
                     FROM nb GROUP BY 1),
              co AS (SELECT vec_id FROM dg WHERE deg >= 4),
              ce AS (SELECT n.a_id AS src, n.b_id AS dst
                     FROM nb n
                     JOIN co x ON x.vec_id = n.a_id
                     JOIN co y ON y.vec_id = n.b_id),
              reach(src, dst) AS (
                SELECT src, dst FROM ce
                UNION
                SELECT r.src, e.dst FROM reach r JOIN ce e
                  ON r.dst = e.src),
              comp AS (SELECT src AS vec_id,
                              least(src, min(dst)) AS cluster
                       FROM reach GROUP BY src),
              cc AS (SELECT co.vec_id,
                            coalesce(comp.cluster, co.vec_id) AS cluster
                     FROM co LEFT JOIN comp ON comp.vec_id = co.vec_id),
              bc AS (SELECT n.a_id AS vec_id, min(cc.cluster) AS bcl
                     FROM nb n JOIN cc ON cc.vec_id = n.b_id
                     GROUP BY 1)
              SELECT v.vec_id,
                     CASE WHEN cc.cluster IS NOT NULL THEN 'core'
                          WHEN bc.bcl IS NOT NULL THEN 'border'
                          ELSE 'noise' END AS role,
                     coalesce(cc.cluster, bc.bcl) AS cluster
              FROM v
              LEFT JOIN cc ON cc.vec_id = v.vec_id
              LEFT JOIN bc ON bc.vec_id = v.vec_id"""),
      "DBSCAN over embeddings: density cores, border adoption, noise"),

    // Semantic dedup END-TO-END (SemDeDup pipeline shape): the cosine
    // near-dup pairs over embedding space feed the SAME star-rounds
    // connected components as the text path — every vector transitively
    // linked at >= 0.4 cosine collapses to its min-id cluster keeper.
    // Cost: e1's cell-blocked pair scan + O(log² n) two-join rounds.
    "e4_embed_clusters" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val pairs = Similarity
          .cosineDedupPairs(t(s, dir, "embeddings"), "label", 0.4)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
        Dedup.dupClusters(pairs)
          .select(col("doc_id").as("vec_id"), col("cluster"))
      },
      Some(s"""WITH RECURSIVE cpairs AS (
                 SELECT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM embeddings a JOIN embeddings b
                   ON a.label = b.label AND a.vec_id < b.vec_id
                 WHERE ${sqlCos("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")} >= 0.4),
               edges AS (
                 SELECT id_a AS src, id_b AS dst FROM cpairs
                 UNION ALL
                 SELECT id_b, id_a FROM cpairs),
               reach(src, dst) AS (
                 SELECT src, dst FROM edges
                 UNION
                 SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
               SELECT src AS vec_id, least(src, min(dst)) AS cluster
               FROM reach GROUP BY src"""),
      "semantic dedup: cosine pairs into connected-component keepers"),

    // Recall@3 of the derived-cell ANN (n3 path) against the exact brute
    // force (n1 path) — the governing ANN quality metric, shipped as an
    // operator. Deterministic: both sides replay in the oracle.
    "n5_knn_recall" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 10)
        Similarity.recallAtK(
          Similarity.knnRp(q, emb, 3, bits = RpBits, dim = RpDim, seed = RpSeed),
          Similarity.knnBrute(q, emb, 3), 3)
      },
      Some {
        val cell = sqlRpCell("embedding::DOUBLE[]",
          Similarity.rpPlanes(RpDim, RpBits, RpSeed))
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
                              $cell AS cell
                       FROM embeddings),
            q AS (SELECT vec_id AS q_id, emb AS qe, cell FROM e WHERE vec_id < 10),
            c AS (SELECT vec_id AS n_id, emb AS ne, cell FROM e),
            exact AS (
              SELECT q_id, n_id FROM (
                SELECT q_id, n_id,
                       row_number() OVER (PARTITION BY q_id
                         ORDER BY ${sqlCos("qe", "ne")} DESC, n_id) AS rank
                FROM q JOIN c ON q_id <> n_id)
              WHERE rank <= 3),
            approx AS (
              SELECT q_id, n_id FROM (
                SELECT q_id, n_id,
                       row_number() OVER (PARTITION BY q_id
                         ORDER BY ${sqlCos("qe", "ne")} DESC, n_id) AS rank
                FROM q JOIN c USING (cell) WHERE q_id <> n_id)
              WHERE rank <= 3),
            hits AS (
              SELECT e.q_id, count(*) AS n_hits
              FROM exact e JOIN approx a ON e.q_id = a.q_id AND e.n_id = a.n_id
              GROUP BY e.q_id)
            SELECT q.q_id,
                   coalesce(h.n_hits, 0) AS n_hits,
                   round(coalesce(h.n_hits, 0) / 3.0, 4) AS recall
            FROM (SELECT DISTINCT q_id FROM exact) q
            LEFT JOIN hits h USING (q_id)"""
      },
      "recall@3 of derived-cell ANN vs exact brute force"),

    // Int8 quantization summary per vector: the gate compares scalar
    // aggregates of the quantized array (sum/min/max + micro-scaled scale)
    // rather than the array itself — array stringification differs between
    // engines, the scalars don't, and together they pin every element's
    // contribution.
    "e2_embed_quantize" -> QueryDef(
      (s, dir) => Similarity.quantizeInt8(t(s, dir, "embeddings"))
        .select(col("vec_id"),
          floor(col("scale") * 1e6 + 0.5).cast("long").as("scale_micro"),
          aggregate(col("q"), lit(0L), (a, v) => a + v).as("q_sum"),
          array_min(col("q")).as("q_min"),
          array_max(col("q")).as("q_max")),
      Some("""WITH s AS (
                SELECT vec_id, embedding::DOUBLE[] AS e,
                       list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS scale
                FROM embeddings),
              q AS (
                SELECT vec_id, scale,
                       list_transform(e, x -> CAST(floor(x / scale * 127 + 0.5) AS INTEGER)) AS q
                FROM s)
              SELECT vec_id,
                     CAST(floor(scale * 1000000 + 0.5) AS BIGINT) AS scale_micro,
                     CAST(list_sum(q) AS BIGINT) AS q_sum,
                     CAST(list_min(q) AS INTEGER) AS q_min,
                     CAST(list_max(q) AS INTEGER) AS q_max
              FROM q"""),
      "symmetric int8 embedding quantization (floor-based, engine-exact)"),

    // Dequantization error audit: per vector, the max absolute element
    // error of the int8 round trip (q/127·scale vs the original) — the
    // number that justifies shipping int8 embeddings. Every step is
    // deterministic IEEE arithmetic on both engines (float→double exact,
    // one divide + one multiply per element, max is order-independent), so
    // the error itself gates exactly, not just a tolerance bit.
    "e3_dequant_error" -> QueryDef(
      (s, dir) => Similarity.quantizeInt8(t(s, dir, "embeddings"))
        .join(t(s, dir, "embeddings"), "vec_id")
        .select(col("vec_id"),
          round(aggregate(
            zip_with(col("embedding"), col("q"), (x, qv) =>
              abs(x.cast("double") - qv.cast("double") / 127.0 * col("scale"))),
            lit(0.0d), (acc, e) => greatest(acc, e)), 9).as("max_err")),
      Some("""WITH s AS (
                SELECT vec_id, embedding::DOUBLE[] AS e,
                       list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS scale
                FROM embeddings),
              q8 AS (
                SELECT vec_id, e, scale,
                       list_transform(e, x -> CASE WHEN scale = 0 THEN 0
                         ELSE floor(x / scale * 127 + 0.5) END) AS q
                FROM s)
              SELECT vec_id,
                     round(list_max(list_transform(
                       range(1, len(e) + 1),
                       i -> abs(e[i] - q[i] / 127.0 * scale))), 9) AS max_err
              FROM q8"""),
      "int8 round-trip max element error per vector (exact IEEE replay)"),

    // Per-cell centroids over the derived rp cells — the M-step of Lloyd's
    // k-means (rpCell is the E-step), i.e. the in-engine IVF codebook
    // trainer. Element values are micro-quantized to exact BIGINT sums so
    // the mean is independent of summation order AND DuckDB-replayable; the
    // aggregate relation is cells × dim rows — tiny at any corpus scale.
    "n6_cell_centroids" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Similarity.cellCentroids(t(s, dir, "embeddings"),
          bits = RpBits, dim = RpDim, seed = RpSeed)
      },
      Some {
        val cell = sqlRpCell("embedding::DOUBLE[]",
          Similarity.rpPlanes(RpDim, RpBits, RpSeed))
        s"""WITH e AS (SELECT CAST($cell AS INTEGER) AS cell,
                              embedding::DOUBLE[] AS emb
                       FROM embeddings),
            x AS (SELECT cell,
                         unnest([{'pos': i - 1, 'v': emb[i]}
                                 for i in generate_series(1, len(emb))]) AS u
                  FROM e),
            q AS (SELECT cell, CAST(u.pos AS INTEGER) AS pos,
                         CAST(floor(u.v * 1e6 + 0.5) AS BIGINT) AS vq
                  FROM x),
            g AS (SELECT cell, pos, count(*) AS n,
                         CAST(sum(vq) AS BIGINT) AS s
                  FROM q GROUP BY 1, 2)
            SELECT cell, pos, n, s, CAST(s AS DOUBLE) / 1e6 / n AS c
            FROM g"""
      },
      "per-cell embedding centroids (k-means M-step over derived cells)"),

    // Trained-IVF ANN: one full Lloyd iteration in-engine — rp sign buckets
    // seed the assignment, n6's centroids become the codebook (snapped to
    // the integer-micro grid), and every vector re-assigns to its nearest
    // centroid by EXACT integer squared distance (no order-dependent double
    // summation ⇒ the assignment replays bit-for-bit in DuckDB, ties to the
    // smaller cell id in both engines). Search then restricts to the
    // TRAINED cell — the way a real IVF index is built, closing n2's
    // "cells are given, not derived" caveat end to end.
    "n7_knn_ivf_trained" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.knnIvfTrained(emb.filter(col("vec_id") < 10), emb, 3,
          bits = RpBits, dim = RpDim, seed = RpSeed)
      },
      Some {
        val cell = sqlRpCell("embedding::DOUBLE[]",
          Similarity.rpPlanes(RpDim, RpBits, RpSeed))
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
                              CAST($cell AS INTEGER) AS cell
                       FROM embeddings),
            x AS (SELECT cell,
                         unnest([{'pos': i - 1, 'v': emb[i]}
                                 for i in generate_series(1, len(emb))]) AS u
                  FROM e),
            g AS (SELECT cell, CAST(u.pos AS INTEGER) AS pos, count(*) AS n,
                         CAST(sum(CAST(floor(u.v * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s
                  FROM x GROUP BY 1, 2),
            cb AS (SELECT cell,
                          list(CAST(floor(s / n + 0.5) AS BIGINT)::DOUBLE ORDER BY pos) AS cq
                   FROM g GROUP BY cell),
            v AS (SELECT vec_id, emb,
                         list_transform(emb, x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT)::DOUBLE) AS vq
                  FROM e),
            d AS (SELECT v.vec_id, v.emb, cb.cell,
                         list_dot_product(v.vq, v.vq)
                           - 2 * list_dot_product(v.vq, cb.cq)
                           + list_dot_product(cb.cq, cb.cq) AS dist
                  FROM v CROSS JOIN cb),
            asg AS (SELECT vec_id, emb, cell FROM (
                      SELECT vec_id, emb, cell,
                             row_number() OVER (PARTITION BY vec_id
                               ORDER BY dist, cell) AS rn
                      FROM d) WHERE rn = 1),
            q AS (SELECT vec_id AS q_id, emb AS qe, cell FROM asg WHERE vec_id < 10),
            c AS (SELECT vec_id AS n_id, emb AS ne, cell FROM asg),
            scored AS (
              SELECT q_id, n_id, ${sqlCos("qe", "ne")} AS sim
              FROM q JOIN c USING (cell) WHERE q_id <> n_id),
            r AS (SELECT q_id, n_id, sim,
                         CAST(row_number() OVER (PARTITION BY q_id
                           ORDER BY sim DESC, n_id) AS INTEGER) AS rank
                  FROM scored)
            SELECT q_id, n_id, sim, rank FROM r WHERE rank <= 3"""
      },
      "trained-IVF ANN: one Lloyd round, exact-integer E-step, trained-cell search"),

    // IVF training diagnostics: per trained cell, member count + exact
    // integer inertia after the n7 Lloyd round — cell balance bounds probe
    // cost, inertia tracks codebook fit. Shares n7's CTE chain up to the
    // assignment; the gate is exact because distances are integers.
    "n8_ivf_stats" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Similarity.ivfStats(t(s, dir, "embeddings"),
          bits = RpBits, dim = RpDim, seed = RpSeed)
      },
      Some {
        s"""WITH ${sqlAsg1Ctes("embeddings")}
            SELECT cell, count(*) AS n,
                   CAST(sum(CAST(dist AS BIGINT)) AS BIGINT) AS inertia_q
            FROM asg GROUP BY cell"""
      },
      "per-cell member count + exact inertia after the Lloyd round"),

    // SSL-prototypes diversification pruning (Sorscher et al. 2022; the
    // non-dedup half of D4, Tirumala et al. 2023): per trained cell, drop
    // the vectors nearest their centroid — the redundant prototypical
    // mass — keeping the diverse tail. Threshold = the cell's dropFrac
    // histogram quantile over EXACT integer distances, boundary ties
    // dropping together: rank-free (members are never sorted; only the
    // per-cell distance histogram takes a running sum), deterministic,
    // and replayed bit-for-bit by the oracle.
    "e5_proto_prune" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Similarity.protoPrune(t(s, dir, "embeddings"), dropFrac = 0.25,
          bits = RpBits, dim = RpDim, seed = RpSeed)
      },
      Some(sqlProtoPruneSql(s"WITH ${sqlAsg1Ctes("embeddings")}", 0.25)),
      "SSL-prototypes pruning: drop the near-centroid quantile per trained cell"),

    // The full D4 pipeline (Tirumala et al. 2023): SemDeDup first (e4's
    // cosine components, non-keepers dropped), then SSL-prototypes pruning
    // RETRAINED on the survivor set — dedup changes the density the
    // k-means codebook sees, so D4 retrains after removal rather than
    // reusing the pre-dedup centroids. Composes two gated pieces; the
    // oracle replays CC via recursive SQL and the whole retrain+prune
    // chain over the survivors.
    "e6_d4_diversify" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        val pairs = Similarity.cosineDedupPairs(emb, "label", 0.4)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
        val dropped = Dedup.dupClusters(pairs)
          .filter(col("doc_id") =!= col("cluster"))
          .select(col("doc_id").as("vec_id"))
        val survivors = emb.join(dropped, Seq("vec_id"), "left_anti")
        Similarity.protoPrune(survivors, dropFrac = 0.25,
          bits = RpBits, dim = RpDim, seed = RpSeed)
      },
      Some {
        val prefix =
          s"""WITH RECURSIVE cpairs AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b
                FROM embeddings a JOIN embeddings b
                  ON a.label = b.label AND a.vec_id < b.vec_id
                WHERE ${sqlCos("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")} >= 0.4),
              edges AS (
                SELECT id_a AS src, id_b AS dst FROM cpairs
                UNION ALL
                SELECT id_b, id_a FROM cpairs),
              reach(src, dst) AS (
                SELECT src, dst FROM edges
                UNION
                SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
              clus AS (SELECT src AS vec_id, least(src, min(dst)) AS cluster
                       FROM reach GROUP BY src),
              surv AS (SELECT em.vec_id, em.embedding
                       FROM embeddings em LEFT JOIN clus
                         ON em.vec_id = clus.vec_id
                       WHERE clus.vec_id IS NULL OR clus.vec_id = clus.cluster),
              ${sqlAsg1Ctes("surv")}"""
        sqlProtoPruneSql(prefix, 0.25)
      },
      "D4: SemDeDup keepers, then SSL-prototypes pruning retrained on survivors"),

    // Semantic decontamination (embedding-space eval-leak scan): d13's
    // contract pointed at paraphrase leakage the n-gram scans can't see —
    // a corpus vector within cosine 0.3 of any eval vector (here the
    // vec_id < 10 slice) is contaminated. Cell-blocked like e1; the eval
    // side broadcasts. e7 = the hits report, e8 = the applied survivor set
    // (the d13/d14 split).
    "e7_embed_decon_hits" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.embedDecontaminationHits(
          emb.filter(col("vec_id") >= 10), emb.filter(col("vec_id") < 10),
          minCos = 0.3, cellCol = "label")
      },
      Some(s"""WITH ev AS (SELECT label, embedding::DOUBLE[] AS e_emb
                           FROM embeddings WHERE vec_id < 10),
               c AS (SELECT vec_id, label, embedding::DOUBLE[] AS c_emb
                     FROM embeddings WHERE vec_id >= 10),
               hits AS (SELECT c.vec_id,
                               ${sqlCos("c.c_emb", "ev.e_emb")} AS sim
                        FROM c JOIN ev USING (label)
                        WHERE ${sqlCos("c.c_emb", "ev.e_emb")} >= 0.3)
               SELECT vec_id, CAST(count(*) AS BIGINT) AS n_hits,
                      max(sim) AS max_sim
               FROM hits GROUP BY vec_id"""),
      "embedding-space decontamination hits: cosine match vs the eval slice"),

    "e8_embed_decon_apply" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.embedDecontaminate(
          emb.filter(col("vec_id") >= 10), emb.filter(col("vec_id") < 10),
          minCos = 0.3, cellCol = "label")
          .select("vec_id", "label")
      },
      Some(s"""WITH ev AS (SELECT label, embedding::DOUBLE[] AS e_emb
                           FROM embeddings WHERE vec_id < 10),
               c AS (SELECT vec_id, label, embedding::DOUBLE[] AS c_emb
                     FROM embeddings WHERE vec_id >= 10),
               hits AS (SELECT DISTINCT c.vec_id
                        FROM c JOIN ev USING (label)
                        WHERE ${sqlCos("c.c_emb", "ev.e_emb")} >= 0.3)
               SELECT vec_id, label FROM c
               WHERE vec_id NOT IN (SELECT vec_id FROM hits)"""),
      "embedding-space decontamination applied: surviving corpus vectors"),

    // ADC reconstruction (dequantization) error per vector under the n10
    // PQ codebooks — the quantization-drift statistic AnnIndex.driftLog
    // records per append batch (r6 verdict #2): rising means the frozen
    // no-retrain codebooks stopped fitting the data and the index needs a
    // rebuild. Exact integer micro-grid distances end-to-end, so the
    // oracle replays the error itself, not a tolerance band.
    "e9_adc_self_error" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.adcSelfError(emb,
          Similarity.pqCodebooks(emb, m = PqM, subDim = PqSubDim,
            bits = PqBits, seed = PqSeed), PqSubDim)
      },
      // LUT-free assembly: the SELF-error pairing is 1:1 by vec_id, so the
      // per-subspace distances join v{i}/cb{i} directly instead of going
      // through the n11-style (q_id, cell) LUT relations — with every
      // vector as a query, DuckDB's optimizer never finishes planning the
      // inlined q×LUT five-way join (observed: >45 min and 90 GB at a
      // 500-vector sf0.01 before this rewrite; this form replays in ~10 s).
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                          FROM embeddings),
               ${PqSubspaceCtes},
               ${PqEncCte}
               SELECT enc.vec_id, ${PqSelfAdcDist} AS adc_err
               FROM enc ${PqSelfAdcJoins}"""),
      "per-vector ADC reconstruction error: the index-drift statistic"),

    // Round-2 Lloyd diagnostics: the engine re-assigns with the round-1
    // codebook, re-trains, re-assigns again — a REAL iterative k-means on
    // DataFrames (2 shuffle-light jobs per round, driver state = codebook
    // only). The oracle replays both rounds; exact integer arithmetic keeps
    // every assignment decision engine-independent through the iteration.
    "n9_ivf_round2" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Similarity.ivfStats(t(s, dir, "embeddings"),
          bits = RpBits, dim = RpDim, seed = RpSeed, rounds = 2)
      },
      Some {
        val cell = sqlRpCell("embedding::DOUBLE[]",
          Similarity.rpPlanes(RpDim, RpBits, RpSeed))
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
                              CAST($cell AS INTEGER) AS cell
                       FROM embeddings),
            x AS (SELECT cell,
                         unnest([{'pos': i - 1, 'v': emb[i]}
                                 for i in generate_series(1, len(emb))]) AS u
                  FROM e),
            g AS (SELECT cell, CAST(u.pos AS INTEGER) AS pos, count(*) AS n,
                         CAST(sum(CAST(floor(u.v * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s
                  FROM x GROUP BY 1, 2),
            cb AS (SELECT cell,
                          list(CAST(floor(s / n + 0.5) AS BIGINT)::DOUBLE ORDER BY pos) AS cq
                   FROM g GROUP BY cell),
            v AS (SELECT vec_id,
                         list_transform(emb, x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT)::DOUBLE) AS vq
                  FROM e),
            asg1 AS (SELECT vec_id, vq, cell FROM (
                       SELECT v.vec_id, v.vq, cb.cell,
                              row_number() OVER (PARTITION BY v.vec_id
                                ORDER BY list_dot_product(v.vq, v.vq)
                                  - 2 * list_dot_product(v.vq, cb.cq)
                                  + list_dot_product(cb.cq, cb.cq), cb.cell) AS rn
                       FROM v CROSS JOIN cb) WHERE rn = 1),
            x2 AS (SELECT cell,
                          unnest([{'pos': i - 1, 'v': vq[i]}
                                  for i in generate_series(1, len(vq))]) AS u
                   FROM asg1),
            g2 AS (SELECT cell, CAST(u.pos AS INTEGER) AS pos, count(*) AS n,
                          CAST(sum(CAST(u.v AS BIGINT)) AS BIGINT) AS s
                   FROM x2 GROUP BY 1, 2),
            cb2 AS (SELECT cell,
                           list(CAST(floor(s / n + 0.5) AS BIGINT)::DOUBLE ORDER BY pos) AS cq
                    FROM g2 GROUP BY cell),
            asg2 AS (SELECT vec_id, cell, dist FROM (
                       SELECT v.vec_id, cb2.cell,
                              list_dot_product(v.vq, v.vq)
                                - 2 * list_dot_product(v.vq, cb2.cq)
                                + list_dot_product(cb2.cq, cb2.cq) AS dist,
                              row_number() OVER (PARTITION BY v.vec_id
                                ORDER BY list_dot_product(v.vq, v.vq)
                                  - 2 * list_dot_product(v.vq, cb2.cq)
                                  + list_dot_product(cb2.cq, cb2.cq), cb2.cell) AS rn
                       FROM v CROSS JOIN cb2) WHERE rn = 1)
            SELECT cell, count(*) AS n,
                   CAST(sum(CAST(dist AS BIGINT)) AS BIGINT) AS inertia_q
            FROM asg2 GROUP BY cell"""
      },
      "round-2 Lloyd: re-train + re-assign, per-cell count and exact inertia"),

    // Product quantization: the embedding splits into 4 subvectors of 16
    // dims; each subspace trains its own tiny rp-seeded codebook (same
    // exact-integer M-step as n6/n7) and every vector compresses to 4
    // small codes — the dim·4-bytes → m-codes rewrite that makes a 100-TB
    // ANN corpus memory-resident. Encoding is a pure narrow codegen'd
    // pass; the oracle replays training + argmin assignment per subspace.
    "n10_pq_encode" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.pqEncode(emb,
          Similarity.pqCodebooks(emb, m = PqM, subDim = PqSubDim,
            bits = PqBits, seed = PqSeed), PqSubDim)
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                          FROM embeddings),
               ${PqSubspaceCtes},
               ${PqEncCte}
               SELECT vec_id, c0, c1, c2, c3 FROM enc"""),
      "PQ encoding: per-subspace trained codebooks, 4 codes per vector"),

    // ADC (asymmetric-distance) kNN over the PQ codes: queries stay exact
    // on the micro grid, corpus rows contribute ONLY their 4 codes, and
    // distance is the sum of per-subspace query→centroid distances with
    // the codebook inlined as literals (narrow scoring, no corpus-vector
    // reads). Top-k via the bounded-heap aggregate — k rows per query per
    // partition cross the wire. Distances are exact integers, so rank ties
    // (dist, then id) replay identically in DuckDB.
    "n11_pq_adc" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.knnPqAdc(emb.filter(col("vec_id") < 8), emb, 3,
          m = PqM, subDim = PqSubDim, bits = PqBits, seed = PqSeed)
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                       FROM embeddings),
            ${PqSubspaceCtes},
            ${PqEncCte},
            q AS (SELECT vec_id AS q_id, emb FROM e WHERE vec_id < 8),
            ${PqLutCtes},
            scored AS (
              SELECT q.q_id, enc.vec_id AS n_id,
                     ${PqAdcDist} AS dist_q
              FROM q CROSS JOIN enc
                ${PqAdcJoins}
              WHERE q.q_id <> enc.vec_id),
            r AS (SELECT q_id, n_id, dist_q,
                         CAST(row_number() OVER (PARTITION BY q_id
                           ORDER BY dist_q, n_id) AS INTEGER) AS rank
                  FROM scored)
            SELECT q_id, n_id, dist_q, rank FROM r WHERE rank <= 3"""),
      "PQ-ADC kNN: code-only corpus scoring with inlined codebook LUTs"),

    // Recall@3 of the PQ-ADC search against the exact brute force — the
    // compression-vs-quality number a PQ deployment tunes (m, bits) by,
    // same recall operator as n5. Honest on synthetic data: 4 subspaces ×
    // 2 bits is a coarse code; the measured recall is the point of the
    // query, not a target.
    "n12_pq_recall" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 8)
        Similarity.recallAtK(
          Similarity.knnPqAdc(q, emb, 3,
            m = PqM, subDim = PqSubDim, bits = PqBits, seed = PqSeed),
          Similarity.knnBrute(q, emb, 3), 3)
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                       FROM embeddings),
            ${PqSubspaceCtes},
            ${PqEncCte},
            q AS (SELECT vec_id AS q_id, emb FROM e WHERE vec_id < 8),
            ${PqLutCtes},
            approx AS (
              SELECT q_id, n_id FROM (
                SELECT q.q_id, enc.vec_id AS n_id,
                       row_number() OVER (PARTITION BY q.q_id
                         ORDER BY ${PqAdcDist}, enc.vec_id) AS rank
                FROM q CROSS JOIN enc
                ${PqAdcJoins}
                WHERE q.q_id <> enc.vec_id)
              WHERE rank <= 3),
            exact AS (
              SELECT q_id, n_id FROM (
                SELECT q.q_id, c.vec_id AS n_id,
                       row_number() OVER (PARTITION BY q.q_id
                         ORDER BY ${sqlCos("q.emb", "c.emb")} DESC, c.vec_id) AS rank
                FROM q JOIN e c ON q.q_id <> c.vec_id)
              WHERE rank <= 3),
            hits AS (
              SELECT e2.q_id, count(*) AS n_hits
              FROM exact e2 JOIN approx a ON e2.q_id = a.q_id AND e2.n_id = a.n_id
              GROUP BY e2.q_id)
            SELECT qq.q_id,
                   coalesce(h.n_hits, 0) AS n_hits,
                   round(coalesce(h.n_hits, 0) / 3.0, 4) AS recall
            FROM (SELECT DISTINCT q_id FROM exact) qq
            LEFT JOIN hits h USING (q_id)"""),
      "recall@3 of PQ-ADC vs exact brute force (compression-quality gauge)"),

    // IVF-PQ — the canonical production vector index: candidates restrict
    // to the query's rp cell (scan prunes to ~1/16 of the corpus) AND
    // scoring reads only the 4 PQ codes per candidate. Composition of the
    // already-gated n3 (cells) and n11 (ADC) paths; the oracle composes
    // the same two verified CTE chains.
    "n14_knn_ivfpq" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.knnIvfPq(emb.filter(col("vec_id") < 8), emb, 3,
          bits = RpBits, dim = RpDim, seed = RpSeed,
          m = PqM, subDim = PqSubDim, pqBits = PqBits, pqSeed = PqSeed)
      },
      Some {
        val cell = sqlRpCell("embedding::DOUBLE[]",
          Similarity.rpPlanes(RpDim, RpBits, RpSeed))
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
                              CAST($cell AS INTEGER) AS cell
                       FROM embeddings),
            ${PqSubspaceCtes},
            ${PqEncCte},
            encc AS (SELECT enc.*, e.cell FROM enc JOIN e USING (vec_id)),
            q AS (SELECT vec_id AS q_id, emb, cell FROM e WHERE vec_id < 8),
            ${PqLutCtes},
            scored AS (
              SELECT q.q_id, encc.vec_id AS n_id,
                     ${PqAdcDist} AS dist_q
              FROM q JOIN encc USING (cell)
                ${PqAdcJoins.replace("enc.c", "encc.c")}
              WHERE q.q_id <> encc.vec_id),
            r AS (SELECT q_id, n_id, dist_q,
                         CAST(row_number() OVER (PARTITION BY q_id
                           ORDER BY dist_q, n_id) AS INTEGER) AS rank
                  FROM scored)
            SELECT q_id, n_id, dist_q, rank FROM r WHERE rank <= 3"""
      },
      "IVF-PQ: rp-cell candidate pruning + code-only ADC scoring"),

    // Filtered ANN: n14's IVF-PQ composition under a metadata predicate
    // (allowed = vec_id % 3 = 1) applied in PRE-FILTER position — the
    // candidates restrict before the top-k cut, so every returned
    // neighbor satisfies the predicate and each query still fills k from
    // its probed cell when possible. Oracle = the same n14 CTE chain with
    // the predicate on the candidate side.
    "n21_knn_filtered" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.knnIvfPqFiltered(emb.filter(col("vec_id") < 8), emb,
          emb.filter(col("vec_id") % 3 === 1).select("vec_id"), 3,
          bits = RpBits, dim = RpDim, seed = RpSeed,
          m = PqM, subDim = PqSubDim, pqBits = PqBits, pqSeed = PqSeed)
      },
      Some {
        val cell = sqlRpCell("embedding::DOUBLE[]",
          Similarity.rpPlanes(RpDim, RpBits, RpSeed))
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
                              CAST($cell AS INTEGER) AS cell
                       FROM embeddings),
            ${PqSubspaceCtes},
            ${PqEncCte},
            encc AS (SELECT enc.*, e.cell FROM enc JOIN e USING (vec_id)),
            q AS (SELECT vec_id AS q_id, emb, cell FROM e WHERE vec_id < 8),
            ${PqLutCtes},
            scored AS (
              SELECT q.q_id, encc.vec_id AS n_id,
                     ${PqAdcDist} AS dist_q
              FROM q JOIN encc USING (cell)
                ${PqAdcJoins.replace("enc.c", "encc.c")}
              WHERE q.q_id <> encc.vec_id AND encc.vec_id % 3 = 1),
            r AS (SELECT q_id, n_id, dist_q,
                         CAST(row_number() OVER (PARTITION BY q_id
                           ORDER BY dist_q, n_id) AS INTEGER) AS rank
                  FROM scored)
            SELECT q_id, n_id, dist_q, rank FROM r WHERE rank <= 3"""
      },
      "filtered ANN: metadata predicate pre-filters IVF-PQ candidates before the cut"),

    // Multi-probe IVF-PQ: n14's production composition with the n4 recall
    // repair — each query scores its own rp cell plus the RpBits Hamming-1
    // flips, still over PQ codes only. The oracle expands the probe cells
    // in a SEPARATE CTE (qp) so the per-query ADC LUTs stay one-row-per-
    // query (expanding q itself would multiply every candidate by the
    // probe count and corrupt the ranking).
    "n15_knn_ivfpq_multiprobe" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.knnIvfPqMultiProbe(emb.filter(col("vec_id") < 8), emb, 3,
          bits = RpBits, dim = RpDim, seed = RpSeed,
          m = PqM, subDim = PqSubDim, pqBits = PqBits, pqSeed = PqSeed)
      },
      Some {
        val cell = sqlRpCell("embedding::DOUBLE[]",
          Similarity.rpPlanes(RpDim, RpBits, RpSeed))
        val flips = (Seq(0) ++ (0 until RpBits).map(1 << _)).mkString(", ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
                              CAST($cell AS INTEGER) AS cell
                       FROM embeddings),
            ${PqSubspaceCtes},
            ${PqEncCte},
            encc AS (SELECT enc.*, e.cell FROM enc JOIN e USING (vec_id)),
            q AS (SELECT vec_id AS q_id, emb, cell FROM e WHERE vec_id < 8),
            qp AS (SELECT q_id, CAST(xor(cell, f) AS INTEGER) AS cell
                   FROM q, (SELECT unnest([$flips]) AS f)),
            ${PqLutCtes},
            scored AS (
              SELECT qp.q_id, encc.vec_id AS n_id,
                     ${PqAdcDist} AS dist_q
              FROM qp JOIN encc USING (cell)
                ${PqAdcJoins.replace("enc.c", "encc.c")
                  .replace("= q.q_id", "= qp.q_id")}
              WHERE qp.q_id <> encc.vec_id),
            r AS (SELECT q_id, n_id, dist_q,
                         CAST(row_number() OVER (PARTITION BY q_id
                           ORDER BY dist_q, n_id) AS INTEGER) AS rank
                  FROM scored)
            SELECT q_id, n_id, dist_q, rank FROM r WHERE rank <= 3"""
      },
      "multi-probe IVF-PQ: Hamming-1 cell flips + code-only ADC scoring"),

    // IVFADC+R: n14's code-only retrieval widened to 10 candidates, then
    // an exact cosine re-score of ONLY those candidates decides the final
    // top-3 — the quantization-error repair that reads raw vectors behind
    // the candidate semi-join instead of scanning them. The oracle replays
    // the ADC ranking CTE verbatim, cuts at the rerank width, and re-ranks
    // on the same 4-decimal cosine grid as n1.
    "n16_knn_ivfpq_rerank" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.knnIvfPqRerank(emb.filter(col("vec_id") < 8), emb, 3,
          rerank = 10, bits = RpBits, dim = RpDim, seed = RpSeed,
          m = PqM, subDim = PqSubDim, pqBits = PqBits, pqSeed = PqSeed)
      },
      Some {
        val cell = sqlRpCell("embedding::DOUBLE[]",
          Similarity.rpPlanes(RpDim, RpBits, RpSeed))
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
                              CAST($cell AS INTEGER) AS cell
                       FROM embeddings),
            ${PqSubspaceCtes},
            ${PqEncCte},
            encc AS (SELECT enc.*, e.cell FROM enc JOIN e USING (vec_id)),
            q AS (SELECT vec_id AS q_id, emb, cell FROM e WHERE vec_id < 8),
            ${PqLutCtes},
            scored AS (
              SELECT q.q_id, encc.vec_id AS n_id,
                     ${PqAdcDist} AS dist_q
              FROM q JOIN encc USING (cell)
                ${PqAdcJoins.replace("enc.c", "encc.c")}
              WHERE q.q_id <> encc.vec_id),
            cand AS (
              SELECT q_id, n_id FROM (
                SELECT q_id, n_id,
                       row_number() OVER (PARTITION BY q_id
                         ORDER BY dist_q, n_id) AS adc_rank
                FROM scored)
              WHERE adc_rank <= 10),
            ex AS (
              SELECT c.q_id, c.n_id, ${sqlCos("qe.emb", "ne.emb")} AS sim
              FROM cand c
              JOIN e qe ON qe.vec_id = c.q_id
              JOIN e ne ON ne.vec_id = c.n_id),
            rr AS (SELECT q_id, n_id, sim,
                          CAST(row_number() OVER (PARTITION BY q_id
                            ORDER BY sim DESC, n_id) AS INTEGER) AS rank
                   FROM ex)
            SELECT q_id, n_id, sim, rank FROM rr WHERE rank <= 3"""
      },
      "IVFADC+R: code-only retrieval, exact cosine re-rank of candidates"),

    // Multi-probe IVFADC+R — the full production read path: n15's
    // multi-probe candidate retrieval (recall repair: a true neighbor in
    // a flipped cell CAN be retrieved) composed with n16's exact re-rank
    // (quantization repair: the final order is true cosine). The oracle
    // is exactly n15's scored CTE feeding n16's cand/ex/rr tail.
    "n17_knn_ivfpq_mp_rerank" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.knnIvfPqMultiProbeRerank(emb.filter(col("vec_id") < 8),
          emb, 3, rerank = 10, bits = RpBits, dim = RpDim, seed = RpSeed,
          m = PqM, subDim = PqSubDim, pqBits = PqBits, pqSeed = PqSeed)
      },
      Some {
        val cell = sqlRpCell("embedding::DOUBLE[]",
          Similarity.rpPlanes(RpDim, RpBits, RpSeed))
        val flips = (Seq(0) ++ (0 until RpBits).map(1 << _)).mkString(", ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
                              CAST($cell AS INTEGER) AS cell
                       FROM embeddings),
            ${PqSubspaceCtes},
            ${PqEncCte},
            encc AS (SELECT enc.*, e.cell FROM enc JOIN e USING (vec_id)),
            q AS (SELECT vec_id AS q_id, emb, cell FROM e WHERE vec_id < 8),
            qp AS (SELECT q_id, CAST(xor(cell, f) AS INTEGER) AS cell
                   FROM q, (SELECT unnest([$flips]) AS f)),
            ${PqLutCtes},
            scored AS (
              SELECT qp.q_id, encc.vec_id AS n_id,
                     ${PqAdcDist} AS dist_q
              FROM qp JOIN encc USING (cell)
                ${PqAdcJoins.replace("enc.c", "encc.c")
                  .replace("= q.q_id", "= qp.q_id")}
              WHERE qp.q_id <> encc.vec_id),
            cand AS (
              SELECT q_id, n_id FROM (
                SELECT q_id, n_id,
                       row_number() OVER (PARTITION BY q_id
                         ORDER BY dist_q, n_id) AS adc_rank
                FROM scored)
              WHERE adc_rank <= 10),
            ex AS (
              SELECT c.q_id, c.n_id, ${sqlCos("qe.emb", "ne.emb")} AS sim
              FROM cand c
              JOIN e qe ON qe.vec_id = c.q_id
              JOIN e ne ON ne.vec_id = c.n_id),
            rr AS (SELECT q_id, n_id, sim,
                          CAST(row_number() OVER (PARTITION BY q_id
                            ORDER BY sim DESC, n_id) AS INTEGER) AS rank
                   FROM ex)
            SELECT q_id, n_id, sim, rank FROM rr WHERE rank <= 3"""
      },
      "multi-probe IVFADC+R: flip-cell retrieval, exact cosine re-rank"),

    // IVFADC in its PUBLISHED (residual) form: PQ codes quantize the
    // residual x − c(cell) against the TRAINED coarse centroid (n7's
    // codebook), not the raw vector — the FAISS IVFPQ default. Exact
    // integers end-to-end: micro-grid residual subtraction, integer-millis
    // plane seeding for the residual codebooks, integer code assignment
    // and ADC distances, so the full train→encode→search chain replays
    // bit-for-bit.
    "n18_knn_ivfadc_residual" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.knnIvfAdcResidual(emb.filter(col("vec_id") < 10), emb, 3,
          bits = RpBits, dim = RpDim, seed = RpSeed,
          m = PqM, subDim = PqSubDim, pqBits = PqBits, pqSeed = ResPqSeed)
      },
      Some {
        val luts = (0 until PqM).map { i =>
          val lo = i * PqSubDim + 1
          val hi = (i + 1) * PqSubDim
          s"""lq$i AS (SELECT q_id, qs::DOUBLE[] AS qsd
                       FROM (SELECT q_id, rq[$lo:$hi] AS qs FROM q)),
              lut$i AS (SELECT q_id, rcb.cell,
                               CAST(list_dot_product(qsd, qsd)
                                 - 2 * list_dot_product(qsd, rcb.cq)
                                 + list_dot_product(rcb.cq, rcb.cq)
                                 AS BIGINT) AS d
                        FROM lq$i CROSS JOIN rcb$i rcb)"""
        }.mkString(",\n")
        val lutJoins = (0 until PqM).map(i =>
          s"JOIN lut$i l$i ON l$i.q_id = q.q_id AND l$i.cell = e.c$i")
          .mkString("\n                ")
        val dist = (0 until PqM).map(i => s"l$i.d").mkString(" + ")
        s"""WITH ${sqlAsg1Ctes("embeddings")},
            $ResidualPqCtes,
            q AS (SELECT vec_id AS q_id, cell, rq FROM rq WHERE vec_id < 10),
            $luts,
            scored AS (
              SELECT q.q_id, e.vec_id AS n_id, $dist AS dist_q
              FROM q JOIN renc e ON e.cell = q.cell AND e.vec_id <> q.q_id
                $lutJoins),
            r AS (SELECT q_id, n_id, dist_q,
                         CAST(row_number() OVER (PARTITION BY q_id
                           ORDER BY dist_q, n_id) AS INTEGER) AS rank
                  FROM scored)
            SELECT q_id, n_id, CAST(dist_q AS BIGINT) AS dist_q, rank
            FROM r WHERE rank <= 3"""
      },
      "IVFADC, residual form (Jegou et al. 2011): trained coarse cells, exact-integer residual codes"),

    // The FAISS `nprobe` knob on residual IVFADC: each query probes its 2
    // nearest TRAINED centroids (trained cells have no Hamming structure,
    // so the rp flip heuristic doesn't apply) and forms a per-probe
    // residual — ADC distance is only defined relative to the cell a
    // candidate is stored under. Probe sets are disjoint (a corpus row
    // has one cell), so no dedup precedes the top-k cut.
    "n19_knn_ivfadc_nprobe" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.knnIvfAdcResidual(emb.filter(col("vec_id") < 10), emb, 3,
          bits = RpBits, dim = RpDim, seed = RpSeed,
          m = PqM, subDim = PqSubDim, pqBits = PqBits, pqSeed = ResPqSeed,
          nprobe = 2)
      },
      Some {
        val luts = (0 until PqM).map { i =>
          val lo = i * PqSubDim + 1
          val hi = (i + 1) * PqSubDim
          s"""lq$i AS (SELECT q_id, pcell, qs::DOUBLE[] AS qsd
                       FROM (SELECT q_id, pcell, qr[$lo:$hi] AS qs FROM qr)),
              lut$i AS (SELECT q_id, pcell, rcb.cell AS ccell,
                               CAST(list_dot_product(qsd, qsd)
                                 - 2 * list_dot_product(qsd, rcb.cq)
                                 + list_dot_product(rcb.cq, rcb.cq)
                                 AS BIGINT) AS d
                        FROM lq$i CROSS JOIN rcb$i rcb)"""
        }.mkString(",\n")
        val lutJoins = (0 until PqM).map(i =>
          s"""JOIN lut$i l$i ON l$i.q_id = qr.q_id
                AND l$i.pcell = qr.pcell AND l$i.ccell = e.c$i""")
          .mkString("\n                ")
        val dist = (0 until PqM).map(i => s"l$i.d").mkString(" + ")
        s"""WITH ${sqlAsg1Ctes("embeddings")},
            $ResidualPqCtes,
            qp AS (SELECT vec_id AS q_id, cell AS pcell FROM (
                     SELECT vec_id, cell,
                            row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cell) AS rn
                     FROM d WHERE vec_id < 10) WHERE rn <= 2),
            qr AS (SELECT qp.q_id, qp.pcell,
                          [CAST(v.vq[j] AS BIGINT) - CAST(cb.cq[j] AS BIGINT)
                           for j in generate_series(1, len(v.vq))] AS qr
                   FROM qp JOIN v ON v.vec_id = qp.q_id
                   JOIN cb ON cb.cell = qp.pcell),
            $luts,
            scored AS (
              SELECT qr.q_id, e.vec_id AS n_id, $dist AS dist_q
              FROM qr JOIN renc e ON e.cell = qr.pcell
                AND e.vec_id <> qr.q_id
                $lutJoins),
            r AS (SELECT q_id, n_id, dist_q,
                         CAST(row_number() OVER (PARTITION BY q_id
                           ORDER BY dist_q, n_id) AS INTEGER) AS rank
                  FROM scored)
            SELECT q_id, n_id, CAST(dist_q AS BIGINT) AS dist_q, rank
            FROM r WHERE rank <= 3"""
      },
      "residual IVFADC at nprobe=2: nearest-centroid probe list, per-probe residuals"),

    // The +R stage on the RESIDUAL family: n18's codes-only ADC retrieval
    // feeding n16's exact-cosine re-rank tail. The residual index carries
    // no raw-vector copy, so the re-rank joins the candidates back to the
    // SOURCE embeddings table — the 100-TB posture: codes-only at rest,
    // |queries|·rerank wide-column reads at query time.
    "n20_knn_ivfadc_rerank" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.knnIvfAdcResidualRerank(emb.filter(col("vec_id") < 10),
          emb, 3, rerank = 10, bits = RpBits, dim = RpDim, seed = RpSeed,
          m = PqM, subDim = PqSubDim, pqBits = PqBits, pqSeed = ResPqSeed)
      },
      Some {
        val luts = (0 until PqM).map { i =>
          val lo = i * PqSubDim + 1
          val hi = (i + 1) * PqSubDim
          s"""lq$i AS (SELECT q_id, qs::DOUBLE[] AS qsd
                       FROM (SELECT q_id, rq[$lo:$hi] AS qs FROM q)),
              lut$i AS (SELECT q_id, rcb.cell,
                               CAST(list_dot_product(qsd, qsd)
                                 - 2 * list_dot_product(qsd, rcb.cq)
                                 + list_dot_product(rcb.cq, rcb.cq)
                                 AS BIGINT) AS d
                        FROM lq$i CROSS JOIN rcb$i rcb)"""
        }.mkString(",\n")
        val lutJoins = (0 until PqM).map(i =>
          s"JOIN lut$i l$i ON l$i.q_id = q.q_id AND l$i.cell = re.c$i")
          .mkString("\n                ")
        val dist = (0 until PqM).map(i => s"l$i.d").mkString(" + ")
        s"""WITH ${sqlAsg1Ctes("embeddings")},
            $ResidualPqCtes,
            q AS (SELECT vec_id AS q_id, cell, rq FROM rq WHERE vec_id < 10),
            $luts,
            scored AS (
              SELECT q.q_id, re.vec_id AS n_id, $dist AS dist_q
              FROM q JOIN renc re ON re.cell = q.cell AND re.vec_id <> q.q_id
                $lutJoins),
            cand AS (
              SELECT q_id, n_id FROM (
                SELECT q_id, n_id,
                       row_number() OVER (PARTITION BY q_id
                         ORDER BY dist_q, n_id) AS adc_rank
                FROM scored)
              WHERE adc_rank <= 10),
            ex AS (
              SELECT c.q_id, c.n_id, ${sqlCos("qe.emb", "ne.emb")} AS sim
              FROM cand c
              JOIN e qe ON qe.vec_id = c.q_id
              JOIN e ne ON ne.vec_id = c.n_id),
            rr AS (SELECT q_id, n_id, sim,
                          CAST(row_number() OVER (PARTITION BY q_id
                            ORDER BY sim DESC, n_id) AS INTEGER) AS rank
                   FROM ex)
            SELECT q_id, n_id, sim, rank FROM rr WHERE rank <= 3"""
      },
      "residual IVFADC+R: codes-only retrieval, exact re-rank vs the source corpus (no raw copy in the index)"),

    // kNN on the int8 codes themselves: per-vector scales cancel in
    // cosine, so the quantized corpus is searched without dequantization —
    // 4× less scan IO at query time, exact integer dots, one
    // IEEE-deterministic sqrt+divide per pair.
    "n13_knn_int8" -> QueryDef(
      (s, dir) => {
        // search consumes the STORED quantized representation (e2's
        // output) — the pre-quantized entry point is what makes the 4×
        // scan-IO cut real; quantizing inline would re-read the floats
        val emb = t(s, dir, "embeddings")
        val stored = Similarity.quantizeInt8(emb).select("vec_id", "q")
        Similarity.knnInt8Quantized(
          stored.filter(col("vec_id") < 6), stored, 3)
      },
      Some("""WITH s AS (
                SELECT vec_id, embedding::DOUBLE[] AS e,
                       list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS scale
                FROM embeddings),
              q8 AS (
                SELECT vec_id,
                       list_transform(e, x -> CASE WHEN scale = 0 THEN 0
                         ELSE floor(x / scale * 127 + 0.5) END) AS q
                FROM s),
              n AS (SELECT vec_id, q, list_dot_product(q, q) AS nrm
                    FROM q8 WHERE list_dot_product(q, q) > 0),
              scored AS (
                SELECT a.vec_id AS q_id, b.vec_id AS n_id,
                       round(list_dot_product(a.q, b.q)
                         / (sqrt(a.nrm) * sqrt(b.nrm)), 4) AS sim8
                FROM n a JOIN n b ON a.vec_id < 6 AND a.vec_id <> b.vec_id)
              SELECT q_id, n_id, sim8,
                     CAST(rank AS INTEGER) AS rank
              FROM (SELECT q_id, n_id, sim8,
                           row_number() OVER (PARTITION BY q_id
                             ORDER BY sim8 DESC, n_id) AS rank
                    FROM scored)
              WHERE rank <= 3"""),
      "kNN on int8 codes: scales cancel, no dequantization at query time"),

    // IVF + SQ8 (FAISS 'IVF,SQ8'): n13's scales-cancel int8 scoring
    // restricted to the query's rp cell - per-dimension resolution at a
    // byte per dimension, coarse cells for pruning. The index round-trip
    // (buildIvfSq8/searchIvfSq8) is spec-gated bit-identical.
    "n22_knn_ivfsq8" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.knnIvfSq8(emb.filter(col("vec_id") < 6), emb, 3,
          bits = RpBits, dim = RpDim, seed = RpSeed)
      },
      Some {
        val cell = sqlRpCell("embedding::DOUBLE[]",
          Similarity.rpPlanes(RpDim, RpBits, RpSeed))
        s"""WITH s AS (
              SELECT vec_id, embedding::DOUBLE[] AS e,
                     list_max(list_transform(embedding::DOUBLE[],
                       x -> abs(x))) AS scale,
                     CAST($cell AS INTEGER) AS cell
              FROM embeddings),
            q8 AS (
              SELECT vec_id, cell,
                     list_transform(e, x -> CASE WHEN scale = 0 THEN 0
                       ELSE floor(x / scale * 127 + 0.5) END) AS q
              FROM s),
            n AS (SELECT vec_id, cell, q, list_dot_product(q, q) AS nrm
                  FROM q8 WHERE list_dot_product(q, q) > 0),
            scored AS (
              SELECT a.vec_id AS q_id, b.vec_id AS n_id,
                     round(list_dot_product(a.q, b.q)
                       / (sqrt(a.nrm) * sqrt(b.nrm)), 4) AS sim8
              FROM n a JOIN n b
                ON a.cell = b.cell AND a.vec_id < 6
               AND a.vec_id <> b.vec_id)
            SELECT q_id, n_id, sim8, CAST(rank AS INTEGER) AS rank
            FROM (SELECT q_id, n_id, sim8,
                         row_number() OVER (PARTITION BY q_id
                           ORDER BY sim8 DESC, n_id) AS rank
                  FROM scored)
            WHERE rank <= 3"""
      },
      "IVF+SQ8: rp-cell pruning over int8 codes (per-dimension resolution)"),

    // Edit-distance near-match pairs (record-linkage / entity-resolution
    // shape): prefix blocking + length band bound the candidate set, only
    // candidates pay the O(len²) Levenshtein — never an all-pairs scan.
    // Both engines implement standard Levenshtein, so the distances (and
    // the ≤1 cut) agree exactly.
    "d9_fuzzy_pairs" -> QueryDef(
      (s, dir) => Dedup.editDistancePairs(
        t(s, dir, "customer").filter(col("c_custkey") <= 400),
        "c_custkey", "c_name", blockPrefix = 12, maxDist = 1),
      Some("""WITH c AS (SELECT c_custkey AS id, c_name AS nm
                         FROM customer WHERE c_custkey <= 400)
              SELECT a.id AS id_a, b.id AS id_b,
                     CAST(levenshtein(a.nm, b.nm) AS INTEGER) AS dist
              FROM c a JOIN c b
                ON substr(a.nm, 1, 12) = substr(b.nm, 1, 12)
               AND a.id < b.id
               AND abs(length(a.nm) - length(b.nm)) <= 1
              WHERE levenshtein(a.nm, b.nm) <= 1"""),
      "fuzzy self-join: prefix-blocked Levenshtein near-match pairs"),

    // Jaro-Winkler fuzzy pairs: d9's blocked self-join under the
    // record-linkage measure (front-weighted agreement), scored by the
    // engine's native codegen'd expression; the oracle calls DuckDB's
    // built-in jaro_winkler_similarity — an INDEPENDENT implementation
    // of the same published measure, so the gate cross-validates the
    // kernel over every candidate pair.
    "d24_jw_pairs" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Dedup.jaroWinklerPairs(
          t(s, dir, "customer").filter(col("c_custkey") <= 400),
          "c_custkey", "c_name", blockPrefix = 12, minSim = 0.98)
      },
      Some("""WITH c AS (SELECT c_custkey AS id, c_name AS nm
                         FROM customer WHERE c_custkey <= 400),
              ok AS (SELECT substr(nm, 1, 12) AS blk FROM c
                     GROUP BY blk HAVING count(*) <= 10000)
              SELECT a.id AS id_a, b.id AS id_b,
                     round(jaro_winkler_similarity(a.nm, b.nm), 4) AS jw
              FROM c a JOIN c b
                ON substr(a.nm, 1, 12) = substr(b.nm, 1, 12)
               AND a.id < b.id
              WHERE substr(a.nm, 1, 12) IN (SELECT blk FROM ok)
                AND round(jaro_winkler_similarity(a.nm, b.nm), 4) >= 0.98"""),
      "Jaro-Winkler fuzzy pairs: native codegen'd kernel vs DuckDB's built-in"),

    // Pre-flight block diagnostics for the JW family (the d17 discipline
    // lifted to prefix blocking): block count, hottest block, the
    // uncapped Σ C(b,2) candidate cost, and what a maxBlock=100 cap
    // would do to it — on this corpus the single shared-prefix block
    // EXCEEDS the cap, so the capped pair cost collapses to 0: the
    // degenerate-blocking case measured, oracle-gated, before any join.
    "d26_jw_block_stats" -> QueryDef(
      (s, dir) => Dedup.jwBlockStats(
        t(s, dir, "customer").filter(col("c_custkey") <= 400),
        "c_name", blockPrefix = 12, maxBlock = 100),
      Some("""WITH c AS (SELECT c_name AS nm FROM customer
                         WHERE c_custkey <= 400),
              b AS (SELECT substr(nm, 1, 12) AS blk,
                           CAST(count(*) AS BIGINT) AS n
                    FROM c GROUP BY blk)
              SELECT CAST(count(*) AS BIGINT) AS n_blocks,
                     max(n) AS max_block,
                     CAST(sum((n * (n - 1)) // 2) AS BIGINT)
                       AS candidate_pairs,
                     CAST(sum(CASE WHEN n > 100 THEN 1 ELSE 0 END)
                       AS BIGINT) AS blocks_over_cap,
                     CAST(sum(CASE WHEN n <= 100 THEN (n * (n - 1)) // 2
                              ELSE 0 END) AS BIGINT) AS pairs_after_cap
              FROM b"""),
      "JW blocking pre-flight: block sizes + capped/uncapped pair cost"),

    // Winnowing fingerprint selection (Schleimer et al. 2003, the MOSS
    // scheme): each window of 4 consecutive 3-gram hashes selects its
    // minimum (ties rightmost) — the position-robust LOCAL sketch beside
    // d18's every-position family, guaranteeing detection of any exact
    // match of >= 4 + 3 − 1 = 6 tokens at ~2/(win+1) density. Docs with
    // >= 1 shingle but < 4 of them keep their single partial window
    // (greatest(maxpos−3, 0) clamp — r8: short docs select >= 1
    // fingerprint instead of vanishing from the sketch). The oracle
    // replays the packed-BIGINT rightmost-argmin window verbatim.
    "d27_winnow_fps" -> QueryDef(
      (s, dir) => Dedup.winnowFingerprints(t(s, dir, "documents"),
        width = Dedup.ShingleWidth, win = 4),
      Some(s"""WITH wn_w AS (SELECT doc_id, string_split(text, ' ') AS w
                             FROM documents),
               wn_p AS (SELECT doc_id, w,
                               unnest(generate_series(0, len(w) - 3)) AS pos
                        FROM wn_w WHERE len(w) >= 3),
               wn_k AS (SELECT doc_id, pos,
                          ${sqlHash(
                            "array_to_string(w[pos + 1 : pos + 3], ' ')",
                            Dedup.WinnowSeed)}
                            * 1048576 + (1048575 - pos) AS key
                        FROM wn_p),
               wn_s AS (SELECT doc_id, pos,
                               min(key) OVER (PARTITION BY doc_id
                                 ORDER BY pos ROWS BETWEEN CURRENT ROW
                                 AND 3 FOLLOWING) AS selk,
                               max(pos) OVER (PARTITION BY doc_id)
                                 AS maxpos
                        FROM wn_k),
               wn_d AS (SELECT DISTINCT doc_id, selk FROM wn_s
                        WHERE pos <= greatest(maxpos - 3, 0))
               SELECT doc_id,
                      CAST(1048575 - (selk % 1048576) AS INTEGER) AS pos,
                      selk // 1048576 AS fp
               FROM wn_d"""),
      "winnowing (MOSS): window-min k-gram fingerprint sketch per doc"),

    // The detector over the d27 sketch: documents sharing >= 2 selected
    // fingerprint VALUES pair up with the shared count as weight; a
    // fingerprint selected in > 100 docs is corpus-frequent boilerplate
    // whose B² pair contribution is dropped (the LSH maxBucket
    // discipline). The oracle extends the d27 chain with the postings
    // self-join.
    "d28_winnow_pairs" -> QueryDef(
      (s, dir) => Dedup.winnowCandidates(t(s, dir, "documents"),
        width = Dedup.ShingleWidth, win = 4, minShared = 2,
        maxPostings = 100),
      Some(s"""WITH $WinnowPairsCtes
               SELECT doc_a, doc_b, n_shared FROM wn_pairs"""),
      "winnow candidate pairs: shared selected fingerprints, hot cap"),

    // Cross-detector agreement matrix: LSH (bit 1), SimHash (bit 2), and
    // winnowing (bit 4) candidate pairs rolled into one Venn census —
    // the joint-coverage diagnostic above the per-detector ones (a pair
    // only the positional winnow sketch finds is the reordered-
    // boilerplate blind spot of bag-of-shingles LSH). The composed
    // operator tokenizes the corpus ONCE for both shingle consumers
    // (r8 verdict #1; DetectorVennSpec pins the construction count).
    // The oracle composes the three detectors' own shared CTE chains
    // verbatim, so a detector change cannot silently diverge from its
    // Venn entry.
    "d34_detector_agreement" -> QueryDef(
      (s, dir) => Dedup.nearDupDetectorVenn(t(s, dir, "documents"),
        width = Dedup.ShingleWidth, minJaccard = 0.5,
        lshMaxBucket = Int.MaxValue, maxHamming = 3, win = 4,
        minShared = 2, maxPostings = 100),
      Some(s"""WITH $LshPairsCtes,
               $SimhashCte,
               sh_pairs AS (
                 SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM fp a JOIN fp b ON a.doc_id < b.doc_id
                 WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
               $WinnowPairsCtes,
               u AS (SELECT doc_a, doc_b, 1 AS bit FROM lsh_pairs
                     UNION ALL SELECT doc_a, doc_b, 2 FROM sh_pairs
                     UNION ALL SELECT doc_a, doc_b, 4 FROM wn_pairs),
               m AS (SELECT doc_a, doc_b, CAST(sum(bit) AS BIGINT) AS mask
                     FROM u GROUP BY doc_a, doc_b)
               SELECT mask, CAST(count(*) AS BIGINT) AS n_pairs
               FROM m GROUP BY mask"""),
      "near-dup detector Venn: LSH/SimHash/winnow joint-coverage census"),

    // Transposition-aware fuzzy pairs: unrestricted Damerau-Levenshtein
    // via the engine's codegen'd expression (DuckDB-identical byte
    // semantics — the oracle calls its native damerau_levenshtein). On
    // this corpus the measure admits 241 swapped-digit pairs that d9's
    // plain Levenshtein double-charges past the threshold — the typo
    // class the measure exists for. Same prefix block + length band +
    // maxBlock shape as d9.
    "d35_damerau_pairs" -> QueryDef(
      (s, dir) => Dedup.damerauPairs(
        t(s, dir, "customer").filter(col("c_custkey") <= 400),
        "c_custkey", "c_name", blockPrefix = 12, maxDist = 1),
      Some("""WITH c AS (SELECT c_custkey AS id, c_name AS nm
                         FROM customer WHERE c_custkey <= 400)
              SELECT a.id AS id_a, b.id AS id_b,
                     CAST(damerau_levenshtein(a.nm, b.nm) AS INTEGER) AS dl
              FROM c a JOIN c b
                ON substr(a.nm, 1, 12) = substr(b.nm, 1, 12)
               AND a.id < b.id
               AND abs(length(a.nm) - length(b.nm)) <= 1
              WHERE damerau_levenshtein(a.nm, b.nm) <= 1"""),
      "Damerau-Levenshtein fuzzy pairs (native codegen'd expression)"),

    // Detector-vs-truth clustering agreement (pairwise P/R/F1 + Rand):
    // the MinHash-LSH near-dup clustering graded against exact-text
    // truth via the contingency shortcut — no pair relation ever
    // materializes. The oracle recomposes d6's full recursive-CTE
    // clustering plus the truth assignment, so a detector change cannot
    // silently diverge from its own evaluation.
    "d36_cluster_agreement" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val det = Dedup.dupClusters(
          Dedup.minhashDedupPairs(docs, 0.5, maxBucket = Int.MaxValue)
            .select("doc_a", "doc_b"))
        val truth = docs
          .join(docs.groupBy("text").agg(min("doc_id").as("cluster")),
            Seq("text"))
          .select(col("doc_id"), col("cluster"))
        Dedup.clusterAgreement(docs.select("doc_id"), det, truth)
      },
      Some(s"""WITH RECURSIVE $LshPairsCtes,
               edges AS (
                 SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
                 UNION ALL
                 SELECT doc_b, doc_a FROM lsh_pairs),
               reach(src, dst) AS (
                 SELECT src, dst FROM edges
                 UNION
                 SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
               det AS (
                 SELECT src AS doc_id, least(src, min(dst)) AS cluster
                 FROM reach GROUP BY src),
               fa AS (
                 SELECT d.doc_id,
                        coalesce(det.cluster, d.doc_id) AS cluster
                 FROM documents d LEFT JOIN det ON det.doc_id = d.doc_id),
               tr AS (
                 SELECT d.doc_id, m.cluster
                 FROM documents d
                 JOIN (SELECT text, min(doc_id) AS cluster
                       FROM documents GROUP BY text) m ON m.text = d.text),
               pa AS (SELECT CAST(coalesce(sum(sz * (sz - 1) // 2), 0)
                        AS BIGINT) AS pairs_a
                      FROM (SELECT count(*) AS sz FROM fa GROUP BY cluster)),
               pb AS (SELECT CAST(coalesce(sum(sz * (sz - 1) // 2), 0)
                        AS BIGINT) AS pairs_b
                      FROM (SELECT count(*) AS sz FROM tr GROUP BY cluster)),
               bo AS (SELECT CAST(coalesce(sum(n * (n - 1) // 2), 0)
                        AS BIGINT) AS pairs_both
                      FROM (SELECT count(*) AS n
                            FROM fa JOIN tr ON fa.doc_id = tr.doc_id
                            GROUP BY fa.cluster, tr.cluster)),
               nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                             CAST(count(*) * (count(*) - 1) // 2 AS BIGINT)
                               AS total_pairs
                      FROM documents)
               SELECT n_docs, pairs_a, pairs_b, pairs_both,
                      CAST(CASE WHEN pairs_a > 0 THEN
                        (1000000 * pairs_both) // pairs_a END AS BIGINT)
                        AS precision_ppm,
                      CAST(CASE WHEN pairs_b > 0 THEN
                        (1000000 * pairs_both) // pairs_b END AS BIGINT)
                        AS recall_ppm,
                      CAST(CASE WHEN pairs_a + pairs_b > 0 THEN
                        (2000000 * pairs_both) // (pairs_a + pairs_b) END
                        AS BIGINT) AS f1_ppm,
                      CAST(CASE WHEN total_pairs > 0 THEN
                        (1000000 * (total_pairs - pairs_a - pairs_b
                                    + 2 * pairs_both)) // total_pairs END
                        AS BIGINT) AS rand_ppm
               FROM nn, pa, pb, bo"""),
      "pairwise P/R/F1 + Rand: detector clustering vs exact-dup truth"),

    // Bidirectional fuzzy blocking: prefix pass UNION suffix pass (prefix
    // over reversed strings) — an edit inside the prefix escapes d9's
    // blocking but not the suffix block, so the pass pair is exact for
    // 1-edit workloads. The dedup agg takes min(dist) per pair.
    "d15_fuzzy_bidir" -> QueryDef(
      (s, dir) => Dedup.editDistancePairsBidirectional(
        t(s, dir, "customer").filter(col("c_custkey") <= 400),
        "c_custkey", "c_name", blockPrefix = 12, maxDist = 1),
      Some("""WITH c AS (SELECT c_custkey AS id, c_name AS nm
                         FROM customer WHERE c_custkey <= 400),
              p AS (SELECT a.id AS id_a, b.id AS id_b,
                           levenshtein(a.nm, b.nm) AS dist
                    FROM c a JOIN c b
                      ON substr(a.nm, 1, 12) = substr(b.nm, 1, 12)
                     AND a.id < b.id
                     AND abs(length(a.nm) - length(b.nm)) <= 1
                    WHERE levenshtein(a.nm, b.nm) <= 1),
              sfx AS (SELECT a.id AS id_a, b.id AS id_b,
                             levenshtein(a.nm, b.nm) AS dist
                      FROM c a JOIN c b
                        ON substr(reverse(a.nm), 1, 12) = substr(reverse(b.nm), 1, 12)
                       AND a.id < b.id
                       AND abs(length(a.nm) - length(b.nm)) <= 1
                      WHERE levenshtein(a.nm, b.nm) <= 1)
              SELECT id_a, id_b, CAST(min(dist) AS INTEGER) AS dist
              FROM (SELECT * FROM p UNION ALL SELECT * FROM sfx)
              GROUP BY 1, 2"""),
      "bidirectional fuzzy blocking: prefix and suffix passes unioned"),

    // Pre-flight block diagnostics for the Levenshtein family (r7 verdict
    // #1: d26's discipline extended to d9/d15's blocking keys) — one row
    // per pass direction: `prefix` profiles d9's head block, `suffix` the
    // reversed-string block the bidirectional second pass keys on. On
    // this corpus the shared "Customer#000" head makes the prefix
    // direction ONE over-cap block (capped pair cost collapses to 0)
    // while the digit-bearing reversed head splinters into small
    // under-cap blocks — the two directions' profiles are the evidence
    // for choosing blockPrefix/maxBlock before either join runs.
    "d29_lev_block_stats" -> QueryDef(
      (s, dir) => Dedup.levBlockStats(
        t(s, dir, "customer").filter(col("c_custkey") <= 400),
        "c_name", blockPrefix = 12, maxBlock = 100),
      Some("""WITH c AS (SELECT c_name AS nm FROM customer
                         WHERE c_custkey <= 400),
              bp AS (SELECT substr(nm, 1, 12) AS blk,
                            CAST(count(*) AS BIGINT) AS n
                     FROM c GROUP BY blk),
              bs AS (SELECT substr(reverse(nm), 1, 12) AS blk,
                            CAST(count(*) AS BIGINT) AS n
                     FROM c GROUP BY blk),
              stat_p AS (SELECT 'prefix' AS direction,
                     CAST(count(*) AS BIGINT) AS n_blocks,
                     max(n) AS max_block,
                     CAST(sum((n * (n - 1)) // 2) AS BIGINT)
                       AS candidate_pairs,
                     CAST(sum(CASE WHEN n > 100 THEN 1 ELSE 0 END)
                       AS BIGINT) AS blocks_over_cap,
                     CAST(sum(CASE WHEN n <= 100 THEN (n * (n - 1)) // 2
                              ELSE 0 END) AS BIGINT) AS pairs_after_cap
                     FROM bp),
              stat_s AS (SELECT 'suffix' AS direction,
                     CAST(count(*) AS BIGINT) AS n_blocks,
                     max(n) AS max_block,
                     CAST(sum((n * (n - 1)) // 2) AS BIGINT)
                       AS candidate_pairs,
                     CAST(sum(CASE WHEN n > 100 THEN 1 ELSE 0 END)
                       AS BIGINT) AS blocks_over_cap,
                     CAST(sum(CASE WHEN n <= 100 THEN (n * (n - 1)) // 2
                              ELSE 0 END) AS BIGINT) AS pairs_after_cap
                     FROM bs)
              SELECT * FROM stat_p UNION ALL SELECT * FROM stat_s"""),
      "Levenshtein blocking pre-flight: both pass directions profiled"),

    // Bloom candidate pre-filter for the decontamination join (the d13
    // shape): the benchmark's shingles compress to their Bloom bit image
    // (<= 32768 rows REGARDLESS of benchmark size — the broadcast side is
    // bounded by the bit space, not the reference), and each corpus doc
    // counts its shingles passing all 3 bits. No false negatives, so
    // n_bloom >= n_exact per doc and non-surfacing docs provably skip
    // the exact join; the output carries both counts, making the FP
    // margin visible. All bit arithmetic is seeded-md5 mod 2^15 — the
    // oracle replays it exactly.
    "d30_bloom_prefilter" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sh = Dedup.shingles(docs).localCheckpoint()
        val benchSh = sh.filter(col("doc_id") % 20 === 0)
          .select("sh").distinct()
        val bits = graft.ext.Sketches.bloomBits(benchSh, "sh")
        val nb = graft.ext.Sketches.bloomPrefilterHits(sh, bits, "sh")
        val ne = sh.join(benchSh, Seq("sh"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_exact"))
        nb.join(ne, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_bloom"),
            coalesce(col("n_exact"), lit(0L)).as("n_exact"))
      },
      Some {
        val m = graft.ext.Sketches.BloomBits
        val bitSel = (0 until graft.ext.Sketches.BloomHashes).map(i =>
          s"SELECT (${sqlHash("sh", graft.ext.Sketches.BloomSeedBase + i)})" +
            s" % $m AS bit FROM bsh").mkString(" UNION ALL ")
        val kbSel = (0 until graft.ext.Sketches.BloomHashes).map(i =>
          s"SELECT doc_id, sh, $i AS i, " +
            s"(${sqlHash("sh", graft.ext.Sketches.BloomSeedBase + i)})" +
            s" % $m AS bit FROM sh").mkString(" UNION ALL ")
        s"""WITH $ShinglesCte,
            bsh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 20 = 0),
            bits AS (SELECT DISTINCT bit FROM ($bitSel)),
            kb AS ($kbSel),
            pass AS (SELECT doc_id, sh FROM kb
                     WHERE bit IN (SELECT bit FROM bits)
                     GROUP BY doc_id, sh HAVING count(*) = 3),
            nb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bloom
                   FROM pass GROUP BY doc_id),
            ne AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_exact
                   FROM sh WHERE sh IN (SELECT sh FROM bsh)
                   GROUP BY doc_id)
            SELECT nb.doc_id, nb.n_bloom,
                   coalesce(ne.n_exact, CAST(0 AS BIGINT)) AS n_exact
            FROM nb LEFT JOIN ne USING (doc_id)"""
      },
      "Bloom pre-filter for decontamination: bit-space-bounded broadcast"),

    // EXACT set-similarity self-join by prefix filtering (AllPairs/PPJoin):
    // every doc pair with shingle-Jaccard >= 0.5, no LSH false negatives,
    // no all-pairs grid. The oracle is deliberately NOT the prefix
    // algorithm — it is the independent brute-force Jaccard over all
    // joined pairs, so a lossy filter bound (the algorithm's whole risk)
    // fails the gate rather than replaying its own mistake.
    "d31_ppjoin" -> QueryDef(
      (s, dir) => Dedup.ppjoinPairs(t(s, dir, "documents"), 0.5),
      Some(s"""WITH $ShinglesCte,
               pp_sizes AS (SELECT doc_id, count(*) AS n
                            FROM sh GROUP BY doc_id),
               pp_inter AS (
                 SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                        count(*) AS n_inter
                 FROM sh a JOIN sh b
                   ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
               SELECT i.doc_a, i.doc_b,
                      round(CAST(n_inter AS DOUBLE)
                            / (na.n + nb.n - n_inter), 4) AS jac
               FROM pp_inter i
               JOIN pp_sizes na ON na.doc_id = i.doc_a
               JOIN pp_sizes nb ON nb.doc_id = i.doc_b
               WHERE round(CAST(n_inter AS DOUBLE)
                           / (na.n + nb.n - n_inter), 4) >= 0.5"""),
      "exact prefix-filtered similarity self-join (AllPairs/PPJoin)"),

    // Pre-flight for d31: the prefix inverted-index profile at t=0.5 —
    // block count, largest list, uncapped candidate cost, what a
    // maxBlock=100 cap would drop. The oracle replays the frequency
    // ranking + prefix selection in SQL window functions (same 1e-9
    // slack literal, so both engines cut identical prefixes).
    "d32_ppjoin_stats" -> QueryDef(
      (s, dir) => Dedup.ppjoinStats(t(s, dir, "documents"), 0.5,
        maxBlock = 100),
      Some(s"""WITH $ShinglesCte,
               pp_df AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
               pp_rank AS (
                 SELECT tk.doc_id, tk.sh,
                        row_number() OVER (PARTITION BY tk.doc_id
                                           ORDER BY d.df, tk.sh) AS pos,
                        count(*) OVER (PARTITION BY tk.doc_id) AS sz
                 FROM sh tk JOIN pp_df d USING (sh)),
               pp_pre AS (SELECT doc_id, sh FROM pp_rank
                          WHERE pos <= sz - ceil(0.5 * sz - 0.000000001) + 1),
               pp_blk AS (SELECT sh, CAST(count(*) AS BIGINT) AS n
                          FROM pp_pre GROUP BY sh)
               SELECT CAST(count(*) AS BIGINT) AS n_blocks,
                      max(n) AS max_block,
                      CAST(sum((n * (n - 1)) // 2) AS BIGINT)
                        AS candidate_pairs,
                      CAST(sum(CASE WHEN n > 100 THEN 1 ELSE 0 END)
                        AS BIGINT) AS blocks_over_cap,
                      CAST(sum(CASE WHEN n <= 100 THEN (n * (n - 1)) // 2
                               ELSE 0 END) AS BIGINT) AS pairs_after_cap
               FROM pp_blk"""),
      "PPJoin pre-flight: prefix inverted-index block profile at t"),

    // Sorted-neighborhood ER blocking (Hernández-Stolfo): two-pass SNM
    // (name order + reversed-name order), 5-record window, Jaro-Winkler
    // verify. The oracle replays both row_number orderings and calls
    // DuckDB's INDEPENDENT jaro_winkler_similarity — blocking topology
    // AND kernel cross-validated in one gate.
    "d33_snm_pairs" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Dedup.sortedNeighborPairs(
          t(s, dir, "customer").filter(col("c_custkey") <= 400),
          "c_custkey", "c_name",
          sortKeys = Seq(col("c_name"), reverse(col("c_name"))),
          window = 5, minSim = 0.95)
      },
      Some("""WITH c AS (SELECT c_custkey AS id, c_name AS nm
                         FROM customer WHERE c_custkey <= 400),
              r1 AS (SELECT id, nm,
                            row_number() OVER (ORDER BY nm, id) AS pos
                     FROM c),
              r2 AS (SELECT id, nm,
                            row_number() OVER (ORDER BY reverse(nm), id)
                              AS pos
                     FROM c),
              p1 AS (SELECT least(a.id, b.id) AS id_a,
                            greatest(a.id, b.id) AS id_b,
                            CASE WHEN a.id < b.id THEN a.nm ELSE b.nm END
                              AS nm_a,
                            CASE WHEN a.id < b.id THEN b.nm ELSE a.nm END
                              AS nm_b
                     FROM r1 a JOIN r1 b
                       ON b.pos BETWEEN a.pos + 1 AND a.pos + 4),
              p2 AS (SELECT least(a.id, b.id) AS id_a,
                            greatest(a.id, b.id) AS id_b,
                            CASE WHEN a.id < b.id THEN a.nm ELSE b.nm END
                              AS nm_a,
                            CASE WHEN a.id < b.id THEN b.nm ELSE a.nm END
                              AS nm_b
                     FROM r2 a JOIN r2 b
                       ON b.pos BETWEEN a.pos + 1 AND a.pos + 4),
              u AS (SELECT DISTINCT id_a, id_b, nm_a, nm_b
                    FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2))
              SELECT id_a, id_b,
                     round(jaro_winkler_similarity(nm_a, nm_b), 4) AS jw
              FROM u
              WHERE round(jaro_winkler_similarity(nm_a, nm_b), 4)
                      >= 0.95"""),
      "sorted-neighborhood ER blocking: 2-pass SNM + JW verify"),

    // Data-quality profile of a table: per-column nulls, exact distinct
    // count, native-typed min/max (cast to string after aggregating). One
    // union branch per column — each branch reads exactly ONE parquet
    // column (pruning), dodging the multi-distinct Expand blowup a
    // single-pass profiler pays.
    "dq1_profile" -> QueryDef(
      (s, dir) => graft.ext.Profile.profile(t(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")),
      Some {
        val branches = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority").map { c =>
          s"""SELECT '$c' AS col_name,
                     count(*) - count($c) AS n_null,
                     count(DISTINCT $c) AS n_distinct,
                     CAST(min($c) AS VARCHAR) AS min_s,
                     CAST(max($c) AS VARCHAR) AS max_s
              FROM orders"""
        }
        branches.mkString(" UNION ALL ")
      },
      "per-column data-quality profile (nulls, distincts, min/max)"),

    // PSI drift monitor between two corpus slices (en vs zh documents over
    // 50-char length buckets): Laplace-smoothed bucket ratios, per-bucket
    // contribution micro-quantized at the ln boundary so totals replay as
    // exact BIGINT sums. Bucket-grain aggregates only — nothing
    // corpus-sized survives the two hash-aggs.
    "dq4_psi_drift" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        graft.ext.Profile.psiDrift(
          docs.filter(col("lang") === "en"),
          docs.filter(col("lang") === "zh"),
          "n_chars", bucketWidth = 50L)
      },
      Some("""WITH rb AS (SELECT CAST(floor(CAST(n_chars AS DOUBLE) / 50) AS BIGINT) AS bucket,
                                 CAST(count(*) AS BIGINT) AS n_ref
                          FROM documents WHERE lang = 'en' GROUP BY 1),
              cb AS (SELECT CAST(floor(CAST(n_chars AS DOUBLE) / 50) AS BIGINT) AS bucket,
                            CAST(count(*) AS BIGINT) AS n_cur
                     FROM documents WHERE lang = 'zh' GROUP BY 1),
              j AS (SELECT coalesce(rb.bucket, cb.bucket) AS bucket,
                           CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
                           CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur
                    FROM rb FULL OUTER JOIN cb ON rb.bucket = cb.bucket),
              tt AS (SELECT CAST(sum(n_ref) AS BIGINT) AS nr,
                            CAST(sum(n_cur) AS BIGINT) AS nc,
                            CAST(count(*) AS BIGINT) AS b
                     FROM j),
              pq AS (SELECT bucket, n_ref, n_cur,
                            CAST(n_ref + 1 AS DOUBLE) / CAST(nr + b AS DOUBLE) AS p,
                            CAST(n_cur + 1 AS DOUBLE) / CAST(nc + b AS DOUBLE) AS q
                     FROM j CROSS JOIN tt)
              SELECT bucket, n_ref, n_cur,
                     CAST(floor((p - q) * ln(p / q) * 1e6 + 0.5) AS BIGINT)
                       AS psi_micro,
                     round(CAST(floor((p - q) * ln(p / q) * 1e6 + 0.5) AS BIGINT) / 1e6, 6)
                       AS psi
              FROM pq"""),
      "PSI drift monitor: Laplace-smoothed bucket distribution shift, micro-quantized"),

    // ---- streaming + generator (oracle replays the spine from the same
    // materialized envelopes — see StreamOracle) ----

    // The full E1 streaming chain executed inside the gate: seeded envelopes
    // → MemoryStream-equivalent batch spine → profile rows. Deterministic
    // (fixed seed + frozen as-of date); Verify materializes the identical
    // envelope stream for the DuckDB replay.
    "st1_stream_spine" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = graft.sources.EnvelopeGenerator.generate(
          StreamOracle.Count, StreamOracle.Seed)
        val raw = docs.toDF("value")
          .select(col("value").cast("binary").as("value"))
        graft.ops.Transforms.etlSpine(raw, Tables.AsOfDate)
      },
      Some(s"""WITH ${StreamOracle.SpineCte}
               SELECT id, username, gender, title, age, email, inscription,
                      full_name, full_address
               FROM spine"""),
      "reference E1 spine over the deterministic producer stand-in"),

    // A3's exact dashboard shape (top-5 registered email domains) over the
    // generated profiles — testdata tables carry no email column. Generated
    // domains are all simple two-label hosts, so the oracle's registered-
    // domain extraction is the plain second-level label.
    "st2_email_topk" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = graft.sources.EnvelopeGenerator.generate(
          StreamOracle.Count, StreamOracle.Seed)
        val raw = docs.toDF("value")
          .select(col("value").cast("binary").as("value"))
        graft.ops.Transforms.etlSpine(raw, Tables.AsOfDate)
          .select(graft.ops.Transforms.emailDomain(col("email")).as("domain"))
          .groupBy("domain").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("domain")).limit(5)
      },
      Some(s"""WITH ${StreamOracle.SpineCte},
               d AS (SELECT string_split(split_part(email, '@', 2), '.') AS parts
                     FROM spine)
               SELECT parts[-2] AS domain, count(*) AS n
               FROM d GROUP BY 1
               ORDER BY n DESC, domain LIMIT 5"""),
      "top-5 email domains (tldextract-analog) on generated profiles"),

    // ---- text analysis ----

    "t1_token_stats" -> QueryDef(
      (s, dir) => t(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        TextAnalysis.wsTokenCount(col("text")).as("n_ws_tokens"),
        TextAnalysis.regexTokenCount(col("text")).as("n_re_tokens")),
      Some("""SELECT doc_id,
                     CAST(length(text) AS INTEGER) AS n_chars,
                     CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
                     CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INTEGER) AS n_re_tokens
              FROM documents"""),
      "token counting: whitespace + regex tokenizers"),

    "t2_quality_score" -> QueryDef(
      (s, dir) => {
        val cols = TextAnalysis.qualityColumns(col("text"))
        t(s, dir, "documents").select(
          col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
      },
      Some {
        val en = TextAnalysis.Lexicons("en").map(w => s"'$w'").mkString(", ")
        s"""SELECT doc_id,
                   CAST(length(text) AS INTEGER) AS n_chars,
                   CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
                   round(CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
                         / len(string_split(text, ' ')), 4) AS mean_token_len,
                   round(CAST(len(list_filter(string_split(text, ' '),
                           x -> list_contains([$en], x))) AS DOUBLE)
                         / len(string_split(text, ' ')), 4) AS stopword_ratio
            FROM documents"""
      },
      "quality scoring: length/token/stopword metrics"),

    "t3_lang_id" -> QueryDef(
      (s, dir) => t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred")),
      Some(s"""SELECT doc_id, $LangPredSql AS lang_pred
               FROM documents"""),
      "deterministic stopword-profile language ID"),

    // Language-ID evaluated against the gold `lang` column: the confusion
    // table (gold, predicted, count) — the eval op a pipeline runs after any
    // classifier change. Deterministic because the predictor is.
    "t7_langid_eval" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("lang"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n")),
      Some(s"""WITH p AS (SELECT lang, $LangPredSql AS lang_pred FROM documents)
               SELECT lang, lang_pred, count(*) AS n
               FROM p GROUP BY lang, lang_pred"""),
      "language-ID confusion table vs gold labels"),

    // Within-doc 3-gram repetition ratio — the "looping text" quality
    // signal; distinct shingles reuse the dedup derivation.
    "t6_repetition" -> QueryDef(
      (s, dir) => TextAnalysis.repetitionStats(t(s, dir, "documents")),
      Some(s"""WITH $ShinglesCte,
               tot AS (SELECT doc_id,
                              CAST(len(string_split(text, ' ')) - 2 AS INTEGER) AS n_total
                       FROM documents
                       WHERE len(string_split(text, ' ')) >= 3),
               dis AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_distinct
                       FROM sh GROUP BY doc_id)
               SELECT t.doc_id, n_total, n_distinct,
                      round(1 - n_distinct / CAST(n_total AS DOUBLE), 4) AS rep_ratio
               FROM tot t JOIN dis USING (doc_id)"""),
      "within-doc 3-gram repetition ratio (looping-text quality signal)"),

    "t4_fingerprint" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp")),
      Some("""SELECT doc_id,
                     md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
              FROM documents"""),
      "normalized md5 document fingerprint"),

    "t5_pii_scrub" -> QueryDef(
      (s, dir) => t(s, dir, "documents").select(
        col("doc_id"),
        md5(TextAnalysis.scrubPii(col("text"))).as("scrub_fp"),
        TextAnalysis.piiCount(col("text")).as("n_pii")),
      Some(s"""SELECT doc_id,
                      md5(regexp_replace(regexp_replace(text,
                            '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
                          '${TextAnalysis.LongNumberRe}', '<NUM>', 'g')) AS scrub_fp,
                      CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailRe}'))
                         + len(regexp_extract_all(text, '${TextAnalysis.LongNumberRe}'))
                        AS INTEGER) AS n_pii
               FROM documents"""),
      "PII scrubbing: emails + long digit runs -> placeholder tokens"),

    // Unicode NFC normalization + control-strip + whitespace collapse — the
    // canonical-spelling step every text pipeline runs before shingles /
    // fingerprints / tokenizers. The native codegen'd NormalizeNfc
    // expression does the NFC (Spark has no builtin; zero-copy fast path on
    // already-normalized text); a decomposed U+0065 U+0301 suffix is
    // injected on BOTH sides so the oracle (DuckDB nfc_normalize) actually
    // verifies the composition arithmetic, not just an ASCII no-op.
    "t12_normalize" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val raw = concat(substring(col("text"), 1, 40), lit("e\u0301"))
        t(s, dir, "documents").select(
          col("doc_id"),
          length(raw).as("n_raw"),
          length(TextAnalysis.cleanText(raw)).as("n_norm"),
          TextAnalysis.cleanText(raw).as("norm"))
      },
      Some("""WITH raw AS (
                SELECT doc_id, substr(text, 1, 40) || 'e' || chr(769) AS r
                FROM documents),
              n AS (
                SELECT doc_id, r,
                       trim(regexp_replace(regexp_replace(nfc_normalize(r),
                         '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
                FROM raw)
              SELECT doc_id, CAST(length(r) AS INTEGER) AS n_raw,
                     CAST(length(norm) AS INTEGER) AS n_norm, norm
              FROM n"""),
      "Unicode NFC + control-strip + whitespace collapse (native expression)"),

    // Model-based quality scoring: hashed bag-of-words linear scorer (the
    // fastText-style filter after the t2 heuristics). Feature hashing means
    // no weight-table join — the "table" is a hash formula; integer-millis
    // weights sum exactly, so the oracle replays the score bit-for-bit.
    "t8_quality_model" -> QueryDef(
      (s, dir) => graft.ext.QualityModel.score(t(s, dir, "documents")),
      Some(s"""WITH tok AS (
                 SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
               w AS (
                 SELECT doc_id,
                        ('0x' || substr(md5('qv:' ||
                           (('0x' || substr(md5('qw:' || tok), 1, 8))::BIGINT % ${graft.ext.QualityModel.NumBuckets})::VARCHAR
                         ), 1, 8))::BIGINT % 2001 - 1000 AS w_m
                 FROM tok),
               g AS (
                 SELECT doc_id, count(*) AS n_toks,
                        CAST(sum(w_m) AS BIGINT) AS s_m
                 FROM w GROUP BY doc_id)
               SELECT doc_id, n_toks,
                      CAST(s_m AS DOUBLE) / 1000.0 / n_toks AS score,
                      (CAST(s_m AS DOUBLE) / 1000.0 / n_toks) > 0.0 AS keep
               FROM g"""),
      "hashed linear quality-model score + keep decision"),

    // Per-source CALIBRATED quality gate: top-20% of each source by model
    // score (rank cut with exact integer ceil, ties by doc_id) — a global
    // threshold over/under-prunes per domain; the calibration table
    // (source, n_docs, n_kept, threshold = lowest kept score) is what a
    // run pins before filtering. No quantile interpolation anywhere, so
    // the replay is exact.
    "t22_calibrated_quality" -> QueryDef(
      (s, dir) => graft.ext.QualityModel.calibratedBySource(
        t(s, dir, "documents"), keepPct = 20),
      Some(s"""WITH tok AS (
                 SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
               w AS (
                 SELECT doc_id,
                        ('0x' || substr(md5('qv:' ||
                           (('0x' || substr(md5('qw:' || tok), 1, 8))::BIGINT % ${graft.ext.QualityModel.NumBuckets})::VARCHAR
                         ), 1, 8))::BIGINT % 2001 - 1000 AS w_m
                 FROM tok),
               g AS (
                 SELECT doc_id, CAST(sum(w_m) AS BIGINT) AS s_m,
                        count(*) AS n_toks
                 FROM w GROUP BY doc_id),
               sc AS (
                 SELECT d.source, g.doc_id,
                        CAST(s_m AS DOUBLE) / 1000.0 / n_toks AS score
                 FROM g JOIN documents d USING (doc_id)),
               r AS (
                 SELECT source, doc_id, score,
                        row_number() OVER (PARTITION BY source
                          ORDER BY score DESC, doc_id) AS rn,
                        count(*) OVER (PARTITION BY source) AS n_s
                 FROM sc)
               SELECT source,
                      CAST(max(n_s) AS BIGINT) AS n_docs,
                      CAST(sum(CASE WHEN rn <= (n_s * 20 + 99) // 100
                                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                      min(CASE WHEN rn <= (n_s * 20 + 99) // 100
                               THEN score END) AS threshold
               FROM r GROUP BY source"""),
      "per-source calibrated quality thresholds (exact rank cut, top-20%)"),

    // Language-label consistency audit: per source, how often the
    // in-engine language ID disagrees with the DECLARED lang column -
    // the metadata-trust check run before any lang-keyed stage
    // (stratified mixing, per-lang dedup) believes supplier labels.
    // One narrow projection + a sources-sized hash-agg.
    "t25_lang_consistency" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        docs.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(TextAnalysis.langId(col("text")) =!= col("lang"), 1L)
              .otherwise(0L)).as("n_mismatch"))
          .withColumn("mismatch_rate",
            round(col("n_mismatch").cast("double") / col("n_docs"), 4))
      },
      Some(s"""WITH p AS (SELECT source, lang, $LangPredSql AS lang_pred
                          FROM documents)
               SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(CASE WHEN lang_pred <> lang THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_mismatch,
                      round(sum(CASE WHEN lang_pred <> lang THEN 1 ELSE 0 END)::DOUBLE
                        / count(*), 4) AS mismatch_rate
               FROM p GROUP BY source"""),
      "language-label trust audit: langID vs declared lang, per source"),

    // Embedding-table quality audit: null / wrong-dim / zero-norm /
    // non-finite vectors plus the micro-quantized mean norm of the good
    // ones - the dq1 analog for the vector column, run before any ANN
    // stage trusts a new embedding drop. One narrow scan, 1-row output.
    "dq6_embedding_audit" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val e = col("embedding")
        val n2 = graft.ext.Similarity.dot(e, e)
        val goodDim = e.isNotNull && size(e) === 64
        val finite = goodDim && !isnan(n2) &&
          n2 =!= lit(Double.PositiveInfinity)
        t(s, dir, "embeddings")
          .select(
            lit(1L).as("one"),
            when(e.isNull, 1L).otherwise(0L).as("is_null"),
            when(e.isNotNull && size(e) =!= 64, 1L).otherwise(0L)
              .as("bad_dim"),
            when(finite && n2 === 0.0, 1L).otherwise(0L).as("zero_norm"),
            when(goodDim && (isnan(n2) ||
              n2 === lit(Double.PositiveInfinity)), 1L).otherwise(0L)
              .as("nonfinite"),
            when(finite,
              floor(sqrt(n2) * lit(1e6) + lit(0.5)).cast("long"))
              .as("norm_q"))
          .agg(sum("one").as("n_vecs"), sum("is_null").as("n_null"),
            sum("bad_dim").as("n_bad_dim"),
            sum("zero_norm").as("n_zero_norm"),
            sum("nonfinite").as("n_nonfinite"),
            round((sum("norm_q").cast("double") /
              count("norm_q")) / 1e6, 6).as("mean_norm"))
      },
      Some("""WITH v AS (SELECT embedding::DOUBLE[] AS e FROM embeddings),
              s AS (SELECT
                      CASE WHEN e IS NULL THEN 1 ELSE 0 END AS is_null,
                      CASE WHEN e IS NOT NULL AND len(e) <> 64
                           THEN 1 ELSE 0 END AS bad_dim,
                      CASE WHEN e IS NOT NULL AND len(e) = 64
                           THEN list_dot_product(e, e) END AS n2
                    FROM v)
              SELECT CAST(count(*) AS BIGINT) AS n_vecs,
                     CAST(sum(is_null) AS BIGINT) AS n_null,
                     CAST(sum(bad_dim) AS BIGINT) AS n_bad_dim,
                     CAST(sum(CASE WHEN n2 = 0 AND isfinite(n2)
                                   THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_zero_norm,
                     CAST(sum(CASE WHEN n2 IS NOT NULL
                                    AND NOT isfinite(n2)
                                   THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_nonfinite,
                     round((CAST(sum(CASE WHEN isfinite(n2) THEN
                         CAST(floor(sqrt(n2) * 1e6 + 0.5) AS BIGINT) END)
                       AS DOUBLE)
                       / count(CASE WHEN isfinite(n2) THEN 1 END)) / 1e6, 6)
                       AS mean_norm
              FROM s"""),
      "embedding-table quality audit: null/dim/zero/non-finite + mean norm"),

    // Vocabulary-coverage audit: per-doc OOV fraction against the corpus
    // top-20 vocabulary head (the pre-tokenizer coverage check). Head =
    // t9's TakeOrdered plan broadcast onto one token scan.
    "t23_vocab_coverage" -> QueryDef(
      (s, dir) => TextAnalysis.vocabCoverage(t(s, dir, "documents"),
        vocabSize = 20),
      Some("""WITH tok AS (SELECT doc_id,
                                  unnest(string_split(text, ' ')) AS tok
                           FROM documents),
              v AS (SELECT tok FROM (
                      SELECT tok, count(*) AS n FROM tok GROUP BY tok
                      ORDER BY n DESC, tok LIMIT 20)),
              j AS (SELECT t.doc_id,
                           CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
                    FROM tok t LEFT JOIN v ON t.tok = v.tok)
              SELECT doc_id, count(*) AS n_toks,
                     CAST(sum(oov) AS BIGINT) AS n_oov,
                     round(sum(oov)::DOUBLE / count(*), 4) AS oov_frac,
                     round(sum(oov)::DOUBLE / count(*), 4) > 0.5 AS flagged
              FROM j GROUP BY doc_id"""),
      "per-doc OOV fraction vs the top-20 corpus vocabulary head"),

    // Document TF-IDF: idf snapped to integer micros right after the ln, so
    // per-term weights and the per-doc sum are exact BIGINTs — the gate
    // compares bit-for-bit despite the transcendental in the middle.
    "t11_tfidf" -> QueryDef(
      (s, dir) => TextAnalysis.tfIdf(t(s, dir, "documents")),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                           FROM documents),
                tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
                dfreq AS (SELECT tok, count(*) AS df
                          FROM (SELECT DISTINCT doc_id, tok FROM tok)
                          GROUP BY tok),
                n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
                w AS (SELECT doc_id,
                             tf * CAST(floor(ln(CAST(n_docs AS DOUBLE) / df) * 1e6 + 0.5) AS BIGINT) AS w_q
                      FROM tf JOIN dfreq USING (tok) CROSS JOIN n)
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
                     CAST(sum(w_q) AS BIGINT) AS tfidf_q,
                     CAST(sum(w_q) AS DOUBLE) / 1e6 AS tfidf
              FROM w GROUP BY doc_id"""),
      "document TF-IDF (micro-quantized log-idf, exact integer sums)"),

    // Boilerplate fraction — the C4-style corpus-frequency filter: the
    // share of each doc's distinct shingles with corpus document frequency
    // >= 4 (templated chrome lights up, original prose stays near 0).
    "t13_boilerplate" -> QueryDef(
      (s, dir) =>
        TextAnalysis.boilerplateFraction(t(s, dir, "documents"), minDf = 4),
      Some(s"""WITH $ShinglesCte,
               dfv AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
               SELECT s.doc_id, count(*) AS n_sh,
                      round(CAST(sum(CASE WHEN d.df >= 4 THEN 1 ELSE 0 END)
                              AS DOUBLE) / count(*), 4) AS boiler_frac
               FROM sh s JOIN dfv d USING (sh)
               GROUP BY s.doc_id"""),
      "boilerplate fraction per doc (corpus-frequent shingle share)"),

    // Perplexity-filter shape: corpus-unigram cross-entropy per doc, -ln p
    // micro-quantized so the gate compares exact integers around the
    // transcendental (same discipline as t11's idf).
    "t14_unigram_xent" -> QueryDef(
      (s, dir) => TextAnalysis.unigramCrossEntropy(t(s, dir, "documents")),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                           FROM documents),
                c AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
                n AS (SELECT count(*) AS n_total FROM tok),
                w AS (SELECT doc_id,
                             CAST(floor(-ln(CAST(c AS DOUBLE) / n_total) * 1e6
                               + 0.5) AS BIGINT) AS nll_q
                      FROM tok JOIN c USING (tok) CROSS JOIN n)
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
                     CAST(sum(nll_q) AS BIGINT) AS s_q,
                     round(CAST(sum(nll_q) AS DOUBLE) / 1e6 / count(*), 6) AS xent
              FROM w GROUP BY doc_id"""),
      "corpus-unigram cross-entropy (perplexity-filter shape)"),

    // The published Gopher word-level quality filter (Rae et al. 2021
    // appendix A): per-doc rule statistics + the pass verdict. The verdict
    // compares the ROUNDED ratios on both sides, so the boolean replays
    // exactly.
    "t15_gopher_rules" -> QueryDef(
      (s, dir) => TextAnalysis.gopherRules(t(s, dir, "documents"),
        minWords = 50),
      Some(s"""WITH $GopherCtes
               SELECT * FROM gq"""),
      "Gopher word-level quality rules: exact stats + pass verdict"),

    // The Gopher REPETITION rule family (within-document): fraction of
    // characters in the most common word {2,3,4}-gram, plus the fraction
    // of tokens covered by ANY duplicated 5-gram (exact coverage — the
    // d18-style positions→covered-index expansion, all occurrences, no
    // double counting), with the panel verdict at the paper's thresholds
    // compared on ROUNDED fractions so it replays bit-for-bit.
    "t19_gopher_repetition" -> QueryDef(
      (s, dir) => TextAnalysis.gopherRepetition(t(s, dir, "documents")),
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks,
                                CAST(length(text) AS INTEGER) AS n_chars,
                                CAST(len(string_split(text, ' ')) AS INTEGER)
                                  AS n_tokens
                         FROM documents),
              g2 AS (SELECT doc_id, n_chars,
                            unnest([toks[i] || ' ' || toks[i+1]
                                    for i in generate_series(1, len(toks) - 1)]) AS g
                     FROM w WHERE len(toks) >= 2),
              c2 AS (SELECT doc_id, n_chars, g, count(*) AS c
                     FROM g2 GROUP BY 1, 2, 3),
              t2 AS (SELECT doc_id,
                            round(CAST(c AS DOUBLE) * length(g) / n_chars, 4)
                              AS top2_frac
                     FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                             ORDER BY c DESC, g) AS rn FROM c2)
                     WHERE rn = 1),
              g3 AS (SELECT doc_id, n_chars,
                            unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                    for i in generate_series(1, len(toks) - 2)]) AS g
                     FROM w WHERE len(toks) >= 3),
              c3 AS (SELECT doc_id, n_chars, g, count(*) AS c
                     FROM g3 GROUP BY 1, 2, 3),
              t3 AS (SELECT doc_id,
                            round(CAST(c AS DOUBLE) * length(g) / n_chars, 4)
                              AS top3_frac
                     FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                             ORDER BY c DESC, g) AS rn FROM c3)
                     WHERE rn = 1),
              g4 AS (SELECT doc_id, n_chars,
                            unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                                    for i in generate_series(1, len(toks) - 3)]) AS g
                     FROM w WHERE len(toks) >= 4),
              c4 AS (SELECT doc_id, n_chars, g, count(*) AS c
                     FROM g4 GROUP BY 1, 2, 3),
              t4 AS (SELECT doc_id,
                            round(CAST(c AS DOUBLE) * length(g) / n_chars, 4)
                              AS top4_frac
                     FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                             ORDER BY c DESC, g) AS rn FROM c4)
                     WHERE rn = 1),
              p5 AS (SELECT doc_id, u.pos AS pos, u.g AS g FROM
                       (SELECT doc_id,
                               unnest([{'pos': i,
                                        'g': toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]}
                                       for i in generate_series(1, len(toks) - 4)]) AS u
                        FROM w WHERE len(toks) >= 5)),
              d5 AS (SELECT doc_id, g FROM p5
                     GROUP BY doc_id, g HAVING count(*) > 1),
              cov AS (SELECT DISTINCT p.doc_id, p.pos + x.d AS ti
                      FROM p5 p JOIN d5 USING (doc_id, g)
                      CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS d) x),
              cn AS (SELECT doc_id, count(*) AS n_cov FROM cov GROUP BY doc_id),
              asm AS (SELECT w.doc_id, w.n_chars, w.n_tokens,
                             coalesce(t2.top2_frac, 0.0) AS top2_frac,
                             coalesce(t3.top3_frac, 0.0) AS top3_frac,
                             coalesce(t4.top4_frac, 0.0) AS top4_frac,
                             round(CAST(coalesce(cn.n_cov, 0) AS DOUBLE)
                               / w.n_tokens, 4) AS dup5_frac
                      FROM w
                      LEFT JOIN t2 USING (doc_id)
                      LEFT JOIN t3 USING (doc_id)
                      LEFT JOIN t4 USING (doc_id)
                      LEFT JOIN cn USING (doc_id))
              SELECT *, (top2_frac <= 0.20 AND top3_frac <= 0.18
                         AND top4_frac <= 0.16 AND dup5_frac <= 0.15)
                        AS rep_pass
              FROM asm"""),
      "Gopher repetition rules: top-ngram char + dup-5gram coverage fracs"),

    // ---- the composed pipeline: every curation stage as ONE DAG ----
    // Each signal below is individually oracle-gated elsewhere (t3, t15,
    // d1, d3/d6/d7, d13, sp1); this entry gates their COMPOSITION — the
    // per-document disposition audit a production curation run reports.
    // The oracle assembles the same proven CTE chains (LshPairsCtes,
    // GopherCtes, LangPredSql, the sp1 bucket expression) into one
    // statement, so a divergence in any stage OR in the assembly fails the
    // hash.
    "pipe1_curation_report" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val docs = t(s, dir, "documents")
        val emb = t(s, dir, "embeddings")
        Curation.curationReport(docs,
          bench = docs.filter(col("doc_id") % 20 === 0),
          embeddings = Some((emb.filter(col("vec_id") >= 10),
            emb.filter(col("vec_id") < 10))),
          withSignals = true)
      },
      Some(Pipe1Sql),
      "composed curation pipeline: per-doc disposition audit (gates + graded signal panel)"),

    // The data card: pipe1's per-doc dispositions rolled into the ONE-ROW
    // corpus report every dataset release ships — gate pass counts, split
    // sizes, surviving span tokens, keep rate in exact integer permille.
    // Same derivation as pipe1 (the oracle literally wraps Pipe1Sql in
    // one outer aggregate), so the two can never drift.
    "pipe5_data_card" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val docs = t(s, dir, "documents")
        val emb = t(s, dir, "embeddings")
        Curation.curationReport(docs,
          bench = docs.filter(col("doc_id") % 20 === 0),
          embeddings = Some((emb.filter(col("vec_id") >= 10),
            emb.filter(col("vec_id") < 10))))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
            sum(when(col("lang_ok"), 1L).otherwise(0L)).as("n_lang_ok"),
            sum(when(col("quality_ok"), 1L).otherwise(0L))
              .as("n_quality_ok"),
            sum(when(col("exact_keeper"), 1L).otherwise(0L))
              .as("n_exact_keeper"),
            sum(when(col("neardup_keeper"), 1L).otherwise(0L))
              .as("n_neardup_keeper"),
            sum(when(col("contaminated"), 1L).otherwise(0L))
              .as("n_contaminated"),
            sum(when(col("embed_contaminated"), 1L).otherwise(0L))
              .as("n_embed_contaminated"),
            sum(col("span_kept").cast("long")).as("span_tokens_kept"),
            sum(when(col("split") === "train", 1L).otherwise(0L))
              .as("n_train"),
            sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
            sum(when(col("split") === "test", 1L).otherwise(0L))
              .as("n_test"))
          .withColumn("keep_permille", expr("n_keep * 1000 div n_docs"))
      },
      Some(s"""SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_keep,
                 CAST(sum(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_lang_ok,
                 CAST(sum(CASE WHEN quality_ok THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_quality_ok,
                 CAST(sum(CASE WHEN exact_keeper THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_exact_keeper,
                 CAST(sum(CASE WHEN neardup_keeper THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_neardup_keeper,
                 CAST(sum(CASE WHEN contaminated THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_contaminated,
                 CAST(sum(CASE WHEN embed_contaminated THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_embed_contaminated,
                 CAST(sum(span_kept) AS BIGINT) AS span_tokens_kept,
                 CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_train,
                 CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_val,
                 CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_test,
                 CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1000
                   // count(*) AS BIGINT) AS keep_permille
               FROM ($Pipe1Sql)"""),
      "one-row corpus data card: gate counts, splits, keep rate"),

    // Flagship composition #2 — the WRITE side to pipe1's audit: split →
    // temperature-¼ source mixture → sliding-window chunking →
    // token-budget packing, ending in the per-pack shard manifest. Every
    // stage is an already-gated operator; the oracle replays the identical
    // md5/sqrt/slice/window arithmetic end-to-end.
    "pipe2_training_assembly" -> QueryDef(
      (s, dir) => Curation.trainingAssembly(t(s, dir, "documents"),
        alphaLog2 = 2, chunkSize = ChunkSize, overlap = ChunkOverlap,
        budget = 256),
      Some(s"""WITH tr AS (SELECT doc_id, source, text FROM documents
                           WHERE ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 80),
               cnt AS (SELECT source, count(*) AS c FROM tr
                       WHERE source IS NOT NULL GROUP BY 1),
               mn AS (SELECT min(c) AS cmin FROM cnt),
               rt AS (SELECT source,
                             greatest(1, CAST(floor(100 * sqrt(sqrt(CAST(cmin AS DOUBLE) / c))) AS INTEGER)) AS rate
                      FROM cnt CROSS JOIN mn),
               mx AS (SELECT tr.doc_id, tr.text FROM tr JOIN rt USING (source)
                      WHERE ('0x' || substr(md5('temp:' || tr.doc_id::VARCHAR), 1, 8))::BIGINT % 100 < rate),
               cw AS (SELECT doc_id, string_split(text, ' ') AS toks FROM mx),
               cs AS (SELECT doc_id, toks,
                             unnest(generate_series(0, len(toks) - 1, $ChunkStep)) AS start
                      FROM cw),
               cf AS (SELECT * FROM cs
                      WHERE start = 0 OR start + $ChunkOverlap < len(toks)),
               ck AS (SELECT doc_id,
                             doc_id * 100000 + CAST(start / $ChunkStep AS INTEGER) AS cid,
                             CAST(len(toks[start + 1 : start + $ChunkSize]) AS INTEGER) AS n_toks
                      FROM cf),
               pk AS (SELECT *,
                             ('0x' || substr(md5('pack:' || cid::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
                      FROM ck),
               cum AS (SELECT *,
                              coalesce(sum(CAST(n_toks AS BIGINT)) OVER (
                                PARTITION BY bucket ORDER BY cid
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumx
                       FROM pk)
               SELECT bucket, CAST(cumx // 256 AS BIGINT) AS pack_id,
                      CAST(count(*) AS BIGINT) AS n_chunks,
                      CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                      CAST(sum(n_toks) AS BIGINT) AS n_tokens,
                      round(sum(n_toks)::DOUBLE / 256, 4) AS fill
               FROM cum GROUP BY 1, 2"""),
      "training-set assembly: split -> temperature mixture -> chunk -> pack manifest"),

    // ---- deterministic splitting / sampling / packing ----

    // Decontamination audit: every verified near-dup pair with both sides'
    // split assignment; `leaks` flags pairs crossing a split boundary.
    "sp4_split_leakage" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        graft.ext.Sampling.splitLeakage(
          Dedup.minhashDedupPairs(docs, 0.5, maxBucket = Int.MaxValue), docs)
      },
      Some(s"""WITH $LshPairsCtes,
               splits AS (
                 SELECT doc_id,
                        CASE WHEN b < 80 THEN 'train'
                             WHEN b < 90 THEN 'val'
                             ELSE 'test' END AS split
                 FROM (SELECT doc_id,
                              ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS b
                       FROM documents))
               SELECT p.doc_a, p.doc_b, a.split AS split_a, b.split AS split_b,
                      (a.split <> b.split) AS leaks
               FROM lsh_pairs p
               JOIN splits a ON a.doc_id = p.doc_a
               JOIN splits b ON b.doc_id = p.doc_b"""),
      "near-dup pairs crossing train/val/test boundaries (leakage audit)"),

    // Training-mixture table: per (split, source) doc/token counts and the
    // source's share of its split.
    "sp5_source_mix" -> QueryDef(
      (s, dir) => graft.ext.Sampling.sourceMix(t(s, dir, "documents")),
      Some("""WITH s AS (
                SELECT doc_id, source,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                       ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS b
                FROM documents),
              g AS (
                SELECT CASE WHEN b < 80 THEN 'train'
                            WHEN b < 90 THEN 'val'
                            ELSE 'test' END AS split,
                       source, count(*) AS n_docs,
                       CAST(sum(n_toks) AS BIGINT) AS n_tokens
                FROM s GROUP BY 1, 2)
              SELECT split, source, n_docs, n_tokens,
                     round(n_docs / CAST(sum(n_docs) OVER (PARTITION BY split) AS DOUBLE), 4) AS frac
              FROM g"""),
      "per-(split, source) mixture stats with split-relative fractions"),

    "sp1_hash_split" -> QueryDef(
      (s, dir) => graft.ext.Sampling.hashSplit(
        t(s, dir, "documents").select("doc_id"), "doc_id"),
      Some("""SELECT doc_id,
                     CASE WHEN b < 80 THEN 'train'
                          WHEN b < 90 THEN 'val'
                          ELSE 'test' END AS split
              FROM (SELECT doc_id,
                           ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS b
                    FROM documents)"""),
      "deterministic md5-bucket train/val/test split"),

    "sp3_hash_sample" -> QueryDef(
      (s, dir) => graft.ext.Sampling.hashSample(
        t(s, dir, "documents").select("doc_id"), "doc_id", pct = 10),
      Some("""SELECT doc_id FROM documents
              WHERE ('0x' || substr(md5('sample:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 10"""),
      "deterministic ~10% sample (same rows every run, any cluster)"),

    // Deterministic k-per-group sample: rank by a stable md5-derived score
    // inside each group and keep the top k — "give me 5 random-but-
    // reproducible docs per source" without a window sort over the corpus.
    // The TypedTopK bounded-heap aggregate ships k rows per group off each
    // map task (partial agg), so the shuffle carries O(groups·k), not the
    // corpus. The 32-bit hash is exact as a double (< 2^53).
    "sp8_group_sample" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val score = conv(substring(md5(concat(lit("gs:"),
          col("doc_id").cast("string"))), 1, 8), 16, 10)
          .cast("long").cast("double")
        t(s, dir, "documents")
          .groupBy("source")
          .agg(graft.functions.GraftFunctions.topK(
            score, col("doc_id"), 5).as("top"))
          .select(col("source"), posexplode(col("top")))
          .select(col("source"), col("col.id").as("doc_id"),
            (col("pos") + 1).cast("int").as("rn"))
      },
      Some("""SELECT source, doc_id, rn FROM (
                SELECT source, doc_id,
                       row_number() OVER (PARTITION BY source
                         ORDER BY ('0x' || substr(md5('gs:' || doc_id::VARCHAR), 1, 8))::BIGINT DESC,
                                  doc_id) AS rn
                FROM documents) WHERE rn <= 5"""),
      "deterministic k-per-group sample via bounded-heap top-k aggregate"),

    // Sqrt-smoothed (temperature) mixture resampling over the skewed lang
    // column: rates derived in-engine from stratum counts
    // (floor(100·sqrt(cmin/c))), rarest language kept whole, dominant
    // downsampled — α=1/2 because sqrt is IEEE-correctly-rounded, so the
    // derived rate table replays exactly in DuckDB.
    "sp9_sqrt_mixture" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val kept = graft.ext.Sampling
          .sqrtMixtureSample(docs, "doc_id", "lang")
          .groupBy("lang").agg(count(lit(1)).as("n_kept"))
        // the SAME derived rate table the sample used (shared helper —
        // displayed rates cannot drift from applied rates)
        graft.ext.Sampling.sqrtMixtureRates(docs, "lang")
          .join(kept, Seq("lang"), "left")
          .select(col("lang"), col("rate"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      },
      Some("""WITH c AS (SELECT lang, count(*) AS c FROM documents
                         WHERE lang IS NOT NULL GROUP BY 1),
              m AS (SELECT min(c) AS cmin FROM c),
              r AS (SELECT lang,
                           greatest(1, CAST(floor(100 * sqrt(CAST(cmin AS DOUBLE) / c)) AS INTEGER)) AS rate
                    FROM c CROSS JOIN m),
              k AS (SELECT d.lang, count(*) AS n_kept
                    FROM documents d JOIN r USING (lang)
                    WHERE ('0x' || substr(md5('temp:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 < rate
                    GROUP BY 1)
              SELECT r.lang, r.rate, coalesce(k.n_kept, 0) AS n_kept
              FROM r LEFT JOIN k USING (lang)"""),
      "sqrt-smoothed mixture resampling (rates derived in-engine)"),

    // The α-generalized temperature mixture at α = ¼ (two NESTED sqrts —
    // each IEEE-correctly-rounded, so the whole α = 1/2^k family replays
    // bit-for-bit where a general pow() cannot): dominant strata damped
    // harder than sp9's √, the flatter mix multilingual runs reach for
    // when the head language still dominates after √-smoothing.
    "sp17_temperature_mix" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val kept = graft.ext.Sampling
          .temperatureMixtureSample(docs, "doc_id", "lang", alphaLog2 = 2)
          .groupBy("lang").agg(count(lit(1)).as("n_kept"))
        graft.ext.Sampling.temperatureMixtureRates(docs, "lang", alphaLog2 = 2)
          .join(kept, Seq("lang"), "left")
          .select(col("lang"), col("rate"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      },
      Some("""WITH c AS (SELECT lang, count(*) AS c FROM documents
                         WHERE lang IS NOT NULL GROUP BY 1),
              m AS (SELECT min(c) AS cmin FROM c),
              r AS (SELECT lang,
                           greatest(1, CAST(floor(100 * sqrt(sqrt(CAST(cmin AS DOUBLE) / c))) AS INTEGER)) AS rate
                    FROM c CROSS JOIN m),
              k AS (SELECT d.lang, count(*) AS n_kept
                    FROM documents d JOIN r USING (lang)
                    WHERE ('0x' || substr(md5('temp:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 < rate
                    GROUP BY 1)
              SELECT r.lang, r.rate, coalesce(k.n_kept, 0) AS n_kept
              FROM r LEFT JOIN k USING (lang)"""),
      "temperature-1/4 mixture resampling (nested-sqrt IEEE-exact alpha family)"),

    // The upsampling half of mixture balance: scarce languages REPLICATE
    // toward the dominant one (rate = floor(100·√(cmax/c)) ≥ 100; full
    // copies + a stable-hash fractional copy). Narrow explode, replicas
    // tagged for downstream dedup/packing.
    "sp10_upsample" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val orig = docs.filter(col("lang").isNotNull)
          .groupBy("lang").agg(count(lit(1)).as("n_orig"))
        graft.ext.Sampling.sqrtUpsample(docs, "doc_id", "lang")
          .groupBy("lang").agg(count(lit(1)).as("n_after"))
          .join(orig, "lang")
          .select(col("lang"), col("n_orig"), col("n_after"))
      },
      Some("""WITH c AS (SELECT lang, count(*) AS c FROM documents
                         WHERE lang IS NOT NULL GROUP BY 1),
              m AS (SELECT max(c) AS cmax FROM c),
              r AS (SELECT lang,
                           CAST(floor(100 * sqrt(CAST(cmax AS DOUBLE) / c)) AS INTEGER) AS rate
                    FROM c CROSS JOIN m),
              x AS (SELECT d.lang,
                           (rate // 100) + CASE WHEN
                             ('0x' || substr(md5('up:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100
                               < rate % 100 THEN 1 ELSE 0 END AS n
                    FROM documents d JOIN r USING (lang))
              SELECT x.lang, c.c AS n_orig, CAST(sum(x.n) AS BIGINT) AS n_after
              FROM x JOIN c USING (lang)
              GROUP BY x.lang, c.c"""),
      "scarce-stratum upsampling: sqrt-normalized replication to the head"),

    // Global curriculum order: exact corpus-wide position under
    // (quality desc, id) — the scalable two-pass form (range-partitioned
    // sort + zipWithIndex partition offsets), NOT a single-partition
    // row_number window. Oracle: the same order as row_number()-1.
    "sp11_curriculum" -> QueryDef(
      (s, dir) => graft.ext.Sampling.globalOrder(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        Seq(col("n_chars").desc, col("doc_id").asc)),
      Some("""SELECT doc_id, n_chars,
                     CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
                       - 1 AS BIGINT) AS position
              FROM documents"""),
      "scalable global ordering via range sort + partition-offset indexing"),

    // Stratified deterministic sampling: per-stratum keep rates (dominant
    // `en` cut to 20%, scarce `zh` kept whole, default 50%) — the
    // mixture-shaping knob over the same stable md5 bucket; still a pure
    // narrow filter, no shuffle, no per-stratum scan.
    "sp6_stratified" -> QueryDef(
      (s, dir) => graft.ext.Sampling.stratifiedSample(
        t(s, dir, "documents").select("doc_id", "lang"),
        "doc_id", "lang", Map("en" -> 20, "zh" -> 100), defaultPct = 50),
      Some("""SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       ('0x' || substr(md5('strat:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS b
                FROM documents)
              WHERE b < CASE WHEN lang = 'en' THEN 20
                             WHEN lang = 'zh' THEN 100
                             ELSE 50 END"""),
      "stratified deterministic sample (per-stratum md5-bucket keep rates)"),

    // Sliding-window chunking (32-token windows, 8-token overlap): the
    // context-window prep between cleaning and packing. Narrow
    // split/sequence/slice all the way — the oracle replays the identical
    // 1-based slice arithmetic.
    "sp7_chunk_windows" -> QueryDef(
      (s, dir) => graft.ext.Sampling.chunkDocuments(
        t(s, dir, "documents"), chunkSize = ChunkSize, overlap = ChunkOverlap),
      Some(s"""WITH $ChunkCtes
              SELECT doc_id, chunk_id, CAST(len(ct) AS INTEGER) AS n_toks,
                     array_to_string(ct, ' ') AS chunk
              FROM c"""),
      "sliding-window token chunking (32-token windows, 8 overlap)"),

    // Corpus vocabulary head: global token frequencies, top 20 — the Zipf
    // head every tokenizer/filter audit starts from. Map-side partial
    // count + TakeOrderedAndProject: k rows per partition cross the wire,
    // never the full vocabulary.
    "t9_vocab_topk" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("tok"))
        .limit(20),
      Some("""SELECT tok, CAST(count(*) AS BIGINT) AS n
              FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
              GROUP BY tok
              ORDER BY n DESC, tok
              LIMIT 20"""),
      "global vocabulary top-20 (Zipf head)"),

    // SpaceSaving heavy hitters over the token stream: the sketch form of
    // t9 — one capacity-bounded buffer per partition crosses the wire
    // regardless of domain cardinality (t9's exact form shuffles a row per
    // DISTINCT token; fine at vocab 31, painful at a billion n-grams). The
    // gate runs in the exact regime (capacity 64 > vocab 31 ⇒ no evictions,
    // err = 0, partition-independent — same posture as g6/g6b); eviction
    // error bounds are pinned in SpaceSavingSpec.
    "t10_heavy_hitters" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        t(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("tok"))
          .agg(graft.functions.GraftFunctions.heavyHitters(col("tok"), 64, 10)
            .as("hh"))
          .select(posexplode(col("hh")))
          .select((col("pos") + 1).cast("int").as("rank"),
            col("col.item").as("tok"), col("col.n").as("n"),
            col("col.err").as("err"))
      },
      Some("""SELECT CAST(row_number() OVER (ORDER BY n DESC, tok) AS INTEGER) AS rank,
                     tok, n, CAST(0 AS BIGINT) AS err
              FROM (SELECT tok, CAST(count(*) AS BIGINT) AS n
                    FROM (SELECT unnest(string_split(text, ' ')) AS tok
                          FROM documents)
                    GROUP BY tok)
              ORDER BY n DESC, tok
              LIMIT 10"""),
      "SpaceSaving heavy hitters (exact regime at gate scale)"),

    // Count-Min frequency sketch beside t10's SpaceSaving: depth×width
    // counter rows (4×1024 TOTAL, regardless of vocabulary) built in one
    // hash-agg with map-side combine; point estimates = min over rows
    // via a broadcast join. The gate queries the exact top-20 tokens and
    // outputs exact vs estimate side by side — CMS never underestimates
    // (collisions only add), and the collision margin is visible in the
    // artifact. All bucket hashing is seeded-md5 mod width, replayed
    // exactly by the oracle.
    "t28_cms_counts" -> QueryDef(
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("tok"))
        val counters = graft.ext.Sketches.cmsCounters(toks, "tok")
        val keys = toks.groupBy("tok").agg(count(lit(1)).as("exact_n"))
          .orderBy(desc("exact_n"), asc("tok")).limit(20)
        graft.ext.Sketches.cmsEstimate(counters, keys.select("tok"), "tok")
          .join(keys, Seq("tok"))
          .select("tok", "exact_n", "cms_n")
      },
      Some {
        val w = graft.ext.Sketches.CmsWidth
        val cntSel = (0 until graft.ext.Sketches.CmsDepth).map(r =>
          s"SELECT $r AS r, " +
            s"(${sqlHash("tok", graft.ext.Sketches.CmsSeedBase + r)})" +
            s" % $w AS b FROM tok").mkString(" UNION ALL ")
        val kbSel = (0 until graft.ext.Sketches.CmsDepth).map(r =>
          s"SELECT tok, exact_n, $r AS r, " +
            s"(${sqlHash("tok", graft.ext.Sketches.CmsSeedBase + r)})" +
            s" % $w AS b FROM keys").mkString(" UNION ALL ")
        s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok
                         FROM documents),
            cnt AS (SELECT r, b, CAST(count(*) AS BIGINT) AS c
                    FROM ($cntSel) GROUP BY r, b),
            keys AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_n
                     FROM tok GROUP BY tok
                     ORDER BY exact_n DESC, tok LIMIT 20),
            kb AS ($kbSel)
            SELECT kb.tok, kb.exact_n,
                   min(coalesce(c.c, CAST(0 AS BIGINT))) AS cms_n
            FROM kb LEFT JOIN cnt c ON kb.r = c.r AND kb.b = c.b
            GROUP BY kb.tok, kb.exact_n"""
      },
      "Count-Min sketch estimates vs exact counts for the top-20 tokens"),

    // Benford first-digit audit: the fabricated-data / unit-mixup
    // tripwire. First digits via string arithmetic on the truncated
    // integer part (never floor(log10) — its ulp at powers of ten can
    // flip digits cross-engine); expected shares are PRE-quantized
    // Scala constants inlined into both plans, so no libm is trusted.
    "dq8_benford" -> QueryDef(
      (s, dir) => graft.ext.Profile.benfordAudit(
        t(s, dir, "lineitem"), "l_extendedprice"),
      Some {
        val exp = graft.ext.Profile.BenfordMicro
          .map { case (d, m) => s"($d, $m)" }.mkString(", ")
        s"""WITH d AS (SELECT CAST(substring(CAST(CAST(floor(
                         l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1)
                         AS INTEGER) AS digit
                       FROM lineitem WHERE l_extendedprice >= 1),
            c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
                  FROM d GROUP BY digit),
            tt AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
            ex(digit, em) AS (VALUES $exp)
            SELECT c.digit, c.n,
                   CAST((c.n * 1000000) // tt.total AS BIGINT)
                     AS share_micro,
                   CAST(ex.em AS BIGINT) AS expected_micro,
                   CAST(abs((c.n * 1000000) // tt.total - ex.em) AS BIGINT)
                     AS dev_micro
            FROM c CROSS JOIN tt JOIN ex ON ex.digit = c.digit"""
      },
      "Benford first-digit audit of extended price (pre-quantized law)"),

    // Exact equi-depth deciles: lower order statistics at ceil(j*n/10) —
    // what approx_percentile approximates and interpolating percentiles
    // render engine-dependent; an order statistic is an integer every
    // engine agrees on. Routed through the TWO-LEVEL kernel (r10 verdict
    // #2: it measured faster than the single-partition window at
    // identical 10× grain — 3.8-4.5 vs 5.1-5.4 s sf1 — and is
    // bit-identical by spec); the one-level form remains the reference
    // implementation the spec pins against and the sf1 A/B leg prices.
    "dq11_equidepth" -> QueryDef(
      (s, dir) => graft.ext.Profile.orderStatQuantilesTwoLevel(
        t(s, dir, "lineitem"), "l_extendedprice", k = 10),
      Some("""WITH vq AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5)
                              AS BIGINT) AS vq
                          FROM lineitem
                          WHERE l_extendedprice IS NOT NULL),
              c1 AS (SELECT vq, CAST(count(*) AS BIGINT) AS c
                     FROM vq GROUP BY vq),
              n1 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c1),
              cum AS (SELECT vq, CAST(sum(c) OVER (ORDER BY vq
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                      FROM c1),
              qs AS (SELECT CAST(unnest(generate_series(1, 10)) AS INTEGER)
                              AS q)
              SELECT q, max(rank) AS rank, min(vq) AS vq
              FROM (SELECT qs.q, (qs.q * n1.n + 9) // 10 AS rank,
                           cum.vq, cum.cum
                    FROM cum CROSS JOIN n1 CROSS JOIN qs)
              WHERE cum >= rank GROUP BY q"""),
      "exact equi-depth deciles via distinct-value-grain order statistics"),

    // k-anonymity / l-diversity audit: equivalence-class sizes over the
    // (nation, segment) quasi-identifiers with account-balance cents as
    // the sensitive attribute — the privacy pre-flight that says whether
    // pseudonymization is even meaningful (a hashed id does not help the
    // one person in a class of size 1). Power-of-two size buckets by
    // binary width, min l-diversity per bucket.
    "dq10_kanonymity" -> QueryDef(
      (s, dir) => graft.ext.Profile.kAnonymityAudit(
        t(s, dir, "customer")
          .withColumn("bal_cents",
            floor(col("c_acctbal") * lit(100) + lit(0.5)).cast("long")),
        Seq("c_nationkey", "c_mktsegment"), "bal_cents"),
      Some("""WITH cls AS (SELECT c_nationkey, c_mktsegment,
                     CAST(count(*) AS BIGINT) AS sz,
                     CAST(count(DISTINCT CAST(floor(c_acctbal * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS l_div
                     FROM customer GROUP BY 1, 2)
              SELECT CAST(length(bin(sz)) AS INTEGER) AS size_bucket,
                     CAST(count(*) AS BIGINT) AS n_classes,
                     CAST(sum(sz) AS BIGINT) AS n_rows,
                     min(sz) AS min_size, max(sz) AS max_size,
                     min(l_div) AS min_l_diversity
              FROM cls GROUP BY 1"""),
      "k-anonymity/l-diversity audit over (nation, segment) classes"),

    // Robust median/MAD outlier audit: 50%-breakdown fences (mean/stddev
    // z-scores are corrupted by the very outliers they hunt). Both
    // medians are exact LOWER order statistics selected at distinct-
    // value grain (no interpolation, no row-grain global sort); the
    // 0.6745·dev/MAD > 3.5 flag cross-multiplies into pure integers.
    "dq9_mad_outliers" -> QueryDef(
      (s, dir) => graft.ext.Profile.madOutlierStats(
        t(s, dir, "lineitem"), "l_extendedprice"),
      Some("""WITH vq AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5)
                              AS BIGINT) AS vq
                          FROM lineitem
                          WHERE l_extendedprice IS NOT NULL),
              c1 AS (SELECT vq, CAST(count(*) AS BIGINT) AS c
                     FROM vq GROUP BY vq),
              n1 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c1),
              m1 AS (SELECT min(vq) AS med_q FROM (
                       SELECT vq, sum(c) OVER (ORDER BY vq
                         ROWS UNBOUNDED PRECEDING) AS cum
                       FROM c1) CROSS JOIN n1
                     WHERE cum >= (n + 1) // 2),
              dev AS (SELECT abs(vq.vq - m1.med_q) AS dv
                      FROM vq CROSS JOIN m1),
              c2 AS (SELECT dv, CAST(count(*) AS BIGINT) AS c
                     FROM dev GROUP BY dv),
              m2 AS (SELECT min(dv) AS mad_q FROM (
                       SELECT dv, sum(c) OVER (ORDER BY dv
                         ROWS UNBOUNDED PRECEDING) AS cum
                       FROM c2) CROSS JOIN n1
                     WHERE cum >= (n + 1) // 2)
              SELECT (SELECT n FROM n1) AS n,
                     (SELECT med_q FROM m1) AS median_q,
                     (SELECT mad_q FROM m2) AS mad_q,
                     CAST(sum(CASE WHEN 6745 * dv >
                            35000 * (SELECT mad_q FROM m2)
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
              FROM dev"""),
      "median/MAD robust outlier audit (exact order-statistic medians)"),

    // CUPED variance-reduced A/B readout (Deng, Xu, Kohavi & Walker,
    // WSDM 2013): adjust each user's experiment-period metric by their
    // pre-period covariate (θ = cov/var, pooled), self-calibrating
    // midpoint split, arms = user_id % 2. Centi-quantized per-event
    // values make every pooled sum an exact BIGINT; θ and the arm means
    // are fixed-shape doubles over those sums.
    "ab1_cuped" -> QueryDef(
      (s, dir) => graft.ext.Experiment.cuped(t(s, dir, "events")),
      Some("""WITH ev AS (SELECT user_id, epoch_ns(ts) AS tn,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS vq
                     FROM events),
              mid AS (SELECT (min(tn) + max(tn)) // 2 AS t_mid FROM ev),
              u AS (SELECT user_id AS usr,
                           CAST(sum(CASE WHEN tn < t_mid THEN vq
                                         ELSE 0 END) AS BIGINT) AS x,
                           CAST(sum(CASE WHEN tn >= t_mid THEN vq
                                         ELSE 0 END) AS BIGINT) AS y
                    FROM ev CROSS JOIN mid GROUP BY user_id),
              p AS (SELECT CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(x) AS BIGINT) AS sx,
                           CAST(sum(y) AS BIGINT) AS sy,
                           CAST(sum(x * x) AS BIGINT) AS sxx,
                           CAST(sum(x * y) AS BIGINT) AS sxy
                    FROM u),
              th AS (SELECT n, sx,
                            CASE WHEN CAST(n AS DOUBLE) * sxx
                                        - CAST(sx AS DOUBLE) * sx = 0.0e0
                                 THEN 0.0e0
                                 ELSE (CAST(n AS DOUBLE) * sxy
                                         - CAST(sx AS DOUBLE) * sy)
                                      / (CAST(n AS DOUBLE) * sxx
                                         - CAST(sx AS DOUBLE) * sx)
                            END AS th
                     FROM p),
              a AS (SELECT usr % 2 AS arm,
                           CAST(count(*) AS BIGINT) AS n_users,
                           CAST(sum(x) AS BIGINT) AS asx,
                           CAST(sum(y) AS BIGINT) AS asy
                    FROM u GROUP BY usr % 2)
              SELECT arm, n_users,
                     round(CAST(asy AS DOUBLE) / n_users / 100.0e0, 6)
                       AS mean_y,
                     round((CAST(asy AS DOUBLE) / n_users
                            - th * (CAST(asx AS DOUBLE) / n_users
                                    - CAST(sx AS DOUBLE) / n)) / 100.0e0, 6)
                       AS mean_y_cuped,
                     round(th, 6) AS theta
              FROM a CROSS JOIN th"""),
      "CUPED variance-reduced A/B readout (pooled theta, exact sums)"),

    // Sample-ratio-mismatch guardrail (Fabijan et al. 2019): Pearson χ²
    // of observed arm counts vs the intended 50/50 — the first check any
    // experiment readout must pass; an SRM invalidates every downstream
    // metric including ab1's. For two arms the statistic collapses to
    // 2·(n0−E)²/E, one fixed-shape double over exact counts.
    "ab2_srm" -> QueryDef(
      (s, dir) => graft.ext.Experiment.srmCheck(t(s, dir, "events")),
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
              c AS (SELECT CAST(sum(CASE WHEN user_id % 2 = 0
                                         THEN 1 ELSE 0 END) AS BIGINT)
                             AS n_arm0,
                           CAST(sum(CASE WHEN user_id % 2 = 1
                                         THEN 1 ELSE 0 END) AS BIGINT)
                             AS n_arm1
                    FROM u)
              SELECT n_arm0, n_arm1,
                     round((CAST(n_arm0 AS DOUBLE)
                              - CAST(n_arm0 + n_arm1 AS DOUBLE) / 2)
                           * (CAST(n_arm0 AS DOUBLE)
                              - CAST(n_arm0 + n_arm1 AS DOUBLE) / 2)
                           / (CAST(n_arm0 + n_arm1 AS DOUBLE) / 2) * 2, 6)
                       AS chi2,
                     (round((CAST(n_arm0 AS DOUBLE)
                              - CAST(n_arm0 + n_arm1 AS DOUBLE) / 2)
                           * (CAST(n_arm0 AS DOUBLE)
                              - CAST(n_arm0 + n_arm1 AS DOUBLE) / 2)
                           / (CAST(n_arm0 + n_arm1 AS DOUBLE) / 2) * 2, 6)
                       > 3.841e0) AS srm_flag
              FROM c"""),
      "sample-ratio-mismatch chi-square guardrail over distinct users"),

    // Welch unequal-variance t readout over per-user value totals —
    // the significance number beside ab1's variance-reduced means.
    // Exact BIGINT user-grain moments; t and Welch–Satterthwaite df as
    // fixed-shape doubles replayed verbatim in the oracle CTE.
    "ab4_welch" -> QueryDef(
      (s, dir) => graft.ext.Experiment.welch(t(s, dir, "events")),
      Some("""WITH u AS (SELECT user_id % 2 AS arm,
                     CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS x
                   FROM events GROUP BY user_id),
              a AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(x) AS BIGINT) AS sx,
                           CAST(sum(x * x) AS BIGINT) AS sxx
                    FROM u GROUP BY arm),
              o AS (SELECT
                      max(CASE WHEN arm = 0 THEN n END) AS n0,
                      max(CASE WHEN arm = 0 THEN sx END) AS sx0,
                      max(CASE WHEN arm = 0 THEN sxx END) AS sxx0,
                      max(CASE WHEN arm = 1 THEN n END) AS n1,
                      max(CASE WHEN arm = 1 THEN sx END) AS sx1,
                      max(CASE WHEN arm = 1 THEN sxx END) AS sxx1
                    FROM a),
              d AS (SELECT n0, n1, sx0, sx1,
                      CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m0,
                      CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
                      (CAST(sxx0 AS DOUBLE) - CAST(n0 AS DOUBLE)
                        * (CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                        * (CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)))
                        / (CAST(n0 AS DOUBLE) - 1.0) AS v0,
                      (CAST(sxx1 AS DOUBLE) - CAST(n1 AS DOUBLE)
                        * (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                        * (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)))
                        / (CAST(n1 AS DOUBLE) - 1.0) AS v1
                    FROM o),
              e AS (SELECT n0, n1, m0, m1, v0, v1,
                      v0 / CAST(n0 AS DOUBLE)
                        + v1 / CAST(n1 AS DOUBLE) AS se2
                    FROM d)
              SELECT n0, n1,
                     round(m0 / 100.0, 6) AS mean0,
                     round(m1 / 100.0, 6) AS mean1,
                     CASE WHEN n0 >= 2 AND n1 >= 2 AND NOT se2 = 0.0
                       THEN CAST(floor((m0 - m1) / sqrt(se2) * 1e6 + 0.5)
                         AS BIGINT) END AS t_micro,
                     CASE WHEN n0 >= 2 AND n1 >= 2 AND NOT se2 = 0.0
                       THEN CAST(floor(se2 * se2 /
                         (v0 / CAST(n0 AS DOUBLE) * (v0 / CAST(n0 AS DOUBLE))
                            / (CAST(n0 AS DOUBLE) - 1.0)
                          + v1 / CAST(n1 AS DOUBLE)
                            * (v1 / CAST(n1 AS DOUBLE))
                            / (CAST(n1 AS DOUBLE) - 1.0))
                         * 1e6 + 0.5) AS BIGINT) END AS df_micro
              FROM e"""),
      "Welch unequal-variance t + effective df over per-user totals"),

    // Difference-in-differences: pre/post x control/treat double
    // difference over per-user centi totals — the selection-gap-removing
    // readout beside ab1's variance reduction. Same exact-integer
    // machinery (midpoint split, arm cells), one fixed-shape double.
    "ab5_did" -> QueryDef(
      (s, dir) => graft.ext.Experiment.diffInDiff(t(s, dir, "events")),
      Some("""WITH ev AS (SELECT user_id, epoch_ns(ts) AS tn,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS vq
                     FROM events),
              mid AS (SELECT (min(tn) + max(tn)) // 2 AS t_mid FROM ev),
              u AS (SELECT user_id AS usr,
                           CAST(sum(CASE WHEN tn < t_mid THEN vq
                                         ELSE 0 END) AS BIGINT) AS x,
                           CAST(sum(CASE WHEN tn >= t_mid THEN vq
                                         ELSE 0 END) AS BIGINT) AS y
                    FROM ev CROSS JOIN mid GROUP BY user_id),
              c AS (SELECT usr % 2 AS arm,
                           CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(x) AS BIGINT) AS sx,
                           CAST(sum(y) AS BIGINT) AS sy
                    FROM u GROUP BY 1),
              o AS (SELECT
                      max(CASE WHEN arm = 0 THEN n END) AS n0,
                      max(CASE WHEN arm = 0 THEN sx END) AS sx0,
                      max(CASE WHEN arm = 0 THEN sy END) AS sy0,
                      max(CASE WHEN arm = 1 THEN n END) AS n1,
                      max(CASE WHEN arm = 1 THEN sx END) AS sx1,
                      max(CASE WHEN arm = 1 THEN sy END) AS sy1
                    FROM c)
              SELECT n0, n1,
                     round(CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                       / 100.0e0, 6) AS pre0,
                     round(CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                       / 100.0e0, 6) AS post0,
                     round(CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                       / 100.0e0, 6) AS pre1,
                     round(CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                       / 100.0e0, 6) AS post1,
                     CASE WHEN n0 >= 1 AND n1 >= 1 THEN
                       CAST(floor(((CAST(sy1 AS DOUBLE)
                             / CAST(n1 AS DOUBLE)
                           - CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                         - (CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                           - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)))
                         * 1e4 + 0.5) AS BIGINT)
                     END AS did_micro
              FROM o"""),
      "difference-in-differences over per-user pre/post totals"),

    // Inter-arrival burstiness per user (Goh-Barabási B index): the
    // metronome-vs-burst behavioral fingerprint — exact second-grain
    // gap moments, one fixed-shape (σ−μ)/(σ+μ) double per user.
    "s14_burstiness" -> QueryDef(
      (s, dir) => graft.ext.TimeSeries.interArrivalBurstiness(
        t(s, dir, "events"), "user_id", "ts"),
      Some("""WITH g AS (SELECT user_id, epoch_ns(ts) AS tn,
                     lag(epoch_ns(ts)) OVER (PARTITION BY user_id
                       ORDER BY epoch_ns(ts)) AS prev
                   FROM events),
              gp AS (SELECT user_id,
                            (tn - prev) // 1000000000 AS gv
                     FROM g WHERE prev IS NOT NULL),
              a AS (SELECT user_id,
                           CAST(count(*) AS BIGINT) AS n_gaps,
                           CAST(sum(gv) AS BIGINT) AS s,
                           CAST(sum(gv * gv) AS BIGINT) AS ss
                    FROM gp GROUP BY 1 HAVING count(*) >= 2),
              d AS (SELECT user_id, n_gaps, s,
                           CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)
                             AS mu,
                           sqrt((CAST(ss AS DOUBLE)
                               - CAST(n_gaps AS DOUBLE)
                                 * (CAST(s AS DOUBLE)
                                    / CAST(n_gaps AS DOUBLE))
                                 * (CAST(s AS DOUBLE)
                                    / CAST(n_gaps AS DOUBLE)))
                             / CAST(n_gaps AS DOUBLE)) AS sigma
                    FROM a)
              SELECT user_id, n_gaps,
                     CAST(s // n_gaps AS BIGINT) AS mean_gap_s,
                     CASE WHEN sigma + mu = 0.0e0 THEN NULL
                          ELSE CAST(floor((sigma - mu) / (sigma + mu)
                            * 1e6 + 0.5) AS BIGINT)
                     END AS b_micro
              FROM d"""),
      "per-user inter-arrival burstiness (metronome vs burst-silence)"),

    // Session depth panel over s1's gap rule (1-hour): session-grain
    // event counts rolled into the one-row engagement readout — bounce
    // share (single-event sessions), exact permille mean depth, max.
    "s15_session_depth" -> QueryDef(
      (s, dir) => {
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val gapNs = 3600L * 1000000000L
        t(s, dir, "events")
          .withColumn("prev_ts", lag("ts", 1).over(wOrd))
          .withColumn("nw", when(col("prev_ts").isNull ||
            col("ts") - col("prev_ts") > gapNs, 1L).otherwise(0L))
          .withColumn("sid", sum("nw").over(wOrd.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
          .groupBy("user_id", "sid")
          .agg(count(lit(1)).as("depth"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(when(col("depth") === 1L, 1L).otherwise(0L))
              .as("n_bounce"),
            sum("depth").as("n_events"),
            max("depth").as("max_depth"))
          .select(col("n_sessions"), col("n_bounce"), col("n_events"),
            col("max_depth"),
            expr("(n_bounce * 1000000) div n_sessions").as("bounce_ppm"),
            expr("(n_events * 1000) div n_sessions")
              .as("mean_depth_milli"))
      },
      Some("""WITH g AS (SELECT user_id, epoch_ns(ts) AS tsn, event_id,
                     lag(epoch_ns(ts)) OVER w AS prev_ts
                   FROM events
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY epoch_ns(ts), event_id)),
              f AS (SELECT user_id, tsn, event_id,
                           CASE WHEN prev_ts IS NULL
                                  OR tsn - prev_ts > 3600000000000
                                THEN 1 ELSE 0 END AS nw
                    FROM g),
              sx AS (SELECT user_id,
                            sum(nw) OVER (PARTITION BY user_id
                              ORDER BY tsn, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
                     FROM f),
              se AS (SELECT user_id, sid,
                            CAST(count(*) AS BIGINT) AS depth
                     FROM sx GROUP BY 1, 2),
              a AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions,
                           CAST(sum(CASE WHEN depth = 1 THEN 1
                                    ELSE 0 END) AS BIGINT) AS n_bounce,
                           CAST(sum(depth) AS BIGINT) AS n_events,
                           CAST(max(depth) AS BIGINT) AS max_depth
                    FROM se)
              SELECT n_sessions, n_bounce, n_events, max_depth,
                     CAST((n_bounce * 1000000) // n_sessions AS BIGINT)
                       AS bounce_ppm,
                     CAST((n_events * 1000) // n_sessions AS BIGINT)
                       AS mean_depth_milli
              FROM a"""),
      "session depth panel: bounce share, mean/max depth (gap rule)"),

    // Per-type daily-count trend: exact integer-rational OLS slope in
    // milli-units (no doubles anywhere — the one regression in the
    // engine whose replay needs no quantization discipline at all).
    "x14_keyed_trend" -> QueryDef(
      (s, dir) => graft.ext.TimeSeries.keyedTrend(
        t(s, dir, "events")
          .groupBy(col("event_type"),
            expr("(ts div 1000) div 86400000000").as("day"))
          .agg(count(lit(1)).as("n")),
        "event_type", "day", "n"),
      Some("""WITH sr AS (SELECT event_type,
                     epoch_us(ts) // 86400000000 AS day,
                     CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1, 2),
              rb AS (SELECT event_type,
                            day - min(day) OVER (PARTITION BY event_type)
                              AS t, n AS c
                     FROM sr),
              a AS (SELECT event_type,
                           CAST(count(*) AS BIGINT) AS n_points,
                           CAST(sum(t) AS BIGINT) AS st,
                           CAST(sum(c) AS BIGINT) AS sc,
                           CAST(sum(t * t) AS BIGINT) AS stt,
                           CAST(sum(t * c) AS BIGINT) AS stc
                    FROM rb GROUP BY 1)
              SELECT event_type, n_points,
                     CASE WHEN n_points * stt - st * st = 0 THEN NULL
                          ELSE CAST(((n_points * stc - st * sc) * 1000)
                            // (n_points * stt - st * st) AS BIGINT)
                     END AS slope_milli
              FROM a"""),
      "per-type daily-count OLS trend (exact integer-rational slope)"),

    // Join-size pre-flight from sketches alone (AMS/CMS inner product):
    // |orders JOIN customer| estimated from the two key sketches beside
    // the exact size — never an underestimate, computed without the
    // sides ever meeting (dq5 prices the top hot keys exactly; this
    // prices the TOTAL at sketch cost, mergeable/streamable state).
    "dq7_join_size_sketch" -> QueryDef(
      (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_custkey").cast("string").as("k"))
        val c = t(s, dir, "customer")
          .select(col("c_custkey").cast("string").as("k"))
        graft.ext.Sketches.cmsJoinSizeEstimate(
            graft.ext.Sketches.cmsCounters(o, "k"),
            graft.ext.Sketches.cmsCounters(c, "k"))
          .crossJoin(o.join(c, "k")
            .agg(count(lit(1)).as("join_size_true")))
      },
      Some {
        val w = graft.ext.Sketches.CmsWidth
        def side(name: String, src: String): String =
          (0 until graft.ext.Sketches.CmsDepth).map(r =>
            s"SELECT $r AS r, " +
              s"(${sqlHash("k", graft.ext.Sketches.CmsSeedBase + r)})" +
              s" % $w AS b FROM $src").mkString(" UNION ALL ")
        s"""WITH ko AS (SELECT CAST(o_custkey AS VARCHAR) AS k
                        FROM orders),
            kc AS (SELECT CAST(c_custkey AS VARCHAR) AS k FROM customer),
            ca AS (SELECT r, b, CAST(count(*) AS BIGINT) AS c
                   FROM (${side("a", "ko")}) GROUP BY r, b),
            cb AS (SELECT r, b, CAST(count(*) AS BIGINT) AS c
                   FROM (${side("b", "kc")}) GROUP BY r, b),
            ip AS (SELECT ca.r, CAST(sum(ca.c * cb.c) AS BIGINT) AS ip
                   FROM ca JOIN cb ON ca.r = cb.r AND ca.b = cb.b
                   GROUP BY ca.r),
            est AS (SELECT min(coalesce(ip.ip, CAST(0 AS BIGINT)))
                      AS join_size_est
                    FROM (VALUES (0), (1), (2), (3)) sp(r)
                    LEFT JOIN ip ON ip.r = sp.r),
            tru AS (SELECT CAST(count(*) AS BIGINT) AS join_size_true
                    FROM ko JOIN kc ON ko.k = kc.k)
            SELECT est.join_size_est, tru.join_size_true
            FROM est CROSS JOIN tru"""
      },
      "CMS inner-product join-size estimate beside the exact size"),

    // HyperLogLog register relation over the corpus shingle stream: the
    // sketch IS a relation (reg, max_rho) — ≤ 2^p rows at any
    // cardinality, mergeable by (reg, MAX), auditable/persistable where
    // approx_count_distinct is an opaque blob. rho comes from a
    // when-chain over 2^i thresholds, so the SKETCH has zero float ops
    // and the oracle replays it exactly.
    "t32_hll_registers" -> QueryDef(
      (s, dir) => graft.ext.Sketches.hllRegisters(
        Dedup.shingles(t(s, dir, "documents")), "sh"),
      Some {
        val chain = (21 to 0 by -1).map(i =>
          s"WHEN (h // 1024) >= ${1L << i} THEN ${22 - i}")
          .mkString(" ")
        s"""WITH $ShinglesCte,
            hb AS (SELECT ${sqlHash("sh", graft.ext.Sketches.HllSeed)}
                     AS h FROM sh),
            rr AS (SELECT h % 1024 AS reg,
                          CAST(CASE $chain ELSE 23 END AS BIGINT) AS rho
                   FROM hb)
            SELECT reg, max(rho) AS max_rho FROM rr GROUP BY reg"""
      },
      "HyperLogLog register relation (exact-replay sketch, no floats)"),

    // The HLL estimate beside the exact distinct count: harmonic mass
    // exact (common-denominator BIGINT sum, untouched registers
    // included), floats only in the final alpha/ln formula — written
    // with identical literal structure in both engines.
    "t33_hll_estimate" -> QueryDef(
      (s, dir) => {
        val sh = Dedup.shingles(t(s, dir, "documents"))
        graft.ext.Sketches.hllEstimate(
            graft.ext.Sketches.hllRegisters(sh, "sh"))
          .crossJoin(sh.agg(countDistinct(col("sh")).as("n_exact")))
      },
      Some {
        val chain = (21 to 0 by -1).map(i =>
          s"WHEN (h // 1024) >= ${1L << i} THEN ${22 - i}")
          .mkString(" ")
        val raw = "0.7213 / (1.0 + 1.079 / 1024.0) * 1024.0 * 1024.0 " +
          "* 8388608.0 / CAST(n_touched + (1024 - n_regs) * 8388608 " +
          "AS DOUBLE)"
        s"""WITH $ShinglesCte,
            hb AS (SELECT ${sqlHash("sh", graft.ext.Sketches.HllSeed)}
                     AS h FROM sh),
            rr AS (SELECT h % 1024 AS reg,
                          CAST(CASE $chain ELSE 23 END AS BIGINT) AS rho
                   FROM hb),
            regs AS (SELECT reg, max(rho) AS max_rho FROM rr
                     GROUP BY reg),
            ag AS (SELECT CAST(count(*) AS BIGINT) AS n_regs,
                          CAST(coalesce(sum(CAST(power(2.0,
                              23 - max_rho) AS BIGINT)),
                            CAST(0 AS BIGINT)) AS BIGINT) AS n_touched
                   FROM regs),
            est AS (SELECT n_regs,
                   CASE WHEN ($raw) <= 2.5 * 1024.0
                             AND (1024 - n_regs) > 0
                        THEN CAST(floor(1024.0 * ln(1024.0 /
                               CAST(1024 - n_regs AS DOUBLE)) + 0.5)
                             AS BIGINT)
                        ELSE CAST(floor(($raw) + 0.5) AS BIGINT)
                   END AS hll_est
                   FROM ag),
            ex AS (SELECT CAST(count(DISTINCT sh) AS BIGINT) AS n_exact
                   FROM sh)
            SELECT est.n_regs, est.hll_est, ex.n_exact
            FROM est CROSS JOIN ex"""
      },
      "HLL estimate beside the exact distinct count"),

    // GROUPED HLL: one sketch per source in a single hash-agg — the
    // "distinct shingles per source" shape where count(DISTINCT) per
    // group shuffles a row per distinct value and this shuffles at most
    // groups * 2^p counters. Estimates beside exacts, per group.
    "t34_hll_by_source" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val keyed = Dedup.materialize(Dedup.shingles(docs)
          .join(docs.select("doc_id", "source"), "doc_id"))
        graft.ext.Sketches.hllEstimateBy(
            graft.ext.Sketches.hllRegistersBy(keyed, "source", "sh"),
            "source")
          .join(keyed.groupBy("source")
            .agg(countDistinct(col("sh")).as("n_exact")), "source")
      },
      Some {
        val chain = (21 to 0 by -1).map(i =>
          s"WHEN (h // 1024) >= ${1L << i} THEN ${22 - i}")
          .mkString(" ")
        val raw = "0.7213 / (1.0 + 1.079 / 1024.0) * 1024.0 * 1024.0 " +
          "* 8388608.0 / CAST(n_touched + (1024 - n_regs) * 8388608 " +
          "AS DOUBLE)"
        s"""WITH $ShinglesCte,
            ks AS (SELECT d.source, s.sh
                   FROM sh s JOIN documents d ON s.doc_id = d.doc_id),
            hb AS (SELECT source,
                          ${sqlHash("sh", graft.ext.Sketches.HllSeed)}
                            AS h FROM ks),
            rr AS (SELECT source, h % 1024 AS reg,
                          CAST(CASE $chain ELSE 23 END AS BIGINT) AS rho
                   FROM hb),
            regs AS (SELECT source, reg, max(rho) AS max_rho FROM rr
                     GROUP BY source, reg),
            ag AS (SELECT source, CAST(count(*) AS BIGINT) AS n_regs,
                          CAST(sum(CAST(power(2.0, 23 - max_rho)
                              AS BIGINT)) AS BIGINT) AS n_touched
                   FROM regs GROUP BY source),
            est AS (SELECT source, n_regs,
                   CASE WHEN ($raw) <= 2.5 * 1024.0
                             AND (1024 - n_regs) > 0
                        THEN CAST(floor(1024.0 * ln(1024.0 /
                               CAST(1024 - n_regs AS DOUBLE)) + 0.5)
                             AS BIGINT)
                        ELSE CAST(floor(($raw) + 0.5) AS BIGINT)
                   END AS hll_est
                   FROM ag),
            ex AS (SELECT source,
                          CAST(count(DISTINCT sh) AS BIGINT) AS n_exact
                   FROM ks GROUP BY source)
            SELECT est.source, est.n_regs, est.hll_est, ex.n_exact
            FROM est JOIN ex USING (source)"""
      },
      "grouped HLL: per-source distinct-shingle estimates beside exacts"),

    // Ranking-quality evaluation (TREC-style binary relevance): the kNN
    // neighborhoods of query vectors 0..7 scored against a label-match
    // gold — hits@10, recall@10, MRR, nDCG@10 per query. DCG discounts
    // micro-quantize PER TERM before summation (the PSI ln discipline),
    // so both engines sum identical integers; the oracle replays the
    // cosine ranking AND every metric independently.
    "t29_rank_eval" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        val qs = emb.filter(col("vec_id") < 8)
        val ranking = Similarity.knnBrute(qs, emb, 20)
          .select(col("q_id"), col("n_id").as("doc_id"), col("rank"))
        val gold = qs.select(col("vec_id").as("q_id"),
            col("label").as("__ql"))
          .join(emb.select(col("vec_id").as("doc_id"), col("label")),
            col("label") === col("__ql") && col("doc_id") =!= col("q_id"))
          .select("q_id", "doc_id")
        Retrieval.rankEval(ranking, gold, 10)
      },
      Some(s"""WITH q AS (SELECT vec_id AS q_id, label AS ql,
                                 embedding::DOUBLE[] AS qe
                          FROM embeddings WHERE vec_id < 8),
               c AS (SELECT vec_id AS n_id, label AS nl,
                            embedding::DOUBLE[] AS ne FROM embeddings),
               scored AS (SELECT q_id, n_id,
                                 ${sqlCos("qe", "ne")} AS sim
                          FROM q CROSS JOIN c WHERE q_id <> n_id),
               r AS (SELECT q_id, n_id AS doc_id,
                            row_number() OVER (PARTITION BY q_id
                              ORDER BY sim DESC, n_id) AS rank
                     FROM scored),
               gold AS (SELECT q.q_id, c.n_id AS doc_id
                        FROM q JOIN c ON c.nl = q.ql AND c.n_id <> q.q_id),
               nrel AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_rel
                        FROM gold GROUP BY q_id),
               hit AS (SELECT r.q_id, r.rank
                       FROM r JOIN gold USING (q_id, doc_id)
                       WHERE r.rank <= 10),
               perq AS (SELECT q_id, CAST(count(*) AS BIGINT) AS hits,
                               min(rank) AS first_rank,
                               CAST(sum(CAST(floor(1e6 * ln(2)
                                   / ln(rank + 1.0) + 0.5) AS BIGINT))
                                 AS BIGINT) AS dcg_micro
                        FROM hit GROUP BY q_id),
               idcg AS (SELECT q_id,
                               CAST(sum(CAST(floor(1e6 * ln(2)
                                   / ln(i + 1.0) + 0.5) AS BIGINT))
                                 AS BIGINT) AS idcg_micro
                        FROM (SELECT q_id,
                                     unnest(generate_series(1,
                                       CAST(least(n_rel, 10) AS BIGINT)))
                                       AS i
                              FROM nrel)
                        GROUP BY q_id)
               SELECT n.q_id, n.n_rel,
                      coalesce(p.hits, CAST(0 AS BIGINT)) AS hits,
                      round(CAST(coalesce(p.hits, CAST(0 AS BIGINT))
                          AS DOUBLE) / n.n_rel, 4) AS recall,
                      coalesce(CAST(floor(1e6 / p.first_rank + 0.5)
                          AS BIGINT), CAST(0 AS BIGINT)) AS mrr_micro,
                      coalesce(p.dcg_micro, CAST(0 AS BIGINT))
                        AS dcg_micro,
                      i.idcg_micro,
                      round(CAST(coalesce(p.dcg_micro, CAST(0 AS BIGINT))
                          AS DOUBLE) / i.idcg_micro, 4) AS ndcg
               FROM nrel n
               JOIN idcg i USING (q_id)
               LEFT JOIN perq p USING (q_id)"""),
      "ranking eval: hits/recall/MRR/nDCG@10 vs label-match gold"),

    // Truncated rank-biased overlap RBO@10 (Webber et al. 2010) between
    // the full-embedding brute ranking and the 32-dim TRUNCATED proxy
    // ranking — the Matryoshka-style "how much retrieval quality does
    // dimension truncation cost, rank-sensitively" eval that set recall
    // (n5) cannot express. The per-item regrouping collapses RBO to one
    // integer sum of pre-quantized tail weights joined on
    // max(rank_a, rank_b) — no doubles anywhere in either engine.
    "t39_rbo" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        val full = Similarity.knnBrute(
          emb.filter(col("vec_id") < 10), emb, 10)
        val sliced = emb.select(col("vec_id"),
          slice(col("embedding"), 1, 32).as("embedding"))
        val proxy = Similarity.knnBrute(
          sliced.filter(col("vec_id") < 10), sliced, 10)
        Retrieval.rbo(full, proxy, 10)
      },
      Some {
        val wts = Retrieval.rboWeightsMicro(10, 0.9)
          .map { case (m, w) => s"($m, $w)" }.mkString(", ")
        def ranked(src: String, emb: String, out: String): String =
          s"""$out AS (SELECT q_id, n_id,
                              CAST(row_number() OVER (PARTITION BY q_id
                                ORDER BY sim DESC, n_id) AS INTEGER) AS rank
                       FROM (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
                                    ${sqlCos(s"a.$emb", s"b.$emb")} AS sim
                             FROM $src a JOIN $src b
                               ON a.vec_id <> b.vec_id
                             WHERE a.vec_id < 10))"""
        s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
                              (embedding[1:32])::DOUBLE[] AS emb32
                       FROM embeddings),
            ${ranked("v", "emb", "ra")},
            ${ranked("v", "emb32", "rb")},
            w(m, w_micro) AS (VALUES $wts),
            shared AS (SELECT ra.q_id,
                              greatest(ra.rank, rb.rank) AS m
                       FROM ra JOIN rb USING (q_id, n_id)
                       WHERE ra.rank <= 10 AND rb.rank <= 10),
            agg AS (SELECT s.q_id, CAST(count(*) AS BIGINT) AS n_shared,
                           CAST(sum(w.w_micro) AS BIGINT) AS rbo_micro
                    FROM shared s JOIN w ON w.m = s.m GROUP BY s.q_id)
            SELECT q.q_id, coalesce(a.n_shared, 0) AS n_shared,
                   coalesce(a.rbo_micro, 0) AS rbo_micro
            FROM (SELECT DISTINCT q_id FROM ra) q
            LEFT JOIN agg a USING (q_id)"""
      },
      "RBO@10: full vs 32-dim-truncated embedding rankings (integer-exact)"),

    "sp2_seq_pack" -> QueryDef(
      (s, dir) => graft.ext.Sampling.packSequences(
        t(s, dir, "documents").select(col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", budget = 512),
      Some("""WITH d AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
                       ('0x' || substr(md5('pack:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
                FROM documents),
              c AS (
                SELECT doc_id, n_tokens, bucket,
                       coalesce(sum(CAST(n_tokens AS BIGINT)) OVER (
                         PARTITION BY bucket ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
                FROM d)
              SELECT doc_id, n_tokens, bucket,
                     CAST(cum // 512 AS BIGINT) AS pack_id
              FROM c"""),
      "token-budget sequence packing (per-bucket contiguous fill)"),

    // Pack layout with in-pack START OFFSETS - the attention-mask /
    // position-id metadata of every packed-sequence format (documents
    // must not attend across boundaries). One more window at (bucket,
    // pack_id) grain over the same ordering; no new exchange.
    "sp19_pack_offsets" -> QueryDef(
      (s, dir) => graft.ext.Sampling.packOffsets(
        t(s, dir, "documents").select(col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", budget = 512),
      Some("""WITH d AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
                       ('0x' || substr(md5('pack:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
                FROM documents),
              c AS (
                SELECT doc_id, n_tokens, bucket,
                       coalesce(sum(CAST(n_tokens AS BIGINT)) OVER (
                         PARTITION BY bucket ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
                FROM d),
              p AS (
                SELECT doc_id, n_tokens, bucket,
                       CAST(cum // 512 AS BIGINT) AS pack_id
                FROM c)
              SELECT doc_id, n_tokens, bucket, pack_id,
                     CAST(coalesce(sum(CAST(n_tokens AS BIGINT)) OVER (
                       PARTITION BY bucket, pack_id ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT) AS offset
              FROM p"""),
      "sequence packing with in-pack start offsets (attention-mask metadata)"),

    // One-row packing-efficiency audit: pack/doc/token counts, fill
    // bounds, over-budget pack count (boundary-crossing tails), mean
    // fill in exact integer permille — the sp2 assignment + two
    // hash-aggs, everything past the assignment pack-count-sized.
    "sp22_pack_audit" -> QueryDef(
      (s, dir) => graft.ext.Sampling.packEfficiency(
        t(s, dir, "documents").select(col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", budget = 512),
      Some("""WITH d AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
                       ('0x' || substr(md5('pack:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
                FROM documents),
              c AS (
                SELECT doc_id, n_tokens, bucket,
                       coalesce(sum(CAST(n_tokens AS BIGINT)) OVER (
                         PARTITION BY bucket ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
                FROM d),
              pk AS (
                SELECT bucket, CAST(cum // 512 AS BIGINT) AS pack_id,
                       CAST(sum(CAST(n_tokens AS BIGINT)) AS BIGINT) AS fill,
                       CAST(count(*) AS BIGINT) AS nd
                FROM c GROUP BY bucket, pack_id)
              SELECT CAST(count(*) AS BIGINT) AS n_packs,
                     CAST(sum(nd) AS BIGINT) AS n_docs,
                     CAST(sum(fill) AS BIGINT) AS total_tokens,
                     min(fill) AS min_fill, max(fill) AS max_fill,
                     CAST(sum(CASE WHEN fill > 512 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_over,
                     (CAST(sum(fill) AS BIGINT) * 1000)
                       // (CAST(count(*) AS BIGINT) * 512)
                       AS mean_fill_permille
              FROM pk"""),
      "packing-efficiency audit: fill bounds + over-budget packs, one row"),

    // Per-epoch deterministic reshuffle (2 epochs): different order every
    // epoch, identical every run - one corpus range sort by (epoch, md5
    // key), per-epoch positions recovered arithmetically (a per-epoch
    // row_number window would put an epoch's whole corpus in ONE
    // partition).
    "sp20_epoch_shuffle" -> QueryDef(
      (s, dir) => graft.ext.Sampling.epochShuffles(
        t(s, dir, "documents"), epochs = 2),
      Some("""SELECT doc_id, epoch,
                     CAST(row_number() OVER (PARTITION BY epoch
                       ORDER BY ('0x' || substr(md5('ep:' || epoch::VARCHAR || ':' || doc_id::VARCHAR), 1, 15))::BIGINT,
                                doc_id) - 1 AS BIGINT) AS pos
              FROM (SELECT doc_id, unnest([0, 1]) AS epoch
                    FROM documents)"""),
      "per-epoch deterministic reshuffle (stable md5 order, exact positions)"),

    // DSIR importance weights (Xie et al. 2023): hashed-unigram log ratio
    // of the en target slice vs the non-en pool, per pool document. One
    // corpus token pass → 1024-bucket conditional counts (KB-scale), the
    // log-ratio table broadcasts back onto the pool tokens, one doc-grain
    // agg — nothing corpus-sized leaves its partition except that sum.
    "sp12_dsir_weights" -> QueryDef(
      (s, dir) => Selection.dsirWeights(
        t(s, dir, "documents"), col("lang") === "en"),
      Some(s"""WITH tok AS (SELECT doc_id, lang = 'en' AS is_t,
                            unnest(string_split(text, ' ')) AS tok
                     FROM documents),
              tb AS (SELECT is_t,
                            ('0x' || substr(md5('ds:' || tok), 1, 8))::BIGINT
                              % ${Selection.NumBuckets} AS b
                     FROM tok),
              counts AS (SELECT b,
                                sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
                                sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS cr
                         FROM tb GROUP BY b),
              tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
                             CAST(sum(cr) AS BIGINT) AS nr
                      FROM counts),
              lr AS (SELECT b,
                            CAST(floor((ln(CAST(ct + 1 AS DOUBLE)
                                   / CAST(nt + ${Selection.NumBuckets} AS DOUBLE))
                                 - ln(CAST(cr + 1 AS DOUBLE)
                                   / CAST(nr + ${Selection.NumBuckets} AS DOUBLE)))
                              * 1e6 + 0.5) AS BIGINT) AS lr_q
                     FROM counts CROSS JOIN tot),
              pool AS (SELECT doc_id,
                              ('0x' || substr(md5('ds:' || tok), 1, 8))::BIGINT
                                % ${Selection.NumBuckets} AS b
                       FROM (SELECT doc_id,
                                    unnest(string_split(text, ' ')) AS tok
                             FROM documents WHERE NOT (lang = 'en')))
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
                     CAST(sum(lr_q) AS BIGINT) AS logw_q,
                     CAST(sum(lr_q) AS DOUBLE) / 1e6 AS logw
              FROM pool JOIN lr USING (b)
              GROUP BY doc_id"""),
      "DSIR hashed-unigram log importance weights (target=en vs pool)"),

    // DSIR Gumbel top-k resample: 100 pool docs drawn without replacement
    // with probability ∝ importance weight — the deterministic-Gumbel form
    // (noise is an md5 function of doc_id), so the selected set replays on
    // any cluster. TakeOrderedAndProject: k rows per partition move.
    "sp13_dsir_resample" -> QueryDef(
      (s, dir) => Selection.dsirResample(
        t(s, dir, "documents"), col("lang") === "en", k = 100),
      Some(s"""WITH tok AS (SELECT doc_id, lang = 'en' AS is_t,
                            unnest(string_split(text, ' ')) AS tok
                     FROM documents),
              tb AS (SELECT is_t,
                            ('0x' || substr(md5('ds:' || tok), 1, 8))::BIGINT
                              % ${Selection.NumBuckets} AS b
                     FROM tok),
              counts AS (SELECT b,
                                sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
                                sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS cr
                         FROM tb GROUP BY b),
              tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
                             CAST(sum(cr) AS BIGINT) AS nr
                      FROM counts),
              lr AS (SELECT b,
                            CAST(floor((ln(CAST(ct + 1 AS DOUBLE)
                                   / CAST(nt + ${Selection.NumBuckets} AS DOUBLE))
                                 - ln(CAST(cr + 1 AS DOUBLE)
                                   / CAST(nr + ${Selection.NumBuckets} AS DOUBLE)))
                              * 1e6 + 0.5) AS BIGINT) AS lr_q
                     FROM counts CROSS JOIN tot),
              pool AS (SELECT doc_id,
                              ('0x' || substr(md5('ds:' || tok), 1, 8))::BIGINT
                                % ${Selection.NumBuckets} AS b
                       FROM (SELECT doc_id,
                                    unnest(string_split(text, ' ')) AS tok
                             FROM documents WHERE NOT (lang = 'en'))),
              wts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
                             CAST(sum(lr_q) AS BIGINT) AS logw_q
                      FROM pool JOIN lr USING (b)
                      GROUP BY doc_id),
              g AS (SELECT doc_id, n_toks, logw_q,
                           CAST(floor(-ln(-ln(
                                 ((('0x' || substr(md5('dg:' || doc_id::VARCHAR), 1, 8))::BIGINT
                                     % 1000000) + 0.5) / 1e6))
                               * 1e6 + 0.5) AS BIGINT) AS g_q
                    FROM wts)
              SELECT doc_id, n_toks, logw_q, g_q,
                     logw_q + g_q AS key_q
              FROM g
              ORDER BY key_q DESC, doc_id
              LIMIT 100"""),
      "DSIR Gumbel top-k importance resample (k=100, deterministic noise)"),

    // DSIR with the paper's FULL feature set — hashed unigrams + bigrams
    // into the same bucket space. Bigram features see word order, so
    // paraphrase-vs-scramble distinctions the unigram weights (sp12) are
    // blind to shift the ratios; cost is ~2x the token stream, still one
    // corpus pass + a KB-scale ratio broadcast.
    "sp14_dsir_weights_bigram" -> QueryDef(
      (s, dir) => Selection.dsirWeights(
        t(s, dir, "documents"), col("lang") === "en", ngrams = 2),
      Some(s"""WITH w0 AS (SELECT doc_id, lang = 'en' AS is_t,
                           string_split(text, ' ') AS w
                    FROM documents),
              feat AS (
                SELECT doc_id, is_t, unnest(w) AS tok FROM w0
                UNION ALL
                SELECT doc_id, is_t,
                       unnest([w[i] || ' ' || w[i+1]
                               for i in generate_series(1, len(w) - 1)]) AS tok
                FROM w0 WHERE len(w) >= 2),
              tb AS (SELECT is_t,
                            ('0x' || substr(md5('ds:' || tok), 1, 8))::BIGINT
                              % ${Selection.NumBuckets} AS b
                     FROM feat),
              counts AS (SELECT b,
                                sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
                                sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS cr
                         FROM tb GROUP BY b),
              tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
                             CAST(sum(cr) AS BIGINT) AS nr
                      FROM counts),
              lr AS (SELECT b,
                            CAST(floor((ln(CAST(ct + 1 AS DOUBLE)
                                   / CAST(nt + ${Selection.NumBuckets} AS DOUBLE))
                                 - ln(CAST(cr + 1 AS DOUBLE)
                                   / CAST(nr + ${Selection.NumBuckets} AS DOUBLE)))
                              * 1e6 + 0.5) AS BIGINT) AS lr_q
                     FROM counts CROSS JOIN tot),
              pool AS (SELECT doc_id,
                              ('0x' || substr(md5('ds:' || tok), 1, 8))::BIGINT
                                % ${Selection.NumBuckets} AS b
                       FROM feat WHERE NOT is_t)
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
                     CAST(sum(lr_q) AS BIGINT) AS logw_q,
                     CAST(sum(lr_q) AS DOUBLE) / 1e6 AS logw
              FROM pool JOIN lr USING (b)
              GROUP BY doc_id"""),
      "DSIR weights over hashed unigrams+bigrams (the paper's feature set)"),

    // The pre-launch mixture table (LLaMA-report shape): per source, tokens
    // available, sqrt-smoothed integer milliweight, tokens drawn at a 1M
    // budget, and the implied epoch count (epochs > 1 = repeating data).
    // Exact BIGINT weights/draws; epochs is one double division.
    "sp15_token_budget" -> QueryDef(
      (s, dir) => Sampling.tokenBudgetPlan(
        t(s, dir, "documents"), budget = 1000000L),
      Some("""WITH per AS (
                SELECT source,
                       CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                         AS tokens
                FROM documents WHERE source IS NOT NULL
                GROUP BY source),
              w AS (SELECT *,
                           CAST(floor(1000.0 * sqrt(tokens)) AS BIGINT)
                             AS w_millis
                    FROM per),
              t AS (SELECT CAST(sum(w_millis) AS BIGINT) AS wsum FROM w)
              SELECT source, n_docs, tokens, w_millis,
                     CAST((1000000 * w_millis) // wsum AS BIGINT)
                       AS drawn_tokens,
                     round(((1000000 * w_millis) // wsum)::DOUBLE / tokens,
                       4) AS epochs
              FROM w CROSS JOIN t"""),
      "token-budget epoch planner: sqrt-smoothed source mixture at a fixed budget"),

    // k-center greedy coreset over the embedding table (k=4, min-id
    // seed): the farthest-point selector, integer-exact via the t24 key
    // packing (argmax min-dist = argmin max-sim under the 1e-4 grid).
    // The oracle unrolls the greedy rounds like t24's.
    "sp18_kcenter_coreset" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Selection.kcenterSelect(t(s, dir, "embeddings"), k = 4)
      },
      Some {
        val M = 1L << 21
        val steps = (2 to 4).map { i =>
          val prev = s"res${i - 1}"
          s"""ms$i AS (SELECT s.id_a, max(s.sim4) AS ms4
                       FROM sims s JOIN $prev r ON s.id_b = r.vec_id
                       WHERE s.id_a NOT IN (SELECT vec_id FROM $prev)
                       GROUP BY s.id_a),
              k$i AS (SELECT max((-ms4) * $M + ($M - 1 - id_a)) AS key
                      FROM ms$i),
              sel$i AS (SELECT $i AS step,
                               $M - 1 - ((key % $M + $M) % $M) AS vec_id,
                               10000 + (key - ((key % $M + $M) % $M)) // $M
                                 AS radius4
                        FROM k$i),
              res$i AS (SELECT * FROM res${i - 1}
                        UNION ALL SELECT * FROM sel$i)"""
        }.mkString(",\n")
        s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                       FROM embeddings),
            sims AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                            CAST(floor(${sqlCos("a.emb", "b.emb")} * 1e4 + 0.5)
                              AS BIGINT) AS sim4
                     FROM v a JOIN v b ON a.vec_id <> b.vec_id),
            res1 AS (SELECT 1 AS step, min(vec_id) AS vec_id,
                            CAST(20000 AS BIGINT) AS radius4
                     FROM v),
            $steps
            SELECT CAST(step AS INTEGER) AS step,
                   CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(radius4 AS BIGINT) AS radius4
            FROM res4"""
      },
      "k-center greedy coreset: farthest-point selection, integer-exact"),

    // 2-D Pareto skyline over (length, lexical diversity): the documents
    // on the size/type-token-ratio frontier — multi-objective selection
    // without a scalarized score. The engine runs the monotone-chain
    // formulation (x-grain hash-agg + ONE aggregate-sized window pass +
    // semi-join back); the oracle is the INDEPENDENT O(n²) NOT-EXISTS
    // dominance definition — a green hash proves the chain loses and
    // invents nothing. TTR micro-quantized by integer division (exact).
    "sp23_pareto_skyline" -> QueryDef(
      (s, dir) => Selection.skyline2d(
        t(s, dir, "documents").select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_toks"),
          expr("""(cast(size(array_distinct(split(text, ' '))) as bigint)
                   * 1000000)
                  div cast(size(split(text, ' ')) as bigint)""")
            .as("ttr_q")),
        "doc_id", "n_toks", "ttr_q"),
      Some("""WITH f AS (SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                     (CAST(len(list_distinct(string_split(text, ' ')))
                        AS BIGINT) * 1000000)
                       // CAST(len(string_split(text, ' ')) AS BIGINT)
                       AS ttr_q
              FROM documents)
              SELECT d.doc_id, d.n_toks, d.ttr_q
              FROM f d
              WHERE NOT EXISTS (
                SELECT 1 FROM f o
                WHERE o.n_toks >= d.n_toks AND o.ttr_q >= d.ttr_q
                  AND (o.n_toks > d.n_toks OR o.ttr_q > d.ttr_q))"""),
      "2-D Pareto skyline: length / lexical-diversity frontier docs"),

    // Contrastive hard-negative mining: per query the top-5 most-similar
    // CROSS-label vectors — the pre-filter-before-top-k contract (every
    // query gets k eligible negatives), exact brute form at the gate; at
    // scale mine per label stratum through the filtered index searches.
    "sp24_hard_negatives" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Similarity.hardNegatives(emb.filter(col("vec_id") < 10), emb,
          "label", 5)
      },
      Some(s"""WITH q AS (SELECT vec_id AS q_id, label AS ql,
                                 embedding::DOUBLE[] AS qe
                          FROM embeddings WHERE vec_id < 10),
               c AS (SELECT vec_id AS n_id, label AS nl,
                            embedding::DOUBLE[] AS ne FROM embeddings),
               scored AS (SELECT q_id, n_id, ${sqlCos("qe", "ne")} AS sim
                          FROM q CROSS JOIN c
                          WHERE q_id <> n_id AND ql IS DISTINCT FROM nl),
               r AS (SELECT q_id, n_id, sim,
                            CAST(row_number() OVER (PARTITION BY q_id
                              ORDER BY sim DESC, n_id) AS INTEGER) AS rank
                     FROM scored)
               SELECT q_id, n_id, sim, rank FROM r WHERE rank <= 5"""),
      "contrastive hard negatives: top-5 cross-label neighbors per query"),

    // Weighted sample without replacement (Efraimidis-Spirakis A-ES):
    // 50 documents drawn weight-proportionally by n_chars, arrivals
    // -ln(u)/w micro-quantized from the stable md5 u — the oracle
    // replays hash, ln, quantization, and the (pri, id) top-k exactly.
    "sp25_weighted_sample" -> QueryDef(
      (s, dir) => Sampling.weightedSample(
        t(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", k = 50),
      Some("""WITH p AS (SELECT doc_id, n_chars,
                     CAST(floor(1e6 * (-ln(
                         (('0x' || substr(md5('ws:' ||
                             CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
                           / 4294967296.0))
                         / CAST(n_chars AS DOUBLE) + 0.5) AS BIGINT)
                       AS pri_micro
                     FROM documents
                     WHERE n_chars IS NOT NULL AND n_chars > 0)
              SELECT doc_id, n_chars, pri_micro FROM p
              ORDER BY pri_micro, doc_id LIMIT 50"""),
      "Efraimidis-Spirakis weighted sample without replacement (k=50)"),

    // Leakage-PROOF grouped split: hashSplit keyed on the near-dup
    // CLUSTER, so cluster mates can never straddle train/test (sp4
    // audits that leakage; this prevents it by construction). Ungrouped
    // docs keep exactly the row-keyed assignment (same salt).
    "sp26_grouped_split" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val clusters = Dedup.dupClusters(
          Dedup.minhashDedupPairs(docs, 0.5, maxBucket = Int.MaxValue)
            .select("doc_a", "doc_b"))
        Sampling.groupedSplit(docs.select("doc_id"), "doc_id",
          clusters, "doc_id", "cluster")
      },
      Some(s"""WITH RECURSIVE $LshPairsCtes,
               edges AS (
                 SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
                 UNION ALL
                 SELECT doc_b, doc_a FROM lsh_pairs),
               reach(src, dst) AS (
                 SELECT src, dst FROM edges
                 UNION
                 SELECT r.src, e.dst FROM reach r JOIN edges e
                   ON r.dst = e.src),
               cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster
                      FROM reach GROUP BY src),
               bk AS (SELECT d.doc_id,
                             ('0x' || substr(md5('split:' ||
                                 CAST(coalesce(cl.cluster, d.doc_id)
                                   AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
                      FROM documents d
                      LEFT JOIN cl ON d.doc_id = cl.doc_id)
               SELECT doc_id,
                      CASE WHEN b < 80 THEN 'train'
                           WHEN b < 90 THEN 'val'
                           ELSE 'test' END AS split
               FROM bk"""),
      "leakage-proof grouped split (whole near-dup clusters per split)"),

    // Mixture-drift audit: did the EXECUTED corpus land on the PLANNED
    // mixture? PSI between sp15's token-budget plan (drawn tokens per
    // source) and the observed per-source token mass of a sampled
    // corpus — the plan→execution loop closed with two already-gated
    // components (tokenBudgetPlan + psiFromBuckets), so neither side's
    // arithmetic can drift from its standalone gate.
    "sp21_mix_divergence" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val planned = Sampling.tokenBudgetPlan(docs, budget = 1000000L)
          .select(col("source").as("bucket"),
            col("drawn_tokens").as("n_ref"))
        val observed = Sampling.hashSample(docs, "doc_id", pct = 50)
          .filter(col("source").isNotNull)
          .groupBy(col("source").as("bucket"))
          .agg(sum(TextAnalysis.wsTokenCount(col("text")).cast("long"))
            .as("n_cur"))
        graft.ext.Profile.psiFromBuckets(planned, observed)
          .select(col("bucket").as("source"), col("n_ref").as("plan_tokens"),
            col("n_cur").as("obs_tokens"), col("psi_micro"), col("psi"))
      },
      Some("""WITH per AS (
                SELECT source,
                       CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                         AS tokens
                FROM documents WHERE source IS NOT NULL
                GROUP BY source),
              w AS (SELECT source, tokens,
                           CAST(floor(1000.0 * sqrt(tokens)) AS BIGINT)
                             AS w_millis
                    FROM per),
              t AS (SELECT CAST(sum(w_millis) AS BIGINT) AS wsum FROM w),
              planned AS (
                SELECT source AS bucket,
                       CAST((1000000 * w_millis) // wsum AS BIGINT) AS n_ref
                FROM w CROSS JOIN t),
              observed AS (
                SELECT source AS bucket,
                       CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                         AS n_cur
                FROM documents
                WHERE source IS NOT NULL
                  AND ('0x' || substr(md5('sample:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 50
                GROUP BY source),
              j AS (SELECT coalesce(p.bucket, o.bucket) AS bucket,
                           CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
                           CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur
                    FROM planned p FULL OUTER JOIN observed o
                      ON p.bucket = o.bucket),
              tt AS (SELECT CAST(sum(n_ref) AS BIGINT) AS nr,
                            CAST(sum(n_cur) AS BIGINT) AS nc,
                            CAST(count(*) AS BIGINT) AS b
                     FROM j),
              pq AS (SELECT bucket, n_ref, n_cur,
                            CAST(n_ref + 1 AS DOUBLE) / CAST(nr + b AS DOUBLE) AS p,
                            CAST(n_cur + 1 AS DOUBLE) / CAST(nc + b AS DOUBLE) AS q
                     FROM j CROSS JOIN tt)
              SELECT bucket AS source, n_ref AS plan_tokens,
                     n_cur AS obs_tokens,
                     CAST(floor((p - q) * ln(p / q) * 1e6 + 0.5) AS BIGINT)
                       AS psi_micro,
                     round(CAST(floor((p - q) * ln(p / q) * 1e6 + 0.5) AS BIGINT) / 1e6, 6)
                       AS psi
              FROM pq"""),
      "mixture-drift audit: PSI between the token-budget plan and the executed mix"),

    // BPE subword tokenization under the FROZEN 24-merge table (the
    // deployment shape of a real tokenizer: train once, version the merge
    // table, apply everywhere). The oracle's per-word encode expression is
    // GENERATED from the same Scala merge list as the Spark plan, so the
    // two sides cannot drift; training itself (iterative argmax — not SQL-
    // expressible) is spec-gated against hand-computed merges in BpeSpec.
    "sp16_bpe_tokenize" -> QueryDef(
      (s, dir) => graft.ext.Bpe.tokenCounts(t(s, dir, "documents"),
        graft.ext.Bpe.FrozenMerges),
      Some(s"""WITH w AS (SELECT doc_id,
                                 list_filter(string_split(text, ' '),
                                   x -> x <> '') AS ws
                          FROM documents),
               e AS (SELECT doc_id,
                            CAST(len(ws) AS INTEGER) AS n_words,
                            CAST(list_sum(list_transform(ws,
                              w -> len(string_split(trim($BpeEncodeSql), ' '))))
                              AS BIGINT) AS n_bpe
                     FROM w)
               SELECT doc_id, n_words, n_bpe,
                      round(CAST(n_bpe AS DOUBLE) / n_words, 4) AS fanout
               FROM e"""),
      "BPE subword token counts under a frozen in-engine-trained merge table"),

    // Tokenizer-fertility audit per (source, lang): subword tokens per
    // word in exact integer permille — the slice whose fertility is far
    // above the norm has its token budget (and so its effective mixture
    // weight) silently inflated by the merge table. Rides the sp16
    // encode expression; group sums exact, one integer division.
    "t31_fertility_audit" -> QueryDef(
      (s, dir) => graft.ext.Bpe.fertilityBySource(
        t(s, dir, "documents"), graft.ext.Bpe.FrozenMerges),
      Some(s"""WITH w AS (SELECT doc_id, source, lang,
                                 list_filter(string_split(text, ' '),
                                   x -> x <> '') AS ws
                          FROM documents),
               e AS (SELECT doc_id, source, lang,
                            CAST(len(ws) AS INTEGER) AS n_words,
                            CAST(list_sum(list_transform(ws,
                              w -> len(string_split(trim($BpeEncodeSql),
                                ' ')))) AS BIGINT) AS n_bpe
                     FROM w)
               SELECT source, lang,
                      CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(n_words) AS BIGINT) AS n_words,
                      CAST(sum(n_bpe) AS BIGINT) AS n_bpe,
                      CAST((1000 * sum(n_bpe)) // sum(n_words) AS BIGINT)
                        AS fertility_permille
               FROM e GROUP BY source, lang"""),
      "tokenizer-fertility audit per (source, lang), exact permille"),

    // Apriori 2-itemsets: words co-occurring in >= 40 documents at ANY
    // distance (the market-basket view beside t26's adjacent-bigram
    // phrases), with micro-quantized lift separating association from
    // two-popular-words coincidence. Support pruning bounds the pair
    // expansion exactly as published.
    "t35_itemset_pairs" -> QueryDef(
      (s, dir) => graft.ext.TextAnalysis.itemsetPairs(
        t(s, dir, "documents"), minSup = 40, k = 20),
      Some("""WITH it AS (SELECT DISTINCT doc_id, tok FROM (
                   SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                   FROM documents)),
              nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT)
                       AS n_docs FROM documents),
              fr AS (SELECT tok, CAST(count(*) AS BIGINT) AS sup
                     FROM it GROUP BY tok HAVING count(*) >= 40),
              fi AS (SELECT it.doc_id, it.tok FROM it
                     JOIN fr ON fr.tok = it.tok),
              pr AS (SELECT x.tok AS a, y.tok AS b,
                            CAST(count(*) AS BIGINT) AS sup_ab
                     FROM fi x JOIN fi y
                       ON x.doc_id = y.doc_id AND x.tok < y.tok
                     GROUP BY x.tok, y.tok
                     HAVING count(*) >= 40)
              SELECT pr.a, pr.b, pr.sup_ab,
                     fa.sup AS sup_a, fb.sup AS sup_b,
                     CAST(floor(1e6 * CAST(pr.sup_ab AS DOUBLE)
                         * nd.n_docs
                         / (CAST(fa.sup AS DOUBLE)
                            * CAST(fb.sup AS DOUBLE)) + 0.5) AS BIGINT)
                       AS lift_micro
              FROM pr JOIN fr fa ON fa.tok = pr.a
                   JOIN fr fb ON fb.tok = pr.b
                   CROSS JOIN nd
              ORDER BY pr.sup_ab DESC, pr.a, pr.b
              LIMIT 20"""),
      "Apriori 2-itemsets: co-occurring word pairs with lift"),

    // The rule-mining layer over t35's support counting: directed rules
    // with exact ppm confidence (BIGINT floor division) + the shared
    // lift. minConf 30% keeps both directions of asymmetric pairs
    // visible; top-30 by (conf DESC, ant, cons).
    "t42_assoc_rules" -> QueryDef(
      (s, dir) => graft.ext.TextAnalysis.assocRules(
        t(s, dir, "documents"), minSup = 40, minConfPpm = 300000L, k = 30),
      Some("""WITH it AS (SELECT DISTINCT doc_id, tok FROM (
                   SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                   FROM documents)),
              nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT)
                       AS n_docs FROM documents),
              fr AS (SELECT tok, CAST(count(*) AS BIGINT) AS sup
                     FROM it GROUP BY tok HAVING count(*) >= 40),
              fi AS (SELECT it.doc_id, it.tok FROM it
                     JOIN fr ON fr.tok = it.tok),
              pr AS (SELECT x.tok AS a, y.tok AS b,
                            CAST(count(*) AS BIGINT) AS sup_ab
                     FROM fi x JOIN fi y
                       ON x.doc_id = y.doc_id AND x.tok < y.tok
                     GROUP BY x.tok, y.tok
                     HAVING count(*) >= 40),
              pl AS (SELECT pr.a, pr.b, pr.sup_ab,
                            fa.sup AS sup_a, fb.sup AS sup_b,
                            CAST(floor(1e6 * CAST(pr.sup_ab AS DOUBLE)
                                * nd.n_docs
                                / (CAST(fa.sup AS DOUBLE)
                                   * CAST(fb.sup AS DOUBLE)) + 0.5)
                              AS BIGINT) AS lift_micro
                     FROM pr JOIN fr fa ON fa.tok = pr.a
                          JOIN fr fb ON fb.tok = pr.b
                          CROSS JOIN nd),
              ru AS (SELECT a AS ant, b AS cons, sup_ab, sup_a AS sup_ant,
                            lift_micro
                     FROM pl
                     UNION ALL
                     SELECT b, a, sup_ab, sup_b, lift_micro FROM pl)
              SELECT ant, cons, sup_ab, sup_ant,
                     CAST((1000000 * sup_ab) // sup_ant AS BIGINT)
                       AS conf_ppm,
                     lift_micro
              FROM ru
              WHERE (1000000 * sup_ab) // sup_ant >= 300000
              ORDER BY conf_ppm DESC, ant, cons
              LIMIT 30"""),
      "association rules (Agrawal-Srikant): directed confidence + lift"),

    // Bigram-LM cross-entropy (the CCNet perplexity filter, model trained
    // in-engine on the en reference slice, scoring the non-en pool).
    "t16_bigram_xent" -> QueryDef(
      (s, dir) => TextAnalysis.bigramCrossEntropy(
        t(s, dir, "documents"), col("lang") === "en"),
      Some("""WITH wref AS (SELECT doc_id, string_split(text, ' ') AS w
                     FROM documents WHERE lang = 'en'),
              bgref AS (SELECT doc_id,
                               unnest([w[i] || ' ' || w[i+1]
                                       for i in generate_series(1, len(w) - 1)]) AS bg
                        FROM wref WHERE len(w) >= 2),
              c2 AS (SELECT bg, count(*) AS c2 FROM bgref GROUP BY bg),
              c1 AS (SELECT tok, count(*) AS c1
                     FROM (SELECT unnest(w) AS tok FROM wref)
                     GROUP BY tok),
              vocab AS (SELECT count(*) AS v FROM c1),
              wpool AS (SELECT doc_id, string_split(text, ' ') AS w
                        FROM documents WHERE NOT (lang = 'en')),
              bgpool AS (SELECT doc_id,
                                unnest([w[i] || ' ' || w[i+1]
                                        for i in generate_series(1, len(w) - 1)]) AS bg
                         FROM wpool WHERE len(w) >= 2),
              j AS (SELECT doc_id,
                           coalesce(c2.c2, 0) AS c2,
                           coalesce(c1.c1, 0) AS c1
                    FROM bgpool b
                    LEFT JOIN c2 USING (bg)
                    LEFT JOIN c1 ON c1.tok = string_split(b.bg, ' ')[1]),
              n AS (SELECT doc_id,
                           CAST(floor(-ln(CAST(c2 + 1 AS DOUBLE)
                                 / CAST(c1 + v AS DOUBLE)) * 1e6 + 0.5)
                             AS BIGINT) AS nll_q
                    FROM j CROSS JOIN vocab)
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bg,
                     CAST(sum(nll_q) AS BIGINT) AS s_q,
                     round(CAST(sum(nll_q) AS DOUBLE) / 1e6 / count(*), 6) AS xent
              FROM n GROUP BY doc_id"""),
      "bigram-LM cross-entropy vs the en reference slice (CCNet shape)"),

    // word2phrase collocation scoring (Mikolov et al. 2013 §4): the
    // pre-tokenization pass that decides which adjacent word pairs
    // deserve one vocabulary entry. Counts exact; the discounted-lift
    // score is a single correctly-rounded double expression, so the
    // oracle reproduces it bit-for-bit at any corpus size.
    "t26_phrase_detect" -> QueryDef(
      (s, dir) => TextAnalysis.phraseDetect(t(s, dir, "documents"))
        .orderBy(desc("score"), asc("phrase")).limit(20),
      Some("""WITH wd AS (SELECT string_split(text, ' ') AS w
                          FROM documents),
              toks AS (SELECT unnest(w) AS tok FROM wd),
              c1 AS (SELECT tok, CAST(count(*) AS BIGINT) AS c1
                     FROM toks GROUP BY tok),
              total AS (SELECT CAST(sum(c1) AS BIGINT) AS n FROM c1),
              bg AS (SELECT unnest([w[i] || ' ' || w[i+1]
                                    for i in generate_series(1, len(w) - 1)])
                              AS bg
                     FROM wd WHERE len(w) >= 2),
              c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c_ab
                     FROM bg GROUP BY bg HAVING count(*) >= 5)
              SELECT c2.bg AS phrase, c_ab, ca.c1 AS c_a, cb.c1 AS c_b,
                     round((CAST(c_ab - 5 AS DOUBLE) * n)
                             / (CAST(ca.c1 AS DOUBLE) * cb.c1), 4) AS score
              FROM c2
              JOIN c1 ca ON ca.tok = string_split(c2.bg, ' ')[1]
              JOIN c1 cb ON cb.tok = string_split(c2.bg, ' ')[2]
              CROSS JOIN total
              ORDER BY score DESC, phrase LIMIT 20"""),
      "word2phrase discounted-lift collocations, top 20"),

    // Exact phrase search via positional postings: the postings explode
    // filters to the phrase vocabulary inside the scan, then |phrase|-1
    // position-arithmetic equi-joins assemble consecutive occurrences —
    // the retrieval primitive BM25's bag-of-words cannot express. The
    // oracle replays the same postings + offset joins.
    "t27_phrase_search" -> QueryDef(
      (s, dir) => Retrieval.phraseSearch(
        t(s, dir, "documents"), Seq("part", "filter", "scan")),
      Some("""WITH wd AS (SELECT doc_id, string_split(text, ' ') AS w
                          FROM documents),
              posn AS (SELECT doc_id, w,
                              unnest(generate_series(0, len(w) - 1)) AS p
                       FROM wd),
              post AS (SELECT doc_id, p, w[p + 1] AS tok FROM posn
                       WHERE w[p + 1] IN ('part', 'filter', 'scan')),
              a AS (SELECT doc_id, p AS p0 FROM post WHERE tok = 'part'),
              m1 AS (SELECT a.doc_id, a.p0 FROM a JOIN post q
                       ON q.doc_id = a.doc_id AND q.p = a.p0 + 1
                      AND q.tok = 'filter'),
              m2 AS (SELECT m1.doc_id, m1.p0 FROM m1 JOIN post q
                       ON q.doc_id = m1.doc_id AND q.p = m1.p0 + 2
                      AND q.tok = 'scan')
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
              FROM m2 GROUP BY doc_id"""),
      "exact phrase search: positional postings + offset equi-joins"),

    // Trigram Stupid Backoff (Brants et al. 2007 — the LM score built FOR
    // distributed count tables): S backs off trigram → bigram → unigram
    // with fixed α = 0.4, no discounting; OOV unigrams clamp to count 1 so
    // the filter score stays finite. Same two-corpus shape as t16, one
    // more word of context.
    "t20_stupid_backoff" -> QueryDef(
      (s, dir) => TextAnalysis.stupidBackoffXent(
        t(s, dir, "documents"), col("lang") === "en"),
      Some("""WITH wref AS (SELECT doc_id, string_split(text, ' ') AS w
                     FROM documents WHERE lang = 'en'),
              tgref AS (SELECT doc_id,
                               unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                       for i in generate_series(1, len(w) - 2)]) AS g
                        FROM wref WHERE len(w) >= 3),
              c3 AS (SELECT g AS tri, count(*) AS c3 FROM tgref GROUP BY g),
              bgref AS (SELECT doc_id,
                               unnest([w[i] || ' ' || w[i+1]
                                       for i in generate_series(1, len(w) - 1)]) AS bg
                        FROM wref WHERE len(w) >= 2),
              c2 AS (SELECT bg AS g, count(*) AS c FROM bgref GROUP BY bg),
              c1 AS (SELECT tok, count(*) AS c
                     FROM (SELECT unnest(w) AS tok FROM wref)
                     GROUP BY tok),
              nt AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM c1),
              wpool AS (SELECT doc_id, string_split(text, ' ') AS w
                        FROM documents WHERE NOT (lang = 'en')),
              tgpool AS (SELECT doc_id,
                                unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                        for i in generate_series(1, len(w) - 2)]) AS tri
                         FROM wpool WHERE len(w) >= 3),
              keys AS (SELECT doc_id, tri,
                              regexp_replace(tri, ' [^ ]+$', '') AS bg12,
                              regexp_replace(tri, '^[^ ]+ ', '') AS bg23,
                              string_split(tri, ' ')[2] AS w2,
                              string_split(tri, ' ')[3] AS w3
                       FROM tgpool),
              sc AS (SELECT doc_id,
                            CASE WHEN coalesce(c3.c3, 0) > 0
                                   THEN CAST(c3.c3 AS DOUBLE) / c2a.c
                                 WHEN coalesce(c2b.c, 0) > 0
                                   THEN 0.4e0 * (CAST(c2b.c AS DOUBLE) / c1a.c)
                                 ELSE 0.4e0 * 0.4e0 *
                                   (CAST(greatest(coalesce(c1b.c, 0), 1)
                                      AS DOUBLE) / nt.n_total)
                            END AS s
                     FROM keys t
                     LEFT JOIN c3 ON c3.tri = t.tri
                     LEFT JOIN c2 c2a ON c2a.g = t.bg12
                     LEFT JOIN c2 c2b ON c2b.g = t.bg23
                     LEFT JOIN c1 c1a ON c1a.tok = t.w2
                     LEFT JOIN c1 c1b ON c1b.tok = t.w3
                     CROSS JOIN nt),
              q AS (SELECT doc_id,
                           CAST(floor(-ln(s) * 1e6 + 0.5) AS BIGINT) AS nll_q
                    FROM sc)
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
                     CAST(sum(nll_q) AS BIGINT) AS s_q,
                     round(CAST(sum(nll_q) AS DOUBLE) / 1e6 / count(*), 6)
                       AS xent
              FROM q GROUP BY doc_id"""),
      "trigram Stupid Backoff cross-entropy vs the en slice (Brants 2007)"),

    // Zipf rank-frequency fit: OLS slope of ln(freq) vs ln(rank) over
    // the top-500 vocabulary — natural text sits near −1; template
    // floods flatten the head, OCR/tokenizer breakage fattens the tail.
    // Exact ranks, micro-quantized logs, exact regression sums, the
    // CUPED-shape double combination.
    "t40_zipf" -> QueryDef(
      (s, dir) => TextAnalysis.zipfFit(t(s, dir, "documents")),
      Some("""WITH f AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
                         FROM (SELECT unnest(string_split(text, ' ')) AS tok
                               FROM documents)
                         GROUP BY tok ORDER BY c DESC, tok LIMIT 500),
              r AS (SELECT CAST(row_number() OVER (ORDER BY c DESC, tok)
                      AS INTEGER) AS rank, c
                    FROM f),
              p AS (SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1e6 + 0.5)
                             AS BIGINT) AS xq,
                           CAST(floor(ln(CAST(c AS DOUBLE)) * 1e6 + 0.5)
                             AS BIGINT) AS yq
                    FROM r),
              st AS (SELECT CAST(count(*) AS BIGINT) AS n,
                            CAST(sum(xq) AS BIGINT) AS sx,
                            CAST(sum(yq) AS BIGINT) AS sy,
                            CAST(sum(xq * xq) AS BIGINT) AS sxx,
                            CAST(sum(xq * yq) AS BIGINT) AS sxy
                     FROM p)
              SELECT n AS n_points,
                     round((CAST(n AS DOUBLE) * sxy
                              - CAST(sx AS DOUBLE) * sy)
                           / (CAST(n AS DOUBLE) * sxx
                              - CAST(sx AS DOUBLE) * sx), 6) AS slope,
                     round((CAST(sy AS DOUBLE)
                            - ((CAST(n AS DOUBLE) * sxy
                                 - CAST(sx AS DOUBLE) * sy)
                               / (CAST(n AS DOUBLE) * sxx
                                  - CAST(sx AS DOUBLE) * sx)) * sx)
                           / n / 1e6, 6) AS intercept
              FROM st"""),
      "Zipf slope/intercept over the top-500 vocabulary (exact sums)"),

    // Interpolated Kneser-Ney bigram cross-entropy (Kneser & Ney 1995;
    // Chen & Goodman 1998 §2.7) — the KenLM/CCNet perplexity-filter
    // smoothing: absolute discounting D=0.75 plus a continuation-count
    // backoff ("Francisco" is frequent but follows only "San"). All five
    // model statistics are exact BIGINTs from ONE bigram-type relation;
    // the score is a fixed-shape correctly-rounded double expression, so
    // the oracle replays it bit-for-bit.
    "t30_kneser_ney" -> QueryDef(
      (s, dir) => TextAnalysis.kneserNeyXent(
        t(s, dir, "documents"), col("lang") === "en"),
      Some("""WITH wref AS (SELECT doc_id, string_split(text, ' ') AS w
                     FROM documents WHERE lang = 'en'),
              bgref AS (SELECT unnest([w[i] || ' ' || w[i+1]
                                       for i in generate_series(1, len(w) - 1)]) AS bg
                        FROM wref WHERE len(w) >= 2),
              c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2,
                            string_split(bg, ' ')[1] AS w1,
                            string_split(bg, ' ')[2] AS w2
                     FROM bgref GROUP BY bg),
              ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c_ctx,
                             CAST(count(*) AS BIGINT) AS n1p
                      FROM c2 GROUP BY w1),
              cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS ncont
                       FROM c2 GROUP BY w2),
              tt AS (SELECT CAST(count(*) AS BIGINT) AS t_types FROM c2),
              wpool AS (SELECT doc_id, string_split(text, ' ') AS w
                        FROM documents WHERE NOT (lang = 'en')),
              bgpool AS (SELECT doc_id,
                                unnest([w[i] || ' ' || w[i+1]
                                        for i in generate_series(1, len(w) - 1)]) AS bg
                         FROM wpool WHERE len(w) >= 2),
              keys AS (SELECT doc_id, bg,
                              string_split(bg, ' ')[1] AS w1,
                              string_split(bg, ' ')[2] AS w2
                       FROM bgpool),
              sc AS (SELECT doc_id,
                            CASE WHEN coalesce(ctx.c_ctx, 0) > 0 THEN
                              greatest(CAST(coalesce(c2.c2, 0) AS DOUBLE)
                                         - 0.75e0, 0.0e0) / ctx.c_ctx
                              + ((0.75e0 * CAST(ctx.n1p AS DOUBLE))
                                   / ctx.c_ctx)
                                * (CAST(greatest(coalesce(cont.ncont, 0), 1)
                                     AS DOUBLE) / tt.t_types)
                            ELSE CAST(greatest(coalesce(cont.ncont, 0), 1)
                                   AS DOUBLE) / tt.t_types
                            END AS s
                     FROM keys k
                     LEFT JOIN c2 ON c2.bg = k.bg
                     LEFT JOIN ctx ON ctx.w1 = k.w1
                     LEFT JOIN cont ON cont.w2 = k.w2
                     CROSS JOIN tt),
              q AS (SELECT doc_id,
                           CAST(floor(-ln(s) * 1e6 + 0.5) AS BIGINT) AS nll_q
                    FROM sc)
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bg,
                     CAST(sum(nll_q) AS BIGINT) AS s_q,
                     round(CAST(sum(nll_q) AS DOUBLE) / 1e6 / count(*), 6)
                       AS xent
              FROM q GROUP BY doc_id"""),
      "interpolated Kneser-Ney bigram cross-entropy vs the en slice"),

    // Perplexity-ordered curriculum (the CCNet/Gopher curation move,
    // composed end-to-end): Kneser-Ney-score the pool against the en
    // reference (t30's model), join token counts, globally order
    // easy→hard (xent ASC — the scalable two-pass sort, not a
    // single-partition window), and cut the order into 4 equal-position
    // training stages. Every piece is individually gated (t30, sp11);
    // this gates the COMPOSITION.
    "pipe6_perplexity_curriculum" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val scored = TextAnalysis.kneserNeyXent(docs, col("lang") === "en")
        val withTok = scored.join(
          docs.select(col("doc_id"),
            TextAnalysis.wsTokenCount(col("text")).as("n_tokens")),
          Seq("doc_id"))
        val ordered = graft.ext.Sampling.globalOrder(
          withTok.select(col("doc_id"), col("xent"), col("n_tokens")),
          Seq(col("xent").asc, col("doc_id").asc))
        ordered
          .crossJoin(broadcast(ordered.agg(count(lit(1)).as("n"))))
          .select(col("doc_id"), col("xent"), col("n_tokens"),
            col("position"), expr("(position * 4) div n").as("stage"))
      },
      Some("""WITH wref AS (SELECT doc_id, string_split(text, ' ') AS w
                     FROM documents WHERE lang = 'en'),
              bgref AS (SELECT unnest([w[i] || ' ' || w[i+1]
                                       for i in generate_series(1, len(w) - 1)]) AS bg
                        FROM wref WHERE len(w) >= 2),
              c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2,
                            string_split(bg, ' ')[1] AS w1,
                            string_split(bg, ' ')[2] AS w2
                     FROM bgref GROUP BY bg),
              ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c_ctx,
                             CAST(count(*) AS BIGINT) AS n1p
                      FROM c2 GROUP BY w1),
              cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS ncont
                       FROM c2 GROUP BY w2),
              tt AS (SELECT CAST(count(*) AS BIGINT) AS t_types FROM c2),
              wpool AS (SELECT doc_id, string_split(text, ' ') AS w
                        FROM documents WHERE NOT (lang = 'en')),
              bgpool AS (SELECT doc_id,
                                unnest([w[i] || ' ' || w[i+1]
                                        for i in generate_series(1, len(w) - 1)]) AS bg
                         FROM wpool WHERE len(w) >= 2),
              keys AS (SELECT doc_id, bg,
                              string_split(bg, ' ')[1] AS w1,
                              string_split(bg, ' ')[2] AS w2
                       FROM bgpool),
              sc AS (SELECT doc_id,
                            CASE WHEN coalesce(ctx.c_ctx, 0) > 0 THEN
                              greatest(CAST(coalesce(c2.c2, 0) AS DOUBLE)
                                         - 0.75e0, 0.0e0) / ctx.c_ctx
                              + ((0.75e0 * CAST(ctx.n1p AS DOUBLE))
                                   / ctx.c_ctx)
                                * (CAST(greatest(coalesce(cont.ncont, 0), 1)
                                     AS DOUBLE) / tt.t_types)
                            ELSE CAST(greatest(coalesce(cont.ncont, 0), 1)
                                   AS DOUBLE) / tt.t_types
                            END AS s
                     FROM keys k
                     LEFT JOIN c2 ON c2.bg = k.bg
                     LEFT JOIN ctx ON ctx.w1 = k.w1
                     LEFT JOIN cont ON cont.w2 = k.w2
                     CROSS JOIN tt),
              q AS (SELECT doc_id,
                           CAST(floor(-ln(s) * 1e6 + 0.5) AS BIGINT) AS nll_q
                    FROM sc),
              x AS (SELECT doc_id,
                           round(CAST(sum(nll_q) AS DOUBLE) / 1e6
                             / count(*), 6) AS xent
                    FROM q GROUP BY doc_id),
              tok AS (SELECT doc_id,
                             CAST(len(string_split(text, ' ')) AS INTEGER)
                               AS n_tokens
                      FROM documents),
              ord AS (SELECT x.doc_id, x.xent, tok.n_tokens,
                             CAST(row_number() OVER (
                               ORDER BY x.xent, x.doc_id) - 1 AS BIGINT)
                               AS position
                      FROM x JOIN tok ON tok.doc_id = x.doc_id),
              nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ord)
              SELECT doc_id, xent, n_tokens, position,
                     (position * 4) // nn.n AS stage
              FROM ord CROSS JOIN nn"""),
      "perplexity curriculum: KN scores -> global order -> 4 stages"),

    // Okapi BM25 top-20 for a 3-term query — the lexical retrieval ranker
    // (Lucene idf variant). The token scan filters to the query vocabulary
    // before aggregating, df/avgdl broadcast, TakeOrderedAndProject cut.
    "t17_bm25_topk" -> QueryDef(
      (s, dir) => Retrieval.bm25TopK(
        t(s, dir, "documents"), Seq("spark", "vector", "stream"), k = 20),
      Some(s"""WITH $Bm25Ctes
               SELECT doc_id, n_terms, bm25_q, bm25 FROM bm
               ORDER BY bm25_q DESC, doc_id
               LIMIT 20"""),
      "Okapi BM25 top-20 lexical retrieval (3-term query, Lucene idf)"),

    // Dirichlet query-likelihood retrieval (Zhai-Lafferty) over the
    // same 3-term query — the language-modeling ranking family beside
    // BM25's probabilistic one. Matched-pair + constant + length-term
    // decomposition, every ln micro-quantized (PSI discipline), exact
    // BIGINT totals.
    "t46_ql_dirichlet" -> QueryDef(
      (s, dir) => Retrieval.qlDirichletTopK(
        t(s, dir, "documents"), Seq("spark", "vector", "stream"),
        k = 20, mu = 2000L),
      Some("""WITH lens AS (SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
                   FROM documents),
              st AS (SELECT CAST(sum(dl) AS BIGINT) AS sum_dl FROM lens),
              tk AS (SELECT doc_id,
                            CAST(len(string_split(text, ' ')) AS BIGINT)
                              AS dl,
                            unnest(string_split(text, ' ')) AS tok
                     FROM documents),
              tf AS (SELECT doc_id, dl, tok,
                            CAST(count(*) AS BIGINT) AS tf
                     FROM tk
                     WHERE tok IN ('spark', 'vector', 'stream')
                     GROUP BY 1, 2, 3),
              pt AS (SELECT tok,
                            CAST(2000 AS DOUBLE)
                              * CAST(sum(tf) AS DOUBLE)
                              / (SELECT CAST(sum_dl AS DOUBLE) FROM st)
                              AS mup
                     FROM tf GROUP BY tok),
              cs AS (SELECT CAST(sum(CAST(floor(ln(mup) * 1e6 + 0.5)
                              AS BIGINT)) AS BIGINT) AS c_micro,
                            CAST(count(*) AS BIGINT) AS n_q
                     FROM pt),
              p1 AS (SELECT tf.doc_id, tf.dl,
                            CAST(floor(ln((CAST(tf.tf AS DOUBLE) + pt.mup)
                              / pt.mup) * 1e6 + 0.5) AS BIGINT) AS p1
                     FROM tf JOIN pt USING (tok)),
              sc AS (SELECT doc_id, dl,
                            CAST(count(*) AS BIGINT) AS n_terms,
                            CAST(sum(p1) AS BIGINT) AS s1
                     FROM p1 GROUP BY 1, 2),
              fin AS (SELECT doc_id, n_terms,
                             CAST(s1 + cs.c_micro - cs.n_q
                               * CAST(floor(ln(CAST(dl AS DOUBLE)
                                   + CAST(2000 AS DOUBLE)) * 1e6 + 0.5)
                                 AS BIGINT) AS BIGINT) AS ql_micro
                      FROM sc, cs)
              SELECT doc_id, n_terms, ql_micro,
                     CAST(ql_micro AS DOUBLE) / 1e6 AS ql
              FROM fin
              ORDER BY ql_micro DESC, doc_id LIMIT 20"""),
      "Dirichlet query-likelihood top-20 (the LM retrieval family)"),

    // Hybrid lexical+dense retrieval: the SAME BM25 scoring (shared CTE —
    // the two oracles cannot drift) fused with brute-cosine dense neighbors
    // of query vector 0 by reciprocal-rank fusion. Rank-only fusion, so the
    // incomparable BM25/cosine score scales never meet; reciprocals
    // quantize to integer micros (one double divide of exact integers) so
    // the fused total is an exact BIGINT in both engines.
    "t18_rrf_fusion" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val docs = t(s, dir, "documents")
        val emb = t(s, dir, "embeddings")
        // rank derivation runs on the ALREADY-CUT k-row list (bounded
        // single-partition window — k rows, never the corpus)
        val lex = Retrieval.bm25TopK(docs, Seq("spark", "vector", "stream"),
            k = 20)
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("bm25_q").desc, col("doc_id"))))
          .select("doc_id", "rank")
        val dense = Similarity.knnBrute(emb.filter(col("vec_id") === 0),
            emb, 20)
          .select(col("n_id").as("doc_id"), col("rank"))
        Retrieval.rrfFuse(Seq(lex, dense), k = 10)
      },
      Some(s"""WITH $Bm25Ctes,
               lexr AS (SELECT doc_id, rank FROM (
                          SELECT doc_id,
                                 CAST(row_number() OVER (
                                   ORDER BY bm25_q DESC, doc_id) AS INTEGER)
                                   AS rank
                          FROM bm) WHERE rank <= 20),
               q AS (SELECT embedding::DOUBLE[] AS qe
                     FROM embeddings WHERE vec_id = 0),
               c AS (SELECT vec_id AS n_id, embedding::DOUBLE[] AS ne
                     FROM embeddings WHERE vec_id <> 0),
               scored AS (SELECT n_id, ${sqlCos("qe", "ne")} AS sim
                          FROM q CROSS JOIN c),
               denser AS (SELECT n_id AS doc_id, rank FROM (
                            SELECT n_id,
                                   CAST(row_number() OVER (
                                     ORDER BY sim DESC, n_id) AS INTEGER)
                                     AS rank
                            FROM scored) WHERE rank <= 20),
               u AS (SELECT doc_id,
                            CAST(floor(1e6 / (60 + rank)) AS BIGINT) AS rrf_q
                     FROM lexr
                     UNION ALL
                     SELECT doc_id,
                            CAST(floor(1e6 / (60 + rank)) AS BIGINT)
                     FROM denser),
               f AS (SELECT doc_id, count(*) AS n_lists,
                            CAST(sum(rrf_q) AS BIGINT) AS rrf_q
                     FROM u GROUP BY doc_id)
               SELECT doc_id, n_lists, rrf_q,
                      CAST(rrf_q AS DOUBLE) / 1e6 AS rrf
               FROM f
               ORDER BY rrf_q DESC, doc_id
               LIMIT 10"""),
      "hybrid BM25+dense retrieval fused by reciprocal rank (RRF, k0=60)"),

    // RM3 pseudo-relevance feedback: BM25 → top-5 pseudo-relevant docs →
    // RM1 expansion-term mass (per-(term, doc) contributions quantized
    // BEFORE summation so addition order cannot drift) → λ=0.5
    // interpolated integer-micro term weights → weighted re-rank. The
    // oracle extends the SHARED Bm25Ctes chain (t17/t18 discipline), so
    // the first pass cannot drift from the gated BM25.
    "t21_rm3_expand" -> QueryDef(
      (s, dir) => Retrieval.rm3TopK(
        t(s, dir, "documents"), Seq("spark", "vector", "stream"), k = 10),
      Some(s"""WITH $Bm25Ctes,
               fb AS (SELECT doc_id, bm25_q FROM bm
                      ORDER BY bm25_q DESC, doc_id LIMIT 5),
               fbs AS (SELECT CAST(sum(bm25_q) AS BIGINT) AS s_tot FROM fb),
               ftf AS (SELECT t.doc_id, f.bm25_q, t.dl, t.tok,
                              count(*) AS tf
                       FROM tok t JOIN fb f USING (doc_id)
                       GROUP BY 1, 2, 3, 4),
               rmc AS (SELECT tok,
                              CAST(sum(CAST(floor(
                                (CAST(tf AS DOUBLE) * CAST(bm25_q AS DOUBLE))
                                / (CAST(dl AS DOUBLE) * CAST(s_tot AS DOUBLE))
                                * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS rm_q
                       FROM ftf CROSS JOIN fbs GROUP BY tok),
               ex AS (SELECT tok, rm_q FROM rmc
                      ORDER BY rm_q DESC, tok LIMIT 5),
               exs AS (SELECT CAST(sum(rm_q) AS BIGINT) AS rm_tot FROM ex),
               ot AS (SELECT unnest(['spark', 'vector', 'stream']) AS tok),
               wt AS (SELECT coalesce(o.tok, e.tok) AS tok,
                             (CASE WHEN o.tok IS NOT NULL
                                THEN 500000 // 3 ELSE 0 END)
                             + (CASE WHEN e.tok IS NOT NULL
                                  THEN CAST(floor(5e5 * CAST(e.rm_q AS DOUBLE)
                                    / CAST(rm_tot AS DOUBLE) + 0.5) AS BIGINT)
                                  ELSE 0 END) AS w_mic
                      FROM ot o FULL OUTER JOIN ex e ON o.tok = e.tok
                      CROSS JOIN exs),
               tf2 AS (SELECT t.doc_id, t.dl, t.tok, count(*) AS tf
                       FROM tok t JOIN wt USING (tok)
                       GROUP BY 1, 2, 3),
               df2 AS (SELECT tok, count(*) AS df FROM tf2 GROUP BY tok),
               sc2 AS (SELECT tf2.doc_id,
                              w_mic * CAST(floor(
                                CAST(CAST(floor(ln(1e0
                                      + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                                        / (CAST(df AS DOUBLE) + 0.5))
                                    * 1e6 + 0.5) AS BIGINT) AS DOUBLE)
                                * (CAST(tf AS DOUBLE) * 2.2e0
                                    / (CAST(tf AS DOUBLE)
                                       + 1.2e0 * (0.25e0
                                           + 0.75e0 * CAST(dl AS DOUBLE)
                                             / (CAST(sum_dl AS DOUBLE)
                                                / CAST(n_docs AS DOUBLE)))))
                                + 0.5) AS BIGINT) AS ws_q
                       FROM tf2 JOIN df2 USING (tok) JOIN wt USING (tok)
                       CROSS JOIN stats)
               SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
                      CAST(sum(ws_q) AS BIGINT) AS rm3_q,
                      CAST(CAST(sum(ws_q) AS BIGINT) AS DOUBLE) / 1e12 AS rm3
               FROM sc2 GROUP BY doc_id
               ORDER BY rm3_q DESC, doc_id
               LIMIT 10"""),
      "RM3 pseudo-relevance feedback: BM25 + RM1 expansion, weighted re-rank"),

    // MMR diversified re-rank at λ=½ over the dense top-10: greedy k=3
    // selection, argmax per step packed into one BIGINT key
    // (mmr4·2²¹ + (2²¹−1−n_id)) so both engines pick bit-identical
    // winners with ties to the smaller id. The oracle UNROLLS the greedy
    // loop (k is a constant of the query, so straight-line CTE stages —
    // recursion-free and window-free in the iterated part).
    "t24_mmr_rerank" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        Retrieval.mmrRerank(emb.filter(col("vec_id") < 3), emb,
          k = 3, fetch = 10)
      },
      Some(
        s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe
                       FROM embeddings WHERE vec_id < 3),
            c0 AS (SELECT vec_id AS n_id, embedding::DOUBLE[] AS ne
                   FROM embeddings),
            scored AS (SELECT q_id, n_id, ${sqlCos("qe", "ne")} AS sim
                       FROM q CROSS JOIN c0 WHERE q_id <> n_id),
            cand AS (SELECT q_id, n_id,
                            CAST(floor(sim * 1e4 + 0.5) AS BIGINT) AS rel4
                     FROM (SELECT q_id, n_id, sim,
                                  row_number() OVER (PARTITION BY q_id
                                    ORDER BY sim DESC, n_id) AS rn
                           FROM scored)
                     WHERE rn <= 10),
            cande AS (SELECT c.q_id, c.n_id, e.embedding::DOUBLE[] AS ne
                      FROM cand c JOIN embeddings e ON c.n_id = e.vec_id),
            psims AS (SELECT a.q_id, a.n_id AS c_a, b.n_id AS c_b,
                             CAST(floor(${sqlCos("a.ne", "b.ne")} * 1e4 + 0.5)
                               AS BIGINT) AS sim4
                      FROM cande a JOIN cande b
                        ON a.q_id = b.q_id AND a.n_id <> b.n_id),
            k1 AS (SELECT q_id,
                          max(rel4 * $MmrM + ($MmrM - 1 - n_id)) AS key
                   FROM cand GROUP BY q_id),
            res1 AS (${sqlMmrDecode("k1", 1)}),
            ${sqlMmrSteps(3)}
            SELECT q_id, CAST(step AS INTEGER) AS step,
                   CAST(n_id AS BIGINT) AS n_id,
                   CAST(mmr4 AS BIGINT) AS mmr4
            FROM res3"""),
      "MMR diversified re-rank: greedy relevance-vs-redundancy selection, integer-exact"),

    // Flagship composition #3 — the SERVING stack: retrieve LEXICALLY
    // (BM25 top-8), diversify SEMANTICALLY (greedy MMR over embedding
    // cosines, k=3). Relevance and diversity deliberately come from
    // different modalities; the BM25 micro score maps onto the MMR grid
    // by exact integer division. Oracle = the shared Bm25Ctes chain + the
    // shared MMR unroll — neither stage can drift from its standalone
    // gate (t17/t24 discipline).
    "pipe3_retrieval_stack" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Retrieval.retrievalStack(t(s, dir, "documents"),
          t(s, dir, "embeddings"), Seq("spark", "vector", "stream"),
          k = 3, fetch = 8)
      },
      Some(
        s"""WITH $Bm25Ctes,
            cand AS (SELECT * FROM (
                       SELECT CAST(0 AS BIGINT) AS q_id, doc_id AS n_id,
                              CAST(bm25_q // 1000 AS BIGINT) AS rel4
                       FROM bm ORDER BY bm25_q DESC, doc_id LIMIT 8)
                     WHERE n_id IN (SELECT vec_id FROM embeddings)),
            cande AS (SELECT c.q_id, c.n_id, e.embedding::DOUBLE[] AS ne
                      FROM cand c JOIN embeddings e ON c.n_id = e.vec_id),
            psims AS (SELECT a.q_id, a.n_id AS c_a, b.n_id AS c_b,
                             CAST(floor(${sqlCos("a.ne", "b.ne")} * 1e4 + 0.5)
                               AS BIGINT) AS sim4
                      FROM cande a JOIN cande b
                        ON a.q_id = b.q_id AND a.n_id <> b.n_id),
            k1 AS (SELECT q_id,
                          max(rel4 * $MmrM + ($MmrM - 1 - n_id)) AS key
                   FROM cand GROUP BY q_id),
            res1 AS (${sqlMmrDecode("k1", 1)}),
            ${sqlMmrSteps(3)}
            SELECT CAST(step AS INTEGER) AS step,
                   CAST(n_id AS BIGINT) AS doc_id,
                   CAST(mmr4 AS BIGINT) AS mmr4
            FROM res3"""),
      "retrieval stack: BM25 lexical retrieve -> semantic MMR diversify"),

    // Entity resolution → golden records (the MDM composition): d24's
    // prefix-blocked native Jaro-Winkler pairs feed the star-rounds
    // transitive closure (entity id = component-min record id), then ONE
    // struct-min hash-agg per entity picks the highest-acctbal survivor
    // and carries its attributes — no window sort, no join-back; unmatched
    // customers pass through as single-record entities. The entity total
    // sums integer cents (doubles micro-quantized BEFORE the agg) so the
    // figure replays bit-for-bit in any engine. Oracle: blocking +
    // jaro_winkler_similarity + recursive-CTE closure + window-ranked
    // survivorship in one statement.
    "pipe4_entity_resolution" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        graft.ext.EntityResolution.resolveEntities(
          t(s, dir, "customer").filter(col("c_custkey") <= 400),
          idCol = "c_custkey", nameCol = "c_name", qualityCol = "c_acctbal",
          carryCols = Seq("c_mktsegment"), blockPrefix = 12, minSim = 0.98)
      },
      Some("""WITH RECURSIVE c AS (SELECT c_custkey AS id, c_name AS nm,
                                          c_mktsegment AS seg, c_acctbal AS q
                                   FROM customer WHERE c_custkey <= 400),
              okb AS (SELECT substr(nm, 1, 12) AS blk FROM c
                      GROUP BY blk HAVING count(*) <= 10000),
              pairs AS (SELECT a.id AS id_a, b.id AS id_b
                        FROM c a JOIN c b
                          ON substr(a.nm, 1, 12) = substr(b.nm, 1, 12)
                         AND a.id < b.id
                        WHERE substr(a.nm, 1, 12) IN (SELECT blk FROM okb)
                          AND round(jaro_winkler_similarity(a.nm, b.nm), 4)
                               >= 0.98),
              edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                        UNION ALL SELECT id_b, id_a FROM pairs),
              reach(src, dst) AS (
                SELECT src, dst FROM edges
                UNION
                SELECT r.src, e.dst FROM reach r JOIN edges e
                  ON r.dst = e.src),
              cl AS (SELECT src AS id, least(src, min(dst)) AS entity_id
                     FROM reach GROUP BY src),
              assign AS (SELECT c.id, coalesce(cl.entity_id, c.id)
                                  AS entity_id,
                                c.nm, c.seg, c.q
                         FROM c LEFT JOIN cl ON c.id = cl.id),
              scored AS (SELECT *, row_number() OVER (PARTITION BY entity_id
                                     ORDER BY q DESC, id) AS rn
                         FROM assign)
              SELECT entity_id,
                     max(CASE WHEN rn = 1 THEN id END) AS keeper_id,
                     max(CASE WHEN rn = 1 THEN nm END) AS c_name,
                     max(CASE WHEN rn = 1 THEN q END) AS c_acctbal,
                     max(CASE WHEN rn = 1 THEN seg END) AS c_mktsegment,
                     CAST(sum(CAST(floor(q * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS total_q100,
                     count(*) AS n_records
              FROM scored GROUP BY entity_id"""),
      "entity resolution: blocked JW match -> closure -> golden record"))
}
