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

/** PipelineQueries: mixture sampling, sequence packing, sketches, heavy hitters, source capping, end-to-end curation.
  *
  * One slice of the driver-contract registry (VERDICT r06 item 8 split
  * of the 5,000-line SparkEntry monolith). Entry bodies are UNCHANGED;
  * graft.SparkEntry merges every family into the single `queries` /
  * `oracleSql` maps the driver consumes, and ContractSpec keeps the
  * key sets equal. */
private[graft] object PipelineQueries extends QueryFamily {
  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // Deterministic mixture sampling (training-mix assembly): each source
    // stratum is Bernoulli-sampled at its target rate by a pure integer
    // hash of doc_id — no RNG state, no sampleBy second pass, decisions
    // reproducible row-by-row (re-runs and incremental appends keep the
    // exact same sample). Rates are derived from the source suffix so the
    // contract covers 20 strata without a literal table. The DuckDB twin
    // recomputes hash, rate, and per-stratum kept counts exactly.
    "q88_mixture_sample" -> ((s, dir) => {
      val ratePpm = (lit(100000L) + lit(50000L) *
        (expr("CAST(substr(source, 4) AS INT)") % 10)).cast("long")
      docs(s, dir)
        .withColumn("target_ppm", ratePpm)
        .withColumn("keep",
          Packing.mixtureKeep(col("doc_id"), col("target_ppm")).cast("int"))
        .groupBy(col("source"), col("target_ppm"))
        .agg(count(lit(1)).as("n_total"),
          sum(col("keep")).cast("long").as("n_kept"))
    }),

    // Greedy sequence packing (the step that turns filtered docs into
    // fixed-budget training shards): within each (source, 100-doc_id
    // chunk) group, docs in doc_id order pack next-fit into <=160-token
    // shards. The sequential recurrence is confined to bounded chunks —
    // group memory is O(chunkSize) at any corpus size and parallelism
    // grows with the data. The DuckDB twin replays the fold exactly via
    // a recursive CTE, so a wrong boundary decision on any single doc
    // breaks the hash.
    "q89_pack_sequences" -> ((s, dir) =>
      Packing.packGreedy(docs(s, dir), budget = 160, chunkSize = 100)),

    // Sketch aggregates — the single-pass approximate reporting ops a
    // 100 TB pipeline uses where exact distinct/percentile would shuffle
    // the corpus: HLL++ (approx_count_distinct) and QuantileSummaries
    // (approx_percentile). Both are mergeable sketches (commutative
    // combine — partitioning-independent results). The oracle gates the
    // CONTRACT: HLL relative error vs the in-query exact distinct must
    // round to 0 residual at a 5% tolerance (rsd=2%), and the approx
    // median's true rank must sit within 2% of 0.5; anchor rows (exact
    // n_rows / n_distinct) are recomputed by DuckDB from the base table.
    "q90_sketches" -> ((s, dir) => {
      val ev = Trajectories.table(s, dir, "events")
      val r = ev.agg(
        approx_count_distinct(col("user_id"), 0.02).as("acd"),
        countDistinct(col("user_id")).as("exact_d"),
        expr("approx_percentile(value, 0.5, 1000)").as("p50"),
        count(lit(1)).as("n")).collect()(0)
      val (acd, exactD, p50, n) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      val rankP50 = ev.where(col("value") <= p50).count()
      checksDf(s, Seq(
        "acd_relerr_over_5pct" ->
          math.max(0.0, math.abs(acd - exactD).toDouble / exactD - 0.05),
        "p50_rank_err_over_2pct" ->
          math.max(0.0, math.abs(rankP50.toDouble / n - 0.5) - 0.02),
        "n_rows" -> n.toDouble,
        "n_distinct_users" -> exactD.toDouble))
    }),

    // ---- end-to-end curation pipeline (q101): the five stages a corpus
    // actually flows through, COMPOSED — Gopher gate -> exact dedup
    // (keep min doc_id per fingerprint) -> unigram-LM scoring fit on the
    // dedup survivors -> deterministic mixture sampling -> next-fit
    // sequence packing. Scale shape of the whole chain: the gate is a
    // codegen filter at the scan, dedup is the pipeline's one corpus-keyed
    // shuffle, the LM is a vocabulary-sized broadcast, sampling is a
    // map-side hash predicate, and packing is confined to bounded chunks —
    // ~3 shuffles end to end at any corpus size. The DuckDB twin replays
    // every stage including the recursive packing fold, so one wrong
    // keep/drop/boundary decision anywhere in the chain breaks the hash.
    "q101_curation_pipeline" -> ((s, dir) => {
      val d = docs(s, dir)
      val gated = d.withColumn("g", TextFunctions.gopherGate(col("text")))
        .where(col("g.keep") === 1).drop("g")
      val withFp = gated.withColumn("fp", TextFunctions.fingerprint(col("text")))
      val minIds = withFp.groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
      // both downstream consumers (LM scoring and the sample->pack leg)
      // read the deduped frame: materialize the regex-heavy gate+dedup
      // once instead of deriving it per consumer
      val deduped = withFp.join(minIds, Seq("fp", "doc_id"), "left_semi")
        .localCheckpoint()
      val scored = Scoring.unigramNll(deduped).select(col("doc_id"), col("avg_nll"))
      val ratePpm = (lit(100000L) + lit(50000L) *
        (expr("CAST(substr(source, 4) AS INT)") % 10)).cast("long")
      val sampled = deduped.where(Packing.mixtureKeep(col("doc_id"), ratePpm))
      Packing.packGreedy(sampled, budget = 160, chunkSize = 100)
        .join(scored, "doc_id")
        .select(col("doc_id"), col("source"), col("chunk"), col("n_tokens"),
          col("shard"), col("avg_nll"))
    }),

    // ---- per-source quality cap (q107): the CommonCrawl-style domain
    // cap — keep at most K=50 highest-quality documents per source
    // (quality desc, doc_id tie-break). The rank filter triggers Spark's
    // WindowGroupLimit pushdown: each map partition keeps only its local
    // top-K per source BEFORE the shuffle, so the exchange carries
    // O(sources*K) rows per partition regardless of corpus size. ---------
    "q107_source_quality_cap" -> ((s, dir) => {
      val q = docs(s, dir).select(col("doc_id"), col("source"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      val w = Window.partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
      q.withColumn("rk", row_number().over(w).cast("long")).where(col("rk") <= 50)
    }),

    // ---- mergeable-sketch re-aggregation (q125): the incremental-
    // corpus-stats identity — HLL sketches built PER SOURCE, then
    // union-merged, must land on byte-identical registers (hence the
    // identical estimate) as one direct corpus-level sketch, because HLL
    // union is per-register max. This is the property that lets a 100 TB
    // pipeline keep per-partition/per-day sketches and re-aggregate
    // without rescanning; the estimate itself is gated against the exact
    // distinct count (DuckDB anchor) with the standard error bound. -----
    "q125_sketch_merge" -> ((s, dir) => {
      val words = docs(s, dir).select(col("source"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .where(col("w") =!= "")
      val perSource = words.groupBy("source")
        .agg(expr("hll_sketch_agg(w, 12)").as("sk"))
      val merged = perSource
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
        .collect()(0).getLong(0)
      // direct sketch + exact distinct share ONE corpus pass
      val de = words.agg(
        expr("hll_sketch_estimate(hll_sketch_agg(w, 12))").as("est"),
        countDistinct(col("w")).as("exact")).collect()(0)
      val (direct, exact) = (de.getLong(0), de.getLong(1))
      checksDf(s, Seq(
        "merge_vs_direct_resid" -> math.abs(merged - direct).toDouble,
        "est_relerr_over_5pct" ->
          math.max(0.0, math.abs(direct - exact).toDouble / exact - 0.05),
        "n_distinct_words" -> exact.toDouble))
    }),

    // ---- weighted reservoir sample (q155): length-weighted sampling
    // without replacement (Efraimidis–Spirakis), integer-exact — the
    // key is the max of n_chars per-(id, j) affine hashes, which is
    // distributionally the textbook u^(1/w) priority with no ln/pow
    // (cross-engine libm ulp differences sit exactly where a top-k
    // boundary lands). One map-side O(corpus chars) scan, then a
    // distributed TakeOrdered of 20 (rkey, id, weight) triples — no
    // payload ever shuffles. The twin replays hash, max, and the
    // (key desc, id) tie-break bit-for-bit. ----------------------------
    "q155_weighted_reservoir" -> ((s, dir) =>
      Packing.weightedReservoir(docs(s, dir), k = 20)),

    // ---- temperature mixture sampling (q132): the multi-source mixing
    // scheme of multilingual/multi-corpus training (alpha-weighted:
    // small sources up-weighted relative to size) — per-source quota
    // floor(12*sqrt(n_s)) (alpha = 0.5), filled by the deterministic
    // affine-hash order (q88's RNG-free sampling), so re-runs and
    // re-crawls keep the same docs. sqrt/mul/floor are all IEEE-exact,
    // so the quota boundary is bit-identical across engines. One
    // per-source window; quotas broadcast. ------------------------------
    "q132_temperature_mixture" -> ((s, dir) => {
      val d = docs(s, dir)
      val quotas = d.groupBy("source").agg(count(lit(1)).as("n"))
        .select(col("source"),
          floor(sqrt(col("n").cast("double")) * 12.0).cast("long").as("quota"))
      val w = Window.partitionBy("source")
        .orderBy(Packing.sampleHashPpm(col("doc_id")), col("doc_id"))
      d.select(col("doc_id"), col("source"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .join(broadcast(quotas), "source")
        .where(col("rk") <= col("quota"))
        .select(col("source"), col("doc_id"), col("rk"), col("quota"))
    }),

    // ---- count-min-sketch heavy hitters (q112): the q90 sketch family
    // extended to frequency estimation — Spark's distributed CMS
    // (treeAggregate, 435 KB at eps=1e-3/delta=1e-6) against the exact
    // top-10 token counts. CMS NEVER underestimates, and the seeded
    // sketch makes the eps*N overshoot bound a deterministic residual;
    // exact counts and deterministic (cnt desc, tok) tie-break anchor
    // the oracle. The scale story: the sketch replaces the full
    // (token, count) shuffle with a fixed-width mergeable summary. ------
    "q112_heavy_hitters" -> ((s, dir) => {
      val t = docs(s, dir).select(
          explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        .where(col("tok") =!= "")
      val top = t.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(10).collect()
      val cms = t.stat.countMinSketch("tok", eps = 0.001,
        confidence = 0.999999, seed = 42)
      val totalN = cms.totalCount.toDouble
      import s.implicits._
      top.map { r =>
        val tok = r.getString(0)
        val cnt = r.getLong(1)
        val est = cms.estimateCount(tok)
        (tok, cnt, if (est < cnt) 1L else 0L,
          math.max(0.0, (est - cnt).toDouble - 0.001 * totalN))
      }.toSeq.toDF("tok", "cnt", "under_viol", "over_resid")
    }),

    // ---- model persistence roundtrip (q141): the fitted TICA Koopman
    // model and a k-means cluster model survive the JSON save/load
    // bit-for-bit (Double.toString shortest-repr roundtrip), gated as
    // exact-zero residuals with exact shape anchors — the io surface the
    // reference ships as save_/load_model. ------------------------------
    "q141_persistence_roundtrip" -> ((s, dir) => {
      val model = graft.decomposition.Tica.fitFromCovariance(
        Covariance.fit(liPairs(s, dir)), tau = 1, dim = 2)
      val tmp = java.nio.file.Files.createTempDirectory("graft-q141").toString
      graft.io.Persistence.saveJson(
        graft.io.Persistence.koopmanToJson(model), s"$tmp/koopman.json")
      val back = graft.io.Persistence.koopmanFromJson(
        graft.io.Persistence.loadJson(s"$tmp/koopman.json"))
      def maxDiff(a: Array[Double], b: Array[Double]): Double =
        if (a.length != b.length) Double.MaxValue
        else a.zip(b).map { case (x, y) => math.abs(x - y) }.foldLeft(0.0)(math.max)
      // the oracle gates the ROUNDTRIP residuals (exact zeros) and the
      // center count, not which rows trained the model — fit on the
      // documented 65536-row sampled cap (the KMeansPlusPlus landmark
      // rule) instead of the full frame: MLlib's k-means|| init alone
      // cost ~7 passes over 600k rows here, all setup the gate never
      // looks at (VERDICT r15 task 4: q141 was the slowest query two
      // rounds running)
      val kmTrain = graft.util.Sampling.rowCap(liTraj(s, dir))
      val km = graft.clustering.KMeans.fit(kmTrain, k = 3,
        maxIter = 5, seed = 42L)
      graft.io.Persistence.saveJson(
        graft.io.Persistence.clusterToJson(km), s"$tmp/cluster.json")
      val kmBack = graft.io.Persistence.clusterFromJson(
        graft.io.Persistence.loadJson(s"$tmp/cluster.json"))
      val centerDiff = km.centers.zip(kmBack.centers)
        .map { case (a, b) => maxDiff(a, b) }.foldLeft(0.0)(math.max)
      checksDf(s, Seq(
        "koopman_u_roundtrip" -> maxDiff(model.u, back.u),
        "koopman_sv_roundtrip" -> maxDiff(model.singularValues, back.singularValues),
        "koopman_mean_roundtrip" -> maxDiff(model.mean0, back.mean0),
        "koopman_tau_dim" -> ((back.tau - model.tau) + (back.d - model.d)
          + (back.k - model.k)).toDouble,
        "cluster_centers_roundtrip" -> centerDiff,
        "n_centers" -> kmBack.centers.length.toDouble))
    }),

    // ---- partitioned sink + pruned re-scan (q167): the write-side
    // layout lever — events land hive-partitioned by event_type
    // (sources/Sinks.writePartitioned) and the re-scan's event_type
    // filter prunes to ONE directory BEFORE any I/O. Both pruning facts
    // are asserted loud in-query (executed-plan PartitionFilters + every
    // input file under event_type=click/); the agg answer itself is
    // layout-invariant, which is exactly what the oracle checks. --------
    "q167_partitioned_sink" -> ((s, dir) => {
      val ev = Trajectories.table(s, dir, "events")
        .select(col("event_type"), col("user_id"), col("value"))
      val path = graft.sources.Sinks.writePartitioned(
        ev, "events_by_type", dir, "event_type")
      val back = s.read.parquet(path).where(col("event_type") === "click")
      val plan = back.queryExecution.executedPlan.toString
      require(plan.contains("PartitionFilters"),
        s"q167: expected partition pruning in plan:\n$plan")
      // the EXECUTED scan's selected partitions (inputFiles would list the
      // whole relation pre-pruning)
      val files = back.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.flatMap(_.selectedPartitions.toPartitionArray).map(_.filePath.toString)
      require(files.nonEmpty && files.forall(_.contains("event_type=click")),
        s"q167: scan not pruned to the click partition: ${files.take(3).mkString(",")}")
      back.groupBy((col("user_id") % 16).as("bucket"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value"))
    }),

    // ---- bucketed-table co-located join (q168): both per-user aggregate
    // tables are WRITTEN bucketed+sorted on user_id (sources/
    // Sinks.writeBucketed, 8 buckets), so the recurring join reads back
    // hash-partitioned and plans with ZERO exchanges — the join's shuffle
    // was paid once at write time, the point of bucketing a 100 TB fact
    // table's join key. Asserted loud in-query: the joined plan contains
    // no Exchange operator and no broadcast (merge hint), yet is a
    // SortMergeJoin over the bucketed scans. ----------------------------
    "q168_bucketed_join" -> ((s, dir) => {
      val ev = Trajectories.table(s, dir, "events")
        .select(col("event_type"), col("user_id"), col("value"))
      val clicks = ev.where(col("event_type") === "click")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_clicks"), round(avg(col("value")), 6).as("avg_click"))
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_purchases"), round(avg(col("value")), 6).as("avg_purchase"))
      val tc = graft.sources.Sinks.writeBucketed(clicks, "q168_clicks", dir, "user_id", 8)
      val tp = graft.sources.Sinks.writeBucketed(purchases, "q168_purch", dir, "user_id", 8)
      val joined = s.table(tc).join(s.table(tp).hint("merge"), Seq("user_id"))
      val plan = joined.queryExecution.executedPlan.toString
      require(!plan.contains("Exchange"),
        s"q168: bucketed join should have no exchange:\n$plan")
      require(plan.contains("SortMergeJoin"),
        s"q168: expected a sort-merge join over bucketed scans:\n$plan")
      joined.select(col("user_id"), col("n_clicks"), col("avg_click"),
        col("n_purchases"), col("avg_purchase"))
    }),

    // ---- small-files compaction (q177): a fragmented sink (64 shards of
    // the events table — a day of streaming micro-batches in miniature)
    // compacted to 4 scan-sized files (sources/Sinks.compact). The
    // battery asserts the maintenance contract: file count collapses
    // 64 -> <= 4, and BOTH layouts carry exactly the base-table row count
    // and value sum (content untouched, the part the oracle recomputes).
    "q177_compaction" -> ((s, dir) => {
      val ev = Trajectories.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val frag = graft.sources.Sinks.scratchPath("q177_frag", dir)
      ev.repartition(64).write
        .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(frag)
      val nBefore = graft.sources.Sinks.dataFileCount(frag)
      val compacted = graft.sources.Sinks.compact(s, frag, 4)
      val nAfter = graft.sources.Sinks.dataFileCount(compacted)
      val a = s.read.parquet(frag)
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sid")).collect()(0)
      val b = s.read.parquet(compacted)
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sid")).collect()(0)
      checksDf(s, Seq(
        "files_before_under_64" -> math.max(0L, nBefore - 64L).toDouble,
        "files_after_over_4" -> math.max(0L, nAfter - 4L).toDouble,
        "row_drift" -> math.abs(a.getLong(0) - b.getLong(0)).toDouble,
        "id_sum_drift" -> math.abs(a.getLong(1) - b.getLong(1)).toDouble,
        "n_rows" -> a.getLong(0).toDouble))
    }),

    // ---- range-clustered sink (q178): events written range-partitioned
    // + sorted on user_id (sources/Sinks.writeRangeClustered) so every
    // output file covers a DISJOINT user interval — the open-format
    // cluster-by that makes parquet min/max stats prune user_id filters.
    // The battery PROVES disjointness from the files themselves (per-file
    // min/max via input_file_name) and pins content parity. ------------
    "q178_range_clustered_sink" -> ((s, dir) => {
      val ev = Trajectories.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val path = graft.sources.Sinks.writeRangeClustered(
        ev, "q178_cluster", dir, "user_id", nFiles = 8)
      val perFile = s.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("user_id")).as("lo"), max(col("user_id")).as("hi"),
          count(lit(1)).as("n"))
        .collect().sortBy(_.getLong(1))
      val overlaps = perFile.sliding(2).count {
        case Array(a, b) => b.getLong(1) <= a.getLong(2)
        case _ => false
      }
      val nRows = perFile.map(_.getLong(3)).sum
      checksDf(s, Seq(
        "file_range_overlaps" -> overlaps.toDouble,
        "files_over_8" -> math.max(0, perFile.length - 8).toDouble,
        "n_rows" -> nRows.toDouble))
    }),

    // ---- content fingerprint (q179): an ORDER-INDEPENDENT per-source
    // checksum — sum of a 32-bit md5 slice of each row's canonical
    // "doc_id|text" form. The lineage/integrity primitive of a pipeline:
    // a copy job, a migration, or a re-partition must reproduce the exact
    // fp_sum; any dropped/duplicated/mutated row shifts it. Pure map-side
    // math + one small aggregation; commutative, so partitioning and row
    // order can never change the answer. --------------------------------
    "q179_content_fingerprint" -> ((s, dir) => {
      docs(s, dir)
        .select(col("source"),
          conv(substring(md5(concat_ws("|",
            col("doc_id").cast("string"), col("text"))), 1, 8), 16, 10)
            .cast("long").as("key32"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("key32")).as("fp_sum"))
    }),

    // ---- JSONL source (q193): the interchange format every ingest
    // pipeline meets — events round-trip through line-delimited JSON and
    // read back with an EXPLICIT schema (never inference: schema
    // inference is a full extra scan of a 100 TB drop, and a silently
    // widened type). The agg must be byte-identical to the parquet path.
    "q193_jsonl_source" -> ((s, dir) => {
      val ev = Trajectories.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val path = graft.sources.Sinks.scratchPath("q193_jsonl", dir)
      ev.write.mode(org.apache.spark.sql.SaveMode.Overwrite).json(path)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType)))
      s.read.schema(schema).json(path)
        .groupBy((col("user_id") % 8).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"),
          round(avg(col("value")), 6).as("avg_value"))
    }),

    // ---- CSV source (q194): same contract over CSV (explicit schema,
    // no header) — the format the most data still arrives in. ----------
    "q194_csv_source" -> ((s, dir) => {
      val ev = Trajectories.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val path = graft.sources.Sinks.scratchPath("q194_csv", dir)
      ev.write.mode(org.apache.spark.sql.SaveMode.Overwrite).csv(path)
      s.read.schema("event_id LONG, user_id LONG, value DOUBLE").csv(path)
        .groupBy((col("user_id") % 8).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"),
          round(avg(col("value")), 6).as("avg_value"))
    }),

    // ---- curriculum shard assignment (q186): docs rank by quality
    // within their source and deal round-robin into 8 shards — every
    // shard gets a near-identical quality mixture (the deterministic
    // alternative to shuffling before sharding, and re-runs/appends keep
    // assignments stable). One per-source rank window; output is the
    // per-shard census the twin replays exactly. ------------------------
    "q186_curriculum_shards" -> ((s, dir) => {
      val q = docs(s, dir).select(col("doc_id"), col("source"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      val w = Window.partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
      q.withColumn("shard", (row_number().over(w) - 1) % 8)
        .groupBy("shard")
        .agg(count(lit(1)).as("n"),
          round(avg(col("quality")), 6).as("avg_quality"))
    }),

    // ---- stratified fixed-k sample (q187): exactly k=8 docs per source
    // by the q155 integer ES key restricted per stratum — the
    // "balanced eval slice" sampler (per-domain holdouts, per-language
    // probes). Same RNG-free key, so the stratified sample is stable
    // under re-runs and appends; one window per stratum, no global
    // ordering anywhere. ------------------------------------------------
    "q187_stratified_sample" -> ((s, dir) => {
      val keyed = docs(s, dir).select(col("doc_id"), col("source"), col("n_chars"),
        Packing.reservoirKey(col("doc_id"), col("n_chars")).as("rkey"))
      val w = Window.partitionBy("source").orderBy(col("rkey").desc, col("doc_id"))
      keyed.withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 8)
        .select(col("source"), col("doc_id"), col("n_chars"), col("rk"))
    }),

    // ---- changelog / CDC upsert (q184): the MERGE INTO primitive —
    // a deterministic synthetic changelog (every doc_id%6==0 gets an
    // update at seq 2, every doc_id%9==0 a delete at seq 3) folds onto
    // the doc_id%3==0 snapshot latest-wins (operators/Changelog:
    // one union + one per-key rank window, a single key exchange).
    // Output: per doc_id%7 bucket, surviving count + char sum — the twin
    // replays insert/update/delete precedence exactly. ------------------
    "q184_changelog_merge" -> ((s, dir) => {
      val base = docs(s, dir).where(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("n_chars"))
      val updates = docs(s, dir).where(col("doc_id") % 6 === 0)
        .select(col("doc_id"), (col("n_chars") + 1000L).as("n_chars"),
          lit(2L).as("seq"), lit("U").as("op"))
      val deletes = docs(s, dir).where(col("doc_id") % 9 === 0)
        .select(col("doc_id"), lit(0L).as("n_chars"),
          lit(3L).as("seq"), lit("D").as("op"))
      val merged = graft.operators.Changelog.applyLatestWins(
        base, updates.unionByName(deletes), "doc_id", "seq", "op")
      merged.groupBy((col("doc_id") % 7).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
    }),

    // ---- schema-evolution union read (q185): two parquet batches with
    // DIFFERENT schemas (batch 1 without the value column, batch 2 with
    // it) read back as one table via mergeSchema — the additive-column
    // migration every long-lived dataset goes through; old rows surface
    // NULL for the new column. One write + one merged scan; the agg
    // proves both the union arithmetic and the null-fill. ---------------
    "q185_schema_evolution" -> ((s, dir) => {
      val ev = Trajectories.table(s, dir, "events")
      val root = graft.sources.Sinks.scratchPath("q185_evolve", dir)
      ev.select(col("event_id"), col("user_id"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$root/batch=1")
      ev.select(col("event_id"), col("user_id"), col("value"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$root/batch=2")
      val merged = s.read.option("mergeSchema", "true").parquet(root)
      require(merged.columns.contains("value"),
        s"q185: merged schema lost the evolved column: ${merged.columns.mkString(",")}")
      merged.groupBy((col("user_id") % 8).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("value")).as("n_with_value"),
          round(avg(col("value")), 6).as("avg_value"))
    }),

    // ---- ORC source (q197): third columnar round-trip after parquet/
    // JSONL/CSV — ORC ships in Spark core (no extra dependency) and is
    // the other columnar format a lake migration meets. Same
    // format-invariance contract: write events as ORC, read back with
    // the explicit schema, aggregate must equal the parquet answer. ----
    "q197_orc_source" -> ((s, dir) => {
      val ev = Trajectories.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val path = graft.sources.Sinks.scratchPath("q197_orc", dir)
      ev.write.mode(org.apache.spark.sql.SaveMode.Overwrite).orc(path)
      s.read.schema("event_id LONG, user_id LONG, value DOUBLE").orc(path)
        .groupBy((col("user_id") % 8).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"),
          round(avg(col("value")), 6).as("avg_value"))
    }),

    // ---- Z-order layout (q198): Morton-interleave quantized
    // (o_custkey, o_totalprice) and bucket the table by the code's top 5
    // bits (32 quad-tree cells) vs the single-column layout (top 5 bits
    // of qx alone). The output is the DATA-SKIPPING ledger: for a probe
    // range on each dimension, how many of the 32 buckets' min/max spans
    // overlap it — the z-order layout prunes on BOTH dimensions, the
    // linear layout only on its sort key. Pure integer arithmetic (the
    // qy quantization divides doubles by the same literal on both
    // engines, then floors), so the twin replays it exactly;
    // sources/Layout holds the interleave expression. ------------------
    "q198_zorder_layout" -> ((s, dir) => {
      val o = Trajectories.table(s, dir, "orders")
      val maxes = o.agg(max(col("o_custkey")).as("maxc"),
        max(col("o_totalprice")).as("maxp"))
      val q = o.crossJoin(broadcast(maxes))
        .select(col("o_orderkey"),
          expr("CAST((o_custkey * 256) DIV (maxc + 1) AS BIGINT)").as("qx"),
          expr("CAST(floor(o_totalprice * 256.0 / (maxp + 1.0)) AS BIGINT)").as("qy"))
        .withColumn("morton",
          graft.sources.Layout.mortonInterleave(col("qx"), col("qy"), 8))
      // bucket spans under each layout: morton top-5-bits vs qx top-5-bits
      def spans(bucketCol: org.apache.spark.sql.Column, layout: String) =
        q.groupBy(bucketCol.as("bucket"))
          .agg(min(col("qx")).as("min_qx"), max(col("qx")).as("max_qx"),
            min(col("qy")).as("min_qy"), max(col("qy")).as("max_qy"))
          .agg(count(lit(1)).as("n_buckets"),
            sum(when(col("min_qx") <= 31, 1L).otherwise(0L)).as("scan_qx"),
            sum(when(col("min_qy") <= 31, 1L).otherwise(0L)).as("scan_qy"))
          .select(lit(layout).as("layout"), col("n_buckets"),
            col("scan_qx"), col("scan_qy"))
      spans(shiftright(col("morton"), 11), "zorder")
        .unionByName(spans(shiftright(col("qx"), 3), "linear"))
    }),

    // ---- SCD type-2 dimension build (q204): turn a customer's ordered
    // status history (orders as the changelog) into versioned rows with
    // [effective_from, effective_to) validity and an is_current flag —
    // the warehouse-dimension primitive next to q184's latest-wins
    // merge. Gaps-and-islands with two per-customer windows (one hash
    // exchange): a change flag via lag, a running version id via sum,
    // then lead over version starts for the closing edge. ---------------
    "q204_scd2" -> ((s, dir) => {
      val o = Trajectories.table(s, dir, "orders")
        .select(col("o_custkey").as("cust"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("tsu"),
          col("o_orderkey").as("okey"), col("o_orderstatus").as("status"))
      val wOrd = Window.partitionBy("cust").orderBy(col("tsu"), col("okey"))
      val flagged = o
        .withColumn("chg",
          when(lag(col("status"), 1).over(wOrd).isNull ||
            lag(col("status"), 1).over(wOrd) =!= col("status"), 1L).otherwise(0L))
        .withColumn("version", sum(col("chg")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val versions = flagged.groupBy(col("cust"), col("version"), col("status"))
        .agg(min(col("tsu")).as("eff_from"))
      val wVer = Window.partitionBy("cust").orderBy(col("version"))
      versions
        .withColumn("eff_to",
          coalesce(lead(col("eff_from"), 1).over(wVer), lit(-1L)))
        .withColumn("is_current",
          when(col("eff_to") === -1L, 1L).otherwise(0L))
        .where(col("cust") % 17 === 0)
        .select(col("cust"), col("version"), col("status"),
          col("eff_from"), col("eff_to"), col("is_current"))
    }),

    // ---- partition backfill (q211): the lake correction primitive —
    // events land partitioned by day; one day is later re-written with
    // corrected values (value doubled) under DYNAMIC partition
    // overwrite, which replaces ONLY the partitions present in the new
    // write (static overwrite would wipe the whole table; per-partition
    // idempotent re-writes are how a 100 TB pipeline backfills). The
    // read-back aggregate proves exactly one day changed. ---------------
    "q211_backfill" -> ((s, dir) => {
      val ev = Trajectories.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"),
          expr("ts div 86400000000000").as("day"))
      val path = graft.sources.Sinks.scratchPath("q211_backfill", dir)
      ev.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("day").parquet(path)
      val fixDay = 19725L  // 2024-01-03, present at every SF
      val corrected = ev.where(col("day") === fixDay)
        .withColumn("value", col("value") * 2.0)
      corrected.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day").parquet(path)
      // partition-column values read back type-inferred as INT
      s.read.parquet(path)
        .groupBy(col("day").cast("long").as("day"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value"))
    }),

    // ---- partition-pruning proof (q214): a day-filtered scan over a
    // hive-partitioned layout must touch ONE day=... directory — the
    // n_day_dirs column counts the distinct partition directories the
    // executed scan actually read (via input_file_name), so a broken
    // pruning path (filter not reaching the scan, wrong partition
    // schema) turns 1 into 30 and breaks the hash. total_days anchors
    // the full layout width. --------------------------------------------
    "q214_partition_pruning" -> ((s, dir) => {
      val ev = Trajectories.events(s, dir)
        .select(col("event_id"), col("value"),
          expr("ts div 86400000000000").as("day"))
      val path = graft.sources.Sinks.scratchPath("q214_prune", dir)
      ev.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("day").parquet(path)
      val pruned = s.read.parquet(path).where(col("day") === 19725)
        .select(col("event_id"),
          regexp_extract(input_file_name(), "day=\\d+", 0).as("pdir"))
      pruned.agg(count(lit(1)).as("n_rows"),
          countDistinct(col("pdir")).as("n_day_dirs"))
        .crossJoin(ev.agg(countDistinct(col("day")).as("total_days")))
    }),

    // ---- runtime bloom-filter join (q215): the semi-join reduction a
    // 100 TB fact-dim join lives on — joining lineitem to a SELECTIVE
    // slice of orders (1 of 5 priorities), Spark's runtime row-level
    // filter injects a bloom filter built from the dim keys into the
    // fact scan, so most fact rows drop BEFORE the shuffle. A dedicated
    // session pins the feature on with thresholds the test corpus
    // clears; the aggregate is filter-invariant (the bloom only
    // prefilters, the join re-checks). ----------------------------------
    "q215_runtime_filter" -> ((s0, dir) => {
      val s = s0.newSession()
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // the test dim fits a broadcast, which would subsume the runtime
      // filter — disable it to exercise the shuffle-join path this rung
      // exists for (a 100 TB dim side does not broadcast; q182 is the
      // broadcast rung)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Trajectories.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      val dim = Trajectories.table(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_totalprice"))
      li.join(dim, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 6).as("sum_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"))
    }),

    // ---- data-contract validation (q224): the dbt-test/Great-
    // Expectations rung — uniqueness, not-null, accepted-values, and
    // range checks over an ingest batch, emitted as a violations report.
    // Violations are PLANTED deterministically (cloned ids, nulled
    // values, a rogue type, an out-of-range timestamp) so every check
    // fires at every SF; each check is one conditional aggregate over a
    // single scan + one id-group pass for uniqueness. --------------------
    "q224_data_contract" -> ((s, dir) => {
      val ev = Trajectories.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      // planted bad batch: every 100th event re-ingested with the same
      // id (uniqueness), every 150th with NULL value (not-null), every
      // 200th with a rogue type (accepted-values), every 250th at a
      // far-future ts (range)
      val bad = ev.where(col("event_id") % 100 === 0)
        .unionByName(ev.where(col("event_id") % 150 === 0)
          .withColumn("value", lit(null).cast("double")))
        .unionByName(ev.where(col("event_id") % 200 === 0)
          .withColumn("event_type", lit("__corrupt__")))
        .unionByName(ev.where(col("event_id") % 250 === 0)
          .withColumn("ts", lit(4102444800000000000L)))
      val batch = ev.unionByName(bad)
      val dupIds = batch.groupBy(col("event_id")).agg(count(lit(1)).as("c"))
        .where(col("c") > 1).agg(count(lit(1)).as("v")).select(
          lit("unique_event_id").as("check"), col("v").as("violations"))
      val scans = batch.agg(
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("nn"),
        sum(when(!col("event_type").isin("view", "click", "purchase",
          "signup", "error"), 1L).otherwise(0L)).as("av"),
        sum(when(col("ts") > 1893456000000000000L, 1L).otherwise(0L)).as("rg"))
      // anchors: the DuckDB twin counts the planted violations in CLOSED
      // FORM, which assumes the BASE table has unique event_ids, no null
      // values, only accepted types, and no ts past the range cut. Measure
      // those assumptions here while the twin pins them at literal 0 — a
      // generator change that breaks the contract fails loudly at an
      // anchor row instead of as an unexplained planted-count mismatch.
      val anchors = ev.agg(
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("bn"),
        sum(when(!col("event_type").isin("view", "click", "purchase",
          "signup", "error"), 1L).otherwise(0L)).as("bt"),
        sum(when(col("ts") > 1893456000000000000L, 1L).otherwise(0L)).as("br"))
      val baseDups = ev.groupBy(col("event_id")).agg(count(lit(1)).as("c"))
        .where(col("c") > 1).agg(count(lit(1)).as("v")).select(
          lit("base_unique_event_id").as("check"), col("v").as("violations"))
      dupIds.unionByName(scans.select(lit("not_null_value").as("check"),
          col("nn").as("violations")))
        .unionByName(scans.select(lit("accepted_event_type").as("check"),
          col("av").as("violations")))
        .unionByName(scans.select(lit("ts_in_range").as("check"),
          col("rg").as("violations")))
        .unionByName(baseDups)
        .unionByName(anchors.select(lit("base_not_null_value").as("check"),
          col("bn").as("violations")))
        .unionByName(anchors.select(lit("base_accepted_event_type").as("check"),
          col("bt").as("violations")))
        .unionByName(anchors.select(lit("base_ts_in_range").as("check"),
          col("br").as("violations")))
    }),

    // ---- dead-letter routing (q225): malformed records split off the
    // ingest path instead of killing it — the props JSON is corrupted
    // for a deterministic slice, from_json failures route to the DLQ
    // with an error class, clean rows continue; the report counts both
    // streams (map-side classify, model-sized aggregate). ----------------
    "q225_dead_letter" -> ((s, dir) => {
      val ev = Trajectories.table(s, dir, "events")
        .select(col("event_id"), col("props"))
        .withColumn("raw",
          when(col("event_id") % 7 === 0, concat(lit("{broken"), col("props")))
            .when(col("event_id") % 11 === 0, lit(""))
            .otherwise(col("props")))
      val parsed = ev.withColumn("k",
        from_json(col("raw"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).getField("k"))
      parsed.withColumn("route",
          when(col("k").isNotNull, "ok")
            .when(col("raw") === "", "dlq_empty")
            .otherwise("dlq_malformed"))
        .groupBy(col("route"))
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("k"), lit(0L))).as("k_sum"))
    }),

    // ---- FK integrity audit (q226): referential-integrity counts a
    // warehouse runs after every load — orphan facts per relationship
    // via LEFT ANTI joins (orphans PLANTED by key-shifting a slice so
    // the check fires at every SF), plus the clean-row anchors. ----------
    "q226_fk_audit" -> ((s, dir) => {
      val li = Trajectories.table(s, dir, "lineitem")
        .select(col("l_orderkey"))
        // shift a deterministic slice out of the key space -> orphans
        .withColumn("l_orderkey",
          when(col("l_orderkey") % 97 === 0, col("l_orderkey") + 900000000L)
            .otherwise(col("l_orderkey")))
      val ords = Trajectories.table(s, dir, "orders").select(col("o_orderkey"))
      val cust = Trajectories.table(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val nat = Trajectories.table(s, dir, "nation").select(col("n_nationkey"))
      val liOrph = li.join(ords, col("l_orderkey") === col("o_orderkey"),
        "left_anti").agg(count(lit(1)).as("orphans"))
        .select(lit("lineitem_orders").as("relationship"), col("orphans"))
      val custOrph = cust.join(nat, col("c_nationkey") === col("n_nationkey"),
        "left_anti").agg(count(lit(1)).as("orphans"))
        .select(lit("customer_nation").as("relationship"), col("orphans"))
      val anchors = li.agg(count(lit(1)).as("orphans"))
        .select(lit("lineitem_total").as("relationship"), col("orphans"))
      liOrph.unionByName(custOrph).unionByName(anchors)
    }),

    // ---- delete-propagation audit (q228): the right-to-be-forgotten
    // sweep — a deletion list (user_id % 13 == 0) must remove the user's
    // profile AND every owned event; the report counts deleted/retained
    // per table plus the INVARIANT row: retained events referencing a
    // deleted user must be zero (a non-propagated delete is the
    // compliance failure this audit exists to catch). Anti-join
    // semantics via a broadcast deletion list. --------------------------
    "q228_delete_audit" -> ((s, dir) => {
      val ev = Trajectories.table(s, dir, "events")
        .select(col("event_id"), col("user_id"))
      val profiles = ev.select(col("user_id")).distinct()
      val deletions = profiles.where(col("user_id") % 13 === 0)
      val retained = ev.join(broadcast(deletions), Seq("user_id"), "left_anti")
      val leak = retained.join(broadcast(deletions), Seq("user_id"), "left_semi")
      Seq(
        ("events_deleted", ev.join(broadcast(deletions), Seq("user_id"),
          "left_semi")),
        ("events_retained", retained),
        ("profiles_deleted", deletions),
        ("profiles_retained", profiles.join(broadcast(deletions),
          Seq("user_id"), "left_anti")),
        ("retained_rows_of_deleted_users", leak))
        .map { case (name, df) =>
          df.agg(count(lit(1)).as("n")).select(lit(name).as("check"), col("n"))
        }.reduce(_ unionByName _)
    }),

    // ---- Pareto frontier (q240): orders that are not dominated on
    // (price low, date recent) — no other order is both cheaper AND at
    // least as recent. One integer-cents sort + a running max over the
    // STRICTLY-CHEAPER range frame (RANGE ... 1 PRECEDING on the integer
    // key) replaces the quadratic dominance self-join; equal-price rows
    // never dominate each other under the strict rule. ------------------
    "q240_pareto_frontier" -> ((s, dir) => {
      val o = Trajectories.table(s, dir, "orders")
        .select(col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000")
            .as("day"))
      // size-dispatched prefix max over strictly-cheaper orders
      // (GlobalIndex.withRunningAuto, range_excl): the frontier scan is
      // order-cardinality — a single-task global sort at 100 TB without
      // the two-pass decomposition above the threshold
      val front = graft.operators.GlobalIndex.withRunningAuto(o,
        "best_prior_day", "day", agg = "max", frame = "range_excl",
        sortCols = Seq(col("cents")), rangeKey = Some("cents"))
        .where(col("best_prior_day").isNull ||
          col("day") > col("best_prior_day"))
      front.agg(count(lit(1)).as("n_frontier"),
          min(col("cents")).as("min_cents"), max(col("day")).as("max_day"),
          sum(col("o_orderkey")).as("key_sum"))
    }),

    // ---- weighted median (q241): the smallest price whose cumulative
    // quantity share reaches 1/2 (and the p90 analog) — the
    // distribution summary that respects weights, from one sort + one
    // cumulative window; integer quantities keep the cumsum exact. ------
    "q241_weighted_median" -> ((s, dir) => {
      val li = Trajectories.table(s, dir, "lineitem")
        .select(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")
          .as("cents"), col("l_quantity").cast("long").as("qty"))
        .groupBy(col("cents")).agg(sum(col("qty")).as("q"))
      val tot = li.agg(sum(col("q")).as("qtot"))
      // size-dispatched cumulative quantity (distinct-cents frame;
      // two-pass running sum past the model-sized threshold). BOTH
      // quantiles come from ONE conditional aggregate over the single
      // cumulated frame — the r12.0 two-leg shape consumed the window
      // twice, and with the dispatch cache gone (GlobalIndex no longer
      // caches implicitly) each leg recomputed the sort (1.9x solo).
      val cum = graft.operators.GlobalIndex.withRunningAuto(li, "cq", "q",
          agg = "sum", frame = "rows_incl", sortCols = Seq(col("cents")))
        .crossJoin(broadcast(tot))
      def hit(frac: Double) = col("cq") * 2 >= col("qtot") * (2 * frac)
      cum.agg(min(when(hit(0.5), col("cents"))).as("wp50_cents"),
          min(when(hit(0.9), col("cents"))).as("wp90_cents"))
        .crossJoin(tot)
    }),
  )

  val oracles: Seq[(String, String)] = Seq(

    // Mixture-sampling twin: the MINSTD-style affine hash, the ppm rate
    // Integer replay of the ES reservoir: same affine constants as the
    // Spark expression (reduce mod p, multiply, offset), list_transform
    // over 1..n_chars, identical tie-break.
    "q155_weighted_reservoir" ->
      """WITH k AS (SELECT doc_id, n_chars,
           list_max(list_transform(range(1, greatest(n_chars, 1) + 1),
             j -> (((doc_id % 2147483647) * 1000003 + j) % 2147483647
                   * 506952114 + 101) % 2147483647)) AS rkey
           FROM documents)
         SELECT doc_id, n_chars, CAST(rkey AS BIGINT) AS rkey
         FROM k ORDER BY rkey DESC, doc_id LIMIT 20""",

    // derived from the source suffix, and the per-stratum kept counts are
    // all recomputed in pure integer SQL (doc_id >= 0, so % == pmod).
    "q88_mixture_sample" ->
      """WITH t AS (SELECT source,
           CAST(100000 + 50000 * (CAST(substr(source, 4) AS INT) % 10) AS BIGINT)
             AS target_ppm,
           CASE WHEN (((doc_id % 2147483647) * 506952114 + 101) % 2147483647)
                  % 1000000
                < 100000 + 50000 * (CAST(substr(source, 4) AS INT) % 10)
                THEN 1 ELSE 0 END AS keep
         FROM documents)
         SELECT source, target_ppm, CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(keep) AS BIGINT) AS n_kept
         FROM t GROUP BY 1, 2""",

    // Sketch-contract twin: residual rows are driver-exact zeros when the
    // HLL++/QuantileSummaries error bounds hold; anchor rows are exact
    // aggregates DuckDB recomputes from the base table.
    "q90_sketches" ->
      """SELECT 'acd_relerr_over_5pct' AS "check", 0.0 AS "value"
         UNION ALL SELECT 'p50_rank_err_over_2pct', 0.0
         UNION ALL SELECT 'n_rows',
           (SELECT CAST(count(*) AS DOUBLE) FROM events)
         UNION ALL SELECT 'n_distinct_users',
           (SELECT CAST(count(DISTINCT user_id) AS DOUBLE) FROM events)""",

    // Curation-pipeline twin: replays all five stages — gate rules,
    // min-doc_id dedup, survivor-fit unigram LM, the affine sampling
    // hash, and the recursive next-fit packing fold.
    "q101_curation_pipeline" ->
      """WITH RECURSIVE gt AS (SELECT doc_id, source, text,
           len(regexp_extract_all(text, '\S+')) AS nw,
           CAST(len(text) - len(regexp_extract_all(text, '\s')) AS DOUBLE) /
             CAST(greatest(len(regexp_extract_all(text, '\S+')), 1) AS DOUBLE) AS ml,
           CAST(len(list_filter(str_split_regex(trim(text), '\s+'),
                 x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) /
             CAST(greatest(len(str_split_regex(trim(text), '\s+')), 1) AS DOUBLE) AS af,
           len(regexp_extract_all(text, '\b(the|a|and|of|to|in|is|it|that|for)\b')) AS ns
           FROM documents),
         g AS (SELECT doc_id, source, text FROM gt
           WHERE nw >= 50 AND nw <= 100000 AND ml >= 3.0 AND ml <= 10.0
             AND af >= 0.8 AND ns >= 2),
         f AS (SELECT doc_id, source, text,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp FROM g),
         dd AS (SELECT doc_id, source, text FROM
           (SELECT *, min(doc_id) OVER (PARTITION BY fp) AS mid FROM f)
           WHERE doc_id = mid),
         toks AS (SELECT doc_id,
           unnest(str_split_regex(trim(lower(text)), '\s+')) AS tok FROM dd),
         counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
         totals AS (SELECT sum(c) AS t_total, count(*) AS v FROM counts),
         scored AS (SELECT doc_id,
           round(avg(-ln(CAST(c + 1 AS DOUBLE) / CAST(t_total + v AS DOUBLE))), 6) AS avg_nll
           FROM toks JOIN counts USING (tok) CROSS JOIN totals GROUP BY doc_id),
         samp AS (SELECT doc_id, source, text FROM dd
           WHERE (((doc_id % 2147483647) * 506952114 + 101) % 2147483647) % 1000000
                 < 100000 + 50000 * (CAST(substr(source, 4) AS INT) % 10)),
         d AS (SELECT doc_id, source, doc_id // 100 AS chunk,
           CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
           row_number() OVER (PARTITION BY source, doc_id // 100
                              ORDER BY doc_id) AS rn
           FROM samp),
         r AS (SELECT doc_id, source, chunk, n_tokens, rn,
             CAST(0 AS BIGINT) AS shard, n_tokens AS fill
           FROM d WHERE rn = 1
           UNION ALL
           SELECT d.doc_id, d.source, d.chunk, d.n_tokens, d.rn,
             CASE WHEN r.fill + d.n_tokens <= 160 THEN r.shard
                  ELSE r.shard + 1 END,
             CASE WHEN r.fill + d.n_tokens <= 160 THEN r.fill + d.n_tokens
                  ELSE d.n_tokens END
           FROM r JOIN d ON d.source = r.source AND d.chunk = r.chunk
                        AND d.rn = r.rn + 1)
         SELECT r.doc_id, r.source, r.chunk, r.n_tokens, r.shard, s.avg_nll
         FROM r JOIN scored s USING (doc_id)""",

    // Quality-cap twin: q18's quality expression + top-50 per source.
    "q107_source_quality_cap" ->
      """WITH q AS (SELECT doc_id, source, round(
           least(CAST(len(text) AS DOUBLE) / 500.0, 1.0) * 0.4
           + (1.0 - least(CAST(len(regexp_extract_all(text, '[!-/:-@\[-`{-~]')) AS DOUBLE)
               / greatest(CAST(len(text) AS DOUBLE), 1.0) * 10.0, 1.0)) * 0.2
           + least(CAST(len(regexp_extract_all(text, '\b(the|a|and|of|to|in|is|it|that|for)\b')) AS DOUBLE)
               / greatest(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0) * 5.0, 1.0) * 0.4
           , 6) AS quality FROM documents),
         r AS (SELECT doc_id, source, quality,
           row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rk
           FROM q)
         SELECT doc_id, source, quality, CAST(rk AS BIGINT) AS rk
         FROM r WHERE rk <= 50""",

    // Heavy-hitters twin: exact top-10 with the same (cnt desc, tok)
    // tie-break; the CMS columns are deterministic residuals (seeded
    // sketch, never-underestimate + eps*N overshoot bound).
    "q112_heavy_hitters" ->
      """WITH t AS (SELECT unnest(str_split_regex(trim(lower(text)), '\s+')) AS tok
           FROM documents),
         c AS (SELECT tok, count(*) AS cnt FROM t WHERE tok <> '' GROUP BY tok)
         SELECT tok, CAST(cnt AS BIGINT) AS cnt,
           CAST(0 AS BIGINT) AS under_viol, 0.0 AS over_resid
         FROM c ORDER BY cnt DESC, tok LIMIT 10""",

    // Packing twin: replays the greedy next-fit fold exactly with a
    // recursive CTE over each (source, chunk) group in doc_id order —
    // same budget (160), same chunking (doc_id // 100), same oversize
    // rule (a doc that overflows starts a new shard and may exceed the
    // budget alone).
    "q89_pack_sequences" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id, source, doc_id // 100 AS chunk,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
             row_number() OVER (PARTITION BY source, doc_id // 100
                                ORDER BY doc_id) AS rn
           FROM documents),
         r AS (
           SELECT doc_id, source, chunk, n_tokens, rn,
             CAST(0 AS BIGINT) AS shard, n_tokens AS fill
           FROM d WHERE rn = 1
           UNION ALL
           SELECT d.doc_id, d.source, d.chunk, d.n_tokens, d.rn,
             CASE WHEN r.fill + d.n_tokens <= 160 THEN r.shard
                  ELSE r.shard + 1 END,
             CASE WHEN r.fill + d.n_tokens <= 160 THEN r.fill + d.n_tokens
                  ELSE d.n_tokens END
           FROM r JOIN d ON d.source = r.source AND d.chunk = r.chunk
                        AND d.rn = r.rn + 1)
         SELECT doc_id, source, chunk, n_tokens, shard FROM r""",

    // Sketch-merge battery twin: the merge-vs-direct register identity
    // is checked Spark-side (exact zero); DuckDB anchors the exact
    // distinct-word count.
    "q125_sketch_merge" ->
      """WITH toks AS (SELECT unnest(str_split_regex(trim(lower(text)), '\s+')) AS w
           FROM documents)
         SELECT 'merge_vs_direct_resid' AS "check", 0.0 AS "value"
         UNION ALL SELECT 'est_relerr_over_5pct', 0.0
         UNION ALL SELECT 'n_distinct_words',
           (SELECT CAST(count(DISTINCT w) AS DOUBLE) FROM toks WHERE w <> '')""",

    // Temperature-mixture twin: same sqrt quota (IEEE-exact on both
    // engines) and the same affine hash order (q88's constants;
    // 506952114 = 2654435761 % 2147483647).
    "q132_temperature_mixture" ->
      """WITH q AS (SELECT source,
           CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 12.0) AS BIGINT) AS quota
           FROM documents GROUP BY 1),
         h AS (SELECT doc_id, source,
           ((doc_id % 2147483647) * 506952114 + 101) % 2147483647 % 1000000 AS hv
           FROM documents),
         r AS (SELECT doc_id, source,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rk
           FROM h)
         SELECT r.source, r.doc_id, CAST(r.rk AS BIGINT) AS rk, q.quota
         FROM r JOIN q USING (source) WHERE r.rk <= q.quota""",

    // Persistence twin: exact-zero roundtrip residuals + shape anchors.
    "q141_persistence_roundtrip" ->
      """SELECT 'koopman_u_roundtrip' AS "check", 0.0 AS "value"
         UNION ALL SELECT 'koopman_sv_roundtrip', 0.0
         UNION ALL SELECT 'koopman_mean_roundtrip', 0.0
         UNION ALL SELECT 'koopman_tau_dim', 0.0
         UNION ALL SELECT 'cluster_centers_roundtrip', 0.0
         UNION ALL SELECT 'n_centers', 3.0""",

    // Layout-invariant twin: the partitioned sink must not change the
    // answer, only the I/O (pruning is asserted Spark-side).
    "q167_partitioned_sink" ->
      """SELECT user_id % 16 AS bucket, CAST(count(*) AS BIGINT) AS n,
           round(avg(value), 6) AS avg_value
         FROM events WHERE event_type = 'click' GROUP BY 1""",

    // Bucketing-invariant twin: same join, plain SQL (the zero-exchange
    // plan shape is asserted Spark-side).
    "q168_bucketed_join" ->
      """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_clicks,
             round(avg(value), 6) AS avg_click
           FROM events WHERE event_type = 'click' GROUP BY 1),
         p AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
             round(avg(value), 6) AS avg_purchase
           FROM events WHERE event_type = 'purchase' GROUP BY 1)
         SELECT user_id, n_clicks, avg_click, n_purchases, avg_purchase
         FROM c JOIN p USING (user_id)""",

    // Compaction twin: layout invariants are Spark-side facts; the row
    // count anchors to the base table.
    "q177_compaction" ->
      """SELECT 'files_before_under_64' AS "check", 0.0 AS "value"
         UNION ALL SELECT 'files_after_over_4', 0.0
         UNION ALL SELECT 'row_drift', 0.0
         UNION ALL SELECT 'id_sum_drift', 0.0
         UNION ALL SELECT 'n_rows',
           (SELECT CAST(count(*) AS DOUBLE) FROM events)""",

    // Range-clustering twin: disjointness is proven Spark-side from the
    // written files; the row count anchors to the base table.
    "q178_range_clustered_sink" ->
      """SELECT 'file_range_overlaps' AS "check", 0.0 AS "value"
         UNION ALL SELECT 'files_over_8', 0.0
         UNION ALL SELECT 'n_rows',
           (SELECT CAST(count(*) AS DOUBLE) FROM events)""",

    // Source-format twins: the answer is format-invariant.
    "q193_jsonl_source" ->
      """SELECT user_id % 8 AS bucket, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(event_id) AS BIGINT) AS id_sum,
           round(avg(value), 6) AS avg_value
         FROM events GROUP BY 1""",
    "q194_csv_source" ->
      """SELECT user_id % 8 AS bucket, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(event_id) AS BIGINT) AS id_sum,
           round(avg(value), 6) AS avg_value
         FROM events GROUP BY 1""",

    // Curriculum twin: the q107 quality replay, round-robin by rank.
    "q186_curriculum_shards" ->
      """WITH q AS (SELECT doc_id, source, round(
           least(CAST(len(text) AS DOUBLE) / 500.0, 1.0) * 0.4
           + (1.0 - least(CAST(len(regexp_extract_all(text, '[!-/:-@\[-`{-~]')) AS DOUBLE)
               / greatest(CAST(len(text) AS DOUBLE), 1.0) * 10.0, 1.0)) * 0.2
           + least(CAST(len(regexp_extract_all(text, '\b(the|a|and|of|to|in|is|it|that|for)\b')) AS DOUBLE)
               / greatest(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0) * 5.0, 1.0) * 0.4
           , 6) AS quality FROM documents),
         r AS (SELECT quality,
           (row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) - 1) % 8
             AS shard FROM q)
         SELECT CAST(shard AS INT) AS shard, CAST(count(*) AS BIGINT) AS n,
           round(avg(quality), 6) AS avg_quality
         FROM r GROUP BY shard""",

    // Stratified-sample twin: the q155 integer key, ranked per source.
    "q187_stratified_sample" ->
      """WITH k AS (SELECT doc_id, source, n_chars,
           list_max(list_transform(range(1, greatest(n_chars, 1) + 1),
             j -> (((doc_id % 2147483647) * 1000003 + j) % 2147483647
                   * 506952114 + 101) % 2147483647)) AS rkey
           FROM documents),
         r AS (SELECT source, doc_id, n_chars,
           row_number() OVER (PARTITION BY source ORDER BY rkey DESC, doc_id) AS rk
           FROM k)
         SELECT source, doc_id, n_chars, CAST(rk AS BIGINT) AS rk
         FROM r WHERE rk <= 8""",

    // Changelog twin: I/U/D precedence replayed by seq rank.
    "q184_changelog_merge" ->
      """WITH base AS (SELECT doc_id, n_chars, 0 AS seq, 'I' AS op
           FROM documents WHERE doc_id % 3 = 0),
         ups AS (SELECT doc_id, n_chars + 1000 AS n_chars, 2 AS seq, 'U' AS op
           FROM documents WHERE doc_id % 6 = 0),
         dels AS (SELECT doc_id, 0 AS n_chars, 3 AS seq, 'D' AS op
           FROM documents WHERE doc_id % 9 = 0),
         a AS (SELECT * FROM base UNION ALL SELECT * FROM ups
               UNION ALL SELECT * FROM dels),
         r AS (SELECT doc_id, n_chars, op,
             ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY seq DESC, op DESC) AS rn FROM a)
         SELECT doc_id % 7 AS bucket, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_chars) AS BIGINT) AS chars
         FROM r WHERE rn = 1 AND op != 'D' GROUP BY 1""",

    // Schema-evolution twin: the union arithmetic from the base table
    // (batch 1 contributes NULL values).
    "q185_schema_evolution" ->
      """WITH m AS (SELECT event_id, user_id, NULL::DOUBLE AS value FROM events
           UNION ALL SELECT event_id, user_id, value FROM events)
         SELECT user_id % 8 AS bucket, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(value) AS BIGINT) AS n_with_value,
           round(avg(value), 6) AS avg_value
         FROM m GROUP BY 1""",

    // Fingerprint twin: identical canonical form, md5 slice, and sum.
    "q179_content_fingerprint" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CAST(concat('0x',
             substr(md5(concat(CAST(doc_id AS VARCHAR), '|', text)), 1, 8))
             AS BIGINT)) AS BIGINT) AS fp_sum
         FROM documents GROUP BY source""",

    // ORC twin: the answer is format-invariant (same as q193/q194).
    "q197_orc_source" ->
      """SELECT user_id % 8 AS bucket, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(event_id) AS BIGINT) AS id_sum,
           round(avg(value), 6) AS avg_value
         FROM events GROUP BY 1""",

    // Z-order twin: identical quantization (integer floor-div for qx,
    // double divide + floor for qy), the same 8-bit Morton interleave
    // via list arithmetic, the same top-5-bit bucketing and probe-span
    // overlap counts.
    "q198_zorder_layout" ->
      """WITH mx AS (SELECT max(o_custkey) AS maxc, max(o_totalprice) AS maxp
             FROM orders),
         q AS (SELECT (o_custkey * 256) // (maxc + 1) AS qx,
             CAST(floor(o_totalprice * 256.0 / (maxp + 1.0)) AS BIGINT) AS qy
           FROM orders CROSS JOIN mx),
         m AS (SELECT qx, qy,
             list_sum(list_transform(range(0, 8),
               i -> (((qx >> i) & 1) << (2*i)) + (((qy >> i) & 1) << (2*i+1))))
               AS morton
           FROM q),
         z AS (SELECT morton >> 11 AS bucket,
             min(qx) AS min_qx, min(qy) AS min_qy FROM m GROUP BY 1),
         l AS (SELECT qx >> 3 AS bucket,
             min(qx) AS min_qx, min(qy) AS min_qy FROM m GROUP BY 1)
         SELECT 'zorder' AS layout, CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(CASE WHEN min_qx <= 31 THEN 1 ELSE 0 END) AS BIGINT) AS scan_qx,
           CAST(sum(CASE WHEN min_qy <= 31 THEN 1 ELSE 0 END) AS BIGINT) AS scan_qy
         FROM z
         UNION ALL
         SELECT 'linear', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN min_qx <= 31 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN min_qy <= 31 THEN 1 ELSE 0 END) AS BIGINT)
         FROM l""",

    // SCD2 twin: the same change-flag / running-version / lead-close
    // gaps-and-islands construction.
    "q204_scd2" ->
      """WITH o AS (SELECT o_custkey AS cust, epoch_us(o_orderdate) AS tsu,
             o_orderkey AS okey, o_orderstatus AS status FROM orders),
         f AS (SELECT cust, tsu, okey, status,
             CASE WHEN lag(status) OVER w IS NULL
                    OR lag(status) OVER w != status THEN 1 ELSE 0 END AS chg
           FROM o WINDOW w AS (PARTITION BY cust ORDER BY tsu, okey)),
         v AS (SELECT cust, tsu, status,
             sum(chg) OVER (PARTITION BY cust ORDER BY tsu, okey
               ROWS UNBOUNDED PRECEDING) AS version
           FROM f),
         g AS (SELECT cust, version, status, min(tsu) AS eff_from
           FROM v GROUP BY 1, 2, 3),
         c AS (SELECT cust, CAST(version AS BIGINT) AS version, status, eff_from,
             coalesce(lead(eff_from) OVER (PARTITION BY cust ORDER BY version),
               -1) AS eff_to
           FROM g)
         SELECT cust, version, status, CAST(eff_from AS BIGINT) AS eff_from,
           CAST(eff_to AS BIGINT) AS eff_to,
           CAST(CASE WHEN eff_to = -1 THEN 1 ELSE 0 END AS BIGINT) AS is_current
         FROM c WHERE cust % 17 = 0""",

    // Backfill twin: one day's values doubled, everything else intact.
    "q211_backfill" ->
      """WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
             CASE WHEN epoch_us(ts) // 86400000000 = 19725
               THEN value * 2.0 ELSE value END AS value
           FROM events)
         SELECT CAST(day AS BIGINT) AS day, CAST(count(*) AS BIGINT) AS n,
           round(avg(value), 6) AS avg_value
         FROM d GROUP BY 1""",

    // Pruning twin: the filtered-day row count, the single-directory
    // invariant, and the layout width.
    "q214_partition_pruning" ->
      """SELECT (SELECT CAST(count(*) AS BIGINT) FROM events
             WHERE epoch_us(ts) // 86400000000 = 19725) AS n_rows,
           CAST(1 AS BIGINT) AS n_day_dirs,
           (SELECT count(DISTINCT epoch_us(ts) // 86400000000) FROM events)
             AS total_days""",

    // Runtime-filter twin: the bloom prefilter must not change the join.
    "q215_runtime_filter" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 6) AS sum_qty,
           round(avg(l_extendedprice), 6) AS avg_price
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT'""",

    // Contract twin: the planted-violation counts in closed form (ids
    // divisible by the planting moduli). The closed form is only valid
    // while the BASE table has unique ids / no nulls / accepted types /
    // in-range ts — the base_* rows pin those assumptions at literal 0
    // against the Spark side's measured anchors, so a generator change
    // surfaces as a named anchor mismatch.
    "q224_data_contract" ->
      """SELECT 'unique_event_id' AS "check", CAST(count(*) AS BIGINT)
             AS violations
           FROM events WHERE event_id % 100 = 0 OR event_id % 150 = 0
             OR event_id % 200 = 0 OR event_id % 250 = 0
         UNION ALL
         SELECT 'not_null_value', CAST(count(*) AS BIGINT)
           FROM events WHERE event_id % 150 = 0
         UNION ALL
         SELECT 'accepted_event_type', CAST(count(*) AS BIGINT)
           FROM events WHERE event_id % 200 = 0
         UNION ALL
         SELECT 'ts_in_range', CAST(count(*) AS BIGINT)
           FROM events WHERE event_id % 250 = 0
         UNION ALL SELECT 'base_unique_event_id', CAST(0 AS BIGINT)
         UNION ALL SELECT 'base_not_null_value', CAST(0 AS BIGINT)
         UNION ALL SELECT 'base_accepted_event_type', CAST(0 AS BIGINT)
         UNION ALL SELECT 'base_ts_in_range', CAST(0 AS BIGINT)""",

    // Dead-letter twin: the same corruption rule replayed with
    // json_valid / json_extract.
    "q225_dead_letter" ->
      """WITH r AS (SELECT event_id,
             CASE WHEN event_id % 7 = 0 THEN '{broken' || props
                  WHEN event_id % 11 = 0 THEN ''
                  ELSE props END AS raw
           FROM events),
         c AS (SELECT event_id, raw,
             CASE WHEN json_valid(raw)
                    AND json_extract(raw, '$.k') IS NOT NULL
               THEN CAST(json_extract(raw, '$.k') AS BIGINT) END AS k
           FROM r)
         SELECT CASE WHEN k IS NOT NULL THEN 'ok'
             WHEN raw = '' THEN 'dlq_empty'
             ELSE 'dlq_malformed' END AS route,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(coalesce(k, 0)) AS BIGINT) AS k_sum
         FROM c GROUP BY 1""",

    // FK-audit twin: the same key-shift and anti-join counts.
    "q226_fk_audit" ->
      """WITH li AS (SELECT CASE WHEN l_orderkey % 97 = 0
             THEN l_orderkey + 900000000 ELSE l_orderkey END AS k
           FROM lineitem)
         SELECT 'lineitem_orders' AS relationship, CAST(count(*) AS BIGINT)
             AS orphans
           FROM li WHERE k NOT IN (SELECT o_orderkey FROM orders)
         UNION ALL
         SELECT 'customer_nation', CAST(count(*) AS BIGINT)
           FROM customer WHERE c_nationkey NOT IN
             (SELECT n_nationkey FROM nation)
         UNION ALL
         SELECT 'lineitem_total', CAST(count(*) AS BIGINT) FROM lineitem""",

    // Delete-audit twin: the same deletion list and anti-join counts;
    // the leak row is zero by construction.
    "q228_delete_audit" ->
      """SELECT 'events_deleted' AS "check", CAST(count(*) AS BIGINT) AS n
           FROM events WHERE user_id % 13 = 0
         UNION ALL
         SELECT 'events_retained', CAST(count(*) AS BIGINT)
           FROM events WHERE user_id % 13 != 0
         UNION ALL
         SELECT 'profiles_deleted', CAST(count(DISTINCT user_id) AS BIGINT)
           FROM events WHERE user_id % 13 = 0
         UNION ALL
         SELECT 'profiles_retained', CAST(count(DISTINCT user_id) AS BIGINT)
           FROM events WHERE user_id % 13 != 0
         UNION ALL
         SELECT 'retained_rows_of_deleted_users', CAST(0 AS BIGINT)""",

    // Frontier twin: the same integer-cents running-max dominance rule.
    "q240_pareto_frontier" ->
      """WITH o AS (SELECT o_orderkey,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
             epoch_us(o_orderdate) // 86400000000 AS day FROM orders),
         f AS (SELECT o_orderkey, cents, day,
             max(day) OVER (ORDER BY cents
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS bpd
           FROM o)
         SELECT CAST(count(*) AS BIGINT) AS n_frontier,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(day) AS BIGINT) AS max_day,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
         FROM f WHERE bpd IS NULL OR day > bpd""",

    // Weighted-median twin: identical cumulative-share thresholds.
    "q241_weighted_median" ->
      """WITH li AS (SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             AS cents, CAST(l_quantity AS BIGINT) AS qty FROM lineitem),
         g AS (SELECT cents, sum(qty) AS q FROM li GROUP BY 1),
         t AS (SELECT sum(q) AS qtot FROM g),
         c AS (SELECT cents,
             sum(q) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cq
           FROM g)
         SELECT
           (SELECT CAST(min(cents) AS BIGINT) FROM c CROSS JOIN t
             WHERE cq * 2 >= qtot * 1.0) AS wp50_cents,
           (SELECT CAST(min(cents) AS BIGINT) FROM c CROSS JOIN t
             WHERE cq * 2 >= qtot * 1.8) AS wp90_cents,
           (SELECT CAST(qtot AS BIGINT) FROM t) AS qtot""",
  )
}
