package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Materialize.FrozenOps
import graft.text.TextFunctions

/** Deduplication operators for training-data pipelines, designed for the
  * 100 TB regime:
  *
  *  - exact dedup: hash-groupBy — one shuffle on a 16-byte key, no document
  *    payload moves if the plan only carries (key, doc_id).
  *  - MinHash+LSH near-dup: per-doc signature is a narrow map-side pass;
  *    candidate generation shuffles (band_hash -> doc_id) pairs only;
  *    verification joins back on doc_id. Nothing is ever all-pairs.
  *  - SimHash: 64-bit signature per doc, banding on 16-bit chunks.
  *  - n-gram Jaccard: exact verify step for candidate pairs.
  */
object Dedup {

  /** Exact duplicate groups by normalized-text fingerprint. Returns
    * (doc_id, fp, keep) where keep = doc_id is the group minimum —
    * the "keep-first" policy of standard corpus dedup.
    *
    * Group-min via partial-combined aggregate + join back, not
    * `min OVER (PARTITION BY fp)`: a window has no map-side combine and
    * puts a mega-group (a document duplicated millions of times at web
    * scale) into one task, while the aggregate ships one row per
    * (partition, fp) and the join back is AQE skew-join territory. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val fp = TextFunctions.fingerprint(col(textCol))
    val keyed = docs.select(col(idCol), fp.as("fp"))
    // null-SAFE join back (ADVICE r10): fp is null for null-text docs,
    // and a plain equi-join would silently drop those rows where the
    // window formulation this aggregate replaced kept them (one
    // null-fingerprint group, exactly like SQL GROUP BY treats it).
    // <=> is an ordinary equi-join key to the planner (hash/SMJ, AQE
    // skew handling intact), so the scale shape is unchanged.
    val mins = keyed.groupBy("fp").agg(min(col(idCol)).as("__keep_id"))
      .withColumnRenamed("fp", "__fp")
    keyed.join(mins, col("fp") <=> col("__fp"))
      .select(col(idCol), col("fp"), (col(idCol) === col("__keep_id")).as("keep"))
  }

  /** MinHash signatures, one row per doc with k hash columns h0..h{k-1},
    * computed by the native `MinhashSignature` expression: the whole
    * k-min signature comes out of ONE row-local codegen pass over the
    * shingle array — no shingle explode, no k-column min hash-aggregate,
    * NO exchange at all (the r02 explode+groupBy shape shuffled
    * |docs| x |shingles| rows; at 100 TB the aggregation exchange was the
    * whole cost of candidate generation). Hash family unchanged
    * (double-hashing h1 XOR rotl(h2, (i mod 63)+1) XOR mix_i with
    * Spark-native xxhash64 kernels) — signatures are bit-identical to the
    * aggregate formulation, asserted by DedupRecallSpec. */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
                        shingleLen: Int, k: Int): DataFrame = {
    val sig = graft.functions.Minhash.signature(
      TextFunctions.shingles(col(textCol), shingleLen), k)
    docs.where(length(col(textCol)) >= shingleLen)
      .select(col(idCol) +: Seq(sig.as("sig")): _*)
      .select(col(idCol) +: (0 until k).map(i => col("sig").getItem(i).as(s"h$i")): _*)
  }

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand`
    * and hash each band (chained xxhash64 over the band's longs — no
    * string building). Emits (doc_id, band_idx, band_hash). */
  def lshBands(docs: DataFrame, textCol: String, idCol: String,
               shingleLen: Int = 5, bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val k = bands * rowsPerBand
    val sigs = minhashSignatures(docs, textCol, idCol, shingleLen, k)
    val bandHashes = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      xxhash64(cols: _*)
    }
    sigs.select(col(idCol), posexplode(array(bandHashes: _*)).as(Seq("band_idx", "band_hash")))
  }

  /** Candidate near-duplicate pairs from LSH buckets (a < b). The
    * self-join happens per (band_idx, band_hash) bucket, so the join output
    * is ~#true-candidates, not all-pairs. `rowsPerBand` sets the collision
    * curve (P ~ jaccard^rowsPerBand per band): 4 targets the ~0.7+ near-dup
    * regime; 2 floods candidates on corpora with high background
    * similarity. `maxBucketSize` drops degenerate buckets (boilerplate
    * shingle minima at 100 TB produce mega-buckets that would quadratically
    * explode the bucket join — a true near-dup pair still collides in
    * another band). */
  def minhashCandidates(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", shingleLen: Int = 5,
                        bands: Int = 6, rowsPerBand: Int = 5,
                        maxBucketSize: Int = 1000, nHubs: Int = 3): DataFrame = {
    // Over-cap buckets (> maxBucketSize members — at web scale, thousands
    // of copies of the same boilerplate landing in one band bucket) emit
    // STAR edges from the `nHubs` smallest-id docs to every member instead
    // of all pairs: candidate count stays LINEAR in bucket size while every
    // member remains connected through the hubs, so downstream
    // connected-components clustering (duplicateClusters) still recovers
    // the full duplicate cluster. Dropping the bucket outright — the r03
    // behavior — silently lost exactly the densest duplicate clusters.
    // Recall caveat (by design): star edges guarantee connectivity of the
    // CANDIDATE graph only; a downstream similarity verify (q76's
    // jaccard >= 0.6) can drop a hub-member edge two true duplicates
    // depended on. Multiple hubs make that a "below threshold vs ALL
    // nHubs hubs" event rather than a single-doc dependence; buckets at or
    // under the cap keep the exact all-pairs guarantee.
    // Bucket statistics (size + the nHubs smallest member ids) come from
    // ONE partial-combined aggregation, NOT a window: `count + row_number
    // OVER (PARTITION BY bucket)` forces every member of a mega-bucket
    // through a single task's sort — the unsplittable hot partition AQE
    // cannot repair — whereas the MinKLongAgg partials are <= nHubs longs
    // per (partition, bucket) however hot the bucket is, and the join
    // back is ordinary AQE skew-join territory. Hub selection is
    // UNCHANGED (the nHubs smallest ids == the old rk <= nHubs rows).
    val banded = lshBands(docs, textCol, idCol, shingleLen, bands, rowsPerBand)
    val buckets = banded.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("bucket_n"),
        graft.functions.MinK.minKLong(col(idCol), nHubs).as("hubs"))
    // freeze the bucket-annotated banded frame (the r12
    // bandedHammingCandidates rework, same rationale): THREE consumers
    // below (small-bucket self-join l/r + the over-cap star branch)
    // would otherwise each recompute the minhash-signature pipeline —
    // the most expensive map-side work in the op — plus the bucket
    // join. Narrow rows (id + band + hash + stats), deterministic;
    // honors the reliable-checkpoint switch.
    val joined = graft.util.Materialize.frozen(
      banded.join(buckets, Seq("band_idx", "band_hash")))
    val small = joined.where(col("bucket_n") <= maxBucketSize)
    val l = small.select(col("band_idx"), col("band_hash"), col(idCol).as("a"))
    val r = small.select(col("band_idx"), col("band_hash"), col(idCol).as("b"))
    val allPairs = l.join(r, Seq("band_idx", "band_hash"))
      .where(col("a") < col("b"))
      .select("a", "b")
    val starPairs = joined.where(col("bucket_n") > maxBucketSize)
      .select(explode(col("hubs")).as("a"), col(idCol).as("b"))
      .where(col("a") < col("b"))
      .select("a", "b")
    allPairs.union(starPairs).distinct()
  }

  /** Exact character-n-gram Jaccard similarity for given candidate pairs.
    * `pairs` has columns (a, b); docs joined in twice (broadcast when the
    * candidate set is small). */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, shingleLen: Int = 5,
                   textCol: String = "text", idCol: String = "doc_id",
                   broadcastIds: Boolean = true): DataFrame = {
    // shingles are hashed to 64-bit BEFORE the pair join: the intersection
    // and union sizes (hence jaccard) are unchanged barring a 64-bit
    // collision (P ~ |shingles|^2 / 2^64, ~1e-12 here), while the shuffled
    // verify payload shrinks ~3x vs 5-char strings and the set compares
    // become long compares — the verify join is the dedup pipeline's
    // dominant cost at every scale. The verify is CANDIDATE-DRIVEN: docs
    // are semi-joined to the pair endpoints before shingling, so the
    // shingle-set computation touches only documents that actually appear
    // in a candidate pair (at 100 TB the candidate set is orders of
    // magnitude smaller than the corpus). NOTE `pairs` appears three times
    // in this plan — pass a materialized (cached/localCheckpoint) frame
    // when it is itself an expensive pipeline.
    val ids = pairs.select(col("a").as(idCol))
      .union(pairs.select(col("b").as(idCol))) // left_semi dedups itself
    // BROADCAST the candidate-id set (default): a shuffle semi-join would
    // move the whole corpus (text included) through an exchange keyed by
    // doc id — the one full-corpus shuffle this pipeline is designed to
    // avoid. The id set is 8 bytes per candidate endpoint (ScaleAudit:
    // ~100k ids = <1 MB at the 10x corpus). When the candidate set
    // outgrows the broadcast budget (~10M+ endpoints), pass
    // broadcastIds = false: the semi-join is left to Catalyst/AQE, which
    // pays the documented corpus shuffle instead of a driver OOM —
    // pre-bucketing docs by id remains the zero-shuffle path at that
    // scale.
    val idsMaybeHinted = if (broadcastIds) broadcast(ids) else ids
    val sh = docs.join(idsMaybeHinted, Seq(idCol), "left_semi").select(col(idCol),
      array_distinct(graft.functions.Shingles.charHashes(col(textCol), shingleLen)).as("sh"))
    pairs
      .join(sh.select(col(idCol).as("a"), col("sh").as("sha")), "a")
      .join(sh.select(col(idCol).as("b"), col("sh").as("shb")), "b")
      .select(col("a"), col("b"),
        (size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))).cast("double")).as("jaccard"))
  }

  /** Containment metrics for candidate pairs — the ASYMMETRIC near-dup
    * semantic Jaccard misses: a short document wholly quoted inside a
    * long one has containment ~1 while its Jaccard stays low (the union
    * is dominated by the long doc). Returns per pair the intersection
    * and set sizes, Jaccard, and max-directional containment
    * |A∩B| / min(|A|,|B|). Same candidate-driven broadcast-semi-join
    * shape as `ngramJaccard` (and the same 64-bit shingle hashing — all
    * reported quantities are set CARDINALITIES, unchanged by hashing
    * barring a ~1e-12 collision). */
  def ngramContainment(docs: DataFrame, pairs: DataFrame, shingleLen: Int = 5,
                       textCol: String = "text", idCol: String = "doc_id",
                       broadcastIds: Boolean = true): DataFrame = {
    val ids0 = pairs.select(col("a").as(idCol))
      .union(pairs.select(col("b").as(idCol)))
    val ids = if (broadcastIds) broadcast(ids0) else ids0
    val sh = docs.join(ids, Seq(idCol), "left_semi").select(col(idCol),
      array_distinct(graft.functions.Shingles.charHashes(col(textCol), shingleLen)).as("sh"))
    pairs
      .join(sh.select(col(idCol).as("a"), col("sh").as("sha")), "a")
      .join(sh.select(col(idCol).as("b"), col("sh").as("shb")), "b")
      .select(col("a"), col("b"),
        size(array_intersect(col("sha"), col("shb"))).cast("long").as("inter"),
        size(col("sha")).cast("long").as("na"),
        size(col("shb")).cast("long").as("nb"),
        size(array_union(col("sha"), col("shb"))).cast("long").as("nu"))
      .where(col("na") > 0 && col("nb") > 0)
      .select(col("a"), col("b"), col("inter"), col("na"), col("nb"),
        (col("inter").cast("double") / col("nu").cast("double")).as("jaccard"),
        (col("inter").cast("double") /
          least(col("na"), col("nb")).cast("double")).as("containment"))
  }

  /** Length-bucket candidate pairs for an edit-distance (fuzzy) join.
    * Sound blocking from the Levenshtein length bound: dist(a, b) >=
    * |len(a) - len(b)|, so every pair within `maxDist` has lengths in
    * same-or-adjacent width-(maxDist+1) buckets. Each doc lands in its
    * own bucket on BOTH join sides and additionally in the next bucket
    * on the right side, so any qualifying pair collides at least once.
    * Only (id, len) shuffle — never text.
    *
    * Scale discipline: buckets up to `maxBucketSize` get the EXACT
    * all-pairs treatment (recall 1 — the contract the DuckDB oracle
    * replays, and the test corpora stay far under the cap). On a
    * near-uniform-length corpus the bucket population grows linearly
    * with the corpus and all-pairs goes QUADRATIC (ScaleAudit measured
    * 38M candidates at the 10x corpus before this cap), so over-cap
    * buckets degrade to a bounded sorted-neighborhood sweep: members
    * ranked by (len, id), each paired with its next `snmWindow`
    * neighbors — candidates stay <= bucket_n * snmWindow, best-effort
    * recall, and the blocking NEVER silently explodes. Cross pairs
    * between an over-cap bucket and its neighbor bucket are part of the
    * degraded regime (content-blocked near-dup, q21, is the unbounded-
    * corpus default; this operator's exactness contract is the capped
    * regime). */
  def lengthBucketCandidates(docs: DataFrame, maxDist: Int,
                             textCol: String = "text", idCol: String = "doc_id",
                             maxBucketSize: Int = 0,
                             snmWindow: Int = 16): DataFrame = {
    // maxBucketSize = 0 (default) AUTO-SCALES the cap to 32 x snmWindow:
    // the exact regime costs up to `cap` candidate pairs per member vs
    // `snmWindow` in the fallback, so the cap bounds the exact regime's
    // per-member cost at 32x the fallback's. A FIXED large cap is a
    // scale trap the semDedup auto-cluster rule already closed for
    // cells: at the 100x audit corpus (~2500 docs per 9-char length
    // band, all just UNDER the old 4096 default) every bucket stayed
    // "exact" and the blocking went corpus-quadratic (~600M pairs)
    // while technically respecting the per-bucket cap. Small corpora
    // (driver SFs: max bucket ~100) keep the exactness contract either
    // way.
    val cap = if (maxBucketSize > 0) maxBucketSize else 32 * snmWindow
    val w = maxDist + 1
    // sig: 64-bit simhash computed AT THE SCAN (text never shuffles; the
    // 8-byte signature does) — the sorted-neighborhood fallback orders
    // over-cap bucket members by content, so near-identical documents
    // land adjacent and the bounded window actually catches them (an id
    // sort would give random neighborhoods)
    val base = docs.select(col(idCol).as("id"),
      (length(col(textCol)) / w).cast("long").as("bkt"),
      length(col(textCol)).as("len"),
      simhash(col(textCol)).as("sig"))
    // bucket sizes via partial-combined aggregate + join back, not a
    // count-over-partition window (no map-side combine, one task per
    // mega length-band at web scale).
    val sized = base.join(
      base.groupBy("bkt").agg(count(lit(1)).as("bucket_n")), "bkt")
    val capped = sized.where(col("bucket_n") <= cap).drop("bucket_n")
    val l = capped.select(col("id").as("a"), col("bkt"), col("len").as("la"))
    val r = capped.select(col("id").as("b"), col("bkt"), col("len").as("lb"))
      .union(capped.select(col("id").as("b"), (col("bkt") + 1).as("bkt"),
        col("len").as("lb")))
    // an adjacent-bucket pair collides in exactly ONE orientation
    // (l = the doc in the higher bucket), so normalize with
    // least/greatest instead of filtering a < b — the r05-style a < b
    // filter silently dropped every cross-bucket pair whose longer doc
    // had the larger id (caught by the oracle: 21 of 25 pairs)
    val exact = l.join(r, Seq("bkt"))
      .where(col("a") =!= col("b") &&
        abs(col("la") - col("lb")) <= maxDist)
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
    // bounded fallback: rank over-cap bucket members by (simhash, id)
    // and probe only the next `snmWindow` ranks — the neighbor list comes
    // from an explode + equi-join on (bkt, rank), so the intermediate
    // is EXACTLY bucket_n * snmWindow rows, never a filtered cross
    // product.
    //
    // The rank itself is TWO-PASS RANGE-PARTITIONED (VERDICT r10 item 4 —
    // the last content-keyed single-task sort in the codebase): a plain
    // `row_number OVER (PARTITION BY bkt)` puts a mega length-band (a
    // near-uniform-length corpus at web scale) into ONE task's sort with
    // no WindowGroupLimit pushdown and no AQE repair. Instead:
    //   1. range-partition the over-cap rows on the FULL sort key
    //      (bkt, sig, id) — keys are unique (ids are), so the sampler can
    //      balance any distribution, including one band ≫ task size;
    //   2. local rank per (physical range partition, bkt) — each group is
    //      a CONTIGUOUS slice of its band's global order, task-bounded by
    //      the range partition size;
    //   3. per-(partition, bkt) counts prefix-scanned per band over
    //      partition ids (summary-sized: <= partitions x touched bands) —
    //      asofJoinStrictSkew's carry seeding applied to rank offsets;
    //   4. global rank = local rank + carry offset, joined back on the
    //      (partition, bkt) keys the window already partitioned by.
    // Rank values (hence the candidate set) are identical to the
    // single-window shape whatever the sampled partition boundaries —
    // EditDistanceSpec pins row-identity on a multi-partition diverse
    // band; editdist100 pins the exact candidate count under a planted
    // 500k-row mega-band.
    //
    // The ranked frame MUST be materialized once (localCheckpoint):
    // range boundaries are re-SAMPLED per materialization (RDD-id-seeded
    // sketch), and spark_partition_id() is nondeterministic, so separate
    // evaluations of this subtree inside one plan (it feeds both SNM
    // join sides, and `offs` re-reads `local`) can disagree on the pid
    // universe — offsets from one boundary set against local ranks from
    // another yields duplicate/gapped ranks and a silently-inflated
    // candidate set (observed at the 100x audit: 8.08M candidates vs
    // the 8.00M true count, and distinct() returning MORE rows than its
    // input). Checkpointing freezes one consistent ranking; only the
    // over-cap subset pays the materialization.
    val over = sized.where(col("bucket_n") > cap)
    val rp = over.repartitionByRange(col("bkt"), col("sig"), col("id"))
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy("__pid", "bkt")
      .orderBy(col("sig"), col("id"))
    val local = rp.withColumn("__lrnk", row_number().over(wLocal).cast("long"))
      .frozen()
    val wOff = Window.partitionBy("bkt").orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = local.groupBy(col("__pid"), col("bkt"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .drop("__n")
    val ranked = local.join(offs, Seq("__pid", "bkt"))
      .withColumn("rnk", col("__lrnk") + col("__off"))
      .drop("__pid", "__lrnk", "__off")
    val snm = ranked.select(col("bkt"), col("id").as("a"), col("len").as("la"),
        explode(sequence(col("rnk") + 1, col("rnk") + snmWindow)).as("rnk2"))
      .join(ranked.select(col("bkt"), col("rnk").as("rnk2"),
        col("id").as("b"), col("len").as("lb")), Seq("bkt", "rnk2"))
      .where(abs(col("la") - col("lb")) <= maxDist)
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
    exact.union(snm).distinct()
  }

  /** Exact Levenshtein verify for candidate pairs: (a, b, dist) for
    * pairs at distance <= maxDist. Candidate-driven like `ngramJaccard`
    * (broadcast id semi-join, so only docs in some pair are fetched and
    * the corpus never shuffles); the distance uses Spark's banded
    * 3-arg levenshtein — O(maxDist * len) per pair, not O(len^2), and
    * pairs over the threshold exit early as -1. */
  def editDistanceVerify(docs: DataFrame, pairs: DataFrame, maxDist: Int,
                         textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val ids = pairs.select(col("a").as(idCol))
      .union(pairs.select(col("b").as(idCol)))
    val t = docs.join(broadcast(ids), Seq(idCol), "left_semi")
      .select(col(idCol), col(textCol).as("t"))
    // the PAIR side broadcasts in both joins, so the corpus text streams
    // map-side and never enters a shuffle exchange (the candidate set —
    // ids first, then ids + one candidate text — is the only broadcast
    // payload, bounded by the blocking caps)
    broadcast(pairs)
      .join(t.select(col(idCol).as("a"), col("t").as("ta")), "a")
      .hint("broadcast")
      .join(t.select(col(idCol).as("b"), col("t").as("tb")), "b")
      .select(col("a"), col("b"),
        levenshtein(col("ta"), col("tb"), maxDist).cast("long").as("dist"))
      .where(col("dist") >= 0)
  }

  /** Blocked fuzzy self-join: all pairs within Levenshtein `maxDist`,
    * via sound length blocking + banded exact verify. The template-dedup
    * primitive (boilerplate pages differing by a date or an id) that
    * Jaccard-family near-dup misses when the edit is concentrated in
    * one shingle neighborhood. */
  def editDistanceJoin(docs: DataFrame, maxDist: Int,
                       textCol: String = "text", idCol: String = "doc_id",
                       maxBucketSize: Int = 0, snmWindow: Int = 16): DataFrame =
    editDistanceVerify(docs,
      lengthBucketCandidates(docs, maxDist, textCol, idCol, maxBucketSize,
        snmWindow),
      maxDist, textCol, idCol)

  /** Damped PageRank over an undirected edge list, driver-side under
    * the same edge bound as [[duplicateClusters]]' union-find (ScaleAudit
    * asserts < 1M edges at the 10x corpus; [[pageRankDistributed]] is
    * the beyond-bound path, [[pageRankAuto]] the dispatcher). Every node of an undirected
    * graph has out-degree >= 1, so there is no dangling-mass term.
    * Returns (rank by node id, final L-inf residual, iterations). */
  def pageRank(edges: Seq[(Long, Long)], beta: Double = 0.85,
               tol: Double = 1e-9, maxIter: Int = 200): (Map[Long, Double], Double, Int) = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val nodes = und.map(_._1).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    if (n == 0) return (Map.empty, 0.0, 0)
    val outDeg = Array.fill(n)(0)
    und.foreach { case (u, _) => outDeg(idx(u)) += 1 }
    val adj = und.map { case (u, v) => (idx(u), idx(v)) }
    var pr = Array.fill(n)(1.0 / n)
    var resid = 1.0
    var iters = 0
    while (resid > tol && iters < maxIter) {
      val nxt = Array.fill(n)((1 - beta) / n)
      adj.foreach { case (u, v) => nxt(v) += beta * pr(u) / outDeg(u) }
      resid = (0 until n).iterator.map(i => math.abs(nxt(i) - pr(i))).max
      pr = nxt
      iters += 1
    }
    (nodes.zip(pr).toMap, resid, iters)
  }

  /** The beyond-bound PageRank path [[pageRank]]'s scaladoc promises:
    * Pregel-style damped power iteration over an undirected edge
    * DataFrame, for dup graphs past the driver's 1M-edge collect bound
    * (the graph100 audit crosses it organically at 2.25M edges).
    *
    * Per iteration: one src-keyed join of the degree-annotated edge
    * table against the rank frame, one dst-keyed sum, one id-keyed join
    * against the previous ranks for the L-inf residual — three
    * node/edge-bounded exchanges, nothing all-pairs, nothing on the
    * driver but the scalar residual. The rank frame is eagerly
    * localCheckpoint'ed every iteration (node-count rows), so lineage
    * stays flat however many iterations convergence takes. Every node
    * of an undirected graph has in- AND out-degree >= 1, so there is no
    * dangling mass and no rank row ever goes missing (same invariant
    * the driver path relies on).
    *
    * Same semantics as [[pageRank]] (init 1/n, stop when L-inf residual
    * <= tol or maxIter); results agree with the driver path to
    * float-sum-order noise (~1e-15 per term; spec-pinned at 1e-9).
    * Returns (ranks (id, rank), final residual, iterations). */
  def pageRankDistributed(edges: DataFrame, beta: Double = 0.85,
                          tol: Double = 1e-9, maxIter: Int = 200,
                          knownEdgeCount: Long = -1L): (DataFrame, Double, Int) = {
    val spark = edges.sparkSession
    val nEdges = if (knownEdgeCount >= 0L) knownEdgeCount else edges.count()
    if (nEdges == 0L) {
      import spark.implicits._
      return (Seq.empty[(Long, Double)].toDF("id", "rank"), 0.0, 0)
    }
    // size the iteration's parallelism by EDGE count, not the session
    // default (duplicateClusters discipline): a power step is several
    // node/edge-bounded stages whose per-round scheduling cost at 32
    // partitions would dominate small-graph convergence (~128 rounds at
    // beta=0.85, tol=1e-9)
    val parts = math.max(1, math.min(64, (nEdges / 250000L).toInt + 1))
    val und = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
    val deg = und.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
    // static across iterations: (src, dst, deg), partitioned by the join
    // key so each round's rank join co-locates without re-exchanging the
    // edge side
    val undDeg = und.join(deg, "src").repartition(parts, col("src"))
      .frozen()
    val n = deg.count()
    var ranks = deg.select(col("src").as("id"), lit(1.0 / n).as("rank"))
      .repartition(parts, col("id")).frozen()
    // one power step as a plan fragment; STEPS_PER_ROUND steps chain
    // unmaterialized between localCheckpoints — geometric convergence
    // means the residual check only needs round granularity (we may run
    // up to STEPS_PER_ROUND-1 extra steps past tol; each only tightens
    // the answer), while per-round scheduling cost drops 4x
    def step(r: DataFrame): DataFrame = undDeg
      .join(r.select(col("id").as("src"), col("rank")), "src")
      .groupBy(col("dst").as("id"))
      .agg((lit((1 - beta) / n) + lit(beta) * sum(col("rank") / col("deg"))).as("rank"))
    val stepsPerRound = 4
    var resid = 1.0
    var iters = 0
    while (resid > tol && iters < maxIter) {
      val advanced = (1 until stepsPerRound).foldLeft(step(ranks))((r, _) => step(r))
      val stepped = advanced
        .join(ranks.select(col("id"), col("rank").as("prev")), "id")
        .select(col("id"), col("rank"), abs(col("rank") - col("prev")).as("d"))
        .frozen() // eager: materializes the round, cuts lineage
      // L-inf over the whole round; the per-STEP residual it bounds is
      // smaller (geometric decay), so stopping on it is conservative
      resid = stepped.agg(max(col("d"))).head().getDouble(0)
      ranks = stepped.select("id", "rank")
      iters += stepsPerRound
    }
    (ranks, resid, iters)
  }

  /** Size-dispatched PageRank mirroring [[duplicateClusters]]' crossover:
    * below `driverEdgeThreshold` undirected input edges the exact
    * driver-side power iteration runs on collected edges; above it the
    * distributed path takes over. The two are interchangeable to a
    * caller (spec + graph100 pin rank agreement at 1e-9). Returns the
    * rank frame plus the convergence scalars either path reports. */
  def pageRankAuto(edges: DataFrame, beta: Double = 0.85, tol: Double = 1e-9,
                   maxIter: Int = 200,
                   driverEdgeThreshold: Long = 1000000L): (DataFrame, Double, Int) = {
    // count ONCE and hand it down — the distributed path needs the same
    // number for its parallelism sizing, and recounting there was one
    // redundant job per invocation (VERDICT r10 item 7)
    val nEdges = edges.count()
    if (nEdges < driverEdgeThreshold) {
      val e = edges.select(col("a"), col("b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val (pr, resid, iters) = pageRank(e, beta, tol, maxIter)
      val spark = edges.sparkSession
      import spark.implicits._
      (pr.toSeq.toDF("id", "rank"), resid, iters)
    } else pageRankDistributed(edges, beta, tol, maxIter, knownEdgeCount = nEdges)
  }

  /** 64-bit SimHash of whitespace tokens: bit j of the signature is the
    * sign of sum over tokens of (+1 if bit j of xxhash64(token) else -1).
    * Token hashing uses Spark's native xxhash64; the bit-vote is a native
    * codegen expression (graft.functions.SimhashFromHashes) — the whole
    * signature pass now stays inside whole-stage codegen, no UDF. */
  def simhash(text: Column): Column = {
    val hashes = transform(split(trim(text), "\\s+"), t => xxhash64(t))
    simhashFromHashes(hashes)
  }

  def simhashFromHashes(hashes: Column): Column =
    graft.functions.ArrayNumeric.simhash64(hashes)

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Benchmark-contamination scan: count each corpus doc's distinct
    * character n-grams that also appear ANYWHERE in the benchmark set
    * (the eval-decontamination pass every training-data pipeline runs).
    * Scale shape: benchmark sets are eval-suite sized, so their distinct
    * shingle-hash set broadcasts; the corpus side streams map-side through
    * one semi-join + per-doc count — no corpus shuffle of text, ever.
    * Shingles are 64-bit-hashed (same collision argument as
    * `ngramJaccard`). */
  def contaminationScan(corpus: DataFrame, benchmark: DataFrame,
                        shingleLen: Int = 8, minOverlap: Long = 10L,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    def hashed(c: Column) =
      array_distinct(graft.functions.Shingles.charHashes(c, shingleLen))
    val bench = benchmark.select(explode(hashed(col(textCol))).as("h")).distinct()
    val corp = corpus.select(col(idCol), explode(hashed(col(textCol))).as("h"))
    val overlaps = corp.join(broadcast(bench), "h")
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))
    corpus.select(col(idCol)).join(overlaps, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) >= minOverlap).cast("int").as("contaminated"))
  }

  /** Per-doc contamination COVERAGE: the fraction of each corpus doc's
    * distinct `shingleLen`-char shingles that appear anywhere in the
    * benchmark — the graded measure behind `contaminationScan`'s binary
    * flag (a doc 90% covered by benchmark text is a leak; a doc sharing
    * one idiom is noise). Same scale shape: benchmark shingles broadcast,
    * corpus streams map-side, only (id, hash) rows move.
    *
    * Returns (idCol, n_total, n_overlap, coverage) for every corpus doc;
    * coverage = 0 when the doc has no shingles. */
  def contaminationCoverage(corpus: DataFrame, benchmark: DataFrame,
                            shingleLen: Int = 8, textCol: String = "text",
                            idCol: String = "doc_id"): DataFrame = {
    def hashed(c: Column) =
      array_distinct(graft.functions.Shingles.charHashes(c, shingleLen))
    val bench = benchmark.select(explode(hashed(col(textCol))).as("h")).distinct()
    val corp = corpus.select(col(idCol), explode(hashed(col(textCol))).as("h"))
    val totals = corp.groupBy(idCol).agg(count(lit(1)).as("n_total"))
    val overlaps = corp.join(broadcast(bench), Seq("h"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))
    corpus.select(col(idCol))
      .join(totals, Seq(idCol), "left")
      .join(overlaps, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_total"), lit(0L)).as("n_total"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        when(coalesce(col("n_total"), lit(0L)) === 0L, lit(0.0))
          .otherwise(round(coalesce(col("n_overlap"), lit(0L)) /
            col("n_total"), 6)).as("coverage"))
  }

  /** Connected components over near-duplicate pairs by iterative min-label
    * propagation: label_v <- min(label_v, min over neighbors' labels),
    * repeated to a fixpoint. Rounds <= component diameter (near-dup
    * clusters are tiny, so a handful of rounds); each round is ONE bounded
    * shuffle join of the edge list against the label frame — never
    * all-pairs, never driver-materialized, so the 100 TB shape is the
    * same as the sf0.01 shape. Returns (id, cluster_id = component-min id).
    * Canonical-doc selection ("keep the smallest id") is then a plain
    * filter, the standard fuzzy-dedup end game. */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 20,
                        driverEdgeThreshold: Long = 1000000L): DataFrame = {
    val edges0 = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .distinct().cache()
    // The candidate-pair graph is orders of magnitude smaller than the
    // corpus (bucket caps bound it), so size the iteration's parallelism
    // by EDGE count, not by the session default: every round is several
    // chained stages whose fixed per-partition overhead dominates when
    // 32-way shuffles carry a few thousand rows. ~1M edges per partition;
    // grows naturally with the graph at 100 TB.
    val nEdges = edges0.count()
    // Small graphs (the common case after verification: near-dup edge sets
    // are a vanishing fraction of the corpus) run union-find on the driver
    // in one collect — identical labels, none of the per-round job
    // overhead of the distributed loop (measured 2.4 s for 256 edges).
    // Above the threshold the label-propagation loop below takes over.
    // Driver cost at the 1M-edge crossover is boxed-object dominated
    // (collected Rows + a LongMap of up to 2M entries), roughly a few
    // hundred MB transient heap — NOT the 16 B/edge a primitive layout
    // suggests; the threshold is set where that comfortably fits any
    // driver that could run the distributed loop at all.
    if (nEdges <= driverEdgeThreshold) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val es = edges0.select(col("src").cast("long"), col("dst").cast("long"))
        .as[(Long, Long)].collect()
      edges0.unpersist()
      val parent = new scala.collection.mutable.LongMap[Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        // union by MIN root so the representative is the component minimum
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      return parent.keys.toSeq.map(id => (id, find(id)))
        .toDF("id", "cluster_id")
    }
    val parts = math.max(1, math.min(pairs.sparkSession.sparkContext.defaultParallelism,
      (nEdges / 1000000L + 1L).toInt))
    val edges = edges0.repartition(parts, col("src")).cache()
    edges.count()
    edges0.unpersist()
    // localCheckpoint per round truncates the logical plan — without it
    // the label frame's lineage doubles every iteration (it appears twice
    // per round) and analysis cost explodes exponentially; checkpointed
    // partitions live on the executors, the right place at scale.
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).frozen()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val neigh = edges.join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nlabel"))
      // carry the change flag inside the checkpointed frame: the
      // convergence count is then a cheap local scan of materialized
      // partitions instead of a second join per round
      val next = labels.join(neigh, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
          (coalesce(col("nlabel"), col("label")) < col("label"))
            .cast("long").as("chg"))
        .frozen()
      changed = next.agg(sum(col("chg"))).collect()(0).getLong(0)
      labels = next.drop("chg")
      it += 1
    }
    edges.unpersist()
    // fail LOUD on non-convergence: silently-partial labels would emit
    // multiple cluster ids (and canonicals) for one true component
    require(changed == 0,
      s"duplicateClusters did not converge within $maxIter rounds " +
        "(a component's diameter exceeds maxIter); raise maxIter")
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** Portable 60-bit simhash: per-token key = first 15 hex chars of the
    * token's md5, so any engine with md5 (DuckDB included) recomputes the
    * signature bit-for-bit — the oracle-checkable twin of the xxhash64
    * `simhash` above (which stays the fast default; its 64-bit keys come
    * from Spark's non-portable xxhash64). Bits 60-63 of the 64-bit vote
    * are always 0 (their votes are all -1), so the signature fits a
    * positive BIGINT in both engines. */
  def simhashPortable(text: Column): Column = {
    val hashes = transform(split(trim(text), "\\s+"),
      t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    simhashFromHashes(hashes)
  }

  /** Shared banded-signature candidate join with the same bucket-size cap
    * + multi-hub star fallback as `minhashCandidates`: buckets at or under
    * `maxBucketSize` join all-pairs (the pigeonhole recall guarantee);
    * over-cap buckets (a boilerplate-heavy corpus can put thousands of
    * near-identical docs in one chunk bucket — the r04 simhash join had NO
    * cap and went quadratic there, a scale-killer at 100 TB) emit only
    * hub-to-member edges from the `nHubs` smallest ids, keeping the join
    * output linear in bucket size. Candidates are then Hamming-verified;
    * over-cap recall is hub-mediated, exactly as documented on
    * `minhashCandidates`. */
  private def bandedHammingCandidates(sigs: DataFrame, idCol: String,
                                      bandBits: Int, maxHamming: Int,
                                      maxBucketSize: Int, nHubs: Int): DataFrame = {
    val mask = (1L << bandBits) - 1L
    val banded = sigs.select(col(idCol), col("sig"), posexplode(
      array((0 until 4).map(b =>
        shiftright(col("sig"), b * bandBits).bitwiseAND(lit(mask))): _*))
      .as(Seq("band_idx", "chunk")))
    // Bucket statistics via ONE partial-combined aggregate + join back,
    // not `count/row_number OVER (PARTITION BY chunk)` — the r10
    // hot-partition rule this path missed: with no rank-limit filter
    // (bucket_n has none, and rk feeds several branches so
    // WindowGroupLimit cannot push) a web-scale boilerplate mega-bucket
    // becomes ONE task's unsplittable sort, while the MinKLongAgg
    // partials are <= nHubs longs per (partition, bucket) however hot
    // the bucket is. Hub selection is UNCHANGED (the nHubs smallest ids
    // == the old rk <= nHubs rows), so candidate sets are identical —
    // same argument and spec coverage as minhashCandidates' r10 rework.
    val buckets = banded.groupBy("band_idx", "chunk")
      .agg(count(lit(1)).as("bucket_n"),
        graft.functions.MinK.minKLong(col(idCol), nHubs).as("hubs"))
    // freeze the bucket-annotated banded frame: it feeds THREE consumers
    // (both sides of the small-bucket self-join + the over-cap star
    // branch), each of which would otherwise recompute the signature
    // pipeline AND the bucket join from the corpus scan (r11 driver
    // record had q27 at 1.45x on exactly that — three signature passes).
    // The frozen frame is narrow (id + sig + band slice + bucket stats,
    // ~50 B/doc-band) and deterministic; freezing is purely a
    // shared-scan optimization, sized linear in the corpus like the
    // shuffle it feeds. Materialize.frozen honors the reliable-
    // checkpoint switch on preemptible clusters.
    val joined = graft.util.Materialize.frozen(
      banded.join(buckets, Seq("band_idx", "chunk")))
    def side(df: DataFrame, n: String, s: String) =
      df.select(col("band_idx"), col("chunk"), col(idCol).as(n), col("sig").as(s))
    val small = joined.where(col("bucket_n") <= maxBucketSize)
    val allPairs = side(small, "a", "siga")
      .join(side(small, "b", "sigb"), Seq("band_idx", "chunk"))
      .where(col("a") < col("b"))
    val over = joined.where(col("bucket_n") > maxBucketSize)
    val hubRows = over.where(array_contains(col("hubs"), col(idCol)))
    val starPairs = side(hubRows, "a", "siga")
      .join(side(over, "b", "sigb"), Seq("band_idx", "chunk"))
      .where(col("a") < col("b"))
    allPairs.union(starPairs)
      .select(col("a"), col("b"),
        hamming64(col("siga"), col("sigb")).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** `simhashCandidates` over the portable 60-bit signature: 4 bands x
    * 15 bits (pigeonhole recall 1 for Hamming <= 3 in at-or-under-cap
    * buckets). Fully reproducible in the DuckDB oracle: band values are
    * plain bit slices of the md5-derived signature, and the oracle mirrors
    * the bucket cap + hub fallback. */
  def simhashCandidatesPortable(docs: DataFrame, textCol: String = "text",
                                idCol: String = "doc_id", maxHamming: Int = 3,
                                maxBucketSize: Int = 1000, nHubs: Int = 3): DataFrame =
    bandedHammingCandidates(
      docs.select(col(idCol), simhashPortable(col(textCol)).as("sig")),
      idCol, bandBits = 15, maxHamming, maxBucketSize, nHubs)

  /** SimHash near-dup candidates: band the 64-bit signature into 4 16-bit
    * chunks; docs sharing any chunk are candidates (Hamming<=3 guaranteed
    * recall by pigeonhole for <=3 differing bits in at-or-under-cap
    * buckets). */
  def simhashCandidates(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", maxHamming: Int = 3,
                        maxBucketSize: Int = 1000, nHubs: Int = 3): DataFrame =
    bandedHammingCandidates(
      docs.select(col(idCol), simhash(col(textCol)).as("sig")),
      idCol, bandBits = 16, maxHamming, maxBucketSize, nHubs)

  /** Cross-document EXACT SUBSTRING duplication (the suffix-array dedup of
    * Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    * Better", re-expressed relationally): every k-word rolling window of
    * every document is keyed by a hash; windows whose key occurs in >= 2
    * DISTINCT documents are "duplicated"; per document, report the
    * fraction of its windows that are duplicated elsewhere in the corpus.
    * This is the metric used to drop or trim boilerplate-heavy documents.
    *
    * Distributed shape: window extraction is a pure codegen column
    * expression (split -> sequence -> transform(slice->md5) -> explode, no
    * UDF); the corpus-wide key table shuffles HASHES only (16-char md5
    * prefix — no text moves); duplicated keys come from one
    * partial-aggregated groupBy, and the per-doc fraction from one
    * aggregate after an id-only semi-structured join. Suffix arrays give
    * the same answer with lower constants on a single machine; the
    * groupBy-hash formulation is the shape that scales out.
    *
    * Words are single-space tokens (empty runs filtered), md5 is used as
    * the window key so a DuckDB oracle reproduces every value bit-for-bit.
    */
  def duplicateWindowStats(docs: DataFrame, k: Int = 10,
                           textCol: String = "text",
                           idCol: String = "doc_id"): DataFrame = {
    val words = filter(split(col(textCol), " "), w => w =!= "")
    val nw = size(words)
    val spans = graft.functions.Shingles.wordWindowMd5(col(textCol), k, 16)
    // ONE evaluation of the split+md5 window pipeline: the exploded table
    // is cached and feeds both the dup-key aggregate and the per-doc
    // recount; n_windows rides along as greatest(nw-k+1, 0) arithmetic
    // (size(spans) would re-hash every window just to count them).
    // explode_outer keeps sub-k-word docs as one NULL-span row so they
    // appear in the output with zero windows.
    // (cached, not unpersisted here: the returned plan is lazy, so an
    // eager unpersist would fire before the caller executes it — the
    // 16-byte-hash table is LRU-evictable, the q29 pattern)
    val windows = docs.select(col(idCol),
      greatest(nw - (k - 1), lit(0)).cast("long").as("n_windows"),
      explode_outer(spans).as("span")).cache()
    val dupSpans = windows.where(col("span").isNotNull)
      .groupBy("span")
      .agg(countDistinct(col(idCol)).as("nd"))
      .where(col("nd") >= 2)
      .select(col("span"), lit(1).as("is_dup"))
    windows
      .join(dupSpans, Seq("span"), "left")
      .groupBy(idCol)
      .agg(first(col("n_windows")).as("n_windows"),
        sum(coalesce(col("is_dup"), lit(0))).cast("long").as("n_dup_windows"))
      .select(col(idCol), col("n_windows"), col("n_dup_windows"),
        round(col("n_dup_windows").cast("double") /
          greatest(col("n_windows"), lit(1L)).cast("double"), 6).as("dup_frac"))
  }

  /** The ACTION step of exact-substring dedup (Lee et al. 2021 trim
    * their corpus at the matched spans): remove every word covered by a
    * cross-document duplicated k-word window and re-join the survivors.
    * Returns (doc_id, kept_words, cleaned) with `cleaned` the trimmed
    * single-space text — empty when the whole document was boilerplate.
    *
    * Distributed shape: same hashed-window key table as
    * `duplicateWindowStats` (only 16-char hashes + start indexes
    * shuffle); the covered-position set returns to the document as an
    * array of start indexes (bounded by the doc's own window count), and
    * the word-level trim is a pure codegen filter-with-index — the
    * corpus text itself never moves. */
  def removeDuplicateSpans(docs: DataFrame, k: Int = 10,
                           textCol: String = "text",
                           idCol: String = "doc_id"): DataFrame = {
    val words = filter(split(col(textCol), " "), w => w =!= "")
    val spans = graft.functions.Shingles.wordWindowMd5(col(textCol), k, 16)
    // (doc, window start i, span hash); pos0 is 0-based over the array
    val windows = docs.select(col(idCol),
      posexplode(spans).as(Seq("pos0", "span"))).cache()
    val dupSpans = windows.groupBy("span")
      .agg(countDistinct(col(idCol)).as("nd"))
      .where(col("nd") >= 2)
      .select("span")
    // materialize the (small, doc-count-bounded) start table eagerly so
    // the corpus-window cache can be released NOW instead of pinning a
    // corpus-sized dataset for the session lifetime
    val dupStarts = windows.join(dupSpans, Seq("span"), "left_semi")
      .select(col(idCol), (col("pos0") + 1).as("i"))
      .groupBy(idCol).agg(collect_set(col("i")).as("starts"))
      .frozen()
    windows.unpersist()
    val starts = coalesce(col("starts"), array().cast("array<int>"))
    // covered 1-based word positions = union of [i, i+k-1] per dup start
    val covered = array_distinct(flatten(transform(starts,
      i => sequence(i, i + (k - 1)))))
    docs.join(dupStarts, Seq(idCol), "left")
      .select(col(idCol),
        filter(words, (w, j) => {
          val _ = w
          !array_contains(covered, j + 1)
        }).as("kept"))
      .select(col(idCol), size(col("kept")).cast("long").as("kept_words"),
        array_join(col("kept"), " ").as("cleaned"))
  }

  /** Exact dedup of an incoming batch AGAINST an existing reference
    * corpus, with a broadcast Bloom-filter prefilter — the incremental
    * ingest shape: "which of today's crawl is already in the corpus?".
    *
    * Scale design: the reference side is reduced to 16-byte fingerprints
    * and folded into a Bloom filter (~1.2 GB for 10^9 docs at 1% fpp —
    * broadcastable), so the incoming batch is filtered MAP-SIDE with no
    * shuffle of either corpus. Only the surviving ~(dup_rate + fpp)
    * fraction reaches the exact semi-join verify, whose left side is now
    * tiny. The verify step makes the RESULT exact — Bloom false
    * positives are eliminated, false negatives are impossible — so the
    * oracle is a plain fingerprint semi-join and approximation never
    * leaks into the answer.
    *
    * Returns (idCol, fp) for incoming docs that already exist in `ref`. */
  def bloomDedupAgainst(incoming: DataFrame, ref: DataFrame,
                        textCol: String = "text", idCol: String = "doc_id",
                        expectedItems: Long = 1000000L,
                        fpp: Double = 0.01): DataFrame = {
    val fp = TextFunctions.fingerprint(col(textCol))
    val refFp = ref.select(fp.as("fp"))
    val bloom = refFp.stat.bloomFilter("fp", math.max(expectedItems, 1L), fpp)
    val bc = incoming.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((s: String) => s != null && bc.value.mightContainString(s))
    incoming.select(col(idCol), fp.as("fp"))
      .where(mightContain(col("fp")))
      .join(refFp.distinct(), Seq("fp"), "left_semi")
      .select(col(idCol), col("fp"))
  }

  /** Chunk-level exact dedup: split each doc into consecutive
    * `chunkWords`-word windows, drop every chunk whose exact text already
    * occurred earlier in the corpus (keep-first on (doc_id, chunk_idx)),
    * and reassemble the survivors — the sub-document granularity between
    * doc-level `exact` and the k-char span machinery of
    * `removeDuplicateSpans` (boilerplate paragraphs, quoted headers).
    *
    * Returns one row per doc: (idCol, n_chunks, n_kept, cleaned) with
    * `cleaned` the kept chunks re-joined in order (empty string when
    * every chunk was a repeat).
    *
    * Scale shape: chunks shuffle once keyed by their TEXT (the group key
    * is the chunk itself — no hash-collision epsilon in the result) to
    * rank first-occurrences, then once by doc id to reassemble; both are
    * chunk-granular rows, nothing is all-pairs. At 100 TB the first
    * exchange can ship (xxhash64(chunk), doc_id, idx) instead of text and
    * semi-join winners back — trade an epsilon collision rate for 10x
    * exchange volume; the window/agg structure is unchanged. */
  def chunkDedup(docs: DataFrame, chunkWords: Int = 20,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val nChunks = ceil(size(split(col(textCol), " ")) / lit(chunkWords.toDouble))
      .cast("int")
    val chunks = docs
      .select(col(idCol), split(col(textCol), " ").as("ws"), nChunks.as("nc"))
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, nc - 1), i -> array_join(slice(ws, i * $chunkWords + 1, $chunkWords), ' '))"))
        .as(Seq("idx", "chunk")))
    // first-occurrence via ONE partial-combined groupBy-min — no window
    // (the chunkDedupByHash hot-partition note) and, since r12, NO join
    // back either: min(struct(id, idx)) over a chunk group IS the single
    // kept occurrence, so the kept set is the aggregate's output itself.
    // The old shape joined the chunk-granular frame against the winners
    // to flag keeps, which consumed the explode+split pipeline twice and
    // paid a chunk-granular equi-join; this one scans the corpus once.
    // Per-doc totals (n_chunks) come from the document itself (nc), not
    // from re-counting exploded rows. This exact-text variant still keys
    // by the chunk TEXT by design (zero-collision contract; the hashed
    // shape above is the 100 TB default) — the group key doubles as the
    // text carried into reassembly.
    val kept = chunks.groupBy("chunk")
      .agg(min(struct(col(idCol), col("idx"))).as("__first"))
      .groupBy(col("__first").getField(idCol).as(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(sort_array(collect_list(
          struct(col("__first").getField("idx").as("idx"), col("chunk")))),
          s => s.getField("chunk"))).as("cleaned"))
    docs.select(col(idCol), nChunks.cast("long").as("n_chunks"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** `chunkDedup`'s 100 TB shape: identical keep-first semantics, but the
    * chunk-identity exchanges carry a 128-bit chunk fingerprint
    * (two independently-seeded xxhash64 lanes) instead of the chunk
    * text, and reassembly re-slices the ORIGINAL document rather than
    * re-materializing it from shuffled chunks.
    *
    * First-occurrence selection is a partial-combined groupBy-min, NOT
    * a rank window: a window partitioned by the chunk hash puts every
    * copy of a mega-duplicated chunk (site boilerplate at web scale)
    * into ONE task's sort, which AQE cannot split — whereas the
    * aggregate combines map-side (the exchange ships at most the
    * per-partition distinct fingerprints). Since r12 there is no join
    * back either: min(struct(id, idx)) IS the kept occurrence, so the
    * kept set is the aggregate output itself and the fingerprint
    * pipeline is scanned exactly once (the old flag-join consumed it
    * twice and paid a chunk-granular equi-join).
    *
    * Exchange ledger: the min-agg exchange ships distinct (h1, h2,
    * min-struct) partials, the reassembly agg ships kept (id, idx)
    * pairs, and the document text crosses exactly ONE exchange (the
    * final doc-keyed join) — vs two full text exchanges in the old
    * exact-text variant. The result is bit-identical to `chunkDedup`
    * absent a 128-bit collision (P < 1e-18 per 10^10 chunks); the q258
    * oracle replays the exact-text semantics against this variant, so a
    * collision would fail the gate rather than pass silently. */
  def chunkDedupByHash(docs: DataFrame, chunkWords: Int = 20,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val nChunks = ceil(size(split(col(textCol), " ")) / lit(chunkWords.toDouble))
      .cast("int")
    val fps = docs
      .select(col(idCol), split(col(textCol), " ").as("ws"), nChunks.as("nc"))
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, nc - 1), i -> array_join(slice(ws, i * $chunkWords + 1, $chunkWords), ' '))"))
        .as(Seq("idx", "chunk")))
      // project the text away BEFORE the exchange: only the fingerprint
      // lanes cross the shuffle boundary
      .select(col(idCol), col("idx"),
        xxhash64(col("chunk")).as("h1"),
        xxhash64(lit("graft-chunk-lane2"), col("chunk")).as("h2"))
    val kept = fps.groupBy("h1", "h2")
      .agg(min(struct(col(idCol), col("idx"))).as("__first"))
      .groupBy(col("__first").getField(idCol).as(idCol))
      .agg(count(lit(1)).as("n_kept"),
        sort_array(collect_list(col("__first").getField("idx"))).as("kept_idx"))
    docs.select(col(idCol), split(col(textCol), " ").as("ws"),
        nChunks.cast("long").as("n_chunks"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(concat_ws(" ", flatten(transform(col("kept_idx"),
          i => slice(col("ws"), i * chunkWords + 1, lit(chunkWords))))), lit(""))
          .as("cleaned"))
  }
}
