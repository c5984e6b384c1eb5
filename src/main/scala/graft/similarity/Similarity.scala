package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (ARRAY<FLOAT|DOUBLE>).
  *
  * Scale design: the baseline is brute-force cosine against a BROADCAST
  * query set (queries are small; the corpus streams map-side — no corpus
  * shuffle, no all-pairs). The scale path is LSH bucketing via random
  * hyperplanes (deterministic seeded planes), which turns top-k into a
  * bucket-local problem; at 100 TB add IVF (k-means coarse quantizer from
  * graft.clustering.KMeans) so each query probes a few cells.
  */
object Similarity {

  /** Double-precision dot product of two array columns — a native Catalyst
    * expression generating one fused primitive loop (sequential
    * left-to-right accumulation, deterministic and oracle-reproducible;
    * graft.functions.ArrayDotProduct replaces the allocating
    * aggregate(zip_with(...)) formulation on this hot path). */
  def dot(a: Column, b: Column): Column = graft.functions.ArrayNumeric.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Fused single-pass cosine (native expression: one loop computes dot and
    * both norms — no intermediate arrays). */
  def cosine(a: Column, b: Column): Column = graft.functions.ArrayNumeric.cosine(a, b)

  /** Brute-force cosine top-k: for each query row in `queries` (small,
    * broadcast), the k nearest corpus rows. Deterministic tie-break on
    * corpus id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Random-hyperplane LSH bucket id: sign bits of `nPlanes` projections
    * against deterministic seeded pseudo-random planes (hash-derived
    * literal arrays — executors need no broadcast state, and the
    * projection is a compact fold, not an unrolled n*d-term expression
    * that would blow up whole-stage codegen compile time). */
  def hyperplaneBucket(vec: Column, dim: Int, nPlanes: Int, seed: Int = 42): Column = {
    val v = vec.cast("array<double>")
    val bits = (0 until nPlanes).map { p =>
      val plane = array((0 until dim).map { i =>
        val h = scala.util.hashing.MurmurHash3.productHash((seed, p, i))
        lit(h.toDouble / Int.MaxValue)
      }: _*)
      val proj = aggregate(zip_with(v, plane, (x, w) => x * w),
        lit(0.0), (acc, t) => acc + t)
      when(proj >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << p)
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: candidates = corpus rows sharing the query's bucket
    * in ANY of `numTables` independent hyperplane tables (multi-table
    * boosts recall; candidates dedup via groupBy before re-rank); exact
    * cosine re-rank on the candidate set. Shuffle is bounded by bucket
    * sizes, never all-pairs. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              nPlanes: Int = 8, numTables: Int = 4, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    def buckets(df: DataFrame, prefix: String): DataFrame =
      df.select(col(idCol).as(s"${prefix}_id"), col(vecCol).as(s"${prefix}v"),
        posexplode(array((0 until numTables).map(tbl =>
          hyperplaneBucket(col(vecCol), dim, nPlanes, seed = 42 + tbl)): _*))
          .as(Seq("tbl", "bucket")))
    val bq = buckets(queries, "query")
    val bc = buckets(corpus, "neighbor")
    val cand = broadcast(bq).join(bc, Seq("tbl", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(first(col("queryv")).as("qv"), first(col("neighborv")).as("cv"))
    val scored = cand.select(col("query_id"), col("neighbor_id"),
      cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path: a k-means
    * codebook partitions the corpus into `nCells` cells; each query probes
    * only its `nProbe` nearest cells and re-ranks exactly within them.
    *
    * Scale shape: the codebook is fit on a seeded sample and broadcast
    * (k centroids x d floats); corpus cell assignment is one codegen map;
    * the probe join is an equi-join on cell id, so per-query work is
    * bounded by the probed cells' sizes — at 100 TB with nCells ~ sqrt(N)
    * this touches ~nProbe/nCells of the corpus instead of all of it. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding",
              sampleFraction: Double = 0.5): DataFrame = {
    // cosine metric: quantize UNIT-normalized vectors (spherical-k-means
    // regime) — L2 cells on raw vectors would split by magnitude and miss
    // cosine-near neighbors of different norm
    def unit(c: Column): Column = {
      val v = c.cast("array<double>")
      val n = sqrt(greatest(dot(v, v), lit(1e-300)))
      transform(v, x => x / n)
    }
    // coarse quantizer: k-means codebook on a normalized corpus sample
    val trainDf = corpus.sample(withReplacement = false, math.min(1.0, sampleFraction), seed)
      .select(unit(col(vecCol)).as(graft.core.Trajectories.FeatCol))
    val codebook = graft.clustering.KMeans.fit(trainDf, nCells, maxIter = 20, seed = seed)
    // corpus side: each row to its single nearest cell
    val corpusCells = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), codebook.assignColumn(unit(col(vecCol))).as("cell"))
    // query side: explode to the nProbe nearest cells (normalized space)
    val centers = codebook.centers
    val probe = udf { (x: Seq[Double]) =>
      val nrm = math.max(math.sqrt(x.map(v => v * v).sum), 1e-300)
      centers.indices.map { j =>
        var s = 0.0; var i = 0
        while (i < x.length) { val d = x(i) / nrm - centers(j)(i); s += d * d; i += 1 }
        (j, s)
      }.sortBy(_._2).take(nProbe).map(_._1)
    }
    val queryCells = broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"),
        explode(probe(col(vecCol).cast("array<double>"))).as("cell")))
    val scored = queryCells.join(corpusCells, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, within
    * LSH buckets (near-dup detection for embedding-indexed corpora).
    *
    * Scale shape mirrors Dedup.minhashCandidates: multiple independent
    * hyperplane tables for recall, and a `maxBucketSize` cap that drops
    * degenerate mega-buckets (at 100 TB a boilerplate-heavy bucket would
    * otherwise quadratically explode the self-join; a true near-dup pair
    * still collides in another table). Candidate pairs dedup across tables
    * before the exact-cosine verify. */
  def cosineNearDupes(corpus: DataFrame, threshold: Double, dim: Int,
                      nPlanes: Int = 10, numTables: Int = 2,
                      maxBucketSize: Int = 1000, idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    val b = corpus.select(col(idCol), col(vecCol),
      posexplode(array((0 until numTables).map(t =>
        hyperplaneBucket(col(vecCol), dim, nPlanes, seed = 42 + t)): _*))
        .as(Seq("tbl", "bucket")))
      .withColumn("bucket_n", count(lit(1))
        .over(Window.partitionBy("tbl", "bucket")))
      .where(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")
    val l = b.select(col("tbl"), col("bucket"), col(idCol).as("a"), col(vecCol).as("va"))
    val r = b.select(col("tbl"), col("bucket"), col(idCol).as("b"), col(vecCol).as("vb"))
    l.join(r, Seq("tbl", "bucket")).where(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(first(col("va")).as("va"), first(col("vb")).as("vb"))
      .select(col("a"), col("b"), cosine(col("va"), col("vb")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
