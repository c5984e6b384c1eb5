package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Asymmetric containment metrics (Dedup.ngramContainment / q127). */
class ContainmentSpec extends SparkSpec with Matchers {

  private def run(rows: Seq[(Long, String)], k: Int = 5) = {
    import spark.implicits._
    val docs = rows.toDF("doc_id", "text")
    val ids = docs.select(col("doc_id"))
    val pairs = ids.select(col("doc_id").as("a"))
      .crossJoin(ids.select(col("doc_id").as("b")))
      .where(col("a") < col("b"))
    Dedup.ngramContainment(docs, pairs, k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
  }

  test("a short doc embedded verbatim in a long one: containment 1, jaccard < 1") {
    val short = "the quick brown fox jumps over the lazy dog"
    val long = s"prefix words here $short and a much longer tail of extra content"
    val out = run(Seq((1L, short), (2L, long)))
    val (inter, na, nb, jac, cont) = out((1L, 2L))
    inter shouldBe na          // every shingle of the short doc appears in the long
    cont shouldBe 1.0
    jac should be < 1.0
    nb should be > na
  }

  test("identical docs: containment and jaccard both 1") {
    val t = "identical text shared by both documents exactly"
    val out = run(Seq((1L, t), (2L, t)))
    val (_, na, nb, jac, cont) = out((1L, 2L))
    na shouldBe nb
    jac shouldBe 1.0
    cont shouldBe 1.0
  }

  test("disjoint docs: zero intersection, zero metrics") {
    val out = run(Seq((1L, "aaaaa aaaaa aaaaa"), (2L, "zzzzz zzzzz zzzzz")))
    val (inter, _, _, jac, cont) = out((1L, 2L))
    inter shouldBe 0L
    jac shouldBe 0.0
    cont shouldBe 0.0
  }

  test("matches a brute-force character-shingle computation") {
    val rows = Seq(
      (1L, "one two three four five six seven"),
      (2L, "three four five six seven eight nine"),
      (3L, "completely different content words here"))
    val k = 5
    def shingles(t: String): Set[String] =
      (0 to t.length - k).map(i => t.substring(i, i + k)).toSet
    val out = run(rows, k)
    for {
      (ida, ta) <- rows; (idb, tb) <- rows if ida < idb
    } {
      val (sa, sb) = (shingles(ta), shingles(tb))
      val (inter, na, nb, jac, cont) = out((ida, idb))
      inter shouldBe sa.intersect(sb).size.toLong
      na shouldBe sa.size.toLong
      nb shouldBe sb.size.toLong
      jac shouldBe (sa.intersect(sb).size.toDouble / sa.union(sb).size) +- 1e-12
      cont shouldBe (sa.intersect(sb).size.toDouble / math.min(sa.size, sb.size)) +- 1e-12
    }
  }
}
