package graft.tools

import graft.SparkSpec
import org.scalatest.matchers.should.Matchers

/** The documented plan-shape claims (tools/PlanChecks) promoted into the
  * test suite, so a Spark upgrade or query edit that silently changes a
  * plan FAILS CI rather than waiting for someone to run the tool
  * (VERDICT r09 item 3). The claims themselves are pre-execution plan
  * checks (static shapes — join strategy, pushed filters, exchange
  * counts — are visible on the AQE initial plan, where the
  * ResultQueryStageExec vacuous-pass trap does not apply). Two
  * representative no-join / no-cartesian claims are additionally
  * re-verified POST-execution through `ScaleAudit.allPlanNodes`, the
  * walk proven non-vacuous by ScaleAuditInspectionSpec. */
class PlanChecksSpec extends SparkSpec with Matchers {

  private val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  for ((name, assertions) <- PlanChecks.claims) {
    test(s"plan claims hold: $name") {
      val plan = PlanChecks.planOf(spark, dir, name)
      for ((desc, pred) <- assertions)
        withClue(s"$name :: $desc\n--- plan ---\n$plan\n---\n") {
          pred(plan) shouldBe true
        }
    }
  }

  test("post-execution: q108 as-of join executes with no join node (allPlanNodes walk)") {
    val df = graft.SparkEntry.queries("q108_asof_join")(spark, dir)
    df.count() should be > 0L
    val nodes = ScaleAudit.allPlanNodes(df)
    nodes.length should be > 3 // the walk actually descended past the result stage
    val joins = nodes.filter(n => n.getClass.getSimpleName.contains("Join"))
    withClue(joins.map(_.getClass.getSimpleName).mkString(", ")) {
      joins shouldBe empty
    }
  }

  test("post-execution: q109 range join executes hash-partitioned, no cartesian/nested-loop (allPlanNodes walk)") {
    val df = graft.SparkEntry.queries("q109_range_join")(spark, dir)
    df.count() should be > 0L
    val nodes = ScaleAudit.allPlanNodes(df)
    nodes.length should be > 3
    val bad = nodes.map(_.getClass.getSimpleName).filter(n =>
      n.contains("CartesianProduct") || n.contains("BroadcastNestedLoopJoin"))
    bad shouldBe empty
  }
}
