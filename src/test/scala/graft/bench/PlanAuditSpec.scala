package graft.bench

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** CI gate for the plan-shape audit (VERDICT r5 next-round #6): every
  * SparkEntry query must construct without error and carry zero
  * NESTED-SEMI / SHUFFLE-HEAVY flags, so the optimizer-rule/pushdown
  * ping-pong class of regression fails sbt test instead of waiting for a
  * human to run the PlanAudit main. A deliberately broken shape (nested
  * LEFT SEMI chain — the rewrite bug's signature) must trip the detector.
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("every SparkEntry query audits clean (no flags, no errors)") {
    // logical-plan checks (NESTED-SEMI) are AQE-independent; physical
    // exchange counts need AQE off to see the static executed plan
    val prior = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val audits = PlanAudit.auditAll(spark, sfDir)
      assert(audits.nonEmpty)
      val bad = audits.filter(a => a.flags.nonEmpty || a.error.nonEmpty)
      assert(bad.isEmpty, bad.map(a =>
        s"${a.name}: ${a.flags.mkString(" ")} ${a.error.getOrElse("")}")
        .mkString("; "))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  test("a nested LEFT SEMI chain trips the NESTED-SEMI flag") {
    import spark.implicits._
    val a = Seq(1L, 2L, 3L).toDF("id")
    val b = Seq(2L, 3L).toDF("id")
    val c = Seq(3L).toDF("id")
    val nested = a.join(b, Seq("id"), "left_semi")
      .join(c, Seq("id"), "left_semi")
    val audit = PlanAudit.auditQuery("fixture", nested)
    assert(audit.semis >= 2)
    assert(audit.flags.contains("NESTED-SEMI"))
  }
}
