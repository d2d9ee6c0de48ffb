package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.WholeStageCodegenExec

import graft.SparkEntry

/** Plan-shape audit over every SparkEntry query: counts logical joins,
  * physical shuffle/broadcast exchanges and whole-stage-codegen spans, and
  * flags suspicious shapes (nested LEFT SEMI chains — the signature of the
  * rewrite/pushdown ping-pong this audit was written to catch — and
  * shuffle-heavy plans). Structure-only: nothing is executed except what a
  * query's own construction runs. The audit logic lives in [[auditQuery]] /
  * [[auditAll]] so PlanAuditSpec gates it in CI; this main stays the
  * human-readable report.
  *
  * Usage: runMain graft.bench.PlanAudit [sfDir]
  */
object PlanAudit {

  final case class Audit(name: String, joins: Int, semis: Int, shuf: Int,
      bcast: Int, wscg: Int, flags: Seq[String], error: Option[String])

  private def countL(p: LogicalPlan)(f: PartialFunction[LogicalPlan, Unit]): Int =
    p.collect(f.andThen(_ => 1)).sum
  private def countP(p: SparkPlan)(f: PartialFunction[SparkPlan, Unit]): Int =
    p.collect(f.andThen(_ => 1)).sum

  /** Audit one constructed query. NOTE: physical exchange counts are only
    * meaningful with AQE disabled (AdaptiveSparkPlanExec hides its tree from
    * collect() until execution); the logical NESTED-SEMI check is
    * AQE-independent.
    */
  def auditQuery(name: String, df: DataFrame): Audit = {
    val opt = df.queryExecution.optimizedPlan
    val phys = df.queryExecution.executedPlan
    val joins = countL(opt) { case _: Join => }
    val semis = countL(opt) {
      case j: Join if j.joinType.sql == "LEFT SEMI" => }
    val shuf = countP(phys) { case _: ShuffleExchangeExec => }
    val bcast = countP(phys) { case _: BroadcastExchangeExec => }
    val wscg = countP(phys) { case _: WholeStageCodegenExec => }
    val flags = Seq.newBuilder[String]
    if (semis > 1) flags += "NESTED-SEMI"
    if (shuf > 8) flags += "SHUFFLE-HEAVY"
    Audit(name, joins, semis, shuf, bcast, wscg, flags.result(), None)
  }

  /** Audit every SparkEntry query against `dir`. Construction errors become
    * flagged audits rather than exceptions.
    */
  def auditAll(spark: SparkSession, dir: String): Seq[Audit] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try auditQuery(name, fn(spark, dir))
      catch {
        case e: Throwable =>
          Audit(name, 0, 0, 0, 0, 0, Seq("ERROR"),
            Some(Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.next().take(80)))
      }
    }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .appName("graft-plan-audit").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // static plans: AQE's AdaptiveSparkPlanExec hides its tree from
      // collect() until execution; with it off, executedPlan is the fully
      // prepared static plan including the exchanges EnsureRequirements adds
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println(f"${"query"}%-26s ${"joins"}%5s ${"semi"}%4s ${"shuf"}%4s ${"bcast"}%5s ${"wscg"}%4s  flags")
    var flagged = 0
    auditAll(spark, dir).foreach { a =>
      if (a.flags.nonEmpty) flagged += 1
      a.error match {
        case Some(msg) => println(f"${a.name}%-26s ERROR $msg")
        case None =>
          println(f"${a.name}%-26s ${a.joins}%5d ${a.semis}%4d ${a.shuf}%4d " +
            f"${a.bcast}%5d ${a.wscg}%4d  ${a.flags.mkString(" ")}")
      }
    }
    println(s"flagged: $flagged")
    spark.stop()
    if (flagged > 0) sys.exit(1)
  }
}
