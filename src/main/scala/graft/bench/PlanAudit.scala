package graft.bench

import org.apache.spark.sql.SparkSession
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
  * query's own construction runs.
  *
  * Usage: runMain graft.bench.PlanAudit [sfDir]
  */
object PlanAudit {
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

    def countL(p: LogicalPlan)(f: PartialFunction[LogicalPlan, Unit]): Int =
      p.collect(f.andThen(_ => 1)).sum
    def countP(p: SparkPlan)(f: PartialFunction[SparkPlan, Unit]): Int =
      p.collect(f.andThen(_ => 1)).sum

    println(f"${"query"}%-26s ${"joins"}%5s ${"semi"}%4s ${"shuf"}%4s ${"bcast"}%5s ${"wscg"}%4s  flags")
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val opt = df.queryExecution.optimizedPlan
        val phys = df.queryExecution.executedPlan
        val joins = countL(opt) { case _: Join => }
        val semis = countL(opt) {
          case j: Join if j.joinType.sql == "LEFT SEMI" => }
        val shuf = countP(phys) { case _: ShuffleExchangeExec => }
        val bcast = countP(phys) { case _: BroadcastExchangeExec => }
        val wscg = countP(phys) { case _: WholeStageCodegenExec => }
        val flags = new StringBuilder
        if (semis > 1) flags.append(" NESTED-SEMI")
        if (shuf > 8) flags.append(" SHUFFLE-HEAVY")
        if (flags.nonEmpty) flagged += 1
        println(f"$name%-26s $joins%5d $semis%4d $shuf%4d $bcast%5d $wscg%4d ${flags.toString}")
      } catch {
        case e: Throwable =>
          flagged += 1
          println(f"$name%-26s ERROR ${e.getMessage.linesIterator.next().take(80)}")
      }
    }
    println(s"flagged: $flagged")
    spark.stop()
    if (flagged > 0) sys.exit(1)
  }
}
