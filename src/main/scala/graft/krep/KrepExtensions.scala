package graft.krep

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Contains, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface + optimizer rule for the krep operators.
  *
  * Register with `--conf spark.sql.extensions=graft.krep.KrepExtensions`
  * (or `withExtensions`): exposes `krep_contains / krep_count /
  * krep_count_lines / krep_tokenize / ascii_lower` to `spark.sql(...)`, and
  * installs [[SimplifyKrepContains]], which rewrites the degenerate
  * single-literal case-sensitive non-whole-word `krep_contains` into Spark's
  * native `Contains` — the same physical choice the reference's kernel
  * selector makes for trivial patterns (krep.c:1771-1870), here letting the
  * JVM-intrinsified `UTF8String.contains` serve the hot filter path. Also
  * injects [[graft.query.IndexFilterRewrite]]'s rule (a no-op until a corpus
  * is registered via `IndexFilterRewrite.register`), so a spark-submit user
  * gets the index access path with nothing but the extensions conf plus one
  * register call.
  */
class KrepExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    KrepExtensions.registrations.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.krep", name), builder))
    }
    ext.injectOptimizerRule(_ => SimplifyKrepContains)
    ext.injectOptimizerRule(_ => graft.query.IndexFilterRewrite.Rule)
  }
}

object KrepExtensions {

  /** Install on an already-running session: SQL functions + optimizer rule
    * (the `spark.sql.extensions` conf only applies at session build time).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    registrations.foreach { case (name, builder) =>
      org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, name, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(SimplifyKrepContains))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SimplifyKrepContains
  }

  private def litStr(e: Expression, arg: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$arg must be a string literal, got $other")
  }

  private def litFlag(e: Expression, arg: String): Boolean = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$arg must be a constant boolean, got $e")
    e.eval(null) == true
  }

  private def params1(args: Seq[Expression]): KrepParams = {
    // (text, pattern [, caseSensitive [, wholeWord]]) — flags must fold to
    // constants, same contract as the pattern literal
    val cs = args.lift(2).forall(litFlag(_, "caseSensitive"))
    val ww = args.lift(3).exists(litFlag(_, "wholeWord"))
    KrepParams(Seq(litStr(args(1), "pattern")), caseSensitive = cs, wholeWord = ww)
  }

  val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "krep_contains" -> (args => KrepContains(args.head, params1(args))),
    "krep_count" -> (args => KrepCount(args.head, params1(args))),
    "krep_count_lines" -> (args => KrepCountLines(args.head, params1(args))),
    "krep_positions" -> (args => KrepPositions(args.head, params1(args))),
    "krep_extract" -> (args => KrepExtract(args.head, params1(args))),
    "krep_extract_lines" -> (args => KrepExtractLines(args.head, params1(args))),
    "krep_tokenize" -> (args => KrepTokenize(args.head)),
    "krep_term_freqs" -> (args => KrepTermFreqs(args.head)),
    "krep_term_positions" -> (args => KrepTermPositions(args.head)),
    "krep_is_binary" -> (args => KrepIsBinary(args.head)),
    "krep_skip_name" -> (args => KrepSkipName(args.head)),
    "krep_skip_dir" -> (args => KrepSkipDir(args.head)),
    "krep_token_count" -> (args => KrepTokenCount(args.head)),
    "krep_term_positions_packed" -> (args => KrepTermPositionsPacked(args.head)),
    "ascii_lower" -> (args => AsciiLower(args.head)),
    "poly_hash" -> (args => graft.ops.PolyHash(args.head)),
    "cosine_sim" -> (args => graft.ops.CosineSim(args(0), args(1))))
}

/** `krep_contains(c, 'lit')` with default flags ≡ `Contains(c, 'lit')`
  * byte-for-byte (both are byte-wise substring tests), so prefer the
  * built-in: it participates in codegen as a single intrinsic call and in
  * data-source filter pushdown (`StringContains`).
  */
object SimplifyKrepContains extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // an explicit kernel override ("ac"/"scan") pins the krep kernel, so
      // the intrinsic rewrite stands down — the --algo contract is that the
      // FORCED kernel executes (krep.c:1786-1795)
      case KrepContains(child, KrepParams(Seq(p), true, false, _, false, max, "auto"))
          if max > 0 && p.nonEmpty =>
        Contains(child, Literal(UTF8String.fromString(p), StringType))
    }
}
