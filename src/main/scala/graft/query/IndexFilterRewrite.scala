package graft.query

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Contains, EqualTo, Expression, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, explode}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.index.{BlockDocIds, IceTable, StepInfo}
import graft.krep.{AsciiFold, KrepContains, KrepParams}

/** Evaluation-transparent marker around a filter conjunct the rewrite has
  * already served: same value, same nullability, same codegen as its child.
  * Its only purpose is the rule's fixpoint — predicate pushdown re-exposes
  * the rewritten `Filter(cond, relation)` shape every optimizer iteration,
  * and the marker is what stops the rule firing twice on the same conjunct
  * (see [[IndexFilterRewrite.Rule]]).
  */
case class IndexServed(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: org.apache.spark.sql.types.DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(c: Expression): IndexServed =
    copy(child = c)
  override def prettyName: String = "index_served"
}

/** Automatic `krep_contains(text, 'lit')` → inverted-index lookup rewrite —
  * the plan-level analog of the reference's kernel selector: the user writes
  * the filter, the engine picks the physical strategy (krep.c:1771-1870, the
  * user never chooses the kernel; SURVEY.md §4's one custom
  * `Rule[LogicalPlan]`).
  *
  * A SQL/DataFrame filter `krep_contains(text, p)` (or the native `Contains`
  * that [[graft.krep.SimplifyKrepContains]] lowers it to) over a REGISTERED
  * indexed corpus becomes
  * {{{
  *   Filter(cond, corpus LEFT SEMI JOIN candidateDocIds ON docId)
  * }}}
  * where candidateDocIds = postings ⨝ (dict terms CONTAINING the folded
  * pattern) exploded to docIds. The original predicate is RETAINED above the
  * semi join (recheck discipline, same as the phrase path): the index prunes,
  * the predicate decides — so the rewrite can never change an answer, only
  * the plan.
  *
  * Soundness gate (when is the candidate set a superset of the matches): the
  * pattern must be non-empty and consist solely of word bytes
  * ([[AsciiFold.isWordByte]] — the tokenizer's own alphabet), so every
  * occurrence in any text lies inside one maximal word-byte run = one token,
  * and the folded token — a dict term of the doc — contains the folded
  * pattern. Holds for case-sensitive, case-insensitive and whole-word
  * matching (the recheck restores the exact semantics); multi-pattern OR
  * qualifies when every pattern does (candidates = union via the same
  * multi-pattern dict scan). Regex, patterns with non-word bytes (spanning
  * token boundaries), and explicit `algo` kernel overrides stand down — the
  * `--algo` contract is that the forced kernel executes
  * ([[graft.krep.SimplifyKrepContains]] precedent, krep.c:1786-1795) — and
  * so do UNSELECTIVE patterns (substring of a hot dict term collected at
  * [[register]] time), for which the scan filter is the cheaper access path.
  *
  * Scale shape: the dict scan is one columnar pass over terms (the relation
  * that is ~5 orders smaller than the corpus); postings prune to matching
  * termIds via the broadcastable dict side; the semi join's build side is
  * distinct docIds, sized by the pattern's true selectivity, and AQE picks
  * broadcast-semi vs shuffle at runtime. A selective pattern skips the
  * per-row pattern work for every non-candidate doc; an unselective one is
  * caught by the hot-term gate at plan time and keeps the plain scan filter
  * (see [[register]]).
  */
object IndexFilterRewrite {

  private final case class Entry(root: String,
      snapshot: scala.collection.Map[String, StepInfo],
      corpusFiles: Set[String],
      docCount: Long,
      hotTerms: Array[String],
      // full (term, termId) dict when small enough to pin at register time
      // (the serving-tier discipline QueryEngine.dictCacheThreshold applies
      // to queries): candidate termIds then resolve at PLAN time on the
      // driver — no dict-scan job, no dict join in the candidate plan
      dictTerms: Array[String],
      dictTermIds: Array[Long],
      // the gate parameters this entry was built with — a re-register with
      // different knobs must rebuild, not silently keep the old gates
      params: (Double, Int, Long))

  /** Registered corpora, keyed by index root. */
  private val entries = new ConcurrentHashMap[String, Entry]

  /** Register the index at `root` (pinned to its CURRENT snapshot — the
    * engine-pinning discipline) and install the rule on the session. Filters
    * over that snapshot's corpus files are rewritten from then on.
    *
    * Selectivity gate (`maxCandidateFrac`): the rewrite is an access-path
    * CHOICE, and for an unselective pattern it is the wrong one — when the
    * candidate docId set approaches the corpus, the semi join's build side
    * stops being broadcastable and the join degenerates into shuffling the
    * full corpus to prune almost nothing, strictly worse at 10^12 docs than
    * the codegen'd scan filter it replaced. Since candidates = postings of
    * every dict term CONTAINING the pattern, any single hot term already
    * lower-bounds the candidate count; registration therefore collects the
    * terms with df > maxCandidateFrac·N (one columnar scan of the dict — the
    * relation ~5 orders smaller than the corpus — at register time, never at
    * plan time) and the rule stands down when a pattern is a substring of
    * any of them. Driver footprint is bounded by `hotTermCap`; with the
    * default frac, Σdf ≤ N·avgDistinctTerms caps the number of qualifying
    * terms at ~8·avgDistinctTerms, far under the cap. The gate is a cost
    * heuristic, not a soundness condition — both plans return identical
    * rows — so `maxCandidateFrac = 1.0` disables it (no dict scan).
    */
  /** Cost floor (`minCorpusDocs`): below this corpus size the rewrite stands
    * down entirely — the semi-join machinery (dict resolution, candidate
    * explode + distinct, the join itself) costs more than the codegen'd scan
    * filter it would replace when the whole corpus scans in milliseconds.
    * Like the hot-term gate it is a cost heuristic, never a soundness
    * condition; `minCorpusDocs = 0` disables it (tests and plan-assert rows
    * that must observe the firing register with 0).
    */
  def register(spark: SparkSession, root: String,
      maxCandidateFrac: Double = 0.125, hotTermCap: Int = 4096,
      minCorpusDocs: Long = 100000L,
      dictCacheMax: Long = 500000L): Unit = {
    install(spark)
    val ice = new IceTable(root, spark.sparkContext.hadoopConfiguration)
    val snap = ice.completedSteps
    val nDocs = snap("docs").rowCount
    if (nDocs < minCorpusDocs) { entries.remove(root); return }
    // re-registering an unchanged snapshot with unchanged gate knobs is a
    // no-op: the dict collect below is a Spark job, and callers re-register
    // per query defensively
    val prev = entries.get(root)
    if (prev != null && prev.snapshot.get("dict") == snap.get("dict") &&
        prev.snapshot.get("corpus") == snap.get("corpus") &&
        prev.params == ((maxCandidateFrac, hotTermCap, dictCacheMax))) return
    val cs = snap("corpus")
    val files = cs.files.map { case (f, _) => normalize(s"${cs.table}/$f") }.toSet
    val minDf = math.max(1L, (nDocs * maxCandidateFrac).toLong)
    val dictRows = snap("dict").rowCount
    if (dictRows <= dictCacheMax) {
      // ONE collect serves both the hot-term gate and the plan-time termId
      // resolution; per-append dict deltas are merged on the driver (df
      // sums; one termId per term)
      val merged = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
      ice.readSteps(spark, snap, "dict")
        .select(col("term"), col("termId"), col("df"))
        .collect().foreach { r =>
          val t = r.getString(0)
          merged.get(t) match {
            case Some((id, df)) => merged(t) = (id, df + r.getLong(2))
            case None => merged(t) = (r.getLong(1), r.getLong(2))
          }
        }
      val hot =
        if (maxCandidateFrac >= 1.0) Array.empty[String]
        else merged.iterator.collect {
          case (t, (_, df)) if df > minDf => t
        }.toArray
      val terms = merged.toArray
      entries.put(root, Entry(root, snap, files, nDocs, hot,
        terms.map(_._1), terms.map(_._2._1),
        (maxCandidateFrac, hotTermCap, dictCacheMax)))
    } else {
      val hot =
        if (maxCandidateFrac >= 1.0) Array.empty[String]
        else ice.readSteps(spark, snap, "dict")
          .groupBy(col("term"))
          .agg(org.apache.spark.sql.functions.sum(col("df")).as("df"))
          .filter(col("df") > minDf)
          .orderBy(col("df").desc, col("term"))
          .limit(hotTermCap)
          .select("term").collect().map(_.getString(0))
      entries.put(root, Entry(root, snap, files, nDocs, hot, null, null,
        (maxCandidateFrac, hotTermCap, dictCacheMax)))
    }
  }

  def deregister(root: String): Unit = entries.remove(root)

  /** Install the optimizer rule on an already-running session (idempotent —
    * same mechanism as [[graft.krep.KrepExtensions.install]]).
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(Rule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ Rule

  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Non-empty and all word bytes — the token-boundary soundness gate. */
  private def indexablePattern(p: String): Boolean = {
    val b = p.getBytes(StandardCharsets.UTF_8)
    b.nonEmpty && b.forall(AsciiFold.isWordByte)
  }

  private def foldAscii(p: String): String =
    new String(p.getBytes(StandardCharsets.UTF_8).map(AsciiFold.fold),
      StandardCharsets.UTF_8)

  /** Name of the candidate plan's output attribute. */
  private val CandAttr = "__graft_cand_docid"

  object Rule extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
      with PredicateHelper {

    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (entries.isEmpty) return plan
      plan.transformUp {
        case f @ Filter(cond, child) =>
          rewrite(f, cond, child).getOrElse(f)
      }
    }

    /** The rule's fixpoint is the PER-CONJUNCT [[IndexServed]] marker: this
      * rule runs in a fixed-point batch WITH PushDownPredicate — the
      * emitted Filter(cond, Join) gets its predicate pushed back under the
      * semi join, re-exposing Filter(krep_contains, relation) to the next
      * iteration, which would splice a second identical candidate join
      * under the first (observed in round 5: optimizer-iteration-many
      * nested semi joins, correct answers, ~100x the index work). A served
      * conjunct is wrapped in the evaluation-transparent marker, which
      * [[qualifying]] no longer matches, so each qualifying conjunct fires
      * AT MOST ONCE — and unlike round 5's plan-global attribute-name grep,
      * a SECOND indexed filter elsewhere in the tree (another conjunct,
      * another corpus read) still takes the index path with exactly one
      * candidate join of its own, and a user column that happens to be
      * named `__graft_cand_docid` cannot suppress the rewrite.
      */
    private def rewrite(f: Filter, cond: Expression,
        child: LogicalPlan): Option[Filter] =
      for {
        rel <- leafRelation(child)
        entry <- findEntry(rel)
        docId <- child.output.find(_.name == "docId")
        // first conjunct that the index can serve AND that passes the
        // selectivity gate: a pattern inside a hot term pulls that term's
        // whole postings into the candidate set, so the scan filter is the
        // better access path for it (see register's scaladoc) — but a later
        // selective conjunct of the same filter still prunes for the whole
        // conjunction (semi-join candidates are a superset of ITS matches,
        // hence of the AND's)
        conjuncts = splitConjunctivePredicates(cond)
        served = conjuncts.flatMap { c =>
          qualifying(c, child)
            .map(_.map(foldAscii).distinct)
            .filter(fs => !entry.hotTerms.exists(t => fs.exists(t.contains(_))))
            .map(fs => (c, fs))
        }
        if served.nonEmpty
      } yield {
        // EVERY qualifying conjunct is served in this one firing — each
        // gets its own candidate semi join (each prunes independently; the
        // intersection of candidate sets is a superset of the AND's
        // matches), and each is marked so no conjunct ever fires twice
        val chosen = served.map(_._1).toSet
        val joined = served.foldLeft(child) { case (acc, (_, folded)) =>
          val cand = candidatePlan(SparkSession.active, entry, folded)
          Join(acc, cand, LeftSemi,
            Some(EqualTo(docId, cand.output.head)), JoinHint.NONE)
        }
        val marked = conjuncts
          .map(c => if (chosen(c)) IndexServed(c) else c)
          .reduce(org.apache.spark.sql.catalyst.expressions.And(_, _))
        Filter(marked, joined)
      }

    /** The filter's input must be the registered corpus relation itself (or
      * a pure-attribute projection of it). Anything else stands down. NOTE:
      * this alone does NOT make the rule a fixpoint — predicate pushdown
      * re-exposes the shape it rejects (see the served-marker guard in
      * apply, which is the actual termination argument).
      */
    private def leafRelation(child: LogicalPlan): Option[LogicalRelation] =
      child match {
        case lr: LogicalRelation => Some(lr)
        case Project(projList, lr: LogicalRelation)
            if projList.forall(_.isInstanceOf[AttributeReference]) => Some(lr)
        case _ => None
      }

    private def findEntry(rel: LogicalRelation): Option[Entry] = {
      val files = rel.relation match {
        case fs: HadoopFsRelation => fs.location.inputFiles.toSeq
        case _ => Seq.empty
      }
      val norm = files.map(normalize)
      if (norm.isEmpty) None
      else entries.values.asScala.find(e => norm.forall(e.corpusFiles.contains))
    }

    /** A conjunct the index can serve: literal containment over THE indexed
      * text column, no regex, no kernel override, patterns inside the token
      * alphabet.
      */
    private def qualifying(e: Expression,
        child: LogicalPlan): Option[Seq[String]] = e match {
      case KrepContains(a: AttributeReference, p)
          if isTextAttr(a, child) && !p.regex && p.algo == "auto" &&
            p.maxCount > 0 && p.patterns.forall(indexablePattern) =>
        Some(p.patterns)
      case Contains(a: AttributeReference, Literal(s: UTF8String, StringType))
          if isTextAttr(a, child) && indexablePattern(s.toString) =>
        Some(Seq(s.toString))
      case _ => None
    }

    private def isTextAttr(a: AttributeReference, child: LogicalPlan): Boolean =
      a.name == "text" && child.outputSet.contains(a)

    /** Candidate docIds as an analyzed+optimized subplan, built fresh per
      * firing (fresh exprIds, so two rewrites in one query never collide):
      * dict terms containing any folded pattern → their posting blocks →
      * exploded, distinct docIds. Fully declarative — the rule runs no jobs;
      * dict terms are folded so one case-SENSITIVE containment scan serves
      * both original case modes, and wholeWord is dropped (a mid-token
      * occurrence still names candidate terms; the retained predicate
      * enforces boundaries).
      */
    private def candidatePlan(spark: SparkSession, e: Entry,
        folded: Seq[String]): LogicalPlan = {
      val ice = new IceTable(e.root, spark.sparkContext.hadoopConfiguration)
      val postings = ice.readSteps(spark, e.snapshot, "postings")
        .select(col("termId"), col("docs"), col("n"))
      // plan-time termId resolution over the register-time dict cache (pure
      // driver CPU through the same matcher the dict-scan plan compiles):
      // the candidate plan loses its dict-scan job AND its dict join — the
      // `termId IN (...)` predicate pushes down to the postings parquet
      // scan, whose files are (termId, docId)-sorted, so row-group min/max
      // pruning reads only the matching terms' blocks. Falls back to the
      // declarative dict-scan join when the dict was too big to pin or the
      // IN list would bloat the plan.
      val matchedIds: Array[Long] =
        if (e.dictTerms == null) null
        else {
          val m = new graft.krep.KrepMatcher(KrepParams(folded))
          val b = Array.newBuilder[Long]
          var i = 0
          while (i < e.dictTerms.length) {
            if (m.contains(UTF8String.fromString(e.dictTerms(i))))
              b += e.dictTermIds(i)
            i += 1
          }
          b.result()
        }
      val pruned =
        if (matchedIds != null && matchedIds.length <= 4096)
          postings.filter(col("termId").isin(
            matchedIds.map(java.lang.Long.valueOf).toSeq: _*))
        else {
          // distinct: per-append dict deltas repeat (termId, term) pairs,
          // and a duplicated build side would duplicate joined blocks
          // (the trailing docId distinct would still dedupe — this keeps
          // the join's work proportional to matching terms)
          val dict = ice.readSteps(spark, e.snapshot, "dict")
            .filter(graft.krep.functions.krep_contains(col("term"),
              KrepParams(folded)))
            .select(col("termId")).distinct()
          postings.join(dict, "termId")
        }
      val docIds = GraftSqlBridge.column(BlockDocIds(
        GraftSqlBridge.expression(col("docs")),
        GraftSqlBridge.expression(col("n"))))
      pruned
        .select(explode(docIds).as(CandAttr))
        .distinct()
        .queryExecution.optimizedPlan
    }
  }
}
