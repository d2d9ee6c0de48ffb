package graft.query

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.corpus.SynthWebText
import graft.index.{IndexBuilder, IndexConfig}
import graft.krep.{KrepParams, functions => K}

/** The automatic `krep_contains → index lookup` rewrite (SURVEY.md §4's one
  * custom Rule[LogicalPlan]): fires as a recheck-retaining semi join on a
  * registered corpus, stands down for kernel overrides / regex / non-token
  * patterns / unregistered relations, and NEVER changes an answer — every
  * fired case is differentially checked against the unrewritten scan.
  */
class IndexFilterRewriteSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val nDocs = 1500L
  private lazy val pages = SynthWebText.pages(spark, nDocs, numPartitions = 4).cache()

  private lazy val indexRoot: String = {
    val dir = Files.createTempDirectory("graft-ifr-").toString
    new IndexBuilder(spark, dir,
      IndexConfig(blockSize = 64, docsPerSegment = 512, partitions = 4))
      .build(pages)
    dir
  }
  private def engine = new QueryEngine(spark, indexRoot)
  private def t(r: Int) = SynthWebText.term(r)

  private def semiJoins(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType == LeftSemi => j
    }.size

  private def fired(df: DataFrame): Boolean = semiJoins(df) > 0

  /** Collect docIds of `pred` over the corpus twice: once with the root
    * deregistered (plain scan — the ground truth), once registered (must
    * fire); assert identical.
    */
  private def differential(name: String,
      pred: DataFrame => DataFrame): Unit = {
    IndexFilterRewrite.deregister(indexRoot)
    val want = pred(engine.corpusDf).select("docId")
      .collect().map(_.getLong(0)).sorted.toSeq
    try {
      // gate off (maxCandidateFrac = 1.0): these cases test the JOIN PATH's
      // semantics for hot and cold patterns alike; the default selectivity
      // gate has its own test below
      IndexFilterRewrite.register(spark, indexRoot, maxCandidateFrac = 1.0,
        minCorpusDocs = 0)
      val df = pred(engine.corpusDf)
      // exactly ONE candidate join: the rule once ping-ponged with
      // predicate pushdown in the fixed-point batch, nesting a fresh semi
      // join per optimizer iteration (correct answers, ~100x index work)
      assert(semiJoins(df) == 1,
        s"$name: expected exactly 1 semi join, got ${semiJoins(df)}")
      val got = df.select("docId").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want,
        s"$name: rewritten result diverges (${got.length} vs ${want.length} rows)")
    } finally IndexFilterRewrite.deregister(indexRoot)
  }

  test("default krep_contains fires and matches the scan (hot + cold + absent)") {
    differential("hot substring",
      _.filter(K.krep_contains(org.apache.spark.sql.functions.col("text"), "ver")))
    differential("planted marker",
      _.filter(K.krep_contains(org.apache.spark.sql.functions.col("text"),
        "plantedmarker0")))
    // absent from every dict term: candidate set is empty, result must be too
    differential("absent pattern",
      _.filter(K.krep_contains(org.apache.spark.sql.functions.col("text"),
        "zzzqqqxxxnotaword")))
  }

  test("native Contains form (SimplifyKrepContains output) fires too") {
    differential("native contains",
      df => df.filter(df("text").contains(t(7))))
  }

  test("case-insensitive, case-sensitive-capitalized and whole-word recheck") {
    val cap = t(5).capitalize // sentence-capitalized occurrences exist
    differential("cs capitalized",
      _.filter(K.krep_contains(org.apache.spark.sql.functions.col("text"),
        KrepParams(Seq(cap)))))
    differential("ci capitalized",
      _.filter(K.krep_contains(org.apache.spark.sql.functions.col("text"),
        KrepParams(Seq(cap), caseSensitive = false))))
    differential("whole word",
      _.filter(K.krep_contains(org.apache.spark.sql.functions.col("text"),
        KrepParams(Seq(t(3)), wholeWord = true))))
  }

  test("multi-pattern OR fires when every pattern is token-internal") {
    differential("multi-pattern",
      _.filter(K.krep_contains(org.apache.spark.sql.functions.col("text"),
        KrepParams(Seq("plantedmarker0", "graftphrase1")))))
  }

  test("stand-down: algo override, regex, non-token pattern, unregistered relation") {
    import org.apache.spark.sql.functions.col
    IndexFilterRewrite.register(spark, indexRoot, minCorpusDocs = 0)
    try {
      // forced kernel: the --algo contract pins the scan kernel
      assert(!fired(engine.corpusDf.filter(
        K.krep_contains(col("text"), KrepParams(Seq("ver"), algo = "ac")))))
      // regex containment cannot be served by substring term expansion
      assert(!fired(engine.corpusDf.filter(
        K.krep_contains(col("text"),
          KrepParams(Seq("ver[0-9]+"), regex = true, overlapping = false)))))
      // a space crosses token boundaries — no single dict term can witness it
      assert(!fired(engine.corpusDf.filter(
        K.krep_contains(col("text"), s"${t(0)} ${t(1)}"))))
      // same filter over a NON-registered parquet relation of the same shape
      val outside = Files.createTempDirectory("graft-ifr-out-").toString
      engine.corpusDf.write.mode("overwrite").parquet(outside)
      assert(!fired(spark.read.parquet(outside)
        .filter(K.krep_contains(col("text"), "ver"))))
    } finally IndexFilterRewrite.deregister(indexRoot)
  }

  test("selectivity stand-down: hot pattern keeps the scan, rare one fires") {
    import org.apache.spark.sql.functions.col
    // default maxCandidateFrac: terms with df > N/8 are "hot" — the Zipf
    // rank-0 term is in nearly every doc, so its candidate set would be the
    // corpus and the semi join a pessimization; planted markers are ~1/97
    // of docs, squarely worth the index path
    IndexFilterRewrite.register(spark, indexRoot, minCorpusDocs = 0)
    try {
      val hot = engine.corpusDf.filter(K.krep_contains(col("text"), t(0)))
      assert(!fired(hot), "hot pattern should stand down under the default gate")
      // standing down is a plan choice, never an answer change
      IndexFilterRewrite.deregister(indexRoot)
      val want = engine.corpusDf.filter(K.krep_contains(col("text"), t(0))).count()
      IndexFilterRewrite.register(spark, indexRoot, minCorpusDocs = 0)
      assert(hot.count() == want)
      assert(fired(engine.corpusDf.filter(
        K.krep_contains(col("text"), "plantedmarker0"))),
        "rare pattern must still take the index path")
      // a rare pattern that is a SUBSTRING of a hot term inherits that
      // term's postings — the gate must catch it too
      val sub = t(0).substring(0, t(0).length - 1)
      assert(!fired(engine.corpusDf.filter(K.krep_contains(col("text"), sub))),
        "substring of a hot term should stand down")
      // hot AND rare conjunction: the hot conjunct is skipped, the rare one
      // still serves the whole filter from the index
      val mixed = engine.corpusDf.filter(
        K.krep_contains(col("text"), t(0)) &&
          K.krep_contains(col("text"), "plantedmarker0"))
      assert(fired(mixed),
        "a later selective conjunct must fire when the first is hot")
      IndexFilterRewrite.deregister(indexRoot)
      val wantMixed = engine.corpusDf.filter(
        K.krep_contains(col("text"), t(0)) &&
          K.krep_contains(col("text"), "plantedmarker0")).count()
      IndexFilterRewrite.register(spark, indexRoot, minCorpusDocs = 0)
      assert(mixed.count() == wantMixed)
    } finally IndexFilterRewrite.deregister(indexRoot)
  }

  test("two indexed conjuncts are BOTH served, one candidate join each") {
    import org.apache.spark.sql.functions.col
    IndexFilterRewrite.deregister(indexRoot)
    def pred(df: DataFrame) = df.filter(
      K.krep_contains(col("text"), "plantedmarker0") &&
        K.krep_contains(col("text"), "graftphrase0"))
    val want = pred(engine.corpusDf).select("docId")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(want.nonEmpty) // markers are planted together — real rows at stake
    try {
      IndexFilterRewrite.register(spark, indexRoot, minCorpusDocs = 0)
      val df = pred(engine.corpusDf)
      assert(semiJoins(df) == 2,
        "each qualifying conjunct gets exactly one candidate join")
      val got = df.select("docId").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want)
    } finally IndexFilterRewrite.deregister(indexRoot)
  }

  test("cost floor: a corpus below minCorpusDocs stands down entirely") {
    import org.apache.spark.sql.functions.col
    try {
      // default floor (100k docs) >> the 1500-doc fixture: registration is
      // a no-op and the filter keeps the plain scan — same answer
      IndexFilterRewrite.register(spark, indexRoot)
      val small = engine.corpusDf.filter(K.krep_contains(col("text"), "plantedmarker0"))
      assert(!fired(small), "below the floor the rewrite must stand down")
      IndexFilterRewrite.deregister(indexRoot)
      val want = engine.corpusDf
        .filter(K.krep_contains(col("text"), "plantedmarker0")).count()
      IndexFilterRewrite.register(spark, indexRoot)
      assert(small.count() == want, "standing down must not change the answer")
      // floor disabled → fires again (the plan-assert rows register this way)
      IndexFilterRewrite.register(spark, indexRoot, minCorpusDocs = 0)
      assert(fired(engine.corpusDf.filter(
        K.krep_contains(col("text"), "plantedmarker0"))))
    } finally IndexFilterRewrite.deregister(indexRoot)
  }

  test("rewrite survives projection above the filter and extra conjuncts") {
    import org.apache.spark.sql.functions.col
    differential("projection + conjunct",
      _.filter(K.krep_contains(col("text"), t(9)) && col("docId") % 2 === 0))
  }
}
