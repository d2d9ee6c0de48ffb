package graft.bench

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.krep.{KrepParams, functions => K}

/** Differential against the REFERENCE BINARY: `scripts/reference_diff.sh`
  * compiles krep from /root/reference (into /tmp — the reference tree is
  * read-only), runs it over generated corpora for a fixed case list, and
  * this main computes the same counts through the Spark expressions and
  * compares exactly.
  *
  * Case ids are shared with the script. Match-count (-co) cases compare
  * only where the reference's kernel choice is determined: its own test
  * corpus documents that BM counts overlapping while KMP/SSE count
  * non-overlapping (test_krep.c:457-476), so a match count is only a
  * "reference semantic" when the kernel is pinned. Case-sensitive literals
  * take the BM path (overlapping, = our default); the case-insensitive
  * kernel on AVX boxes advances past each match (non-overlapping, = our
  * `overlapping = false`); regex is POSIX non-overlapping. Line counts
  * (-c) are kernel-independent and compared for every mode. Our engine
  * exposes `overlapping` as an explicit parameter precisely so these
  * kernel-dependent answers become caller choices (SURVEY.md K1/K2).
  */
object ReferenceDiff {

  /** caseId -> KrepParams + which count (lines vs matches). */
  val cases: Seq[(String, KrepParams, Boolean)] = Seq(
    ("c_aa", KrepParams(Seq("aa")), true),
    ("c_ab", KrepParams(Seq("ab")), true),
    ("c_The", KrepParams(Seq("The")), true),
    ("c_zz", KrepParams(Seq("zz")), true),
    ("ci_aa", KrepParams(Seq("aa"), caseSensitive = false), true),
    ("ci_The", KrepParams(Seq("The"), caseSensitive = false), true),
    ("cw_aa", KrepParams(Seq("aa"), wholeWord = true), true),
    ("cw_The", KrepParams(Seq("The"), wholeWord = true), true),
    ("cm", KrepParams(Seq("aa", "ba")), true),
    ("cre1", KrepParams(Seq("a+b?"), regex = true, overlapping = false), true),
    ("cre2", KrepParams(Seq("[A-Z][a-z]+"), regex = true, overlapping = false), true),
    ("co_aa", KrepParams(Seq("aa")), false),
    ("co_ab", KrepParams(Seq("ab")), false),
    ("co_The", KrepParams(Seq("The")), false),
    ("cow_aa", KrepParams(Seq("aa"), wholeWord = true), false),
    ("coi_aa", KrepParams(Seq("aa"), caseSensitive = false,
      overlapping = false), false),
    ("com", KrepParams(Seq("aa", "ba")), false),
    ("core1", KrepParams(Seq("a+b?"), regex = true, overlapping = false), false),
    ("core2", KrepParams(Seq("[A-Z][a-z]+"), regex = true,
      overlapping = false), false),
    // anchors, zero-length matches, and the glibc trailing-newline empty
    // line — the semantics implemented from reading krep.c/glibc, here
    // checked against the binary itself
    ("c_anch1", KrepParams(Seq("^a"), regex = true, overlapping = false), true),
    ("c_anch2", KrepParams(Seq("b$"), regex = true, overlapping = false), true),
    ("c_empty", KrepParams(Seq("^$"), regex = true, overlapping = false), true),
    ("co_anch1", KrepParams(Seq("^a"), regex = true, overlapping = false), false),
    ("co_anch2", KrepParams(Seq("b$"), regex = true, overlapping = false), false),
    ("co_empty", KrepParams(Seq("^$"), regex = true, overlapping = false), false),
    ("co_star", KrepParams(Seq("xy*"), regex = true, overlapping = false), false),
    // literals with non-word bytes (punctuation fast paths)
    ("c_par", KrepParams(Seq("(aa)")), true),
    ("co_par", KrepParams(Seq("(aa)")), false),
    ("c_dot", KrepParams(Seq("the.")), true),
    ("co_dot", KrepParams(Seq("the.")), false),
    // -m NUM: caps matching LINES in count mode, matches in -o mode
    ("cm2", KrepParams(Seq("aa"), maxCount = 2), true),
    ("com2", KrepParams(Seq("aa"), maxCount = 2), false),
    // whole-word REGEX (-wE): the reference boundary-checks regex matches,
    // our engine wraps the pattern in word-byte lookarounds — must agree
    ("c_wre", KrepParams(Seq("[a-z]+"), regex = true, wholeWord = true,
      overlapping = false), true),
    ("co_wre", KrepParams(Seq("[a-z]+"), regex = true, wholeWord = true,
      overlapping = false), false),
    // 20-pattern file (-f): forces Aho-Corasick on both sides
    ("c_ac", KrepParams(acPatterns), true),
    ("co_ac", KrepParams(acPatterns), false))

  /** Shared verbatim with the PATFILE in scripts/reference_diff.sh. */
  def acPatterns: Seq[String] = Seq("aa", "ab", "ba", "The", "the", "cab",
    "ort", "wor", "xyz", "ann", "naan", "to", "hor", "ry", "at", "ea", "rn",
    "ab.c", "Aa", "b")

  /** only-matching cases: full sorted (line, match) sequences vs `krep -o`. */
  val oCases: Seq[(String, KrepParams)] = Seq(
    ("o_lit", KrepParams(Seq("aa"))),
    ("o_ci", KrepParams(Seq("The"), caseSensitive = false)),
    ("o_re", KrepParams(Seq("[A-Z][a-z]+"), regex = true, overlapping = false)),
    ("o_mp", KrepParams(Seq("aa", "ba"))),
    ("o_ac", KrepParams(acPatterns)))

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ReferenceDiff <inputsDir> <expectedTsv>")
    val (inputsDir, expectedTsv) = (args(0), args(1))
    val spark = SparkSession.builder()
      .appName("graft-reference-diff").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // expected: caseId \t fileName \t count
    val expected = Files.readAllLines(Paths.get(expectedTsv)).asScala
      .filter(_.nonEmpty).map { ln =>
        val Array(c, f, n) = ln.split("\t")
        ((c, f), n.toLong)
      }.toMap

    val files = Files.list(Paths.get(inputsDir)).iterator().asScala
      .filter(_.toString.endsWith(".txt")).toSeq.sortBy(_.getFileName.toString)
    val rows = files.map { p =>
      (p.getFileName.toString,
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    }
    val df = rows.toDF("file", "text")
    val sel = df.select(col("file") +: cases.map { case (id, params, lines) =>
      (if (lines) K.krep_count_lines(col("text"), params)
       else K.krep_count(col("text"), params)).as(id)
    }: _*)
    val got = sel.collect()

    var mismatches = 0
    got.foreach { r =>
      val file = r.getString(0)
      cases.zipWithIndex.foreach { case ((id, _, _), i) =>
        val ours = r.getLong(i + 1)
        expected.get((id, file)) match {
          case Some(ref) if ref != ours =>
            mismatches += 1
            println(s"MISMATCH $id $file ref=$ref spark=$ours")
          case None =>
            mismatches += 1
            println(s"MISSING-EXPECTED $id $file")
          case _ => ()
        }
      }
    }
    // only-matching: sorted "line:match" sequences vs the dumped -o output
    var oTotal = 0
    val omatchDir = Paths.get(inputsDir).resolveSibling("omatch")
    if (Files.isDirectory(omatchDir)) {
      rows.foreach { case (file, _) =>
        oCases.foreach { case (id, params) =>
          val expFile = omatchDir.resolve(s"${id}__$file")
          if (Files.exists(expFile)) {
            oTotal += 1
            val ref = Files.readAllLines(expFile).asScala.filter(_.nonEmpty).toSeq
            val ours = df.filter(col("file") === file)
              .select(K.krep_extract_lines(col("text"), params).as("x"))
              .selectExpr("explode(x) as e")
              .selectExpr("concat(e.ln, ':', e.m) as s")
              .collect().map(_.getString(0)).sorted.toSeq
            if (ours != ref) {
              mismatches += 1
              val d1 = ours.diff(ref).take(3)
              val d2 = ref.diff(ours).take(3)
              println(s"O-MISMATCH $id $file ours-only=$d1 ref-only=$d2")
            }
          }
        }
      }
    }
    val total = got.length * cases.size
    println(s"[reference-diff] $total count + $oTotal only-matching " +
      s"comparisons, $mismatches mismatches")
    spark.stop()
    if (mismatches > 0) sys.exit(1)
  }
}
