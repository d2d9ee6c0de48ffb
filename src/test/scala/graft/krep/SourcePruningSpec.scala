package graft.krep

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Mirrors the reference's directory-walk pruning assertions
  * (test/test_directory.c:134-240) plus gitignore pattern shapes
  * (krep.c:3180-3307).
  */
class SourcePruningSpec extends AnyFunSuite {

  import SourcePruning._

  test("binary gate: NUL in first 1024 bytes only; empty is not binary") {
    assert(!isBinary(Array.empty[Byte]))
    assert(!isBinary("plain text".getBytes))
    assert(isBinary(Array[Byte](65, 0, 66)))
    // NUL at byte 1023 (inside the window) vs 1024 (outside)
    val in = Array.fill[Byte](2048)('x'.toByte); in(1023) = 0
    assert(isBinary(in))
    val out = Array.fill[Byte](2048)('x'.toByte); out(1024) = 0
    assert(!isBinary(out))
  }

  test("directory skip: hidden dirs and the predefined list (test_directory.c)") {
    assert(shouldSkipDirectory(".git"))
    assert(shouldSkipDirectory("node_modules"))
    assert(shouldSkipDirectory(".hidden"))
    assert(shouldSkipDirectory("build") && shouldSkipDirectory("target"))
    assert(!shouldSkipDirectory("src"))
    // "." and ".." are in the reference's skip list itself (krep.h:239)
    assert(shouldSkipDirectory(".") && shouldSkipDirectory(".."))
  }

  test("extension skip: list is case-insensitive; .min. assets always skip") {
    assert(shouldSkipExtension("file3.log"))
    assert(shouldSkipExtension("image.JPG"))
    assert(shouldSkipExtension("minified.min.js"))
    assert(shouldSkipExtension("style.min.css"))
    assert(!shouldSkipExtension("file1.txt"))
    assert(!shouldSkipExtension("main.scala"))
    assert(!shouldSkipExtension("noext"))
    assert(!shouldSkipExtension(".hidden"))    // leading dot is not an extension
    assert(!shouldSkipExtension("trailing."))  // dot last char
    // reference order (krep.c:3093-3104): the trailing-dot guard runs BEFORE
    // the .min. check, so "x.min." is kept
    assert(!shouldSkipExtension("x.min."))
    assert(shouldSkipExtension(".min.js"))     // valid last-dot ext → .min. fires
  }

  test("gitignore parse: comments, blanks, negation, dir-only, anchors") {
    val pats = parseGitignore(Seq(
      "# comment", "", "  ", "*.log", "!keep.log", "build/", "/anchored.txt",
      "  spaced.txt\t", "!"))
    assert(pats.map(p => (p.glob, p.negated, p.dirOnly)) == Seq(
      ("*.log", false, false), ("keep.log", true, false),
      ("build", false, true), ("anchored.txt", false, false),
      ("spaced.txt", false, false)))
  }

  test("gitignore slash semantics: leading '/' strips (matches everywhere), internal '/' never matches") {
    // reference-pinned (krep.c gitignore_add_pattern + basename fnmatch,
    // differential: scripts/reference_prune_diff.sh slash cases): '/x' is
    // stripped to 'x' and ignores that basename at EVERY depth (unlike
    // git's root anchor); 'foo/bar' stays verbatim and can never match a
    // basename
    val pats = parseGitignore(Seq("/rooted.txt", "pair/inner.txt"))
    def ign(n: String, d: Boolean = false) = isIgnored(Seq(pats), n, d)
    assert(ign("rooted.txt"))
    assert(!ign("inner.txt"))
    assert(!ign("pair"))
  }

  test("gitignore match: last match wins, dir-only gating, fnmatch classes") {
    val pats = parseGitignore(Seq("*.log", "!keep*.log", "tmp?", "[abc]*.dat"))
    def ign(n: String, d: Boolean = false) = isIgnored(Seq(pats), n, d)
    assert(ign("error.log"))
    assert(!ign("keep1.log"))   // negation wins (later line)
    assert(ign("tmp1") && !ign("tmp12")) // ? is exactly one char
    assert(ign("a1.dat") && !ign("d1.dat"))
    assert(!ign("main.scala"))
    // dir-only pattern ignores dirs, not files of the same name
    val dironly = parseGitignore(Seq("build/"))
    assert(isIgnored(Seq(dironly), "build", isDir = true))
    assert(!isIgnored(Seq(dironly), "build", isDir = false))
  }

  test("gitignore parent chain: child patterns override parent") {
    val parent = parseGitignore(Seq("*.log"))
    val child = parseGitignore(Seq("!important.log"))
    assert(isIgnored(Seq(parent, child), "a.log", isDir = false))
    assert(!isIgnored(Seq(parent, child), "important.log", isDir = false))
    // and the reverse chain direction re-ignores
    val child2 = parseGitignore(Seq("important.log"))
    assert(isIgnored(Seq(parent, child2), "important.log", isDir = false))
  }

  test("expressions evaluate inside a Spark plan (codegen path)") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      ("a.log", "x"), ("keep.log", "x"), ("app.min.js", "x"),
      ("ok.txt", "x\u0000y"), ("main.scala", "plain")
    ).toDF("name", "content")
      .select($"name", encode($"content", "UTF-8").as("payload"))

    // extension pruning: every .log and .min.js name skips (gitignore
    // negation below is a different, later mechanism)
    val kept = df.filter(!functions.krep_skip_name($"name"))
      .select($"name").as[String].collect().toSet
    assert(kept == Set("ok.txt", "main.scala"))

    val binary = df.filter(functions.krep_is_binary($"payload"))
      .select($"name").as[String].collect().toSeq
    assert(binary == Seq("ok.txt"))

    val gitkept = df.filter(!functions.gitignore_ignored($"name",
      Seq("*.log", "!keep*.log"))).select($"name").as[String].collect().toSet
    assert(gitkept == Set("keep.log", "app.min.js", "ok.txt", "main.scala"))
  }

  test("fnmatch: degenerate and hostile character classes stay literal/safe") {
    // "[!]" has an empty member set -> '[' is literal, pattern "[!]" matches nothing fnmatch-y;
    // compiling must not throw
    val p1 = parseGitignore(Seq("[!]"))
    assert(!isIgnored(Seq(p1), "x", isDir = false))
    assert(isIgnored(Seq(p1), "[!]", isDir = false)) // literal match
    // regex metacharacters inside a class are members, not operators
    val p2 = parseGitignore(Seq("[a&&b]x"))
    assert(isIgnored(Seq(p2), "ax", isDir = false))
    assert(isIgnored(Seq(p2), "&x", isDir = false))
    assert(!isIgnored(Seq(p2), "cx", isDir = false))
    val p3 = parseGitignore(Seq("[a^]y"))
    assert(isIgnored(Seq(p3), "^y", isDir = false))
    assert(!isIgnored(Seq(p3), "by", isDir = false))
    // unclosed class is literal
    val p4 = parseGitignore(Seq("[abc"))
    assert(isIgnored(Seq(p4), "[abc", isDir = false))
    assert(!isIgnored(Seq(p4), "a", isDir = false))
    // POSIX: a ']' as the FIRST member is literal — "[]ab]" = class {], a, b}
    val p5 = parseGitignore(Seq("[]ab]x"))
    assert(isIgnored(Seq(p5), "]x", isDir = false))
    assert(isIgnored(Seq(p5), "ax", isDir = false))
    assert(!isIgnored(Seq(p5), "cx", isDir = false))
    // same with negation — "[!]a]" = anything but ']' or 'a'
    val p6 = parseGitignore(Seq("[!]a]x"))
    assert(isIgnored(Seq(p6), "bx", isDir = false))
    assert(!isIgnored(Seq(p6), "]x", isDir = false))
    assert(!isIgnored(Seq(p6), "ax", isDir = false))
    // a non-leading ']' closes the class; members may include a ']' literal
    val p7 = parseGitignore(Seq("[a]b"))
    assert(isIgnored(Seq(p7), "ab", isDir = false))
  }

  test("krep_skip_dir expression matches shouldSkipDirectory in a plan") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val names = Seq("src", ".git", "node_modules", "docs", ".cache", "lib",
      "build", "assets", ".", "..")
    val kept = names.toDF("dir")
      .filter(!functions.krep_skip_dir($"dir"))
      .as[String].collect().toSet
    assert(kept == names.filterNot(SourcePruning.shouldSkipDirectory).toSet)
    assert(kept == Set("src", "docs", "lib", "assets"))
  }
}
