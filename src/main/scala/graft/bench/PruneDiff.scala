package graft.bench

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.krep.{functions => K}

/** Differential of the recursive-walk PRUNING semantics vs the reference
  * binary: `scripts/reference_prune_diff.sh` runs `krep -r --gitignore` over
  * a generated tree (builtin dir/extension skip lists + root AND nested
  * .gitignore files with negation, dir-only and fnmatch classes) and dumps
  * the file set it searched; this main reproduces the walk's keep/skip
  * decisions with the Spark expressions (krep_skip_dir / krep_skip_name /
  * gitignore_ignored) and compares the kept sets exactly.
  *
  * The reference checks, per entry (krep.c:3386-3416): builtin skip first,
  * then the gitignore chain (parent patterns first, current dir's last,
  * last match wins — krep.c:3272-3294); an ignored directory prunes its
  * whole subtree. The chain is reproduced here by concatenating ancestor
  * .gitignore lines root-first, which is order-equivalent.
  */
object PruneDiff {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: PruneDiff <treeDir> <refKeptFile>")
    val root = Paths.get(args(0)).toAbsolutePath.normalize
    val refKept = Files.readAllLines(Paths.get(args(1))).asScala
      .filter(_.nonEmpty).map(_.trim).toSet

    val spark = SparkSession.builder()
      .appName("graft-prune-diff").master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def gitignoreLines(dir: Path): Seq[String] = {
      val f = dir.resolve(".gitignore")
      if (Files.isRegularFile(f))
        new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
          .split("\n").toSeq.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      else Seq.empty
    }

    // walk directories top-down, pruning exactly like the reference: a
    // skipped/ignored directory's subtree is never visited
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    def visit(dir: Path, chain: Seq[String]): Unit = {
      val lines = chain ++ gitignoreLines(dir)
      val entries = Files.list(dir).iterator().asScala.toSeq.sortBy(_.getFileName.toString)
      val (dirs, files) = entries.partition(Files.isDirectory(_))
      // one expression instance per directory level (pattern lists are
      // per-expression literals), evaluated through Spark — files first
      // .gitignore files are themselves searched by the reference walk
      val fileNames = files.map(_.getFileName.toString)
      if (fileNames.nonEmpty) {
        val keptNames = fileNames.toDF("name")
          .filter(!K.krep_skip_name(col("name")) &&
            (if (lines.isEmpty) org.apache.spark.sql.functions.lit(true)
             else !K.gitignore_ignored(col("name"), lines, isDir = false)))
          .collect().map(_.getString(0)).toSet
        files.foreach { f =>
          if (keptNames.contains(f.getFileName.toString))
            kept += root.relativize(f).toString
        }
      }
      dirs.foreach { d =>
        val name = d.getFileName.toString
        val dirKept = Seq(name).toDF("name")
          .filter(!K.krep_skip_dir(col("name")) &&
            (if (lines.isEmpty) org.apache.spark.sql.functions.lit(true)
             else !K.gitignore_ignored(col("name"), lines, isDir = true)))
          .count() == 1
        if (dirKept) visit(d, lines)
      }
    }
    visit(root, Seq.empty)

    val ours = kept.toSet
    val extra = (ours -- refKept).toSeq.sorted
    val missing = (refKept -- ours).toSeq.sorted
    extra.foreach(p => println(s"OURS-ONLY $p"))
    missing.foreach(p => println(s"REF-ONLY $p"))
    println(s"[prune-diff] ref=${refKept.size} ours=${ours.size} " +
      s"extra=${extra.size} missing=${missing.size}")
    spark.stop()
    if (extra.nonEmpty || missing.nonEmpty) sys.exit(1)
  }
}
