package graft.app

import org.apache.spark.sql.SparkSession

import graft.query.QueryEngine

/** BM25 top-k query entry point (spark-submit-able) — all five query modes.
  *
  * {{{
  *   spark-submit --class graft.app.QuerySearch ... <indexRoot> <k> <terms...>
  *   spark-submit --class graft.app.QuerySearch ... <indexRoot> <k> --phrase <exact phrase...>
  *   spark-submit --class graft.app.QuerySearch ... <indexRoot> <k> --multi <pattern> [pattern...]
  *   spark-submit --class graft.app.QuerySearch ... <indexRoot> <k> --regex <regex>
  *   spark-submit --class graft.app.QuerySearch ... <indexRoot> <k> --and <terms...> [--not <terms...>]
  * }}}
  */
object QuerySearch {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: QuerySearch <indexRoot> <k> [--phrase|--multi|--regex|--and] <query...>")
    val root = args(0)
    val k = args(1).toInt
    val mode = args(2) match {
      case m @ ("--phrase" | "--multi" | "--regex" | "--and") => m
      case _ => "terms"
    }
    val restAll = args.drop(if (mode == "terms") 2 else 3)
    // `--and a b --not c d`: everything after --not is the exclusion set
    val (rest, notRest) = restAll.span(_ != "--not")
    val exclude = notRest.drop(1).mkString(" ")
    val query = rest.mkString(" ")

    val spark = withDefaultMaster(SparkSession.builder()
      .appName("graft-query"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val engine = new QueryEngine(spark, root)
    val t0 = System.nanoTime()
    def dump(tag: String, rows: Array[graft.query.ScoredDoc]): Unit = {
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"[query] $tag '$query' top-$k%d in $ms%.0f ms")
      rows.zipWithIndex.foreach { case (s, i) =>
        println(f"${i + 1}%3d  doc=${s.docId}%-10d score=${s.score}%.6f")
      }
    }
    mode match {
      case "--phrase" => dump("PHRASE", engine.searchPhrase(query, k))
      case "--multi" => dump("MULTI", engine.searchMultiPattern(rest.toSeq, k))
      case "--regex" => dump("REGEX", engine.searchRegex(query, k))
      case "--and" =>
        val tag = if (exclude.isEmpty) "AND" else s"AND-NOT($exclude)"
        dump(tag, engine.searchConjunctive(query, k, exclude))
      case _ =>
        val rows = engine.searchDf(query, k).collect()
        val ms = (System.nanoTime() - t0) / 1e6
        println(f"[query] '$query' top-$k%d in $ms%.0f ms")
        rows.foreach { r =>
          println(f"${r.getInt(0)}%3d  doc=${r.getLong(1)}%-10d score=${r.getDouble(3)}%.6f  ${r.getString(2)}")
        }
    }
    spark.stop()
  }
}
