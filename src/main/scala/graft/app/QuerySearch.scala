package graft.app

import org.apache.spark.sql.SparkSession

import graft.query.QueryEngine

/** BM25 top-k query entry point (spark-submit-able).
  *
  * {{{
  *   spark-submit --class graft.app.QuerySearch ... <indexRoot> <k> <query...>
  *   spark-submit --class graft.app.QuerySearch ... <indexRoot> <k> --phrase <exact phrase...>
  * }}}
  */
object QuerySearch {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: QuerySearch <indexRoot> <k> [--phrase] <query...>")
    val root = args(0)
    val k = args(1).toInt
    val phraseMode = args(2) == "--phrase"
    val query = args.drop(if (phraseMode) 3 else 2).mkString(" ")

    val spark = withDefaultMaster(SparkSession.builder()
      .appName("graft-query"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val engine = new QueryEngine(spark, root)
    val t0 = System.nanoTime()
    if (phraseMode) {
      val rows = engine.searchPhrase(query, k)
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"[query] PHRASE '$query' top-$k%d in $ms%.0f ms")
      rows.zipWithIndex.foreach { case (s, i) =>
        println(f"${i + 1}%3d  doc=${s.docId}%-10d score=${s.score}%.6f")
      }
    } else {
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
