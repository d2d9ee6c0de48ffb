package graft

import org.apache.spark.sql.SparkSession

package object app {
  /** spark-submit injects spark.master; standalone runs (sbt runMain, tests)
    * fall back to GRAFT_MASTER or local[*].
    */
  def withDefaultMaster(b: SparkSession.Builder): SparkSession.Builder =
    if (sys.props.contains("spark.master")) b
    else b.master(sys.env.getOrElse("GRAFT_MASTER", "local[*]"))
}
