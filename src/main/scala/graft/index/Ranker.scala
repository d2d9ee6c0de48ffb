package graft.index

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dense 0-based id assignment ordered by a key column, at scale.
  *
  * `row_number() OVER (ORDER BY key)` funnels everything through one
  * partition; instead: range-repartition on the key (the range partitioner
  * splits hot ranges and bounds partition sizes), sort within partitions,
  * then `zipWithIndex` (one lightweight count job + one map — no global
  * sort point, no driver materialization). Deterministic for a deterministic
  * input.
  */
object Ranker {
  def denseIdsByKey(df: DataFrame, key: String, idName: String,
      partitions: Int): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(math.max(partitions, 1), col(key))
      .sortWithinPartitions(key)
    val schema = StructType(sorted.schema.fields :+
      StructField(idName, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (row, id) =>
      Row.fromSeq(row.toSeq :+ id)
    }
    spark.createDataFrame(rdd, schema)
  }
}
