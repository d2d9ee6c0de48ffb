package graft.index

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
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
  *
  * The id attach runs on INTERNAL rows (`queryExecution.toRdd` +
  * UnsafeProjection + [[GraftSqlBridge.internalCreateDataFrame]]): the
  * previous `.rdd`/`createDataFrame` pair materialized every field of every
  * row as external Java objects and re-encoded them — for the corpus step
  * that is the full multi-KB text payload, twice. Now each row is one
  * UnsafeProjection + buffer copy; the count job zipWithIndex runs reads the
  * reused rows without copying at all.
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
    val rdd = sorted.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
      val proj = UnsafeProjection.create(schema)
      val joined = new JoinedRow
      val idRow = new GenericInternalRow(1)
      it.map { case (row, id) =>
        idRow.update(0, id)
        proj(joined(row, idRow)).copy(): InternalRow
      }
    }
    GraftSqlBridge.internalCreateDataFrame(spark, rdd, schema)
  }
}
