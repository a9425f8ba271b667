package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** The one Spark-internal bridge a pre-DSv2 streaming source needs: a
  * `Source.getBatch` result must be an isStreaming-tagged DataFrame, and
  * the API that builds one (`SparkSession.internalCreateDataFrame(rdd,
  * schema, isStreaming = true)`) is `private[sql]` — this shim lives in a
  * subpackage of `org.apache.spark.sql` to reach it, the established
  * pattern of every out-of-tree V1 streaming connector. Nothing else in
  * the repo touches Spark internals.
  */
object StreamShim {

  /** Re-tag a batch DataFrame as a streaming one (same rows, same
    * schema): plan the batch query, lift its InternalRow RDD into a
    * LogicalRDD with isStreaming = true — exactly what FileStreamSource
    * does with its own per-batch file reads. */
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse, for a V1 `Sink.addBatch`: the micro-batch DataFrame a
    * sink receives is streaming-tagged and refuses batch writers; this
    * re-wraps its rows as an ordinary batch frame (what FileStreamSink
    * does internally before handing off to the file committer). */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
