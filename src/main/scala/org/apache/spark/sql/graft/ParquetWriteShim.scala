package org.apache.spark.sql.graft

import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Driver-side construction of Spark's OWN parquet output writer for
  * use inside a DSv2 `DataWriter` (the write half of
  * [[ParquetScanShim]] — the executor side of
  * [[graft.sources.UpsertBucketTable]]'s row-level DML).
  *
  * `FileFormat.prepareWrite` wires the exact writer stack
  * `df.write.parquet` uses (ParquetWriteSupport, compression,
  * spark-compatible logical types) and returns a SERIALIZABLE
  * factory designed to be shipped to executors — using it keeps DML
  * delta files byte-compatible with every other file the engine
  * writes; only the call site (a DeltaWriter instead of Spark's
  * FileFormatWriter) is new.
  */
object ParquetWriteShim {

  /** Serializable bundle: ship to executors, open one writer per task.
    * Rows passed to the writer must match `schema` exactly.
    */
  case class WriteSupport(factory: OutputWriterFactory,
                          conf: SerializableConfiguration,
                          schema: StructType) extends Serializable {
    def newWriter(path: String, partitionId: Int, taskId: Long): OutputWriter = {
      val attempt = new TaskAttemptID(
        new TaskID(new org.apache.hadoop.mapreduce.JobID("graft-dml", 0),
          TaskType.MAP, partitionId), (taskId % Int.MaxValue).toInt)
      factory.newInstance(path, schema, new TaskAttemptContextImpl(conf.value, attempt))
    }
  }

  def build(spark: SparkSession, schema: StructType): WriteSupport = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat().prepareWrite(spark, job, Map.empty, schema)
    WriteSupport(factory, new SerializableConfiguration(job.getConfiguration), schema)
  }
}
