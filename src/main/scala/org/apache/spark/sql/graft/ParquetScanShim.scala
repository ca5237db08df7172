package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Driver-side construction of Spark's OWN parquet record reader for
  * use inside a DSv2 `PartitionReaderFactory` (the reader behind
  * [[graft.sources.UpsertBucketSource]]).
  *
  * `FileFormat.buildReaderWithPartitionValues` is `private[sql]` in
  * Spark 4, so the call lives in this org.apache.spark.sql subpackage
  * (the same sanctioned pattern as [[Bridge]]). Using the built-in
  * reader — rather than hand-rolling parquet-mr plumbing — keeps the
  * vectorized path, predicate pushdown, partition-value appending, and
  * task-completion resource cleanup identical to a native file scan;
  * the returned closure is exactly what Spark serializes into its own
  * FileScanRDD, so shipping it inside a reader factory is safe by
  * construction.
  */
object ParquetScanShim {

  /** A serializable parquet read closure plus whether it yields
    * `ColumnarBatch`es (when the result schema supports the vectorized
    * batch path) or `InternalRow`s.
    */
  case class ReadSupport(read: PartitionedFile => Iterator[InternalRow],
                         columnar: Boolean) extends Serializable

  /** Build the reader on the driver. Output rows carry `requiredSchema`
    * columns followed by `partitionSchema` columns (filled from each
    * [[PartitionedFile]]'s `partitionValues`).
    */
  def build(spark: SparkSession,
            dataSchema: StructType,
            partitionSchema: StructType,
            requiredSchema: StructType,
            filters: Seq[Filter],
            hadoopConf: Configuration): ReadSupport = {
    val fmt = new ParquetFileFormat
    val resultSchema = StructType(requiredSchema.fields ++ partitionSchema.fields)
    // the format demands an explicit contract for whether the caller
    // can consume ColumnarBatch; mirror its own supportBatch decision
    val columnar = fmt.supportBatch(spark, resultSchema)
    val read = fmt.buildReaderWithPartitionValues(
      spark, dataSchema, partitionSchema, requiredSchema, filters,
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> columnar.toString),
      hadoopConf)
    ReadSupport(read, columnar)
  }

  /** A whole-file read task. */
  def partitionedFile(partitionValues: InternalRow, path: String,
                      length: Long): PartitionedFile =
    PartitionedFile(partitionValues, SparkPath.fromPathString(path), 0L, length,
      fileSize = length)

  /** A byte-range read task: the parquet reader takes exactly the row
    * groups whose midpoint falls in [start, start+length), so the
    * union of a file's ranges reads the file once.
    */
  def partitionedFile(partitionValues: InternalRow, path: String,
                      start: Long, length: Long, fileSize: Long): PartitionedFile =
    PartitionedFile(partitionValues, SparkPath.fromPathString(path), start, length,
      fileSize = fileSize)

  /** A FRESH session-aware Configuration for ONE scan build.
    * `buildReaderWithPartitionValues` MUTATES the conf it is given
    * (read schema, parquet filter predicate) before snapshotting it
    * into its broadcast — so two scans in one query sharing
    * `sparkContext.hadoopConfiguration` poison each other: the second
    * build's schema/predicate can ride into the first scan's tasks,
    * and a predicate naming a column the other table lacks prunes
    * every row group (a two-bucket-table join silently returned ZERO
    * rows). Spark's own FileSourceScanExec clones per scan
    * (`sessionState.newHadoopConf()`); so do we.
    */
  def hadoopConf(spark: SparkSession): Configuration =
    spark.sessionState.newHadoopConf()
}
