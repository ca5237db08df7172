package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Column-mapping layer (VERDICT r12 #2): stable PARQUET FIELD IDS as
  * the name→id indirection that makes `ALTER TABLE ... RENAME COLUMN`
  * a metadata-only commit — the Iceberg/Delta column-mapping shape,
  * carried natively by Spark's parquet reader/writer
  * (`spark.sql.parquet.fieldId.{write,read}.enabled`).
  *
  * Every staged [[Upsert]] generation stamps each data column with a
  * stable id (`parquet.field.id` in the StructField metadata — the key
  * Spark's parquet writer emits into the file footer). The manifest's
  * schema is serialized as StructType JSON (which preserves the
  * metadata; pre-r13 DDL manifests parse unchanged), so reads request
  * columns BY ID: after a rename, files written under the old name and
  * files written under the new one both resolve to the same column,
  * and `VERSION AS OF` serves every generation under the names that
  * generation's own manifest declares.
  *
  * Ids are assigned once (first appearance of a column, in field
  * order) and NEVER reused: `maxColumnId` rides the manifest so a
  * column added after a drop cannot inherit the dropped column's id
  * and silently resurrect its values from old files.
  */
object FieldIds {

  /** The metadata key Spark's parquet writer/reader honours. */
  val Key = "parquet.field.id"

  def idOf(f: StructField): Option[Long] =
    if (f.metadata.contains(Key)) Some(f.metadata.getLong(Key)) else None

  def withId(f: StructField, id: Long): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong(Key, id).build())

  def hasIds(st: StructType): Boolean =
    st.fields.nonEmpty && st.fields.forall(_.metadata.contains(Key))

  /** Strip the id metadata — the requested-schema form for tables (or
    * generations) whose files predate stamping: Spark refuses an
    * id-carrying read schema against an id-less file, so the gate in
    * [[Upsert.readSchemaOf]] falls back to plain name matching.
    */
  def stripIds(st: StructType): StructType =
    StructType(st.fields.map { f =>
      if (!f.metadata.contains(Key)) f
      else {
        val mb = new MetadataBuilder().withMetadata(f.metadata)
        f.copy(metadata = mb.remove(Key).build())
      }
    })

  /** DataFrame form of [[stripIds]] — a no-op (no projection at all)
    * when no column carries the id metadata. Change-feed batches go
    * through this on BOTH sides (append and read): feed dirs are plain
    * name-consumed parquet, and one id-stamped frame leaking into them
    * would mix stamped and unstamped files under a single feed —
    * Spark refuses any read whose inferred schema carries ids but
    * meets an id-less file (VERDICT r13 #2).
    */
  def stripIds(df: DataFrame): DataFrame =
    if (!df.schema.fields.exists(_.metadata.contains(Key))) df
    else df.select(df.schema.fields.toIndexedSeq.map { f =>
      if (!f.metadata.contains(Key)) col(f.name)
      else col(f.name).as(f.name,
        new MetadataBuilder().withMetadata(f.metadata).remove(Key).build())
    }: _*)

  def maxId(st: StructType): Long =
    st.fields.flatMap(idOf).foldLeft(0L)(math.max)

  /** Assign ids to `schema`: a field canon-matching a `prev` field
    * inherits its id; new fields get fresh ids above both `prev`'s max
    * and `prevMaxId` (the manifest's never-reuse high-water mark).
    */
  def stampSchema(spark: SparkSession, prev: Option[StructType],
                  prevMaxId: Long, schema: StructType): StructType = {
    def canon(n: String) = SchemaEvolution.canon(spark, n)
    val byCanon: Map[String, StructField] =
      prev.map(_.fields.map(f => canon(f.name) -> f).toMap).getOrElse(Map.empty)
    var next = math.max(prevMaxId, prev.map(maxId).getOrElse(0L))
    StructType(schema.fields.map { f =>
      byCanon.get(canon(f.name)).flatMap(idOf) match {
        case Some(id) => withId(f, id)
        case None => next += 1; withId(f, next)
      }
    })
  }

  /** Stamp a DataFrame's data columns (layout pseudo-columns like
    * `__bucket`/`__cv` ride through unstamped — they are written as
    * partition directories, never parquet payload). Returns the
    * re-projected frame and the new high-water id. The projection is
    * column-for-column aliasing: row order and partitioning are
    * untouched (load-bearing for the pre-arranged compaction writes).
    */
  def stamp(spark: SparkSession, prev: Option[StructType], prevMaxId: Long,
            df: DataFrame, layoutCols: Set[String]): (DataFrame, Long) = {
    val dataFields = StructType(
      df.schema.fields.filterNot(f => layoutCols.contains(f.name)))
    val stamped = stampSchema(spark, prev, prevMaxId, dataFields)
    val byName = stamped.fields.map(f => f.name -> f.metadata).toMap
    val cols: Seq[Column] = df.schema.fields.toIndexedSeq.map { f =>
      byName.get(f.name) match {
        case Some(md) => col(f.name).as(f.name, md)
        case None => col(f.name)
      }
    }
    (df.select(cols: _*), math.max(prevMaxId, maxId(stamped)))
  }

  /** Serialize a manifest/contract schema preserving the id metadata.
    * JSON is single-line and round-trips metadata; [[parse]] accepts
    * both this form and the legacy DDL form.
    */
  def serialize(st: StructType): String = st.json

  def parse(s: String): StructType =
    if (s.startsWith("{"))
      org.apache.spark.sql.types.DataType.fromJson(s).asInstanceOf[StructType]
    else StructType.fromDDL(s)

  def idReadEnabled(spark: SparkSession): Boolean =
    spark.conf.get("spark.sql.parquet.fieldId.read.enabled", "false").toBoolean

  /** Metadata-free view for equality checks: schema comparisons (e.g.
    * additive-evolution validation) must not treat an id difference as
    * a type change.
    */
  def bare(st: StructType): StructType =
    StructType(stripIds(st).fields.map(_.copy(metadata = Metadata.empty)))
}
