package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Typed schema-evolution failure: the deliberate error a 100 TB
  * operator gets when a write attempts a schema change outside the
  * supported contract, instead of a late parquet read error or a
  * silently corrupted table. The message always names the offending
  * column and the supported alternative.
  */
class SchemaEvolutionException(message: String)
    extends IllegalArgumentException(message)

/** The table schema contract shared by [[Upsert]] and [[MergeOnRead]]:
  *
  *  - **Additive** evolution is automatic: a batch may carry columns
  *    the table predates (they widen the table; old files surface
  *    NULL) or omit columns the table has (an old-shape producer; its
  *    rows surface NULL for the newer columns).
  *  - **Type changes** are rejected loudly — parquet files already on
  *    disk hold the old physical type and cannot be reinterpreted.
  *  - **Renames** are rejected loudly, including case-only renames
  *    (Spark resolves names case-insensitively by default, so 'V' vs
  *    'v' would otherwise commit a manifest schema with two
  *    insensitive-equal names that no subsequent read can resolve).
  *    Parquet column access is name-based: without a column-mapping
  *    indirection a rename cannot remap already-written files, so the
  *    supported path is add-new + backfill + [[Upsert.dropColumns]].
  *  - **Drops** are explicit ([[Upsert.dropColumns]]) and metadata-only
  *    (no file rewrite); the dropped name is tombstoned because files
  *    written before the drop still hold its values — re-adding the
  *    name would silently resurrect them.
  */
object SchemaEvolution {

  /** Canonical form of a column name under the session's resolver:
    * identity when `spark.sql.caseSensitive=true`, lower-cased
    * otherwise (Spark's default analysis is case-insensitive, so the
    * new-vs-existing decision must be too — ADVICE r5).
    */
  def canon(spark: SparkSession, name: String): String =
    if (spark.sessionState.conf.caseSensitiveAnalysis) name
    else name.toLowerCase(java.util.Locale.ROOT)

  /** Validate `incoming` against `existing` under the additive-only
    * contract; throws [[SchemaEvolutionException]] on a type change, a
    * case-only rename, or the re-introduction of a tombstoned
    * (dropped) column. `dropped` holds canon() names.
    */
  def checkAdditive(spark: SparkSession, existing: StructType,
                    incoming: StructType, existingLabel: String,
                    incomingLabel: String,
                    dropped: Set[String] = Set.empty,
                    renamed: Map[String, String] = Map.empty): Unit =
    incoming.fields.foreach { f =>
      // a producer still writing a RENAMED-AWAY name must fail loudly:
      // treating it as a brand-new column would silently fork the data
      // the rename meant to keep in one place (r13 column mapping)
      renamed.get(canon(spark, f.name)).foreach(cur =>
        throw new SchemaEvolutionException(
          s"column '${f.name}' was renamed to '$cur' on $existingLabel; " +
            s"$incomingLabel still writes the old name — update the " +
            s"producer to '$cur' (re-introducing '${f.name}' as a new " +
            "column would fork the renamed data)"))
      existing.fields.find(tf => canon(spark, tf.name) == canon(spark, f.name)) match {
        case Some(tf) =>
          if (tf.name != f.name)
            throw new SchemaEvolutionException(
              s"schema evolution cannot rename column '${tf.name}' to '${f.name}' " +
                s"(case-only rename): the session resolves names case-insensitively, " +
                s"so both spellings name the same column — write it as '${tf.name}'")
          // catalogString ignores nullability at every nesting level —
          // parquet round-trips flip containsNull, which is not a change
          if (tf.dataType.catalogString != f.dataType.catalogString)
            throw new SchemaEvolutionException(
              s"schema evolution cannot change column '${f.name}': " +
                s"$existingLabel has ${tf.dataType.catalogString}, " +
                s"$incomingLabel has ${f.dataType.catalogString}")
        case None =>
          if (dropped.contains(canon(spark, f.name)))
            throw new SchemaEvolutionException(
              s"column '${f.name}' was dropped from this table; re-adding the name " +
                s"would resurrect stale values from files written before the drop — " +
                s"use a new column name, or rebuild the table via overwriteSnapshot")
      }
    }
}
