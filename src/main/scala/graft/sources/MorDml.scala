package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.functions.{col, lit, when}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.MergeOnRead

/** SQL row-level DML (`MERGE INTO` / `UPDATE` / `DELETE`) over a
  * merge-on-read root — the delta-based `SupportsDelta` form, landed
  * as ONE O(batch) delta append (VERDICT r9 #3).
  *
  * Spark's own rewrites join target and source and hand this write only
  * the CHANGED rows; the target scan inside that plan is the relation
  * [[MorReadRule]] substitutes with the composed resolved read, so
  * matching runs against the table's actual content (base ∪ live
  * deltas, LWW-resolved). Executors stage the tagged rows as parquet
  * (same stack as [[UpsertDeltaWriterFactory]] — never a driver
  * collect); the driver's commit folds them into the next
  * `delta/batch=K` via [[graft.io.MergeOnRead.merge]] — the base is
  * NEVER rewritten, whatever the key distribution. A crash or abort
  * before the batch rename leaves only an invisible staging dir.
  *
  * Semantics are the LWW delta-log contract the API path has — SQL DML
  * is sugar over [[MergeOnRead.merge]], not a second write protocol:
  *  - UPDATE lands the updated row; unchanged `versionCol` still wins
  *    resolution (ties break to the newer batch), a raised version wins
  *    outright. A LOWERED version would lose resolution forever — a
  *    silently-ineffective write — so the writer REFUSES it at
  *    execution (ADVICE r10; API merges of losing rows remain legal:
  *    they are replay traffic, not statements claiming to change rows).
  *  - DELETE lands a retraction row carrying the matched row's OWN
  *    version (the row id includes `versionCol`, so the old version
  *    rides along without a second table scan) and the contract's
  *    delete flag; tables whose contract records no `deleteFlagCol`
  *    refuse at planning — a retraction is not expressible there.
  *  - MERGE insert/update/delete actions land the same way; a MERGE
  *    with delete actions on a no-delete-flag table refuses at commit,
  *    before any batch lands (the append is atomic).
  */
private[sources] class MorRowLevelOperation(table: MorTable,
                                            cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  if (cmd == RowLevelOperation.Command.DELETE && table.deleteFlagCol.isEmpty)
    throw new UnsupportedOperationException(
      s"DELETE on merge-on-read table ${table.dir}: the recorded contract " +
        "has no deleteFlagCol, so a retraction row is not expressible — " +
        "record the contract with a delete-flag column (or rebuild via compact)")

  override def command(): RowLevelOperation.Command = cmd

  /** Never executed: [[MorReadRule]] substitutes the row-level scan
    * relation during analysis, same as plain MOR reads. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new org.apache.spark.sql.connector.read.Scan {
      override def readSchema(): StructType = table.schema()
      override def toBatch: org.apache.spark.sql.connector.read.Batch =
        throw new UnsupportedOperationException(
          s"merge-on-read SQL DML needs the MorReadRule analyzer rule — " +
            "start the session with GraftExtensions (spark.sql.extensions=" +
            "graft.core.GraftExtensions)")
    }

  /** pk + versionCol: the version rides in the row id so a DELETE's
    * retraction row can carry the matched row's own version (ties break
    * to the newer batch, so the retraction wins resolution) without a
    * second scan of the table.
    */
  override def rowId(): Array[NamedReference] =
    (table.pk :+ table.versionCol).map(Expressions.column).toArray

  /** One delta row per update — a delete+insert pair in ONE batch would
    * tie on (version, batch) and resolve nondeterministically. */
  override def representUpdateAsDeleteAndInsert(): Boolean = false

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new MorDeltaWrite(table,
        if (info.schema().nonEmpty) info.schema()
        else info.rowIdSchema().orElse(StructType(Nil)))
    }
}

private[sources] class MorDeltaWrite(table: MorTable, rowSchema: StructType)
    extends DeltaWrite {
  override def toBatch: DeltaBatchWrite = new MorDeltaBatchWrite(table, rowSchema)
}

private[sources] class MorDeltaBatchWrite(table: MorTable, rowSchema: StructType)
    extends StagedDeltaBatchWrite(table.dir, rowSchema,
      // row id = pk + versionCol (deletes carry the superseded
      // version); the PK positions guard against re-keying, and the
      // version position against LOWERING (an UPDATE may raise or keep
      // the version — the LWW contract — but a lowered one would be a
      // silently-ineffective write, refused at execution; ADVICE r10)
      idCols = table.pk :+ table.versionCol,
      guardCount = table.pk.length, guardNames = table.pk,
      versionGuardIdx = table.pk.length) {

  /** One O(batch) delta append under the recorded LWW contract: delete
    * rows become retraction rows carrying the contract's delete flag;
    * a MERGE with delete actions on a no-delete-flag table refuses
    * BEFORE the append (the batch rename is the commit, so nothing
    * partial can land; staged rows are the changed set — O(changes)).
    */
  override protected def fold(spark: SparkSession,
                              staged: org.apache.spark.sql.DataFrame): Unit = {
    val op = col(UpsertDml.OpCol)
    val rows = table.deleteFlagCol match {
      case Some(f) =>
        val flagged =
          if (staged.columns.contains(f))
            staged.withColumn(f,
              when(op === "delete", lit("delete")).otherwise(col(f)))
          else staged.withColumn(f,
            when(op === "delete", lit("delete"))
              .otherwise(lit(null).cast(StringType)))
        flagged.drop(UpsertDml.OpCol)
      case None =>
        if (staged.filter(op === "delete").limit(1).count() > 0)
          throw new UnsupportedOperationException(
            s"MERGE INTO merge-on-read table ${table.dir} with DELETE " +
              "actions: the recorded contract has no deleteFlagCol, so " +
              "retraction rows are not expressible")
        staged.drop(UpsertDml.OpCol)
    }
    MergeOnRead.merge(spark, table.dir, rows)
    ()
  }
}
