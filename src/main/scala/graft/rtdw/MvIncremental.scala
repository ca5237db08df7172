package graft.rtdw

import org.apache.spark.sql.SparkSession
import graft.core.{MvAgg, MvDef, MvRegistry}

/** Incrementally-maintained materialized view: the glue that makes
  * [[IncrementalDws]]'s change-feed fold SERVE
  * [[graft.core.MvRewriteRule]] rewrites — the full Doris rollup
  * story the reference implies (DWS aggregates maintained from the
  * retract stream, ADS queries answered from the rollup) on bare
  * parquet.
  *
  * One call folds the fact table's unapplied change batches into the
  * rollup (O(changes) + O(rollup), never O(fact)) and re-registers the
  * MV def against the NEW snapshot, so the next query over the fact
  * that matches the grain is transparently re-targeted at the fresh
  * rollup. At 100 TB the refresh cost is the delta fold and the serve
  * cost is a few-thousand-row MV scan — the fact is never re-read on
  * either path.
  *
  * Only sum/count measures are maintainable this way (retraction-
  * decomposable — IncrementalDws's contract); min/max need the full
  * rebuild path ([[graft.core.Mv.ensure]]). The MvDef is derived, not
  * caller-supplied, so the registered measures can never drift from
  * what the fold actually maintains: every `sumCol` is stored under
  * its own name and count(*) under `row_ct`.
  *
  * Re-registration is the freshness contract MvRegistry documents
  * ("after a refresh writes a new generation, re-register"): register
  * captures the manifest-resolved file list of the rollup's CURRENT
  * snapshot, so a query planned after refreshAndRegister reads the
  * post-fold rows, and one planned before it still reads the intact
  * previous snapshot (vacuum keeps it) — never a mix.
  */
object MvIncremental {

  /** Derived MV definition for a (factDir, dwsDir, dims, sumCols)
    * rollup — sourcePath is the fact's Upsert dir (the rule matches
    * any manifest-resolved file scan under it).
    */
  def mvDef(name: String, factDir: String, dwsDir: String,
            dims: Seq[String], sumCols: Seq[String]): MvDef =
    MvDef(name, factDir, s"$dwsDir/table", dims,
      sumCols.map(c => MvAgg("sum", c, c)) :+ MvAgg("count", "*", "row_ct"))

  /** Fold unapplied change batches into the rollup, then (re-)register
    * it for rewrite serving. Returns the applied change-batch id.
    */
  def refreshAndRegister(spark: SparkSession, name: String, factDir: String,
                         dwsDir: String, dims: Seq[String],
                         sumCols: Seq[String]): Long = {
    val applied = IncrementalDws.refresh(spark, factDir, dwsDir, dims, sumCols)
    val d = mvDef(name, factDir, dwsDir, dims, sumCols)
    if (IncrementalDws.current(spark, dwsDir).isDefined)
      MvRegistry.register(spark, d)
    applied
  }
}
