package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** DwdBaseLog — the 5-way behavior-log split (SURVEY.md §2.6).
  *
  * Reference: DwdBaseLog.splitLog (DwdBaseLog.java:82-135): one parsed
  * log stream side-outputs start/err/display/action and main-outputs
  * page. Spark shape: parse ONCE, then five filtered projections over
  * the same parsed DataFrame — Catalyst shares the scan+parse when
  * written from one foreachBatch (or runs five queries over one
  * source). `explode` replaces the per-element loops.
  *
  * Intentional divergence from the reference (SURVEY §7.4): the
  * reference's action split emits the WHOLE actions array once per
  * element (DwdBaseLog.java:122, an evident bug); we emit per element.
  *
  * Pure DataFrame→DataFrames transform: identical in batch and
  * streaming (the spec pins semantics in batch; a streaming run wires
  * the same functions behind readStream/foreachBatch).
  */
object LogSplit {

  /** Parse raw JSON lines + P1-style validity filter.
    * Reference filter (DwdBaseLog.etl:225-246): page or start present,
    * mid and ts non-null.
    */
  def parse(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value"), Schemas.behaviorLog).as("log"))
      .select("log.*")
      .filter(col("common.mid").isNotNull && col("ts").isNotNull &&
        (col("page").isNotNull || col("start").isNotNull))

  private def base(parsed: DataFrame) =
    parsed.select(col("common.*"), col("page"), col("start"), col("err"),
      col("displays"), col("actions"), col("ts"))

  /** start stream: one row per app-launch log. */
  def startDf(parsed: DataFrame): DataFrame =
    base(parsed).filter(col("start").isNotNull)
      .select(col("mid"), col("uid"), col("vc"), col("ch"), col("ar"),
        col("is_new"), col("start.entry"), col("start.loading_time"), col("ts"))

  /** err stream: any log carrying an err struct. */
  def errDf(parsed: DataFrame): DataFrame =
    base(parsed).filter(col("err").isNotNull)
      .select(col("mid"), col("uid"), col("err.error_code"), col("err.msg"), col("ts"))

  /** page stream (the main output). */
  def pageDf(parsed: DataFrame): DataFrame =
    base(parsed).filter(col("page").isNotNull)
      .select(col("mid"), col("uid"), col("vc"), col("ch"), col("ar"), col("is_new"),
        col("page.page_id"), col("page.last_page_id"), col("page.item"),
        col("page.item_type"), col("page.during_time"), col("ts"))

  /** display stream: exploded displays enriched with common+page+ts. */
  def displayDf(parsed: DataFrame): DataFrame =
    base(parsed).filter(col("page").isNotNull && col("displays").isNotNull)
      .select(col("mid"), col("uid"), col("page.page_id"), col("ts"),
        explode(col("displays")).as("d"))
      .select(col("mid"), col("uid"), col("page_id"), col("ts"),
        col("d.item"), col("d.item_type"), col("d.pos_id"))

  /** action stream: exploded actions (per element — reference bug fixed). */
  def actionDf(parsed: DataFrame): DataFrame =
    base(parsed).filter(col("page").isNotNull && col("actions").isNotNull)
      .select(col("mid"), col("uid"), col("page.page_id"),
        explode(col("actions")).as("a"))
      .select(col("mid"), col("uid"), col("page_id"),
        col("a.action_id"), col("a.item"), col("a.ts"))

  /** All five splits keyed by sink name (the reference's topic names). */
  def splitAll(parsed: DataFrame): Map[String, DataFrame] = Map(
    "dwd_traffic_start" -> startDf(parsed),
    "dwd_traffic_err" -> errDf(parsed),
    "dwd_traffic_page" -> pageDf(parsed),
    "dwd_traffic_display" -> displayDf(parsed),
    "dwd_traffic_action" -> actionDf(parsed))
}
