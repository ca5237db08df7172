package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for [[Upsert]] snapshots — the
  * `OPTIMIZE ZORDER BY` of the lakehouse world, built from codegen'd
  * integer arithmetic only (no UDF, no custom expression needed).
  *
  * Linear clustering ([[Upsert.overwriteSnapshot]]'s `clusterBy`) makes
  * [[Zones]] pruning tight on the LEADING column and useless on any
  * other; interleaving the bits of two dimension ranks makes every file
  * cover a small rectangle in (a, b) space, so a range predicate on
  * EITHER column prunes ~sqrt-fraction of files instead of none. At
  * 100 TB this is the difference between "time-travel queries are fast
  * but per-user queries scan the table" and both being file-pruned.
  *
  * Rank normalization uses equi-depth bucket boundaries from
  * `approxQuantile` (driver-side, 2^bits scalars — bounded, no extra
  * shuffle); bucketing is a `width_bucket` over the broadcast
  * boundaries; the Morton spread is the classic shift-or-mask cascade,
  * all plain built-in column ops inside whole-stage codegen.
  */
object Zorder {

  /** Spread the low 16 bits of `x` so they occupy even positions
    * (b15..b0 → bit 30,28,...,0) — the standard Morton cascade.
    */
  private def spread16(x: Column): Column = {
    val m1 = x.bitwiseAND(lit(0xFFFFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m4 = m3.bitwiseOR(shiftleft(m3, 2)).bitwiseAND(lit(0x33333333L))
    m4.bitwiseOR(shiftleft(m4, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Equi-depth bucket index (0 .. boundaries.length) of `c` via the
    * broadcast `boundaries` (sorted ascending): the count of boundaries
    * ≤ value. Nulls land in bucket 0 (they sort first and prune under
    * closed ranges anyway).
    */
  private def bucketIdx(c: Column, boundaries: Array[Double]): Column = {
    val arr = array(boundaries.toIndexedSeq.map(lit): _*)
    coalesce(
      size(filter(arr, b => b <= c.cast("double"))).cast("long"), lit(0L))
  }

  /** The interleaved z-value of `(a, b)` with `bits` of rank resolution
    * per dimension (default 8 → 256 equi-depth buckets each → 65536
    * z-cells, which addresses any realistic file count; the boundary
    * array is a codegen literal, so resolution is capped at 12 bits).
    * Both columns must be numeric (cast dates/timestamps to epoch
    * numbers first — `approxQuantile` is numeric-only).
    */
  def zvalue(df: DataFrame, a: String, b: String, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 12, "bits must be 1..12")
    val n = (1 << bits) - 1
    val qs = (1 to n).map(_.toDouble / (n + 1)).toArray
    val Seq(ba, bb) = Seq(a, b).map { c =>
      df.stat.approxQuantile(c, qs, 0.001).distinct.sorted
    }
    // A low-cardinality dimension yields far fewer than 2^bits distinct
    // boundaries (e.g. 11 discount values → 4-bit indexes), leaving its
    // HIGH bits constantly zero — the interleave then degenerates to
    // linear clustering on the other column (seen live: a discount band
    // pruned nothing). Left-align each index to the full width so both
    // dims contribute from the top bit down; uniform gaps below the
    // alignment shift cost nothing (no rows live between scaled ranks).
    def aligned(c: String, bnds: Array[Double]): Column = {
      val shift = bits - (32 - Integer.numberOfLeadingZeros(math.max(bnds.length, 1)))
      val idx = bucketIdx(col(c), bnds)
      if (shift > 0) shiftleft(idx, shift) else idx
    }
    spread16(aligned(a, ba))
      .bitwiseOR(shiftleft(spread16(aligned(b, bb)), 1))
  }

  /** Write `df` as a z-clustered [[Upsert]] snapshot: files carry
    * disjoint-ish z-ranges, zone sidecars cover BOTH dimensions (plus
    * any extra `zoneCols`), and the layout column itself is dropped
    * from the stored files (the `__` prefix contract).
    */
  def snapshot(spark: SparkSession, dir: String, df: DataFrame,
               a: String, b: String, filesTarget: Int,
               zoneCols: Seq[String] = Nil, bits: Int = 8): Unit = {
    val z = df.withColumn("__zorder", zvalue(df, a, b, bits))
    Upsert.overwriteSnapshot(spark, dir, z,
      zoneCols = (Seq(a, b) ++ zoneCols).distinct,
      clusterBy = Seq("__zorder"), filesTarget = filesTarget)
  }
}
