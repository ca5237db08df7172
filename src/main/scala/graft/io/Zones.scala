package graft.io

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-file min/max zone maps for [[Upsert]] buckets — file-level data
  * skipping for RANGE predicates, completing the skipping stack next to
  * the [[Blooms]] point skip (bucket prune → zone/bloom file prune →
  * parquet row-group stats inside the files that ARE opened).
  *
  * Why not rely on parquet footers alone: at 100 TB a table holds
  * hundreds of thousands of files, and footer-based skipping still
  * opens every footer (one round trip per file on object storage).
  * Zone sidecars ride the manifest — the driver prunes the FILE LIST
  * before any task launches, the same role Delta/Iceberg column stats
  * play in their manifests. Each bucket directory carries a
  * `_zones.tsv` sidecar (underscore prefix: invisible to parquet
  * readers; commits with the bucket's atomic manifest flip) mapping
  * every data file to min/max of the table's declared zone columns.
  *
  * Values are normalized to three totally-ordered kinds so the driver
  * compare cannot diverge from Spark's: integral/date/timestamp → long
  * (epoch day / epoch micros), float/double → double, string → raw,
  * compared BYTEWISE in UTF-8 — Spark's UTF8String (code-point) order,
  * which Java's UTF-16 `String.compareTo` does NOT match for
  * supplementary characters. Decimals are deliberately unsupported: a
  * double rounding could pull a min up or a max down and wrongly prune
  * a file; unsupported types simply never prune (no false negatives).
  */
object Zones {

  /** The original 4-field sidecar (`file\tcol\tmin\tmax`) — still
    * WRITTEN alongside the v2 form so a reader of the previous format
    * keeps pruning, and still read when v2 is absent (older tables).
    */
  val SidecarName = "_zones.tsv"

  /** The extended 6-field sidecar (adds per-file non-null counts and
    * exact integral sums for the aggregate pushdown). A separate FILE,
    * not extra fields in the old one: the old parser split each line
    * with limit 4, so appended fields would glue onto the max value
    * and CRASH an old reader mid-scan — a new name means an old reader
    * simply sees no v2 sidecar and degrades to the v1 file (pruning
    * intact, pushdown refused), never a parse error.
    */
  val SidecarNameV2 = "_zones2.tsv"

  /** The 7-field sidecar (adds the per-file HLL ndv estimate feeding
    * the CBO's distinctCount). Same rollout discipline as v1→v2
    * (ADVICE r10): a NEW filename, because a v2 reader splits with
    * limit 6 and a 7th field appended under the v2 name would fuse
    * `sum\tndv` into one token and crash its BigInt parse mid-plan on
    * shared storage during a mixed-version rollout. A v2-era reader
    * sees no v3 file and keeps its full pruning + pushdown; only the
    * ndv stat (a planner hint) is invisible to it.
    */
  val SidecarNameV3 = "_zones3.tsv"

  sealed trait ZVal
  final case class ZLong(v: Long) extends ZVal
  final case class ZDouble(v: Double) extends ZVal
  final case class ZStr(v: String) extends ZVal

  def cmp(a: ZVal, b: ZVal): Int = (a, b) match {
    case (ZLong(x), ZLong(y)) => java.lang.Long.compare(x, y)
    case (ZDouble(x), ZDouble(y)) => java.lang.Double.compare(x, y)
    case (ZStr(x), ZStr(y)) => utf8Cmp(x, y)
    case _ => throw new IllegalArgumentException(s"zone kind mismatch: $a vs $b")
  }

  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }

  /** min/max of one file's column; (None, None) = the file holds ONLY
    * nulls for it (a closed-range predicate can always prune such a
    * file — `BETWEEN` never matches null).
    *
    * `nonNull` / `sum` extend the sidecar for the metadata-only
    * aggregate pushdown: `nonNull` is the file's exact non-null count
    * of the column (count(col) = Σ nonNull with zero tasks), and `sum`
    * the exact integer sum of its non-null values for INTEGRAL columns
    * only (floats are excluded on purpose — a driver-side refold of
    * per-file double sums is order-sensitive and could diverge from a
    * scan's answer in the last ulp, and "exact or refuse" is the
    * pushdown's contract). `sum` is None when the file has no non-null
    * values or the column is non-integral; both fields are None on
    * sidecars written before this format (readers refuse the pushdown
    * and scan — never a wrong answer).
    */
  final case class ColZone(min: Option[ZVal], max: Option[ZVal],
                           nonNull: Option[Long] = None,
                           sum: Option[BigInt] = None,
                           ndv: Option[Long] = None)

  /** Integral column types whose per-file sums the sidecar records —
    * the exact-refold set (fold in BigInt, overflow impossible).
    */
  def sumSupported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** The canonical sortable projection for a stat column, or None when
    * the type has no zone support (such files are never pruned on that
    * column).
    */
  def statExpr(c: String, dt: DataType): Option[Column] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some(col(c).cast("long"))
    case DateType => Some(datediff(col(c), to_date(lit("1970-01-01"))).cast("long"))
    case TimestampType => Some(unix_micros(col(c)))
    case FloatType | DoubleType => Some(col(c).cast("double"))
    case StringType => Some(col(c))
    case _ => None
  }

  def supported(dt: DataType): Boolean = statExpr("x", dt).isDefined

  /** A caller-side range bound in the zone encoding of column type
    * `dt`. Accepts the natural external types for each column type.
    */
  def toZ(dt: DataType, v: Any): ZVal = (dt, v) match {
    case (ByteType | ShortType | IntegerType | LongType, n: Number) => ZLong(n.longValue())
    case (DateType, d: java.sql.Date) => ZLong(d.toLocalDate.toEpochDay)
    case (DateType, d: java.time.LocalDate) => ZLong(d.toEpochDay)
    case (DateType, s: String) => ZLong(java.time.LocalDate.parse(s).toEpochDay)
    case (TimestampType, t: java.sql.Timestamp) =>
      ZLong(Math.addExact(Math.multiplyExact(t.getTime / 1000, 1000000L),
        (t.getNanos / 1000).toLong))
    case (TimestampType, t: java.time.Instant) =>
      ZLong(Math.addExact(Math.multiplyExact(t.getEpochSecond, 1000000L),
        (t.getNano / 1000).toLong))
    case (FloatType | DoubleType, n: Number) => ZDouble(n.doubleValue())
    case (StringType, s: String) => ZStr(s)
    case _ => throw new IllegalArgumentException(
      s"unsupported zone bound ${v.getClass.getName} for column type ${dt.sql}")
  }

  /** The Catalyst-internal value a normalized [[ZVal]] denotes for a
    * column of type `dt` — the exact inverse of [[statExpr]]'s
    * projection (dates back to epoch-day ints, timestamps to micros,
    * floats re-narrowed losslessly, strings to UTF8String). Feeds the
    * metadata-only MIN/MAX aggregate answers.
    */
  def toCatalyst(dt: DataType, z: ZVal): Any = (dt, z) match {
    case (ByteType, ZLong(v)) => v.toByte
    case (ShortType, ZLong(v)) => v.toShort
    case (IntegerType, ZLong(v)) => v.toInt
    case (LongType, ZLong(v)) => v
    case (DateType, ZLong(v)) => v.toInt // epoch days
    case (TimestampType, ZLong(v)) => v // epoch micros
    case (FloatType, ZDouble(v)) => v.toFloat // double widening is lossless
    case (DoubleType, ZDouble(v)) => v
    case (StringType, ZStr(v)) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(v)
    case _ => throw new IllegalArgumentException(
      s"no zone-to-Catalyst mapping for ${dt.sql} / $z")
  }

  /** May a file with zone `z` contain a row matching the closed range
    * `[lo, hi]` (None = unbounded)? No false negatives: missing stats
    * never reach here (callers keep statless files).
    */
  def overlaps(z: ColZone, lo: Option[ZVal], hi: Option[ZVal]): Boolean =
    (z.min, z.max) match {
      case (Some(mn), Some(mx)) =>
        lo.forall(l => cmp(mx, l) >= 0) && hi.forall(h => cmp(mn, h) <= 0)
      case _ => false // all-null: a range predicate drops nulls
    }

  private def zOf(v: Any): ZVal = v match {
    case l: java.lang.Long => ZLong(l)
    case d: java.lang.Double => ZDouble(d)
    case s: String => ZStr(s)
    case other => throw new IllegalStateException(
      s"unexpected zone stat value ${other.getClass.getName}")
  }

  /** Distributed per-(bucket, file) min/max over the supported subset
    * of `statCols` — ONE pass over the staged generation (mirrors
    * [[Upsert.buildBlooms]]); only files × 1 rows reach the driver.
    * `stagedDir` must be a `partitionBy(__bucket)` layout.
    */
  /** Per-column stat aggregates for one pass. String columns ALSO
    * collect min/max of the RAW bytes (`cast binary` — same unsigned
    * lexicographic order as UTF8String): a value that is not valid
    * UTF-8 survives parquet/Spark intact but turns into replacement
    * characters on the driver-side String conversion, and a sidecar
    * built from the lossy form would be a wrong EXACT answer for the
    * metadata min/max pushdown. [[decodeZones]] compares the two and
    * simply omits the column entry for any file where they differ —
    * such files always scan (pruning) and refuse the pushdown.
    */
  private def statAggs(sup: Seq[(String, DataType, Column)]): Seq[Column] =
    sup.flatMap { case (c, dt, e) =>
      Seq(min(e).as(s"__mn_$c"), max(e).as(s"__mx_$c"),
        count(col(c)).as(s"__nn_$c"),
        // per-file APPROX distinct (HLL++, Spark's own ANALYZE
        // estimator): folded table-wide as min(nonNull, Σ ndv) — an
        // ESTIMATE for the CBO's distinctCount, clearly not part of
        // the exactness-or-refusal answer contract (stats are planner
        // hints; Spark's catalog ndv is the same HLL approximation)
        approx_count_distinct(col(c)).as(s"__nd_$c")) ++
        (if (dt == StringType)
          Seq(min(col(c).cast("binary")).as(s"__bn_$c"),
            max(col(c).cast("binary")).as(s"__bx_$c"))
        else Nil) ++
        // decimal(38,0) so a per-file fold can never overflow (2^63 max
        // value × any real file's row count stays far under 10^38)
        (if (sumSupported(dt))
          Seq(sum(col(c).cast("decimal(38,0)")).as(s"__sm_$c"))
        else Nil)
    }

  private def decodeZones(r: org.apache.spark.sql.Row,
                          sup: Seq[(String, DataType, Column)]): Map[String, ColZone] =
    sup.flatMap { case (c, dt, _) =>
      val mn = Option(r.getAs[Any](s"__mn_$c")).map(zOf)
      val mx = Option(r.getAs[Any](s"__mx_$c")).map(zOf)
      def bytesEq(s: Option[ZVal], b: Option[Array[Byte]]): Boolean = (s, b) match {
        case (Some(ZStr(x)), Some(bb)) =>
          java.util.Arrays.equals(x.getBytes(StandardCharsets.UTF_8), bb)
        case (None, None) => true
        case _ => false
      }
      val lossless = dt != StringType ||
        (bytesEq(mn, Option(r.getAs[Array[Byte]](s"__bn_$c"))) &&
          bytesEq(mx, Option(r.getAs[Array[Byte]](s"__bx_$c"))))
      val nn = r.getAs[Long](s"__nn_$c")
      val sm =
        if (!sumSupported(dt)) None
        else Option(r.getAs[java.math.BigDecimal](s"__sm_$c"))
          .map(bd => BigInt(bd.toBigInteger))
      val nd = Option(r.getAs[Long](s"__nd_$c"))
      if (lossless) Some(c -> ColZone(mn, mx, Some(nn), sm, nd)) else None
    }.toMap

  /** Per-file zone stats over a staged generation dir, keyed by each
    * file's PARENT-DIR path under the generation (`__bucket=B`, or
    * `__bucket=B/__cv=H` for value-clustered layouts) — one sidecar is
    * written per parent dir, and readers resolve a file's sidecar from
    * its parent ([[graft.sources.ZoneSweep]]), so the keying must be
    * the dir, not the bucket: a task writing several `__cv` subdirs
    * reuses ONE part-file name across them, and bucket-keyed maps
    * would silently collapse those entries into one.
    */
  def build(spark: SparkSession, stagedDir: String,
            statCols: Seq[(String, DataType)]):
      Map[String, Map[String, Map[String, ColZone]]] = {
    val sup = statCols.flatMap { case (c, dt) => statExpr(c, dt).map(e => (c, dt, e)) }
    if (sup.isEmpty) return Map.empty
    val aggs = statAggs(sup)
    val rows = spark.read.parquet(stagedDir)
      .groupBy(input_file_name().as("f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    rows.groupBy(r => Upsert.parentSuffixOf(r.getString(0))).map { case (d, rs) =>
      d -> rs.map { r =>
        val f = r.getString(0)
        val name = f.substring(f.lastIndexOf('/') + 1)
        name -> decodeZones(r, sup)
      }.toMap
    }
  }

  /** Same stats for a single directory of files (no `__bucket`
    * partition) — the compaction / snapshot write path.
    */
  def buildForDir(spark: SparkSession, dirPath: String,
                  statCols: Seq[(String, DataType)]):
      Map[String, Map[String, ColZone]] = {
    val sup = statCols.flatMap { case (c, dt) => statExpr(c, dt).map(e => (c, dt, e)) }
    if (sup.isEmpty) return Map.empty
    val aggs = statAggs(sup)
    val rows = spark.read.parquet(dirPath)
      .groupBy(input_file_name().as("f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    rows.map { r =>
      val f = r.getString(0)
      val name = f.substring(f.lastIndexOf('/') + 1)
      name -> decodeZones(r, sup)
    }.toMap
  }

  // ---- sidecar serialization -------------------------------------------

  private def enc(v: Option[ZVal]): String = v match {
    case None => "~"
    case Some(ZLong(l)) => s"l$l"
    case Some(ZDouble(d)) => s"d$d"
    case Some(ZStr(s)) =>
      "s" + Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
  }

  private def dec(s: String): Option[ZVal] = s.charAt(0) match {
    case '~' => None
    case 'l' => Some(ZLong(s.substring(1).toLong))
    case 'd' => Some(ZDouble(s.substring(1).toDouble))
    case 's' => Some(ZStr(new String(
      Base64.getDecoder.decode(s.substring(1)), StandardCharsets.UTF_8)))
  }

  /** Write a bucket dir's sidecars: the v3 file carries one
    * `file\tcol\tmin\tmax\tnonNull\tsum\tndv` line per (file, column)
    * (nonNull / sum / ndv encode as `~` when unknown; ndv is the
    * per-file HLL++ estimate feeding the CBO's distinctCount), the v2
    * file the same lines truncated to its own 6 fields (an old v2
    * reader on shared storage keeps its pruning AND pushdown during a
    * mixed-version rollout), and the v1 file the original 4. Strings
    * Base64-coded so no value can break the framing.
    */
  def write(fs: FileSystem, bucketDir: Path,
            entries: Map[String, Map[String, ColZone]]): Unit = {
    val lines = entries.toSeq.sortBy(_._1).flatMap { case (name, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, z) =>
        val nn = z.nonNull.fold("~")(_.toString)
        val sm = z.sum.fold("~")("i" + _.toString)
        val nd = z.ndv.fold("~")(_.toString)
        (s"$name\t$c\t${enc(z.min)}\t${enc(z.max)}", s"\t$nn\t$sm", s"\t$nd")
      }
    }
    def put(p: Path, body: String): Unit = {
      val out = fs.create(p, true)
      try out.write(body.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
    put(new Path(bucketDir, SidecarNameV3),
      lines.map { case (v1, v2, v3) => v1 + v2 + v3 }.mkString("\n"))
    put(new Path(bucketDir, SidecarNameV2),
      lines.map { case (v1, v2, _) => v1 + v2 }.mkString("\n"))
    put(new Path(bucketDir, SidecarName), lines.map(_._1).mkString("\n"))
  }

  /** Read a bucket dir's sidecar — the newest format present (v3, then
    * v2 with ndv unknown, then v1 with nonNull/sum/ndv unknown: the
    * aggregate pushdown refuses, pruning works); None when none exists
    * (older table or zone-less writer) — callers keep every file.
    */
  def read(fs: FileSystem, bucketDir: Path): Option[Map[String, Map[String, ColZone]]] = {
    val p3 = new Path(bucketDir, SidecarNameV3)
    val p2 = new Path(bucketDir, SidecarNameV2)
    val p1 = new Path(bucketDir, SidecarName)
    val p = if (fs.exists(p3)) p3
      else if (fs.exists(p2)) p2 else if (fs.exists(p1)) p1 else return None
    val in = fs.open(p)
    val text =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
      finally in.close()
    Some(text.linesIterator.filter(_.nonEmpty).toSeq.map { line =>
      val parts = line.split("\t", 7)
      val Array(name, c, mn, mx) = parts.take(4)
      val nn = if (parts.length < 6 || parts(4) == "~") None
        else Some(parts(4).toLong)
      val sm = if (parts.length < 6 || parts(5) == "~") None
        else Some(BigInt(parts(5).stripPrefix("i")))
      val nd = if (parts.length < 7 || parts(6) == "~") None
        else Some(parts(6).toLong)
      (name, c, ColZone(dec(mn), dec(mx), nn, sm, nd))
    }.groupBy(_._1).map { case (name, ts) =>
      name -> ts.map(t => t._2 -> t._3).toMap
    })
  }
}
