package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The placement hash as a catalog V2 function — what lets Catalyst
  * treat `bucket(n, pk...)` as a FIRST-CLASS partition transform of
  * catalog-loaded Upsert tables: two tables partitioned by the same
  * bucket function with the same count co-locate a join on the PK
  * ALONE (no `__bucket` in the ON clause), and
  * `v2.bucketing.shuffle` can evaluate the function to shuffle a
  * small side INTO the layout.
  *
  * `produceResult` is the bit-exact mirror of the write-path placement
  * (`Upsert.withBucket`: `xxhash64(concat_ws("", pk cast string)) pmod
  * n`): values render via the same string forms Spark's cast produces
  * for the supported types, nulls vanish exactly as `concat_ws` drops
  * null arguments, and the hash is the same XXH64(seed 42) the driver
  * mirror `Upsert.bucketOfKey` has spec-proven equal to the executor
  * expression. Binding REJECTS types whose cast-to-string the mirror
  * does not reproduce (doubles, timestamps) — those tables simply
  * don't report the transform.
  */
object BucketFunction extends UnboundFunction {
  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, cols...): graft placement bucket — xxhash64(concat(cast cols as string)) pmod n"

  private[sources] val supported: Set[DataType] =
    Set(StringType, LongType, IntegerType, ShortType, ByteType)

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2 &&
      inputType.fields.head.dataType == IntegerType,
      s"bucket expects (int numBuckets, cols...), got ${inputType.catalogString}")
    inputType.fields.tail.foreach(f => if (!supported(f.dataType))
      throw new UnsupportedOperationException(
        s"bucket transform unsupported for ${f.dataType.catalogString} " +
          "(cast-to-string mirror covers string/integral types only)"))
    new BucketBound(inputType.fields.map(_.dataType))
  }
}

private[sources] class BucketBound(types: Array[DataType])
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = types
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"

  override def produceResult(row: InternalRow): Integer = {
    val n = row.getInt(0)
    val sb = new java.lang.StringBuilder
    var i = 1
    while (i < types.length) {
      if (!row.isNullAt(i)) types(i) match { // concat_ws drops nulls
        case StringType => sb.append(row.getUTF8String(i).toString)
        case LongType => sb.append(row.getLong(i))
        case IntegerType => sb.append(row.getInt(i))
        case ShortType => sb.append(row.getShort(i).toInt)
        case ByteType => sb.append(row.getByte(i).toInt)
        case dt => throw new IllegalStateException(s"unbindable type $dt")
      }
      i += 1
    }
    Integer.valueOf(graft.io.Upsert.bucketOfKey(sb.toString, n))
  }
}
