package graft.lake.iceberg

import org.apache.spark.sql.types._

/** Iceberg partition-transform semantics (table spec "Partition Transforms"
  * + Appendix B bucket hashing).
  *
  * NOTE: Iceberg's `bucket[N]` is Murmur3 x86 32-bit with SEED 0 over a
  * spec-fixed byte serialization — NOT Spark's `hash()` (seed 42, different
  * serialization). Graft's own tables prune buckets through
  * [[graft.lake.PartitionTransforms]] (Spark's hash on both sides); real
  * Iceberg tables must use THIS hash on the prune side or bucket pruning
  * would silently drop matching files. The Murmur3 implementation below is
  * the public-domain x86_32 algorithm.
  */
object IcebergTransforms {

  /** Hash serialization (spec Appendix B): int/long/date/timestamp → 8-byte
    * little-endian long; string → UTF-8 bytes; decimal → minimal unscaled
    * big-endian. None = a type the caller must not bucket-prune on. */
  def hashBytes(value: Any, dataType: DataType): Option[Array[Byte]] = {
    def leLong(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()
    (value, dataType) match {
      case (null, _) => None
      case (v: Int, _) => Some(leLong(v.toLong))
      case (v: Long, _) => Some(leLong(v))
      case (v: String, _) => Some(v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case (v: org.apache.spark.unsafe.types.UTF8String, _) => Some(v.getBytes)
      case (v: java.sql.Date, _) => Some(leLong(v.toLocalDate.toEpochDay))
      case (v: java.time.LocalDate, _) => Some(leLong(v.toEpochDay))
      case (v: Decimal, _) => Some(v.toJavaBigDecimal.unscaledValue.toByteArray)
      case (v: java.math.BigDecimal, _) => Some(v.unscaledValue.toByteArray)
      case _ => None
    }
  }

  /** `bucket[n]` of a value: (murmur3_x86_32(bytes, seed=0) & MaxInt) % n. */
  def bucket(value: Any, dataType: DataType, n: Int): Option[Int] =
    hashBytes(value, dataType).map(b => (murmur3x86(b, 0) & Integer.MAX_VALUE) % n)

  /** Murmur3 x86 32-bit (Austin Appleby's public-domain algorithm). */
  def murmur3x86(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = seed
    val nBlocks = data.length / 4
    var i = 0
    while (i < nBlocks) {
      val base = i * 4
      var k = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 1
    }
    var k = 0
    val tail = nBlocks * 4
    (data.length & 3) match {
      case 3 =>
        k ^= (data(tail + 2) & 0xff) << 16
        k ^= (data(tail + 1) & 0xff) << 8
        k ^= data(tail) & 0xff
        k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k
      case 2 =>
        k ^= (data(tail + 1) & 0xff) << 8
        k ^= data(tail) & 0xff
        k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k
      case 1 =>
        k ^= data(tail) & 0xff
        k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k
      case _ => ()
    }
    h ^= data.length
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35; h ^= h >>> 16
    h
  }

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  /** Result Spark type of a transform applied to `source`. */
  def resultType(transform: String, source: DataType): DataType = transform match {
    case "identity" => source
    case BucketRe(_) => IntegerType
    case TruncateRe(_) => source
    case "year" | "month" | "hour" => IntegerType
    case "day" => DateType // spec: day results are date-comparable
    case "void" => source
    case other => throw new IllegalArgumentException(s"iceberg: unknown transform $other")
  }

  /** Apply a transform to one JVM value (writer side; values as Spark
    * external types: java.time.LocalDate for dates, java.time.Instant /
    * LocalDateTime for timestamps). */
  def apply(transform: String, value: Any, source: DataType): Any = {
    if (value == null) return null
    transform match {
      case "identity" => value
      case BucketRe(n) => bucket(value, source, n.toInt).map(Int.box).orNull
      case TruncateRe(w0) =>
        val w = w0.toInt
        value match {
          case s: String => s.substring(0, math.min(w, s.length))
          case i: Int => i - java.lang.Math.floorMod(i, w)
          case l: Long => l - java.lang.Math.floorMod(l, w.toLong)
          case other => throw new IllegalArgumentException(
            s"iceberg: truncate on ${other.getClass.getSimpleName} unsupported")
        }
      case "day" => epochDay(value).toInt
      case "year" =>
        java.time.LocalDate.ofEpochDay(epochDay(value)).getYear - 1970
      case "month" =>
        val d = java.time.LocalDate.ofEpochDay(epochDay(value))
        (d.getYear - 1970) * 12 + d.getMonthValue - 1
      case "hour" => java.lang.Math.floorDiv(epochMicros(value), 3600L * 1000000L).toInt
      case "void" => null
      case other => throw new IllegalArgumentException(s"iceberg: unknown transform $other")
    }
  }

  private def epochDay(value: Any): Long = value match {
    case d: java.time.LocalDate => d.toEpochDay
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case _ => java.lang.Math.floorDiv(epochMicros(value), 86400L * 1000000L)
  }

  private def epochMicros(value: Any): Long = value match {
    case t: java.time.Instant => t.getEpochSecond * 1000000L + t.getNano / 1000L
    case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
    case t: java.time.LocalDateTime =>
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
    case other => throw new IllegalArgumentException(
      s"iceberg: no epoch micros for ${other.getClass.getSimpleName}")
  }
}
