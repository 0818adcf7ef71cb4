package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iceberg-style partition TRANSFORMS (hidden partitioning) — the native
  * form of the reference's "partition pruning" roadmap line
  * (pg_lakehouse_iceberg/README.md:17): Iceberg's partition model is
  * transform-based (`days(ts)`, `bucket(n, col)`, `truncate(w, col)`), so
  * a user partitions by a TRANSFORM of a source column and queries keep
  * filtering on the source column — the engine maps predicates into the
  * transform domain for pruning (r04 verdict missing #2).
  *
  * Spec syntax (stored verbatim in `TableMetadata.partitionColumns`, so
  * the metadata layout is unchanged and identity specs are just the
  * column name — fully backward compatible):
  * {{{
  *   "col"               identity    dir: col=<value>
  *   "days(col)"         epoch days  dir: __p_col_day=<long>
  *   "bucket(16,col)"    hash mod n  dir: __p_col_bucket=<int>
  *   "truncate(8,col)"   prefix/step dir: __p_col_trunc=<prefix|long>
  * }}}
  *
  * The SOURCE column stays in the data files (only the derived dir column
  * is stripped by partitionBy) — that is what makes the partitioning
  * "hidden": readers see the full schema, writers never materialize the
  * derived value, and min/max stats on the source still work. Bucket uses
  * Spark's `hash` (Murmur3, seed 42) mod n; the pruner evaluates the SAME
  * Catalyst expression on literals, so write-side and prune-side hashes
  * can never drift.
  */
sealed trait PTransform {
  def source: String
  /** hive directory name the write path partitions by */
  def dirName: String
  /** the spec string persisted in metadata */
  def spec: String
}
case class PIdentity(source: String) extends PTransform {
  def dirName: String = source
  def spec: String = source
}
case class PDays(source: String) extends PTransform {
  def dirName: String = s"__p_${source}_day"
  def spec: String = s"days($source)"
}
case class PBucket(n: Int, source: String) extends PTransform {
  def dirName: String = s"__p_${source}_bucket"
  def spec: String = s"bucket($n,$source)"
}
case class PTruncate(width: Int, source: String) extends PTransform {
  def dirName: String = s"__p_${source}_trunc"
  def spec: String = s"truncate($width,$source)"
}

object PartitionTransforms {

  private val DaysRe = """days\s*\(\s*([^(),\s]+)\s*\)""".r
  private val BucketRe = """bucket\s*\(\s*(\d+)\s*,\s*([^(),\s]+)\s*\)""".r
  private val TruncRe = """truncate\s*\(\s*(\d+)\s*,\s*([^(),\s]+)\s*\)""".r

  def parse(spec: String): PTransform = spec.trim match {
    case DaysRe(c) => PDays(c)
    case BucketRe(n, c) =>
      require(n.toInt > 0, s"bucket count must be positive in $spec"); PBucket(n.toInt, c)
    case TruncRe(w, c) =>
      require(w.toInt > 0, s"truncate width must be positive in $spec"); PTruncate(w.toInt, c)
    case c if !c.contains('(') => PIdentity(c)
    case other => throw new IllegalArgumentException(
      s"unsupported partition transform '$other' " +
        "(supported: col, days(col), bucket(n,col), truncate(w,col))")
  }

  def parseAll(specs: Seq[String]): Seq[PTransform] = specs.map(parse)

  /** Write-side Column computing the transform's derived value. */
  def columnFor(t: PTransform, schema: StructType): Column = t match {
    case PIdentity(c) => col(c)
    case PDays(c) =>
      schema.find(_.name == c).map(_.dataType) match {
        case Some(DateType) => unix_date(col(c)).cast("long")
        // epoch days with floor semantics (negative micros round down)
        case _ => floor(unix_micros(col(c)).cast("double") / lit(MicrosPerDay.toDouble)).cast("long")
      }
    case PBucket(n, c) => pmod(hash(col(c)), lit(n))
    case PTruncate(w, c) =>
      schema.find(_.name == c).map(_.dataType) match {
        case Some(StringType) => substring(col(c), 1, w)
        // integral truncate: v - (v pmod w) — floor to the step below
        // (Iceberg's truncate semantics, correct for negatives)
        case _ => (col(c).cast("long") - pmod(col(c).cast("long"), lit(w.toLong))).cast("long")
      }
  }

  val MicrosPerDay: Long = 86400000000L

  /** Driver-side bucket of a literal — evaluates the SAME Catalyst hash
    * the write path uses, so it cannot drift from `columnFor`. */
  def bucketOfLiteral(l: org.apache.spark.sql.catalyst.expressions.Literal, n: Int): Option[Int] =
    try {
      val h = new org.apache.spark.sql.catalyst.expressions.Murmur3Hash(Seq(l)).eval(null)
      Some(java.lang.Math.floorMod(h.asInstanceOf[Int], n))
    } catch { case _: Throwable => None }

  /** Smallest string strictly greater than every string with prefix `p`
    * (the exclusive upper bound of the truncate bucket) — None when the
    * prefix is all-max chars (unbounded above). */
  def nextPrefix(p: String): Option[String] = {
    var i = p.length - 1
    while (i >= 0 && p.charAt(i) == Char.MaxValue) i -= 1
    if (i < 0) None
    else Some(p.substring(0, i) + (p.charAt(i) + 1).toChar)
  }
}
