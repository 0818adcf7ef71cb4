package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Driver-side file skipping: evaluates a query predicate against each data
  * file's partition values and per-column min/max stats, and keeps only the
  * files that MAY contain matching rows.
  *
  * This is the Spark-native analog of the reference's parallel scan planner
  * that decides which files/chunks become scan tasks
  * (pg_lakehouse_iceberg/src/operations/scan_ops.c:62-120): here planning is
  * pure metadata on the driver, and the surviving file list is handed to
  * `spark.read.parquet(files:_*)` whose partitions ARE the parallel tasks.
  *
  * Strictly conservative: anything we cannot prove false for every row of a
  * file keeps the file (returns true). Correctness never depends on pruning
  * because the caller re-applies the same predicate to the scanned rows;
  * pruning only shrinks IO — which at 100 TB is the whole game.
  */
object FilePruner {

  /** Comparison domain for a stats/literal value (see ColStats.tag). */
  private sealed trait V
  private case class LongV(v: Long) extends V
  private case class DoubleV(v: Double) extends V
  private case class StringV(v: String) extends V
  private case class DecimalV(v: BigDecimal) extends V

  def prune(
      files: Seq[DataFileMeta],
      filter: Option[Column],
      partitionColumns: Seq[String],
      schema: StructType): Seq[DataFileMeta] =
    filter match {
      case None => files
      case Some(c) =>
        val expr =
          try org.apache.spark.sql.graftshim.ColumnExpr.expression(c)
          catch { case _: Throwable => return files }
        pruneResolved(files, expr, partitionColumns, schema)
    }

  /** Same walk over an already-built Catalyst predicate (resolved trees
    * pass through `normalize` unchanged — the walk matches
    * AttributeReference and concrete comparison nodes directly). */
  def pruneResolved(
      files: Seq[DataFileMeta],
      predicate: Expression,
      partitionColumns: Seq[String],
      schema: StructType): Seq[DataFileMeta] = {
    val expr =
      try normalize(predicate)
      catch { case _: Throwable => return files }
    val partSet = partitionColumns.toSet
    files.filter(f => mayMatch(f, expr, partSet, schema))
  }

  /** Spark 4's Column ops arrive as UnresolvedFunction("=", "<", "and", ...)
    * — rewrite the comparison/boolean skeleton into concrete Catalyst nodes
    * so the walk below can match; unknown functions stay opaque (→ keep). */
  private def normalize(e: Expression): Expression = e.transformUp {
    // constant-fold literal casts (e.g. lit("1994-01-01").cast("date") →
    // date literal as epoch-day int) so date/timestamp range predicates
    // become prunable; anything that fails to fold stays opaque (→ keep)
    case c: Cast if c.child.isInstanceOf[Literal] =>
      try {
        val withTz = if (c.timeZoneId.isEmpty && c.needsTimeZone) c.withTimeZone("UTC") else c
        Literal(withTz.eval(null), c.dataType)
      } catch { case _: Throwable => c }
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if u.nameParts.length == 1 && !u.isDistinct =>
      val args = u.arguments
      (u.nameParts.head.toLowerCase, args) match {
        case ("=" | "==", Seq(a, b)) => EqualTo(a, b)
        case ("<", Seq(a, b)) => LessThan(a, b)
        case ("<=", Seq(a, b)) => LessThanOrEqual(a, b)
        case (">", Seq(a, b)) => GreaterThan(a, b)
        case (">=", Seq(a, b)) => GreaterThanOrEqual(a, b)
        case ("and", Seq(a, b)) => And(a, b)
        case ("or", Seq(a, b)) => Or(a, b)
        case ("!" | "not", Seq(a)) => Not(a)
        case ("in", a +: rest) if rest.nonEmpty => In(a, rest)
        case ("isnull", Seq(a)) => IsNull(a)
        case ("isnotnull", Seq(a)) => IsNotNull(a)
        case _ => u
      }
  }

  // ---- predicate walk ------------------------------------------------------

  private def mayMatch(f: DataFileMeta, e: Expression, parts: Set[String], schema: StructType): Boolean =
    e match {
      case And(l, r) => mayMatch(f, l, parts, schema) && mayMatch(f, r, parts, schema)
      case Or(l, r)  => mayMatch(f, l, parts, schema) || mayMatch(f, r, parts, schema)
      case Not(EqualTo(a, b)) => mayMatchNotEq(f, a, b, parts, schema)
      case cmp: BinaryComparison => mayMatchCmp(f, cmp, parts, schema)
      case In(AttrName(name), list) if list.forall(_.isInstanceOf[Literal]) =>
        list.exists(l => mayMatchOp(f, name, "=", l.asInstanceOf[Literal], parts, schema))
      case IsNull(AttrName(name)) =>
        partValue(f, name, parts) match {
          case Some(pv) => pv == null
          case None => f.stats.get(name).forall(_.nulls != 0) // unknown → keep
        }
      case IsNotNull(AttrName(name)) =>
        partValue(f, name, parts) match {
          case Some(pv) => pv != null
          case None => f.stats.get(name).forall(s => f.rowCount == 0 || s.nulls < f.rowCount)
        }
      case _ => true // unsupported shape: keep the file
    }

  private def mayMatchNotEq(f: DataFileMeta, a: Expression, b: Expression, parts: Set[String], schema: StructType): Boolean =
    (a, b) match {
      // only partition columns can prove != false (single value per file)
      case (AttrName(n), l: Literal) => notEqPart(f, n, l, parts, schema)
      case (l: Literal, AttrName(n)) => notEqPart(f, n, l, parts, schema)
      case _ => true
    }

  private def notEqPart(f: DataFileMeta, name: String, l: Literal, parts: Set[String], schema: StructType): Boolean =
    partValue(f, name, parts) match {
      case Some(pv) =>
        if (pv == null) false // null != x is null → row filtered
        else (typedPartValue(pv, name, schema), litFor(l, name, schema)) match {
          case (Some(p), Some(v)) => compare(p, v).map(_ != 0).getOrElse(true)
          case _ => true
        }
      case None => true
    }

  /** Normalizes attr-vs-literal comparisons (either operand order). */
  private def mayMatchCmp(f: DataFileMeta, cmp: BinaryComparison, parts: Set[String], schema: StructType): Boolean = {
    val norm: Option[(String, String, Literal)] = (cmp.left, cmp.right) match {
      case (AttrName(n), l: Literal) => Some((n, opOf(cmp), l))
      case (l: Literal, AttrName(n)) => Some((n, flip(opOf(cmp)), l))
      case _ => None
    }
    norm match {
      case Some((name, op, l)) => mayMatchOp(f, name, op, l, parts, schema)
      case None => true
    }
  }

  private def opOf(c: BinaryComparison): String = c match {
    case _: EqualTo => "="
    case _: LessThan => "<"
    case _: LessThanOrEqual => "<="
    case _: GreaterThan => ">"
    case _: GreaterThanOrEqual => ">="
    case _ => "?"
  }
  private def flip(op: String): String = op match {
    case "<" => ">" case "<=" => ">=" case ">" => "<" case ">=" => "<=" case o => o
  }

  private def mayMatchOp(f: DataFileMeta, name: String, op: String, l: Literal, parts: Set[String], schema: StructType): Boolean = {
    if (op == "?") return true
    if (l.value == null) return false // col <op> NULL matches nothing
    val lv = litFor(l, name, schema) match {
      case Some(v) => v
      case None => return true
    }
    partValue(f, name, parts) match {
      case Some(pv) =>
        if (pv == null) false
        else typedPartValue(pv, name, schema) match {
          case Some(p) => compare(p, lv) match {
            case Some(c) => op match {
              case "=" => c == 0
              case "<" => c < 0
              case "<=" => c <= 0
              case ">" => c > 0
              case ">=" => c >= 0
            }
            case None => true
          }
          case None => true
        }
      case None =>
        f.stats.get(name) match {
          case Some(st) => rangeMayMatch(st, op, lv)
          case None => true
        }
    }
  }

  /** file range [min,max] vs literal — can any row satisfy `col op v`? */
  private def rangeMayMatch(st: ColStats, op: String, v: V): Boolean = {
    val mn = statValue(st, st.min)
    val mx = statValue(st, st.max)
    (mn, mx) match {
      case (Some(lo), Some(hi)) =>
        (compare(lo, v), compare(hi, v)) match {
          case (Some(cl), Some(ch)) => op match {
            case "=" => cl <= 0 && ch >= 0
            case "<" => cl < 0   // min < v → some row may be < v
            case "<=" => cl <= 0
            case ">" => ch > 0
            case ">=" => ch >= 0
          }
          case _ => true
        }
      case _ => true
    }
  }

  // ---- value extraction ----------------------------------------------------

  /** Unwraps attribute references whether resolved or not. */
  private object AttrName {
    def unapply(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
  }

  /** Converts a literal into the DOMAIN of `name`'s file stats, which is
    * fixed by the column's schema type: numeric stats are the value itself,
    * DateType stats are epoch days, TimestampType stats are epoch MICROS
    * (GraftTable always writes TIMESTAMP_MICROS). A literal whose type
    * can't be soundly mapped into the column's domain yields None → the
    * file is kept. Comparing raw literal values against stats without this
    * mapping is a correctness bug: a date literal (epoch days) against
    * timestamp stats (micros) both look like longs and would prune
    * essentially every file. */
  private def litFor(l: Literal, name: String, schema: StructType): Option[V] = {
    val colType = schema.find(_.name == name).map(_.dataType).getOrElse(return None)
    val v = l.value
    if (v == null) return None
    colType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType =>
        v match {
          case b: Byte => Some(LongV(b.toLong))
          case s: Short => Some(LongV(s.toLong))
          case i: Int => Some(LongV(i.toLong))
          case j: Long => Some(LongV(j))
          case f: Float => Some(DoubleV(f.toDouble))
          case d: Double => Some(DoubleV(d))
          case _ => None
        }
      case StringType =>
        v match {
          case u: UTF8String => Some(StringV(u.toString))
          case s: String => Some(StringV(s))
          case _ => None
        }
      case DateType =>
        (l.dataType, v) match {
          case (DateType, i: Int) => Some(LongV(i.toLong))
          case (StringType, _) => parseDateDays(v.toString).map(LongV)
          case _ => None
        }
      case TimestampType | TimestampNTZType =>
        (l.dataType, v) match {
          case (TimestampType | TimestampNTZType, j: Long) => Some(LongV(j))
          // date → timestamp at UTC midnight, matching the session tz
          // (all graft sessions run spark.sql.session.timeZone=UTC)
          case (DateType, i: Int) => Some(LongV(i.toLong * MicrosPerDay))
          case (StringType, _) => parseTimestampMicros(v.toString).map(LongV)
          case _ => None
        }
      case _: DecimalType =>
        // exact BigDecimal domain. A DOUBLE literal against a decimal
        // column deliberately yields None: Spark evaluates that predicate
        // in double-rounded semantics, and an exact-domain prune could
        // drop a file whose boundary row only matches after rounding.
        v match {
          case d: org.apache.spark.sql.types.Decimal => Some(DecimalV(d.toBigDecimal))
          case d: java.math.BigDecimal => Some(DecimalV(BigDecimal(d)))
          case d: BigDecimal => Some(DecimalV(d))
          case b: Byte => Some(DecimalV(BigDecimal(b.toInt)))
          case s: Short => Some(DecimalV(BigDecimal(s.toInt)))
          case i: Int => Some(DecimalV(BigDecimal(i)))
          case j: Long => Some(DecimalV(BigDecimal(j)))
          case u: UTF8String => parseDecimal(u.toString)
          case s: String => parseDecimal(s)
          case _ => None
        }
      case _ => None // binary/etc: conservative
    }
  }

  private def parseDecimal(s: String): Option[V] =
    try Some(DecimalV(BigDecimal(s.trim))) catch { case _: Throwable => None }

  private val MicrosPerDay = 86400000000L

  private def parseDateDays(s: String): Option[Long] =
    try Some(java.time.LocalDate.parse(s.trim).toEpochDay)
    catch { case _: Throwable => None }

  private def parseTimestampMicros(s: String): Option[Long] = {
    val t = s.trim
    try {
      val ldt = java.time.LocalDateTime.parse(t.replace(' ', 'T'))
      Some(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L)
    } catch {
      case _: Throwable => parseDateDays(t).map(_ * MicrosPerDay)
    }
  }

  private def statValue(st: ColStats, s: String): Option[V] = st.tag match {
    case "l" => s.toLongOption.map(LongV)
    case "d" => s.toDoubleOption.map(DoubleV)
    case "s" => Some(StringV(s))
    case "c" => parseDecimal(s)
    case _ => None
  }

  /** Partition value for `name` if it is a partition column (None otherwise);
    * Some(null) means the hive NULL partition. */
  private def partValue(f: DataFileMeta, name: String, parts: Set[String]): Option[String] =
    if (!parts.contains(name)) None
    else f.partitionValues.get(name) match {
      case Some(Meta.NullPartition) => Some(null)
      case Some(v) => Some(v)
      case None => None
    }

  private def typedPartValue(raw: String, name: String, schema: StructType): Option[V] =
    schema.find(_.name == name).map(_.dataType).flatMap {
      case ByteType | ShortType | IntegerType | LongType => raw.toLongOption.map(LongV)
      case FloatType | DoubleType => raw.toDoubleOption.map(DoubleV)
      case StringType => Some(StringV(raw))
      // hive partition dirs store dates as yyyy-MM-dd; stats/literals use
      // epoch days — same domain after parsing
      case DateType =>
        try Some(LongV(java.time.LocalDate.parse(raw).toEpochDay)) catch { case _: Throwable => None }
      case _: DecimalType => parseDecimal(raw)
      case _ => None
    }

  /** Total order across comparable domains; None = incomparable (keep file).
    * Integral-vs-floating promotes to double (fine below 2^53 — and a wrong
    * ulp here only risks keeping an extra file, never dropping a good one,
    * because = / <= / >= boundaries stay inclusive under promotion). */
  private def compare(a: V, b: V): Option[Int] = (a, b) match {
    case (LongV(x), LongV(y)) => Some(java.lang.Long.compare(x, y))
    case (DoubleV(x), DoubleV(y)) => Some(java.lang.Double.compare(x, y))
    case (LongV(x), DoubleV(y)) => Some(java.lang.Double.compare(x.toDouble, y))
    case (DoubleV(x), LongV(y)) => Some(java.lang.Double.compare(x, y.toDouble))
    // decimal: exact comparison; long promotes exactly. Double-vs-decimal
    // stays incomparable (see litFor) — keep the file.
    case (DecimalV(x), DecimalV(y)) => Some(x.compare(y))
    case (DecimalV(x), LongV(y)) => Some(x.compare(BigDecimal(y)))
    case (LongV(x), DecimalV(y)) => Some(BigDecimal(x).compare(y))
    // parquet footer min/max use unsigned UTF-8 byte order; Java compareTo is
    // UTF-16 — they agree only on ASCII, so never prune on non-ASCII strings.
    case (StringV(x), StringV(y)) if isAscii(x) && isAscii(y) => Some(x.compareTo(y))
    case _ => None
  }

  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) > 127) return false; i += 1 }
    true
  }
}
