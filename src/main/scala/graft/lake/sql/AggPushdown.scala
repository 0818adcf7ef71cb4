package graft.lake.sql

import org.apache.spark.sql.connector.expressions.{Expression, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._

import graft.lake.{ColStats, DataFileMeta, GraftTable, ManifestSummary, Meta, PIdentity, PartitionTransforms, Snapshot, TableMetadata}

/** Metadata-only aggregate evaluation for the DSv2 scan: answers
  * `COUNT(*) / COUNT(col) / MIN(col) / MAX(col)` from manifest stats and
  * partition values alone — zero data files opened (Iceberg's aggregate
  * pushdown; the reference's planner keeps the same file-level metadata for
  * its scans, pg_lakehouse_iceberg/src/operations/scan_ops.c:240-276). At
  * 100 TB this turns a full-table `count(*)` from a thousand-executor scan
  * into one driver-side manifest walk.
  *
  * Everything here is EXACT-or-refuse — unlike `FilePruner`, which may keep
  * extra files because rows are re-filtered, an aggregate answered from
  * metadata has no row-level second chance. The refusal rules:
  *
  *   - any delete file in the snapshot state → refuse (MoR rows not yet
  *     applied would inflate counts; `compact()`/`maintain()` restores
  *     pushdown)
  *   - filters must be decidable per file from IDENTITY partition values:
  *     every referenced column an identity partition column, every file
  *     carrying a value for it (files from before a partition evolution
  *     don't) — then a file's rows ALL match or NONE do
  *   - MIN/MAX only on integral / date / timestamp / decimal columns:
  *     parquet string stats may be truncated (ParquetStats.MaxStatLen) and
  *     float/double stats ignore NaN, so neither is exact
  *   - a file missing stats for the column → refuse (an all-null column
  *     and an unsupported physical type are indistinguishable in ColStats)
  *
  * Columns renamed by schema evolution resolve their per-file PHYSICAL
  * stats key through the table's field-id epoch log, same as pruning.
  */
object AggPushdown {

  /** Is `f` EXACTLY decidable from identity partition values for every
    * data file of the scan's snapshot? (Decidable filters are consumed by
    * the scan builder — not returned as residual — which is what lets
    * Spark hand the whole Aggregate to the source.) */
  def exactPartitionFilter(table: GraftTable, asOf: Long, f: Filter): Boolean = {
    val m = table.meta
    val snap = if (asOf >= 0) Some(m.snapshot(asOf)) else m.currentSnapshot
    snap match {
      case None => true // empty table: nothing to mis-decide
      case Some(s) =>
        val idCols = identityCols(m.partitionColumns)
        val sch = table.schema
        if (!f.references.forall(r => !r.contains('.') && idCols.contains(r)))
          return false
        // SUMMARY fast path — decide from the manifest list alone: a
        // column enters a summary's pvals only when EVERY data file in
        // that manifest carries a (bounded-cardinality) value for it, so
        // presence in all summaries + convertibility of every recorded
        // value proves per-file decidability with ZERO manifest IO.
        // This runs in pushFilters on every filtered DSv2 query — the
        // per-file walk below is O(all files) and stays only as the
        // conservative fallback (no summaries / capped-out column).
        val refs = f.references.toSeq
        val entries = s.manifestEntries
        val bySummary = shapeDecidable(f, sch) &&
          entries.nonEmpty && entries.forall {
            case (_, Some(sum)) =>
              refs.forall { c =>
                val dt = sch.find(_.name == c).map(_.dataType)
                sum.pvals.get(c).exists(_.forall(raw =>
                  raw == Meta.NullPartition ||
                    dt.exists(d => partValue(raw, d).isDefined)))
              }
            case (_, None) => false
          }
        bySummary || s.dataFiles.forall(df => eval(f, df, sch).isDefined)
    }
  }

  /** Can [[eval]] decide `f` for ANY file whose referenced partition
    * values are present and convertible? Mirrors eval3's shape + literal
    * handling with no file in hand — the summary fast path supplies the
    * per-file part. */
  private def shapeDecidable(f: Filter, sch: StructType): Boolean = {
    def lit(c: String, v: Any): Boolean =
      v != null && sch.find(_.name == c).map(_.dataType)
        .exists(dt => litValue(v, dt).isDefined)
    f match {
      case sources.EqualTo(c, v) => lit(c, v)
      case sources.GreaterThan(c, v) => lit(c, v)
      case sources.GreaterThanOrEqual(c, v) => lit(c, v)
      case sources.LessThan(c, v) => lit(c, v)
      case sources.LessThanOrEqual(c, v) => lit(c, v)
      case sources.EqualNullSafe(c, v) => lit(c, v)
      case sources.In(c, vs) =>
        vs != null && vs.forall(v => v == null || lit(c, v))
      case sources.IsNull(_) | sources.IsNotNull(_) => true
      case sources.And(l, r) => shapeDecidable(l, sch) && shapeDecidable(r, sch)
      case sources.Or(l, r) => shapeDecidable(l, sch) && shapeDecidable(r, sch)
      case sources.Not(inner) => shapeDecidable(inner, sch)
      case _: sources.AlwaysTrue | _: sources.AlwaysFalse => true
      case _ => false
    }
  }

  /** One metadata-answerable aggregate function. */
  sealed trait MetaAgg
  case object MCountStar extends MetaAgg
  final case class MCount(col: String) extends MetaAgg
  final case class MMin(col: String) extends MetaAgg
  final case class MMax(col: String) extends MetaAgg

  /** Computed value of one MetaAgg: counts are Left(n); min/max are
    * Right(columnType, domain value — None for the SQL NULL of an empty /
    * all-null input). */
  type MetaValue = Either[Long, (DataType, Option[BigDecimal])]

  /** Global (ungrouped) compute: always exactly one result row. */
  def computeAggs(
      table: GraftTable,
      asOf: Long,
      aggs: Seq[MetaAgg],
      filters: Seq[Filter]): Option[Seq[MetaValue]] =
    computeGrouped(table, asOf, Nil, aggs, filters).map(_.head._2)

  /** Shared compute core: exact file selection by `filters`, files
    * bucketed by their `groupCols` identity-partition values (one global
    * bucket when empty), then each aggregate from manifest stats /
    * partition values per bucket. Returned group keys are the RAW
    * hive-dir strings (null for the hive NULL dir), aligned with
    * `groupCols`. None when ANY part is not exactly answerable. */
  def computeGrouped(
      table: GraftTable,
      asOf: Long,
      groupCols: Seq[String],
      aggs: Seq[MetaAgg],
      filters: Seq[Filter]): Option[Seq[(Seq[String], Seq[MetaValue])]] = {
    val m = table.meta
    val sch = table.schema
    val snap = if (asOf >= 0) Some(m.snapshot(asOf)) else m.currentSnapshot
    // delete files make manifest row counts upper bounds, not answers
    if (snap.exists(_.nDeleteFiles > 0)) return None
    // O(1) fast path: an unfiltered, ungrouped COUNT(*) is the snapshot's
    // own running row count — zero manifest IO even on a million-file
    // table (totalRows is exact: replace-list commits recompute it,
    // append-style commits accumulate, MoR deletes refuse above)
    if (filters.isEmpty && groupCols.isEmpty && aggs.nonEmpty &&
        aggs.forall(_ == MCountStar))
      return Some(Seq(
        (Nil, aggs.map(_ => Left(snap.map(_.totalRows).getOrElse(0L))))))
    // ZERO-manifest-IO fast path (r06): unfiltered, ungrouped MIN / MAX /
    // COUNT(col) answered from the manifest-list column-range summaries
    // alone — min over folded per-manifest mins IS the table min, and
    // rows − folded null count IS COUNT(col). Falls through to the
    // manifest walk when any summary or range is missing (old metadata,
    // epoch mismatch, partition columns absent from data files).
    if (filters.isEmpty && groupCols.isEmpty && aggs.nonEmpty)
      snap.flatMap(s => aggsFromSummaries(table, m, s, aggs, sch)).foreach(
        vs => return Some(Seq((Nil, vs))))
    val idCols = identityCols(m.partitionColumns)
    if (!groupCols.forall(idCols.contains)) return None
    // filter references must be identity partition columns — a
    // file-independent requirement, checked before any manifest loads
    if (!filters.forall(_.references.forall(r =>
      !r.contains('.') && idCols.contains(r)))) return None

    // MANIFEST-level pruning first: a summary lists every file's value
    // for its columns, and `eval` is exact on identity partition values —
    // so a manifest where some single-column filter is false for ALL
    // listed values of its column provably contributes nothing, and the
    // metadata walk skips it without IO. At a million files this keeps
    // the partition-filtered COUNT a walk over the MATCHING partitions'
    // manifests, not the table's whole inventory.
    def summaryMayPass(s: graft.lake.ManifestSummary): Boolean =
      s.pvals.forall { case (c, vs) =>
        vs.isEmpty || vs.exists { v =>
          val synth = DataFileMeta("", 0L, 1L, 0L, Map(c -> v), Map.empty)
          filters.filter(_.references.forall(_ == c))
            .forall(f => !eval(f, synth, sch).contains(false))
        }
      }
    val allFiles = snap.map(_.dataFilesWhere(summaryMayPass)).getOrElse(Nil)

    // exact per-file filter evaluation: all-or-nothing per file
    val surviving = new scala.collection.mutable.ArrayBuffer[DataFileMeta]()
    for (df <- allFiles) {
      if (!groupCols.forall(df.partitionValues.contains)) return None
      var verdict: Option[Boolean] = Some(true)
      for (f <- filters if verdict.isDefined) {
        eval(f, df, sch) match {
          case None => return None // undecidable → no pushdown at all
          case Some(v) => verdict = verdict.map(_ && v)
        }
      }
      if (verdict.contains(true)) surviving += df
    }

    val statName = table.statNameFor(m)
    // SQL GROUP BY groups nulls together; the hive NULL dir is one value.
    // ZERO-ROW files are identity BEFORE keying (r15, the interop rule's
    // fix applied here too): a committed empty file cannot affect any
    // COUNT/MIN/MAX, but keying it would fabricate a count(*)=0 group a
    // real scan never yields — groupless aggregates keep every file (a
    // one-row answer over empty input IS correct).
    val buckets: Seq[(Seq[String], Seq[DataFileMeta])] =
      if (groupCols.isEmpty) Seq((Nil, surviving.toSeq))
      else surviving.toSeq.filter(_.rowCount > 0L)
        .groupBy(df => groupCols.map(c => df.partitionValues(c) match {
          case Meta.NullPartition => null
          case v => v
        })).toSeq // per-column framing: null sorts first, no cross-column bleed
          .sortBy(_._1.map(k =>
            if (k == null) "\u0000" else "\u0001" + k + "\u0000").mkString)

    val out = buckets.map { case (key, files) =>
      key -> aggsOf(files, aggs, idCols, statName, sch).getOrElse(return None)
    }
    Some(out)
  }

  /** Unfiltered, ungrouped aggregates from manifest-list summaries alone
    * (zero manifest IO). None → caller falls back to the manifest walk.
    * Exactness: every manifest must carry a summary; a column agg needs
    * the column's folded range in every data-holding summary (the fold
    * itself required every file to have a comparable stat). MIN/MAX read
    * the folded bounds (all-NULL files contributed no bound — they have
    * no values to win); COUNT(col) = Σ(rows − nulls), refusing rows ≤ 0
    * (pre-r06 summaries deserialize rows = 0 — unknown, not empty). */
  private def aggsFromSummaries(
      table: GraftTable,
      m: TableMetadata,
      snap: Snapshot,
      aggs: Seq[MetaAgg],
      sch: StructType): Option[Seq[MetaValue]] = {
    val sums = new scala.collection.mutable.ArrayBuffer[ManifestSummary]()
    for ((_, so) <- snap.manifestEntries) so match {
      case Some(s) => if (s.nData > 0) sums += s
      case None => return None // pre-summary manifest list
    }
    val idByName = table.rangeColsOf(m).toMap
    def ranges(name: String): Option[Seq[ColStats]] =
      idByName.get(name).flatMap { id =>
        val k = id.toString
        val rs = sums.flatMap(s => s.ranges.get(k))
        if (rs.length == sums.length) Some(rs.toSeq) else None
      }
    val values = new scala.collection.mutable.ArrayBuffer[MetaValue]()
    for (a <- aggs) a match {
      case MCountStar =>
        if (sums.exists(_.rows <= 0)) return None
        values += Left(sums.map(_.rows).sum)
      case MCount(name) =>
        if (sums.exists(_.rows <= 0)) return None
        val rs = ranges(name).getOrElse(return None)
        if (rs.exists(_.nulls < 0)) return None // unknown null count
        values += Left(sums.map(_.rows).sum - rs.map(_.nulls).sum)
      case mm @ (MMin(_) | MMax(_)) =>
        val isMin = mm.isInstanceOf[MMin]
        val name = mm match { case MMin(c) => c; case MMax(c) => c; case _ => "" }
        val dt = sch.find(_.name == name).map(_.dataType).getOrElse(return None)
        if (!minMaxSafe(dt)) return None
        val rs = ranges(name).getOrElse(return None)
        var acc: Option[BigDecimal] = None
        for (st <- rs) {
          val v = statValue(st, if (isMin) st.min else st.max, dt)
            .getOrElse(return None)
          acc = acc match {
            case Some(x) => Some(if (isMin == (v < x)) v else x)
            case None => Some(v)
          }
        }
        values += Right((dt, acc))
    }
    Some(values.toSeq)
  }

  /** Aggregates over ONE file bucket. */
  private def aggsOf(
      files: Seq[DataFileMeta],
      aggs: Seq[MetaAgg],
      idCols: Set[String],
      statName: graft.lake.FilePruner.StatName,
      sch: StructType): Option[Seq[MetaValue]] = {
    val values = new scala.collection.mutable.ArrayBuffer[MetaValue]()
    for (a <- aggs) a match {
      case MCountStar =>
        values += Left(files.map(_.rowCount).sum)

      case MCount(name) =>
        values += Left(if (idCols.contains(name)) {
          // identity partition column: the hive NULL dir holds the nulls
          var n = 0L
          for (df <- files) df.partitionValues.get(name) match {
            case Some(Meta.NullPartition) => ()
            case Some(_) => n += df.rowCount
            case None => return None
          }
          n
        } else {
          var n = 0L
          for (df <- files) df.stats.get(statName(df, name)) match {
            case Some(st) if st.nulls >= 0 => n += df.rowCount - st.nulls
            case _ => return None // absent or UNKNOWN (-1) null count
          }
          n
        })

      case mm @ (MMin(_) | MMax(_)) =>
        val isMin = mm.isInstanceOf[MMin]
        val name = mm match { case MMin(c) => c; case MMax(c) => c; case _ => "" }
        val dt = sch.find(_.name == name).map(_.dataType).getOrElse(return None)
        if (!minMaxSafe(dt)) return None
        var acc: Option[BigDecimal] = None
        def fold(v: BigDecimal): Unit = acc = acc match {
          case Some(x) => Some(if (isMin == (v < x)) v else x)
          case None => Some(v)
        }
        if (idCols.contains(name)) {
          for (df <- files) df.partitionValues.get(name) match {
            case Some(Meta.NullPartition) => () // MIN/MAX skip nulls
            case Some(raw) => fold(partValue(raw, dt).getOrElse(return None))
            case None => return None
          }
        } else {
          for (df <- files) df.stats.get(statName(df, name)) match {
            case Some(st) =>
              fold(statValue(st, if (isMin) st.min else st.max, dt)
                .getOrElse(return None))
            case None => return None
          }
        }
        values += Right((dt, acc))
    }
    Some(values.toSeq)
  }

  /** Types whose hive-dir rendering round-trips exactly (GROUP BY key
    * columns must be one of these). */
  def groupTypeSupported(dt: DataType): Boolean = dt match {
    case StringType | ByteType | ShortType | IntegerType | LongType |
         BooleanType | DateType => true
    case _ => false
  }

  /** RAW group value (hive dir string, null = NULL dir) → Catalyst
    * internal value of the column's type, for LocalRelation rows. Only
    * types whose dir rendering round-trips exactly. */
  def internalGroupValue(raw: String, dt: DataType): Option[Any] = {
    if (raw == null) return Some(null)
    dt match {
      case StringType => Some(org.apache.spark.unsafe.types.UTF8String.fromString(raw))
      case ByteType => raw.toByteOption
      case ShortType => raw.toShortOption
      case IntegerType => raw.toIntOption
      case LongType => raw.toLongOption
      case BooleanType => raw.toBooleanOption
      case DateType =>
        try Some(java.time.LocalDate.parse(raw).toEpochDay.toInt)
        catch { case _: Throwable => None }
      case _ => None // timestamps/decimals: dir rendering not trusted
    }
  }

  /** RAW group value (hive dir string, null = NULL dir) → EXTERNAL row
    * value for the V1 bridge (needConversion=true) — the grouped DSv2
    * scan's key columns. Same supported set as [[internalGroupValue]]. */
  def externalGroupValue(raw: String, dt: DataType): Option[Any] = {
    if (raw == null) return Some(null)
    dt match {
      case StringType => Some(raw)
      case ByteType => raw.toByteOption
      case ShortType => raw.toShortOption
      case IntegerType => raw.toIntOption
      case LongType => raw.toLongOption
      case BooleanType => raw.toBooleanOption
      case DateType =>
        try Some(java.sql.Date.valueOf(java.time.LocalDate.parse(raw)))
        catch { case _: Throwable => None }
      case _ => None
    }
  }

  /** DSv2 entry (sessions WITHOUT GraftExtensions — with them,
    * GraftNativeScanRule substitutes a LocalRelation first): answers a
    * connector `Aggregation` as the scan's (readSchema, single result
    * row in EXTERNAL types for the V1 bridge). */
  def tryPush(
      table: GraftTable,
      asOf: Long,
      agg: Aggregation,
      filters: Array[Filter]): Option[(StructType, Seq[Any])] = {
    if (agg.groupByExpressions.nonEmpty) return None
    val funcs = agg.aggregateExpressions().toSeq
    val metas = funcs.map {
      case _: CountStar => MCountStar
      case c: Count if !c.isDistinct =>
        MCount(simpleName(c.column).getOrElse(return None))
      case mn: Min => MMin(simpleName(mn.column).getOrElse(return None))
      case mx: Max => MMax(simpleName(mx.column).getOrElse(return None))
      case _ => return None // SUM/AVG/distinct/UDAF: not metadata-answerable
    }
    computeAggs(table, asOf, metas, filters.toSeq).map { vals =>
      val fields = funcs.zip(vals).map {
        case (f, Left(_)) => StructField(f.toString, LongType, nullable = false)
        case (f, Right((dt, _))) => StructField(f.toString, dt, nullable = true)
      }
      val row = vals.map {
        case Left(n) => n
        case Right((dt, v)) => v.map(external(_, dt)).orNull
      }
      (StructType(fields), row)
    }
  }

  // ---- exact per-file filter evaluation -------------------------------------

  private def identityCols(specs: Seq[String]): Set[String] =
    try PartitionTransforms.parseAll(specs)
      .collect { case PIdentity(c) => c }.toSet
    catch { case _: Throwable => Set.empty }

  /** SQL three-valued evaluation of `f` against one file's identity
    * partition value — sound because every row of the file shares that
    * value. None = cannot decide exactly (missing value, type we don't
    * model); Some(v) = every row of the file evaluates to v (UNKNOWN
    * behaves as false, which is exactly how a WHERE clause treats it —
    * including under NOT, handled via eval3). */
  private[sql] def eval(f: Filter, df: DataFileMeta, sch: StructType): Option[Boolean] =
    eval3(f, df, sch).map(_.contains(true))

  /** Some(Some(b)) decided, Some(None) = SQL UNKNOWN, None = undecidable. */
  private def eval3(f: Filter, df: DataFileMeta, sch: StructType): Option[Option[Boolean]] = {
    def value(col: String): Option[Option[BigDecimal]] = // None=missing, Some(None)=SQL null
      df.partitionValues.get(col) match {
        case Some(Meta.NullPartition) => Some(None)
        case Some(raw) =>
          sch.find(_.name == col).map(_.dataType)
            .flatMap(dt => partValue(raw, dt)).map(v => Some(v))
        case None => None
      }
    def cmp(col: String, lit: Any, op: Int => Boolean): Option[Option[Boolean]] =
      value(col).flatMap {
        case None => Some(None) // null <op> x is UNKNOWN
        case Some(pv) =>
          sch.find(_.name == col).map(_.dataType)
            .flatMap(dt => litValue(lit, dt))
            .map(lv => Some(op(pv.compare(lv))))
      }
    f match {
      case sources.EqualTo(c, v) => cmp(c, v, _ == 0)
      case sources.GreaterThan(c, v) => cmp(c, v, _ > 0)
      case sources.GreaterThanOrEqual(c, v) => cmp(c, v, _ >= 0)
      case sources.LessThan(c, v) => cmp(c, v, _ < 0)
      case sources.LessThanOrEqual(c, v) => cmp(c, v, _ <= 0)
      case sources.EqualNullSafe(c, v) =>
        value(c).flatMap {
          case None => Some(Some(v == null))
          case Some(pv) =>
            if (v == null) Some(Some(false))
            else sch.find(_.name == c).map(_.dataType)
              .flatMap(dt => litValue(v, dt)).map(lv => Some(pv.compare(lv) == 0))
        }
      case sources.In(c, vs) =>
        // three-valued IN: true if any member matches; else UNKNOWN if the
        // value is null (or any member is null); else false
        value(c).flatMap {
          case None => Some(None)
          case Some(pv) =>
            val dt = sch.find(_.name == c).map(_.dataType).getOrElse(return None)
            var sawNull = false
            var hit = false
            for (v <- vs) {
              if (v == null) sawNull = true
              else litValue(v, dt) match {
                case Some(lv) => if (pv.compare(lv) == 0) hit = true
                case None => return None
              }
            }
            Some(if (hit) Some(true) else if (sawNull) None else Some(false))
        }
      case sources.IsNull(c) => value(c).map(v => Some(v.isEmpty))
      case sources.IsNotNull(c) => value(c).map(v => Some(v.nonEmpty))
      case sources.And(l, r) =>
        for (a <- eval3(l, df, sch); b <- eval3(r, df, sch)) yield (a, b) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true)) => Some(true)
          case _ => None
        }
      case sources.Or(l, r) =>
        for (a <- eval3(l, df, sch); b <- eval3(r, df, sch)) yield (a, b) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false)) => Some(false)
          case _ => None
        }
      case sources.Not(inner) =>
        eval3(inner, df, sch).map(_.map(!_))
      case _: sources.AlwaysTrue => Some(Some(true))
      case _: sources.AlwaysFalse => Some(Some(false))
      case _ => None
    }
  }

  // ---- typed value domains ---------------------------------------------------
  // Everything comparable collapses into BigDecimal: exact for integrals,
  // epoch days (date), epoch micros (timestamp) and decimals — the only
  // types admitted. Strings ride a stable order-preserving injection.

  private[sql] def partValue(raw: String, dt: DataType): Option[BigDecimal] = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      raw.toLongOption.map(BigDecimal(_))
    case DateType =>
      try Some(BigDecimal(java.time.LocalDate.parse(raw).toEpochDay))
      catch { case _: Throwable => None }
    case TimestampType | TimestampNTZType =>
      tsMicros(raw).map(BigDecimal(_))
    case _: DecimalType =>
      try Some(BigDecimal(raw.trim)) catch { case _: Throwable => None }
    case StringType => Some(strEmbed(raw))
    case BooleanType => raw.toBooleanOption.map(b => BigDecimal(if (b) 1 else 0))
    case _ => None
  }

  /** v1 Filter literal → same domain as `partValue`. */
  private def litValue(v: Any, dt: DataType): Option[BigDecimal] = (dt, v) match {
    case (ByteType | ShortType | IntegerType | LongType, n: Number)
        if !v.isInstanceOf[java.lang.Double] && !v.isInstanceOf[java.lang.Float] =>
      Some(BigDecimal(n.longValue()))
    case (DateType, d: java.sql.Date) => Some(BigDecimal(d.toLocalDate.toEpochDay))
    case (DateType, d: java.time.LocalDate) => Some(BigDecimal(d.toEpochDay))
    case (TimestampType, t: java.sql.Timestamp) =>
      Some(BigDecimal(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)))
    case (TimestampType, i: java.time.Instant) =>
      Some(BigDecimal(org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i)))
    case (TimestampNTZType, t: java.time.LocalDateTime) =>
      Some(BigDecimal(t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000))
    case (_: DecimalType, d: java.math.BigDecimal) => Some(BigDecimal(d))
    case (_: DecimalType, d: BigDecimal) => Some(d)
    case (_: DecimalType, n: Number)
        if !v.isInstanceOf[java.lang.Double] && !v.isInstanceOf[java.lang.Float] =>
      Some(BigDecimal(n.longValue()))
    case (StringType, s: String) => Some(strEmbed(s))
    case (BooleanType, b: java.lang.Boolean) => Some(BigDecimal(if (b) 1 else 0))
    case _ => None
  }

  /** Order-preserving embedding of a string into BigDecimal: CODE POINTS
    * become fixed-base digits after the decimal point, each +1 so a
    * prefix sorts strictly below its extensions. Code-point order equals
    * Spark's UTF8String unsigned-byte order (UTF-16 char order would NOT —
    * surrogate pairs sort below U+E000..U+FFFF there).
    *
    * EXACTNESS is load-bearing and subtle: scala.math.BigDecimal's
    * default MathContext silently ROUNDS +, * and / at 34 digits, which
    * collapsed any two strings sharing a ~6-char prefix to EQUAL
    * embeddings — metadata-only aggregates then counted OTHER
    * partitions' rows ('2024-01-01' compared equal to '2024-01-02').
    * So: java.math.BigDecimal with unlimited precision, and the digit
    * base is 2^21 (≥ 0x10FFFF+2) — a power of two, whose reciprocal
    * TERMINATES in decimal, making every divide() exact (a non-power
    * base would throw ArithmeticException on the unlimited divide). */
  private def strEmbed(s: String): BigDecimal = {
    val base = new java.math.BigDecimal(1 << 21)
    var acc = java.math.BigDecimal.ZERO
    var scale = java.math.BigDecimal.ONE
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      scale = scale.divide(base) // exact: terminating expansion
      acc = acc.add(scale.multiply(new java.math.BigDecimal(cp + 1)))
      i += Character.charCount(cp)
    }
    // consumers only COMPARE embeddings (compare is exact regardless of
    // MathContext); UNLIMITED guards any future arithmetic use
    new BigDecimal(acc, java.math.MathContext.UNLIMITED)
  }

  /** Mirrors FilePruner.parseTimestampMicros (incl. the date-only
    * fallback — a hive dir can render midnight timestamps date-only);
    * keep the two in sync. */
  private def tsMicros(raw: String): Option[Long] = {
    val t = raw.trim
    try {
      val ldt = java.time.LocalDateTime.parse(t.replace(' ', 'T'))
      Some(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L)
    } catch {
      case _: Throwable =>
        try Some(java.time.LocalDate.parse(t).toEpochDay * 86400000000L)
        catch { case _: Throwable => None }
    }
  }

  // ---- MIN/MAX stat domains --------------------------------------------------

  /** Types whose parquet footer min/max are EXACT: integrals and
    * date/timestamp (tag "l"), decimals (tag "c"). Strings can be
    * truncated, float/double stats ignore NaN — both refused. */
  private[sql] def minMaxSafe(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | _: DecimalType => true
    case _ => false
  }

  private[sql] def statValue(st: ColStats, s: String, dt: DataType): Option[BigDecimal] =
    (st.tag, dt) match {
      case ("l", ByteType | ShortType | IntegerType | LongType | DateType |
                 TimestampType | TimestampNTZType) =>
        s.toLongOption.map(BigDecimal(_))
      case ("c", _: DecimalType) =>
        try Some(BigDecimal(s.trim)) catch { case _: Throwable => None }
      case _ => None // tag/type mismatch (e.g. pre-widening epoch): refuse
    }

  /** Domain value → Catalyst INTERNAL value (for a LocalRelation row):
    * dates are epoch days (Int), timestamps epoch micros (Long), decimals
    * `types.Decimal`. */
  def internal(v: BigDecimal, dt: DataType): Any = dt match {
    case ByteType => v.toLong.toByte
    case ShortType => v.toLong.toShort
    case IntegerType | DateType => v.toLong.toInt
    case LongType | TimestampType | TimestampNTZType => v.toLong
    case d: DecimalType =>
      Decimal(v.underlying().setScale(d.scale), d.precision, d.scale)
    case _ => throw new IllegalStateException(s"unreachable: $dt passed minMaxSafe")
  }

  /** Domain value → external row value for the V1 bridge
    * (needConversion=true: java.sql / java.math types). */
  private[sql] def external(v: BigDecimal, dt: DataType): Any = dt match {
    case ByteType => v.toLong.toByte
    case ShortType => v.toLong.toShort
    case IntegerType => v.toLong.toInt
    case LongType => v.toLong
    case DateType =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaDate(v.toInt)
    case TimestampType =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(v.toLong)
    case TimestampNTZType =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.microsToLocalDateTime(v.toLong)
    case d: DecimalType => v.underlying().setScale(d.scale)
    case _ => throw new IllegalStateException(s"unreachable: $dt passed minMaxSafe")
  }

  private[sql] def simpleName(e: Expression): Option[String] = e match {
    case r: NamedReference if r.fieldNames().length == 1 => Some(r.fieldNames()(0))
    case _ => None
  }
}
