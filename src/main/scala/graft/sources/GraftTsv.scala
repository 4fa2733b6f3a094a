package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, AggregateFunc, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 read connector for a minimal stats-indexed
  * text format ("graft-tsv"): one escaped TSV file per write partition,
  * each carrying a `#graft-tsv <ver> <minId> <maxId> <nRows>` header —
  * the file-level zone map. The connector implements the two scan
  * contracts that matter at 100 TB:
  *
  *   - `SupportsPushDownRequiredColumns`: readers parse and materialize
  *     ONLY the pruned schema (a 2-column projection never pays for the
  *     text payload);
  *   - `SupportsPushDownFilters`: doc_id range predicates prune whole
  *     FILES against the header zone map at planning time — the same
  *     contract parquet row-group skipping provides. Pushed filters are
  *     reported for `explain` but also kept as residuals, so Spark
  *     re-evaluates them row-level (the parquet posture: skipping is an
  *     optimization, never a correctness dependency).
  *
  * The write path is V2 as well ([[GraftTsvWrite]]): the Write
  * declares `RequiresDistributionAndOrdering` (range on doc_id), so
  * Catalyst plans the exchange that makes every file's zone map
  * disjoint — the layout that skipping depends on is enforced by the
  * sink, not caller discipline — and commits two-phase via temp-file
  * rename. At 100 TB the driver-side header sweep in
  * `planInputPartitions` becomes a manifest/footer-cache read — same
  * plan shape, different stats medium. No compression and a fixed
  * schema keep this honest: it is an exercise of the V2 connector
  * contracts, not a parquet replacement.
  */
object GraftTsv {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("text", StringType)))

  /** Files actually opened by readers — observability for the
    * file-skipping spec (single-JVM local mode reads it directly).
    */
  val filesOpened = new AtomicLong(0)

  private[graft] def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")

  private[graft] def unesc(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't'  => b.append('\t')
          case 'n'  => b.append('\n')
          case '\\' => b.append('\\')
          case o    => b.append('\\').append(o)
        }
        i += 2
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Overwrite `outDir` through the V2 sink. The Write declares its
    * required distribution (range on doc_id, `files` partitions), so
    * the disjoint-zone-map layout is enforced by the connector — not by
    * caller discipline.
    */
  def write(df: DataFrame, outDir: String, files: Int): Unit =
    df.select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("text"))
      .write.format("graft-tsv").option("files", files.toString)
      .mode("overwrite").save(outDir)

  /** Overwrite `outDir` key-grouped on `lang`: the Write declares a
    * CLUSTERED distribution on lang, the writer emits one single-lang
    * file per (task, lang) with the lang stamped in a v2 header, and
    * the read side then reports `KeyGroupedPartitioning(identity(lang))`
    * — the layout contract behind storage-partitioned joins.
    */
  def writePartitioned(df: DataFrame, outDir: String, files: Int): Unit =
    df.select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("text"))
      .write.format("graft-tsv").option("files", files.toString)
      .option("partitionBy", "lang")
      .mode("overwrite").save(outDir)

  /** Parsed `#graft-tsv` header. v1: `ver mn mx n`; v2 adds the
    * escaped partition value (the file's single lang) as a 6th field.
    */
  private[graft] case class Header(ver: Int, mn: Long, mx: Long, n: Long,
      pv: Option[String])

  private[graft] def readHeader(f: Path): Header = {
    val r = Files.newBufferedReader(f, StandardCharsets.UTF_8)
    val line = try r.readLine() finally r.close()
    val parts = line.split("\t")
    require(parts.length >= 5 && parts(0) == "#graft-tsv",
      s"not a graft-tsv file: $f")
    Header(parts(1).toInt, parts(2).toLong, parts(3).toLong, parts(4).toLong,
      if (parts.length >= 6) Some(unesc(parts(5))) else None)
  }

  private[graft] def listGtsv(path: String): Seq[Path] = {
    val p = Paths.get(path)
    if (!Files.isDirectory(p)) Seq.empty
    else Files.list(p).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".gtsv"))
      .toSeq.sortBy(_.toString)
  }

  /** [lo, hi] bound on doc_id implied by the pushed filters (None side
    * = unbounded). Only doc_id comparisons participate in skipping.
    */
  private[sources] def idBounds(filters: Array[Filter]): (Option[Long], Option[Long]) = {
    var lo = Option.empty[Long]
    var hi = Option.empty[Long]
    def tightenLo(v: Long): Unit = if (lo.forall(_ < v)) lo = Some(v)
    def tightenHi(v: Long): Unit = if (hi.forall(_ > v)) hi = Some(v)
    filters.foreach {
      case GreaterThanOrEqual("doc_id", v: Long) => tightenLo(v)
      case GreaterThan("doc_id", v: Long)        => tightenLo(v + 1)
      case LessThanOrEqual("doc_id", v: Long)    => tightenHi(v)
      case LessThan("doc_id", v: Long)           => tightenHi(v - 1)
      case EqualTo("doc_id", v: Long)            => tightenLo(v); tightenHi(v)
      case _                                     => ()
    }
    (lo, hi)
  }

  private[sources] def skippable(f: Filter): Boolean = f match {
    case GreaterThanOrEqual("doc_id", _: Long) | GreaterThan("doc_id", _: Long) |
        LessThanOrEqual("doc_id", _: Long) | LessThan("doc_id", _: Long) |
        EqualTo("doc_id", _: Long) => true
    case EqualTo("lang", _: String) => true
    case org.apache.spark.sql.sources.In("lang", _) => true
    case _ => false
  }

  /** Lang values allowed by the pushed filters (None = unconstrained).
    * Used to prune whole single-lang files of a partitioned generation
    * by their header partition value — partition pruning on the
    * key-grouped layout.
    */
  private[sources] def langSet(filters: Array[Filter]): Option[Set[String]] = {
    val sets = filters.collect {
      case EqualTo("lang", v: String) => Set(v)
      case org.apache.spark.sql.sources.In("lang", vs) =>
        vs.collect { case s: String => s }.toSet
    }
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }
}

class GraftTsvProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tsv"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTsv.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftTsvTable(properties.get("path"))
}

class GraftTsvTable(path: String) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  require(path != null, "graft-tsv requires a path")
  override def name(): String = s"graft-tsv:$path"
  override def schema(): StructType = GraftTsv.schema
  /** identity(lang) when every committed file is lang-stamped (a
    * writePartitioned generation) — the table-level half of the
    * storage-partitioned-join contract.
    */
  override def partitioning(): Array[Transform] = {
    val hs = GraftTsv.listGtsv(path).map(GraftTsv.readHeader)
    if (hs.nonEmpty && hs.forall(_.pv.isDefined))
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .identity("lang"))
    else Array.empty
  }
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftTsvScanBuilder(path,
      Option(options.get("maxFilesPerTrigger")).map(_.toInt).getOrElse(2))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new GraftTsvWriteBuilder(path, info)
}

class GraftTsvScanBuilder(path: String, perTrigger: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  private var required: StructType = GraftTsv.schema
  private var pushed: Array[Filter] = Array.empty
  private var aggFuncs: Option[Seq[AggregateFunc]] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(GraftTsv.skippable)
    filters // all residual: skipping is an optimization, never correctness
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ---- aggregate pushdown: COUNT / MIN(doc_id) / MAX(doc_id) -------
  // The header line (`#graft-tsv 1 <minId> <maxId> <nRows>`) already IS
  // the per-file aggregate, so a global count/min/max is one driver-side
  // header sweep — zero rows read, zero tasks doing row work. Complete
  // pushdown only (Spark plans no final aggregate), and only in the
  // cases the headers answer exactly:
  //   - no grouping, no pushed filters (a residual doc_id range could
  //     cut files in half — headers can't answer that);
  //   - COUNT(*) / COUNT(1) / non-distinct COUNT(doc_id|n_chars) (both
  //     non-null by the writer's contract), MIN/MAX over doc_id (the
  //     zone-mapped column).
  private def isNonNullCol(e: org.apache.spark.sql.connector.expressions.Expression)
      : Boolean = e match {
    case r: NamedReference =>
      r.fieldNames.toSeq == Seq("doc_id") || r.fieldNames.toSeq == Seq("n_chars")
    case _ => false
  }
  private def isDocId(e: org.apache.spark.sql.connector.expressions.Expression)
      : Boolean = e match {
    case r: NamedReference => r.fieldNames.toSeq == Seq("doc_id")
    case _ => false
  }
  private def canPush(a: Aggregation): Boolean =
    pushed.isEmpty && a.groupByExpressions.isEmpty &&
      a.aggregateExpressions.nonEmpty &&
      a.aggregateExpressions.forall {
        case _: CountStar => true
        case c: Count     => !c.isDistinct && isNonNullCol(c.column)
        case m: Min       => isDocId(m.column)
        case m: Max       => isDocId(m.column)
        case _            => false
      }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    canPush(aggregation)
  override def pushAggregation(aggregation: Aggregation): Boolean =
    canPush(aggregation) && {
      aggFuncs = Some(aggregation.aggregateExpressions.toSeq); true
    }

  override def build(): Scan = aggFuncs match {
    case Some(fs) => new GraftTsvAggScan(path, fs)
    case None     => new GraftTsvScan(path, required, pushed, perTrigger)
  }
}

/** Scan produced when an aggregation was completely pushed down: one
  * header sweep on the driver computes the final values, one empty-work
  * task emits the single result row.
  */
class GraftTsvAggScan(path: String, funcs: Seq[AggregateFunc])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(funcs.zipWithIndex.map {
    case (f, i) => StructField(s"agg_$i", LongType,
      nullable = !(f.isInstanceOf[CountStar] || f.isInstanceOf[Count]))
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-tsv $path, PushedAggregates: ${funcs.mkString("[", ", ", "]")}"

  override def planInputPartitions(): Array[InputPartition] = {
    var n = 0L
    var mn = Option.empty[Long]
    var mx = Option.empty[Long]
    GraftTsv.listGtsv(path).foreach { f =>
      val h = GraftTsv.readHeader(f)
      n += h.n
      if (h.n > 0) {
        mn = Some(mn.fold(h.mn)(math.min(_, h.mn)))
        mx = Some(mx.fold(h.mx)(math.max(_, h.mx)))
      }
    }
    val row: Array[Any] = funcs.map {
      case _: CountStar | _: Count => n: java.lang.Long
      case _: Min                  => mn.map(Long.box).orNull
      case _: Max                  => mx.map(Long.box).orNull
      case f => throw new IllegalStateException(s"unpushable aggregate $f")
    }.toArray
    Array(GraftTsvAggPartition(row))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftTsvAggReaderFactory
}

case class GraftTsvAggPartition(row: Array[Any]) extends InputPartition

class GraftTsvAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = new PartitionReader[InternalRow] {
    private var done = false
    private val vals = partition.asInstanceOf[GraftTsvAggPartition].row
    override def next(): Boolean = if (done) false else { done = true; true }
    override def get(): InternalRow = new GenericInternalRow(vals)
    override def close(): Unit = ()
  }
}

class GraftTsvScan(path: String, required: StructType, pushed: Array[Filter],
    perTrigger: Int) extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Runtime (join-fed) doc_id filter state. BatchScanExec evaluates
    * the dynamic-pruning subquery after the build side materializes,
    * calls [[filter]] with the resulting IN-list, then re-plans input
    * partitions — the DSv2 analog of DPP, reaching file-level zone
    * maps instead of hive partitions. Mutating the Scan is the
    * designed contract (the interface is documented as narrowing this
    * scan's partitions in place).
    */
  @volatile private var runtimeIds: Option[Set[Long]] = None

  /** Only advertise doc_id while it survives column pruning: the DPP
    * rule RESOLVES these refs against this scan's (pruned) output and
    * throws on a miss — a projection that drops doc_id must simply opt
    * out of runtime filtering, not break planning.
    */
  override def filterAttributes(): Array[NamedReference] =
    if (required.fieldNames.contains("doc_id"))
      Array(org.apache.spark.sql.connector.expressions.Expressions.column("doc_id"))
    else Array.empty

  override def filter(filters: Array[Filter]): Unit = {
    val sets = filters.collect {
      case org.apache.spark.sql.sources.In("doc_id", vs) =>
        vs.collect { case n: java.lang.Number => n.longValue() }.toSet
      case EqualTo("doc_id", v: Long) => Set(v)
    }
    if (sets.nonEmpty) {
      runtimeIds = Some(sets.reduce(_ intersect _))
      // The survivor snapshot predates the runtime filter — recompute so
      // the re-planned partitions see the narrowed set.
      survivorCache = null
    }
  }

  /** True iff the zone map [mn, mx] can contain any runtime-filtered
    * id. A dim-sized IN-list is checked exactly; a huge one (beyond a
    * bound where per-file membership sweeps would dominate planning)
    * degrades to its min/max envelope — coarser pruning, never wrong.
    */
  private def runtimeOverlaps(mn: Long, mx: Long): Boolean =
    runtimeIds match {
      case None => true
      case Some(ids) if ids.isEmpty => false
      case Some(ids) if ids.size <= 10000 => ids.exists(id => id >= mn && id <= mx)
      case Some(ids) => ids.min <= mx && ids.max >= mn
    }

  /** Header-derived stats for the surviving (zone-map-overlapping)
    * files: exact row count, on-disk byte size. This is what lets the
    * planner see a selectively-filtered graft-tsv side as small enough
    * to broadcast — the stats surface a real lake format feeds the CBO
    * from its footer/manifest metadata.
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val (lo, hi) = GraftTsv.idBounds(pushed)
    var rows = 0L
    var bytes = 0L
    GraftTsv.listGtsv(path).foreach { f =>
      val h = GraftTsv.readHeader(f)
      if (lo.forall(_ <= h.mx) && hi.forall(_ >= h.mn)) {
        rows += h.n
        bytes += Files.size(f)
      }
    }
    val (r, b) = (rows, bytes)
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(b)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(r)
    }
  }
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftTsvMicroBatchStream(path, required, perTrigger)
  override def description(): String =
    s"graft-tsv $path, PushedFilters: ${pushed.mkString("[", ", ", "]")}"

  /** Memoized survivor set: [[outputPartitioning]] and
    * [[planInputPartitions]] must see ONE listing instant — each
    * recomputing against the live directory (and mutable runtime-filter
    * state) could report a partitioning that disagrees with the planned
    * partitions. Invalidated by [[filter]] so runtime pruning still
    * reaches the re-planned partitions.
    */
  @volatile private var survivorCache: Seq[(String, GraftTsv.Header)] = null

  private def survivorSnapshot(): Seq[(String, GraftTsv.Header)] = {
    var s = survivorCache
    if (s == null) synchronized {
      if (survivorCache == null) survivorCache = survivors()
      s = survivorCache
    }
    s
  }

  /** Surviving (file, header) pairs: the header zone map is checked
    * against the pushed doc_id bounds (and any runtime IN-list) and
    * non-overlapping files never become tasks.
    */
  private def survivors(): Seq[(String, GraftTsv.Header)] = {
    val (lo, hi) = GraftTsv.idBounds(pushed)
    val langs = GraftTsv.langSet(pushed)
    GraftTsv.listGtsv(path).flatMap { f =>
      val h = GraftTsv.readHeader(f)
      // v1 files carry no partition value and can never be lang-pruned;
      // a stamped file is pruned when its lang is outside the pushed
      // set (the filter stays residual, so this is never correctness).
      val langOk = h.pv.forall(pv => langs.forall(_.contains(pv)))
      val overlaps = lo.forall(_ <= h.mx) && hi.forall(_ >= h.mn) &&
        langOk && runtimeOverlaps(h.mn, h.mx)
      if (overlaps) Some(f.toString -> h) else None
    }
  }

  /** Key-grouped read is reported only when every surviving file is
    * lang-stamped AND lang survives column pruning (the partitioning
    * expression must resolve against this scan's output) AND nothing
    * can narrow the file set per-file within a lang group: a runtime
    * IN-list or pushed doc_id bound could prune ALL files of one lang,
    * making the reported group count disagree with what the SPJ
    * machinery later observes on the other join side — so those scans
    * decline key-grouping (losing only the shuffle elision, never
    * correctness).
    */
  private def keyGrouped(ss: Seq[(String, GraftTsv.Header)]): Boolean =
    ss.nonEmpty && ss.forall(_._2.pv.isDefined) &&
      required.fieldNames.contains("lang") &&
      runtimeIds.isEmpty &&
      GraftTsv.idBounds(pushed) == ((None, None))

  /** One partition per surviving file — or, for a lang-partitioned
    * generation, one per lang carrying all of its files plus the
    * partition KEY, which is what lets Spark plan storage-partitioned
    * joins and shuffle-free aggregates over this source.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val ss = survivorSnapshot()
    if (keyGrouped(ss))
      ss.groupBy(_._2.pv.get).toSeq.sortBy(_._1)
        .map { case (pv, fs) =>
          GraftTsvGroupPartition(fs.map(_._1), pv): InputPartition
        }.toArray
    else ss.map { case (f, _) => GraftTsvPartition(f): InputPartition }.toArray
  }

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    val ss = survivorSnapshot()
    if (keyGrouped(ss))
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .identity("lang")),
        ss.groupBy(_._2.pv.get).size)
    else new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
      ss.size)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftTsvReaderFactory(required)
}

case class GraftTsvPartition(file: String) extends InputPartition

/** All files of one lang of a partitioned generation; the partition
  * key is what the storage-partitioned-join machinery clusters on.
  */
case class GraftTsvGroupPartition(files: Seq[String], pv: String)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(pv)))
}

class GraftTsvReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: GraftTsvPartition => new GraftTsvReader(p.file, required)
      case g: GraftTsvGroupPartition => new GraftTsvChainReader(g.files, required)
    }
}

/** Sequential reader over one key group's files. */
class GraftTsvChainReader(files: Seq[String], required: StructType)
    extends PartitionReader[InternalRow] {
  private val it = files.iterator
  private var cur: GraftTsvReader = _
  override def next(): Boolean = {
    while (true) {
      if (cur == null) {
        if (!it.hasNext) return false
        cur = new GraftTsvReader(it.next(), required)
      }
      if (cur.next()) return true
      cur.close(); cur = null
    }
    false
  }
  override def get(): InternalRow = cur.get()
  override def close(): Unit = if (cur != null) cur.close()
}

/** Line reader materializing ONLY the pruned columns (projection
  * pushdown happens here, not in a Project above the scan).
  */
class GraftTsvReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {
  GraftTsv.filesOpened.incrementAndGet()
  private val in = Files.newBufferedReader(Paths.get(file), StandardCharsets.UTF_8)
  in.readLine() // header
  // Field index in the file for each required column, fixed up front.
  private val srcIdx = required.fields.map(f =>
    GraftTsv.schema.fieldIndex(f.name))
  private var row: InternalRow = _

  override def next(): Boolean = {
    val line = in.readLine()
    if (line == null) false
    else {
      val cells = line.split("\t", -1)
      val vals = new Array[Any](srcIdx.length)
      var i = 0
      while (i < srcIdx.length) {
        vals(i) = srcIdx(i) match {
          case 0 => cells(0).toLong
          case 3 => cells(3).toLong
          case j => UTF8String.fromString(GraftTsv.unesc(cells(j)))
        }
        i += 1
      }
      row = new GenericInternalRow(vals)
      true
    }
  }
  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

/** V2 write path. The Write declares `RequiresDistributionAndOrdering`:
  * ordered distribution on doc_id — so CATALYST plans the range
  * exchange + in-partition sort that makes every file's zone map
  * disjoint. The layout contract that file skipping depends on is
  * enforced by the sink itself, not by caller discipline (the failure
  * mode where someone forgets repartitionByRange and silently writes
  * overlapping zone maps cannot happen). Commit is two-phase: tasks
  * write `_tmp-*` files, the driver's commit() renames survivors and
  * (for truncate/overwrite) deletes the previous generation; abort()
  * reaps temps — so readers never observe a half-written directory on
  * a local/posix-rename filesystem.
  */
class GraftTsvWriteBuilder(path: String,
    info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write = {
    // Append is rejected by contract, not just untested: a commit is a
    // full generation whose per-file zone maps tile the doc_id range.
    // Appending a second range-partitioned generation would (a) clobber
    // same-numbered part-NNNNN files via REPLACE_EXISTING while leaving
    // the rest of the old generation in place — a silent mix of
    // generations with duplicate rows — and (b) interleave overlapping
    // zone maps, breaking the disjointness that file skipping relies on.
    require(doTruncate,
      "graft-tsv batch writes require mode(\"overwrite\"): the sink " +
        "commits whole generations with disjoint zone maps; append would " +
        "mix generations and clobber same-numbered part files")
    val names = info.schema().fields.map(_.name).toSeq
    val want = GraftTsv.schema.fields.map(_.name).toSeq
    require(names == want, s"graft-tsv writes schema $want, got $names")
    val files = Option(info.options.get("files")).map(_.toInt).getOrElse(8)
    val partitioned = Option(info.options.get("partitionBy")) match {
      case None => false
      case Some("lang") => true
      case Some(o) => throw new IllegalArgumentException(
        s"graft-tsv supports partitionBy=lang only, got $o")
    }
    new GraftTsvWrite(path, doTruncate, files, partitioned)
  }
}

class GraftTsvWrite(path: String, truncate: Boolean, files: Int,
    partitioned: Boolean)
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering
    with org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.{distributions => D}
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}

  private def order = Array(
    Expressions.sort(Expressions.column("doc_id"), SortDirection.ASCENDING))
  /** Plain generations range-cluster on doc_id (disjoint zone maps);
    * lang-partitioned generations cluster on lang so each task sees
    * whole langs, and the writer splits per lang within the task.
    * In-partition doc_id ordering holds in both modes.
    */
  override def requiredDistribution(): D.Distribution =
    if (partitioned) D.Distributions.clustered(
      Array(Expressions.column("lang")))
    else D.Distributions.ordered(order)
  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = order
  override def requiredNumPartitions(): Int = files
  override def toBatch: org.apache.spark.sql.connector.write.BatchWrite = this

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    new GraftTsvWriterFactory(path, partitioned)

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    if (truncate) {
      Files.list(dir).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".gtsv"))
        .foreach(Files.delete)
    }
    messages.collect { case m: GraftTsvCommit => m }
      .foreach(_.moves.foreach { case (tmp, fin) =>
        Files.move(Paths.get(tmp), Paths.get(path, fin),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      })
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit =
    messages.collect { case m: GraftTsvCommit => m }
      .foreach(_.moves.foreach { case (tmp, _) =>
        Files.deleteIfExists(Paths.get(tmp))
      })
}

case class GraftTsvCommit(moves: Seq[(String, String)], nRows: Long)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

class GraftTsvWriterFactory(path: String, partitioned: Boolean)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new GraftTsvWriter(path, partitionId, taskId, partitioned)
}

/** Buffers its (already clustered, doc_id-sorted) partition — one
  * buffer per lang when partitioned (each becomes its own single-lang
  * v2-stamped file) or a single buffer otherwise — and stamps the
  * zone-map header from the observed min/max ids on commit.
  */
class GraftTsvWriter(path: String, partitionId: Int, taskId: Long,
    partitioned: Boolean)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private final class Buf {
    val rows = Vector.newBuilder[String]
    var n = 0L
    var mn = Long.MaxValue
    var mx = Long.MinValue
  }
  // Insertion-ordered so file numbering is deterministic per task.
  private val bufs = mutable.LinkedHashMap.empty[String, Buf]
  private def key(lang: String): String = if (partitioned) lang else ""

  override def write(r: InternalRow): Unit = {
    // The format has no null encoding (every cell is a mandatory field
    // of the zone-mapped layout), so nulls are a caller error — fail
    // with the column name instead of an NPE deep in getUTF8String.
    var i = 0
    while (i < GraftTsv.schema.length) {
      if (r.isNullAt(i)) throw new IllegalArgumentException(
        s"graft-tsv cannot write null ${GraftTsv.schema(i).name} " +
          s"(partition $partitionId): the format has no null " +
          "encoding; filter or coalesce nulls before writing")
      i += 1
    }
    val id = r.getLong(0)
    val lang = r.getUTF8String(1).toString
    val b = bufs.getOrElseUpdate(key(lang), new Buf)
    b.mn = math.min(b.mn, id); b.mx = math.max(b.mx, id); b.n += 1
    b.rows += s"$id\t${GraftTsv.esc(lang)}\t" +
      s"${GraftTsv.esc(r.getUTF8String(2).toString)}\t${r.getLong(3)}\t" +
      s"${GraftTsv.esc(r.getUTF8String(4).toString)}"
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    Files.createDirectories(Paths.get(path))
    val moves = bufs.toSeq.zipWithIndex.map { case ((k, b), i) =>
      val fin =
        if (partitioned) f"part-$partitionId%05d-$i%02d.gtsv"
        else f"part-$partitionId%05d.gtsv"
      val tmp = Paths.get(path, s"_tmp-$fin-$taskId")
      val header =
        if (partitioned)
          s"#graft-tsv\t2\t${b.mn}\t${b.mx}\t${b.n}\t${GraftTsv.esc(k)}"
        else s"#graft-tsv\t1\t${b.mn}\t${b.mx}\t${b.n}"
      val body = header + "\n" + b.rows.result().mkString("", "\n", "\n")
      Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
      tmp.toString -> fin
    }
    GraftTsvCommit(moves, bufs.valuesIterator.map(_.n).sum)
  }

  override def abort(): Unit = ()
  override def close(): Unit = ()
}

/** Streaming half of the connector: the gtsv directory as an
  * incremental file source. Offsets are indexes into the name-sorted
  * file list (files are immutable once committed — the rename in
  * [[GraftTsvWrite.commit]] is what makes "visible implies complete"
  * true), `maxFilesPerTrigger` paces admission, and
  * `SupportsTriggerAvailableNow` pins the target at stream start so an
  * AvailableNow run drains exactly the files that existed then, in
  * bounded micro-batches, and stops. Batch and streaming share the
  * reader factory — one parsing path to test, two execution modes.
  */
class GraftTsvMicroBatchStream(path: String, required: StructType,
    perTrigger: Int)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private def allFiles(): Array[String] =
    Files.list(Paths.get(path)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".gtsv")).toArray.sorted

  @volatile private var pinned: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    pinned = Some(allFiles().length.toLong)

  private def target: Long = pinned.getOrElse(allFiles().length.toLong)

  /** Fingerprint of the first n files of the (sorted) listing. Offsets
    * carry it so a checkpoint restart can detect that the directory was
    * rewritten under the checkpoint (new overwrite generation, files
    * renamed/recounted): a bare positional index would silently remap
    * to different files, duplicating or skipping data. The digest folds
    * in each file's CONTENT identity — header zone map (mn, mx, n,
    * partition value) and byte size — not just its name: the writer
    * emits deterministic part-NNNNN names, so an overwrite generation
    * with the same file count reproduces the name list exactly and a
    * name-only digest would wave the rewrite through.
    */
  private def sig(fs: Array[String], n: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    fs.take(n).foreach { f =>
      val p = Paths.get(f)
      val h = GraftTsv.readHeader(p)
      val line = s"${p.getFileName}\t${h.ver}\t${h.mn}\t${h.mx}\t${h.n}\t" +
        s"${h.pv.getOrElse("")}\t${Files.size(p)}\n"
      md.update(line.getBytes(StandardCharsets.UTF_8))
    }
    md.digest().map(b => f"$b%02x").mkString
  }

  override def initialOffset(): Offset = GraftTsvOffset(0, sig(Array.empty, 0))
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit)")
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftTsvOffset].n
    val fs = allFiles()
    val e = math.min(s + perTrigger, target).toInt
    GraftTsvOffset(e.toLong, sig(fs, e))
  }
  override def reportLatestOffset(): Offset = {
    val fs = allFiles()
    GraftTsvOffset(target, sig(fs, target.toInt))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val so = start.asInstanceOf[GraftTsvOffset]
    val eo = end.asInstanceOf[GraftTsvOffset]
    val (s, e) = (so.n.toInt, eo.n.toInt)
    val fs = allFiles()
    // Validate the checkpointed prefix against the live listing before
    // trusting positional indexes (empty sig = legacy offset, unchecked).
    def check(o: GraftTsvOffset): Unit =
      if (o.sig.nonEmpty && o.n <= fs.length && sig(fs, o.n.toInt) != o.sig)
        throw new IllegalStateException(
          s"graft-tsv checkpoint mismatch at $path: offset ${o.n} was " +
            "recorded against a different file listing (directory " +
            "rewritten since the checkpoint?); restart with a fresh " +
            "checkpoint instead of silently remapping offsets to files")
    check(so); check(eo)
    if (e > fs.length) throw new IllegalStateException(
      s"graft-tsv checkpoint mismatch at $path: offset $e exceeds the " +
        s"${fs.length}-file listing (files removed since the checkpoint?)")
    fs.slice(s, e).map(f => GraftTsvPartition(f): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftTsvReaderFactory(required)
  override def deserializeOffset(json: String): Offset = {
    val t = json.trim
    // Legacy form: bare index. Current form: "<n>:<md5-of-name-list>".
    t.indexOf(':') match {
      case -1 => GraftTsvOffset(t.toLong, "")
      case i  => GraftTsvOffset(t.substring(0, i).toLong, t.substring(i + 1))
    }
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class GraftTsvOffset(n: Long, sig: String = "")
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = if (sig.isEmpty) n.toString else s"$n:$sig"
}
