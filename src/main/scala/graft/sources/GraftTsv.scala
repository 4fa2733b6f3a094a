package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
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
  * The format itself (write path in [[GraftTsv.write]]) is
  * range-partitioned on doc_id before writing, so the zone maps are
  * disjoint and selective scans really do skip most files. At 100 TB
  * the driver-side header sweep in `planInputPartitions` becomes a
  * manifest/footer-cache read — same plan shape, different stats
  * medium. No compression and a fixed schema keep this honest: it is
  * an exercise of the V2 scan contracts, not a parquet replacement.
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

  /** Distributed write: range-partition on doc_id (disjoint zone maps
    * -> real file skipping), one header-stamped TSV file per non-empty
    * partition. Local-FS sink by design — the read connector is the
    * deliverable; a production write path would go through
    * SupportsWrite against an object store.
    */
  def write(df: DataFrame, outDir: String, files: Int): Unit = {
    val dir = Paths.get(outDir)
    if (Files.exists(dir)) {
      Files.list(dir).iterator().asScala.foreach(Files.delete)
    }
    Files.createDirectories(dir)
    df.select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("text"))
      .repartitionByRange(files, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        if (rows.hasNext) {
          val buf = rows.map { r =>
            s"${r.getLong(0)}\t${esc(r.getString(1))}\t${esc(r.getString(2))}\t" +
              s"${r.getLong(3)}\t${esc(r.getString(4))}"
          }.toVector
          def idOf(line: String): Long = line.takeWhile(_ != '\t').toLong
          val (mn, mx) = (idOf(buf.head), idOf(buf.last))
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val body = s"#graft-tsv\t1\t$mn\t$mx\t${buf.size}\n" +
            buf.mkString("", "\n", "\n")
          Files.write(Paths.get(outDir, f"part-$pid%05d.gtsv"),
            body.getBytes(StandardCharsets.UTF_8))
          ()
        }
      }
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
    case _ => false
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

class GraftTsvTable(path: String) extends Table with SupportsRead {
  require(path != null, "graft-tsv requires a path")
  override def name(): String = s"graft-tsv:$path"
  override def schema(): StructType = GraftTsv.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftTsvScanBuilder(path)
}

class GraftTsvScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = GraftTsv.schema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(GraftTsv.skippable)
    filters // all residual: skipping is an optimization, never correctness
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GraftTsvScan(path, required, pushed)
}

class GraftTsvScan(path: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-tsv $path, PushedFilters: ${pushed.mkString("[", ", ", "]")}"

  /** One partition per surviving file: the header zone map is checked
    * against the pushed doc_id bounds and non-overlapping files never
    * become tasks.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val (lo, hi) = GraftTsv.idBounds(pushed)
    val files = Files.list(Paths.get(path)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".gtsv")).toArray.sortBy(_.toString)
    files.flatMap { f =>
      val header = Files.newBufferedReader(f, StandardCharsets.UTF_8)
      val line = try header.readLine() finally header.close()
      val parts = line.split("\t")
      require(parts.length == 5 && parts(0) == "#graft-tsv",
        s"not a graft-tsv file: $f")
      val (mn, mx) = (parts(2).toLong, parts(3).toLong)
      val overlaps = lo.forall(_ <= mx) && hi.forall(_ >= mn)
      if (overlaps) Some(GraftTsvPartition(f.toString): InputPartition) else None
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftTsvReaderFactory(required)
}

case class GraftTsvPartition(file: String) extends InputPartition

class GraftTsvReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftTsvReader(partition.asInstanceOf[GraftTsvPartition].file, required)
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
