package graft.sources

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.codec.{BlockBuffer, EtsdDecoder, HeaderCodec}
import graft.model.EtsdSchema

/** DataSource V2 reader for native `.tsd` files with time-range filter
  * pushdown — the Spark-native form of the reference's `etsdFindBlock`
  * sector search (etsdRead.c:300-353): a `ts` predicate becomes
  * block-range pruning, first at planning time per file (via the first
  * and last block timestamps, two 512-byte probes), then per block inside
  * each partition (4-byte timestamp check before any decode).
  *
  * Usage: `spark.read.format("graft.sources.TsdDataSource").load(path)`.
  * Output is the canonical long schema. Pruning is block-granular, so all
  * filters are also returned as residual — Spark re-applies them exactly.
  * Partitions are fixed-size sector ranges: a single large file splits
  * across the cluster instead of one task (the v2 upgrade over the
  * `binaryFile` path in [[EtsdSource.read]]).
  */
class TsdDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.getBoolean("xdata", false)) TsdDataSource.XDataSchema
    else EtsdSchema.LongSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new TsdTable(properties.asScala.toMap)
}

object TsdDataSource {
  /** Per-block side-table schema for `option("xdata", true)` reads
    * (SURVEY.md §1.5: the opaque per-block region, etsd.h:102-103, as a
    * `BinaryType` side table). */
  val XDataSchema: StructType = new StructType()
    .add("block_epoch", org.apache.spark.sql.types.LongType, false)
    .add("sector", org.apache.spark.sql.types.LongType, false)
    .add("xdata", org.apache.spark.sql.types.BinaryType, false)
}

private[sources] class TsdTable(props: Map[String, String])
    extends Table with SupportsRead {
  private def xdata = props.get("xdata").exists(_.toBoolean)
  override def name(): String = s"tsd(${props.getOrElse("path", "")})"
  override def schema(): StructType =
    if (xdata) TsdDataSource.XDataSchema else EtsdSchema.LongSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TsdScanBuilder(options.get("path"),
      options.getLong("blocksPerPartition", 2048),
      options.getBoolean("xdata", false))
}

private[sources] class TsdScanBuilder(path: String, blocksPerPartition: Long,
                                      xdata: Boolean)
    extends ScanBuilder with SupportsPushDownFilters {
  private var lo = Long.MinValue
  private var hi = Long.MaxValue
  private var chans: Option[Set[String]] = None // channel pruning (long mode)
  private var pushed = Array.empty[sources.Filter]

  private def narrowChans(names: Iterable[String]): Boolean = {
    val set = names.toSet
    chans = Some(chans.fold(set)(_ intersect set))
    true
  }

  private def epochOf(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp => Some(t.getTime / 1000L)
    case i: java.time.Instant  => Some(i.getEpochSecond)
    case _ => None
  }
  private def longOf(v: Any): Option[Long] = v match {
    case l: java.lang.Long    => Some(l)
    case i: java.lang.Integer => Some(i.toLong)
    case _ => None
  }
  // time column of the active mode: `ts` (timestamp) on the long view,
  // `block_epoch` (epoch-second long) on the xData side table
  private def bound(col: String, v: Any): Option[Long] =
    if (xdata) { if (col == "block_epoch") longOf(v) else None }
    else { if (col == "ts") epochOf(v) else None }

  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    val used = filters.filter {
      // channel pruning: skip non-matching channels' bit regions at
      // decode (the reference's read-one-channel scan, etsdQuery.c:304).
      // Must precede the generic cases — pattern matching is first-win.
      case sources.EqualTo("channel", v: String) if !xdata => narrowChans(Seq(v))
      case sources.In("channel", vs) if !xdata &&
          vs.forall(_.isInstanceOf[String]) =>
        narrowChans(vs.map(_.asInstanceOf[String]))
      case sources.GreaterThan(c, v)        => bound(c, v).exists { e => lo = lo.max(e); true }
      case sources.GreaterThanOrEqual(c, v) => bound(c, v).exists { e => lo = lo.max(e); true }
      case sources.LessThan(c, v)           => bound(c, v).exists { e => hi = hi.min(e); true }
      case sources.LessThanOrEqual(c, v)    => bound(c, v).exists { e => hi = hi.min(e); true }
      case sources.EqualTo(c, v)            => bound(c, v).exists { e => lo = lo.max(e); hi = hi.min(e); true }
      case _ => false
    }
    pushed = used
    filters // block pruning is coarse: Spark must re-apply everything
  }
  override def pushedFilters(): Array[sources.Filter] = pushed
  override def build(): Scan =
    new TsdScan(path, lo, hi, blocksPerPartition, xdata, chans)
}

private[sources] case class TsdInputPartition(file: String, startSector: Long,
    endSector: Long, lo: Long, hi: Long,
    chans: Option[Seq[String]] = None) extends InputPartition

private[sources] class TsdScan(path: String, lo: Long, hi: Long,
                               blocksPerPartition: Long,
                               xdata: Boolean = false,
                               chans: Option[Set[String]] = None)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType =
    if (xdata) TsdDataSource.XDataSchema else EtsdSchema.LongSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"TsdScan path=$path tsRange=[${if (lo == Long.MinValue) "-inf" else lo}, " +
      s"${if (hi == Long.MaxValue) "+inf" else hi}]" +
      chans.fold("")(cs => s" chans=${cs.toSeq.sorted.mkString(",")}")

  private def hadoopFs(p: Path) =
    p.getFileSystem(SparkSession.active.sessionState.newHadoopConf())

  /** Surviving index entries after file-level time pruning, computed
    * once per scan. Planning metadata comes from [[TsdIndex]] — the
    * sidecar where fresh, one distributed probe job otherwise — so the
    * driver never reads data-file bytes regardless of file count
    * (the many-file form of etsdFindBlock's E_BEFORE/E_AFTER checks,
    * etsdRead.c:300-353). */
  private lazy val pruned: Seq[(String, TsdIndexEntry)] = {
    val root = new Path(path)
    val spark = SparkSession.active
    val fs = hadoopFs(root)
    val dir = if (fs.getFileStatus(root).isDirectory) root else root.getParent
    TsdIndex.forPlanning(spark, fs, root)
      .filter(e => e.lastTs + e.blockSpanSec >= lo && e.firstTs <= hi)
      .map(e => (new Path(dir, e.name).toString, e))
  }

  override def planInputPartitions(): Array[InputPartition] =
    pruned.flatMap { case (file, e) =>
      (1L to e.nBlocks by blocksPerPartition).map { s =>
        TsdInputPartition(file, s,
          math.min(s + blocksPerPartition - 1, e.nBlocks), lo, hi,
          chans.map(_.toSeq.sorted))
      }
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new TsdReaderFactory(HadoopConfs.props(SparkSession.active), xdata)

  override def estimateStatistics(): Statistics = new Statistics {
    // post-prune bytes from the index: lets AQE/broadcast decisions see
    // a time-filtered .tsd scan as small when it is
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(pruned.map(_._2.fileLen).sum)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }
}

private[sources] class TsdReaderFactory(hadoopProps: Seq[(String, String)],
                                        xdata: Boolean)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    if (xdata) new TsdXDataPartitionReader(p.asInstanceOf[TsdInputPartition], hadoopProps)
    else new TsdPartitionReader(p.asInstanceOf[TsdInputPartition], hadoopProps)
}

/** xData-mode reader: one row per surviving block, no sample decode —
  * just the 4-byte timestamp check and an `xDataSize`-byte slice. */
private[sources] class TsdXDataPartitionReader(p: TsdInputPartition,
    hadoopProps: Seq[(String, String)]) extends PartitionReader[InternalRow] {
  private val fs = new Path(p.file).getFileSystem(HadoopConfs.build(hadoopProps))
  private val in = fs.open(new Path(p.file))
  private val schema: EtsdSchema = {
    val hdr = new Array[Byte](BlockBuffer.BlockSize)
    in.readFully(0, hdr)
    HeaderCodec.decode(hdr)
  }
  private val layout = new graft.codec.Layout(schema)
  private val span = schema.blockIntervals.toLong * schema.intervalSec
  private var sector = p.startSector
  private var cur: InternalRow = null

  override def next(): Boolean = {
    cur = null
    while (cur == null && sector <= p.endSector && schema.xDataSize > 0) {
      val buf = new Array[Byte](BlockBuffer.BlockSize)
      in.readFully(sector * BlockBuffer.BlockSize, buf)
      val ts = BlockBuffer(buf).timestamp
      if (ts + span >= p.lo && ts <= p.hi)
        cur = InternalRow(ts, sector, EtsdDecoder.blockXData(layout, buf))
      sector += 1
    }
    cur != null
  }

  override def get(): InternalRow = cur
  override def close(): Unit = in.close()
}

private[sources] class TsdPartitionReader(p: TsdInputPartition,
    hadoopProps: Seq[(String, String)]) extends PartitionReader[InternalRow] {
  private val fs = new Path(p.file).getFileSystem(HadoopConfs.build(hadoopProps))
  private val in = fs.open(new Path(p.file))
  private val schema: EtsdSchema = {
    val hdr = new Array[Byte](BlockBuffer.BlockSize)
    in.readFully(0, hdr)
    HeaderCodec.decode(hdr)
  }
  private val span = schema.blockIntervals.toLong * schema.intervalSec
  private val names = schema.channels.map(c => UTF8String.fromString(c.name))
  // pushed channel set -> per-file index predicate; channels absent from
  // this file's schema simply never match
  private val keep: Int => Boolean = p.chans match {
    case None => _ => true
    case Some(cs) =>
      val set = cs.toSet
      val byIdx = schema.channels.map(c => set.contains(c.name)).toArray
      byIdx(_)
  }
  private var sector = p.startSector
  private var rows: Iterator[graft.codec.Sample] = Iterator.empty
  private var cur: graft.codec.Sample = null

  override def next(): Boolean = {
    while (!rows.hasNext && sector <= p.endSector) {
      val buf = new Array[Byte](BlockBuffer.BlockSize)
      in.readFully(sector * BlockBuffer.BlockSize, buf)
      val ts = BlockBuffer(buf).timestamp
      // per-block prune: 4-byte timestamp check before any decode
      if (ts + span >= p.lo && ts <= p.hi)
        rows = EtsdDecoder.decodeBlock(schema, buf, keep).iterator
      sector += 1
    }
    if (rows.hasNext) { cur = rows.next(); true } else false
  }

  override def get(): InternalRow = InternalRow(
    cur.tsEpoch * 1000000L, names(cur.chan),
    cur.value.map(java.lang.Long.valueOf).orNull,
    cur.value.isDefined, cur.isRegister)

  override def close(): Unit = in.close()
}
