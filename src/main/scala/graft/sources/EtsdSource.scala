package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft._
import graft.codec._
import graft.model.{ChannelConfig, EtsdSchema, StreamType}

/** Spark reader for native `.tsd` files (SURVEY.md §7 step 3): the analog
  * of `etsdInit` + block iteration (etsd.c:41-123, etsdRead.c:181-287),
  * producing the canonical long DataFrame
  * `(ts, channel, value, valid, is_register)`.
  *
  * v1 strategy: `binaryFile` scan + per-file decode. Each 512-byte block
  * is self-contained, so decode parallelism is per-file here and could be
  * per-block-range via a DataSource V2 `PartitionReader` with time-range
  * pushdown (the reference's `etsdFindBlock` sector pruning,
  * etsdRead.c:300-353) if single files ever grow beyond a task — real ETSD
  * files are ≤ a few hundred KB/day (`ECM-1240 storage format 2.txt:19-23`),
  * so one-file-per-task is the right grain and the 100 TB path is many
  * files, which binaryFile already parallelizes. */
object EtsdSource {

  /** Decoded long row; `value` is the stored sample (counter channels:
    * the delta), `ts_us` epoch micros. */
  final case class LongRow(ts_us: Long, channel: String, value: Option[Long],
                           valid: Boolean, is_register: Boolean)

  /** Read one or many `.tsd` files (glob ok). Every file carries its own
    * header schema; schemas may differ across files. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select($"content").as[Array[Byte]]
    bin.flatMap { bytes =>
      val (schema, samples) = EtsdDecoder.decodeFile(bytes)
      val names = schema.channels.map(_.name)
      samples.map(s => LongRow(s.tsEpoch * 1000000L, names(s.chan), s.value,
        s.value.isDefined, s.isRegister))
    }.select(timestamp_micros($"ts_us").as("ts"), $"channel", $"value",
      $"valid", $"is_register")
  }

  /** Above this store count, [[fleet]] plans through ONE multi-store
    * scan node instead of a union of per-store scans: a union's logical
    * plan is O(stores) — at the 10k–100k-store fleet a 100 TB layout
    * implies, analysis/optimization/serialization walk every store's
    * scan node on every query. Below it, the union is equivalent and
    * keeps the historical per-store plan shape. */
  val FleetUnionMax = 8

  /** Fleet-wide read in the historical long schema (no store column).
    *
    * An ETSD deployment scales by STORES, not by widening one store — a
    * store's channel set is bounded by the 512-byte block capacity
    * (etsdCmd.c:295-299), so a fleet is one directory per daemon
    * (etsd.c:33). Small fleets read as a union of per-store DSv2 scans
    * (each planning against its own `_graft_index` sidecar, the union
    * exchange-free); above [[FleetUnionMax]] stores the read delegates
    * to [[fleetWithStores]] — a SINGLE scan node whose plan size is O(1)
    * in store count — and drops the store column. `TsdIndexSpec` asserts
    * value parity between the two shapes and zero file probes when
    * sidecars exist. */
  def fleet(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    require(dirs.nonEmpty, "fleet requires at least one store directory")
    // the single-scan path adds preconditions the historical union never
    // had (distinct base names for store_id, comma-free paths for the
    // option encoding) — inputs that violate them keep the union shape
    // instead of newly throwing, so fleet() stays a drop-in
    val baseNames = dirs.map(d => new org.apache.hadoop.fs.Path(d).getName)
    val fleetScanSafe =
      baseNames.distinct.size == dirs.size && dirs.forall(!_.contains(','))
    if (dirs.size > FleetUnionMax && fleetScanSafe)
      fleetWithStores(spark, dirs).drop("store_id")
    else
      dirs.map(d => spark.read.format("graft.sources.TsdDataSource").load(d))
        .reduce(_ unionByName _)
  }

  /** Fleet-wide read carrying `store_id` (the store directory's base
    * name — must be distinct across the fleet), always through the
    * single multi-store scan node ([[TsdFleetScan]]): per-store sidecar
    * planning happens inside ONE `planInputPartitions`, cache misses
    * across all stores coalesce into one probe job, and an `=`/`IN`
    * filter on `store_id` prunes whole stores at planning time. */
  def fleetWithStores(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    require(dirs.nonEmpty, "fleet requires at least one store directory")
    // the store list travels as ONE comma-joined DSv2 option: a path
    // containing ',' (or an empty segment) would silently mis-split into
    // bogus store dirs on the read side — fail fast here instead
    require(dirs.forall(d => d.nonEmpty && !d.contains(',')),
      "fleet store directories must be non-empty and comma-free " +
        "(the store list is encoded as a comma-joined scan option)")
    spark.read.format("graft.sources.TsdDataSource")
      .option("stores", dirs.mkString(",")).load()
  }

  /** [[fleetWithStores]] over a fleet ROOT directory: every immediate
    * subdirectory is a store. The store list is resolved at planning
    * time by one listing of the root — the natural shape for a rotating
    * fleet where stores come and go without the query changing. */
  def fleetRoot(spark: SparkSession, root: String): DataFrame =
    spark.read.format("graft.sources.TsdDataSource")
      .option("fleet", "true").load(root)

  /** Wide pivoted view of the long form — one row per timestamp, one
    * column per channel (SURVEY.md §1.5: the ECM-style consumer shape;
    * the long form stays canonical because it scales to arbitrary channel
    * counts). Register rows are excluded; the channel list comes from the
    * schema so the output shape is fixed, not data-dependent.
    *
    * SORT CONTRACT: `globalSort = true` (default, the historical
    * behavior) appends a total `orderBy(ts)` — right for a consumer
    * that displays or exports the view, but a consumer MATERIALIZING it
    * at 100 TB pays a full range-shuffle sort for an ordering the next
    * operator usually re-derives. `globalSort = false` instead sorts
    * WITHIN the pivot's output partitions (no extra exchange — the rows
    * are already hash-partitioned by ts from the pivot's groupBy, so
    * each timestamp appears exactly once and each partition is
    * internally time-ordered; there is just no cross-partition total
    * order). Downstream time-window logic that repartitions by its own
    * keys anyway loses nothing. */
  def wide(long: DataFrame, schema: EtsdSchema,
           globalSort: Boolean = true): DataFrame = {
    val chans = schema.channels.filter(_.streamType != graft.model.StreamType.DontSave)
      .map(_.name)
    val pivoted = long.filter(!$"is_register")
      .groupBy($"ts")
      .pivot("channel", chans)
      .agg(first($"value"))
    if (globalSort) pivoted.orderBy($"ts")
    else pivoted.sortWithinPartitions($"ts")
  }

  /** Block-timestamp probe (`etsdTimeS`, etsdRead.h:27; consumed by the
    * sector search `etsdFindBlock`, etsdRead.c:300-353): one row per data
    * block with its sector number, timestamp, and valid-interval count —
    * the file's time index. The reference binary-probes sectors with one
    * fopen/fseek/fread per guess; here the whole index materializes in a
    * single scan and time-range → block pruning becomes an ordinary
    * filter on this frame (or parquet row-group stats once ingested). */
  def blockTimestamps(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select($"path", $"content").as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        (BlockBuffer.BlockSize until bytes.length by BlockBuffer.BlockSize)
          .map { off =>
            val b = BlockBuffer(bytes.slice(off, off + BlockBuffer.BlockSize))
            (p, off / BlockBuffer.BlockSize, b.timestamp, b.validIntervals)
          }
      }.toDF("path", "sector", "ts_epoch", "valid_intervals")
  }

  /** Per-block xData side table (SURVEY.md §1.5: the opaque per-block
    * byte region, etsd.h:102-103, becomes a `BinaryType` side table):
    * one row per data block, `(path, sector, block_epoch, xdata)`.
    * Files whose schema reserves no xData region contribute no rows. */
  def xData(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select($"path", $"content").as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val schema = HeaderCodec.decode(bytes.take(BlockBuffer.BlockSize))
        if (schema.xDataSize == 0) Iterator.empty
        else {
          val layout = new Layout(schema)
          (BlockBuffer.BlockSize until bytes.length by BlockBuffer.BlockSize)
            .iterator.map { off =>
              val block = bytes.slice(off, off + BlockBuffer.BlockSize)
              (p, (off / BlockBuffer.BlockSize).toLong,
                BlockBuffer(block).timestamp,
                EtsdDecoder.blockXData(layout, block))
            }
        }
      }.toDF("path", "sector", "block_epoch", "xdata")
  }

  /** Distributed encode→decode round-trip of a fixed-cadence grid through
    * real 512-byte ETSD blocks — the oracle-checked proof that the codec
    * is the identity on stored values. Input: one row per
    * (channel, bucketEpoch) with an integer value; missing buckets are
    * encoded as the invalid sentinel and dropped on decode. One day = one
    * block (24 × 1 h intervals, 24-bit Large streams); groups are
    * independent, so the plan is a single shuffle by day — no cross-block
    * state, exactly the reference's self-contained-block design
    * (README.md:7-9). */
  def roundTripHourlyBlocks(hourly: DataFrame, channelNames: Seq[String]): DataFrame = {
    val spark = hourly.sparkSession
    import spark.implicits._
    // empty catalog (e.g. an empty source partition): nothing to encode —
    // return the empty result rather than building an unsatisfiable schema
    if (channelNames.isEmpty)
      return Seq.empty[(String, Long, Long)]
        .toDF("channel", "bucket_epoch", "s_c")
    val names = channelNames.sorted
    require(names.forall(ChannelConfig.nameOk), s"bad channel names: $names")
    val schema = EtsdSchema(
      names.map(n => ChannelConfig(n, StreamType.LargeS)),
      intervalSec = 3600, blockIntervals = 24)
    val idx = names.zipWithIndex.toMap

    hourly.select($"channel", $"bucket", $"s_c").as[(String, Long, Long)]
      .groupByKey { case (_, bucket, _) => bucket / 86400L }
      .flatMapGroups { (day, rows) =>
        val byHourChan = rows.map { case (c, b, v) =>
          ((b % 86400L / 3600L).toInt, idx(c)) -> v
        }.toMap
        val enc = new EtsdEncoder(schema)
        val dayStart = day * 86400L
        (0 until 24).foreach { h =>
          enc.feed(dayStart + h * 3600L, names.indices.map { ci =>
            byHourChan.get((h, ci)) match {
              case Some(v) => Reading(v)
              case None    => Reading(0L, status = 1) // missing → invalid
            }
          }.toIndexedSeq)
        }
        enc.blocks().iterator.flatMap { bytes =>
          EtsdDecoder.decodeBlock(schema, bytes).iterator.collect {
            case Sample(ts, chan, Some(v), false) =>
              (names(chan), ts - 3600L, v) // sample covers the previous hour
          }
        }
      }
      .toDF("channel", "bucket_epoch", "s_c")
  }
}
