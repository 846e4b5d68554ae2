package graft

import java.nio.file.{Files, Path, Paths}
import java.time.Instant

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.codec.{BlockBuffer, HeaderCodec}
import graft.model.EtsdSchema
import graft.queries.EtsdQueryApi
import graft.sources.EtsdSource

/** CLI entry point mirroring the reference's `etsdCmd` verbs
  * (usage etsdCmd.c:457-461; dispatch etsdCmd.c:618-663):
  *
  *   - `query <path> [q=tot|ave|min|max] [c=chan] [s=start] [e=end]` —
  *     the analytical path (`queryETSD`, etsdCmd.c:333-461), driven
  *     through [[graft.queries.EtsdQueryApi]] over the Spark long frame.
  *   - `examine <path>` — schema pretty-print (`examinETSD`,
  *     etsdCmd.c:549-613): per-channel type/flags + block geometry.
  *   - `dump <path> [sector]` — block hex dump (`dumpETSD` + `LogBlock`,
  *     etsdCmd.c:465-547, errorlog.c:139-183), non-interactive: one
  *     sector per call instead of N/P/Q keys.
  *
  * The create path is [[graft.codec.EtsdEncoder]]; rotation/commit live
  * in [[graft.streaming.Ingest]]. Formatting is pure (string-returning)
  * so specs golden-test it without capturing stdout. */
object EtsdCmd {

  /** First .tsd file under `path` (or `path` itself), for header reads.
    * Spark reads take the path/glob as-is; header-only verbs need one
    * concrete file — schema is immutable per file (etsdSave.c:80-99). */
  private def firstFile(path: String): Path = {
    val p = Paths.get(path)
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala
        .filter(_.toString.endsWith(".tsd")).toSeq.sorted.headOption
        .getOrElse(throw new IllegalArgumentException(s"no .tsd files in $path"))
      finally s.close()
    } else p
  }

  def loadSchema(path: String): EtsdSchema = {
    val header = new Array[Byte](BlockBuffer.BlockSize)
    val in = Files.newInputStream(firstFile(path))
    try {
      var off = 0
      var n = 0
      while (off < header.length && n >= 0) {
        n = in.read(header, off, header.length - off)
        if (n > 0) off += n
      }
      require(off == header.length, s"short header read ($off bytes)")
    } finally in.close()
    HeaderCodec.decode(header)
  }

  /** `examinETSD` (etsdCmd.c:549-613): block geometry + one line per
    * channel with stream type and flag letters (C=counter G=gauge
    * R=register S=signed E=edo). */
  def examine(schema: EtsdSchema, fileBytes: Long): String = {
    val blocks = fileBytes / BlockBuffer.BlockSize - 1 // minus header
    val head =
      f"interval ${schema.intervalSec}%ds, ${schema.blockIntervals}%d intervals/block, " +
      f"$blocks%d data blocks, uid ${schema.uid}%d, xData ${schema.xDataSize}%d B"
    val chans = schema.channels.zipWithIndex.map { case (c, i) =>
      val flags = Seq(
        if (c.counter) "C" else "G",
        if (c.register) "R" else "",
        if (c.signed) "S" else "",
        if (c.edo) "E" else "").mkString
      f"$i%3d  ${c.name}%-19s ${c.streamType.toString}%-10s " +
      f"src${c.sourceId}%d:${c.sourceChan}%-2d $flags"
    }
    (head +: "  #  name                type       source  flags" +: chans)
      .mkString("\n")
  }

  /** `LogBlock` hex dump (errorlog.c:139-183): 16 bytes per line, offset +
    * hex + printable ASCII. `sector` 0 = header block. */
  def dumpSector(path: String, sector: Int): String = {
    val f = firstFile(path)
    val size = Files.size(f)
    val off = sector.toLong * BlockBuffer.BlockSize
    require(sector >= 0 && off + BlockBuffer.BlockSize <= size,
      s"sector $sector out of range (file has ${size / BlockBuffer.BlockSize})")
    // seek + one 512-byte read — the file may be arbitrarily large
    val block = new Array[Byte](BlockBuffer.BlockSize)
    val raf = new java.io.RandomAccessFile(f.toFile, "r")
    try { raf.seek(off); raf.readFully(block) } finally raf.close()
    val header = if (sector == 0) s"sector 0 (header)" else {
      val b = BlockBuffer(block)
      s"sector $sector ts=${b.timestamp} validIntervals=${b.validIntervals}"
    }
    val lines = block.grouped(16).zipWithIndex.map { case (row, i) =>
      val hex = row.map(b => f"${b & 0xFF}%02x").mkString(" ")
      val ascii = row.map(b => if (b >= 0x20 && b < 0x7F) b.toChar else '.')
        .mkString
      f"${i * 16}%04x  $hex%-47s  $ascii"
    }
    (header +: lines.toSeq).mkString("\n")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: EtsdCmd query|examine|dump <path> [args]")
    val (verb, path, rest) = (args(0), args(1), args.drop(2).toSeq)
    verb.head.toLower match {
      case 'q' =>
        val spark = SparkSession.builder().appName("etsdCmd")
          .config("spark.sql.extensions", "graft.GraftExtensions")
          .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
          .config("spark.sql.shuffle.partitions", 32)
          .config("spark.ui.enabled", false).getOrCreate()
        try {
          val schema = loadSchema(path)
          val df = EtsdSource.read(spark, path)
          EtsdQueryApi.query(df, schema, rest, Instant.now())
            .orderBy("channel").collect()
            .foreach(r => println(s"${r.getString(0)}\t${r.getLong(1)}\t${r.getDouble(2)}"))
        } finally spark.stop()
      case 'e' =>
        println(examine(loadSchema(path), Files.size(firstFile(path))))
      case 'd' =>
        println(dumpSector(path, rest.headOption.map(_.toInt).getOrElse(1)))
      case _ =>
        throw new IllegalArgumentException(s"unknown verb '$verb'")
    }
  }
}
