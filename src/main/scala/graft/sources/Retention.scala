package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Retention — the reference's `etsdRotate` (etsdSave.c:80-99) made
  * concrete: where the daemon renames the live file and starts fresh,
  * partitioned storage just drops old partitions. Works on both sink
  * layouts: `block_epoch=<n>` parquet partitions ([[graft.streaming
  * .Ingest.commitStream]]) and span-named `etsd-<epoch>.tsd` files
  * ([[EtsdSink]]). Driver-side directory listing only — deletion is a
  * metadata operation, never a data scan. */
object Retention {

  /** Delete partitions/files whose epoch LABEL (the span/block start) is
    * strictly below `cutoff` — i.e. everything that STARTS before the
    * cutoff. To keep any span containing the cutoff, pass the cutoff
    * rounded down to a span boundary (for `date=` partitions: midnight
    * UTC — a calendar-day span whose label is its 00:00:00 epoch).
    * Returns the deleted paths. */
  def dropBlocksBefore(spark: SparkSession, dir: String,
                       cutoffEpoch: Long): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    val PartRe = "block_epoch=(-?\\d+)".r
    val TsdRe = "etsd-(\\d+)\\.tsd".r
    val DateRe = "date=(\\d{4}-\\d{2}-\\d{2})".r
    fs.listStatus(root).toSeq.flatMap { st =>
      val name = st.getPath.getName
      val epoch = name match {
        case PartRe(e) => Some(e.toLong)
        case TsdRe(e)  => Some(e.toLong)
        case DateRe(d) => // calendar-day partition: label = midnight UTC
          Some(java.time.LocalDate.parse(d).toEpochDay * 86400L)
        case _         => None
      }
      epoch.filter(_ < cutoffEpoch).map { _ =>
        fs.delete(st.getPath, true)
        st.getPath.toString
      }
    } match {
      case deleted =>
        // keep the sidecar index in step (stale entries are harmless --
        // the planner only trusts entries whose file is still listed --
        // but dropping them keeps the sidecar from growing forever)
        if (deleted.nonEmpty) TsdIndex.load(fs, root).foreach { cached =>
          val gone = deleted.map(p => new Path(p).getName).toSet
          if (gone.exists(cached.contains))
            TsdIndex.merge(spark, dir, Seq.empty,
              drop = cached.keySet.intersect(gone))
        }
        deleted
    }
  }
}
