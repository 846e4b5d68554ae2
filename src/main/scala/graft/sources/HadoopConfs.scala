package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Serialize the session's Hadoop configuration into task closures —
  * a bare `new Configuration()` on an executor drops every
  * `spark.hadoop.*` setting (s3a credentials, default FS, endpoints).
  * `newHadoopConf()` is used so session-level SQL overrides are included
  * consistently on both the read and write paths. */
object HadoopConfs {
  def props(spark: SparkSession): Seq[(String, String)] = {
    val c = spark.sessionState.newHadoopConf()
    val it = c.iterator()
    val b = Seq.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.result()
  }

  def build(props: Seq[(String, String)]): Configuration = {
    val conf = new Configuration(false)
    props.foreach { case (k, v) => conf.set(k, v) }
    conf
  }
}
