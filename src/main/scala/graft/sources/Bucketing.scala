package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for shuffle-free co-located joins — the 100 TB
  * answer to "this fact table is joined on the same key every day":
  * paying one shuffle at write time (`bucketBy` hash-splits each
  * partition into `buckets` files, `sortBy` pre-sorts them) removes the
  * Exchange on BOTH sides of every subsequent equi join or aggregation
  * on that key. Two tables bucketed on the join key with the same bucket
  * count sort-merge join with zero runtime shuffle — the Spark-native
  * form of co-partitioned storage.
  *
  * Bucket count is a real dial: it bounds per-bucket file size (aim for
  * 100-500 MB post-compression per bucket per partition) and caps the
  * parallelism of bucket-local joins. */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table. With `path` the
    * table is external (files live there, e.g. a temp dir for tests and
    * gate fixtures); without, it is managed under the warehouse dir. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: Option[String] = None): Unit = {
    val w = df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
