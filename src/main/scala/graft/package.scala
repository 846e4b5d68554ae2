import org.apache.spark.sql.{Column, ColumnName, Dataset}

package object graft {
  /** Session-free `$"col"` interpolator (same shape as
    * SQLImplicits.StringToColumn, usable in library code without a
    * SparkSession in scope). */
  implicit class StringToColumn(val sc: StringContext) extends AnyVal {
    def $(args: Any*): ColumnName = new ColumnName(sc.s(args: _*))
  }

  /** Hash-spread `ds` by `key` ONLY when its current partition count is
    * below the session's default parallelism. The heavy narrow passes
    * (shingle md5, trigram explode, vector quantize, media decode) must
    * not inherit a one-partition layout from a single small input file —
    * that strands all the work on one core — but at 100 TB the input
    * already arrives in thousands of splits and an unconditional
    * `repartition` is a gratuitous full-corpus exchange before
    * exchange-free work. Partition count is read from the planned RDD
    * (plan-time only, no job); the extra planning pass is noise next to
    * the hashing it parallelizes. */
  def spreadByKey[T](ds: Dataset[T], key: Column): Dataset[T] =
    if (ds.rdd.getNumPartitions >=
        ds.sparkSession.sparkContext.defaultParallelism) ds
    else ds.repartition(key)

  /** Chained form of [[spreadByKey]]: `df.spreadBy($"doc_id")`. */
  implicit class SpreadOps[T](val ds: Dataset[T]) extends AnyVal {
    def spreadBy(key: Column): Dataset[T] = spreadByKey(ds, key)
  }
}
