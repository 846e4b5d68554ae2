import org.apache.spark.sql.{Column, ColumnName, Dataset}
import org.apache.spark.sql.catalyst.plans.logical._

package object graft {
  /** Session-free `$"col"` interpolator (same shape as
    * SQLImplicits.StringToColumn, usable in library code without a
    * SparkSession in scope). */
  implicit class StringToColumn(val sc: StringContext) extends AnyVal {
    def $(args: Any*): ColumnName = new ColumnName(sc.s(args: _*))
  }

  /** Hash-spread `ds` by `key` ONLY when it is a narrow (scan-shaped)
    * plan whose current partition count is below the session's default
    * parallelism. The heavy narrow passes (shingle md5, trigram explode,
    * vector quantize, media decode) must not inherit a one-partition
    * layout from a single small input file — that strands all the work
    * on one core — but at 100 TB the input already arrives in thousands
    * of splits and an unconditional `repartition` is a gratuitous
    * full-corpus exchange before exchange-free work.
    *
    * Contract (why the narrow-plan gate exists): the partition count is
    * read from the planned RDD, and under AQE `Dataset.rdd` FINALIZES
    * the adaptive plan — on an input with an upstream shuffle that
    * materializes the shuffle stages in a throwaway QueryExecution
    * (upstream work would run twice), and on a streaming Dataset it
    * throws. So the probe only runs when the analyzed plan is purely
    * narrow (leaf scans + project/filter/generate/union), where `rdd`
    * just plans file splits and runs nothing. Any other shape — an
    * aggregate, join, window, or explicit repartition upstream — is
    * returned unchanged: a shuffle output is already spread across
    * `spark.sql.shuffle.partitions` partitions, which is exactly the
    * parallelism this helper exists to guarantee. CAVEAT: a join that
    * the planner turns into a BROADCAST join inherits the probe side's
    * partitioning, not shuffle partitioning — a 1-partition input
    * enriched via broadcast join comes back unspread (the logical plan
    * cannot distinguish the two join strategies). Callers fanning heavy
    * per-row work out of a broadcast-enrich must spread BEFORE the
    * join, or repartition explicitly after. Streaming datasets
    * are likewise returned unchanged (no RDD to probe; the microbatch
    * engine owns their partitioning). Probe cost on the narrow path is
    * plan-time only — do not call inside a per-row or per-iteration
    * loop; call once when assembling the query. */
  def spreadByKey[T](ds: Dataset[T], key: Column): Dataset[T] = {
    def narrow(p: LogicalPlan): Boolean = p match {
      case _: LeafNode => true
      case _: Project | _: Filter | _: Generate | _: SubqueryAlias |
           _: Union | _: GlobalLimit | _: LocalLimit =>
        p.children.forall(narrow)
      // coalesce (Repartition with shuffle=false) is itself narrow:
      // a coalesce(1)-shaped input is exactly the one-partition
      // stranding this helper exists to fix, and probing its RDD runs
      // nothing. shuffle=true Repartition falls through to the
      // pass-through arm — that output IS already spread.
      case r: Repartition => !r.shuffle && narrow(r.child)
      case _ => false
    }
    if (ds.isStreaming || !narrow(ds.queryExecution.analyzed)) ds
    else if (ds.rdd.getNumPartitions >=
        ds.sparkSession.sparkContext.defaultParallelism) ds
    else ds.repartition(key)
  }

  /** Chained form of [[spreadByKey]]: `df.spreadBy($"doc_id")`. */
  implicit class SpreadOps[T](val ds: Dataset[T]) extends AnyVal {
    def spreadBy(key: Column): Dataset[T] = spreadByKey(ds, key)
  }
}
