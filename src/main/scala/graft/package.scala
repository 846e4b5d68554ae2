import org.apache.spark.sql.ColumnName

package object graft {
  /** Session-free `$"col"` interpolator (same shape as
    * SQLImplicits.StringToColumn, usable in library code without a
    * SparkSession in scope). */
  implicit class StringToColumn(val sc: StringContext) extends AnyVal {
    def $(args: Any*): ColumnName = new ColumnName(sc.s(args: _*))
  }
}
