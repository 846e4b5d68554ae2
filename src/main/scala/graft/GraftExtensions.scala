package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.Md5Long60

/** Session extensions for the library's native functions — attach with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `.withExtensions`). Currently registers `graft_h60` for SQL text; the
  * Column API ([[graft.functions.DetHash.h60]]) embeds the expression
  * directly and needs no registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(Md5Long60.registryEntry)
}
