package graft.functions

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** The native hash must be value-identical to the SQL chain it replaces
  * (`conv(substring(md5(x),1,15),16,10)`) — the DuckDB oracles still use
  * the hex-string form, so any divergence breaks every dedup oracle. */
class Md5Long60Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sqlChain(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  test("matches the conv/substring/md5 SQL chain on random strings") {
    import spark.implicits._
    val gen = Gen.listOfN(300, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(40)), Gen.asciiPrintableStr.map(_.take(40)),
      Gen.const(""), Gen.const(" "), Gen.identifier))
    val strings = gen.sample.get
    val df = strings.toDF("s")
      .select(DetHash.h60($"s").as("native"), sqlChain($"s").as("chain"))
    assert(df.filter($"native" =!= $"chain").isEmpty)
    // h31 folding parity too
    val df31 = strings.toDF("s")
      .select(DetHash.h31($"s").as("native"),
        (sqlChain($"s") % DetHash.M31).as("chain"))
    assert(df31.filter($"native" =!= $"chain").isEmpty)
  }

  test("null propagates; values are 60-bit non-negative") {
    import spark.implicits._
    val df = Seq(Some("x"), None).toDF("s").select(DetHash.h60($"s").as("h"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    val h = rows.find(!_.isNullAt(0)).get.getLong(0)
    assert(h >= 0L && h < (1L << 60))
  }

  test("works inside codegen'd array transform lambdas") {
    import spark.implicits._
    val got = Seq("abcdef").toDF("s")
      .select(transform(split($"s", ""), ch => DetHash.h60(ch)).as("hs"))
      .select(explode($"hs")).as[Long].collect()
    val want = Seq("a", "b", "c", "d", "e", "f").map(ch =>
      spark.range(1).select(sqlChain(lit(ch))).head.getLong(0))
    assert(got.toSeq == want)
  }

  test("graft_h60 is registered in SQL via GraftExtensions") {
    val viaSql = spark.sql("SELECT graft_h60('hello')").head.getLong(0)
    val viaChain = spark.range(1).select(sqlChain(lit("hello"))).head.getLong(0)
    assert(viaSql == viaChain)
  }

  test("graft_dot matches the aggregate/zip_with lambda and rejects mismatch") {
    import spark.implicits._
    val gen = Gen.listOfN(50,
      Gen.listOfN(16, Gen.chooseNum(-1000000L, 1000000L)))
    val rows = gen.sample.get.grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq
    val df = rows.toDF("a", "b")
    val cmp = df.select(
      LongArrayDot($"a", $"b").as("native"),
      expr("aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (s,x) -> s+x)").as("chain"))
    assert(cmp.filter($"native" =!= $"chain").isEmpty)
    assert(spark.sql("SELECT graft_dot(array(1L,2L), array(3L,4L))")
      .head.getLong(0) == 11L)
    val err = intercept[Exception] {
      Seq((Seq(1L), Seq(1L, 2L))).toDF("a", "b")
        .select(LongArrayDot($"a", $"b")).collect()
    }
    assert(err.getMessage.contains("length mismatch") ||
      err.getCause.getMessage.contains("length mismatch"))
  }
}
