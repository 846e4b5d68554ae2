package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType, TimestampType}

import graft.queries.Tables

/** Canary against driver-side testdata schema drift. The driver regenerates
  * `/root/testdata` between rounds and has already changed a physical layout
  * once (events `ts`: TIMESTAMP(NANOS) → timestamp[us]), which silently
  * killed every events-based gate query. This spec fails `sbt test` loudly
  * instead: every loader must analyze AND execute against whatever parquet
  * is currently on disk, and the normalized logical schema must hold.
  */
class TestdataCanarySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val sfDirs = {
    val root = new java.io.File("/root/testdata")
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("sf"))
      .map(_.getAbsolutePath).sorted
  }

  private val plainTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

  test("every sf dir present") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* directories found")
  }

  for (dir <- sfDirs) {
    val sf = dir.split('/').last

    test(s"$sf: plain tables load and execute") {
      for (t <- plainTables) {
        val df = Tables.table(spark, dir, t)
        assert(df.schema.nonEmpty, s"$t: empty schema")
        // limit(1) forces a real read of the current physical layout —
        // analysis alone would miss reader-level type rejections.
        assert(df.limit(1).collect().length == 1, s"$t: no rows")
      }
    }

    test(s"$sf: pinned columns normalize to the documented logical types") {
      assert(Tables.table(spark, dir, "orders")
        .schema("o_orderdate").dataType == TimestampType)
      assert(Tables.table(spark, dir, "lineitem")
        .schema("l_shipdate").dataType == TimestampType)
      val ev = Tables.table(spark, dir, "events").schema
      assert(ev("event_id").dataType == LongType)
      assert(ev("user_id").dataType == LongType)
      assert(ev("value").dataType == DoubleType)
      assert(Tables.table(spark, dir, "documents")
        .schema("n_chars").dataType == LongType)
      Tables.table(spark, dir, "embeddings")
        .schema("embedding").dataType match {
        case ArrayType(elem, _) => assert(elem == FloatType)
        case other => fail(s"embedding: expected array<float>, got $other")
      }
    }

    test(s"$sf: events loader normalizes ts to TimestampType") {
      val physical = spark.read.parquet(s"$dir/events.parquet")
        .schema("ts").dataType
      info(s"physical events.ts type in $sf: $physical")
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"events.ts normalized to ${ev.schema("ts").dataType}, " +
          s"expected TimestampType (physical: $physical)")
      assert(ev.limit(1).collect().length == 1, "events: no rows")
    }

    test(s"$sf: eventsBetween analyzes and scopes on current layout") {
      val scoped = Tables.eventsBetween(spark, dir, 0L, 4102444800L)
      assert(scoped.limit(1).collect().length == 1,
        "eventsBetween returned no rows for the all-time range")
    }

    // strip nullability so the comparison is about names + types only
    def norm(t: org.apache.spark.sql.types.DataType):
        org.apache.spark.sql.types.DataType = t match {
      case ArrayType(e, _) => ArrayType(norm(e), containsNull = true)
      case other => other
    }

    test(s"$sf: every table's FULL logical schema equals the documented one") {
      for ((t, want) <- Tables.documentedSchema) {
        val df = if (t == "events") Tables.events(spark, dir)
                 else Tables.table(spark, dir, t)
        val got = df.schema.fields.toSeq.map(f => (f.name, norm(f.dataType)))
        val wantN = want.map { case (n, ty) => (n, norm(ty)) }
        assert(got == wantN,
          s"$t: loaded logical schema drifted.\n  got:  $got\n  want: $wantN\n" +
            "The driver regenerated testdata with a layout the loaders do " +
            "not normalize — extend Tables.pinnedTypes/documentedSchema.")
      }
    }

    test(s"$sf: physical embedding element type is float32 (fail fast on widening)") {
      // A float64 regeneration would make the ArrayType(FloatType) pin a
      // LOSSY downcast while DuckDB oracles still read float64 — the gate
      // would hash-mismatch confusingly. Fail here with the real cause.
      spark.read.parquet(s"$dir/embeddings.parquet")
        .schema("embedding").dataType match {
        case ArrayType(FloatType, _) => ()
        case other => fail(s"embeddings.embedding physical type is $other; " +
          "float32 expected. Widening drift cannot be normalized losslessly " +
          "— regenerate expectations / update the pin policy deliberately.")
      }
    }

    test(s"$sf: embedding dimension equals LlmQueries.EmbDim") {
      // PQ's m=8 sub-spaces and the LSH hyperplane tables are sized for
      // EmbDim; a regeneration with a new dim must fail here, loudly,
      // not as a runtime subvector error mid-gate.
      import org.apache.spark.sql.functions.{size => asize, col, min => amin, max => amax}
      val dims = Tables.table(spark, dir, "embeddings")
        .agg(amin(asize(col("embedding"))), amax(asize(col("embedding"))))
        .head()
      assert(dims.getInt(0) == graft.queries.LlmQueries.EmbDim &&
        dims.getInt(1) == graft.queries.LlmQueries.EmbDim,
        s"embedding dims [${dims.getInt(0)}, ${dims.getInt(1)}] != " +
          s"pinned ${graft.queries.LlmQueries.EmbDim} — driver regenerated " +
          "with a new dimension; update EmbDim + PQ/LSH sizing deliberately.")
    }

    test(s"$sf: distinct event_type set equals the fixed catalog") {
      // .tsd gate queries build ETSD headers from this catalog and the
      // pivot query uses it as the explicit value list — a regeneration
      // with different event types must fail HERE, not as a gate hash
      // mismatch.
      val got = Tables.events(spark, dir).select("event_type").distinct()
        .collect().map(_.getString(0)).sorted.toSeq
      assert(got == Tables.EventTypeCatalog,
        s"event_type catalog drifted: got $got, " +
          s"want ${Tables.EventTypeCatalog}")
    }
  }
}
