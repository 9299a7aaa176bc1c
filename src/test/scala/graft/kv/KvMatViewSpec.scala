package graft.kv

import org.apache.spark.sql.functions._
import graft.{SparkSpec, TestSpark}

class KvMatViewSpec extends SparkSpec {
  import spark.implicits._

  private val schema = KvSchema.of("k", "grp" -> ("f", "g"),
    "amt" -> ("f", "a"))

  private def viewRows(view: String): Array[(String, Long, Long)] =
    KvMatView.read(spark, view)
      .select("grp", "cnt", "sum_amt").as[(String, Long, Long)]
      .collect().sortBy(_._1)

  /** The view recomputed from scratch off the base's live LWW view —
    * what every incremental refresh must equal. */
  private def recomputed(base: String): Array[(String, Long, Long)] =
    KvTable.read(spark, base)
      .groupBy($"grp").agg(count(lit(1)).as("cnt"), sum($"amt").as("s"))
      .select("grp", "cnt", "s").as[(String, Long, Long)]
      .collect().sortBy(_._1)

  test("build materializes per-group cnt + sum") {
    val base = TestSpark.scratch("mv-base1")
    val view = TestSpark.scratch("mv-view1")
    KvTable.write(Seq(("k1", "A", 1L), ("k2", "A", 2L), ("k3", "B", 3L))
      .toDF("k", "grp", "amt"), base, schema, SinkMode.Replace)
    KvMatView.build(spark, base, view, "grp", Seq("amt"))
    assert(viewRows(view) === Array(("A", 2L, 3L), ("B", 1L, 3L)))
  }

  test("refresh: inserts, group-moving updates, deletes, emptied groups") {
    val base = TestSpark.scratch("mv-base2")
    val view = TestSpark.scratch("mv-view2")
    KvTable.write(Seq(("k1", "A", 1L), ("k2", "A", 2L), ("k3", "B", 3L))
      .toDF("k", "grp", "amt"), base, schema, SinkMode.Replace)
    KvMatView.build(spark, base, view, "grp", Seq("amt"))

    // new key into a NEW group, update moving k1 A -> C, delete k3
    // (emptying group B entirely)
    KvTable.write(Seq(("k4", "D", 10L), ("k1", "C", 5L))
      .toDF("k", "grp", "amt"), base, schema, SinkMode.Append)
    KvTable.delete(Seq("k3").toDF("k"), base, schema)
    KvMatView.refresh(spark, base, view)

    assert(viewRows(view) === recomputed(base))
    assert(viewRows(view) === Array(("A", 1L, 2L), ("C", 1L, 5L),
      ("D", 1L, 10L)))
    // emptied group B is tombstoned out, not left at zero
    assert(!viewRows(view).exists(_._1 == "B"))
  }

  test("refresh is a no-op at an unchanged checkpoint and converges " +
    "over repeated mutate/refresh cycles") {
    val base = TestSpark.scratch("mv-base3")
    val view = TestSpark.scratch("mv-view3")
    KvTable.write(Seq(("k1", "A", 1L), ("k2", "B", 2L))
      .toDF("k", "grp", "amt"), base, schema, SinkMode.Replace)
    KvMatView.build(spark, base, view, "grp", Seq("amt"))
    KvMatView.refresh(spark, base, view) // nothing changed
    assert(viewRows(view) === recomputed(base))

    // several cycles, each refresh only sees its own window
    for (i <- 1 to 3) {
      KvTable.write(Seq((s"n$i", "A", i.toLong), ("k2", "B", 100L + i))
        .toDF("k", "grp", "amt"), base, schema, SinkMode.Append)
      KvMatView.refresh(spark, base, view)
      assert(viewRows(view) === recomputed(base), s"cycle $i diverged")
    }
  }

  test("decimal sums accumulate exactly; float sums are rejected") {
    val base = TestSpark.scratch("mv-base4")
    val view = TestSpark.scratch("mv-view4")
    val dec = Seq(("k1", "A", "1.10"), ("k2", "A", "2.20"))
      .toDF("k", "grp", "s")
      .select($"k", $"grp", $"s".cast("decimal(12,2)").as("amt"))
    KvTable.write(dec, base, schema, SinkMode.Replace)
    KvMatView.build(spark, base, view, "grp", Seq("amt"))
    val row = KvMatView.read(spark, view).select("grp", "cnt", "sum_amt")
      .as[(String, Long, java.math.BigDecimal)].collect().head
    assert(row._1 == "A" && row._2 == 2L &&
      row._3.compareTo(new java.math.BigDecimal("3.30")) == 0)

    val fbase = TestSpark.scratch("mv-base4f")
    KvTable.write(Seq(("k1", "A", 1.5)).toDF("k", "grp", "amt"),
      fbase, schema, SinkMode.Replace)
    intercept[IllegalArgumentException] {
      KvMatView.build(spark, fbase, TestSpark.scratch("mv-view4f"),
        "grp", Seq("amt"))
    }
  }

  test("a crashed refresh (journal present, partial apply) replays to " +
    "the exact result, exactly once") {
    val base = TestSpark.scratch("mv-crash-base")
    val view = TestSpark.scratch("mv-crash-view")
    KvTable.write(Seq(("k1", "A", 1L), ("k2", "A", 2L), ("k3", "B", 3L))
      .toDF("k", "grp", "amt"), base, schema, SinkMode.Replace)
    KvMatView.build(spark, base, view, "grp", Seq("amt"))
    KvTable.write(Seq(("k4", "A", 10L)).toDF("k", "grp", "amt"),
      base, schema, SinkMode.Append)
    KvTable.delete(Seq("k3").toDF("k"), base, schema)

    // emulate the crash window: journal written, apply started (a
    // partial — and here deliberately WRONG — row landed for an
    // affected group), then death before the checkpoint advanced
    val (_, _, metaCp) = KvMatView.readViewMeta(spark, view)
    MetaSidecar.write(spark, s"$view/_kvmvlog.json", "group", "grp",
      "sums", Seq("amt"), "from" -> metaCp,
      "to" -> KvTable.maxVersion(spark, base),
      "viewver" -> KvTable.maxVersion(spark, view))
    KvTable.write(Seq(("A", 999L, 999L)).toDF("grp", "cnt", "sum_amt"),
      view, KvMatView.viewSchema("grp", Seq("amt")), SinkMode.Append)

    // the next refresh detects the journal and replays the identical
    // delta against the journaled snapshot — the bogus partial row is
    // overwritten, nothing double-applies
    KvMatView.refresh(spark, base, view)
    assert(viewRows(view) === recomputed(base))
    assert(viewRows(view) === Array(("A", 3L, 13L)))
    // journal cleared: a further refresh is a clean no-op
    KvMatView.refresh(spark, base, view)
    assert(viewRows(view) === recomputed(base))
  }

  test("refresh on an event-time-versioned base uses the row-version " +
    "domain checkpoint") {
    val base = TestSpark.scratch("mv-base5")
    val view = TestSpark.scratch("mv-view5")
    KvTable.write(
      Seq(("k1", "A", 1L, 1000000000L), ("k2", "B", 2L, 1000000000L))
        .toDF("k", "grp", "amt", "ver"),
      base, schema, SinkMode.Replace, versionFrom = Some($"ver"))
    KvMatView.build(spark, base, view, "grp", Seq("amt"))
    KvTable.write(Seq(("k1", "B", 7L, 2000000000L))
        .toDF("k", "grp", "amt", "ver"),
      base, schema, SinkMode.Append, versionFrom = Some($"ver"))
    KvMatView.refresh(spark, base, view)
    assert(viewRows(view) === Array(("B", 2L, 9L)))
    assert(viewRows(view) === recomputed(base))
  }
}
