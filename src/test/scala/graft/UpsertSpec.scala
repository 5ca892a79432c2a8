package graft

import graft.operators.Upsert
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate-key assignment: the distributed (range-partition + offset)
  * formulation must produce the EXACT ids of the single-window reference
  * formulation, without funneling the batch through one task. */
class UpsertSpec extends SparkSpec {

  test("withSurrogateKeys: id parity with the global-window formulation") {
    import spark.implicits._
    // unique business keys, deliberately unsorted and skewed across
    // partitions; enough rows to span several range partitions
    val rows = (1L to 2000L).map(i => (s"sku_${(i * 7919) % 100000}", i))
      .toDF("sku", "payload").repartition(7)
    val windowed = rows.withColumn("product_id",
        row_number().over(Window.orderBy(col("sku"))).cast("long") + 500L)
      .select(col("sku"), col("product_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val distributed = Upsert.withSurrogateKeys(rows, "product_id",
        Seq(col("sku")), 500L, smallBatchRows = 0L) // force the big-batch path
      .select(col("sku"), col("product_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(distributed == windowed)
    // contiguous range starting after the seed
    val ids = distributed.values.toSeq.sorted
    assert(ids == (501L to 2500L))
  }

  test("withSurrogateKeys: big-batch path has no single-partition exchange") {
    import spark.implicits._
    val rows = (1L to 100L).map(i => (s"k$i", i)).toDF("sku", "payload")
    val plan = Upsert.withSurrogateKeys(rows, "id", Seq(col("sku")), 0L,
        smallBatchRows = 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan.take(800))
  }

  test("withSurrogateKeys: small and big paths assign identical ids") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (s"s${(i * 37) % 1000}", i))
      .toDF("sku", "payload").repartition(5)
    def ids(threshold: Long) =
      Upsert.withSurrogateKeys(rows, "id", Seq(col("sku")), 9L, threshold)
        .select("sku", "id").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ids(0L) == ids(1L << 20))
  }

  test("withSurrogateKeys: keeps column set and replaces an existing id col") {
    import spark.implicits._
    val rows = Seq(("a", 1L, 99L), ("b", 2L, 98L)).toDF("sku", "payload", "id")
    val out = Upsert.withSurrogateKeys(rows, "id", Seq(col("sku")), 10L)
    assert(out.columns.toSeq == Seq("sku", "payload", "id"))
    assert(out.orderBy("sku").collect().map(_.getLong(2)).toSeq == Seq(11L, 12L))
  }

  test("scd2Apply: change cuts a version, no-op is untouched, re-apply is idempotent") {
    import spark.implicits._
    val dim = Seq(
      // k=1: already has history (closed row) + current 'gold'
      (1L, "bronze", "2019-01-01", "2020-01-01", false),
      (1L, "gold", "2020-01-01", "9999-12-31", true),
      (2L, "silver", "2020-01-01", "9999-12-31", true),
      (3L, "gold", "2020-01-01", "9999-12-31", true))
      .toDF("k", "tier", "valid_from", "valid_to", "is_current")
    val updates = Seq(
      (1L, "platinum"), // changed -> close + new version
      (2L, "silver"),   // identical -> untouched
      (9L, "new"))      // unseen key -> fresh current row
      .toDF("k", "tier")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4))).toSet
    val out = graft.operators.Upsert.scd2Apply(dim, updates,
      Seq("k"), Seq("tier"), effectiveDate = "2024-06-01")
    val got = rows(out)
    assert(got == Set(
      (1L, "bronze", "2019-01-01", "2020-01-01", false),   // history untouched
      (1L, "gold", "2020-01-01", "2024-06-01", false),     // closed at eff
      (1L, "platinum", "2024-06-01", "9999-12-31", true),  // new version
      (2L, "silver", "2020-01-01", "9999-12-31", true),    // no-op update
      (3L, "gold", "2020-01-01", "9999-12-31", true),      // absent from batch
      (9L, "new", "2024-06-01", "9999-12-31", true)),      // brand-new key
      got.toString)
    // exactly one current row per key survives
    val perKey = out.where(col("is_current")).groupBy("k").count()
      .collect().map(_.getLong(1))
    assert(perKey.forall(_ == 1L))
    // idempotence: the same batch applied to the result changes nothing
    // (every update now matches its key's current attrs exactly)
    val again = rows(graft.operators.Upsert.scd2Apply(out, updates,
      Seq("k"), Seq("tier"), effectiveDate = "2024-07-01"))
    assert(again == got)
    // null-safe change detection: null -> value IS a change,
    // value -> null IS a change, null -> null is not
    val dimN = Seq((5L, Option.empty[String], "2020-01-01", "9999-12-31", true))
      .toDF("k", "tier", "valid_from", "valid_to", "is_current")
    val toNull = Seq((5L, Option.empty[String])).toDF("k", "tier")
    assert(rows(graft.operators.Upsert.scd2Apply(dimN, toNull,
      Seq("k"), Seq("tier"), "2024-06-01")).count(_._5) == 1) // no cut
    val toVal = Seq((5L, Some("basic"))).toDF("k", "tier")
    val cut = graft.operators.Upsert.scd2Apply(dimN, toVal,
      Seq("k"), Seq("tier"), "2024-06-01")
    assert(cut.where(col("is_current")).collect()
      .map(_.getString(1)).toSeq == Seq("basic"))
    assert(cut.count() == 2L)
    intercept[IllegalArgumentException] {
      graft.operators.Upsert.scd2Apply(dim, updates, Seq("k"), Seq(),
        "2024-06-01")
    }
    // a NULL current flag (nullable legacy column) is history, not lost:
    // the row must pass through the full returned dimension untouched
    val dimNull = Seq(
      (7L, Some("old"), "2019-01-01", "2020-01-01", Option.empty[Boolean]),
      (7L, Some("now"), "2020-01-01", "9999-12-31", Some(true)))
      .toDF("k", "tier", "valid_from", "valid_to", "is_current")
    val outN = graft.operators.Upsert.scd2Apply(dimNull,
      Seq((7L, "next")).toDF("k", "tier"), Seq("k"), Seq("tier"), "2024-06-01")
    assert(outN.count() == 3L) // null-flag history + closed + new version
    assert(outN.where(col("is_current").isNull).count() == 1L)
  }

  test("applyChangeSet: latest-wins per key, deletes drop, inserts/updates " +
    "replace wholesale, untouched keys pass through") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val changes = Seq(
      // key 1: U at seq 5 loses to D at seq 9 -> key disappears
      (1L, "a2", 11.0, "U", 5L),
      (1L, "a2", 11.0, "D", 9L),
      // key 2: two updates, latest (seq 7) wins
      (2L, "b1", 21.0, "U", 3L),
      (2L, "b2", 22.0, "U", 7L),
      // key 4: fresh insert
      (4L, "d", 40.0, "I", 1L),
      // key 5: insert then delete -> never appears
      (5L, "e", 50.0, "I", 1L),
      (5L, "e", 50.0, "D", 2L))
      .toDF("k", "name", "v", "op", "seq")
    val out = graft.operators.Upsert.applyChangeSet(base, changes, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (2L, "b2", 22.0), (3L, "c", 30.0), (4L, "d", 40.0)), out.mkString("\n"))
    // seq tie: op asc means "D" < "I"/"U" -> delete wins a tied seq
    val tied = Seq((3L, "c9", 31.0, "U", 5L), (3L, "c9", 31.0, "D", 5L))
      .toDF("k", "name", "v", "op", "seq")
    val outT = graft.operators.Upsert.applyChangeSet(base, tied, Seq("k"))
    assert(outT.where(col("k") === 3L).count() == 0L)
    // re-applying the same change set is idempotent
    val once = graft.operators.Upsert.applyChangeSet(base, changes, Seq("k"))
    val twice = graft.operators.Upsert.applyChangeSet(once, changes, Seq("k"))
    assert(once.orderBy("k").collect().toSeq ==
      twice.orderBy("k").collect().toSeq)
  }
}
