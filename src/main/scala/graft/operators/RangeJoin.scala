package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-interval range joins without a cartesian: bucketize the range
  * dimension so the engine executes an EQUI join on (key, bucket) and the
  * inequality predicates only run inside a bucket.
  *
  * A naive `a JOIN b ON a.k = b.k AND b.ts BETWEEN a.ts AND a.ts + w`
  * plans as a per-key nested loop — quadratic in rows-per-key, unusable
  * when one key holds millions of events. With bucket width = the window
  * width, any qualifying pair is at most one bucket apart, so the probe
  * side expands to exactly TWO buckets (its own and the next) and the
  * join is a plain shuffled hash/sort-merge equi join: shuffle volume
  * 2×|probe| + |build|, per-bucket work bounded by bucket occupancy, and
  * AQE can split a hot (key, bucket).
  */
object RangeJoin {

  /** Time-neighbor pairs: rows of the same `keyCol` whose timestamps are
    * within `windowSec`, each unordered pair emitted once with the
    * earlier event first (ties broken by `idCol`). Output:
    * (key, e1, e2, gap_us). */
  def timeNeighborPairs(events: DataFrame, keyCol: String, tsCol: String,
                        idCol: String, windowSec: Long): DataFrame = {
    val widthUs = windowSec * 1000000L
    val base = events.select(col(keyCol).as("__k"),
      col(idCol).as("__id"), unix_micros(col(tsCol)).as("__us"))
    // probe side expands to its own bucket and the next (a pair within the
    // window is at most one bucket apart); build side keeps one bucket
    val a = base
      .withColumn("__b0", expr(s"__us DIV $widthUs"))
      .withColumn("__bucket", explode(array(col("__b0"), col("__b0") + 1)))
      .select(col("__k"), col("__id").as("e1"), col("__us").as("us1"), col("__bucket"))
    val b = base.select(col("__k").as("__k2"), col("__id").as("e2"),
      col("__us").as("us2"), expr(s"__us DIV $widthUs").as("__bucket2"))
    a.join(b, col("__k") === col("__k2") && col("__bucket") === col("__bucket2"))
      .where((col("us2") - col("us1")).between(0L, widthUs) &&
        (col("us1") < col("us2") || (col("us1") === col("us2") && col("e1") < col("e2"))))
      .select(col("__k").as(keyCol), col("e1"), col("e2"),
        (col("us2") - col("us1")).as("gap_us"))
  }
}
