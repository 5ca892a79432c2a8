package graft
import org.apache.spark.sql.SparkSession

/** Mimics the driver's t1 smoke: SparkEntry.entry on sf0.001, rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("4")
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n ${if (n > 0) "OK" else "EMPTY"}")
    spark.stop()
  }
}
