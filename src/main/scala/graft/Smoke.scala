package graft

/** Dev-only: print schemas + a row count per table to verify read paths
  * (esp. nanosecond timestamps in events.parquet). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("graft-smoke")
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    Tables.names.foreach { n =>
      try {
        val df = Tables.load(spark, dir, n)
        println(s"== $n rows=${df.count()}")
        df.printSchema()
        df.show(2, 60)
      } catch {
        case e: Throwable => println(s"== $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
