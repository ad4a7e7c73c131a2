package graft

/** Replicates the driver's flagship smoke: SparkEntry.entry(spark) must
  * return rows > 0 on sf0.001. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(sys.props.getOrElse("spark.master", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[smoke] entry rows=${rows.length}")
    rows.take(30).foreach(r => println(s"[smoke] $r"))
    require(rows.nonEmpty, "entry must return rows")
    spark.stop()
  }
}
