package graft.tools
import org.apache.spark.sql.SparkSession
object CCDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"TIME $tag ${(System.nanoTime()-t0)/1e9}%.2f")
      spark.catalog.clearCache()
    }
    for (p <- Seq("32", "8", "4"); i <- 1 to 2) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      t(s"hourly p=$p #$i")(graft.streaming.EventStream.runHourly(spark, d, s"s_${p}_$i").count())
      t(s"sessions p=$p #$i")(graft.streaming.EventStream.runSessions(spark, d, 30, s"x_${p}_$i").count())
    }
    spark.stop()
  }
}
