package graft.tools
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("j7_asof_join", "x11_ip_range_lookup", "a11_heavy_hitters", "a12_quantile_sketch")) {
      println(s"==== $q ====")
      graft.queries.Registry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
