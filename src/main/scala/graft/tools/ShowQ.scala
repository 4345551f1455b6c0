package graft.tools
import org.apache.spark.sql.SparkSession
object ShowQ {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    args.foreach { n =>
      println(s"=== $n")
      graft.SparkEntry.queries(n)(s, "/root/testdata/sf0.01").collect()
        .foreach(r => println("ROW>" + r.toString.replace("\n","\\n")))
    }
    s.stop()
  }
}
