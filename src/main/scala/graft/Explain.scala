package graft
import org.apache.spark.sql.functions._
import graft.operators._
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val c = ComparePack.compare(spark, "/root/testdata/sf0.01")
    println("=== INTERSECT PLAN ===")
    c.intersectRows.explain("formatted")
    spark.stop()
  }
}
