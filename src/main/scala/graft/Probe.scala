package graft
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[4]")
    val df = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    df.printSchema()
    df.show(3, false)
    spark.stop()
  }
}
