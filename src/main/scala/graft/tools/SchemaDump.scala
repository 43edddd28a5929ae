package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev utility: print Spark's view of the testdata schemas. */
object SchemaDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    graft.Tables.all.foreach { t =>
      println(s"== $t")
      spark.read.parquet(s"$dir/$t.parquet").printSchema()
    }
    spark.stop()
  }
}
