package graft.tmp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.ScalableWindows
object NtileDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val wUnique = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wTies = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderpriority"))
    val ranked = o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
      row_number().over(wUnique).as("rn"),
      rank().over(wTies).as("rk"),
      dense_rank().over(wTies).as("drk"))
    val newQ = ScalableWindows.withGlobalNtile(
        ranked, 4, Seq(col("o_totalprice"), col("o_orderkey")), "quartile")
      .select("o_orderkey", "quartile")
    val oldQ = ranked.withColumn("quartile",
        ntile(4).over(Window.orderBy(col("o_totalprice"), col("o_orderkey"))))
      .select("o_orderkey", "quartile")
    val diff = newQ.as("s").join(oldQ.as("x"), col("s.o_orderkey") === col("x.o_orderkey"))
      .filter(col("s.quartile") =!= col("x.quartile"))
    println("[dbg] diffs=" + diff.count())
    diff.show(5)
    spark.stop()
  }
}
