package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary debug harness — deleted before commit
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    import graft.Det._
    val r = Tables.lineitem(spark, dir).groupBy("l_partkey")
      .agg(sum(cents(col("l_extendedprice"))).as("rev_c"))
    val ranged = r.repartitionByRange(32, col("rev_c").desc, col("l_partkey").asc)
      .withColumn("__pid", spark_partition_id())
    val t1 = ranged.groupBy("__pid").agg(sum(col("rev_c")).as("t"), count(lit(1)).as("n"),
        max("rev_c").as("mx"), min("rev_c").as("mn"))
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2))).sortBy(_._1)
    val t2 = ranged.groupBy("__pid").agg(sum(col("rev_c")).as("t"), count(lit(1)).as("n"))
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2))).sortBy(_._1)
    println("job1: " + t1.mkString(" "))
    println("job2: " + t2.mkString(" "))
    println("grand1=" + t1.map(_._2).sum + " grand2=" + t2.map(_._2).sum)
    val direct = r.agg(sum("rev_c")).collect()(0).getLong(0)
    println("direct=" + direct)
    spark.stop()
  }
}
