package graft

import org.apache.spark.sql.SparkSession

// scratch probe — deleted before commit
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("probe")
      .config("spark.sql.shuffle.partitions", 4)
      .getOrCreate()
    try {
      try {
        val r = spark.sql(
          "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM t WHERE n < 5) SELECT sum(n) FROM t")
          .collect()
        println("RECURSIVE_CTE_OK " + r.mkString(","))
      } catch { case e: Throwable => println("RECURSIVE_CTE_FAIL " + e.getMessage.take(200)) }
      val a = spark.sql("SELECT ascii('é'), ascii('a'), ascii('ł')").collect()
      println("ASCII " + a.mkString(","))
    } finally spark.stop()
  }
}
