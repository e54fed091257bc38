package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: show whether WindowExec nodes are visible in the
  * partitionedRanks output plan (localCheckpoint hides upstream).
  */
object ProbeQ17b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 1000).map(i => ("F" + (i % 3), i % 5, i)).toDF("flag", "qty", "ln")
    val ranked = graft.operators.WindowRankOps.partitionedRanks(df, Seq("flag"),
      Seq(("qty", false), ("ln", true)), ntileN = 4)
    val wins = ranked.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    println(s"[probe-q17b] visible WindowExec nodes: ${wins.size}")
    wins.foreach(w => println(s"[probe-q17b] partitionSpec: ${w.partitionSpec}"))
    spark.stop()
  }
}
