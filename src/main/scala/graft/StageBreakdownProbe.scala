package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Diagnostic main: run one registry query and print every completed
  * stage's wall time, task count, and shuffle/input volumes — the
  * "where does this query actually spend" instrument the optimization
  * guide's §1 empirical loop needs when the UI is disabled.
  *
  * Usage: sbt "runMain graft.StageBreakdownProbe <sfDir> <query>"
  */
object StageBreakdownProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: StageBreakdownProbe <sfDir> <query> [warm]")
    val sfDir = args(0)
    val name = args(1)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query: $name"))
    fn(spark, sfDir).queryExecution.toRdd.count() // warmup
    val rows = ArrayBuffer.empty[String]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        // appended on the listener-bus thread, read on main — both
        // sides synchronize on the buffer, and main polls until the
        // row count stabilizes instead of a fixed racy sleep (r15
        // ADVICE)
        rows.synchronized {
          rows += f"stage ${si.stageId}%4d  wall ${wall}%6dms  " +
            f"tasks ${si.numTasks}%4d  " +
            f"in ${m.inputMetrics.bytesRead / 1048576.0}%8.1fMB  " +
            f"sRead ${m.shuffleReadMetrics.totalBytesRead / 1048576.0}%8.1fMB/" +
            f"${m.shuffleReadMetrics.recordsRead}%9d  " +
            f"sWrite ${m.shuffleWriteMetrics.bytesWritten / 1048576.0}%8.1fMB  " +
            f"exec ${m.executorRunTime}%7dms  gc ${m.jvmGCTime}%5dms  " +
            si.name.takeWhile(_ != '\n').take(60)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).queryExecution.toRdd.count()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    var seen = -1
    var stable = rows.synchronized(rows.size)
    while (stable != seen) { // drain: poll until no new stage rows land
      seen = stable
      Thread.sleep(200)
      stable = rows.synchronized(rows.size)
    }
    println(s"== $name: $wall s, $n rows ==")
    rows.synchronized(rows.toList).foreach(println)
    spark.stop()
  }
}
