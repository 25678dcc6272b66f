package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Per-stage profile of one query entry — the repeatable form of the
  * diagnosis that found the r16 bitext serialization bug (three
  * single-task stages hiding behind a healthy-looking wall total):
  * runs `SparkEntry.queries(name)` through the noop sink and prints
  * every stage's wall time, TASK COUNT, summed executor CPU, and
  * input/shuffle record counts, sorted by wall time.
  *
  * Read it like this: a stage with `tasks=1` and seconds of CPU is a
  * serialization bug (AQE byte-coalescing of a CPU-heavy narrow frame,
  * or a fan-out streaming on the wrong side of a broadcast join — see
  * SURVEY §5's "where AQE's cost model is wrong"); a stage whose CPU
  * is ~tasks× its wall time is genuinely parallel work; total CPU far
  * above wall×cores means recomputation (a missing pin).
  *
  * Usage: runMain graft.tools.StageProfile <sfDir> <queryName> [runs]
  * (later runs are warm — compare run 1 vs run N to split JIT/IO
  * warm-up from plan time).
  */
object StageProfile {

  private final class Agg {
    var tasks = 0
    var cpuNs = 0L
    var inputRecords = 0L
    var shuffleRecords = 0L
    var name = ""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // comma-separated list: profile several entries in ONE JVM so a
    // profiling sweep doesn't pay sbt+session startup per query
    val names = args.lift(1).getOrElse("q1_agg").split(",").toSeq
    val runs = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = graft.core.Graft.session()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach(n => require(graft.SparkEntry.queries.contains(n),
      s"unknown query '$n'; keys: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    names.foreach { name => profileOne(spark, sfDir, name, runs) }
    spark.stop()
  }

  private def profileOne(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, name: String, runs: Int): Unit = {
    val fn = graft.SparkEntry.queries(name)
    val stages = mutable.LinkedHashMap.empty[Int, (Double, Agg)]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        stages.synchronized {
          val a = stages.getOrElseUpdate(si.stageId, (dur, new Agg))._2
          // the first graft frame in the submission stack names the
          // operator that built this stage far better than si.name
          // (broadcast/subquery stages all submit from CompletableFuture)
          a.name = si.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("tools."))
            .map(_.trim.take(80))
            .getOrElse(si.name.takeWhile(_ != '\n').take(60))
          // the stage's RDD callsites name the operators it executes —
          // the only attribution that survives broadcast-thread stages
          if (sys.env.contains("SPARK_GRAFT_PROFILE_RDDS"))
            a.name += " | " + si.rddInfos.map(_.callSite).distinct.mkString("; ").take(300)
          stages(si.stageId) = (dur, a)
        }
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) stages.synchronized {
          val a = stages.getOrElseUpdate(te.stageId, (0.0, new Agg))._2
          a.tasks += 1
          a.cpuNs += m.executorCpuTime
          a.inputRecords += m.inputMetrics.recordsRead
          a.shuffleRecords += m.shuffleReadMetrics.recordsRead
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    (1 to runs).foreach { r =>
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // let the async listener bus drain before reading the map
      Thread.sleep(500)
      println(f"== $name run $r/$runs: wall $wall%.2f s ==")
      println(f"${"wall_s"}%8s ${"stage"}%6s ${"tasks"}%6s ${"cpu_s"}%8s ${"input_recs"}%13s ${"shuffle_recs"}%13s")
      stages.synchronized(stages.toSeq).sortBy(-_._2._1).take(15).foreach {
        case (sid, (dur, a)) =>
          val flag = if (a.tasks == 1 && dur > 1.0) "  <- SINGLE-TASK" else ""
          println(f"$dur%8.2f $sid%6d ${a.tasks}%6d ${a.cpuNs / 1e9}%8.1f ${a.inputRecords}%13d ${a.shuffleRecords}%13d  ${a.name}$flag")
      }
      // release the finished run's pins so back-to-back profiles don't
      // cross-contaminate through cached blocks (the Bench idiom)
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
  }
}
