package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/**
 * Optimization-round measurement aid (guide §1): run named queries under the
 * Bench session posture and print, per query, the per-Spark-job wall clock
 * with job descriptions plus stage-level task metrics — so a multi-action
 * query (catalog DML histories, mview folds) shows WHERE its seconds go
 * instead of one opaque total. Also prints driver-side gaps (time between
 * jobs = planning/FS/driver work), the number the job timeline can't show.
 *
 *   sbt "runMain graft.Profile q_mview_minmax q_catalog_merge"
 *
 * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
 * Each query runs twice: cold (fixture/memo builds) and warm; both reported.
 * Purely additive tooling — no query semantics live here.
 */
object Profile {
  private case class JobRec(id: Int, desc: String, start: Long, var end: Long = -1L)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_flagship")
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown: ${unknown.mkString(",")}")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.graft.cacheTables", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LogHygiene.muteBenignWindowWarning()

    val jobs = new ConcurrentHashMap[Int, JobRec]()
    val stageTasks = new ConcurrentHashMap[Int, (Int, Long, Long, Long)]() // stage -> (tasks, taskTimeMs, shufWr, input)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(j.jobId, JobRec(j.jobId, desc, j.time))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val r = jobs.get(j.jobId); if (r != null) r.end = j.time
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        if (m != null)
          stageTasks.put(si.stageId,
            (si.numTasks, m.executorRunTime, m.shuffleWriteMetrics.bytesWritten,
              m.inputMetrics.bytesRead))
      }
    })

    // warm the base tables like Bench does
    try Tables.all.foreach(t => Tables(spark, sfDir, t).count())
    catch { case _: Throwable => () }

    for (name <- names; pass <- Seq("cold", "warm")) {
      jobs.clear(); stageTasks.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val recs = {
        import scala.jdk.CollectionConverters._
        jobs.values.asScala.toSeq.sortBy(_.start)
      }
      val jobWall = recs.filter(_.end > 0).map(r => r.end - r.start).sum / 1e3
      println(f"== $name [$pass] wall=$wall%.3f s, jobs=${recs.size}, jobWall=$jobWall%.3f s, gap=${wall - jobWall}%.3f s")
      var prevEnd = -1L
      recs.foreach { r =>
        val dur = if (r.end > 0) (r.end - r.start) / 1e3 else -1.0
        val gap = if (prevEnd > 0) (r.start - prevEnd) / 1e3 else 0.0
        prevEnd = math.max(prevEnd, r.end)
        val tag = r.desc.take(90)
        if (dur >= 0.01 || gap >= 0.01)
          println(f"   job ${r.id}%4d  ${dur}%7.3f s  (+gap ${gap}%6.3f)  $tag")
      }
    }
    spark.stop()
  }
}
