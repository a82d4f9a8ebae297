package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev measurement harness (optimization rounds): for each named gate
  * query, split wall time into BUILD (the query function itself — for
  * lifecycle gates this is where the driver program's actions run),
  * ANALYZE/OPTIMIZE/PLAN (Catalyst phases on the returned frame), and
  * EXECUTE (toRdd.count), and report how many Spark jobs ran and how
  * much executor task time they carried. Second and third passes show
  * the warm (codegen-cached) cost the bench's min-of-3 actually
  * reports. Usage:
  *
  *   runMain graft.OptProbe <query...> [--sf <dir>]
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val (flags, names) = args.partition(_.startsWith("--sf="))
    val dir = flags.headOption.map(_.stripPrefix("--sf="))
      .getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    // per-call-site stage rollup (wall = submit→complete, sum over
    // stages; overlapping stages double-count wall, fine for ranking)
    val bySite = new java.util.concurrent.ConcurrentHashMap[
      String, (Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskTimeMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        val wall = (for {
          a <- s.stageInfo.submissionTime; b <- s.stageInfo.completionTime
        } yield b - a).getOrElse(0L)
        val key = s.stageInfo.name.takeWhile(_ != '\n')
        bySite.merge(key,
          (1, wall, s.stageInfo.taskMetrics.executorRunTime),
          (x, y) => (x._1 + y._1, x._2 + y._2, x._3 + y._3))
      }
    })

    // warm-up (JVM/catalog), same trio as Bench
    Seq("q_a13_status_rollup", "q_j2_context_join", "q_t_quality")
      .flatMap(SparkEntry.queries.get).foreach { fn =>
        try fn(spark, dir).queryExecution.toRdd.count()
        catch { case _: Throwable => () }
      }

    val siteDetail = sys.env.contains("OPTPROBE_SITES")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 3).foreach { pass =>
        jobs.set(0); stages.set(0); taskTimeMs.set(0L); bySite.clear()
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        val qe = df.queryExecution
        qe.analyzed
        val t2 = System.nanoTime()
        qe.optimizedPlan
        val t3 = System.nanoTime()
        qe.executedPlan
        val t4 = System.nanoTime()
        qe.toRdd.count()
        val t5 = System.nanoTime()
        def s(a: Long, b: Long): String = f"${(b - a) / 1e9}%.2f"
        println(s"[probe] $name pass$pass total=${s(t0, t5)}s " +
          s"build=${s(t0, t1)} analyze=${s(t1, t2)} optimize=${s(t2, t3)} " +
          s"plan=${s(t3, t4)} exec=${s(t4, t5)} " +
          s"jobs=${jobs.get} stages=${stages.get} " +
          f"taskTime=${taskTimeMs.get / 1e3}%.1fs")
        if (sys.env.contains("OPTPROBE_PLAN") && pass == 2) {
          // post-execution: the ADAPTIVE plan is final here, so
          // WholeStageCodegen wrapping / codegen ids are visible
          // (pre-execution explain on an AQE plan hides them)
          println(s"[plan-final] $name\n${qe.executedPlan.toString.take(8000)}")
        }
        if (siteDetail && pass == 2) {
          import scala.jdk.CollectionConverters._
          bySite.asScala.toSeq.sortBy(-_._2._2).take(30).foreach {
            case (site, (n, wall, task)) =>
              println(f"[site] $name n=$n%-4d wall=${wall / 1e3}%7.2fs " +
                f"task=${task / 1e3}%7.2fs  $site")
          }
        }
        System.gc()
      }
    }
    spark.stop()
  }
}
