package graft

/** Attributes executor-task CPU to queries via job-group id — the
  * contention-immune per-query COST measure (wall under concurrent
  * submission bills co-scheduled work; executor CPU cannot). Job start
  * events carry the submitting thread's `spark.jobGroup.id` plus the
  * job's stage ids; task-end events carry stage id + task metrics.
  * Both maps are concurrent because the listener bus is a separate
  * thread, and delivery is async — callers snapshot after a short
  * drain wait. Used by Bench (per-query `queries_cpu_sec`) and
  * ScalingBench (per-op `ops_cpu`). */
final class QueryCpuListener extends org.apache.spark.scheduler.SparkListener {
  import java.util.concurrent.ConcurrentHashMap
  import java.util.concurrent.atomic.AtomicLong
  private val stageToQuery = new ConcurrentHashMap[Int, String]()
  private val cpuNs = new ConcurrentHashMap[String, AtomicLong]()

  override def onJobStart(
      js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
    val g = Option(js.properties)
      .flatMap(p => Option(p.getProperty("spark.jobGroup.id"))).getOrElse("")
    if (g.nonEmpty)
      js.stageIds.foreach(sid => stageToQuery.put(sid, g))
  }

  override def onTaskEnd(
      te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
    val q = stageToQuery.get(te.stageId)
    if (q != null && te.taskMetrics != null)
      cpuNs.computeIfAbsent(q, _ => new AtomicLong())
        .addAndGet(te.taskMetrics.executorCpuTime)
  }

  /** Per-query executor CPU seconds accumulated since the last reset. */
  def snapshot(): Map[String, Double] = {
    val b = Map.newBuilder[String, Double]
    cpuNs.forEach((k, v) => b += k -> v.get() / 1e9)
    b.result()
  }

  def reset(): Unit = { stageToQuery.clear(); cpuNs.clear() }
}
