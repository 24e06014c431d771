package graft.engine

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Driver-side pipeline DAG runner — the stand-in for the reference's
  * Airflow orchestration (`dags/product.py:381-388` chains extract ×4 →
  * silver → gold with dependencies and per-task retries;
  * `docker-compose.airflow.yaml:56` supplies the scheduler). No scheduler
  * ships in this environment, so orchestration is a library call: tasks
  * declare dependencies, the runner executes them in dependency order
  * with bounded per-task retries.
  *
  * Execution model (same split as Airflow-over-Spark): the DAG walk is
  * DRIVER-side control flow — cheap, a handful of tasks — while all data
  * parallelism lives inside each task's Spark job. Independent ready
  * tasks can run concurrently (`parallelism` > 1, the reference runs its
  * four table extracts concurrently); retries compose with the engine's
  * idempotent loaders ([[ExtractLoad.run]], [[Layers.replacePartitionsPath]]),
  * so a task that dies mid-write re-runs safely — the property the spec
  * proves end-to-end.
  */
object Dag {

  /** @param maxAttempts total tries (1 = no retry), mirroring Airflow's
    *   per-task `retries` + 1. */
  final case class Task(name: String, deps: Seq[String], body: () => Unit,
      maxAttempts: Int = 3)

  /** @param order completion order (a valid topological order)
    * @param attempts tries actually used per task (1 = first-try success) */
  final case class Report(order: Seq[String], attempts: Map[String, Int])

  final class TaskFailed(val task: String, val tries: Int, cause: Throwable)
    extends RuntimeException(s"pipeline task '$task' failed after $tries attempts", cause)

  /** Run the DAG to completion (or throw [[TaskFailed]] on the first task
    * that exhausts its retries — downstream tasks never start, upstream
    * results stay where their idempotent sinks put them, and a re-run of
    * the whole DAG converges, as the reference's retry-the-DAG model
    * assumes). Throws on unknown dependencies and cycles. */
  def run(tasks: Seq[Task], parallelism: Int = 1): Report = {
    val byName = tasks.map(t => t.name -> t).toMap
    require(byName.size == tasks.size, "duplicate task names in pipeline DAG")
    for (t <- tasks; d <- t.deps)
      require(byName.contains(d), s"task '${t.name}' depends on unknown task '$d'")

    def attempt(t: Task): Int = {
      var tries = 0
      var last: Throwable = null
      while (tries < t.maxAttempts) {
        tries += 1
        // NonFatal only: retrying after OutOfMemoryError / interruption
        // masks a broken JVM as a transient failure
        try { t.body(); return tries }
        catch { case scala.util.control.NonFatal(e) => last = e }
      }
      throw new TaskFailed(t.name, tries, last)
    }

    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      var done = Set.empty[String]
      val order = Seq.newBuilder[String]
      val attempts = Map.newBuilder[String, Int]
      while (done.size < tasks.size) {
        // Kahn wave; name-sorted for a deterministic order and stable tests
        val ready = tasks.filter(t => !done(t.name) && t.deps.forall(done))
          .sortBy(_.name)
        if (ready.isEmpty)
          throw new IllegalStateException("cycle in pipeline DAG among: " +
            tasks.filterNot(t => done(t.name)).map(_.name).sorted.mkString(", "))
        // one wave of independent tasks runs concurrently; every sibling
        // is AWAITED (finishes its write cleanly) before any failure
        // propagates, so a partial wave leaves only complete task outputs
        val settled = Await.result(
          Future.sequence(ready.map(t =>
            Future(attempt(t)).transform(r => scala.util.Success((t, r))))),
          Duration.Inf)
        settled.foreach {
          case (t, scala.util.Success(a)) =>
            order += t.name; attempts += t.name -> a; done += t.name
          case _ => ()
        }
        settled.collectFirst { case (_, scala.util.Failure(e)) => e }.foreach(throw _)
      }
      Report(order.result(), attempts.result())
    } finally pool.shutdown()
  }
}
