package graft.streaming

import java.util.concurrent.FutureTask

/** Driver-side overlap of INDEPENDENT Spark actions (the optimization
  * guide's "overlap independent jobs": the scheduler happily runs
  * several jobs at once inside one application — actions are only
  * sequential because driver code calls them sequentially — so legs
  * with no data or ordering dependency can back-fill the executor
  * slots freed by each other's stragglers and scheduler floors).
  *
  * Contract, holding at every call site:
  *  - the legs are order-independent: no leg reads state another leg
  *    writes, and every externally visible interleaving of their side
  *    effects is equivalent under the caller's crash/replay protocol;
  *  - every leg has FINISHED before control returns — even when one
  *    fails — so a lock or writer lease wrapping the call still covers
  *    all of them (a side write escaping its lease would break the
  *    single-admission protocol);
  *  - failures propagate: the first failure is rethrown after all legs
  *    have stopped, with any further failures attached as suppressed.
  */
private[graft] object Concurrent {

  /** Run `side` on its own thread while `main` runs on the caller's;
    * join `side` (rethrowing its failure) before returning. */
  def overlap[T](side: () => Unit)(main: => T): T = {
    val task = new FutureTask[Unit](() => side())
    val t = new Thread(task, "graft-overlap-side")
    t.setDaemon(true)
    t.start()
    val r =
      try main
      catch {
        case e: Throwable =>
          // main failed: still wait the side leg out so no write
          // outlives the caller's lease, then surface main's failure
          try task.get()
          catch { case se: Throwable => e.addSuppressed(se) }
          throw e
      }
    task.get()
    r
  }

  /** Run all legs concurrently (legs.tail on threads, legs.head on the
    * caller's); join everything before returning or rethrowing. */
  def all(legs: Seq[() => Unit]): Unit = {
    if (legs.isEmpty) return
    if (legs.length == 1) { legs.head(); return }
    val tasks = legs.tail.map(l => new FutureTask[Unit](() => l()))
    val threads = tasks.zipWithIndex.map { case (task, i) =>
      val t = new Thread(task, s"graft-parallel-leg-$i")
      t.setDaemon(true)
      t.start()
      t
    }
    var failure: Throwable = null
    try legs.head()
    catch { case e: Throwable => failure = e }
    tasks.foreach { task =>
      try task.get()
      catch {
        case e: Throwable =>
          val cause = e match {
            case ee: java.util.concurrent.ExecutionException
                if ee.getCause != null => ee.getCause
            case other => other
          }
          if (failure == null) failure = cause
          else failure.addSuppressed(cause)
      }
    }
    threads.foreach(_.join())
    if (failure != null) throw failure
  }
}
