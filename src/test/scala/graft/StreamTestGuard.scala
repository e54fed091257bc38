package graft

/** Hard-deadline wrapper for `StreamingQuery.processAllAvailable` in
  * specs. A wedged stream (micro-batch exception loop, a sink that
  * never settles) parks that call FOREVER — a previous round's
  * `sbt test` zombied 14 hours inside it at ~1.4 cores, silently
  * contaminating every benchmark window on the host until the JVM was
  * found by stack dump and killed. Tests must fail loudly instead.
  */
object StreamTestGuard {
  def drain(q: org.apache.spark.sql.streaming.StreamingQuery,
      timeoutSec: Int = 180): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val f = Future(q.processAllAvailable())
    try Await.result(f, timeoutSec.seconds)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        // unblock the parked future (stop aborts the drain) before
        // failing, so the suite dies with ONE clear error and no
        // leaked always-running query keeps the JVM busy
        try q.stop() catch { case scala.util.control.NonFatal(_) => () }
        throw new AssertionError(
          s"stream did not drain within ${timeoutSec}s — wedged " +
            s"micro-batch? status=${q.status}")
    }
  }
}
