package graft

import org.scalatest.funsuite.AnyFunSuite

/** The automated calm-window discipline ([[BenchGate]]): a noisy pass
  * triggers exactly one retry, every attempt's steal fraction is
  * recorded, the cap holds, and calm passes never re-run.
  *
  * Noise is INJECTED through the steal-counter seam: /proc/stat's
  * steal field only moves when the hypervisor deprives the vCPU — an
  * in-process burner raises user time, not steal — so a fake counter
  * is the only honest way to test the gate (the seam Bench fills with
  * the real reader).
  */
class BenchGateSpec extends AnyFunSuite {

  /** A fake whole-host steal counter: attempt k's delta is ticks(k).
    * BenchGate reads it twice per attempt (before/after the pass).
    */
  private final class FakeSteal(deltas: Long*) extends (() => Long) {
    private var total = 0L
    private var reads = 0
    private val it = deltas.iterator
    def apply(): Long = {
      // odd read = pass start, even read = pass end (+delta)
      if (reads % 2 == 1) total += (if (it.hasNext) it.next() else 0L)
      reads += 1
      total
    }
  }

  // each pass sleeps so the measured wall time is stable enough to
  // bound the fraction: 100 ms on 1 "core" → capacity 10 ticks;
  // 8 ticks ≈ 80% steal, 0 ticks = calm
  private def slowPass(counter: java.util.concurrent.atomic.AtomicInteger)(): Int = {
    Thread.sleep(100)
    counter.incrementAndGet()
  }

  test("noisy first attempt triggers exactly one retry; both fractions recorded") {
    val runs = new java.util.concurrent.atomic.AtomicInteger(0)
    val g = BenchGate.withRetry(maxFrac = 0.03, maxRetries = 2, cores = 1,
      stealTicks = new FakeSteal(8L, 0L))(() => slowPass(runs)())
    assert(runs.get == 2, s"expected exactly one retry, pass ran ${runs.get} times")
    assert(g.retries == 1)
    assert(g.stealFracs.size == 2)
    assert(g.stealFracs.head > 0.03,
      s"attempt 1 must record the noisy fraction: ${g.stealFracs.head}")
    assert(g.stealFracs.last <= 0.03,
      s"accepted attempt must be calm: ${g.stealFracs.last}")
    assert(g.result == 2, "the ACCEPTED result is the retried pass's")
  }

  test("calm pass never retries") {
    val runs = new java.util.concurrent.atomic.AtomicInteger(0)
    val g = BenchGate.withRetry(maxFrac = 0.03, maxRetries = 2, cores = 1,
      stealTicks = new FakeSteal(0L, 0L, 0L))(() => slowPass(runs)())
    assert(runs.get == 1 && g.retries == 0 && g.result == 1)
  }

  test("permanently noisy host: the cap holds and the last attempt is accepted") {
    val runs = new java.util.concurrent.atomic.AtomicInteger(0)
    val g = BenchGate.withRetry(maxFrac = 0.03, maxRetries = 2, cores = 1,
      stealTicks = new FakeSteal(8L, 8L, 8L, 8L))(() => slowPass(runs)())
    assert(runs.get == 3, s"cap: 1 attempt + 2 retries, ran ${runs.get}")
    assert(g.retries == 2 && g.stealFracs.size == 3)
    assert(g.stealFracs.forall(_ > 0.03),
      "every recorded fraction says the sweep is untrustworthy — the " +
        "JSON carries that verdict instead of a silent hang")
    assert(g.result == 3)
  }
}
