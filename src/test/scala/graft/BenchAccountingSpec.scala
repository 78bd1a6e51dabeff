package graft

import org.scalatest.funsuite.AnyFunSuite

/** The B3 gate number must not be deflatable by a failed query: a subset
  * query whose every pass failed (min sentinel -1) must shrink `n` and
  * surface by name, never silently lower the total (ADVICE r10). */
class BenchAccountingSpec extends AnyFunSuite {

  private def fakeResults(failed: Set[String]): Seq[(String, (Double, Double))] =
    (Bench.B3Subset.toSeq.sorted ++ Seq("q99_not_in_subset")).map { k =>
      k -> (if (failed(k)) (-1.0, -1.0) else (0.5, 0.6))
    }

  test("all subset queries measured: n=20, no failures") {
    val (total, n, fail) = Bench.b3Accounting(fakeResults(Set.empty))
    assert(n == 20 && fail.isEmpty)
    assert(math.abs(total - 10.0) < 1e-9)
  }

  test("a forced subset failure shrinks n and is named, total excludes it") {
    val (total, n, fail) = Bench.b3Accounting(fakeResults(Set("q05_multiway_join_agg")))
    assert(n == 19, "n must count MEASURED queries, not subset size")
    assert(fail == Seq("q05_multiway_join_agg"))
    assert(math.abs(total - 9.5) < 1e-9, "failed query must not deflate via -1")
  }

  test("non-subset failures don't leak into b3 accounting") {
    val (_, n, fail) = Bench.b3Accounting(fakeResults(Set("q99_not_in_subset")))
    assert(n == 20 && fail.isEmpty)
  }

  test("the frozen subset is exactly the 20 B1-era names") {
    assert(Bench.B3Subset.size == 20)
    assert(Bench.B3Subset.forall(SparkEntry.queries.contains),
      "frozen names must stay resolvable against the live query surface")
  }
}
