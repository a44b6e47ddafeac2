package graft

import org.scalatest.funsuite.AnyFunSuite

/** Per-key bench budget (PERF_NOTES.md): no single query may exceed
  * 10 s at sf0.1. Round 3 shipped a 98.6 s key that only surfaced in the
  * driver's bench — this gate makes the next one fail in the builder's
  * own loop. Checks the latest `target/bench.json` when present (the
  * Bench main mirrors its stdout JSON line there); skips silently on a
  * fresh checkout with no bench artifact.
  */
class BenchBudgetSuite extends AnyFunSuite {
  private val BudgetSec = Bench.BudgetSec

  test("BENCH_LOCAL eligibility is pinned to the exact sf0.1 contract dir") {
    // Round-11 advice: the old startsWith("/root/testdata/") guard let a
    // run at ANY scale factor overwrite the committed sf0.1 artifact.
    assert(Bench.benchLocalEligible("/root/testdata/sf0.1", cwdHasBuild = true, cpus = "32"))
    // Path-normal variants of the contract dir still qualify…
    assert(Bench.benchLocalEligible("/root/testdata/sf0.1/", cwdHasBuild = true, cpus = "32"))
    assert(Bench.benchLocalEligible("/root/testdata/./sf0.1", cwdHasBuild = true, cpus = "32"))
    // …but other scale factors, scratch dirs, and non-repo cwds never do.
    assert(!Bench.benchLocalEligible("/root/testdata/sf0.01", cwdHasBuild = true, cpus = "32"))
    assert(!Bench.benchLocalEligible("/root/testdata/sf0.001", cwdHasBuild = true, cpus = "32"))
    assert(!Bench.benchLocalEligible("/tmp/graft_mini123", cwdHasBuild = true, cpus = "32"))
    assert(!Bench.benchLocalEligible("/root/testdata/sf0.1", cwdHasBuild = false, cpus = "32"))
    // Round-19 verdict item 6: the driver's 8-core scaling run clobbered
    // the committed 32-core per-key map — non-contract core counts never
    // qualify.
    assert(!Bench.benchLocalEligible("/root/testdata/sf0.1", cwdHasBuild = true, cpus = "8"))
    assert(!Bench.benchLocalEligible("/root/testdata/sf0.1", cwdHasBuild = true, cpus = "4"))
  }

  test("breach adjudication: consistent reruns under a noisy host are not confirmed hot") {
    // Round-10 blind spot: contention spanning both reps self-confirms.
    // Consistent + quiet host (no steal, load under thread count) → hot.
    assert(Bench.classifyBreach(confirmed = true, stealDelta = 0, load1m = 8.0, cpus = 32)
      == "confirmed_hot")
    // Consistent but co-tenant steal observed in the key's own window →
    // suspect, never hot.
    assert(Bench.classifyBreach(confirmed = true, stealDelta = 40, load1m = 8.0, cpus = 32)
      == "contention_suspect")
    // Consistent but the host is overloaded beyond our own threads →
    // suspect.
    assert(Bench.classifyBreach(confirmed = true, stealDelta = 0, load1m = 48.0, cpus = 32)
      == "contention_suspect")
    // Inconsistent reruns: min-of-reps already recovered the true cost.
    assert(Bench.classifyBreach(confirmed = false, stealDelta = 40, load1m = 48.0, cpus = 32)
      == "recovered")
  }

  test(s"no bench key exceeds ${BudgetSec}s in target/bench.json (when present)") {
    val p = java.nio.file.Paths.get("target/bench.json")
    assume(java.nio.file.Files.exists(p), "no bench artifact — run graft.Bench first")
    val json = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    // Only gate sf0.1 artifacts — a local sf0.01 iteration run shouldn't
    // trip (or falsely pass) the sf0.1 budget.
    assume(json.contains("sf0.1"), "bench artifact is not an sf0.1 run")
    val q = json.substring(json.indexOf("\"queries\":{") + "\"queries\":{".length)
    val entries = "\"([a-z0-9_]+)\":([0-9.eE+-]+)".r
      .findAllMatchIn(q.takeWhile(_ != '}'))
      .map(m => m.group(1) -> m.group(2).toDouble).toSeq
    assert(entries.nonEmpty, "bench.json has no query entries")
    val over = entries.filter(_._2 > BudgetSec)
    assert(over.isEmpty,
      s"keys over the ${BudgetSec}s sf0.1 budget: " +
        over.map { case (k, v) => f"$k=$v%.1fs" }.mkString(", "))
    // Rerun-adjudicated keys report min-of-reps in "queries", but their
    // FIRST (cold) time is preserved in "cold" — gate it at 3× budget so
    // a genuinely slow key whose warm rerun rides a memoized cache can't
    // launder itself under the 10 s line (observed contention inflates
    // cheap keys 20-60×, so 30 s stays above any plausible noise draw on
    // a healthy key while catching a round-3-style 98 s regression).
    val ci = json.indexOf("\"cold\":{")
    if (ci >= 0) {
      val c = json.substring(ci + "\"cold\":{".length)
      val coldOver = "\"([a-z0-9_]+)\":([0-9.eE+-]+)".r
        .findAllMatchIn(c.takeWhile(_ != '}'))
        .map(m => m.group(1) -> m.group(2).toDouble)
        .filter(_._2 > 3 * BudgetSec).toSeq
      assert(coldOver.isEmpty,
        s"keys whose COLD first run exceeds ${3 * BudgetSec}s: " +
          coldOver.map { case (k, v) => f"$k=$v%.1fs" }.mkString(", "))
    }
  }
}
