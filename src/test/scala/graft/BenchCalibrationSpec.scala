package graft

import org.scalatest.funsuite.AnyFunSuite

/** Interleaved bench calibration (r17 verdict lead item): the three
  * anchors run at start/middle/end of the suite; machine_index takes
  * each anchor's MIN across segments so a transient mid-run load spike
  * inflates that segment's index (visible as drift) but NOT the
  * cross-round normalizer. The motivating fixture is r17's cu15-cu17
  * false alarm: a hot window read 2-6x on the driver box and took a
  * full judge re-run to adjudicate. */
class BenchCalibrationSpec extends AnyFunSuite {

  private val refs = Map("c1" -> 4.0, "g5" -> 3.0, "w2" -> 0.1)

  test("segment index is the geomean of time/ref") {
    // every anchor exactly at reference → 1.0
    val idle = Seq("c1" -> 4.0, "g5" -> 3.0, "w2" -> 0.1)
    assert(math.abs(Bench.segmentIndex(idle, refs) - 1.0) < 1e-9)
    // uniformly 2x → 2.0
    val hot = idle.map { case (n, t) => n -> t * 2 }
    assert(math.abs(Bench.segmentIndex(hot, refs) - 2.0) < 1e-9)
    // crashed anchors (negative sentinel) are skipped, not averaged
    val crashed = Seq("c1" -> -4.0, "g5" -> 6.0, "w2" -> 0.2)
    assert(math.abs(Bench.segmentIndex(crashed, refs) - 2.0) < 1e-9)
    // nothing valid → -1 sentinel
    assert(Bench.segmentIndex(Seq("c1" -> -1.0), refs) == -1.0)
    assert(Bench.segmentIndex(Seq.empty, refs) == -1.0)
  }

  test("mid-run load spike inflates drift, not machine_index") {
    // the r17 shape: idle start, a hot middle window, idle end
    val start = Seq("c1" -> 4.2, "g5" -> 3.1, "w2" -> 0.105)
    val mid = Seq("c1" -> 12.0, "g5" -> 9.5, "w2" -> 0.4) // ~3x spike
    val end = Seq("c1" -> 4.1, "g5" -> 3.2, "w2" -> 0.11)
    val segs = Seq(start, mid, end)
    val segIdxs = segs.map(Bench.segmentIndex(_, refs))
    // the hot window is visible in the per-segment indexes...
    assert(segIdxs(1) > 2.5 && segIdxs(0) < 1.2 && segIdxs(2) < 1.2)
    assert(Bench.driftOf(segIdxs) > 2.0)
    // ...but the overall index takes per-anchor mins, so it reads idle
    val mi = Bench.machineIndexOf(segs, refs)
    assert(mi > 0.9 && mi < 1.15, s"machine_index $mi")
  }

  test("machine index is order-independent across segments") {
    val a = Seq("c1" -> 5.0, "g5" -> 4.0, "w2" -> 0.15)
    val b = Seq("c1" -> 4.5, "g5" -> 4.5, "w2" -> 0.12)
    val c = Seq("c1" -> 6.0, "g5" -> 3.5, "w2" -> 0.2)
    val fwd = Bench.machineIndexOf(Seq(a, b, c), refs)
    val rev = Bench.machineIndexOf(Seq(c, b, a), refs)
    assert(math.abs(fwd - rev) < 1e-12)
    // and equals the old back-to-back best-of-3 estimator
    val best = Seq("c1" -> 4.5, "g5" -> 3.5, "w2" -> 0.12)
    assert(math.abs(fwd - Bench.segmentIndex(best, refs)) < 1e-12)
  }

  test("drift handles degenerate inputs") {
    assert(Bench.driftOf(Seq(1.0, 1.5, 1.2)) == 1.5)
    assert(Bench.driftOf(Seq(1.0)) == -1.0) // one valid segment
    assert(Bench.driftOf(Seq(-1.0, -1.0)) == -1.0) // all crashed
    assert(Bench.driftOf(Seq(-1.0, 1.1, 1.1)) == 1.0) // crashed skipped
  }

  test("a crashed anchor in one segment falls back to other segments") {
    val a = Seq("c1" -> -9.0, "g5" -> 3.0, "w2" -> 0.1) // c1 crashed here
    val b = Seq("c1" -> 4.0, "g5" -> 3.0, "w2" -> 0.1)
    val mi = Bench.machineIndexOf(Seq(a, b), refs)
    assert(math.abs(mi - 1.0) < 1e-9)
  }
}
