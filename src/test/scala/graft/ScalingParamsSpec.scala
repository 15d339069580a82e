package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorLsh
import graft.dedup.Dedup

/** The corpus-size-derived LSH key-space parameters: bucket self-joins
  * are O(per-bucket²), so key spaces must grow with the corpus. These
  * formulas are mirrored into the DuckDB oracles (planesForSql / the
  * simhash sbp CTE) — integer-exact arithmetic, no FP log boundaries.
  */
class ScalingParamsSpec extends AnyFunSuite {

  test("planesFor targets ~16 vectors per bucket, clamped [8, 20]") {
    // r14 retarget (/1000 → /16): the second-decade measurement caught
    // the /1000 target leaving buckets frozen at 256 through the whole
    // 4k–256k range (dedup_embedding 65.9× on a 10× corpus); /16 grows
    // the key space right above the driver SFs while keeping every
    // driver-SF hash unchanged (n ≤ 4096 still yields 8 planes)
    assert(VectorLsh.planesFor(0) == 8)
    assert(VectorLsh.planesFor(1000) == 8)
    assert(VectorLsh.planesFor(2000) == 8) // gate scale: matches legacy 8-plane key
    assert(VectorLsh.planesFor(4000) == 8) // doubled gate corpus: unchanged
    assert(VectorLsh.planesFor(4096) == 8) // 2^8 buckets × 16 exactly
    assert(VectorLsh.planesFor(4097) == 9)
    assert(VectorLsh.planesFor(40000) == 12) // the gsf1 decade point
    assert(VectorLsh.planesFor(1000000) == 16)
    assert(VectorLsh.planesFor(100000000L) == 20)
    assert(VectorLsh.planesFor(1000000000L) == 20)
    assert(VectorLsh.planesFor(Long.MaxValue / 4) == 20) // cap
  }

  test("planesFor never exceeds the materialized sign table") {
    assert(VectorLsh.signs.length == VectorLsh.MaxPlanes)
    Seq(0L, 999L, 123456L, 1L << 40).foreach { n =>
      assert(VectorLsh.planesFor(n) <= VectorLsh.MaxPlanes)
    }
  }

  test("cellsFor targets ~400 vectors per cluster, clamped [16, 4096]") {
    import graft.ann.Ann
    assert(Ann.cellsFor(0) == 16)
    assert(Ann.cellsFor(4000) == 16) // gate scale: shares the IVF quantizer
    assert(Ann.cellsFor(6400) == 16) // 16 × 400 exactly
    assert(Ann.cellsFor(6401) == 32)
    assert(Ann.cellsFor(1000000) == 4096)
    assert(Ann.cellsFor(400L * 4096) == 4096)
    assert(Ann.cellsFor(Long.MaxValue / 4) == 4096) // cap
  }

  test("simhashBands widens blocks past 2^23 docs") {
    assert(Dedup.simhashBands(1000) == 8) // 8×8-bit: pigeonhole hamming ≤ 7
    assert(Dedup.simhashBands(8388607L) == 8)
    assert(Dedup.simhashBands(8388608L) == 4) // 4×16-bit: 256× key space
    assert(Dedup.simhashBands(1000000000L) == 4)
  }
}
