package graft

/** Deterministic LCG for spec-local random corpora (the MonoidLawsSpec
  * pattern: scalatestplus-scalacheck is not in the offline cache, so specs
  * drive their own seeded generation). Same mixing constants as
  * Dedup.blockMasks' self-contained shuffler.
  */
final class SeededRng(seed: Long) {
  private var state = seed
  /** uniform in [0, bound) */
  def nextInt(bound: Int): Int = {
    state = state * 6364136223846793005L + 1442695040888963407L
    (((state >>> 33) % bound + bound) % bound).toInt
  }
  def nextLong(bound: Int): Long = nextInt(bound).toLong
}
