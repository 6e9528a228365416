package graft.functions

/**
 * Allocation-free 64-bit string hash for the dedup kernels: FNV-1a over UTF-16 code units
 * with a murmur3-style avalanche finalizer (public-domain constructions). Not a
 * cryptographic hash — it only needs uniformity: Jaccard over hashed gram sets equals
 * Jaccard over the gram strings up to 64-bit birthday collisions (~1e-4 even at 10^8
 * distinct grams). Used from JIT-compiled typed-Dataset kernels where a Catalyst
 * expression would run interpreted per element.
 */
object FastHash {
  @inline def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    mix(h)
  }

  /** Final avalanche (murmur3 fmix64) — also used to combine band members. */
  @inline def mix(x: Long): Long = {
    var h = x
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }
}
