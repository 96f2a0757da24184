package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketch structures for corpus-scale membership, frequency,
  * and cardinality — the pre-filters that keep 100 TB pipelines from
  * shuffling their full key streams:
  *
  *  - '''Bloom filter''' (Bloom, CACM 1970): packed-bitset membership.
  *    Build is one `groupBy(word).agg(bit_or)` over the distinct bit
  *    positions (map-side partial dedup does the heavy lifting; the
  *    shuffle carries at most m/64 partial words per task) and the
  *    probe is k O(1) bit tests against the broadcast literal words —
  *    all plain codegen'd arithmetic, no UDF. No false negatives ever;
  *    false-positive rate ≈ (1 - e^(-kn/m))^k.
  *  - '''Count-min sketch''' (Cormode & Muthukrishnan, J.Alg 2005):
  *    d×w counter matrix. Build is one `groupBy(row, col).count`
  *    (map-side combined — the shuffle is at most d·w partial rows per
  *    task regardless of stream length); estimate = min over the d
  *    counters, never an underestimate.
  *  - '''HyperLogLog''' (Flajolet et al., AofA 2007): max-rho register
  *    file. Build is `groupBy(key, bucket).agg(max(rho))` — Spark's
  *    partial-max aggregation IS the sketch merge, so the shuffle
  *    carries at most m registers per group per task.
  *
  * All hash math is affine over the portable 32-bit md5-derived hashes
  * (the [[graft.functions.TextAnalysis.tokenHash]] family), so the
  * DuckDB oracle replays every sketch bit-identically. The collected
  * artifacts are bounded driver state by construction (m/64 longs,
  * d·w longs, m registers) — the same justification as the bucketed
  * inventory metadata collects.
  */
object Sketches {

  /** Affine position hashes h_i(g) = (h1 + i·h2) mod m over a 32-bit
    * base hash g, with (h1, h2) from the minhash parameter family
    * (seeds `seedA`/`seedA+1`). h1 + (k-1)·h2 < 2^35 — no overflow.
    */
  private def affine(g: Column, seed: Int): Column = {
    val (a, b) = graft.functions.TextAnalysis.affineParam(seed)
    (g * lit(a) + lit(b)) % lit(graft.functions.TextAnalysis.MinhashPrime)
  }

  // ------------------------------------------------------------------
  // Bloom filter
  // ------------------------------------------------------------------

  /** The k bit positions of base-hash column `g` (nonneg 32-bit long)
    * in an m-bit Bloom filter, as an array column. `m` must be a power
    * of two.
    */
  def bloomPositions(g: Column, m: Int, k: Int, seedA: Int = 9001): Column = {
    val h1 = affine(g, seedA)
    val h2 = affine(g, seedA + 1)
    transform(sequence(lit(0), lit(k - 1)), i => (h1 + i * h2) % lit(m.toLong))
  }

  /** Literal lookup of 1L << j for j = 0..63 — `shiftleft` only takes
    * a plan-time-constant bit count, so dynamic single-bit words come
    * from this 64-entry table instead.
    */
  private val bitMasks = Array.tabulate(64)(1L << _).toSeq

  /** Build the packed bitset: distinct bit positions → `bit_or` of the
    * single-bit words, grouped by word index. Returns m/64 longs
    * (missing words are 0). The collect is bounded by m/64 regardless
    * of input size — for the default 2^16-bit filter that is 1024
    * longs (8 KiB), broadcast-literal territory.
    */
  def bloomBuild(df: DataFrame, g: Column, m: Int, k: Int,
                 seedA: Int = 9001): Array[Long] = {
    require(Integer.bitCount(m) == 1, s"m must be a power of two, got $m")
    val words = df
      .select(explode(bloomPositions(g, m, k, seedA)).as("p"))
      .distinct()
      .select(shiftright(col("p"), 6).cast("int").as("w"),
        element_at(typedLit(bitMasks),
          col("p").bitwiseAND(lit(63L)).cast("int") + 1).as("b"))
      .groupBy("w").agg(bit_or(col("b")).as("word"))
      .collect()
    val packed = new Array[Long](m / 64)
    words.foreach(r => packed(r.getInt(0)) = r.getLong(1))
    packed
  }

  /** Membership probe of base-hash column `g` against the packed words
    * (a plan-time literal): k bit tests, each one element_at + AND —
    * O(1) per probe, fully codegen'd.
    */
  def bloomProbe(g: Column, words: Array[Long], m: Int, k: Int,
                 seedA: Int = 9001): Column = {
    val wl = typedLit(words.toSeq)
    val masks = typedLit(bitMasks)
    val h1 = affine(g, seedA)
    val h2 = affine(g, seedA + 1)
    (0 until k).map { i =>
      val p = (h1 + lit(i.toLong) * h2) % lit(m.toLong)
      val word = element_at(wl, shiftright(p, 6).cast("int") + 1)
      val mask = element_at(masks, p.bitwiseAND(lit(63L)).cast("int") + 1)
      word.bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)
  }

  // ------------------------------------------------------------------
  // Count-min sketch
  // ------------------------------------------------------------------

  /** Build the d×w counter matrix over base-hash column `g` (one count
    * per occurrence): explode the d (row, col) cells per occurrence,
    * `groupBy(row, col).count`. Returns row-major d·w longs. Map-side
    * combine bounds every task's shuffle output at d·w partial rows.
    */
  def cmsBuild(df: DataFrame, g: Column, d: Int, w: Int,
               seedA: Int = 9101): Array[Long] = {
    val h1 = affine(g, seedA)
    val h2 = affine(g, seedA + 1)
    val cells = df
      .select(explode(transform(sequence(lit(0), lit(d - 1)),
        r => struct(r.as("r"), ((h1 + r * h2) % lit(w.toLong)).as("c"))))
        .as("cell"))
      .groupBy(col("cell.r").as("r"), col("cell.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
    val counters = new Array[Long](d * w)
    cells.foreach(r => counters(r.getInt(0) * w + r.getLong(1).toInt) =
      r.getLong(2))
    counters
  }

  /** Point estimate for base-hash column `g`: min over the d counters
    * (plan-time literal matrix). Never underestimates the true count.
    */
  def cmsEstimate(g: Column, counters: Array[Long], d: Int, w: Int,
                  seedA: Int = 9101): Column = {
    val cl = typedLit(counters.toSeq)
    val h1 = affine(g, seedA)
    val h2 = affine(g, seedA + 1)
    (0 until d).map { r =>
      element_at(cl,
        ((lit(r.toLong * w) + (h1 + lit(r.toLong) * h2) % lit(w.toLong)))
          .cast("int") + 1)
    }.reduce((a, b) => least(a, b))
  }

  /** Exact total stream length from the sketch: every occurrence adds
    * exactly one to each row, so any single row sums to N.
    */
  def cmsTotal(counters: Array[Long], w: Int): Long =
    counters.take(w).sum

  // ------------------------------------------------------------------
  // HyperLogLog (p = 8, m = 256 registers)
  // ------------------------------------------------------------------

  /** Number of HLL registers (2^8). */
  val HllM = 256

  /** Portable 60-bit hash of a string column: first 15 md5 hex digits.
    * DuckDB twin: `cast('0x' || substr(md5(t), 1, 15) as bigint)`.
    * 60 bits = 8 bucket bits + a 52-bit rho window, so registers cap
    * at 53 and 2^-register stays an exact double.
    */
  def hash60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** (bucket, rho) of a 60-bit hash: bucket = low 8 bits, rho = run
    * position of the leftmost 1-bit in the remaining 52 bits (53 when
    * they are all zero). `bin()` is unpadded in both engines, so
    * rho = 53 - bit_length(h >> 8) without bit-twiddling loops.
    */
  def hllBucket(h: Column): Column = h.bitwiseAND(lit(255L))

  def hllRho(h: Column): Column = {
    val w = shiftright(h, 8)
    when(w === 0L, lit(53L)).otherwise(lit(53L) - length(bin(w)))
  }

  /** Plan-time Scala twin of [[hllEstimateMilli]] over a dense
    * register file (index = bucket, 0 = never seen): same fold order
    * (present registers in ascending bucket order, then one unit per
    * missing bucket), same constants, same branches — bit-identical
    * estimates (spec-pinned). The streaming register maintainer
    * ([[graft.streaming.StreamSketch]]) emits through this.
    */
  def hllEstimateMilliScala(regs: Array[Int]): Long = {
    val m = HllM
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val pow2neg = Array.tabulate(54)(j => math.pow(2.0, -j))
    var s = 0.0
    var seen = 0
    var b = 0
    while (b < m) {
      if (regs(b) > 0) { s += pow2neg(regs(b)); seen += 1 }
      b += 1
    }
    s += (m - seen).toDouble
    val vZero = (m - seen).toDouble
    val raw = (alpha * m * m) / s
    val est =
      if (raw <= 2.5 * m && vZero > 0.0) m.toDouble * math.log(m.toDouble / vZero)
      else raw
    math.floor(1000.0 * est).toLong
  }

  /** Registers per group → the HLL estimate, from a SORTED array of
    * (bucket, rho-max) structs (missing buckets are zero registers).
    * The harmonic sum folds the present registers in ascending bucket
    * order and adds one unit per missing bucket — a fixed fold order
    * both engines replay, so the double sum is bit-identical. Raw
    * estimate alpha·m²/S, with the standard linear-counting correction
    * below 2.5m when zero registers remain. Result in milli-units
    * (floor(1000·E)) — the established libm-boundary quantization.
    */
  def hllEstimateMilli(regs: Column): Column = {
    val m = HllM
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    // 2^-j for j = 0..53, exact doubles — no pow() libm call
    val pow2neg = typedLit(Array.tabulate(54)(j => math.pow(2.0, -j)).toSeq)
    val nSeen = size(regs)
    val s = aggregate(regs, lit(0.0),
      (acc, x) => acc + element_at(pow2neg, x.getField("r").cast("int") + 1)) +
      (lit(m) - nSeen).cast("double")
    val vZero = (lit(m) - nSeen).cast("double")
    val raw = (lit(alpha * m * m)) / s
    val est = when(raw <= lit(2.5 * m) && vZero > 0.0,
      lit(m.toDouble) * log(lit(m.toDouble) / vZero)).otherwise(raw)
    floor(lit(1000.0) * est).cast("long")
  }

  /** KMV (bottom-k) cardinality estimate from a SORTED-ascending array
    * of the k smallest distinct 32-bit hashes: (k-1)·2^32 div h_k,
    * exact integer in both engines via the exactly-divisible-double
    * trick (numerator made divisible before the IEEE division — both
    * operands < 2^53). Fewer than k distinct values means the sketch
    * IS the set: return its exact size.
    */
  def kmvEstimate(sk: Column, k: Int): Column = {
    val hk = greatest(element_at(sk, least(size(sk), lit(k))), lit(1L))
    val L = lit((k - 1).toLong << 32)
    when(size(sk) < k, size(sk).cast("long"))
      .otherwise(((L - L % hk) / hk).cast("long"))
  }
}
