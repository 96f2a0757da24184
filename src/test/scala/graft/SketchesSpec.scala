package graft

import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** Property pins for the sketch layer (ops/Sketches.scala): the
  * guarantees the q109/q110/q111 oracles rely on, checked directly —
  * bloom never false-negative, CMS never underestimates, HLL within
  * its theoretical error, and every sketch build is invariant under
  * repartitioning (the merge really is commutative/associative).
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val M = 4096 // small filter so collisions actually happen
  private val K = 5

  private def hashes(n: Int, salt: String) =
    (0 until n).map(i =>
      graft.functions.TextAnalysis.md5Hex8(s"$salt:$i")).toDF("g")

  test("bloom: no false negatives, measurable false-positive rate") {
    val members = hashes(400, "in")
    val words = Sketches.bloomBuild(members, col("g"), M, K)
    val missedMembers = members
      .filter(!Sketches.bloomProbe(col("g"), words, M, K)).count()
    assert(missedMembers === 0L, "a bloom filter can never miss a member")

    val nonMembers = hashes(5000, "out")
    val fp = nonMembers
      .filter(Sketches.bloomProbe(col("g"), words, M, K)).count()
    // n=400, m=4096, k=5 → fill ≈ 1-e^(-kn/m) ≈ 0.39, fp ≈ 0.39^5 ≈ 0.9%
    assert(fp > 0L, "this deliberately small filter should show some FPs")
    assert(fp < 500L, s"FP rate implausibly high: $fp/5000")
  }

  test("bloom: build is partitioning-invariant") {
    val members = hashes(300, "part")
    val w1 = Sketches.bloomBuild(members.repartition(1), col("g"), M, K)
    val w7 = Sketches.bloomBuild(members.repartition(7), col("g"), M, K)
    assert(w1.toSeq === w7.toSeq)
  }

  test("cms: estimate >= true count for every key, total is exact") {
    // zipf-ish stream: key i appears 600/(i+1) times
    val stream = (0 until 40).flatMap(i => Seq.fill(600 / (i + 1))(i))
      .map(i => graft.functions.TextAnalysis.md5Hex8(s"k:$i") -> i)
      .toDF("g", "k")
    val d = 4; val w = 32 // tiny width forces collisions
    val counters = Sketches.cmsBuild(stream, col("g"), d, w)
    assert(Sketches.cmsTotal(counters, w) === stream.count())
    val under = stream.groupBy("g").agg(count(lit(1)).as("cnt"))
      .filter(Sketches.cmsEstimate(col("g"), counters, d, w) < col("cnt"))
      .count()
    assert(under === 0L, "CMS must never underestimate")
    // with w=32 and 40 keys there MUST be at least one overestimate
    val over = stream.groupBy("g").agg(count(lit(1)).as("cnt"))
      .filter(Sketches.cmsEstimate(col("g"), counters, d, w) > col("cnt"))
      .count()
    assert(over > 0L, "collisions expected at w=32 with 40 keys")
  }

  test("cms: build is partitioning-invariant") {
    val stream = hashes(500, "cms")
    val c1 = Sketches.cmsBuild(stream.repartition(1), col("g"), 4, 64)
    val c7 = Sketches.cmsBuild(stream.repartition(7), col("g"), 4, 64)
    assert(c1.toSeq === c7.toSeq)
  }

  test("hll: estimate within 15% of a 5000-distinct truth") {
    val keys = (0 until 5000).map(i => s"key-$i").toDF("g")
    val regs = keys
      .select(Sketches.hash60(col("g")).as("h"))
      .select(Sketches.hllBucket(col("h")).as("bucket"),
        Sketches.hllRho(col("h")).as("rho"))
      .groupBy("bucket").agg(max("rho").as("r"))
      .agg(sort_array(collect_list(struct(col("bucket"), col("r"))))
        .as("regs"))
    val estMilli = regs.select(Sketches.hllEstimateMilli(col("regs")))
      .as[Long].head()
    val est = estMilli / 1000.0
    // m=256 → relative error ~1.04/sqrt(256) = 6.5%; 15% is > 2 sigma
    assert(math.abs(est - 5000.0) / 5000.0 < 0.15,
      s"estimate $est too far from 5000")
  }

  test("hll: small cardinalities land in the linear-counting branch") {
    val keys = (0 until 30).map(i => s"small-$i").toDF("g")
    val regs = keys
      .select(Sketches.hash60(col("g")).as("h"))
      .select(Sketches.hllBucket(col("h")).as("bucket"),
        Sketches.hllRho(col("h")).as("rho"))
      .groupBy("bucket").agg(max("rho").as("r"))
      .agg(sort_array(collect_list(struct(col("bucket"), col("r"))))
        .as("regs"))
    val est = regs.select(Sketches.hllEstimateMilli(col("regs")))
      .as[Long].head() / 1000.0
    // linear counting is near-exact this small
    assert(math.abs(est - 30.0) < 3.0, s"linear-counting estimate $est")
  }
}
