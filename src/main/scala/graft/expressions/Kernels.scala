package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd compute kernels for the hot array paths.
  *
  * Catalyst higher-order functions (transform/aggregate/zip_with) are
  * interpreted — ~100ns+ per expression node per element. For kernels
  * that run per (row × seed × element), e.g. minhash signatures and
  * embedding dot products, that interpreter tax dominates the whole
  * query. These expressions produce the exact same values as their HOF
  * equivalents (same operation order, so bit-identical doubles) but
  * compile to tight scalar loops inside whole-stage codegen.
  */

/** MinHash signature over pre-hashed shingles: out[j] = min over h of
  * (h·a_j + b_j) mod p. Equivalent HOF form:
  * `array((0 until n).map(j => aggregate(hs, MaxValue, (acc,h) =>
  * least(acc, (h*a_j + b_j) % p))))`.
  *
  * Null array elements are not expected (the producer is a hash) and are
  * treated as 0.
  */
case class MinHashSignature(child: Expression, a: Array[Long], b: Array[Long],
                            prime: Long)
    extends UnaryExpression {
  require(a.length == b.length)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature needs array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = Array.fill(a.length)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      var j = 0
      while (j < out.length) {
        val v = (h * a(j) + b(j)) % prime
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", a, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b, "long[]")
    val out = ctx.freshName("mhOut")
    val n = ctx.freshName("mhN")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val h = ctx.freshName("h")
    val v = ctx.freshName("v")
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |long[] $out = new long[${a.length}];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.isNullAt($i) ? 0L : $arr.getLong($i);
         |  for (int $j = 0; $j < ${a.length}; $j++) {
         |    long $v = ($h * $aRef[$j] + $bRef[$j]) % ${prime}L;
         |    if ($v < $out[$j]) $out[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** SECOND-smallest affine hash per seed (multiset semantics — a
  * duplicated minimum counts twice), the runner-up to
  * [[MinHashSignature]]'s minimum: out[j] = the second element of the
  * sorted multiset {(h·a_j + b_j) mod p}, or the minimum itself for a
  * single-element input. The signature slot whose runner-up sits
  * CLOSEST to its minimum is the slot most likely to differ for a true
  * near-duplicate (one shingle edit away from stealing the min), which
  * is what multi-probe LSH perturbs — the probe key swaps that slot's
  * min for this value. Same loop shape as the base kernel, one extra
  * register per seed.
  */
case class MinHash2Signature(child: Expression, a: Array[Long],
                             b: Array[Long], prime: Long)
    extends UnaryExpression {
  require(a.length == b.length)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash2_signature needs array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash2_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m1 = Array.fill(a.length)(Long.MaxValue)
    val m2 = Array.fill(a.length)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      var j = 0
      while (j < m1.length) {
        val v = (h * a(j) + b(j)) % prime
        if (v < m1(j)) { m2(j) = m1(j); m1(j) = v }
        else if (v < m2(j)) m2(j) = v
        j += 1
      }
      i += 1
    }
    var j = 0
    while (j < m2.length) {
      if (m2(j) == Long.MaxValue) m2(j) = m1(j) // single-element input
      j += 1
    }
    new GenericArrayData(m2)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mh2A", a, "long[]")
    val bRef = ctx.addReferenceObj("mh2B", b, "long[]")
    val m1 = ctx.freshName("mhM1")
    val m2 = ctx.freshName("mhM2")
    val n = ctx.freshName("mhN")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val h = ctx.freshName("h")
    val v = ctx.freshName("v")
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |long[] $m1 = new long[${a.length}];
         |long[] $m2 = new long[${a.length}];
         |java.util.Arrays.fill($m1, Long.MAX_VALUE);
         |java.util.Arrays.fill($m2, Long.MAX_VALUE);
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.isNullAt($i) ? 0L : $arr.getLong($i);
         |  for (int $j = 0; $j < ${a.length}; $j++) {
         |    long $v = ($h * $aRef[$j] + $bRef[$j]) % ${prime}L;
         |    if ($v < $m1[$j]) { $m2[$j] = $m1[$j]; $m1[$j] = $v; }
         |    else if ($v < $m2[$j]) { $m2[$j] = $v; }
         |  }
         |}
         |for (int $j = 0; $j < ${a.length}; $j++) {
         |  if ($m2[$j] == Long.MAX_VALUE) $m2[$j] = $m1[$j];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($m2);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHash2Signature =
    copy(child = newChild)
}

/** 32-bit SimHash over pre-hashed tokens: bit b is set iff the count of
  * tokens with bit b set strictly exceeds half the token count (the
  * +1/-1 vote rule; ties clear the bit). Same values as the HOF fold in
  * TextAnalysis.simhash32, as one tight loop. Null elements count as 0.
  */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash32 needs array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val ones = new Array[Int](32)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      var b = 0
      while (b < 32) {
        ones(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (ones(b) * 2 > n) out |= 1L << b
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ones = ctx.freshName("ones")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val b = ctx.freshName("b")
    val h = ctx.freshName("h")
    val out = ctx.freshName("out")
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |int[] $ones = new int[32];
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.isNullAt($i) ? 0L : $arr.getLong($i);
         |  for (int $b = 0; $b < 32; $b++) {
         |    $ones[$b] += (int) (($h >>> $b) & 1L);
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 32; $b++) {
         |  if ($ones[$b] * 2 > $n) $out |= 1L << $b;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** SimHash over the low `bits` bit positions of the token hashes —
  * the wide-geometry generalization of [[SimHash32]] (same strict
  * majority rule per position). 60 bits over 60-bit token hashes
  * (graft.ops.Sketches.hash60) is the production dedup geometry:
  * four 15-bit blocking slices give 32768 buckets per slice, so
  * bucket density — the super-linear Σ bucket² term of the blocked
  * self-join, measured at 15.5x for 10x data on the 32-bit/8-bit
  * sketch — collapses toward linear at the same recall guarantee.
  */
case class SimHashBits(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 63, s"simhash bits must be in (0, 63], got $bits")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_bits needs array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = s"simhash$bits"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val ones = new Array[Int](bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      var b = 0
      while (b < bits) {
        ones(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (ones(b) * 2 > n) out |= 1L << b
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ones = ctx.freshName("ones")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val b = ctx.freshName("b")
    val h = ctx.freshName("h")
    val out = ctx.freshName("out")
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |int[] $ones = new int[$bits];
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.isNullAt($i) ? 0L : $arr.getLong($i);
         |  for (int $b = 0; $b < $bits; $b++) {
         |    $ones[$b] += (int) (($h >>> $b) & 1L);
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($ones[$b] * 2 > $n) $out |= 1L << $b;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

/** Elementwise add/subtract of two double arrays — the residual
  * (v - centroid) and reconstruction (centroid + residual) steps of
  * IVF-PQ as one tight loop instead of an interpreted zip_with
  * (~100ns+/element). Per-element IEEE add/sub carries no fold order,
  * so values are bit-identical to the HOF form and to DuckDB's
  * `list_transform(list_zip(a,b), ...)`. Operates over the shorter
  * length; a null element nulls that output element (zip_with
  * semantics on equal-length arrays).
  */
case class VecElemwiseDbl(left: Expression, right: Expression,
                          subtract: Boolean) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_elemwise needs two array<double>, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = if (subtract) "vec_sub" else "vec_add"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        out(i) = if (subtract) x.getDouble(i) - y.getDouble(i)
          else x.getDouble(i) + y.getDouble(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("veN")
    val out = ctx.freshName("veOut")
    val i = ctx.freshName("i")
    val op = if (subtract) "-" else "+"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $out[$i] = $x.getDouble($i) $op $y.getDouble($i);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecElemwiseDbl =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization encode over all subspaces as one tight loop:
  * code mi is the centroid index minimizing the inner-product expansion
  * `cn2 + (-2.0 * ⟨v_mi, c⟩)` (|v_mi|² is constant within a subspace and
  * cannot change the argmin), with strict-less comparison so ties keep
  * the smaller centroid index — the exact arithmetic and tie-break of
  * the expression form [[graft.ops.VectorSearch.pqEncode]] and its
  * DuckDB oracle mirror. The expression form inlines m×k×(dsub+3)
  * nodes, which blows Janino's 64 KB method limit at m=8,k=16 —
  * whole-stage codegen is then DISABLED for the stage and the tree
  * runs interpreted (~1300 nodes/row); this kernel keeps the stage
  * inside codegen with one argmin loop. cn2 (per-centroid squared
  * norms) is precomputed at plan time.
  */
case class PqEncodeDbl(child: Expression,
                       codebook: Array[Array[Array[Double]]])
    extends UnaryExpression {
  private val m = codebook.length
  private val dsub = codebook(0)(0).length
  private val k = codebook(0).length
  // per-subspace, per-centroid squared norms, ascending-fold (the
  // plan-time constant the expression form also embeds)
  private val cn2: Array[Array[Double]] =
    codebook.map(_.map(_.foldLeft(0.0)((s, x) => s + x * x)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<double>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // a short vector would read past the array on UnsafeArrayData —
    // garbage codes or a JVM fault instead of an error; fail clearly
    if (v.numElements() < m * dsub) {
      throw new IllegalArgumentException(
        s"pq_encode: input vector has ${v.numElements()} elements, " +
          s"codebook needs at least ${m * dsub}")
    }
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = Double.PositiveInfinity; var bestC = 0; var ci = 0
      while (ci < k) {
        val cvec = codebook(mi)(ci)
        var dot = 0.0; var di = 0
        while (di < dsub) {
          dot += v.getDouble(mi * dsub + di) * cvec(di); di += 1
        }
        val score = cn2(mi)(ci) + (-2.0 * dot)
        if (score < best) { best = score; bestC = ci }
        ci += 1
      }
      out(mi) = bestC
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", codebook, "double[][][]")
    val cn2Ref = ctx.addReferenceObj("pqCn2", cn2, "double[][]")
    val out = ctx.freshName("pqOut")
    val mi = ctx.freshName("mi")
    val ci = ctx.freshName("ci")
    val di = ctx.freshName("di")
    val dot = ctx.freshName("dot")
    val score = ctx.freshName("score")
    val best = ctx.freshName("best")
    val bestC = ctx.freshName("bestC")
    val cvec = ctx.freshName("cvec")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |if ($v.numElements() < ${m * dsub}) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: input vector has " + $v.numElements() +
         |    " elements, codebook needs at least ${m * dsub}");
         |}
         |int[] $out = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestC = 0;
         |  for (int $ci = 0; $ci < $k; $ci++) {
         |    double[] $cvec = $cbRef[$mi][$ci];
         |    double $dot = 0.0;
         |    for (int $di = 0; $di < $dsub; $di++) {
         |      $dot += $v.getDouble($mi * $dsub + $di) * $cvec[$di];
         |    }
         |    double $score = $cn2Ref[$mi][$ci] + (-2.0 * $dot);
         |    if ($score < $best) { $best = $score; $bestC = $ci; }
         |  }
         |  $out[$mi] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeDbl =
    copy(child = newChild)
}

/** Fused SQ8 scalar-quantization round trip: per dimension d, encode
  * v[d] against the corpus [mn[d], mx[d]] range as an 8-bit code
  * `min(max(floor(((v-mn)*255.0)/(mx-mn)), 0.0), 255.0)` (clamped at
  * BOTH ends — a stored int8 code is 0..255, so inputs outside a
  * sample-trained range saturate instead of fabricating impossible
  * codes) and immediately emit the
  * midpoint reconstruction `mn + ((code+0.5)*((mx-mn)/255.0))`
  * (degenerate dimensions mx==mn reconstruct as mn). This is the
  * ranking arithmetic of an int8-quantized ANN scan — at scale the
  * codes (1 B/dim) are what's stored and scanned, 4× smaller than
  * float32; the fused form here reproduces exactly what ranking against
  * those stored codes computes. Per-element IEEE ops carry no fold
  * order, so values are bit-identical to the HOF/DuckDB
  * `list_transform(list_zip(v,mn,mx), ...)` spelling of the same
  * parenthesization. Operates over the shortest length; a null element
  * nulls that output element.
  */
case class Sq8ApproxDbl(first: Expression, second: Expression,
                        third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _),
            ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"sq8_approx needs three array<double>, got ${a.sql}, ${b.sql}, ${c.sql}")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "sq8_approx"

  override def nullSafeEval(v: Any, mn: Any, mx: Any): Any = {
    val xv = v.asInstanceOf[ArrayData]
    val xn = mn.asInstanceOf[ArrayData]
    val xx = mx.asInstanceOf[ArrayData]
    val n = math.min(xv.numElements(),
      math.min(xn.numElements(), xx.numElements()))
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!xv.isNullAt(i) && !xn.isNullAt(i) && !xx.isNullAt(i)) {
        val lo = xn.getDouble(i); val hi = xx.getDouble(i)
        out(i) = if (hi == lo) lo else {
          // clamp BOTH ends: an input below the trained range must code
          // to 0 (a stored int8 is 0..255), not a negative pseudo-code
          val code = math.min(math.max(
            math.floor(((xv.getDouble(i) - lo) * 255.0) / (hi - lo)), 0.0),
            255.0)
          lo + ((code + 0.5) * ((hi - lo) / 255.0))
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("sqN")
    val out = ctx.freshName("sqOut")
    val i = ctx.freshName("i")
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val code = ctx.freshName("code")
    nullSafeCodeGen(ctx, ev, (v, mn, mx) => {
      s"""
         |int $n = java.lang.Math.min($v.numElements(),
         |  java.lang.Math.min($mn.numElements(), $mx.numElements()));
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$v.isNullAt($i) && !$mn.isNullAt($i) && !$mx.isNullAt($i)) {
         |    double $lo = $mn.getDouble($i);
         |    double $hi = $mx.getDouble($i);
         |    if ($hi == $lo) {
         |      $out[$i] = $lo;
         |    } else {
         |      double $code = java.lang.Math.min(java.lang.Math.max(
         |        java.lang.Math.floor((($v.getDouble($i) - $lo) * 255.0) / ($hi - $lo)),
         |        0.0), 255.0);
         |      $out[$i] = $lo + (($code + 0.5) * (($hi - $lo) / 255.0));
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Sq8ApproxDbl =
    copy(first = f, second = s, third = t)
}

/** Sequential-fold dot product of two double arrays — identical IEEE
  * operation order to `aggregate(zip_with(a, b, _*_), 0.0, _+_)` (one
  * ascending multiply-add chain), so results are bit-identical to the
  * HOF form and to DuckDB's list_reduce fold. Sums over the shorter
  * length if they differ; null elements contribute 0.
  */
case class DotProductDbl(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product needs two array<double>, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("dpN")
    val acc = ctx.freshName("dpAcc")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $acc += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductDbl =
    copy(left = newLeft, right = newRight)
}

/** BPE merge table for the one-pass apply kernel: ranks in training
  * order, halves resolved by a two-level hash (left → right → rank) so
  * the per-pair probe allocates nothing. Built once on the driver,
  * serialized to every task; the UTF8String views materialize lazily
  * per executor.
  *
  * Precondition (holds for every [[graft.ops.BpeTrainer.train]]
  * output, and for any replayable BPE merge list): each pair's halves
  * exist before its rank — a token created at rank r only ever
  * participates in pairs of rank > r. Under it, ascending-rank sweeps
  * are EXACTLY the k-sequential-replace semantics: a sweep at rank r
  * can only create pairs of higher rank (every new adjacency involves
  * the token it just minted), so no lower rank ever becomes applicable
  * again — the same argument that makes min-heap BPE apply correct.
  */
final class BpeMergeTable(left: Array[String], right: Array[String],
                          merged: Array[String]) extends Serializable {
  require(left.length == right.length && left.length == merged.length)

  @transient private lazy val mergedU: Array[UTF8String] =
    merged.map(UTF8String.fromString)

  @transient private lazy val rank
  : java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, Integer]] = {
    val m = new java.util.HashMap[UTF8String,
      java.util.HashMap[UTF8String, Integer]]()
    var r = 0
    while (r < left.length) {
      val inner = m.computeIfAbsent(UTF8String.fromString(left(r)),
        _ => new java.util.HashMap[UTF8String, Integer]())
      // trained lists cannot repeat a pair (a sweep consumes every
      // occurrence and merges never recreate old-token adjacency);
      // keep the lowest rank if a handcrafted list does
      inner.putIfAbsent(UTF8String.fromString(right(r)), Integer.valueOf(r))
      r += 1
    }
    m
  }

  def size: Int = merged.length

  private def rankOf(a: UTF8String, b: UTF8String): Int = {
    val inner = rank.get(a)
    if (inner == null) Int.MaxValue
    else {
      val r = inner.get(b)
      if (r == null) Int.MaxValue else r.intValue()
    }
  }

  /** One in-memory pass over a token array: repeatedly find the lowest
    * present rank (scan), merge all its occurrences left-to-right
    * non-overlapping (sweep, in place), until no table pair remains.
    * Matches the padded-string replace chain token for token: null
    * elements vanish up front (array_join semantics), empty-string
    * tokens act as merge barriers and drop at the end (unpad
    * semantics).
    */
  def apply(arr: ArrayData): ArrayData = {
    val n0 = arr.numElements()
    val toks = new Array[UTF8String](n0)
    var len = 0
    var i = 0
    while (i < n0) {
      if (!arr.isNullAt(i)) { toks(len) = arr.getUTF8String(i); len += 1 }
      i += 1
    }
    var minR = 0
    while (minR != Int.MaxValue) {
      minR = Int.MaxValue
      i = 0
      while (i < len - 1) {
        val r = rankOf(toks(i), toks(i + 1))
        if (r < minR) minR = r
        i += 1
      }
      if (minR != Int.MaxValue) {
        val m = mergedU(minR)
        var w = 0
        i = 0
        while (i < len) {
          if (i < len - 1 && rankOf(toks(i), toks(i + 1)) == minR) {
            toks(w) = m
            i += 2
          } else {
            toks(w) = toks(i)
            i += 1
          }
          w += 1
        }
        len = w
      }
    }
    var kept = 0
    i = 0
    while (i < len) { if (toks(i).numBytes() > 0) kept += 1; i += 1 }
    val out = new Array[AnyRef](kept)
    var w = 0
    i = 0
    while (i < len) {
      if (toks(i).numBytes() > 0) { out(w) = toks(i); w += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** BPE apply as ONE kernel pass: the k-literal-replace chain is the
  * right plan at demo vocabularies, but at a real 32k-merge table it
  * is 32k codegen'd passes over every document (and a 32k-deep
  * expression tree the analyzer chokes on long before that). This
  * expression walks each token array once per applicable rank with the
  * whole merge table resolved by hash — O(doc · ranks-fired) instead
  * of O(doc · k). Values are pinned equal to the replace chain by
  * BpeTrainerSpec.
  */
case class BpeApplyMerges(child: Expression, table: BpeMergeTable)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply needs array<string>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  override def nullSafeEval(input: Any): Any =
    table.apply(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeMergeTable].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"${ev.value} = $ref.apply($arr);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyMerges =
    copy(child = newChild)
}

/** Per-row character-histogram terms for the quantized char entropy
  * (q160/q164): struct(n, k, sterm) = (total code points, distinct
  * code points, Σ floor(1000·c·ln c) over the per-character counts c).
  * The statistic is row-local, so computing it inside the scan removes
  * the explode + two aggregations the HOF construction needs — the
  * whole query becomes map-only. Counts key on Unicode code points,
  * matching DuckDB's len()/substr() character semantics; the per-term
  * floor keeps the sum an exact integer in any iteration order.
  */
case class CharEntropyTerms(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_entropy_terms needs string, got ${t.sql}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("k", LongType, nullable = false),
    StructField("sterm", LongType, nullable = false)))
  override def prettyName: String = "char_entropy_terms"

  override def nullSafeEval(input: Any): Any =
    CharEntropyTerms.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.CharEntropyTerms.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyTerms =
    copy(child = newChild)
}

object CharEntropyTerms {
  /** Shared by eval and codegen — one implementation, no drift. */
  def compute(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      counts.merge(cp, 1L, (a, b) => a + b)
    }
    var k = 0L
    var sterm = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      k += 1
      sterm += math.floor(1000.0 * c * math.log(c)).toLong
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, k, sterm))
  }
}

/** Top-`probes` nearest centroids of a vector by cosine, as the cell
  * index array, ordered by (sim DESC, cell DESC) — bit- and tie-
  * compatible with the HOF form
  * `slice(reverse(array_sort(array(struct(cosine(v, c_i), i)...))),
  * 1, probes).cell` that [[graft.ops.VectorSearch.ivfAssign]] used to
  * build inline: sim = dot/(‖v‖·‖c‖) with ascending-fold dots (the
  * [[DotProductDbl]] order), ties resolved to the HIGHER cell index
  * (struct sort is (sim asc, cell asc); reversed ⇒ both descend).
  *
  * Why a kernel: the struct-array form materializes k structs + a
  * k·log k sort per ROW and recomputes ‖v‖ under every centroid —
  * measured 22 s for a 312-centroid assignment over 20k rows where
  * this loop needs well under a second. The centroid matrix and its
  * norms are plan-time constants riding along as reference objects.
  *
  * Bit-compat CARVE-OUTS (r12 advice — the equivalence is conditional
  * and callers own the preconditions, both asserted by every graft
  * call site's ingest filters):
  *  - '''zero-norm''' vector or centroid ⇒ sim = NaN. All insertion
  *    comparisons `simT(p-1) <= NaN` are false, so NaN cells sink to
  *    the END here, whereas Spark's struct sort orders NaN GREATEST
  *    (reversed: first). Exclude zero vectors (and never train a
  *    zero centroid — k-means++ on non-zero data cannot) or the two
  *    forms disagree.
  *  - '''length mismatch''': this kernel folds dots AND ‖v‖ over
  *    min(v.length, dims), while the HOF form's `norm(v)` spans the
  *    full vector — a v longer than the centroid dims produces a
  *    smaller self-norm here (larger sims). Require
  *    v.numElements == dims for the equivalence to hold.
  */
case class TopCellsDbl(child: Expression, centroids: Array[Array[Double]],
                       probes: Int)
    extends UnaryExpression {
  private val k = centroids.length
  private val dims = centroids(0).length
  private val outN = math.min(probes, k)
  // ascending-fold centroid norms — identical to norm(typedLit(c))
  private val cn: Array[Double] =
    centroids.map(c => math.sqrt(c.foldLeft(0.0)((s, x) => s + x * x)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"top_cells needs array<double>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_cells"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dims)
    var self = 0.0
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) { val x = v.getDouble(i); self += x * x }
      i += 1
    }
    val nrmV = math.sqrt(self)
    val simT = new Array[Double](outN)
    val cellT = new Array[Int](outN)
    var filled = 0
    var ci = 0
    while (ci < k) {
      val c = centroids(ci)
      var dot = 0.0
      i = 0
      while (i < n) {
        if (!v.isNullAt(i)) dot += v.getDouble(i) * c(i)
        i += 1
      }
      val sim = dot / (nrmV * cn(ci))
      // insert before the first entry with sim <= this one: equal sims
      // yield to the LATER (higher) cell — the reversed-struct-sort rule
      var p = filled
      while (p > 0 && simT(p - 1) <= sim) p -= 1
      if (p < outN) {
        var q = math.min(filled, outN - 1)
        while (q > p) { simT(q) = simT(q - 1); cellT(q) = cellT(q - 1); q -= 1 }
        simT(p) = sim; cellT(p) = ci
        if (filled < outN) filled += 1
      }
      ci += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(cellT, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("tcCents", centroids, "double[][]")
    val cnRef = ctx.addReferenceObj("tcNorms", cn, "double[]")
    val n = ctx.freshName("n")
    val self = ctx.freshName("self")
    val nrmV = ctx.freshName("nrmV")
    val simT = ctx.freshName("simT")
    val cellT = ctx.freshName("cellT")
    val filled = ctx.freshName("filled")
    val ci = ctx.freshName("ci")
    val i = ctx.freshName("i")
    val x = ctx.freshName("x")
    val c = ctx.freshName("c")
    val dot = ctx.freshName("dot")
    val sim = ctx.freshName("sim")
    val p = ctx.freshName("p")
    val q = ctx.freshName("q")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dims);
         |double $self = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$v.isNullAt($i)) {
         |    double $x = $v.getDouble($i); $self += $x * $x;
         |  }
         |}
         |double $nrmV = java.lang.Math.sqrt($self);
         |double[] $simT = new double[$outN];
         |int[] $cellT = new int[$outN];
         |int $filled = 0;
         |for (int $ci = 0; $ci < $k; $ci++) {
         |  double[] $c = $cbRef[$ci];
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$v.isNullAt($i)) $dot += $v.getDouble($i) * $c[$i];
         |  }
         |  double $sim = $dot / ($nrmV * $cnRef[$ci]);
         |  int $p = $filled;
         |  while ($p > 0 && $simT[$p - 1] <= $sim) $p--;
         |  if ($p < $outN) {
         |    for (int $q = java.lang.Math.min($filled, $outN - 1);
         |         $q > $p; $q--) {
         |      $simT[$q] = $simT[$q - 1]; $cellT[$q] = $cellT[$q - 1];
         |    }
         |    $simT[$p] = $sim; $cellT[$p] = $ci;
         |    if ($filled < $outN) $filled++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($cellT, $filled));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** The unigram-LM Viterbi segmentation of ONE word as a per-row kernel
  * (q212/q213): minimum-cost path over the piece lattice, identical to
  * the staged-join DP in [[graft.ops.UnigramTrainer.segment]] —
  * dp(j) = min over edges (i, j, piece) of the TOTAL-ordered struct
  * (dp(i).cost + cost(piece), i, piece), strings compared as binary
  * UTF-8 exactly like Spark's struct min — followed by the backpointer
  * walk, emitting the path's pieces. The piece table is vocab-sized
  * (singles + [[graft.ops.UnigramTrainer.SeedMulti]] multis), so it
  * rides the plan as a reference object like the BPE merge table, and
  * the whole segmentation is one map pass instead of 2·MaxWordLen
  * vocab-sized joins. UnigramTrainerSpec pins kernel == staged joins.
  */
final class PieceCostTable(pieces: Array[String], costs: Array[Long])
    extends Serializable {
  @transient private lazy val map = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](
      pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      m.put(UTF8String.fromString(pieces(i)), costs(i)); i += 1
    }
    m
  }

  /** Max piece length in CHARACTERS (lattice edge bound). */
  @transient private lazy val maxPieceLen =
    if (pieces.isEmpty) 0 else pieces.map(_.length).max

  def segment(word: UTF8String): ArrayData = {
    val n = word.numChars()
    // the staged-join shape runs exactly MaxWordLen DP stages and its
    // path recovery requires pos == length, so it emits NO rows for a
    // longer word — the kernel must refuse rather than silently
    // diverge from that contract (today every caller pre-filters via
    // wordCounts; this guards the next caller that doesn't)
    require(n <= graft.ops.UnigramTrainer.MaxWordLen,
      s"ViterbiSegment: word of $n chars exceeds MaxWordLen=" +
        s"${graft.ops.UnigramTrainer.MaxWordLen} — the staged-join " +
        "segmentation this kernel mirrors is undefined past the cap; " +
        "pre-filter words to the cap before segmenting")
    // dp arrays over positions 0..n: cost, backpointer, piece
    val INF = Long.MaxValue
    val dpCost = new Array[Long](n + 1)
    val dpBi = new Array[Int](n + 1)
    val dpBp = new Array[UTF8String](n + 1)
    java.util.Arrays.fill(dpCost, INF)
    dpCost(0) = 0L; dpBi(0) = -1; dpBp(0) = UTF8String.EMPTY_UTF8
    var j = 1
    while (j <= n) {
      // candidates: edges (i, j, piece = word[i..j)), i = j-l, l ≤ P
      var best = INF; var bestBi = -1
      var bestBp: UTF8String = null
      var l = 1
      val lMax = math.min(maxPieceLen, j)
      while (l <= lMax) {
        val i = j - l
        if (dpCost(i) != INF) {
          val piece = word.substringSQL(i + 1, l)
          val c = map.get(piece)
          if (c != null) {
            val cand = dpCost(i) + c.longValue()
            // strict lexicographic (cost, bi, bp) min — bp compared as
            // binary UTF-8, Spark's struct-min string order
            val better =
              cand < best || (cand == best && (i < bestBi ||
                (i == bestBi && (bestBp == null ||
                  piece.compareTo(bestBp) < 0))))
            if (better) { best = cand; bestBi = i; bestBp = piece }
          }
        }
        l += 1
      }
      dpCost(j) = best; dpBi(j) = bestBi
      dpBp(j) = if (bestBp == null) UTF8String.EMPTY_UTF8 else bestBp
      j += 1
    }
    if (n == 0 || dpCost(n) == INF) return new GenericArrayData(new Array[AnyRef](0))
    // backpointer walk from pos = n down to 0 (always terminates:
    // every backpointer strictly decreases the position)
    val out = new java.util.ArrayList[AnyRef](n)
    var pos = n
    while (pos > 0) {
      out.add(dpBp(pos))
      pos = dpBi(pos)
    }
    new GenericArrayData(out.toArray)
  }
}

case class ViterbiSegment(child: Expression, table: PieceCostTable)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"viterbi_segment needs string, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "viterbi_segment"

  override def nullSafeEval(input: Any): Any =
    table.segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pieceTable", table,
      classOf[PieceCostTable].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $ref.segment($w);")
  }

  override protected def withNewChildInternal(newChild: Expression): ViterbiSegment =
    copy(child = newChild)
}
