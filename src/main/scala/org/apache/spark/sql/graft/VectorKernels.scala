package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native (whole-stage-codegen) vector kernels for the similarity-search
  * family (`graft/queries/VectorQueries.scala`). Lives under
  * `org.apache.spark.sql` because `ExpressionUtils` (Expression → Column)
  * and `AbstractDataType` are `private[sql]` — the standard extension-point
  * packaging for custom Catalyst expressions.
  *
  * Why native expressions and not `aggregate(zip_with(...))`: higher-order
  * functions are CodegenFallback — each call allocates the zipped array and
  * runs its lambda interpreted per element. That is fine once per vector,
  * but the near-dup queries evaluate the dot product inside the LSH-bucket
  * join's post-condition, i.e. once per CANDIDATE PAIR: at sf0.1 that was
  * ~3 interpreted 64-element lambdas × millions of pairs — the entire cost
  * of the r3 `emb_neardup_hp` bench regression. These expressions compile
  * into the join's generated predicate (tight primitive loop, zero
  * allocation), keeping pair scoring inside whole-stage codegen.
  *
  * Determinism: pure integer arithmetic over the quantized
  * (`floor(x*1000)` BIGINT) vectors — bit-identical to the DuckDB oracle's
  * integer sums.
  */
object VectorKernels {

  /** exact integer dot product of two array<bigint> columns */
  def dotL(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProductL(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** signed hyperplane projection: sum_i q[i] * HpSigns.sign(plane, i+1) —
    * the md5-derived deterministic sign family (see [[HpSigns]] for why the
    * previous LCG family was unusable). */
  def hpSignedSum(q: Column, plane: Int): Column =
    ExpressionUtils.column(HpSignedSum(ExpressionUtils.expression(q), plane))

  /** element-wise `cast(floor(x * 1000) as bigint)` over array<double> —
    * the determinism protocol's quantization as ONE codegen'd primitive
    * loop. The former `transform(..., x -> ...)` higher-order function is
    * CodegenFallback: it broke every vector query's scan-side codegen span
    * and ran an interpreted lambda per element — per ROW at 10⁹ scale. */
  def quantizeMilli(a: Column): Column =
    ExpressionUtils.column(QuantizeMilli(ExpressionUtils.expression(a)))

  /** two-level (IMI-style) IVF assignment over a driver-built codebook —
    * see [[IvfCodebook]] */
  def ivfTwoLevelAssign(q: Column, n2: Column, cb: IvfCodebook): Column =
    ExpressionUtils.column(IvfTwoLevelAssign(
      ExpressionUtils.expression(q), ExpressionUtils.expression(n2), cb))

  /** static entry point for [[QuantizeMilli]]'s generated code */
  def quantizeMilliData(x: ArrayData): ArrayData = {
    val n = x.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      // exactly Spark's Floor(double)->long over x*1000 (the transform body)
      out(i) = math.floor(x.getDouble(i) * 1000.0).toLong
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Hierarchical (two-level, IMI-shaped) coarse-quantizer codebook for IVF
  * assignment, built ON THE DRIVER from the collected centroid table —
  * which is broadcast-sized BY CONSTRUCTION (K ≤ 65536 × 64 dims ≈ 33 MB;
  * the flat path's `broadcast(cents)` collects the same bytes to the same
  * driver). VERDICT r5 item 4: the flat argmax is n·K centroid dots — at
  * n=10⁹, K=65536 that is ~6.5×10¹³ dot products per (re)assignment. Here
  * each vector scores G ≈ √K super-centroids, then exact cosine only
  * against the members of its best `fanout` groups: n·(G + fanout·K/G)
  * dots ≈ n·(256 + fanout·256) at K=65536 — ~100× less CPU — and, unlike
  * the flat groupBy argmax, the whole assignment is ONE map-side
  * projection with NO exchange at all (the flat path shuffles n partial
  * argmax rows).
  *
  * Determinism: groups are seeded by the G lowest-cid centroids; every
  * argmax tie-breaks to the lowest cid/gid; member scoring uses the EXACT
  * flat-path expression dot/(sqrt(n2)·sqrt(cn2)) in the same double
  * operation order, so with fanout ≥ G (probe everything) the result is
  * bit-identical to the flat argmax (pinned by IvfTwoLevelSpec). With a
  * small fanout the coarse level is a standard approximate prune —
  * documented, and never active at gate scale (K < IVF_TWO_LEVEL_MIN_K). */
final case class IvfCodebook(
    superVec: Array[Array[Double]],    // per group: per-dim member sums
    superNorm: Array[Double],          // per group: sqrt(Σ s_i²)
    memberCid: Array[Array[Long]],     // per group: member centroid ids
    memberVec: Array[Array[Array[Long]]],
    memberNorm: Array[Array[Double]],  // per group: sqrt(cn2) per member
    fanout: Int) extends Serializable {
  def groups: Int = superVec.length
}

object IvfCodebook {

  /** group the collected centroids under the G lowest-cid seeds (cosine
    * argmax, ties to the lowest seed), then sum members per group */
  def build(rows: Array[(Long, Array[Long], Long)], fanout: Int): IvfCodebook = {
    val sorted = rows.sortBy(_._1)
    val k = sorted.length
    val g = math.max(1, math.round(math.sqrt(k.toDouble)).toInt)
    val dims = if (k == 0) 0 else sorted(0)._2.length
    val seeds = sorted.take(g)
    def cos(a: Array[Long], an2: Double, b: Array[Long], bn2: Double): Double = {
      var dot = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
      dot / (math.sqrt(an2) * math.sqrt(bn2))
    }
    val groupOf = sorted.map { case (_, c, cn2) =>
      var best = 0
      var bestScore = Double.NegativeInfinity
      var gi = 0
      while (gi < g) {
        val s = cos(c, cn2.toDouble, seeds(gi)._2, seeds(gi)._3.toDouble)
        if (java.lang.Double.compare(s, bestScore) > 0) { best = gi; bestScore = s }
        gi += 1
      }
      best
    }
    val memberIdx = Array.fill(g)(Vector.newBuilder[Int])
    groupOf.zipWithIndex.foreach { case (gi, i) => memberIdx(gi) += i }
    val members = memberIdx.map(_.result())
    val superVec = members.map { m =>
      val s = new Array[Double](dims)
      m.foreach { i =>
        val c = sorted(i)._2
        var d = 0
        while (d < dims) { s(d) += c(d).toDouble; d += 1 }
      }
      s
    }
    val superNorm = superVec.map(s => math.sqrt(s.map(x => x * x).sum))
    IvfCodebook(
      superVec, superNorm,
      members.map(_.map(i => sorted(i)._1).toArray),
      members.map(_.map(i => sorted(i)._2).toArray),
      members.map(_.map(i => math.sqrt(sorted(i)._3.toDouble)).toArray),
      fanout)
  }

  /** per-row two-level argmax; ties to the lowest cid, exactly the flat
    * `max(struct(cos, -cid, cid))` ordering */
  def assign(cb: IvfCodebook, q: ArrayData, n2: Long): Long = {
    val nq = q.numElements()
    val qv = new Array[Long](nq)
    var i = 0
    while (i < nq) { qv(i) = q.getLong(i); i += 1 }
    val qNorm = math.sqrt(n2.toDouble)
    val g = cb.groups
    val f = math.min(cb.fanout, g)
    // top-f groups by (score desc, gid asc) — insertion into a tiny array
    val topG = new Array[Int](f)
    val topS = Array.fill(f)(Double.NegativeInfinity)
    java.util.Arrays.fill(topG, Int.MaxValue)
    var gi = 0
    while (gi < g) {
      val sv = cb.superVec(gi)
      var dot = 0.0
      var d = 0
      val nd = math.min(nq, sv.length)
      while (d < nd) { dot += qv(d) * sv(d); d += 1 }
      val score = dot / (qNorm * cb.superNorm(gi))
      var pos = f
      while (pos > 0 && (java.lang.Double.compare(score, topS(pos - 1)) > 0 ||
        (java.lang.Double.compare(score, topS(pos - 1)) == 0 && gi < topG(pos - 1)))) pos -= 1
      if (pos < f) {
        var j = f - 1
        while (j > pos) { topS(j) = topS(j - 1); topG(j) = topG(j - 1); j -= 1 }
        topS(pos) = score
        topG(pos) = gi
      }
      gi += 1
    }
    // exact cosine argmax within the chosen groups, flat-path arithmetic
    var bestCid = Long.MaxValue
    var bestCos = Double.NegativeInfinity
    var first = true
    var fi = 0
    while (fi < f) {
      val grp = topG(fi)
      if (grp != Int.MaxValue) {
        val cids = cb.memberCid(grp)
        val vecs = cb.memberVec(grp)
        val norms = cb.memberNorm(grp)
        var mi = 0
        while (mi < cids.length) {
          val c = vecs(mi)
          var dot = 0L
          var d = 0
          val nd = math.min(nq, c.length)
          while (d < nd) { dot += qv(d) * c(d); d += 1 }
          val cosv = dot.toDouble / (qNorm * norms(mi))
          val cmp = java.lang.Double.compare(cosv, bestCos)
          if (first || cmp > 0 || (cmp == 0 && cids(mi) < bestCid)) {
            bestCos = cosv
            bestCid = cids(mi)
            first = false
          }
          mi += 1
        }
      }
      fi += 1
    }
    bestCid
  }
}

/** (vec_id's q, n2) → assigned centroid id via the driver-built
  * [[IvfCodebook]]; the codebook rides the task binary as a reference
  * object (same bytes a broadcast relation would ship). */
case class IvfTwoLevelAssign(left: Expression, right: Expression, cb: IvfCodebook)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "ivf_two_level_assign"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IvfCodebook.assign(cb, a.asInstanceOf[ArrayData], b.asInstanceOf[java.lang.Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCodebook", cb, classOf[IvfCodebook].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.IvfCodebook.assign($ref, $a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The deterministic hyperplane sign family, shared by the Spark kernel,
  * the recall harness, and (via `md5()`) the DuckDB oracle:
  *
  *   sign(p, pos) = +1  iff the first hex digit of md5("hp:p:pos") is even
  *
  * Found in r5: the previous LCG family — bit 15 of
  * (1103515245*(p*4096+pos)+12345) mod 2^31 — satisfies
  * sign(p+8, pos) = -sign(p, pos) EXACTLY (adding 8*4096*a ≡ odd*2^15
  * mod 2^31 always flips bit 15), so the whole family contained only 8
  * distinct hyperplanes up to negation. Bands beyond 8/bits repeated earlier
  * partitions verbatim: extra bands bought zero recall, and at 10^9 rows
  * `hpBitsFor`'s occupancy targeting would silently collapse (2^8 effective
  * buckets no matter the bit count). Any affine generator mod 2^k has
  * artifacts of this kind in fixed bit positions; md5 does not, costs the
  * same (signs are row-independent and cached per JVM), and the oracle twin
  * is one `substring(md5(...),1,1) IN ('0','2',...)` expression.
  *
  * Signs are cached as ±1 byte arrays per plane, grown on demand; the
  * kernel's generated code calls [[signedSum]] — a static JIT-compiled
  * primitive loop over the cached array, same cost as inlining. */
object HpSigns {
  private val cache = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Byte]]()

  /** first-hex-digit-parity of md5("hp:p:pos"), pos 1-based. */
  def sign(plane: Int, pos: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hp:$plane:$pos".getBytes("UTF-8"))
    if (((d(0) >> 4) & 1) == 0) 1 else -1
  }

  def signs(plane: Int, n: Int): Array[Byte] = {
    val cur = cache.get(plane)
    if (cur != null && cur.length >= n) cur
    else {
      val grown = math.max(n, 64)
      val a = new Array[Byte](grown)
      var i = 0
      while (i < grown) { a(i) = sign(plane, i + 1).toByte; i += 1 }
      cache.put(plane, a)
      a
    }
  }

  /** Σ_i q[i] * sign(plane, i+1) over an ArrayData — called from both the
    * interpreted eval and the generated code. */
  def signedSum(plane: Int, x: ArrayData): Long = {
    val n = x.numElements()
    val s = signs(plane, n)
    var acc = 0L
    var i = 0
    while (i < n) { acc += (if (s(i) > 0) x.getLong(i) else -x.getLong(i)); i += 1 }
    acc
  }
}

/** Σ a[i]*b[i] over two array<bigint>; length = min of the two (the callers
  * always pass equal-length embeddings). Null elements are not expected
  * (the arrays come from `transform` over non-null floats). */
case class DotProductL(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_l"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ_i q[i] * HpSigns.sign(plane, i+1) — one fused pass instead of
  * `aggregate(zip_with(q, sequence(...)))` per plane. The generated code
  * delegates to [[HpSigns.signedSum]] (static, JIT-compiled, cached sign
  * array) so the md5 derivation costs nothing per row. */
/** `transform(cast(e as array<double>), x -> cast(floor(x*1000) as bigint))`
  * as a native expression: same per-element arithmetic (Math.floor over the
  * widened double, truncated to long — bit-identical to the Floor
  * expression), no lambda interpreter, no codegen-span break. Input arrays
  * are embedding vectors with no null elements (parquet float lists). */
case class QuantizeMilli(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantize_milli"

  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.quantizeMilliData(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.VectorKernels.quantizeMilliData($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class HpSignedSum(child: Expression, plane: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hp_signed_sum"

  override protected def nullSafeEval(a: Any): Any =
    HpSigns.signedSum(plane, a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.HpSigns.signedSum($plane, $a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
