package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}
import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) drops
  * out of whole-stage codegen (lambda eval per element); this expression
  * generates a primitive `double` loop inside the stage instead — rung (b)
  * of the custom-operator ladder. The fold is sequential left-to-right, so
  * results stay bit-identical to the HOF version and to the DuckDB oracle's
  * `list_reduce`.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<double> (call sites guarantee it; the SQL surface
  // documents it). No ExpectsInputTypes: AbstractDataType is private[sql].
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Native integer dot over two `array<long>` code columns — the int8-GEMM
  * role in the SQ8 shortlist scan. The HOF formulation
  * (`aggregate(zip_with(qcs, cs, _*_), 0L, _+_)`) allocates a 64-slot
  * intermediate array and folds it through per-element lambda eval for
  * every (query, candidate) PAIR — measured as knn_sq8_rerank's whole sf10
  * wall (24.5 s for ~2M pairs; 8.4× per 10×, the worst non-cdc ratio in
  * BENCH_sf10.json r11). This is one primitive `long` loop inside
  * whole-stage codegen. Integer adds are exact, so any fold order gives
  * bit-identical results to the oracle's list_reduce; sequential kept for
  * symmetry with [[ArrayDot]].
  */
case class ArrayDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"

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
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotLong =
    copy(left = newLeft, right = newRight)
}

/** Argmax_k of dot(vec, matrix[k·dim .. (k+1)·dim)) / scale[k] over a
  * row-major flattened matrix — the IVF nearest-centroid assignment as ONE
  * tight codegen'd loop. An equivalent 32-way array-of-structs max compiles
  * to a janino method so large it costs seconds of one-time codegen and
  * falls out of the fast path; this stays small at any cell count. Ties
  * keep the LOWEST k (strict `>` while scanning ascending), matching the
  * (score desc, cell asc) order of the SQL oracle's row_number. The dot
  * fold is sequential left-to-right — bit-identical to ArrayDot and the
  * oracle's list_reduce.
  */
case class ArgmaxScaledDot(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_argmax_dot"

  override protected def nullSafeEval(v: Any, m: Any, s: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val mat = m.asInstanceOf[ArrayData]
    val sc = s.asInstanceOf[ArrayData]
    val k = sc.numElements()
    val dim = if (k == 0) 0 else mat.numElements() / k
    val n = math.min(dim, x.numElements())
    var best = 0.0; var cell = 0; var i = 0
    while (i < k) {
      var acc = 0.0; var j = 0; val off = i * dim
      while (j < n) { acc += x.getDouble(j) * mat.getDouble(off + j); j += 1 }
      val score = acc / sc.getDouble(i)
      if (i == 0 || score > best) { best = score; cell = i }
      i += 1
    }
    cell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m, s) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val dim = ctx.freshName("dim")
      val n = ctx.freshName("n"); val off = ctx.freshName("off")
      val acc = ctx.freshName("acc"); val score = ctx.freshName("score")
      val best = ctx.freshName("best"); val cell = ctx.freshName("cell")
      s"""
         |int $k = $s.numElements();
         |int $dim = $k == 0 ? 0 : $m.numElements() / $k;
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |double $best = 0.0; int $cell = 0;
         |for (int $i = 0; $i < $k; $i++) {
         |  double $acc = 0.0; int $off = $i * $dim;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $acc += $v.getDouble($j) * $m.getDouble($off + $j);
         |  }
         |  double $score = $acc / $s.getDouble($i);
         |  if ($i == 0 || $score > $best) { $best = $score; $cell = $i; }
         |}
         |${ev.value} = $cell;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ArgmaxScaledDot =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Top-`topK` cells of dot(vec, matrix[k·dim .. (k+1)·dim)) / scale[k] —
  * ArgmaxScaledDot's multi-probe sibling, as ONE codegen'd loop nest
  * returning `array<int>` ordered (score desc, cell asc). The previous
  * formulation — `transform`-with-index over the 2-d centroid literal into
  * an array of (negccos, cell) structs, `sort_array`, `slice` — unrolled
  * into a projection janino refuses to compile past ~32 cells ("Code grows
  * beyond 64 KB"), silently dropping the probe stage to interpreted eval.
  * This expression is O(cells·dim + topK·cells) with constant code size.
  *
  * Ordering contract, bit-identical to the struct sort it replaces: score
  * = dot/scale compared as IEEE doubles (negation in the old `negccos` is
  * exact, so asc-on-negated ≡ desc-on-raw), ties keep the LOWEST cell
  * (strict `>` scanning ascending) — the (ccos desc, cell asc) order every
  * generated oracle's row_number states. The dot fold is sequential
  * left-to-right — bit-identical to ArrayDot and the oracle's list_reduce.
  */
case class ArgTopKDot(first: Expression, second: Expression, third: Expression,
    fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = ArrayTypes.intArray
  override def prettyName: String = "graft_argtopk_dot"

  override protected def nullSafeEval(v: Any, m: Any, s: Any, tk: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val mat = m.asInstanceOf[ArrayData]
    val sc = s.asInstanceOf[ArrayData]
    val k = sc.numElements()
    val dim = if (k == 0) 0 else mat.numElements() / k
    val n = math.min(dim, x.numElements())
    val take = math.min(tk.asInstanceOf[Int], k)
    val scores = new Array[Double](k)
    var i = 0
    while (i < k) {
      var acc = 0.0; var j = 0; val off = i * dim
      while (j < n) { acc += x.getDouble(j) * mat.getDouble(off + j); j += 1 }
      scores(i) = acc / sc.getDouble(i)
      i += 1
    }
    val used = new Array[Boolean](k)
    val out = new Array[Int](take)
    var r = 0
    while (r < take) {
      var bi = -1; var best = 0.0; i = 0
      while (i < k) {
        if (!used(i) && (bi < 0 || scores(i) > best)) { best = scores(i); bi = i }
        i += 1
      }
      used(bi) = true; out(r) = bi
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m, s, tk) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val r = ctx.freshName("r"); val k = ctx.freshName("k")
      val dim = ctx.freshName("dim"); val n = ctx.freshName("n")
      val off = ctx.freshName("off"); val acc = ctx.freshName("acc")
      val take = ctx.freshName("take"); val scores = ctx.freshName("scores")
      val used = ctx.freshName("used"); val out = ctx.freshName("out")
      val bi = ctx.freshName("bi"); val best = ctx.freshName("best")
      s"""
         |int $k = $s.numElements();
         |int $dim = $k == 0 ? 0 : $m.numElements() / $k;
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |int $take = java.lang.Math.min($tk, $k);
         |double[] $scores = new double[$k];
         |for (int $i = 0; $i < $k; $i++) {
         |  double $acc = 0.0; int $off = $i * $dim;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $acc += $v.getDouble($j) * $m.getDouble($off + $j);
         |  }
         |  $scores[$i] = $acc / $s.getDouble($i);
         |}
         |boolean[] $used = new boolean[$k];
         |int[] $out = new int[$take];
         |for (int $r = 0; $r < $take; $r++) {
         |  int $bi = -1; double $best = 0.0;
         |  for (int $i = 0; $i < $k; $i++) {
         |    if (!$used[$i] && ($bi < 0 || $scores[$i] > $best)) {
         |      $best = $scores[$i]; $bi = $i;
         |    }
         |  }
         |  $used[$bi] = true; $out[$r] = $bi;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): ArgTopKDot =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

/** Product-quantization encoder: split `v` into `numSub` contiguous
  * subvectors and, for each subspace m, emit the index k minimizing
  * ||v_m − C[m][k]||² over the flattened codebook — computed in dot form,
  * argmax_k (dot(v_m, C[m][k]) + bias[m][k]) with bias = −||C[m][k]||²/2,
  * so the inner loop is the same fused multiply-add shape as ArrayDot.
  * One codegen'd loop nest for all subspaces (8×16 struct-max equivalents
  * would blow the janino budget the way ArgmaxScaledDot's docs describe).
  * Ties keep the LOWEST k (strict `>` scanning ascending), matching the
  * oracle's (score desc, k asc) row_number. Output: array<int> of length
  * `numSub`.
  *
  * Layout contract: `mat` is row-major [m][k][subDim] with subDim =
  * v.length / numSub and K = bias.length / numSub; `bias` is [m][k].
  */
case class PqEncode(first: Expression, second: Expression, third: Expression,
    fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = ArrayTypes.intArray
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(v: Any, m: Any, b: Any, ns: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val mat = m.asInstanceOf[ArrayData]
    val bias = b.asInstanceOf[ArrayData]
    val numSub = ns.asInstanceOf[Int]
    val sub = x.numElements() / numSub
    val kk = bias.numElements() / numSub
    val codes = new Array[Int](numSub)
    var mi = 0
    while (mi < numSub) {
      var best = 0.0; var bi = 0; var k = 0
      while (k < kk) {
        var acc = 0.0; var j = 0; val off = (mi * kk + k) * sub
        while (j < sub) { acc += x.getDouble(mi * sub + j) * mat.getDouble(off + j); j += 1 }
        val score = acc + bias.getDouble(mi * kk + k)
        if (k == 0 || score > best) { best = score; bi = k }
        k += 1
      }
      codes(mi) = bi
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m, b, ns) => {
      val mi = ctx.freshName("mi"); val k = ctx.freshName("k")
      val j = ctx.freshName("j"); val sub = ctx.freshName("sub")
      val kk = ctx.freshName("kk"); val off = ctx.freshName("off")
      val acc = ctx.freshName("acc"); val score = ctx.freshName("score")
      val best = ctx.freshName("best"); val bi = ctx.freshName("bi")
      val codes = ctx.freshName("codes")
      s"""
         |int $sub = $v.numElements() / $ns;
         |int $kk = $b.numElements() / $ns;
         |int[] $codes = new int[$ns];
         |for (int $mi = 0; $mi < $ns; $mi++) {
         |  double $best = 0.0; int $bi = 0;
         |  for (int $k = 0; $k < $kk; $k++) {
         |    double $acc = 0.0; int $off = ($mi * $kk + $k) * $sub;
         |    for (int $j = 0; $j < $sub; $j++) {
         |      $acc += $v.getDouble($mi * $sub + $j) * $m.getDouble($off + $j);
         |    }
         |    double $score = $acc + $b.getDouble($mi * $kk + $k);
         |    if ($k == 0 || $score > $best) { $best = $score; $bi = $k; }
         |  }
         |  $codes[$mi] = $bi;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): PqEncode =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

/** Per-query ADC table: lut[m·K + k] = dot(v_m, C[m][k]) over the same
  * flattened [m][k][subDim] codebook layout as [[PqEncode]] — all
  * numSub·K entries in one codegen'd loop nest. The unrolled equivalent
  * (numSub·K separate dot-of-slice expressions collected with `array`)
  * generates a projection past janino's 64 KB method budget at 8×16
  * entries, dropping the whole query stage to interpreted eval. Each
  * entry's fold is sequential left-to-right over the subvector —
  * bit-identical to dot(slice(v, m·sub+1, sub), C[m][k]) and to the
  * oracle's per-entry list_reduce.
  */
case class PqLut(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayTypes.doubleArray
  override def prettyName: String = "graft_pq_lut"

  override protected def nullSafeEval(v: Any, m: Any, ns: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val mat = m.asInstanceOf[ArrayData]
    val numSub = ns.asInstanceOf[Int]
    val sub = x.numElements() / numSub
    val kk = if (sub == 0) 0 else mat.numElements() / (numSub * sub)
    val lut = new Array[Double](numSub * kk)
    var mi = 0
    while (mi < numSub) {
      var k = 0
      while (k < kk) {
        var acc = 0.0; var j = 0; val off = (mi * kk + k) * sub
        while (j < sub) { acc += x.getDouble(mi * sub + j) * mat.getDouble(off + j); j += 1 }
        lut(mi * kk + k) = acc
        k += 1
      }
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m, ns) => {
      val mi = ctx.freshName("mi"); val k = ctx.freshName("k")
      val j = ctx.freshName("j"); val sub = ctx.freshName("sub")
      val kk = ctx.freshName("kk"); val off = ctx.freshName("off")
      val acc = ctx.freshName("acc"); val lut = ctx.freshName("lut")
      s"""
         |int $sub = $v.numElements() / $ns;
         |int $kk = $sub == 0 ? 0 : $m.numElements() / ($ns * $sub);
         |double[] $lut = new double[$ns * $kk];
         |for (int $mi = 0; $mi < $ns; $mi++) {
         |  for (int $k = 0; $k < $kk; $k++) {
         |    double $acc = 0.0; int $off = ($mi * $kk + $k) * $sub;
         |    for (int $j = 0; $j < $sub; $j++) {
         |      $acc += $v.getDouble($mi * $sub + $j) * $m.getDouble($off + $j);
         |    }
         |    $lut[$mi * $kk + $k] = $acc;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqLut =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Native orthogonal-rotation / matrix-vector product: out[r] =
  * dot(flatMatrix[r·n .. r·n+n), v) for r in 0 until rows, rows =
  * |flatMatrix| / |v| — the OPQ rotation kernel (64 sequential-fold dots
  * composed as 64 separate ArrayDot columns unroll past janino's method
  * budget; this is ONE primitive nested loop in whole-stage codegen).
  * Per-row folds are sequential left-to-right, matching [[ArrayDot]] and
  * the oracle's unrolled per-row dot literals bit-for-bit.
  */
case class MatVec(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayTypes.doubleArray
  override def prettyName: String = "graft_matvec"

  override protected def nullSafeEval(a: Any, m: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val mat = m.asInstanceOf[ArrayData]
    val n = x.numElements()
    // shape check (r13 advice): a malformed rotation literal must fail,
    // not silently truncate to floor(|mat|/n) rows
    if (n != 0 && mat.numElements() % n != 0)
      throw new IllegalArgumentException(
        s"graft_matvec: matrix length ${mat.numElements()} is not a " +
          s"multiple of vector length $n")
    val rows = if (n == 0) 0 else mat.numElements() / n
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      var acc = 0.0; var j = 0; val off = r * n
      while (j < n) { acc += mat.getDouble(off + j) * x.getDouble(j); j += 1 }
      out(r) = acc
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, m) => {
      val r = ctx.freshName("r"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val rows = ctx.freshName("rows")
      val off = ctx.freshName("off"); val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |if ($n != 0 && $m.numElements() % $n != 0) {
         |  throw new IllegalArgumentException(
         |    "graft_matvec: matrix length " + $m.numElements() +
         |    " is not a multiple of vector length " + $n);
         |}
         |int $rows = $n == 0 ? 0 : $m.numElements() / $n;
         |double[] $out = new double[$rows];
         |for (int $r = 0; $r < $rows; $r++) {
         |  double $acc = 0.0; int $off = $r * $n;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $acc += $m.getDouble($off + $j) * $a.getDouble($j);
         |  }
         |  $out[$r] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatVec =
    copy(left = newLeft, right = newRight)
}

private object ArrayTypes {
  val intArray: DataType = org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  val doubleArray: DataType = org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
}

/** Column-API + SQL-registration surface for the native vector expressions. */
object NativeVector {

  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(ArrayDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Integer dot over two `array<long>` code columns (SQ8 shortlist scan). */
  def dotLong(a: Column, b: Column): Column =
    GraftSqlBridge.column(ArrayDotLong(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def norm2(a: Column): Column = dot(a, a)

  /** cos = dot/sqrt(n2a*n2b) — same shape as VectorFunctions.cosine and the
    * SQL oracle, just with the native kernel inside.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** argmax_k dot(v, flatMatrix[k]) / scale(k); ties keep the lowest k. */
  def argmaxDot(v: Column, flatMatrix: Column, scale: Column): Column =
    GraftSqlBridge.column(ArgmaxScaledDot(GraftSqlBridge.expression(v),
      GraftSqlBridge.expression(flatMatrix), GraftSqlBridge.expression(scale)))

  /** Top-`k` cells of dot(v, flatMatrix)/scale, ordered (score desc, cell
    * asc); ties keep the lowest cell — the multi-probe ranking.
    */
  def argTopKDot(v: Column, flatMatrix: Column, scale: Column, topK: Column): Column =
    GraftSqlBridge.column(ArgTopKDot(GraftSqlBridge.expression(v),
      GraftSqlBridge.expression(flatMatrix), GraftSqlBridge.expression(scale),
      GraftSqlBridge.expression(topK)))

  /** PQ codes of `v` against a flattened [m][k][subDim] codebook with
    * per-(m,k) biases (−||c||²/2 for L2 argmin); ties keep the lowest k.
    */
  def pqEncode(v: Column, flatCodebook: Column, bias: Column, numSub: Column): Column =
    GraftSqlBridge.column(PqEncode(GraftSqlBridge.expression(v),
      GraftSqlBridge.expression(flatCodebook), GraftSqlBridge.expression(bias),
      GraftSqlBridge.expression(numSub)))

  /** Rotation / mat-vec: out[r] = dot(flatMatrix row r, v) — rows =
    * |flatMatrix|/|v|. One codegen'd nested loop (the OPQ rotation).
    */
  def matVec(v: Column, flatMatrix: Column): Column =
    GraftSqlBridge.column(MatVec(GraftSqlBridge.expression(v),
      GraftSqlBridge.expression(flatMatrix)))

  /** ADC table of `v` against a flattened [m][k][subDim] codebook:
    * array<double> with lut[m·K + k] = dot(v_m, C[m][k]).
    */
  def pqLut(v: Column, flatCodebook: Column, numSub: Column): Column =
    GraftSqlBridge.column(PqLut(GraftSqlBridge.expression(v),
      GraftSqlBridge.expression(flatCodebook), GraftSqlBridge.expression(numSub)))

  private val info = new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot")
  private def builder(children: Seq[Expression]): Expression = children match {
    case Seq(a, b) => ArrayDot(a, b)
    case _ => throw new IllegalArgumentException("graft_dot takes exactly 2 arguments")
  }

  private val dotLongInfo =
    new ExpressionInfo(classOf[ArrayDotLong].getName, "graft_dot_long")
  private def dotLongBuilder(children: Seq[Expression]): Expression = children match {
    case Seq(a, b) => ArrayDotLong(a, b)
    case _ => throw new IllegalArgumentException("graft_dot_long takes exactly 2 arguments")
  }

  private val argmaxInfo =
    new ExpressionInfo(classOf[ArgmaxScaledDot].getName, "graft_argmax_dot")
  private def argmaxBuilder(children: Seq[Expression]): Expression = children match {
    case Seq(v, m, s) => ArgmaxScaledDot(v, m, s)
    case _ => throw new IllegalArgumentException("graft_argmax_dot takes exactly 3 arguments")
  }

  private val argtopkInfo =
    new ExpressionInfo(classOf[ArgTopKDot].getName, "graft_argtopk_dot")
  private def argtopkBuilder(children: Seq[Expression]): Expression = children match {
    case Seq(v, m, s, tk) => ArgTopKDot(v, m, s, tk)
    case _ => throw new IllegalArgumentException("graft_argtopk_dot takes exactly 4 arguments")
  }

  private val pqInfo = new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode")
  private def pqBuilder(children: Seq[Expression]): Expression = children match {
    case Seq(v, m, b, ns) => PqEncode(v, m, b, ns)
    case _ => throw new IllegalArgumentException("graft_pq_encode takes exactly 4 arguments")
  }

  private val pqLutInfo = new ExpressionInfo(classOf[PqLut].getName, "graft_pq_lut")
  private def pqLutBuilder(children: Seq[Expression]): Expression = children match {
    case Seq(v, m, ns) => PqLut(v, m, ns)
    case _ => throw new IllegalArgumentException("graft_pq_lut takes exactly 3 arguments")
  }

  private val topkInfo =
    new ExpressionInfo(classOf[TopKSketch].getName, "graft_topk_sketch")
  private[functions] def topkBuilder(children: Seq[Expression]): Expression = children match {
    case Seq(t, cap) if cap.foldable =>
      TopKSketch(t, cap.eval(null).asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException(
      "graft_topk_sketch takes (term, constant capacity)")
  }

  /** Register the native vector functions into a live session's registry. */
  def register(spark: SparkSession): Unit = {
    GraftSqlBridge.registerFunction(spark, "graft_dot", info, builder)
    GraftSqlBridge.registerFunction(spark, "graft_dot_long", dotLongInfo, dotLongBuilder)
    GraftSqlBridge.registerFunction(spark, "graft_argmax_dot", argmaxInfo, argmaxBuilder)
    GraftSqlBridge.registerFunction(spark, "graft_argtopk_dot", argtopkInfo, argtopkBuilder)
    GraftSqlBridge.registerFunction(spark, "graft_pq_encode", pqInfo, pqBuilder)
    GraftSqlBridge.registerFunction(spark, "graft_pq_lut", pqLutInfo, pqLutBuilder)
    GraftSqlBridge.registerFunction(spark, "graft_topk_sketch", topkInfo, topkBuilder)
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` — rung (c):
  * library functions installed at session build time, usable from pure SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot"),
        (children: Seq[Expression]) => ArrayDot(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_dot_long"),
        new ExpressionInfo(classOf[ArrayDotLong].getName, "graft_dot_long"),
        (children: Seq[Expression]) => ArrayDotLong(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_argmax_dot"),
        new ExpressionInfo(classOf[ArgmaxScaledDot].getName, "graft_argmax_dot"),
        (children: Seq[Expression]) => ArgmaxScaledDot(children(0), children(1), children(2))))
    ext.injectFunction(
      (FunctionIdentifier("graft_argtopk_dot"),
        new ExpressionInfo(classOf[ArgTopKDot].getName, "graft_argtopk_dot"),
        (children: Seq[Expression]) =>
          ArgTopKDot(children(0), children(1), children(2), children(3))))
    ext.injectFunction(
      (FunctionIdentifier("graft_pq_encode"),
        new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
        (children: Seq[Expression]) =>
          PqEncode(children(0), children(1), children(2), children(3))))
    ext.injectFunction(
      (FunctionIdentifier("graft_pq_lut"),
        new ExpressionInfo(classOf[PqLut].getName, "graft_pq_lut"),
        (children: Seq[Expression]) => PqLut(children(0), children(1), children(2))))
    ext.injectFunction(
      (FunctionIdentifier("graft_topk_sketch"),
        new ExpressionInfo(classOf[TopKSketch].getName, "graft_topk_sketch"),
        NativeVector.topkBuilder _))
  }
}
