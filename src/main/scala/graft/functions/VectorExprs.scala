package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd Catalyst expressions for the per-row hot loops that Spark's
  * higher-order functions (`transform`/`aggregate`/`zip_with`) execute as
  * CodegenFallback — the SURVEY §4 "custom Expression, perf only" case.
  *
  * Numerics are bit-identical to the HOF formulations they replace (sequential
  * left-fold over the array, each float widened to double before multiply), so
  * swapping them in cannot move a DuckDB-oracle hash.
  */
object VectorExprs {
  private def c(e: Expression): Column = GraftSqlBridge.column(e)
  private def e(col: Column): Expression = GraftSqlBridge.expression(col)

  /** Σ a(i)·b(i) as double, sequential. */
  def vecDot(a: Column, b: Column): Column = c(VecDot(e(a), e(b)))

  /** Σ (a(i)−b(i))² as double, sequential (L2 distance squared). */
  def l2Sq(a: Column, b: Column): Column = c(VecL2Sq(e(a), e(b)))

  /** Distinct word-n-gram shingle hashes of an array<string> token list:
    * each window of n word-hashes chain-combines via xxh64; result sorted
    * distinct. Equality across documents matches string-shingle equality up
    * to 2^-64-scale collisions. */
  def shingleHashes(words: Column, n: Int): Column = c(ShingleHashes(e(words), n))

  /** MinHash signature over an array<long> shingle-hash set: k hash functions
    * h_i(s) = xxh64(s, i); one pass over the hashes. */
  def minhashSig(shingleHashes: Column, k: Int): Column =
    c(MinHashSig(e(shingleHashes), k))

  /** 64-bit SimHash of an array<string> token list: bit j = sign of
    * Σ_tokens (bit j of xxh64(token, 42) ? +1 : −1); one pass. */
  def simhash64(words: Column): Column = c(SimHash64(e(words)))
}

private[graft] trait ArrayNumericCheck { self: Expression =>
  protected def checkNumericArray(e: Expression, side: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$side must be array<float|double>, got ${t.sql}")
    }

  /** Java accessor returning the i-th element widened to double. */
  protected def getter(e: Expression, arr: String, i: String): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }

  protected def getElem(e: Expression, arr: ArrayData, i: Int): Double =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }
}

case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ArrayNumericCheck {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    checkNumericArray(left, "left") match {
      case TypeCheckResult.TypeCheckSuccess => checkNumericArray(right, "right")
      case f => f
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += getElem(left, x, i) * getElem(right, y, i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${getter(left, a, i)} * ${getter(right, b, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

case class VecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression with ArrayNumericCheck {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    checkNumericArray(left, "left") match {
      case TypeCheckResult.TypeCheckSuccess => checkNumericArray(right, "right")
      case f => f
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = getElem(left, x, i) - getElem(right, y, i)
      s += d * d
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${getter(left, a, i)} - ${getter(right, b, i)};
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecL2Sq =
    copy(left = l, right = r)
}

/** Distinct shingle hashes from a token array: hash each word once, chain
  * n-word windows with xxh64, sort + dedup. Replaces the interpreted
  * slice/array_join/array_distinct string-shingle pipeline — no shingle
  * strings are ever built. Window semantics mirror [[graft.operators.Dedup
  * .shingles]]: max(|words|−n+1, 1) windows, the tail windows truncated. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"need array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val w = arr.numElements()
    val wh = new Array[Long](w)
    var i = 0
    while (i < w) { wh(i) = XXH64.hashUTF8String(arr.getUTF8String(i), 42L); i += 1 }
    val m = math.max(w - n + 1, 1)
    val out = new Array[Long](math.max(m, 0))
    i = 0
    while (i < m) {
      var h = 42L
      var j = i
      val end = math.min(i + n, w)
      while (j < end) { h = XXH64.hashLong(wh(j), h); j += 1 }
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    var uniq = 0
    i = 0
    while (i < out.length) {
      if (i == 0 || out(i) != out(i - 1)) { out(uniq) = out(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val w = ctx.freshName("w")
      val m = ctx.freshName("m")
      val h = ctx.freshName("h")
      val end = ctx.freshName("end")
      val wh = ctx.freshName("wh")
      val out = ctx.freshName("out")
      val uniq = ctx.freshName("uniq")
      val xxh = classOf[XXH64].getName
      s"""
         |int $w = $a.numElements();
         |long[] $wh = new long[$w];
         |for (int $i = 0; $i < $w; $i++) {
         |  $wh[$i] = $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |}
         |int $m = java.lang.Math.max($w - $n + 1, 1);
         |long[] $out = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $h = 42L;
         |  int $end = java.lang.Math.min($i + $n, $w);
         |  for (int $j = $i; $j < $end; $j++) {
         |    $h = $xxh.hashLong($wh[$j], $h);
         |  }
         |  $out[$i] = $h;
         |}
         |java.util.Arrays.sort($out);
         |int $uniq = 0;
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($i == 0 || $out[$i] != $out[$i - 1]) { $out[$uniq] = $out[$i]; $uniq++; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($out, $uniq));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
}

/** One-pass MinHash signature over pre-hashed shingles (SURVEY §2 north-star
  * MinHash+LSH dedup): sig[i] = min over shingles of xxh64(shingleHash, i). */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"need array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = XXH64.hashLong(h, j.toLong)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val sig = ctx.freshName("sig")
      val xxh = classOf[XXH64].getName
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = $xxh.hashLong($h, (long) $j);
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** One-pass 64-bit SimHash (replaces 64 interpreted `aggregate` passes). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"need array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sums = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var j = 0
      while (j < 64) {
        sums(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (sums(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val sums = ctx.freshName("sums")
      val out = ctx.freshName("out")
      val xxh = classOf[XXH64].getName
      s"""
         |int $n = $a.numElements();
         |int[] $sums = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |  for (int $j = 0; $j < 64; $j++) {
         |    $sums[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($sums[$j] > 0) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}
