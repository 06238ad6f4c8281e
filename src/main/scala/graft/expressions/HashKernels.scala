package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** Codegen'd hash-sketch kernels: 64-bit SimHash over a token array and the
  * random-hyperplane LSH bucket id over an embedding vector.
  *
  * Both replace higher-order-function formulations
  * (`aggregate`/`zip_with`/`transform` chains) whose lambda bodies evaluate
  * interpreted — a 64-wide boxed loop per token for SimHash, one
  * interpreted pass per hyperplane for LSH — the same constant-factor trap
  * [[VectorKernels]] removed from the cosine/dot path. Each kernel is one
  * primitive loop inside whole-stage codegen.
  *
  * Bit-parity with the HOF formulations is contractual (the dedup/ANN gates
  * must keep producing identical sketches), so both kernels reuse Spark's
  * own [[XXH64]] with the default `xxhash64` seed 42 and reproduce the HOF
  * null semantics exactly:
  *  - SimHash: a NULL token array (NULL text) folds to signature 0L, and a
  *    NULL token hashes as the bare seed (42L) — `xxhash64` leaves the seed
  *    untouched for a null child.
  *  - LSH: a NULL vector or any NULL element poisons every plane's
  *    projection to NULL, which the HOF's `when(proj > 0, …).otherwise(0)`
  *    collapses to bucket 0L.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> input, got $t")
  }

  private def compute(a: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      val h = if (a.isNullAt(i)) 42L
        else XXH64.hashUTF8String(a.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else compute(v.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val xxh = classOf[XXH64].getName
    val a = ctx.freshName("arr"); val n = ctx.freshName("n")
    val votes = ctx.freshName("votes"); val h = ctx.freshName("h")
    val i = ctx.freshName("i"); val b = ctx.freshName("b")
    val code = code"""
      ${c.code}
      long ${ev.value} = 0L;
      if (!${c.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $a = ${c.value};
        final int $n = $a.numElements();
        final int[] $votes = new int[64];
        for (int $i = 0; $i < $n; $i++) {
          final long $h = $a.isNullAt($i) ? 42L
            : $xxh.hashUTF8String($a.getUTF8String($i), 42L);
          for (int $b = 0; $b < 64; $b++) {
            $votes[$b] += (($h >>> $b) & 1L) != 0L ? 1 : -1;
          }
        }
        for (int $b = 0; $b < 64; $b++) {
          if ($votes[$b] > 0) ${ev.value} |= (1L << $b);
        }
      }
    """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** `nbits`-bit random-hyperplane LSH bucket id. Plane weights are the same
  * deterministic pseudo-random components as the HOF formulation:
  * `pmod(xxhash64(plane, dim), 100000) / 100000.0 - 0.5`, with the plane
  * half of the hash (`hashInt(plane, 42)`) folded at plan time into a
  * per-plane seed constant. One pass over the vector accumulates all
  * `nbits` projections (element order — and thus float summation order —
  * identical to the per-plane HOF passes). `nbits = 0` is the documented
  * degenerate mode: every vector lands in bucket 0, turning an LSH-routed
  * search into an exact one (the oracle configuration of q_ann_lsh_exact). */
case class LshBucketExpr(child: Expression, nbits: Int) extends UnaryExpression {
  require(nbits >= 0 && nbits < 64, s"nbits must be in [0, 63], got $nbits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> input, got $t")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** hashInt(plane, 42) — the plane half of xxhash64(lit(plane), dim). */
  private lazy val planeSeeds: Array[Long] =
    Array.tabulate(nbits)(p => XXH64.hashInt(p, 42L))

  private def compute(a: ArrayData): Long = {
    val n = a.numElements()
    val proj = new Array[Double](nbits)
    val float = isFloat
    var j = 0
    while (j < n) {
      if (a.isNullAt(j)) return 0L // null element poisons every plane → 0
      val x = if (float) a.getFloat(j).toDouble else a.getDouble(j)
      var p = 0
      while (p < nbits) {
        val hh = XXH64.hashInt(j, planeSeeds(p))
        val w = (((hh % 100000L) + 100000L) % 100000L).toDouble / 100000.0 - 0.5
        proj(p) += x * w
        p += 1
      }
      j += 1
    }
    var bucket = 0L
    var p = 0
    while (p < nbits) { if (proj(p) > 0) bucket |= (1L << p); p += 1 }
    bucket
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else compute(v.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val xxh = classOf[XXH64].getName
    val getter = if (isFloat) "getFloat" else "getDouble"
    val seeds = ctx.addReferenceObj("planeSeeds", planeSeeds, "long[]")
    val a = ctx.freshName("arr"); val n = ctx.freshName("n")
    val proj = ctx.freshName("proj"); val x = ctx.freshName("x")
    val hh = ctx.freshName("hh"); val w = ctx.freshName("w")
    val j = ctx.freshName("j"); val p = ctx.freshName("p")
    val ok = ctx.freshName("ok")
    val code = code"""
      ${c.code}
      long ${ev.value} = 0L;
      if (!${c.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $a = ${c.value};
        final int $n = $a.numElements();
        final double[] $proj = new double[$nbits];
        boolean $ok = true;
        for (int $j = 0; $j < $n && $ok; $j++) {
          if ($a.isNullAt($j)) { $ok = false; break; }
          final double $x = (double) $a.$getter($j);
          for (int $p = 0; $p < $nbits; $p++) {
            final long $hh = $xxh.hashInt($j, $seeds[$p]);
            final double $w =
              ((($hh % 100000L) + 100000L) % 100000L) / 100000.0 - 0.5;
            $proj[$p] += $x * $w;
          }
        }
        if ($ok) {
          for (int $p = 0; $p < $nbits; $p++) {
            if ($proj[$p] > 0) ${ev.value} |= (1L << $p);
          }
        }
      }
    """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

/** k-slot MinHash signature over a shingle array, one pass, zero shuffle.
  *
  * Slot i is `min over shingles of xxhash64(lit(i), shingle)` — bit-identical
  * to both the per-slot `array_min(transform(...))` HOF form and the
  * explode + `min(...)` aggregate form (`hashInt(i, 42)` is the folded seed
  * literal, then `hashUTF8String` per element; a null element contributes
  * the bare seed, exactly as `xxhash64` skips null children). Replacing the
  * aggregate formulation removes the signature shuffle entirely: the
  * signature becomes a per-row projection, and the exploded inverted index
  * is only needed for candidate verification.
  *
  * Null input → NULL; empty input → k null slots (array_min of empty). */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k <= 1024, s"k must be in [1, 1024], got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> input, got $t")
  }

  /** xxhash64(lit(i), …) folds the int literal first: hashInt(i, 42). */
  private lazy val slotSeeds: Array[Long] =
    Array.tabulate(k)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      new Array[Any](k))
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val isNull = a.isNullAt(j)
      val s = if (isNull) null else a.getUTF8String(j)
      var i = 0
      while (i < k) {
        val h = if (isNull) slotSeeds(i) else XXH64.hashUTF8String(s, slotSeeds(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val seeds = ctx.addReferenceObj("slotSeeds", slotSeeds, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
      val s = ctx.freshName("s"); val h = ctx.freshName("h")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new Object[$k]);
         |} else {
         |  final long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    final org.apache.spark.unsafe.types.UTF8String $s =
         |      $a.isNullAt($j) ? null : $a.getUTF8String($j);
         |    for (int $i = 0; $i < $k; $i++) {
         |      final long $h = $s == null ? $seeds[$i]
         |        : $xxh.hashUTF8String($s, $seeds[$i]);
         |      if ($h < $mins[$i]) $mins[$i] = $h;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** 60-bit md5-seeded SimHash over a token array — the codegen kernel for
  * [[graft.pipeline.Dedup.simhash60Md5]]'s HOF formulation, whose lambda
  * body evaluated INTERPRETED as a 60-wide boxed zip_with/transform per
  * token (the r18 optimization round measured the HOF at ~4× the md5 cost
  * itself). One md5 + one primitive 60-bit vote loop per token.
  *
  * Bit-parity contract (the q_dedup_simhash signature is hash-oracled):
  *  - per-token hash = the first 15 md5 hex chars as a long — exactly
  *    `conv(substring(md5(t), 1, 15), 16, 10)` = the top 60 bits of the
  *    digest (first 8 bytes big-endian >>> 4);
  *  - a NULL token hashes to NULL in the HOF, whose `when` then falls to
  *    the otherwise branch: −1 votes on every bit — reproduced here;
  *  - NULL token array (NULL text) → 0L (the HOF's outer coalesce);
  *  - bit b set iff votes(b) > 0 (ties → 0). */
case class SimHash60Md5Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash60_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> input, got $t")
  }

  private def compute(a: ArrayData): Long = {
    val votes = new Array[Int](60)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) {
        var b = 0
        while (b < 60) { votes(b) -= 1; b += 1 }
      } else {
        val h = SimHash60Md5Expr.md5Top60(a.getUTF8String(i).getBytes)
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else compute(v.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val helper = SimHash60Md5Expr.getClass.getName.stripSuffix("$")
    val a = ctx.freshName("arr"); val n = ctx.freshName("n")
    val votes = ctx.freshName("votes"); val h = ctx.freshName("h")
    val i = ctx.freshName("i"); val b = ctx.freshName("b")
    val code = code"""
      ${c.code}
      long ${ev.value} = 0L;
      if (!${c.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $a = ${c.value};
        final int $n = $a.numElements();
        final int[] $votes = new int[60];
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i)) {
            for (int $b = 0; $b < 60; $b++) { $votes[$b] -= 1; }
          } else {
            final long $h = $helper.md5Top60($a.getUTF8String($i).getBytes());
            for (int $b = 0; $b < 60; $b++) {
              $votes[$b] += (($h >>> $b) & 1L) != 0L ? 1 : -1;
            }
          }
        }
        for (int $b = 0; $b < 60; $b++) {
          if ($votes[$b] > 0) ${ev.value} |= (1L << $b);
        }
      }
    """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60Md5Expr =
    copy(child = newChild)
}

object SimHash60Md5Expr {
  /** Top 60 bits of md5(bytes) — the value of the digest's first 15 hex
    * chars parsed base-16 (what `conv(substring(md5(s),1,15),16,10)`
    * computes). Called from generated code. */
  def md5Top60(bytes: Array[Byte]): Long = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(bytes)
    var top = 0L
    var i = 0
    while (i < 8) { top = (top << 8) | (d(i) & 0xffL); i += 1 }
    top >>> 4
  }
}

object HashKernels {
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64Expr(Bridge.expression(tokens)))
  def simhash60Md5(tokens: Column): Column =
    Bridge.column(SimHash60Md5Expr(Bridge.expression(tokens)))
  def lshBucket(vec: Column, nbits: Int): Column =
    Bridge.column(LshBucketExpr(Bridge.expression(vec), nbits))
  def minhashSig(shingles: Column, k: Int): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(shingles), k))
}
