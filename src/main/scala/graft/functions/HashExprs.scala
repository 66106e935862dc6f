package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for per-document hash signatures
  * (SURVEY.md §2.2-K dedup rows; companion of [[VectorExprs]]).
  *
  * Why: the round-2 signature stages were explode → hash → groupBy
  * shapes — one row per shingle/token through k aggregate buffers, i.e. a
  * full map-side explosion plus a shuffle JUST to compute a per-document
  * value. A signature is a pure function of one document's token array,
  * so it belongs in a single codegen'd loop per row: zero explode, zero
  * shuffle, and the LSH self-join upstream (which Spark evaluates twice,
  * once per join side) becomes two cheap map passes instead of two
  * explode+aggregate subplans.
  *
  * Hashing uses Spark's own xxhash64 primitives
  * (`o.a.s.sql.catalyst.expressions.XXH64`, the engine behind the
  * `xxhash64()` builtin), so signatures are deterministic across
  * sessions, partitionings, and replays — no driver-side RNG state. Each
  * element string is hashed ONCE (seed 42, like the builtin); the k
  * family members mix that 8-byte result with the permutation index j
  * via `XXH64.hashLong(h0, j)`.
  */
object HashExprs {

  /** k-permutation MinHash signature over the word n-gram shingles of a
    * token array, without ever materializing shingle strings:
    * each token is hashed ONCE (`th[i] = xxh64(token_i)`, null → the
    * deterministic `hashLong(0, 42)`), the shingle starting at i hashes
    * as the left-fold chain `h = hashLong(th[i+w], h)` over its n token
    * hashes, and `sig[j] = min over shingles of hashLong(h, j)`.
    *
    * Chaining replaces the `transform(sequence …, concat_ws(slice …))`
    * HOF pipeline (interpreted, re-allocating a string per shingle per
    * evaluation) with n-1 long-hashes per shingle inside one codegen'd
    * loop. `array_distinct` is unnecessary by construction: min over a
    * multiset equals min over its set. Tokens cannot contain the split
    * delimiter, so the chain is injective exactly where `concat_ws` was.
    *
    * n = 1 degenerates to element-wise MinHash (each element is its own
    * shingle). Fewer than n tokens → zero shingles → Long.MaxValue in
    * every slot, a deterministic sentinel that downstream band-bucket
    * hashing keys on consistently. */
  case class MinHashSig(child: Expression, n: Int, k: Int) extends UnaryExpression {
    require(n > 0 && k > 0)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<string>, got ${t.catalogString}")
    }
    override protected def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val nTok = a.numElements()
      val th = new Array[Long](nTok)
      var i = 0
      while (i < nTok) {
        th(i) = if (a.isNullAt(i)) XXH64.hashLong(0L, 42L) else {
          val s = a.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
        i += 1
      }
      val mins = Array.fill(k)(Long.MaxValue)
      i = 0
      while (i <= nTok - n) {
        var h = th(i)
        var w = 1
        while (w < n) { h = XXH64.hashLong(th(i + w), h); w += 1 }
        var j = 0
        while (j < k) {
          val m = XXH64.hashLong(h, j)
          if (m < mins(j)) mins(j) = m
          j += 1
        }
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(mins)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val xxh = classOf[XXH64].getName
        val uad = classOf[UnsafeArrayData].getName
        val (nt, th, mins, i, i2, w, j, s, h, m) =
          (ctx.freshName("nTok"), ctx.freshName("th"), ctx.freshName("mins"),
            ctx.freshName("i"), ctx.freshName("i2"), ctx.freshName("w"),
            ctx.freshName("j"), ctx.freshName("s"), ctx.freshName("h"),
            ctx.freshName("m"))
        s"""
           |int $nt = $c.numElements();
           |long[] $th = new long[$nt];
           |for (int $i = 0; $i < $nt; $i++) {
           |  if ($c.isNullAt($i)) {
           |    $th[$i] = $xxh.hashLong(0L, 42L);
           |  } else {
           |    UTF8String $s = $c.getUTF8String($i);
           |    $th[$i] = $xxh.hashUnsafeBytes($s.getBaseObject(),
           |      $s.getBaseOffset(), $s.numBytes(), 42L);
           |  }
           |}
           |long[] $mins = new long[$k];
           |java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |for (int $i2 = 0; $i2 <= $nt - $n; $i2++) {
           |  long $h = $th[$i2];
           |  for (int $w = 1; $w < $n; $w++) {
           |    $h = $xxh.hashLong($th[$i2 + $w], $h);
           |  }
           |  for (int $j = 0; $j < $k; $j++) {
           |    long $m = $xxh.hashLong($h, (long) $j);
           |    if ($m < $mins[$j]) $mins[$j] = $m;
           |  }
           |}
           |${ev.value} = $uad.fromPrimitiveArray($mins);
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** 64-bit SimHash of a string array: every element votes ±1 on each bit
    * position according to its xxhash64 bits; signature bit b is set iff
    * the vote sum is positive. Empty array → 0L. */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects array<string>, got ${t.catalogString}")
    }
    override protected def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      var i = 0
      while (i < a.numElements()) {
        if (!a.isNullAt(i)) {
          val s = a.getUTF8String(i)
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
            s.numBytes, 42L)
          var b = 0
          while (b < 64) {
            votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (votes(b) > 0) sig |= (1L << b)
        b += 1
      }
      sig
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val xxh = classOf[XXH64].getName
        val (votes, i, b, b2, s, h) =
          (ctx.freshName("votes"), ctx.freshName("i"), ctx.freshName("b"),
            ctx.freshName("b2"), ctx.freshName("s"), ctx.freshName("h"))
        s"""
           |int[] $votes = new int[64];
           |for (int $i = 0; $i < $c.numElements(); $i++) {
           |  if (!$c.isNullAt($i)) {
           |    UTF8String $s = $c.getUTF8String($i);
           |    long $h = $xxh.hashUnsafeBytes($s.getBaseObject(),
           |      $s.getBaseOffset(), $s.numBytes(), 42L);
           |    for (int $b = 0; $b < 64; $b++) {
           |      $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
           |    }
           |  }
           |}
           |${ev.value} = 0L;
           |for (int $b2 = 0; $b2 < 64; $b2++) {
           |  if ($votes[$b2] > 0) ${ev.value} |= (1L << $b2);
           |}
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  // Column-level entry points.
  def minHashSig(tokens: Column, n: Int, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(tokens), n, k))
  def simHash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
