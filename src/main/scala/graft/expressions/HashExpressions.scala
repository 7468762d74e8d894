package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the sketch hot path (SURVEY.md §4's
  * "first justified Catalyst extensions").
  *
  * Why not `functions._` compositions: the signature math references its
  * input many times (numHashes × |shingles| md5 calls, `bits` bit-votes),
  * and nested higher-order-function trees both blow up optimizer time
  * (super-linear in tree size under a Generate) and fall out of whole-stage
  * codegen (lambda evaluation is interpreted). The earlier workaround —
  * explode + groupBy partial aggregation — is linear but pays a full
  * shuffle of exploded rows per signature. These expressions compute the
  * whole sketch in ONE `eval`/codegen call per row: no Generate, no
  * shuffle, and the generated code is a single static call that keeps the
  * surrounding projection inside whole-stage codegen.
  *
  * Hash-family semantics are IDENTICAL to the expression formulation (and
  * the DuckDB oracle): member i of the MinHash family is
  * md5(i || "|" || shingle) compared lexicographically on lowercase hex —
  * equal to unsigned byte-order on the raw digest, which is what we
  * compare; SimHash votes use the first 4 digest bytes of md5(token) as an
  * unsigned 32-bit value for fingerprints up to 32 bits (the oracle-pinned
  * form), and the first 8 digest bytes for wider fingerprints — a 32-bit
  * token hash cannot vote on 64 fingerprint bits.
  */
object HashFns {

  private val md5TL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  private def toHex(b: Array[Byte]): String = {
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(i * 2) = hexChars((b(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexChars(b(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** unsigned lexicographic byte compare (== hex-string compare). */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** MinHash signature: k lexicographic-min md5 hex strings. Null on empty
    * input (mirrors `array_min` over an empty transform). */
  def minhash(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val md = md5TL.get()
    val prefixes = Array.tabulate(k)(i => (i + "|").getBytes("UTF-8"))
    val mins = new Array[Array[Byte]](k)
    var j = 0
    while (j < n) {
      val s = shingles.getUTF8String(j).getBytes
      var i = 0
      while (i < k) {
        md.reset()
        md.update(prefixes(i))
        md.update(s)
        val d = md.digest()
        if (mins(i) == null || less(d, mins(i))) mins(i) = d
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(toHex(m))): Array[Any])
  }

  /** SimHash fingerprint: bit j of the md5(token)-derived hash votes ±1;
    * sign of the sum is bit j. 0 for empty input. The token hash is the
    * first 4 digest bytes for bits ≤ 32 (unchanged — the q27 oracle pins
    * this form) and the first 8 for wider fingerprints: bits 32..63 of a
    * 4-byte hash are constant 0, so every wide fingerprint would share
    * its top half and the banded self-join would silently degenerate. */
  def simhash(tokens: ArrayData, bits: Int): Long = {
    require(bits >= 1 && bits <= 64, s"simhash bits must be in 1..64, got $bits")
    val n = tokens.numElements()
    val votes = new Array[Int](bits)
    val md = md5TL.get()
    val wide = bits > 32
    var j = 0
    while (j < n) {
      md.reset()
      md.update(tokens.getUTF8String(j).getBytes)
      val d = md.digest()
      val h0 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val h =
        if (!wide) h0
        else (h0 << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      var i = 0
      while (i < bits) {
        if (((h >> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < bits) {
      if (votes(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }
}

/** `minhash_signature(shingles, k)` — array<string> of k md5-hex minima. */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    HashFns.minhash(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.HashFns.minhash($c, $numHashes);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
    code
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

/** `simhash64(tokens, bits)` — long fingerprint. */
case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    HashFns.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashFns.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** Column-API surface for the native expressions. */
object HashExpressions {
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignatureExpr(Bridge.expression(shingles), numHashes))

  def simhash64(tokens: Column, bits: Int): Column =
    Bridge.column(SimHashExpr(Bridge.expression(tokens), bits))
}
