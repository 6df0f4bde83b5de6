package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash band-signature computation: given the per-element md5
  * hex strings of a document's token/shingle set, produce the `bands`
  * LSH band signatures directly — for slice i of k, the minimum 5-char
  * substring `hex[5i, 5i+5)`, then per band the md5 hex of the
  * concatenated r slice-minima.
  *
  * Replaces the `aggregate` higher-order fold with a k-field struct
  * accumulator ([[graft.ops.Dedup.candidatePairs]]'s round-3 spelling):
  * that fold evaluates interpreted lambdas and allocates a struct per
  * element, on the hottest path of five declared queries (MinHash LSH,
  * shingle MinHash, CC clustering, the composed dedup pipeline, edit
  * distance). Bit-identical by construction: same "g" sentinel (sorts
  * above every hex char, so any element wins), same 1-based
  * `substr(1+5i, 5)` slices, same lexicographic ASCII comparison as
  * `least`, same md5-of-UTF8-concat as `md5(concat(...) cast binary)` —
  * and the oracle replays the same arithmetic in SQL, so CORRECTNESS
  * gates the swap.
  *
  * CodegenFallback: the surrounding plan segment sits at a Generate
  * (explode) boundary where whole-stage codegen already splits; a single
  * fused JVM eval removes the per-element interpretation overhead, which
  * is what dominates.
  */
case class MinhashBandSigs(child: Expression, k: Int, r: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(k > 0 && r > 0 && k % r == 0, s"k=$k must be a positive multiple of r=$r")
  private val bands = k / r

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_band_sigs"
  // nullable even over a non-null child: empty/all-null element sets
  // return NULL (see nullSafeEval) rather than a sentinel-only signature
  override def nullable: Boolean = true

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(2 * i) = hexDigits(b >>> 4)
      out(2 * i + 1) = hexDigits(b & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)("g")   // sorts above every hex digit — same sentinel as the fold
    var j = 0
    var seen = 0
    while (j < n) {
      // null elements are skipped — the `least`-based fold this replaces
      // ignored nulls (least ignores null operands), and md5(null) = null
      // is exactly what a nullable input column produces
      if (!arr.isNullAt(j)) {
        seen += 1
        val h = arr.getUTF8String(j).toString
        var i = 0
        while (i < k) {
          val s = h.substring(5 * i, 5 * i + 5)
          if (s.compareTo(mins(i)) < 0) mins(i) = s
          i += 1
        }
      }
      j += 1
    }
    // Empty/all-null element set → NULL, not the sentinel-only signature:
    // all callers guarantee non-empty toks, but a future caller violating
    // that contract would otherwise silently hash EVERY empty doc into one
    // identical bucket per band — a degenerate mega-bucket. NULL makes the
    // violation drop out of banding (posexplode skips null arrays) instead.
    if (seen == 0) return null
    val md = MinhashBandSigs.localDigest.get()
    val res = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder(5 * r)
      var q = 0
      while (q < r) { sb.append(mins(b * r + q)); q += 1 }
      md.reset()
      res(b) = UTF8String.fromString(
        hex(md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))))
      b += 1
    }
    new GenericArrayData(res)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashBandSigs =
    copy(child = newChild)
}

object MinhashBandSigs {
  /** One MessageDigest per task thread: `getInstance` per row is a JCA
    * provider lookup + allocation on the hottest path of five declared
    * queries; MessageDigest is not thread-safe, so the cache is a
    * ThreadLocal (reset() before each use). */
  private[functions] val localDigest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Column-API entry point: `hashes` is the array of per-element md5 hex
    * strings; returns the `k/r` band-signature hex strings in band order. */
  def bandSigs(hashes: Column, k: Int, r: Int): Column =
    Bridge.column(MinhashBandSigs(Bridge.expression(hashes), k, r))
}
