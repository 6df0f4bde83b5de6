package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Shannon entropy (bits) of a string's
  * code-point distribution — the classic character-diversity quality
  * signal for training-data filtering (gibberish and boilerplate sit at
  * the distribution's extremes; natural language clusters ~3.5–4.5 bits).
  *
  * Form: H = log2(n) − (Σ_c k_c·log2(k_c)) / n over the code-point
  * counts k_c — one division total, and the Σ term is the same spelling
  * the DuckDB oracle uses, maximizing float parity. The per-character
  * sum runs in ASCENDING CODE POINT order (counts live in a sorted
  * map), so the result is deterministic regardless of partitioning.
  * Empty string → 0.0; null → null.
  *
  * Why a custom expression (SURVEY §4.2 preference (b)): Spark has no
  * built-in per-row frequency map, and the HOF spelling —
  * `transform(array_distinct(split(text,'')), c -> size(filter(...)))`
  * — is O(distinct·n) per row with an interpreted lambda per element.
  * This is a single O(n) pass over the UTF8String's code points that
  * codegen reaches through one static call, keeping the projection
  * inside whole-stage codegen. Per-row, zero shuffle: the 100 TB shape.
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  private val Log2 = math.log(2.0)

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Double = {
    val str = s.toString
    val len = str.length
    if (len == 0) return 0.0
    // ASCII fast path (the overwhelmingly common case) with a sorted-map
    // fallback for supplementary/astral code points; both iterate counts
    // in ascending code-point order.
    val ascii = new Array[Long](128)
    var wide: java.util.TreeMap[Integer, Array[Long]] = null
    var i = 0
    var n = 0L
    while (i < len) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (wide == null) wide = new java.util.TreeMap[Integer, Array[Long]]()
        val cell = wide.computeIfAbsent(cp, _ => new Array[Long](1))
        cell(0) += 1L
      }
      n += 1L
      i += Character.charCount(cp)
    }
    var acc = 0.0
    var c = 0
    while (c < 128) {
      val k = ascii(c)
      if (k > 0L) acc += k.toDouble * (math.log(k.toDouble) / Log2)
      c += 1
    }
    if (wide != null) {
      val it = wide.values().iterator()
      while (it.hasNext) {
        val k = it.next()(0)
        acc += k.toDouble * (math.log(k.toDouble) / Log2)
      }
    }
    math.log(n.toDouble) / Log2 - acc / n.toDouble
  }

  /** Column-API entry point. */
  def charEntropy(c: Column): Column =
    Bridge.column(CharEntropy(Bridge.expression(c)))
}
