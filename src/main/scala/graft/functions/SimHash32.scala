package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** d03's 32-bit SimHash in one pass: normalize → split → [[CharFold]]
  * (seed 7) per token → per-bit ±1 majority vote — bit-for-bit the SQL
  * chain
  *
  * {{{
  *   w  = split(lower(trim(regexp_replace(text, '\s+', ' '))), ' ')
  *   hs = transform(w, x -> char_fold(x, 7))
  *   bit j set iff sum over hs of (±1 by bit j) > 0
  * }}}
  *
  * (equivalence pinned per-document against the literal SQL chain by
  * CorpusFeaturesSpec). WHY: the SQL spelling nests a 32-step lambda
  * fold around a per-token lambda fold — 32·n_tokens interpreted
  * closures per document, outside codegen CSE; measured 7.5 s at 64×
  * docs where this single loop is ~1 JVM pass. Votes accumulate in a
  * 32-int array, no per-bit re-walk. Row-wise — the 100 TB shape
  * (shuffle-free fingerprinting) is unchanged. */
case class SimHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  private final val Mask = 0xFFFFFFFFL

  override protected def nullSafeEval(input: Any): Any = {
    val collapsed =
      input.asInstanceOf[UTF8String].toString.replaceAll("\\s+", " ")
    var st = 0
    var en = collapsed.length
    while (st < en && collapsed.charAt(st) == ' ') st += 1
    while (en > st && collapsed.charAt(en - 1) == ' ') en -= 1
    val norm = UTF8String.fromString(collapsed.substring(st, en))
      .toLowerCase.toString

    val votes = new Array[Int](32)
    // split(norm, ' ') with limit -1 semantics, folded in place: walk the
    // tokens without materializing the array
    var tokStart = 0
    var i = 0
    val n = norm.length
    while (i <= n) {
      if (i == n || norm.charAt(i) == ' ') {
        // token = norm[tokStart, i): CharFold(seed 7) over UTF-16 units
        var h = 7L
        var k = tokStart
        while (k < i) {
          h = (h * 31L + norm.charAt(k).toLong) & Mask
          k += 1
        }
        var j = 0
        while (j < 32) {
          if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
        tokStart = i + 1
      }
      i += 1
    }

    var sig = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}
