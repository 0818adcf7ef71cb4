package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_normalize_ascii(text)` — the C4-style canonical form behind
  * `dedup_normalized`: lowercase, collapse every run of characters
  * outside `[a-z0-9]` to ONE space, trim. Semantically IDENTICAL to
  * `trim(regexp_replace(lower(text), '[^a-z0-9]+', ' '))` — the form the
  * DuckDB oracle evaluates — but computed in one pass:
  *
  *  - ASCII fast path: a single byte scan over the UTF8String (A-Z
  *    folded by +32, [a-z0-9] copied, anything else emits at most one
  *    pending space). No regex machine, no char decode — the common case
  *    for web/corpus text and ~10x cheaper than two regexp_replace runs.
  *  - Any non-ASCII byte falls back to the exact reference semantics:
  *    full `UTF8String.toLowerCase` (what Spark's `lower()` does — the
  *    same unicode case mapping DuckDB's `lower()` applies, including
  *    multi-char expansions like U+0130 → "i"+U+0307) followed by the
  *    same keep-or-separate scan per char. Needed because a handful of
  *    non-ASCII codepoints lowercase INTO [a-z] (e.g. U+212A KELVIN SIGN
  *    → 'k') — a byte-level strip would break oracle parity on them.
  *
  * CodegenFallback like the signature family: the per-row work is a
  * tight JIT'd loop; one virtual call per row is noise next to it. */
case class NormalizeAscii(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_normalize_ascii needs string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_ascii"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < n) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) {
      val out = new Array[Byte](n)
      var o = 0
      var pendingSpace = false
      i = 0
      while (i < n) {
        val b = bytes(i)
        val keep: Byte =
          if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) b
          else if (b >= 'A' && b <= 'Z') (b + 32).toByte
          else -1
        if (keep >= 0) {
          if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
          pendingSpace = false
          out(o) = keep; o += 1
        } else pendingSpace = true
        i += 1
      }
      UTF8String.fromBytes(out, 0, o)
    } else {
      // exact reference semantics for non-ASCII input: unicode lowercase
      // (lower()'s mapping), then the same keep-or-separate scan per char
      val lowered = s.toLowerCase.toString
      val sb = new java.lang.StringBuilder(lowered.length)
      var pendingSpace = false
      var j = 0
      while (j < lowered.length) {
        val c = lowered.charAt(j)
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
          if (pendingSpace && sb.length > 0) sb.append(' ')
          pendingSpace = false
          sb.append(c)
        } else pendingSpace = true
        j += 1
      }
      UTF8String.fromString(sb.toString)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeAscii =
    copy(child = newChild)
}
