package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native corpus text normalization — the canonicalization pass every
  * pre-training pipeline runs before dedup/filtering so that byte-level
  * variation ("Café", "Café", "CAFE") cannot defeat content-level
  * equality:
  *
  *   1. Unicode NFC composition (é as one code point, however it arrived),
  *   2. diacritic stripping: NFD decomposition with combining marks
  *      (category Mn) dropped, recomposed NFC,
  *   3. root-locale lowercasing (locale-independent — the Turkish-İ trap
  *      of default-locale lowercase would make results machine-dependent),
  *   4. whitespace canonicalization: runs of { space TAB LF CR FF }
  *      collapse to one space, leading/trailing trimmed. The set is spelled
  *      explicitly because regex `\s` differs between engines (Java adds
  *      vertical tab; RE2 does not) — a DuckDB oracle matches with
  *      `[\t\n\f\r ]+`.
  *
  * One fused pass per row inside whole-stage codegen; pure function of the
  * input, so the result is deterministic and cross-engine checkable
  * (DuckDB: `trim(regexp_replace(lower(strip_accents(nfc_normalize(t))),
  * '[\t\n\f\r ]+', ' ', 'g'))`).
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_normtext"
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_normtext requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    TextNorm.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNorm.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** The normalization kernel (static so generated code can call it). */
object TextNorm {

  private def isCollapsible(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r' || ch == '\f'

  def normalize(text: UTF8String): UTF8String = {
    val nfc = Normalizer.normalize(text.toString, Normalizer.Form.NFC)
    // strip diacritics: decompose, drop non-spacing marks, recompose —
    // 'é' → 'e' + U+0301 → 'e'. Non-Latin scripts lose only their
    // combining marks, base letters pass through untouched.
    val nfd = Normalizer.normalize(nfc, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    val lower = Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
    // collapse whitespace runs, trim ends — single builder pass
    val out = new java.lang.StringBuilder(lower.length)
    var pendingSpace = false
    var j = 0
    while (j < lower.length) {
      val ch = lower.charAt(j)
      if (isCollapsible(ch)) pendingSpace = out.length > 0
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(ch)
      }
      j += 1
    }
    UTF8String.fromString(out.toString)
  }
}
