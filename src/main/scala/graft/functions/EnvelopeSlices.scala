package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass byte-level splitter for the Debezium envelope.
  *
  * A change event is `{"schema": {...}, "payload": {"before": ..,
  * "after": .., "source": {..}, "op": "..", "ts_ms": ..}}` where the
  * `schema` header is ~70% of the bytes. `from_json` must still LEX
  * every skipped byte through Jackson's tokenizer (strings, escapes,
  * numbers — measured 86% of total decode cost on 2.5 KB events); this
  * expression instead walks the bytes once with a structural scanner
  * (escape-aware string skip + brace counting, no token objects, no
  * allocation beyond zero-copy `UTF8String` slices) and returns:
  *
  *   struct(schema_json, before_json, after_json, op, connector)
  *
  * The row-image slices then feed `from_json` with the payload-only
  * schema, so Jackson parses ~300 B instead of lexing 2.5 KB. JSON
  * `null` images come back as NULL slices (matching `from_json`'s null
  * struct for them), and any structurally malformed envelope returns a
  * null row — the decoder's validation layer, not the scanner, decides
  * what that means. Scalar fields (`op`, `connector`) are decoded
  * in-place including escape sequences.
  *
  * `wantSchema=false` skips the schema header at byte speed;
  * `wantBefore=false` does the same for the before image (the
  * non-strict fast path). ASCII structural bytes can't occur inside
  * UTF-8 multi-byte sequences, so the byte-level walk is UTF-8-safe.
  */
case class EnvelopeSlices(child: Expression, wantSchema: Boolean, wantBefore: Boolean)
  extends UnaryExpression {

  override def dataType: DataType = EnvelopeSlices.sliceType
  override def nullable: Boolean = true
  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType || child.dataType == StringType,
      "envelope_slices requires a binary or string column")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input match {
      case b: Array[Byte] => b
      case s: UTF8String => s.getBytes
    }
    EnvelopeSlices.parse(bytes, wantSchema, wantBefore)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val row = ctx.freshName("envSlices")
    val toBytes =
      if (child.dataType == BinaryType) (c: String) => c
      else (c: String) => s"$c.getBytes()"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $row =
         |  graft.functions.EnvelopeSlices.parse(${toBytes(c)}, $wantSchema, $wantBefore);
         |if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): EnvelopeSlices =
    copy(child = newChild)
}

object EnvelopeSlices {

  val sliceType: StructType = StructType(Seq(
    StructField("schema_json", StringType, nullable = true),
    StructField("before_json", StringType, nullable = true),
    StructField("after_json", StringType, nullable = true),
    StructField("op", StringType, nullable = true),
    StructField("connector", StringType, nullable = true)))

  // scanner outcome markers (positions are >= 0)
  private final val Bad = -1

  private def skipWs(b: Array[Byte], p0: Int): Int = {
    var p = p0
    while (p < b.length && (b(p) == ' ' || b(p) == '\t' || b(p) == '\n' || b(p) == '\r')) p += 1
    p
  }

  /** Skip a JSON string starting AT the opening quote; returns the index
    * just past the closing quote, or Bad. */
  private def skipString(b: Array[Byte], p0: Int): Int = {
    var p = p0 + 1
    while (p < b.length) {
      val c = b(p)
      if (c == '\\') p += 2
      else if (c == '"') return p + 1
      else p += 1
    }
    Bad
  }

  /** Skip any JSON value starting at p0 (after whitespace); returns the
    * index just past the value, or Bad. */
  private def skipValue(b: Array[Byte], p0: Int): Int = {
    val p = skipWs(b, p0)
    if (p >= b.length) return Bad
    b(p) match {
      case '"' => skipString(b, p)
      case '{' | '[' =>
        var depth = 0
        var q = p
        while (q < b.length) {
          val c = b(q)
          if (c == '"') {
            q = skipString(b, q)
            if (q == Bad) return Bad
          } else {
            if (c == '{' || c == '[') depth += 1
            else if (c == '}' || c == ']') { depth -= 1; if (depth == 0) return q + 1 }
            q += 1
          }
        }
        Bad
      case _ => // scalar: run to the next structural byte
        var q = p
        while (q < b.length && b(q) != ',' && b(q) != '}' && b(q) != ']' &&
          b(q) != ' ' && b(q) != '\t' && b(q) != '\n' && b(q) != '\r') q += 1
        if (q == p) Bad else q
    }
  }

  /** True if the value slice [from, to) is the literal `null`. */
  private def isNullLit(b: Array[Byte], from: Int, to: Int): Boolean =
    to - from == 4 && b(from) == 'n' && b(from + 1) == 'u' &&
      b(from + 2) == 'l' && b(from + 3) == 'l'

  /** Decode the JSON string whose opening quote is at p0 (escapes incl.
    * \uXXXX); null for non-string or malformed. Only used for the short
    * scalar fields (op, connector). */
  private def decodeString(b: Array[Byte], p0: Int, end: Int): UTF8String = {
    if (p0 >= end || b(p0) != '"') {
      // non-string scalar (number/bool): return the raw slice
      return if (isNullLit(b, p0, end)) null
      else UTF8String.fromBytes(b, p0, end - p0)
    }
    // fast path: no escapes → zero-copy slice between the quotes
    var p = p0 + 1
    var hasEscape = false
    while (p < end - 1 && !hasEscape) {
      if (b(p) == '\\') hasEscape = true else p += 1
    }
    if (!hasEscape) return UTF8String.fromBytes(b, p0 + 1, end - p0 - 2)
    val sb = new java.lang.StringBuilder(end - p0)
    sb.append(new String(b, p0 + 1, p - p0 - 1, java.nio.charset.StandardCharsets.UTF_8))
    while (p < end - 1) {
      if (b(p) == '\\' && p + 1 < end - 1) {
        b(p + 1) match {
          case '"' => sb.append('"'); p += 2
          case '\\' => sb.append('\\'); p += 2
          case '/' => sb.append('/'); p += 2
          case 'b' => sb.append('\b'); p += 2
          case 'f' => sb.append('\f'); p += 2
          case 'n' => sb.append('\n'); p += 2
          case 'r' => sb.append('\r'); p += 2
          case 't' => sb.append('\t'); p += 2
          case 'u' if p + 6 < end => // 4 hex digits must sit before the quote
            val cp = hex4(b, p + 2)
            if (cp < 0) return null // invalid hex: classify, don't throw
            sb.append(cp.toChar); p += 6
          case _ => return null // invalid escape: let the validator see null
        }
      } else {
        // copy the run up to the next escape in one step
        var q = p
        while (q < end - 1 && b(q) != '\\') q += 1
        sb.append(new String(b, p, q - p, java.nio.charset.StandardCharsets.UTF_8))
        p = q
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** 4 hex digits at p as a code point; -1 if any byte isn't hex. */
  private def hex4(b: Array[Byte], p: Int): Int = {
    var v = 0
    var i = p
    while (i < p + 4) {
      val c = b(i)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else return -1
      v = (v << 4) | d
      i += 1
    }
    v
  }

  /** Compare the key string at [kFrom, kTo) (exclusive of quotes) to s.
    * Keys carrying escapes (legal JSON like "payload") take the slow
    * unescape path so they match exactly where Jackson would — raw-byte
    * comparison would silently skip them. */
  private def keyIs(b: Array[Byte], kFrom: Int, kTo: Int, s: String): Boolean = {
    var i = kFrom
    while (i < kTo) {
      if (b(i) == '\\') {
        val dec = decodeString(b, kFrom - 1, kTo + 1)
        return dec != null && dec.toString == s
      }
      i += 1
    }
    if (kTo - kFrom != s.length) return false
    i = 0
    while (i < s.length) { if (b(kFrom + i) != s.charAt(i)) return false; i += 1 }
    true
  }

  /** Walk the object whose '{' is at p0, invoking onField for each key;
    * onField receives (keyFrom, keyTo, valueFrom) and returns the index
    * just past the consumed value (or Bad to abort). Returns the index
    * just past the closing '}', or Bad. */
  private def walkObject(b: Array[Byte], p0: Int,
      onField: (Int, Int, Int) => Int): Int = {
    var p = skipWs(b, p0)
    if (p >= b.length || b(p) != '{') return Bad
    p = skipWs(b, p + 1)
    if (p < b.length && b(p) == '}') return p + 1
    while (p < b.length) {
      if (b(p) != '"') return Bad
      val kFrom = p + 1
      val pastKey = skipString(b, p)
      if (pastKey == Bad) return Bad
      val kTo = pastKey - 1
      p = skipWs(b, pastKey)
      if (p >= b.length || b(p) != ':') return Bad
      p = skipWs(b, p + 1)
      p = onField(kFrom, kTo, p)
      if (p == Bad) return Bad
      p = skipWs(b, p)
      if (p >= b.length) return Bad
      if (b(p) == '}') return p + 1
      if (b(p) != ',') return Bad
      p = skipWs(b, p + 1)
    }
    Bad
  }

  /** Parse one envelope; null for structurally malformed input. */
  def parse(b: Array[Byte], wantSchema: Boolean, wantBefore: Boolean): InternalRow = {
    if (b == null) return null
    var schemaJson: UTF8String = null
    var beforeJson: UTF8String = null
    var afterJson: UTF8String = null
    var op: UTF8String = null
    var connector: UTF8String = null

    def slice(from: Int, to: Int): UTF8String =
      if (isNullLit(b, from, to)) null else UTF8String.fromBytes(b, from, to - from)

    val sourceWalk = (kF: Int, kT: Int, vFrom: Int) => {
      val past = skipValue(b, vFrom)
      if (past != Bad && keyIs(b, kF, kT, "connector"))
        connector = decodeString(b, vFrom, past)
      past
    }
    val payloadWalk = (kF: Int, kT: Int, vFrom: Int) => {
      if (keyIs(b, kF, kT, "source")) {
        // Jackson last-wins: a later `source` value (object or not)
        // replaces the whole source, so the prior connector never
        // survives it — reset before (re-)extracting
        connector = null
        if (vFrom < b.length && b(vFrom) == '{')
          walkObject(b, vFrom, sourceWalk) // extracts connector; Bad propagates
        else skipValue(b, vFrom)
      } else {
        val past = skipValue(b, vFrom)
        if (past != Bad) {
          if (keyIs(b, kF, kT, "after")) afterJson = slice(vFrom, past)
          else if (wantBefore && keyIs(b, kF, kT, "before")) beforeJson = slice(vFrom, past)
          else if (keyIs(b, kF, kT, "op")) op = decodeString(b, vFrom, past)
        }
        past
      }
    }
    val topWalk = (kF: Int, kT: Int, vFrom: Int) => {
      if (keyIs(b, kF, kT, "payload")) {
        // duplicate top-level payload keys: last-wins, like Jackson
        beforeJson = null; afterJson = null; op = null; connector = null
        walkObject(b, vFrom, payloadWalk)
      } else {
        val past = skipValue(b, vFrom)
        if (past != Bad && wantSchema && keyIs(b, kF, kT, "schema"))
          schemaJson = slice(vFrom, past)
        past
      }
    }
    if (walkObject(b, 0, topWalk) == Bad) return null
    new GenericInternalRow(Array[Any](schemaJson, beforeJson, afterJson, op, connector))
  }

  def envelopeSlices(value: Column, wantSchema: Boolean, wantBefore: Boolean): Column =
    toColumn(EnvelopeSlices(toExpression(value), wantSchema, wantBefore))

  /** Mongo-envelope fast path: `payload.after` / `payload.patch` are
    * JSON STRING values carrying extended-JSON documents. Returns
    * struct(op, after, patch) with the strings fully unescaped — the
    * schema header (the bulk of the bytes) never reaches Jackson.
    * Returns null when the envelope is structurally malformed, `op` is
    * missing or not a JSON string, or after/patch hold non-string
    * non-null values: the caller falls back to the full Jackson map
    * path so those envelopes keep their legacy errors. JSON-null
    * after/patch read as absent.
    *
    * Two DELIBERATE leniencies vs the legacy whole-envelope parse:
    * (a) skipped regions (schema header, source, unknown keys) are
    * validated structurally, not token-by-token — garbage scalars
    * there no longer fail the batch (the fields the apply actually
    * consumes are still fully validated, and the document strings
    * still go through Jackson); (b) unpaired-surrogate `\\uXXXX`
    * escapes at envelope level normalize to U+FFFD through UTF8String
    * (invalid Unicode the legacy Java-String path happened to carry
    * through). */
  def parseMongo(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    var op: UTF8String = null
    var after: UTF8String = null
    var patch: UTF8String = null
    var bad = false

    def strVal(vFrom: Int, past: Int): UTF8String =
      if (b(vFrom) == '"') {
        val s = decodeString(b, vFrom, past)
        if (s == null) bad = true // invalid escapes → let Jackson report
        s
      } else if (isNullLit(b, vFrom, past)) null
      else { bad = true; null }

    val payloadWalk = (kF: Int, kT: Int, vFrom: Int) => {
      val past = skipValue(b, vFrom)
      if (past != Bad) {
        if (keyIs(b, kF, kT, "after")) after = strVal(vFrom, past)
        else if (keyIs(b, kF, kT, "patch")) patch = strVal(vFrom, past)
        else if (keyIs(b, kF, kT, "op")) op = strVal(vFrom, past) // non-string op → fallback (legacy CCE)
      }
      past
    }
    val topWalk = (kF: Int, kT: Int, vFrom: Int) =>
      if (keyIs(b, kF, kT, "payload")) {
        // duplicate top-level payload keys: Jackson keeps the LAST map —
        // reset so fields never merge across payload objects
        op = null; after = null; patch = null
        walkObject(b, vFrom, payloadWalk)
      } else skipValue(b, vFrom)
    if (walkObject(b, 0, topWalk) == Bad || bad || op == null) return null
    new GenericInternalRow(Array[Any](op, after, patch))
  }
}
