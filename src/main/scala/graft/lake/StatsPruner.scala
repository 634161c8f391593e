package graft.lake

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** File-level min/max + null-count predicate evaluation for manifest-stats
  * data skipping (the Iceberg `evaluators` idea re-done minimally).
  *
  * `mayMatch` answers "could ANY row within these column statistics satisfy
  * the predicate?" — false prunes the file, anything uncertain returns
  * true (skipping is an optimization, never a filter: the surviving
  * scan re-applies the full predicate). Supported leaves: =, <=>, <, <=,
  * >, >=, !=, IN, STARTSWITH between one column and literals, IS NULL /
  * IS NOT NULL, composed with AND/OR/NOT (NOT is pushed inward: over
  * AND/OR by De Morgan and over the comparisons by the filter-equivalent
  * complement — NOT(a > b) keeps exactly the a <= b rows because a
  * NULL comparison is dropped by the filter either way). Everything else
  * (functions, unsafe casts) is conservatively true.
  *
  * Casts are stripped ONLY when the declared column type up-casts
  * losslessly to the target (`Cast.canUpCast`) — a narrowing cast
  * changes values (cast(d as int) = 6 matches a file with double stats
  * [6.2, 6.9]) so it must never prune; when the column type is unknown
  * the cast is treated as opaque.
  *
  * Canonical stats values are Long (integral / date days / timestamp
  * micros), Double (float family) or String; comparisons widen
  * Long↔Double through BigDecimal so 2^63-scale longs don't lose
  * precision. Strings compare in unsigned UTF-8 BYTE order (UTF8String)
  * — the ordering parquet footer min/max are computed in and the one
  * Spark's own string comparisons use; java.lang.String's UTF-16 order
  * disagrees for supplementary-plane vs U+E000..U+FFFF values and could
  * prune a file whose rows match under Spark's ordering.
  */
object StatsPruner {

  /** col -> (min, max) in canonical form; None = unknown (never prune). */
  type Stats = String => Option[(Any, Any)]

  /** Full per-file statistics view. `range`/`nulls` return None for
    * unknown; `rowCount` None when unknown; `colType` is the DECLARED
    * schema type of a column (cast-safety check) — None treats any cast
    * over that column as opaque. */
  case class FileStats(
      range: Stats,
      nulls: String => Option[Long] = _ => None,
      rowCount: Option[Long] = None,
      colType: String => Option[DataType] = _ => None)

  /** Ranges-only view (no null counts, casts opaque). */
  def mayMatch(e: Expression, stats: Stats): Boolean =
    mayMatch(e, FileStats(stats))

  def mayMatch(e: Expression, fs: FileStats): Boolean = eval(norm(e), fs)

  /** Column-DSL predicates arrive as analyzer-deferred
    * `UnresolvedFunction` nodes (Spark 4 ColumnNode trees); map the
    * comparison/boolean names onto typed catalyst nodes so one matcher
    * serves both DSL- and parser-built predicates. Unknown names stay
    * as-is (→ conservatively true). */
  private def norm(e: Expression): Expression = e match {
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
      val as = f.arguments.map(norm)
      (f.nameParts.last.toLowerCase, as) match {
        case ("and", Seq(a, b)) => And(a, b)
        case ("or", Seq(a, b)) => Or(a, b)
        case ("not" | "!", Seq(a)) => Not(a)
        case (">", Seq(a, b)) => GreaterThan(a, b)
        case (">=", Seq(a, b)) => GreaterThanOrEqual(a, b)
        case ("<", Seq(a, b)) => LessThan(a, b)
        case ("<=", Seq(a, b)) => LessThanOrEqual(a, b)
        case ("=" | "==" | "equalto", Seq(a, b)) => EqualTo(a, b)
        case ("!=" | "<>", Seq(a, b)) => Not(EqualTo(a, b))
        case ("<=>", Seq(a, b)) => EqualNullSafe(a, b)
        case ("isnull", Seq(a)) => IsNull(a)
        case ("isnotnull", Seq(a)) => IsNotNull(a)
        case ("in", a +: rest) if rest.nonEmpty => In(a, rest)
        case ("startswith", Seq(a, b)) => StartsWith(a, b)
        case _ => e
      }
    case _ => e.mapChildren(norm)
  }

  /** Push NOT inward. Sound as FILTERS (not as expressions): a row where
    * the comparison is NULL is dropped by both the original and the
    * complement, so NOT(a > b) and a <= b keep the same rows. */
  private def pushNot(e: Expression): Expression = e match {
    case Not(Not(x)) => pushNot(x)
    case Not(And(a, b)) => Or(pushNot(Not(a)), pushNot(Not(b)))
    case Not(Or(a, b)) => And(pushNot(Not(a)), pushNot(Not(b)))
    case Not(GreaterThan(a, b)) => LessThanOrEqual(a, b)
    case Not(GreaterThanOrEqual(a, b)) => LessThan(a, b)
    case Not(LessThan(a, b)) => GreaterThanOrEqual(a, b)
    case Not(LessThanOrEqual(a, b)) => GreaterThan(a, b)
    case Not(IsNull(a)) => IsNotNull(a)
    case Not(IsNotNull(a)) => IsNull(a)
    case other => other // Not(=), Not(IN), ... evaluated directly
  }

  private def eval(e0: Expression, fs: FileStats): Boolean = pushNot(e0) match {
    case And(l, r) => eval(l, fs) && eval(r, fs)
    case Or(l, r) => eval(l, fs) || eval(r, fs)
    case EqualTo(a, b) => containsLit(a, b, fs) && containsLit(b, a, fs)
    case EqualNullSafe(a, b) => (literalOfNullable(b), attrOf(a, fs)) match {
      // col <=> NULL is exactly IS NULL (and symmetric)
      case (Some(None), Some(n)) => mayBeNull(n, fs)
      case _ => (literalOfNullable(a), attrOf(b, fs)) match {
        case (Some(None), Some(n)) => mayBeNull(n, fs)
        case _ => containsLit(a, b, fs) && containsLit(b, a, fs)
      }
    }
    case LessThan(a, b) => ordered(a, b, fs, strict = true)
    case LessThanOrEqual(a, b) => ordered(a, b, fs, strict = false)
    case GreaterThan(a, b) => ordered(b, a, fs, strict = true)
    case GreaterThanOrEqual(a, b) => ordered(b, a, fs, strict = false)
    case IsNull(a) => attrOf(a, fs).forall(n => mayBeNull(n, fs))
    case IsNotNull(a) => attrOf(a, fs).forall(n => mayBeNonNull(n, fs))
    case In(a, list) => (attrOf(a, fs), literals(list)) match {
      case (Some(n), Some(vs)) => fs.range(n) match {
        case Some((mn, mx)) => vs.exists(v => le(mn, v) && le(v, mx))
        case None => mayBeNonNull(n, fs) // all-null file: IN never matches
      }
      case _ => true
    }
    case Not(EqualTo(a, b)) =>
      // may some non-null value ≠ v: false only when every non-null
      // value equals v (min == max == v) or the file has no non-null rows
      (attrOf(a, fs), literalOf(b)) match {
        case (Some(n), Some(v)) => mayNotEqual(n, v, fs)
        case _ => (attrOf(b, fs), literalOf(a)) match {
          case (Some(n), Some(v)) => mayNotEqual(n, v, fs)
          case _ => true
        }
      }
    case StartsWith(a, Literal(p: UTF8String, StringType)) => attrOf(a, fs) match {
      case Some(n) => fs.range(n) match {
        case Some((mn: String, mx: String)) =>
          // compare pfx-length BYTE prefixes in unsigned UTF-8 order:
          // if some s in [mn, mx] starts with pfx then trunc(mn) <= pfx
          // and pfx <= trunc(mx) (prefix truncation is monotone)
          val pb = p.getBytes
          def trunc(s: String) = {
            val b = UTF8String.fromString(s).getBytes
            if (b.length <= pb.length) b else java.util.Arrays.copyOf(b, pb.length)
          }
          byteLe(trunc(mn), pb) && byteLe(pb, trunc(mx))
        case _ => mayBeNonNull(n, fs)
      }
      case None => true
    }
    case _ => true
  }

  /** Unsigned lexicographic byte compare (the parquet/UTF8String order). */
  private def byteLe(a: Array[Byte], b: Array[Byte]): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    a.length <= b.length
  }

  private def mayBeNull(n: String, fs: FileStats): Boolean =
    fs.nulls(n) match { case Some(0L) => false; case _ => true }

  private def mayBeNonNull(n: String, fs: FileStats): Boolean =
    (fs.nulls(n), fs.rowCount) match {
      case (Some(nc), Some(rc)) => nc < rc
      case _ => true
    }

  private def mayNotEqual(n: String, v: Any, fs: FileStats): Boolean = {
    if (!mayBeNonNull(n, fs)) return false
    fs.range(n) match {
      case Some((mn, mx)) => !(cmp(mn, v).contains(0) && cmp(mx, v).contains(0))
      case None => true
    }
  }

  /** may a == b hold when a is a known column and b a literal:
    * containment of the literal in [min, max]. Any other shape → true. */
  private def containsLit(a: Expression, b: Expression, fs: FileStats): Boolean =
    (attrOf(a, fs), literalOf(b)) match {
      case (Some(n), Some(v)) => fs.range(n) match {
        case Some((mn, mx)) => le(mn, v) && le(v, mx)
        case None => mayBeNonNull(n, fs) // all-null file: = never matches
      }
      case _ => true
    }

  /** may (a < b) / (a <= b) hold. */
  private def ordered(a: Expression, b: Expression, fs: FileStats,
      strict: Boolean): Boolean = {
    (attrOf(a, fs), literalOf(b), attrOf(b, fs), literalOf(a)) match {
      case (Some(n), Some(v), _, _) => fs.range(n) match {
        case Some((mn, _)) => if (strict) ltv(mn, v) else le(mn, v)
        case None => mayBeNonNull(n, fs)
      }
      case (_, _, Some(n), Some(v)) => fs.range(n) match {
        case Some((_, mx)) => if (strict) ltv(v, mx) else le(v, mx)
        case None => mayBeNonNull(n, fs)
      }
      case _ => true
    }
  }

  private def attrOf(e: Expression, fs: FileStats): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case u: UnresolvedAttribute => Some(u.name)
    // strip ONLY provably-lossless widening casts; a narrowing cast
    // changes values and must be opaque (never prunes)
    case Cast(inner, to, _, _) =>
      attrOf(inner, fs).filter(n =>
        fs.colType(n).exists(from => Cast.canUpCast(from, to)))
    case _ => None
  }

  /** Literal in canonical stats form (Long / Double / String). */
  private def literalOf(e: Expression): Option[Any] =
    literalOfNullable(e).flatten

  /** Some(None) = an explicit NULL literal; None = not a literal. */
  private def literalOfNullable(e: Expression): Option[Option[Any]] = e match {
    case Literal(null, _) => Some(None)
    case Literal(v, dt) => canon(v, dt)
    // parser-built predicates carry implicit type-promotion casts over
    // literals (`id > 5000000` → Cast(5000000, bigint)); fold any
    // resolved deterministic constant so it still prunes
    case _ if e.resolved && e.deterministic && e.foldable =>
      try {
        val v = e.eval(null)
        if (v == null) Some(None) else canon(v, e.dataType)
      } catch { case scala.util.control.NonFatal(_) => None }
    case _ => None
  }

  private def canon(v: Any, dt: DataType): Option[Option[Any]] = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         DateType | TimestampType | TimestampNTZType =>
      Some(Some(v.asInstanceOf[Number].longValue))
    case FloatType | DoubleType => Some(Some(v.asInstanceOf[Number].doubleValue))
    case StringType => Some(Some(v.toString))
    case _ => None
  }

  private def literals(es: Seq[Expression]): Option[Seq[Any]] = {
    val vs = es.map(literalOf)
    if (vs.forall(_.isDefined)) Some(vs.flatten) else None
  }

  /** Canonical-value compare; strings in unsigned UTF-8 byte order. */
  private[lake] def cmp(x: Any, y: Any): Option[Int] = (x, y) match {
    case (a: Long, b: Long) => Some(java.lang.Long.compare(a, b))
    case (a: Double, b: Double) => Some(java.lang.Double.compare(a, b))
    case (a: String, b: String) =>
      Some(UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
    case (a: Long, b: Double) => Some(BigDecimal(a).compare(BigDecimal(b)))
    case (a: Double, b: Long) => Some(BigDecimal(a).compare(BigDecimal(b)))
    case _ => None // type mismatch: never prune
  }

  private def le(x: Any, y: Any): Boolean = cmp(x, y).forall(_ <= 0)
  private def ltv(x: Any, y: Any): Boolean = cmp(x, y).forall(_ < 0)
}
