package graft.lake

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** File-level min/max predicate evaluation for manifest-stats data
  * skipping (the Iceberg `evaluators` idea re-done minimally).
  *
  * `mayMatch` answers "could ANY row within these column ranges satisfy
  * the predicate?" — false prunes the file, anything uncertain returns
  * true (skipping is an optimization, never a filter: the surviving
  * scan re-applies the full predicate). Supported leaves: =, <=>, <, <=,
  * >, >=, IN, STARTSWITH between one column and literals, composed with
  * AND/OR. Everything else (functions, NOT, IS NULL — no null counts are
  * tracked) is conservatively true.
  *
  * Canonical stats values are Long (integral / date days / timestamp
  * micros), Double (float family) or String (UTF8 binary); comparisons
  * widen Long↔Double through BigDecimal so 2^63-scale longs don't lose
  * precision. String ranges compare in Java String order — parquet's
  * unsigned-UTF8 ordering agrees on the BMP; supplementary-plane
  * corner cases only ever widen the kept set (both bounds come from the
  * same parquet ordering, so a file is pruned only when the predicate
  * constant sorts outside the range in BOTH orderings' shared prefix
  * semantics — and STARTSWITH only inspects shared prefixes).
  */
object StatsPruner {

  /** col -> (min, max) in canonical form; None = unknown (never prune). */
  type Stats = String => Option[(Any, Any)]

  def mayMatch(e: Expression, stats: Stats): Boolean = eval(norm(e), stats)

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
        case (">", Seq(a, b)) => GreaterThan(a, b)
        case (">=", Seq(a, b)) => GreaterThanOrEqual(a, b)
        case ("<", Seq(a, b)) => LessThan(a, b)
        case ("<=", Seq(a, b)) => LessThanOrEqual(a, b)
        case ("=" | "==" | "equalto", Seq(a, b)) => EqualTo(a, b)
        case ("<=>", Seq(a, b)) => EqualNullSafe(a, b)
        case ("in", a +: rest) if rest.nonEmpty => In(a, rest)
        case ("startswith", Seq(a, b)) => StartsWith(a, b)
        case _ => e
      }
    case _ => e.mapChildren(norm)
  }

  private def eval(e: Expression, stats: Stats): Boolean = e match {
    case And(l, r) => eval(l, stats) && eval(r, stats)
    case Or(l, r) => eval(l, stats) || eval(r, stats)
    case EqualTo(a, b) => containsLit(a, b, stats) && containsLit(b, a, stats)
    case EqualNullSafe(a, b) => containsLit(a, b, stats) && containsLit(b, a, stats)
    case LessThan(a, b) => ordered(a, b, stats, strict = true)
    case LessThanOrEqual(a, b) => ordered(a, b, stats, strict = false)
    case GreaterThan(a, b) => ordered(b, a, stats, strict = true)
    case GreaterThanOrEqual(a, b) => ordered(b, a, stats, strict = false)
    case In(a, list) => (attrOf(a), literals(list)) match {
      case (Some(n), Some(vs)) => stats(n) match {
        case Some((mn, mx)) => vs.exists(v => le(mn, v) && le(v, mx))
        case None => true
      }
      case _ => true
    }
    case StartsWith(a, Literal(p: UTF8String, StringType)) => attrOf(a) match {
      case Some(n) => stats(n) match {
        case Some((mn: String, mx: String)) =>
          val pfx = p.toString
          // file may contain a string starting with pfx iff
          // min <= (pfx + maxSuffix) and pfx <= max's pfx-length prefix
          mn.take(pfx.length) <= pfx && pfx <= mx.take(pfx.length)
        case _ => true
      }
      case None => true
    }
    case _ => true
  }

  /** may a == b hold when a is a known column and b a literal:
    * containment of the literal in [min, max]. Any other shape → true. */
  private def containsLit(a: Expression, b: Expression, stats: Stats): Boolean =
    (attrOf(a), literalOf(b)) match {
      case (Some(n), Some(v)) => stats(n) match {
        case Some((mn, mx)) => le(mn, v) && le(v, mx)
        case None => true
      }
      case _ => true
    }

  /** may (a < b) / (a <= b) hold. */
  private def ordered(a: Expression, b: Expression, stats: Stats,
      strict: Boolean): Boolean = {
    (attrOf(a), literalOf(b), attrOf(b), literalOf(a)) match {
      case (Some(n), Some(v), _, _) => stats(n) match {
        case Some((mn, _)) => if (strict) ltv(mn, v) else le(mn, v)
        case None => true
      }
      case (_, _, Some(n), Some(v)) => stats(n) match {
        case Some((_, mx)) => if (strict) ltv(v, mx) else le(v, mx)
        case None => true
      }
      case _ => true
    }
  }

  private def attrOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case u: UnresolvedAttribute => Some(u.name)
    case Cast(inner, _, _, _) => attrOf(inner) // cast widens: conservative but common
    case _ => None
  }

  /** Literal in canonical stats form (Long / Double / String). */
  private def literalOf(e: Expression): Option[Any] = e match {
    case Literal(null, _) => None
    case Literal(v, dt) => dt match {
      case ByteType | ShortType | IntegerType | LongType |
           DateType | TimestampType | TimestampNTZType =>
        Some(v.asInstanceOf[Number].longValue)
      case FloatType | DoubleType => Some(v.asInstanceOf[Number].doubleValue)
      case StringType => Some(v.toString)
      case _ => None
    }
    case _ => None
  }

  private def literals(es: Seq[Expression]): Option[Seq[Any]] = {
    val vs = es.map(literalOf)
    if (vs.forall(_.isDefined)) Some(vs.flatten) else None
  }

  private def cmp(x: Any, y: Any): Option[Int] = (x, y) match {
    case (a: Long, b: Long) => Some(java.lang.Long.compare(a, b))
    case (a: Double, b: Double) => Some(java.lang.Double.compare(a, b))
    case (a: String, b: String) => Some(a.compareTo(b))
    case (a: Long, b: Double) => Some(BigDecimal(a).compare(BigDecimal(b)))
    case (a: Double, b: Long) => Some(BigDecimal(a).compare(BigDecimal(b)))
    case _ => None // type mismatch: never prune
  }

  private def le(x: Any, y: Any): Boolean = cmp(x, y).forall(_ <= 0)
  private def ltv(x: Any, y: Any): Boolean = cmp(x, y).forall(_ < 0)
}
