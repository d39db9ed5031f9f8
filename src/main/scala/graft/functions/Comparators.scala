package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Options threaded through the comparator pipeline for one column pair.
  *
  * Mirrors the kwargs the reference passes per column
  * (reference: datacompy/spark.py:955-990).
  */
final case class CompareOpts(
    absTol: Double = 0.0,
    relTol: Double = 0.0,
    ignoreSpaces: Boolean = false,
    ignoreCase: Boolean = false)

/** Pluggable per-type equality strategy (chain of responsibility).
  *
  * A comparator inspects the dtypes of the two columns and either *claims*
  * the pair — returning `Some(booleanColumn)` that evaluates the row-level
  * match — or *declines* with `None` so the next comparator in the pipeline
  * is consulted (reference: datacompy/comparator/base.py:22-50).
  *
  * The returned `Column` is a lazy Spark expression; nothing executes until
  * the enclosing plan runs, and every expression here is built from
  * codegen-friendly built-ins (no UDFs).
  */
trait Comparator {
  def compare(df: DataFrame, col1: String, col2: String, opts: CompareOpts): Option[Column]
}

object TypeClasses {
  def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }
  /** Integral types that must be cast to double before tolerance math, to
    * avoid ANSI-mode overflow on subtraction and `isnan` on non-floats
    * (reference: datacompy/comparator/numeric.py:293-304). */
  def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  def canBeNaN(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType => true
    case _ => false
  }
  def isStringLike(dt: DataType): Boolean = dt match {
    case _: StringType => true // CharType/VarcharType extend StringType in Spark 4
    case _ => false
  }
  def isDateTime(dt: DataType): Boolean = dt match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }
  def dtypeOf(df: DataFrame, name: String): DataType =
    df.schema(name).dataType
}

import TypeClasses._

/** Numeric ≈ equality under abs/rel tolerance with the exact NaN/NULL ladder
  * of the reference (datacompy/comparator/numeric.py:288-328):
  * NaN==NaN → true; NaN vs anything else → false; null<=>null → true;
  * |a-b| <= atol + rtol*|b| → true; else false.
  */
object SparkNumericComparator extends Comparator {
  override def compare(df: DataFrame, col1: String, col2: String, opts: CompareOpts): Option[Column] = {
    val (t1, t2) = (dtypeOf(df, col1), dtypeOf(df, col2))
    if (!isNumeric(t1) || !isNumeric(t2)) return None
    val c1 = if (isIntegral(t1)) col(col1).cast(DoubleType) else col(col1)
    val c2 = if (isIntegral(t2)) col(col2).cast(DoubleType) else col(col2)
    val nan1 = if (canBeNaN(t1)) isnan(c1) else lit(false)
    val nan2 = if (canBeNaN(t2)) isnan(c2) else lit(false)
    Some(
      when(nan1 && nan2, lit(true))
        .when(nan1 || nan2, lit(false))
        .when(col(col1) <=> col(col2), lit(true))
        .when(abs(c1 - c2) <= lit(opts.absTol) + (lit(opts.relTol) * abs(c2)), lit(true))
        .otherwise(lit(false)))
  }
}

/** String / date / timestamp equality with optional trim/upper normalisation;
  * string↔temporal pairs go through TRY_CAST so malformed strings yield NULL
  * instead of an ANSI exception
  * (reference: datacompy/comparator/string.py:255-345, 488-511). */
object SparkStringComparator extends Comparator {
  private def normalize(c: Column, opts: CompareOpts): Column = {
    val sp = if (opts.ignoreSpaces) trim(c) else c
    if (opts.ignoreCase) upper(sp) else sp
  }
  override def compare(df: DataFrame, col1: String, col2: String, opts: CompareOpts): Option[Column] = {
    val (t1, t2) = (dtypeOf(df, col1), dtypeOf(df, col2))
    val (s1, s2) = (isStringLike(t1), isStringLike(t2))
    val (d1, d2) = (isDateTime(t1), isDateTime(t2))
    if (!((s1 || d1) && (s2 || d2))) return None
    val (e1, e2) =
      if (d1 && s2) (col(col1), col(col2).try_cast(t1))
      else if (s1 && d2) (col(col1).try_cast(t2), col(col2))
      else (col(col1), col(col2))
    Some(when(normalize(e1, opts) <=> normalize(e2, opts), lit(true)).otherwise(lit(false)))
  }
}

/** Boolean equality, including boolean↔numeric where True matches exactly 1
  * and False exactly 0 — compared against literals of the numeric column's
  * own type so decimal/bigint keep full precision and the comparison is
  * legal under ANSI mode (reference: datacompy/comparator/boolean.py:170-274). */
object SparkBooleanComparator extends Comparator {
  private def boolEqualsNumeric(b: Column, n: Column): Column = {
    val bothNull = b.isNull && n.isNull
    val valuesEqual =
      ((b <=> lit(true)) && (n <=> lit(1))) || ((b <=> lit(false)) && (n <=> lit(0)))
    bothNull || valuesEqual
  }
  override def compare(df: DataFrame, col1: String, col2: String, opts: CompareOpts): Option[Column] = {
    val (t1, t2) = (dtypeOf(df, col1), dtypeOf(df, col2))
    val cond =
      if (t1 == BooleanType && t2 == BooleanType) col(col1) <=> col(col2)
      else if (t1 == BooleanType && isNumeric(t2)) boolEqualsNumeric(col(col1), col(col2))
      else if (t2 == BooleanType && isNumeric(t1)) boolEqualsNumeric(col(col2), col(col1))
      else return None
    Some(when(cond, lit(true)).otherwise(lit(false)))
  }
}

/** Whole-value array equality via null-safe `<=>`
  * (reference: datacompy/comparator/array.py:129-160). */
object SparkArrayComparator extends Comparator {
  override def compare(df: DataFrame, col1: String, col2: String, opts: CompareOpts): Option[Column] = {
    (dtypeOf(df, col1), dtypeOf(df, col2)) match {
      case (_: ArrayType, _: ArrayType) =>
        Some(when(col(col1) <=> col(col2), lit(true)).otherwise(lit(false)))
      case _ => None
    }
  }
}

object ComparatorPipeline {
  /** Default order per the reference (datacompy/spark.py:54-59). */
  val defaults: Seq[Comparator] =
    Seq(SparkArrayComparator, SparkBooleanComparator, SparkNumericComparator, SparkStringComparator)

  /** First comparator to claim the pair wins; all decline ⇒ `lit(false)`
    * (reference: datacompy/spark.py:955-990). */
  def columnsEqual(
      df: DataFrame,
      col1: String,
      col2: String,
      opts: CompareOpts,
      custom: Seq[Comparator] = Nil): Column = {
    val pipeline = custom ++ defaults
    pipeline.iterator
      .map(_.compare(df, col1, col2, opts))
      .collectFirst { case Some(c) => c }
      .getOrElse(lit(false))
  }
}
