package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

final case class GraftException(msg: String) extends RuntimeException(msg)

/** NutQL function surface (SURVEY §2.4): the corpus-required built-ins plus
  * a ClickHouse-naming alias layer over `org.apache.spark.sql.functions`.
  * The grammar is open (any identifier can be a function, reference
  * ast/item.rs:178), so unknown names fail with a clear "unregistered
  * function" error instead of leaking through.
  *
  * Everything here lowers to codegen'd built-in Catalyst expressions — no
  * UDFs — so whole-stage codegen spans stay wide.
  */
object FunctionRegistry {

  /** Aggregate function names (lower-cased). The binder splits these out
    * of expressions into groupBy/agg phases. *If-combinators take a
    * trailing predicate argument, ClickHouse style. */
  val aggNames: Set[String] = Set(
    "count", "sum", "avg", "min", "max", "countunique", "uniqexact",
    "countuniquerows", "countuniqueapprox", "uniq", "any", "stddevpop",
    "stddevsamp", "varpop", "varsamp", "median", "quantile", "countif",
    "sumif", "avgif", "minif", "maxif", "grouparray", "maxby", "minby")

  def isAgg(name: String): Boolean = aggNames.contains(name.toLowerCase)

  /** Bind an aggregate call. `star` marks `count(*)` / `count()`. */
  def bindAgg(name: String, args: Seq[Column], star: Boolean): Column = {
    val n = name.toLowerCase
    n match {
      case "count" =>
        if (star || args.isEmpty) count(lit(1)) else count(args.head)
      case "sum" => sum(one(n, args))
      case "avg" => avg(one(n, args))
      case "min" => min(one(n, args))
      case "max" => max(one(n, args))
      case "countunique" | "uniqexact" =>
        if (args.isEmpty) throw GraftException(s"$n expects at least 1 argument")
        count_distinct(args.head, args.tail: _*)
      case "countuniquerows" =>
        // DISTINCT-row counting: unlike count_distinct over bare
        // columns (which skips any tuple containing a NULL), SELECT
        // DISTINCT / DISTINCT ON keep a NULL-keyed row — wrapping the
        // keys in a struct (never NULL itself) makes every tuple,
        // NULL-keyed included, count exactly once (ADVICE r8 #1)
        if (args.isEmpty) throw GraftException(s"$n expects at least 1 argument")
        count_distinct(struct(args: _*))
      case "countuniqueapprox" | "uniq" => approx_count_distinct(one(n, args))
      case "any" => first(one(n, args), ignoreNulls = true)
      case "stddevpop" => stddev_pop(one(n, args))
      case "stddevsamp" => stddev_samp(one(n, args))
      case "varpop" => var_pop(one(n, args))
      case "varsamp" => var_samp(one(n, args))
      case "median" => percentile_approx(one(n, args), lit(0.5), lit(10000))
      case "quantile" => { val (v, q) = two(n, args); percentile_approx(v, q, lit(10000)) }
      case "countif" => count(when(one(n, args), 1))
      case "sumif" => sum(when(two(n, args)._2, args(0)))
      case "avgif" => avg(when(two(n, args)._2, args(0)))
      case "minif" => min(when(two(n, args)._2, args(0)))
      case "maxif" => max(when(two(n, args)._2, args(0)))
      case "grouparray" => collect_list(one(n, args))
      case "maxby" => { val (v, k) = two(n, args); max_by(v, k) }
      case "minby" => { val (v, k) = two(n, args); min_by(v, k) }
      case other => throw GraftException(s"unregistered aggregate function '$other'")
    }
  }

  private def one(name: String, args: Seq[Column]): Column = {
    if (args.size != 1) throw GraftException(s"$name expects 1 argument, got ${args.size}")
    args.head
  }

  private def two(name: String, args: Seq[Column]): (Column, Column) = {
    if (args.size != 2) throw GraftException(s"$name expects 2 arguments, got ${args.size}")
    (args(0), args(1))
  }

  /** Bind a scalar call by (case-insensitive) name. `raw` carries the AST
    * args for the functions whose Spark builtin needs a Scala literal
    * (round scale, pad strings, regex patterns, …). */
  def bindScalar(name: String, args: Seq[Column], raw: Seq[graft.nutql.Ast.Expr] = Nil): Column = {
    import graft.nutql.Ast.{IntLit, StringLit}
    def rawInt(i: Int): Int = raw.lift(i) match {
      case Some(IntLit(v)) => v.toInt
      case other => throw GraftException(s"$name: argument ${i + 1} must be an integer literal, got $other")
    }
    def rawStr(i: Int): String = raw.lift(i) match {
      case Some(StringLit(s)) => s
      case other => throw GraftException(s"$name: argument ${i + 1} must be a string literal, got $other")
    }
    def a0 = args(0); def a1 = args(1); def a2 = args(2)
    name.toLowerCase match {
      // ---- conversions / casts (ClickHouse to* family) ----
      case "todate" => to_date(a0)
      case "todatetime" => to_timestamp(a0)
      case "toint8" => a0.cast("tinyint")
      case "toint16" => a0.cast("smallint")
      case "toint32" => a0.cast("int")
      case "toint64" => a0.cast("bigint")
      case "touint8" => a0.cast("smallint")
      case "touint16" => a0.cast("int")
      case "touint32" => a0.cast("bigint")
      case "touint64" => a0.cast("decimal(20,0)")
      case "tofloat32" => a0.cast("float")
      case "tofloat64" => a0.cast("double")
      case "tostring" => a0.cast("string")
      case "toboolean" => a0.cast("boolean")
      case "todecimal32" => a0.cast(s"decimal(9,${rawInt(1)})")
      case "todecimal64" => a0.cast(s"decimal(18,${rawInt(1)})")
      case "todecimal" => a0.cast(s"decimal(${rawInt(1)},${rawInt(2)})")
      // ---- dates ----
      case "getyear" | "toyear" => year(a0)
      case "getmonth" | "tomonth" => month(a0)
      case "getday" | "todayofmonth" => dayofmonth(a0)
      // ClickHouse numbering: Monday=1..Sunday=7 (Spark dayofweek is
      // Sunday=1) — weekday() is Monday=0
      case "getdayofweek" | "todayofweek" => weekday(a0) + 1
      case "gethour" | "tohour" => hour(a0)
      case "getminute" | "tominute" => minute(a0)
      case "getsecond" | "tosecond" => second(a0)
      case "toyyyymmdd" => date_format(a0, "yyyyMMdd").cast("int")
      case "tostartofmonth" => trunc(a0, "month")
      case "tostartofyear" => trunc(a0, "year")
      case "datediff" if args.size == 3 => datediffUnit(rawStr(0), a1, a2)
      case "datediff" => datediff(a0, a1)
      case "adddays" => date_add(a0, a1.cast("int"))
      case "subtractdays" => date_sub(a0, a1.cast("int"))
      case "addmonths" => add_months(a0, a1.cast("int"))
      case "now" => current_timestamp()
      case "today" => current_date()
      // ---- strings ----
      case "substring" | "substr" => a0.substr(a1, a2)
      case "length" | "char_length" | "lengthutf8" => length(a0)
      case "lower" | "lcase" => lower(a0)
      case "upper" | "ucase" => upper(a0)
      case "concat" => concat(args: _*)
      case "replace" | "replaceall" => replace(a0, a1, a2)
      case "trim" | "trimboth" => trim(a0)
      case "ltrim" | "trimleft" => ltrim(a0)
      case "rtrim" | "trimright" => rtrim(a0)
      case "startswith" => a0.startsWith(a1)
      case "endswith" => a0.endsWith(a1)
      // position(haystack, needle) is the ClickHouse order; locate keeps
      // the MySQL (needle, haystack) order. Column needles supported.
      case "position" => call_function("locate", a1, a0)
      case "locate" => call_function("locate", a0, a1)
      case "reverse" => reverse(a0)
      case "repeat" => repeat(a0, rawInt(1))
      case "leftpad" | "lpad" => lpad(a0, rawInt(1), rawStr(2))
      case "rightpad" | "rpad" => rpad(a0, rawInt(1), rawStr(2))
      case "splitbychar" | "splitbystring" =>
        split(a1, java.util.regex.Pattern.quote(rawStr(0)))
      case "match" => a0.rlike(rawStr(1))
      case "extract" =>
        // ClickHouse: first capture group if present, whole match otherwise
        val pat = rawStr(1)
        val grp = if (java.util.regex.Pattern.compile(pat).matcher("").groupCount() > 0) 1 else 0
        regexp_extract(a0, pat, grp)
      case "empty" => length(a0) === 0
      case "notempty" => length(a0) > 0
      case "left" => substring(a0, 1, rawInt(1))
      case "right" => substring(a0, -rawInt(1), rawInt(1))
      case "format" => format_string(rawStr(0), args.tail: _*)
      // ---- math ----
      case "abs" => abs(a0)
      case "round" => if (args.size > 1) round(a0, rawInt(1)) else round(a0)
      case "floor" => floor(a0)
      case "ceil" | "ceiling" => ceil(a0)
      case "sqrt" => sqrt(a0)
      case "cbrt" => cbrt(a0)
      case "pow" | "power" => pow(a0, a1)
      case "exp" => exp(a0)
      case "ln" | "log" => log(a0)
      case "log2" => log2(a0)
      case "log10" => log10(a0)
      case "sin" => sin(a0); case "cos" => cos(a0); case "tan" => tan(a0)
      case "asin" => asin(a0); case "acos" => acos(a0); case "atan" => atan(a0)
      case "greatest" => greatest(args: _*)
      case "least" => least(args: _*)
      case "random" | "rand" => rand()
      case "pi" => lit(math.Pi)
      case "e" => lit(math.E)
      case "sign" => signum(a0)
      case "mod" => a0 % a1
      // true integral division (IntegralDivide), not double-divide+cast —
      // `/` on longs goes through double and loses precision past 2^53
      case "intdiv" => call_function("div", a0.cast("long"), a1.cast("long"))
      // ---- conditionals / nulls ----
      case "if" => when(a0, a1).otherwise(a2)
      case "multiif" =>
        // multiIf(c1,v1,c2,v2,…,else)
        if (args.size < 3 || args.size % 2 == 0)
          throw GraftException(
            s"multiIf expects cond/value pairs plus an else (odd arity >= 3), got ${args.size}")
        val pairs = args.dropRight(1).grouped(2).toSeq
        val base = pairs.tail.foldLeft(when(pairs.head(0), pairs.head(1))) {
          (acc, p) => acc.when(p(0), p(1))
        }
        base.otherwise(args.last)
      case "coalesce" => coalesce(args: _*)
      case "ifnull" => coalesce(a0, a1)
      case "nullif" => nullif(a0, a1)
      case "isnull" => a0.isNull
      case "isnotnull" => a0.isNotNull
      case "assumenotnull" => a0 // metadata-only in our model
      // ---- hashing / ids ----
      // NAME-compat aliases, not bit-compat: values differ from native
      // ClickHouse cityHash64/sipHash64 (documented; hashes must stay
      // engine-internal)
      case "cityhash64" | "siphash64" | "xxhash64" => xxhash64(args: _*)
      case "halfmd5" | "hash" => hash(args: _*)
      case "md5" => md5(a0.cast("binary"))
      case "sha256" => sha2(a0.cast("binary"), 256)
      case "generateuuidv4" => uuid()
      // ---- arrays ----
      case "arraylength" => size(a0)
      case "has" | "arraycontains" => array_contains(a0, a1)
      case "arrayelement" => element_at(a0, a1)
      case "arraysort" => array_sort(a0)
      case "arraydistinct" => array_distinct(a0)
      case "arrayconcat" => concat(args: _*)
      case "arrayslice" => slice(a0, a1, a2)
      case "arrayjoinstring" | "arraystringconcat" =>
        if (args.size > 1) concat_ws(rawStr(1), a0) else concat_ws("", a0)
      // double accumulation (element type is unknown at bind time):
      // exact for integers up to 2^53; alias-layer only, not a hot path
      case "arraysum" => aggregate(a0, lit(0.0), (acc, x) => acc + x.cast("double"))
      case "arraymax" => array_max(a0)
      case "arraymin" => array_min(a0)
      case "arrayposition" | "indexof" => array_position(a0, a1)
      case "range" =>
        // sequence() steps BACKWARD when start > stop, so range(0) would
        // fabricate [0, -1] — an explicit empty-array branch instead
        when(a0 > 0, sequence(lit(0L), a0.cast("long") - 1))
          .otherwise(array().cast("array<bigint>"))
      case "arrayzip" => arrays_zip(args: _*)
      case "arrayflatten" | "flatten" => flatten(a0)
      // ---- maps / tuples ----
      case "mapkeys" => map_keys(a0)
      case "mapvalues" => map_values(a0)
      case "tupleelement" => a0.getField(s"_${rawInt(1)}")
      // ---- misc ----
      case "exists" =>
        throw GraftException("exists() must take a subquery argument")
      case other =>
        throw GraftException(s"unregistered function '$other'")
    }
  }

  /** Bind-time return-type hint for the binder's `+`-as-concat decision:
    * Some(true) for functions that always return a string, Some(false)
    * for ones that never do, None otherwise — the binder falls back to a
    * one-off schema probe for the None cases, so the common paths never
    * trigger a driver-side analysis round. Names absent from BOTH lists
    * deliberately map to None (ADVICE r4): a default of Some(false)
    * would silently flip `+` from concat to arithmetic (NULL results)
    * for any string-returning function added later, whereas the probe
    * fallback can never misclassify. */
  private val stringReturning: Set[String] = Set(
    "tostring", "lower", "lcase", "upper", "ucase", "replace",
    "replaceall", "trim", "trimboth", "ltrim", "trimleft", "rtrim",
    "trimright", "repeat", "leftpad", "lpad", "rightpad", "rpad",
    "extract", "left", "right", "format", "substring", "substr",
    "md5", "sha256", "generateuuidv4", "arrayjoinstring",
    "arraystringconcat")
  private val neverString: Set[String] = Set(
    // aggregates with fixed numeric/array results ("min"/"max"/"any"/
    // "maxby"/"minby" and "concat" — string OR array — stay unlisted)
    "count", "countunique", "uniqexact", "countuniqueapprox", "uniq",
    "sum", "avg", "stddevpop", "stddevsamp", "varpop", "varsamp",
    "median", "quantile", "countif", "sumif", "avgif", "grouparray",
    // casts / date-time
    "todate", "todatetime", "toint8", "toint16", "toint32", "toint64",
    "touint8", "touint16", "touint32", "touint64", "tofloat32",
    "tofloat64", "toboolean", "todecimal32", "todecimal64", "todecimal",
    "getyear", "toyear", "getmonth", "tomonth", "getday", "todayofmonth",
    "getdayofweek", "todayofweek", "gethour", "tohour", "getminute",
    "tominute", "getsecond", "tosecond", "toyyyymmdd", "tostartofmonth",
    "tostartofyear", "datediff", "adddays", "subtractdays", "addmonths",
    "now", "today",
    // string predicates / metrics (boolean or numeric results)
    "length", "char_length", "lengthutf8", "startswith", "endswith",
    "position", "locate", "empty", "notempty", "match",
    "splitbychar", "splitbystring",
    // math
    "abs", "round", "floor", "ceil", "ceiling", "sqrt", "cbrt", "pow",
    "power", "exp", "ln", "log", "log2", "log10", "sin", "cos", "tan",
    "asin", "acos", "atan", "random", "rand", "pi", "e", "sign", "mod",
    "intdiv",
    // null tests / hashes
    "isnull", "isnotnull", "cityhash64", "siphash64", "xxhash64",
    "halfmd5", "hash",
    // collections (array/map results are not StringType)
    "arraylength", "has", "arraycontains", "arraysort", "arraydistinct",
    "arrayslice", "arraysum", "arrayposition", "indexof", "range",
    "arrayzip", "arrayflatten", "flatten", "mapkeys", "mapvalues")
  def returnsString(name: String): Option[Boolean] = {
    val n = name.toLowerCase
    if (stringReturning.contains(n)) Some(true)
    else if (neverString.contains(n)) Some(false)
    else None
  }

  /** ClickHouse/DuckDB dateDiff counts UNIT-BOUNDARY crossings, not
    * elapsed intervals: dateDiff('month', Jan 31, Feb 1) = 1. Every unit
    * below uses boundary math (floor of the unit index, subtracted). */
  private def datediffUnit(unit: String, a: Column, b: Column): Column =
    unit.toLowerCase match {
      case "day" => datediff(b, a)
      case "month" => (year(b) * 12 + month(b)) - (year(a) * 12 + month(a))
      case "year" => year(b) - year(a)
      case "hour" =>
        (floor(unix_timestamp(b) / 3600) - floor(unix_timestamp(a) / 3600)).cast("long")
      case "minute" =>
        (floor(unix_timestamp(b) / 60) - floor(unix_timestamp(a) / 60)).cast("long")
      case "second" => unix_timestamp(b) - unix_timestamp(a)
      case u => throw GraftException(s"unsupported dateDiff unit '$u'")
    }
}
