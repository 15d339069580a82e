package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._

/** ClickHouse function names callable from SQL text: registers the
  * dialect's aggregate/scalar names in the session FunctionRegistry so
  * `spark.sql("SELECT countIf(x > 1), argMax(a, b) ...")` runs unchanged.
  * Each name maps onto the native Catalyst expression the Spark planner
  * already optimizes (partial aggregation, codegen) — no UDF layer.
  */
object ClickHouseDialect {

  private def one(args: Seq[Expression]): Expression = args.head

  /** CH `empty`/`notEmpty`: '' for strings, zero-length for arrays and
    * maps — one name over both, so the emptiness test must dispatch on
    * the RESOLVED child type (Length for string/binary, Size
    * otherwise). RuntimeReplaceable keeps it a pure rewrite the
    * optimizer codegens as usual.
    */
  private final case class ChEmpty(child: Expression, negate: Boolean)
    extends UnaryExpression with RuntimeReplaceable {
    override lazy val replacement: Expression = {
      val test = child.dataType match {
        case org.apache.spark.sql.types.StringType |
             org.apache.spark.sql.types.BinaryType =>
          EqualTo(Length(child), Literal(0))
        case _ => EqualTo(Size(child), Literal(0))
      }
      if (negate) Not(test) else test
    }
    override protected def withNewChildInternal(newChild: Expression): ChEmpty =
      copy(child = newChild)
  }

  /** ClickHouse external dictionaries: small key→attribute lookup tables
    * resolved per row (`dictGet('countries', 'name', code)`). Registered
    * here as collected in-memory maps and compiled into each query as a
    * single MapType literal + ElementAt — the broadcast-dim pattern
    * without a join, resolved entirely at plan time. Map-literal lookup
    * is a per-row scan of the literal, so registration caps the size at
    * dimension scale (64k entries) — a bigger "dictionary" is a join, and
    * should be written as one.
    */
  private val dicts =
    new java.util.concurrent.ConcurrentHashMap[String,
      Map[String, (org.apache.spark.sql.types.MapType, Map[Any, Any])]]()

  def registerDictionary(df: org.apache.spark.sql.DataFrame, name: String,
    keyCol: String, maxRows: Int = 65536): Unit = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"dictionary $name exceeds $maxRows entries — use a join for large tables")
    val keyType = df.schema(keyCol).dataType
    val attrs = df.columns.filterNot(_.equalsIgnoreCase(keyCol))
    val byAttr = attrs.map { a =>
      val vt = df.schema(a).dataType
      a -> (org.apache.spark.sql.types.MapType(keyType, vt),
        rows.map(r => r.getAs[Any](keyCol) -> r.getAs[Any](a)).toMap)
    }.toMap
    dicts.put(name, byAttr)
    ()
  }

  /** Remove a registered dictionary (DROP DICTIONARY). True if it existed. */
  def dropDictionary(name: String): Boolean = dicts.remove(name) != null

  def dictionaryExists(name: String): Boolean = dicts.containsKey(name)

  private def litString(e: Expression, what: String): String = e match {
    case Literal(s, _) if s != null => s.toString
    case _ => throw new IllegalArgumentException(s"$what must be a string literal")
  }

  private def dictMapLiteral(args: Seq[Expression]): Expression = {
    val name = litString(args.head, "dictGet dictionary name")
    val attr = litString(args(1), "dictGet attribute name")
    val byAttr = Option(dicts.get(name)).getOrElse(
      throw new IllegalArgumentException(
        s"dictionary $name is not registered — ClickHouseDialect.registerDictionary first"))
    val (mt, m) = byAttr.getOrElse(attr,
      throw new IllegalArgumentException(
        s"dictionary $name has no attribute $attr (has: ${byAttr.keys.mkString(", ")})"))
    Literal.create(m, mt)
  }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // …If combinators
    "countIf" -> (args => Count(CaseWhen(Seq((args.head, Literal(1)))))),
    "sumIf" -> (args => Sum(CaseWhen(Seq((args(1), args.head))))),
    "avgIf" -> (args => Average(CaseWhen(Seq((args(1), args.head))))),
    "minIf" -> (args => Min(CaseWhen(Seq((args(1), args.head))))),
    "maxIf" -> (args => Max(CaseWhen(Seq((args(1), args.head))))),
    // distinct-count family
    "uniq" -> (args => HyperLogLogPlusPlus(one(args))),
    "uniqExact" -> (args => Count(args).toAggregateExpression(isDistinct = true)),
    // quantiles
    "quantileExact" -> (args => new Percentile(args(1), args.head)),
    "medianExact" -> (args => new Percentile(one(args), Literal(0.5d))),
    "quantile" -> (args => new ApproximatePercentile(args(1), args.head)),
    // argMin/argMax
    "argMax" -> (args => MaxBy(args.head, args(1))),
    "argMin" -> (args => MinBy(args.head, args(1))),
    // group arrays; groupArray(N)(x) keeps the first N (params-first
    // after the rewriteParamCall flattening)
    "groupArray" -> { args =>
      if (args.length == 1) CollectList(args.head)
      else Slice(CollectList(args(1)).toAggregateExpression(),
        Literal(1), Cast(args.head, org.apache.spark.sql.types.IntegerType))
    },
    "groupUniqArray" -> (args => CollectSet(one(args))),
    // scalar date helpers
    "toStartOfMonth" -> (args => TruncTimestamp(Literal("month"), one(args))),
    "toStartOfDay" -> (args => TruncTimestamp(Literal("day"), one(args))),
    "toStartOfHour" -> (args => TruncTimestamp(Literal("hour"), one(args))),
    "toYYYYMM" -> (args => DateFormatClass(one(args), Literal("yyyyMM"))),
    // scalar misc
    "modulo" -> (args => Remainder(args.head, args(1))),
    "intDiv" -> (args => IntegralDivide(args.head, args(1))),
    "gcd" -> (args => GcdExpr(
      Cast(args.head, org.apache.spark.sql.types.LongType),
      Cast(args(1), org.apache.spark.sql.types.LongType))),
    "lcm" -> (args => LcmExpr(
      Cast(args.head, org.apache.spark.sql.types.LongType),
      Cast(args(1), org.apache.spark.sql.types.LongType))),
    "toYearWeek" -> (args => ToYearWeekExpr(
      Cast(one(args), org.apache.spark.sql.types.DateType))),
    "byteSize" -> (args => ByteSizeExpr(one(args))),
    // reached through the `char(` splice — Spark's builtin char is 1-arg
    "chChar" -> (args => ChCharExpr(args.map(a =>
      Cast(a, org.apache.spark.sql.types.LongType)))),
    "arrayJoin" -> (args => Explode(one(args))),
    // statistics (ClickHouse camelCase → Spark natives)
    "stddevPop" -> (args => StddevPop(one(args))),
    "stddevSamp" -> (args => StddevSamp(one(args))),
    "varPop" -> (args => VariancePop(one(args))),
    "varSamp" -> (args => VarianceSamp(one(args))),
    "covarPop" -> (args => CovPopulation(args.head, args(1))),
    "covarSamp" -> (args => CovSample(args.head, args(1))),
    // conditionals — multiIf (CH chained ternary) takes
    // cond1, then1, cond2, then2, ..., else; CH `if` is Spark's builtin
    "multiIf" -> { args =>
      if (args.length < 3 || args.length % 2 == 0)
        throw new IllegalArgumentException(
          s"multiIf expects cond1, then1, [cond2, then2, ...], else — got ${args.length} arguments")
      val branches = args.dropRight(1).grouped(2).map { p => (p.head, p(1)) }.toSeq
      CaseWhen(branches, Some(args.last))
    },
    // date/time scalars
    "toStartOfQuarter" -> (args => TruncTimestamp(Literal("quarter"), one(args))),
    "toStartOfYear" -> (args => TruncTimestamp(Literal("year"), one(args))),
    "toYYYYMMDD" -> (args => DateFormatClass(one(args), Literal("yyyyMMdd"))),
    "toYear" -> (args => Year(one(args))),
    "toMonth" -> (args => Month(one(args))),
    "toDayOfMonth" -> (args => DayOfMonth(one(args))),
    "toDayOfWeek" -> (args => Add(
      WeekDay(Cast(one(args), org.apache.spark.sql.types.DateType)), Literal(1))),
    "toHour" -> (args => Hour(one(args))),
    "toMinute" -> (args => Minute(one(args))),
    "toSecond" -> (args => Second(one(args))),
    "toUnixTimestamp" -> (args => UnixTimestamp(one(args), Literal("yyyy-MM-dd HH:mm:ss"))),
    "addDays" -> (args => DateAdd(args.head, args(1))),
    "subtractDays" -> (args => DateSub(args.head, args(1))),
    // strings (CH names; all ASCII-safe Spark natives are UTF8-correct)
    "lengthUTF8" -> (args => Length(one(args))),
    "lowerUTF8" -> (args => Lower(one(args))),
    "upperUTF8" -> (args => Upper(one(args))),
    "substringUTF8" -> (args => Substring(args.head, args(1), args(2))),
    "positionCaseInsensitive" ->
      (args => new StringLocate(Lower(args(1)), Lower(args.head))),
    "replaceAll" -> (args => StringReplace(args.head, args(1), args(2))),
    "replaceRegexpAll" -> (args => RegExpReplace(args.head, args(1), args(2))),
    "match" -> (args => RLike(args.head, args(1))),
    "startsWith" -> (args => StartsWith(args.head, args(1))),
    "endsWith" -> (args => EndsWith(args.head, args(1))),
    "trimBoth" -> (args => StringTrim(one(args))),
    "splitByString" -> { args =>
      if (!args.head.foldable)
        throw new IllegalArgumentException(
          "splitByString requires a literal separator as its first argument")
      StringSplit(args(1), Literal(
        java.util.regex.Pattern.quote(String.valueOf(args.head.eval()))), Literal(-1))
    },
    // arrays
    "arrayElement" -> (args => ElementAt(args.head, args(1))),
    "indexOf" -> (args => ArrayPosition(args.head, args(1))),
    "arrayConcat" -> (args => Concat(args)),
    "arraySlice" -> (args => Slice(args.head, args(1), args(2))),
    "arraySort" -> (args => new SortArray(one(args))),
    "arrayReverse" -> (args => Reverse(one(args))),
    "arrayDistinct" -> (args => ArrayDistinct(one(args))),
    // CH empty/notEmpty accept strings AND arrays/maps — the test
    // dispatches on the resolved child type (ChEmpty below)
    "empty" -> (args => ChEmpty(one(args), negate = false)),
    "notEmpty" -> (args => ChEmpty(one(args), negate = true)),
    // value pickers. ClickHouse `any`/`ifNull`/`nullIf`/`position` are NOT
    // mapped: Spark resolves those names to builtins first (register()
    // never shadows), and the builtin `any` (boolean) and `position`
    // (swapped args) have DIFFERENT semantics — a silent-wrong-answer
    // trap. ClickHouse users get `anyLast`, `any_value`, `ifnull`,
    // `nullif`, and `locate` instead, all semantics-identical.
    "anyLast" -> (args => Last(one(args), ignoreNulls = true)),
    // -State / -Merge combinators for the LINEAR aggregates, where the
    // state IS the value (the AggregatingMergeTree batch model —
    // q61_agg_state): producing a state = running the aggregate;
    // merging states = re-aggregating, with COUNT states merging by
    // SUM. Non-linear states (avgState, quantileState) are
    // engine-opaque and unregistered — they fail loudly at analysis.
    "sumState" -> (args => Sum(one(args))),
    "countState" -> (args => Count(Seq(one(args)))),
    "minState" -> (args => Min(one(args))),
    "maxState" -> (args => Max(one(args))),
    "anyState" -> (args => First(one(args), ignoreNulls = true)),
    "anyLastState" -> (args => Last(one(args), ignoreNulls = true)),
    "sumMerge" -> (args => Sum(one(args))),
    "countMerge" -> (args => Sum(one(args))),
    "minMerge" -> (args => Min(one(args))),
    "maxMerge" -> (args => Max(one(args))),
    "anyMerge" -> (args => First(one(args), ignoreNulls = true)),
    "anyLastMerge" -> (args => Last(one(args), ignoreNulls = true)),
    // cast family
    "toDate" -> (args => Cast(one(args), org.apache.spark.sql.types.DateType)),
    "toInt64" -> (args => Cast(one(args), org.apache.spark.sql.types.LongType)),
    "toFloat64" -> (args => Cast(one(args), org.apache.spark.sql.types.DoubleType)),
    "toString" -> (args => Cast(one(args), org.apache.spark.sql.types.StringType)),
    // bit/temporal scalars
    "bitCount" -> (args => BitwiseCount(one(args))),
    "toDayOfYear" -> (args => DayOfYear(one(args))),
    "toQuarter" -> (args => Quarter(one(args))),
    // array membership
    "has" -> (args => ArrayContains(args.head, args(1))),
    "hasAny" -> (args => ArraysOverlap(args.head, args(1))),
    "hasAll" -> (args => EqualTo(Size(ArrayExcept(args(1), args.head)), Literal(0))),
    "arrayMax" -> (args => ArrayMax(one(args))),
    "arrayMin" -> (args => ArrayMin(one(args))),
    // string scalars (pad string optional in ClickHouse — default space)
    "leftPad" -> (args =>
      StringLPad(args.head, args(1), if (args.length > 2) args(2) else Literal(" "))),
    "rightPad" -> (args =>
      StringRPad(args.head, args(1), if (args.length > 2) args(2) else Literal(" "))),
    // arithmetic names
    "plus" -> (args => Add(args.head, args(1))),
    "minus" -> (args => Subtract(args.head, args(1))),
    "multiply" -> (args => Multiply(args.head, args(1))),
    "divide" -> (args => Divide(args.head, args(1))),
    // temporal names, second batch (migration long tail)
    // CH default mode 0 = Sunday-start (date - (dayofweek-1)); Spark's
    // trunc('week') is Monday-start and would silently shift six days a week
    "toStartOfWeek" -> (args => DateSub(
      Cast(one(args), org.apache.spark.sql.types.DateType),
      Subtract(DayOfWeek(one(args)), Literal(1)))),
    "toMonday" -> (args =>
      Cast(TruncTimestamp(Literal("week"), one(args)),
        org.apache.spark.sql.types.DateType)),
    "toISOWeek" -> (args => WeekOfYear(one(args))),
    "toDate32" -> (args => Cast(one(args), org.apache.spark.sql.types.DateType)),
    "toDateTime" -> (args =>
      Cast(one(args), org.apache.spark.sql.types.TimestampType)),
    "addMonths" -> (args => new AddMonths(args.head, args(1))),
    "subtractMonths" -> (args =>
      new AddMonths(args.head, UnaryMinus(args(1)))),
    "addHours" -> (args => TimestampAddInterval(args.head,
      MultiplyDTInterval(Literal(java.time.Duration.ofHours(1)), args(1)))),
    // CH `dateDiff('day', s, e)` is NOT mapped: Spark's parser grammar owns
    // the name (TIMESTAMPDIFF alias) before the registry is consulted, and
    // its unquoted form dateDiff(day, s, e) already has CH semantics.
    "yesterday" -> (_ => DateSub(CurrentDate(None), Literal(1))),
    // string names, second batch
    "concatWithSeparator" -> (args => new ConcatWs(args)),
    "arrayStringConcat" -> { args =>
      val sep = if (args.length > 1) args(1) else Literal("")
      ArrayJoin(args.head, sep, None)
    },
    "splitByChar" -> { args =>
      if (!args.head.foldable)
        throw new IllegalArgumentException(
          "splitByChar requires a literal separator as its first argument")
      StringSplit(args(1), Literal(
        java.util.regex.Pattern.quote(String.valueOf(args.head.eval()))), Literal(-1))
    },
    // CH `extract(s, re)` is NOT mapped: Spark resolves `extract` to its
    // EXTRACT(field FROM ts) builtin first (register() never shadows) —
    // migrating users get regexp_extract. extractAll has no collision;
    // CH takes the first subgroup when the pattern has one, else the
    // whole match — mirrored by picking the group index from the pattern.
    "extractAll" -> { args =>
      if (!args(1).foldable)
        throw new IllegalArgumentException(
          "extractAll requires a literal pattern as its second argument")
      val groups = java.util.regex.Pattern
        .compile(String.valueOf(args(1).eval()))
        .matcher("").groupCount()
      RegExpExtractAll(args.head, args(1),
        Literal(if (groups > 0) 1 else 0))
    },
    "tryBase64Decode" -> (args => new TryToBinary(one(args), Literal("base64"))),
    "base64Encode" -> (args => Base64(one(args))),
    "reverseUTF8" -> (args => Reverse(one(args))),
    "repeat" -> (args => StringRepeat(args.head, args(1))),
    // array names, second batch
    // arrayCount must RESOLVE TO a higher-order function (Spark rejects a
    // lambda argument whose function resolves to a wrapper like
    // Size(ArrayFilter(…))), so the count is folded as an aggregate whose
    // merge lambda reuses the caller's lambda variable by position
    "arrayCount" -> { args =>
      val pred = validateLambda(args.head)
      val acc = UnresolvedNamedLambdaVariable(Seq("graft_acc"))
      ArrayAggregate(args(1), Literal(0),
        LambdaFunction(Add(acc, If(pred.function, Literal(1), Literal(0))),
          acc +: pred.arguments),
        LambdaFunction.identity)
    },
    "arrayExists" -> (args => ArrayExists(args(1), validateLambda(args.head))),
    "arrayAll" -> (args => ArrayForAll(args(1), validateLambda(args.head))),
    "arrayFilter" -> (args => ArrayFilter(args(1), validateLambda(args.head))),
    "arrayMap" -> (args => ArrayTransform(args(1), validateLambda(args.head))),
    "arraySum" -> (args => ArrayAggregate(
      one(args), Literal(0L),
      LambdaFunction(Add(UnresolvedNamedLambdaVariable(Seq("acc")),
        UnresolvedNamedLambdaVariable(Seq("x"))),
        Seq(UnresolvedNamedLambdaVariable(Seq("acc")),
          UnresolvedNamedLambdaVariable(Seq("x")))),
      LambdaFunction.identity)),
    "arrayAvg" -> (args => Divide(
      Cast(ArrayAggregate(
        one(args), Literal(0L),
        LambdaFunction(Add(UnresolvedNamedLambdaVariable(Seq("acc")),
          UnresolvedNamedLambdaVariable(Seq("x"))),
          Seq(UnresolvedNamedLambdaVariable(Seq("acc")),
            UnresolvedNamedLambdaVariable(Seq("x")))),
        LambdaFunction.identity), org.apache.spark.sql.types.DoubleType),
      Cast(Size(one(args)), org.apache.spark.sql.types.DoubleType))),
    // arrayCompact removes CONSECUTIVE duplicates (ClickHouse semantics —
    // NOT distinct): keep element i iff i = 0 or it differs from i-1
    "arrayCompact" -> { args =>
      val arr = one(args)
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val i = UnresolvedNamedLambdaVariable(Seq("i"))
      ArrayFilter(arr, LambdaFunction(
        Or(EqualTo(i, Literal(0)),
          Not(EqualNullSafe(x, ElementAt(arr, i)))), // arr is 1-based: arr[i] is the predecessor of 0-based position i
        Seq(x, i)))
    },
    "arrayFlatten" -> (args => Flatten(one(args))),
    "arrayPushBack" -> (args => Concat(Seq(args.head,
      CreateArray(Seq(args(1)))))),
    "arrayPopBack" -> (args => Slice(args.head, Literal(1),
      greatestZero(Subtract(Size(args.head), Literal(1))))),
    "countEqual" -> (args => Size(ArrayFilter(args.head,
      LambdaFunction(EqualTo(UnresolvedNamedLambdaVariable(Seq("x")), args(1)),
        Seq(UnresolvedNamedLambdaVariable(Seq("x"))))))),
    // JSON extraction family, third batch. CH takes a key path as
    // trailing arguments (strings descend into objects, 1-BASED ints
    // index arrays); Spark's GetJsonObject takes a JSONPath — built here
    // from literal keys, loud failure otherwise.
    "JSONExtractString" -> (args => jsonExtract(args)),
    "JSONExtractInt" -> (args =>
      Cast(jsonExtract(args), org.apache.spark.sql.types.LongType)),
    "JSONExtractFloat" -> (args =>
      Cast(jsonExtract(args), org.apache.spark.sql.types.DoubleType)),
    "JSONExtractBool" -> (args =>
      Cast(jsonExtract(args), org.apache.spark.sql.types.BooleanType)),
    "JSONHas" -> (args => IsNotNull(jsonExtract(args))),
    // temporal, third batch
    "addWeeks" -> (args => DateAdd(args.head, Multiply(args(1), Literal(7)))),
    "subtractWeeks" -> (args => DateSub(args.head, Multiply(args(1), Literal(7)))),
    "addMinutes" -> (args => TimestampAddInterval(args.head,
      MultiplyDTInterval(Literal(java.time.Duration.ofMinutes(1)), args(1)))),
    "addSeconds" -> (args => TimestampAddInterval(args.head,
      MultiplyDTInterval(Literal(java.time.Duration.ofSeconds(1)), args(1)))),
    "subtractHours" -> (args => TimestampAddInterval(args.head,
      MultiplyDTInterval(Literal(java.time.Duration.ofHours(1)),
        UnaryMinus(args(1))))),
    "subtractMinutes" -> (args => TimestampAddInterval(args.head,
      MultiplyDTInterval(Literal(java.time.Duration.ofMinutes(1)),
        UnaryMinus(args(1))))),
    "subtractSeconds" -> (args => TimestampAddInterval(args.head,
      MultiplyDTInterval(Literal(java.time.Duration.ofSeconds(1)),
        UnaryMinus(args(1))))),
    "today" -> (_ => CurrentDate(None)),
    "toYYYYMMDDhhmmss" -> (args =>
      DateFormatClass(one(args), Literal("yyyyMMddHHmmss"))),
    // MySQL-style specifiers translated to a Spark datetime pattern at
    // registration (literal formats only). %M follows CURRENT ClickHouse
    // semantics (full month name); minutes are %i, as in CH ≥ 23.x.
    "formatDateTime" -> { args =>
      if (!args(1).foldable)
        throw new IllegalArgumentException(
          "formatDateTime requires a literal format string")
      DateFormatClass(args.head,
        Literal(translateDateFormat(String.valueOf(args(1).eval()))))
    },
    // bit scalars + grouped bit aggregates
    "bitAnd" -> (args => BitwiseAnd(args.head, args(1))),
    "bitOr" -> (args => BitwiseOr(args.head, args(1))),
    "bitXor" -> (args => BitwiseXor(args.head, args(1))),
    "bitNot" -> (args => BitwiseNot(one(args))),
    "bitShiftLeft" -> (args => ShiftLeft(args.head, args(1))),
    "bitShiftRight" -> (args => ShiftRight(args.head, args(1))),
    "groupBitAnd" -> (args => BitAndAgg(one(args))),
    "groupBitOr" -> (args => BitOrAgg(one(args))),
    "groupBitXor" -> (args => BitXorAgg(one(args))),
    // aggregate aliases: CH's fixed-precision HLL variants land on
    // Spark's HLL++ (different sketches, same approximate contract);
    // anyHeavy's "some heavy hitter" contract is satisfied by exact mode
    "uniqHLL12" -> (args => HyperLogLogPlusPlus(one(args))),
    "uniqCombined" -> (args => HyperLogLogPlusPlus(one(args))),
    // parameterized aggregates — ClickHouse writes these `f(params)(args)`;
    // ClickHouseSql.rewriteParamCall flattens the call to this params-first
    // form, so both spellings resolve here
    "quantiles" -> (args => new Percentile(args.last, CreateArray(args.init))),
    "quantilesExact" -> (args => new Percentile(args.last, CreateArray(args.init))),
    "topK" -> (args => TopKFreq(args(1), args.head, Literal(1L))),
    "topKWeighted" -> (args => TopKFreq(args(1), args.head, args(2))),
    // event-sequence aggregates (windowFunnel(w)(ts, c1, …) etc.) —
    // the params-first flattened spellings of the CH behavioral family
    "windowFunnel" -> (args => WindowFunnel(args.head, args(1), args.drop(2))),
    "sequenceMatch" -> (args =>
      SequenceMatchAgg(args.head, args(1), args.drop(2), counting = false)),
    "sequenceCount" -> (args =>
      SequenceMatchAgg(args.head, args(1), args.drop(2), counting = true)),
    // uniqUpTo(k)(x): exact distinct count saturating at k+1 ("more than k")
    "uniqUpTo" -> (args => Least(Seq(
      Count(Seq(args(1))).toAggregateExpression(isDistinct = true),
      Cast(Add(args.head, Literal(1)), org.apache.spark.sql.types.LongType)))),
    "quantileTDigest" -> (args => new ApproximatePercentile(args(1), args.head)),
    // CH's other quantile sketches (timing histogram, bfloat16) land on
    // the same approx family — estimates differ within sketch error,
    // the documented approximate-quantile divergence
    "quantileTiming" -> (args => new ApproximatePercentile(args(1), args.head)),
    "quantileBFloat16" -> (args => new ApproximatePercentile(args(1), args.head)),
    // median* sketch spellings = the p=0.5 fixed point of the same family;
    // quantiles* plural sketch spellings ride the multi-percentile form
    // (params-first after rewriteParamCall, like quantilesExact above)
    "medianTDigest" -> (args =>
      new ApproximatePercentile(one(args), Literal(0.5d))),
    "medianTiming" -> (args =>
      new ApproximatePercentile(one(args), Literal(0.5d))),
    "medianBFloat16" -> (args =>
      new ApproximatePercentile(one(args), Literal(0.5d))),
    "quantilesTDigest" -> (args =>
      new ApproximatePercentile(args.last, CreateArray(args.init))),
    "quantilesTiming" -> (args =>
      new ApproximatePercentile(args.last, CreateArray(args.init))),
    "quantilesBFloat16" -> (args =>
      new ApproximatePercentile(args.last, CreateArray(args.init))),
    "anyHeavy" -> (args => Mode(one(args))),
    // arrays/maps, third batch
    // range is END-EXCLUSIVE in CH; Spark's sequence stops at the last
    // value ≤ stop, so stop = end - 1 reproduces it for positive steps
    "range" -> { args =>
      if (args.length == 1) new Sequence(Literal(0L), Subtract(Cast(one(args),
        org.apache.spark.sql.types.LongType), Literal(1L)), Literal(1L))
      else new Sequence(args.head, Subtract(args(1), Literal(1)),
        if (args.length > 2) args(2) else Literal(1))
    },
    "arrayEnumerate" -> { args =>
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val i = UnresolvedNamedLambdaVariable(Seq("i"))
      ArrayTransform(one(args), LambdaFunction(Add(i, Literal(1)), Seq(x, i)))
    },
    "arrayUniq" -> (args => Size(ArrayDistinct(one(args)))),
    // arrayDifference: [0, a2−a1, a3−a2, …]; the first element's zero is
    // spelled x − x so the literal carries the array's own numeric type
    "arrayDifference" -> { args =>
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val i = UnresolvedNamedLambdaVariable(Seq("i"))
      ArrayTransform(one(args), LambdaFunction(
        If(EqualTo(i, Literal(0)), Subtract(x, x),
          Subtract(x, ElementAt(one(args), i))), Seq(x, i)))
    },
    // arrayCumSum: prefix sums via a per-position fold (bounded by the
    // array length — CH applies these to row-local arrays, not corpora)
    "arrayCumSum" -> { args =>
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val i = UnresolvedNamedLambdaVariable(Seq("i"))
      val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
      val y = UnresolvedNamedLambdaVariable(Seq("y"))
      ArrayTransform(one(args), LambdaFunction(
        ArrayAggregate(
          Slice(one(args), Literal(1), Add(i, Literal(1))),
          Subtract(x, x),
          LambdaFunction(Add(acc, y), Seq(acc, y)),
          LambdaFunction(acc, Seq(acc))),
        Seq(x, i)))
    },
    "arrayIntersect" -> (args => ArrayIntersect(args.head, args(1))),
    "arrayProduct" -> { args =>
      val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
      val y = UnresolvedNamedLambdaVariable(Seq("y"))
      ArrayAggregate(
        Cast(one(args), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
        Literal(1.0d),
        LambdaFunction(Multiply(acc, y), Seq(acc, y)),
        LambdaFunction(acc, Seq(acc)))
    },
    // arrayFirst/arrayFirstIndex live in ClickHouseSql as text rewrites:
    // the analyzer requires a lambda argument's function to RESOLVE to a
    // higher-order expression at top level, which element_at(filter(…))
    // is not
    "tupleElement" -> { args =>
      val n = args(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"tupleElement index must be an integer literal, got $other")
      }
      GetStructField(args.head, n - 1)
    },
    "arrayZip" -> (args => ArraysZip(args)),
    "mapKeys" -> (args => MapKeys(one(args))),
    "mapValues" -> (args => MapValues(one(args))),
    "assumeNotNull" -> (args => KnownNotNull(one(args))),
    // strings, third batch (no name collisions with Spark builtins)
    "positionUTF8" -> (args => new StringLocate(args(1), args.head)),
    // window-frame navigation (CH names; `lagInFrame` ≡ SQL lag within
    // the window frame — Spark's Lag/Lead, used inside OVER (...))
    "lagInFrame" -> (args => Lag(args.head,
      if (args.length > 1) args(1) else Literal(1),
      if (args.length > 2) args(2) else Literal(null), ignoreNulls = false)),
    "leadInFrame" -> (args => Lead(args.head,
      if (args.length > 1) args(1) else Literal(1),
      if (args.length > 2) args(2) else Literal(null), ignoreNulls = false)),
    // fourth batch: casts, temporal diffs, encodings
    "toInt8" -> (args => Cast(one(args), org.apache.spark.sql.types.ByteType)),
    "toInt16" -> (args => Cast(one(args), org.apache.spark.sql.types.ShortType)),
    "toInt32" -> (args => Cast(one(args), org.apache.spark.sql.types.IntegerType)),
    "toInt64" -> (args => Cast(one(args), org.apache.spark.sql.types.LongType)),
    "toUInt8" -> (args => Cast(one(args), org.apache.spark.sql.types.ShortType)),
    "toUInt16" -> (args => Cast(one(args), org.apache.spark.sql.types.IntegerType)),
    "toUInt32" -> (args => Cast(one(args), org.apache.spark.sql.types.LongType)),
    "toUInt64" -> (args => Cast(one(args), org.apache.spark.sql.types.LongType)),
    "toFloat32" -> (args => Cast(one(args), org.apache.spark.sql.types.FloatType)),
    "toFloat64" -> (args => Cast(one(args), org.apache.spark.sql.types.DoubleType)),
    "fromUnixTimestamp" -> { args =>
      val ts = SecondsToTimestamp(args.head)
      if (args.length > 1)
        DateFormatClass(ts,
          Literal(translateDateFormat(String.valueOf(args(1).eval()))))
      else ts
    },
    "base64Encode" -> (args => Base64(Cast(one(args),
      org.apache.spark.sql.types.BinaryType))),
    "base64Decode" -> (args => Cast(UnBase64(one(args)),
      org.apache.spark.sql.types.StringType)),
    // CH dateDiff counts crossed unit BOUNDARIES (diff of the operands
    // truncated to the unit); age counts COMPLETE elapsed units —
    // exactly Spark's timestampdiff. Spark's parser claims the
    // `dateDiff(` spelling before resolution (unquoted-unit builtin), so
    // ClickHouseSql rewrites CH's quoted-unit call to this name.
    "chDateDiff" -> { args =>
      val unit = litString(args.head, "dateDiff unit")
      new TimestampDiff(unit,
        TruncTimestamp(Literal(unit), args(1)),
        TruncTimestamp(Literal(unit), args(2)))
    },
    "age" -> { args =>
      new TimestampDiff(litString(args.head, "age unit"), args(1), args(2))
    },
    // CH's hash families are not reproduced bit-for-bit (sipHash/cityHash
    // are CH-internal constants); the names land on xxhash64 — stable
    // within graft, same contract (fast 64-bit dispersion), different
    // values than a CH cluster would produce
    "sipHash64" -> (args => XxHash64(args, 42L)),
    "cityHash64" -> (args => XxHash64(args, 42L)),
    "farmHash64" -> (args => XxHash64(args, 42L)),
    "halfMD5" -> (args => XxHash64(args, 42L)),
    // dictionaries (see dicts above): plan-time map literals
    "dictGet" -> (args => ElementAt(dictMapLiteral(args), args(2))),
    "dictGetOrDefault" -> (args =>
      Coalesce(Seq(ElementAt(dictMapLiteral(args), args(2)), args(3)))),
    "dictHas" -> { args =>
      val name = litString(args.head, "dictHas dictionary name")
      val byAttr = Option(dicts.get(name)).getOrElse(
        throw new IllegalArgumentException(s"dictionary $name is not registered"))
      val (mt, m) = byAttr.head._2
      ArrayContains(MapKeys(Literal.create(m, mt)), args(1))
    },
    "countSubstrings" -> { args =>
      if (!args(1).foldable)
        throw new IllegalArgumentException(
          "countSubstrings requires a literal needle as its second argument")
      Subtract(Size(StringSplit(args.head, Literal(java.util.regex.Pattern
        .quote(String.valueOf(args(1).eval()))), Literal(-1))), Literal(1))
    },
    // ------------------------------------------------------------- batch 6
    // temporal: year/quarter shifts + sub-hour grid alignment
    "addYears" -> (args =>
      new AddMonths(args.head, Multiply(args(1), Literal(12)))),
    "subtractYears" -> (args =>
      new AddMonths(args.head, UnaryMinus(Multiply(args(1), Literal(12))))),
    "addQuarters" -> (args =>
      new AddMonths(args.head, Multiply(args(1), Literal(3)))),
    "subtractQuarters" -> (args =>
      new AddMonths(args.head, UnaryMinus(Multiply(args(1), Literal(3))))),
    "toStartOfMinute" -> (args => TruncTimestamp(Literal("minute"), one(args))),
    "toStartOfFiveMinutes" -> (args => floorSeconds(one(args), 300L)),
    "toStartOfTenMinutes" -> (args => floorSeconds(one(args), 600L)),
    "toStartOfFifteenMinutes" -> (args => floorSeconds(one(args), 900L)),
    "toLastDayOfMonth" -> (args => LastDay(one(args))),
    // CH `monthName` is NOT mapped: Spark's monthname() builtin claims the
    // name (register() never shadows) and returns the 3-letter
    // abbreviation where CH returns the full name — the silent-wrong-
    // answer trap again. Migrating users write date_format(d, 'MMMM').
    // CH `isNaN` is also unmapped: Spark's isnan() is semantics-identical.
    // toStartOfInterval(t, INTERVAL n unit): day-time intervals floor the
    // epoch-second grid; the three calendar moduli CH accepts most often
    // (month/quarter/year) land on trunc. Literal intervals only — the
    // grid must be known at plan time.
    "toStartOfInterval" -> { args =>
      args(1) match {
        case Literal(micros: Long, _: org.apache.spark.sql.types.DayTimeIntervalType) =>
          require(micros > 0 && micros % 1000000L == 0,
            "toStartOfInterval: whole-second day-time interval required")
          floorSeconds(args.head, micros / 1000000L)
        case Literal(months: Byte, _: org.apache.spark.sql.types.YearMonthIntervalType) =>
          monthGridTrunc(months.toInt, args.head)
        case Literal(months: Int, _: org.apache.spark.sql.types.YearMonthIntervalType) =>
          monthGridTrunc(months, args.head)
        case other => throw new IllegalArgumentException(
          s"toStartOfInterval expects a literal INTERVAL as its second argument, got $other")
      }
    },
    // strings, sixth batch
    "editDistance" -> (args => Levenshtein(args.head, args(1))),
    "levenshteinDistance" -> (args => Levenshtein(args.head, args(1))),
    "countMatches" -> (args => RegExpCount(args.head, args(1))),
    "initcapUTF8" -> (args => InitCap(one(args))),
    "leftUTF8" -> (args =>
      org.apache.spark.sql.catalyst.expressions.Left(args.head, args(1))),
    "rightUTF8" -> (args =>
      org.apache.spark.sql.catalyst.expressions.Right(args.head, args(1))),
    "translateUTF8" -> (args => StringTranslate(args.head, args(1), args(2))),
    "splitByWhitespace" -> (args =>
      StringSplit(one(args), Literal("\\s+"), Literal(-1))),
    "alphaTokens" -> (args =>
      RegExpExtractAll(one(args), Literal("[a-zA-Z]+"), Literal(0))),
    // URL family — parse_url's Hadoop-compatible component extraction.
    // CH returns '' for an absent component where java.net.URI yields
    // null; extractURLParameter mirrors CH's '' explicitly (the common
    // `!= ''` migration predicate), the rest keep null (CH '' vs null is
    // visible only on already-invalid URLs).
    "protocol" -> (args => parseUrl(one(args), "PROTOCOL")),
    "domain" -> (args => parseUrl(one(args), "HOST")),
    "domainWithoutWWW" -> (args =>
      RegExpReplace(parseUrl(one(args), "HOST"), Literal("^www\\."), Literal(""))),
    "topLevelDomain" -> (args => ElementAt(
      StringSplit(parseUrl(one(args), "HOST"), Literal("\\."), Literal(-1)),
      Literal(-1))),
    "path" -> (args => parseUrl(one(args), "PATH")),
    "pathFull" -> (args => parseUrl(one(args), "FILE")),
    "queryString" -> (args => parseUrl(one(args), "QUERY")),
    "fragment" -> (args => parseUrl(one(args), "REF")),
    "extractURLParameter" -> (args => Coalesce(Seq(
      new ParseUrl(Seq(args.head, Literal("QUERY"), args(1))), Literal("")))),
    "cutQueryString" -> (args =>
      RegExpReplace(one(args), Literal("\\?[^#]*"), Literal(""))),
    "cutFragment" -> (args =>
      RegExpReplace(one(args), Literal("#.*$"), Literal(""))),
    // IPv4 scalars: dotted-quad ↔ UInt32, pure bit arithmetic
    "IPv4NumToString" -> { args =>
      val x = Cast(one(args), org.apache.spark.sql.types.LongType)
      def oct(sh: Int): Expression = Cast(
        BitwiseAnd(ShiftRightUnsigned(x, Literal(sh)), Literal(255L)),
        org.apache.spark.sql.types.StringType)
      new ConcatWs(Seq(Literal("."), oct(24), oct(16), oct(8), oct(0)))
    },
    "IPv4StringToNum" -> (args => ipv4ToNum(one(args))),
    // seventh batch: the coverage-probe closures (round 8) ---------------
    // toIPv4 is the constructor spelling of IPv4StringToNum
    "toIPv4" -> (args => ipv4ToNum(one(args))),
    // FixedString(n) pads with NUL bytes, like CH storage
    "toFixedString" -> (args =>
      StringRPad(args.head, args(1), Literal("\u0000"))),
    // zero-on-zero-divisor arithmetic
    "intDivOrZero" -> { args =>
      val b = Cast(args(1), org.apache.spark.sql.types.LongType)
      If(EqualTo(b, Literal(0L)), Literal(0L),
        IntegralDivide(Cast(args.head, org.apache.spark.sql.types.LongType), b))
    },
    "moduloOrZero" -> { args =>
      val b = Cast(args(1), org.apache.spark.sql.types.LongType)
      If(EqualTo(b, Literal(0L)), Literal(0L),
        Remainder(Cast(args.head, org.apache.spark.sql.types.LongType), b))
    },
    // 2^floor(log2(x)) for x ≥ 1, else 0 — CH's bucket rounding
    "roundToExp2" -> { args =>
      val x = Cast(one(args), org.apache.spark.sql.types.DoubleType)
      If(LessThan(x, Literal(1.0)), Literal(0L),
        ShiftLeft(Literal(1L),
          Cast(Floor(Log2(x)), org.apache.spark.sql.types.IntegerType)))
    },
    // largest array element ≤ x; below the lowest bound → the lowest
    "roundDown" -> { args =>
      val v = UnresolvedNamedLambdaVariable(Seq("graft_rd"))
      val le = LambdaFunction(LessThanOrEqual(v, args.head), Seq(v))
      Coalesce(Seq(ArrayMax(ArrayFilter(args(1), le)), ArrayMin(args(1))))
    },
    // "2,8" — the set bits of the mask as their power-of-two values
    "bitmaskToList" -> { args =>
      val x = Cast(one(args), org.apache.spark.sql.types.LongType)
      val b = UnresolvedNamedLambdaVariable(Seq("graft_bit"))
      val positions = Sequence(Literal(0), Literal(63), None)
      val setBits = ArrayFilter(positions,
        LambdaFunction(Not(EqualTo(
          BitwiseAnd(x, ShiftLeft(Literal(1L), b)), Literal(0L))), Seq(b)))
      val v2 = UnresolvedNamedLambdaVariable(Seq("graft_bit2"))
      val values = ArrayTransform(setBits,
        LambdaFunction(Cast(ShiftLeft(Literal(1L), v2),
          org.apache.spark.sql.types.StringType), Seq(v2)))
      ArrayJoin(values, Literal(","), None)
    },
    // L2 norm — the embedding-column staple
    "arrayNorm" -> { args =>
      val acc = UnresolvedNamedLambdaVariable(Seq("graft_an_acc"))
      val el = UnresolvedNamedLambdaVariable(Seq("graft_an_x"))
      val dbl = Cast(el, org.apache.spark.sql.types.DoubleType)
      Sqrt(ArrayAggregate(one(args), Literal(0.0),
        LambdaFunction(Add(acc, Multiply(dbl, dbl)), Seq(acc, el)),
        LambdaFunction.identity))
    },
    // CH timeSlot rounds to the half-hour grid
    "timeSlot" -> (args => floorSeconds(one(args), 1800L)),
    // bit scalars, sixth batch. Rotates are 64-bit (CH rotates within the
    // argument's own width; migrate narrower columns via the cast names).
    "bitTest" -> (args => If(
      Not(EqualTo(BitwiseAnd(Cast(args.head, org.apache.spark.sql.types.LongType),
        ShiftLeft(Literal(1L), Cast(args(1), org.apache.spark.sql.types.IntegerType))),
        Literal(0L))), Literal(1), Literal(0))),
    "bitTestAll" -> { args =>
      val mask = bitMask(args.tail)
      If(EqualTo(BitwiseAnd(Cast(args.head,
        org.apache.spark.sql.types.LongType), mask), mask), Literal(1), Literal(0))
    },
    "bitTestAny" -> { args =>
      val mask = bitMask(args.tail)
      If(Not(EqualTo(BitwiseAnd(Cast(args.head,
        org.apache.spark.sql.types.LongType), mask), Literal(0L))),
        Literal(1), Literal(0))
    },
    "bitRotateLeft" -> { args =>
      val x = Cast(args.head, org.apache.spark.sql.types.LongType)
      val n = Cast(args(1), org.apache.spark.sql.types.IntegerType)
      BitwiseOr(ShiftLeft(x, n), ShiftRightUnsigned(x, Subtract(Literal(64), n)))
    },
    "bitRotateRight" -> { args =>
      val x = Cast(args.head, org.apache.spark.sql.types.LongType)
      val n = Cast(args(1), org.apache.spark.sql.types.IntegerType)
      BitwiseOr(ShiftRightUnsigned(x, n), ShiftLeft(x, Subtract(Literal(64), n)))
    },
    "bitHammingDistance" -> (args => BitwiseCount(BitwiseXor(
      Cast(args.head, org.apache.spark.sql.types.LongType),
      Cast(args(1), org.apache.spark.sql.types.LongType)))),
    // math scalars
    "exp2" -> (args => Pow(Literal(2.0d), one(args))),
    "exp10" -> (args => Pow(Literal(10.0d), one(args))),
    "intExp2" -> (args => ShiftLeft(Literal(1L),
      Cast(one(args), org.apache.spark.sql.types.IntegerType))),
    "roundBankers" -> (args => BRound(args.head,
      if (args.length > 1) args(1) else Literal(0))),
    "isInfinite" -> (args => EqualTo(
      Abs(Cast(one(args), org.apache.spark.sql.types.DoubleType)),
      Literal(Double.PositiveInfinity))),
    "isFinite" -> { args =>
      val d = Cast(one(args), org.apache.spark.sql.types.DoubleType)
      And(Not(IsNaN(d)), Not(EqualTo(Abs(d), Literal(Double.PositiveInfinity))))
    },
    // JSON, sixth batch: whole-document forms take the node itself; with
    // trailing keys the same CH path grammar as JSONExtract* descends
    // first. JSONLength covers arrays (element count) and objects (key
    // count) via the coalesce.
    "JSONLength" -> (args => Coalesce(Seq(
      LengthOfJsonArray(jsonNode(args)), Size(JsonObjectKeys(jsonNode(args)))))),
    "JSONExtractKeys" -> (args => JsonObjectKeys(jsonNode(args))),
    "JSONExtractRaw" -> (args => jsonNode(args)),
    "toJSONString" -> (args => new StructsToJson(one(args))),
    // simpleJSONExtract* (the visitParam legacy family): top-level field
    // access only in CH — the single-key JSONExtract path is a superset
    "simpleJSONExtractString" -> (args => jsonExtract(args)),
    "simpleJSONExtractInt" -> (args =>
      Cast(jsonExtract(args), org.apache.spark.sql.types.LongType)),
    "simpleJSONExtractFloat" -> (args =>
      Cast(jsonExtract(args), org.apache.spark.sql.types.DoubleType)),
    "simpleJSONHas" -> (args => IsNotNull(jsonExtract(args))),
    // arrays, sixth batch
    "arrayPushFront" -> (args =>
      Concat(Seq(CreateArray(Seq(args(1))), args.head))),
    "arrayPopFront" -> (args => Slice(args.head, Literal(2),
      greatestZero(Subtract(Size(args.head), Literal(1))))),
    "arrayResize" -> { args =>
      if (args.length < 3)
        throw new IllegalArgumentException(
          "arrayResize requires an explicit fill element (arr, size, fill) — " +
            "ClickHouse's typed zero default is not reconstructible from SQL text")
      val arr = args.head; val n = args(1)
      If(GreaterThanOrEqual(Size(arr), n), Slice(arr, Literal(1), n),
        Concat(Seq(arr, ArrayRepeat(args(2), Subtract(n, Size(arr))))))
    },
    "arrayReverseSort" -> (args => new SortArray(one(args), Literal(false))),
    "arrayRotateLeft" -> (args => rotateLeft(args.head, args(1))),
    "arrayRotateRight" -> (args =>
      rotateLeft(args.head, UnaryMinus(Cast(args(1),
        org.apache.spark.sql.types.IntegerType)))),
    "arrayElementOrNull" -> (args => new TryElementAt(args.head, args(1))),
    // arrayFold's lambda is (acc, x) — exactly aggregate()'s merge shape
    "arrayFold" -> (args =>
      ArrayAggregate(args(1), args(2), validateLambda(args.head),
        LambdaFunction.identity)),
    "arrayJaccardIndex" -> (args => Divide(
      Cast(Size(ArrayIntersect(args.head, args(1))),
        org.apache.spark.sql.types.DoubleType),
      Cast(Size(ArrayUnion(args.head, args(1))),
        org.apache.spark.sql.types.DoubleType))),
    // maps, sixth batch
    "mapContains" -> (args => ArrayContains(MapKeys(args.head), args(1))),
    "mapFromArrays" -> (args => MapFromArrays(args.head, args(1))),
    "mapFilter" -> (args => MapFilter(args(1), validateLambda(args.head))),
    // aggregates, sixth batch
    "avgWeighted" -> (args => Divide(
      Cast(Sum(Multiply(args.head, args(1))).toAggregateExpression(),
        org.apache.spark.sql.types.DoubleType),
      Cast(Sum(args(1)).toAggregateExpression(),
        org.apache.spark.sql.types.DoubleType))),
    "sumCount" -> (args => CreateStruct(Seq(
      Sum(one(args)).toAggregateExpression(),
      Count(Seq(one(args))).toAggregateExpression()))),
    // CH skewPop ≡ Spark's population skewness; CH kurtPop is the RAW
    // fourth moment m4/m2² where Spark reports EXCESS kurtosis (−3)
    "skewPop" -> (args => Skewness(one(args))),
    "kurtPop" -> (args =>
      Add(Kurtosis(one(args)).toAggregateExpression(), Literal(3.0d))),
    // groupArraySorted(n)(x) params-first (ClickHouseSql flattens the
    // two-list call): smallest n values, ascending
    "groupArraySorted" -> (args => Slice(
      new SortArray(CollectList(args(1)).toAggregateExpression(),
        Literal(true)), Literal(1), args.head)),
    // boundingRatio(x, y): slope of the bounding box — (y@max-x − y@min-x)
    // / (max-x − min-x), composed from argMin/argMax/min/max partials
    "boundingRatio" -> (args => Divide(
      Cast(Subtract(MaxBy(args(1), args.head).toAggregateExpression(),
        MinBy(args(1), args.head).toAggregateExpression()),
        org.apache.spark.sql.types.DoubleType),
      Cast(Subtract(Max(args.head).toAggregateExpression(),
        Min(args.head).toAggregateExpression()),
        org.apache.spark.sql.types.DoubleType))),
    // CH transform(x, from, to[, default]) — value remapping. The CH
    // name collides with Spark's higher-order transform(arr, lambda);
    // ClickHouseSql.rewriteChTransform renames 3/4-argument calls here
    // (arg count separates the two grammars). Array-position lookup,
    // evaluated only when found — no out-of-bounds under ANSI; a
    // missing default returns x itself, as in CH.
    "chTransform" -> { args =>
      if (args.length < 3 || args.length > 4)
        throw new IllegalArgumentException(
          s"transform expects (x, from, to[, default]) — got ${args.length} arguments")
      val pos = ArrayPosition(args(1), args.head)
      If(GreaterThan(pos, Literal(0L)),
        ElementAt(args(2), Cast(pos, org.apache.spark.sql.types.IntegerType)),
        if (args.length > 3) args(3) else args.head)
    },
    // parseDateTimeBestEffort: the common CH ingestion formats tried in
    // order — ISO-with-T, ISO-with-space, date-only, epoch seconds
    // (9–10 digit strings), compact yyyyMMdd, European dd/MM/yyyy.
    // Unparseable input yields NULL (CH's ...OrNull behavior; the
    // throwing variant's extra strictness is not reproducible without
    // a UDF layer, so both names land here — documented difference).
    "parseDateTimeBestEffort" -> (args => bestEffortTimestamp(one(args))),
    "parseDateTimeBestEffortOrNull" -> (args => bestEffortTimestamp(one(args))),
    // ---- seventh batch: search/trim scalars ------------------------------
    // CH `position`, `hex`, `unhex`, `bin` collide with Spark builtins and
    // stay unmapped per the no-shadowing policy. hex/unhex/bin agree with
    // CH anyway; `position` is the one name whose CH argument order is
    // SWAPPED vs the builtin — a documented migration caveat (a text-level
    // swap would hijack valid Spark SQL, which is worse than the caveat).
    "positionCaseInsensitive" -> (args =>
      new StringLocate(Lower(args(1)), Lower(args.head))),
    "multiSearchAny" -> { args =>
      val x = UnresolvedNamedLambdaVariable(Seq("ms_needle"))
      ArrayExists(args(1), LambdaFunction(
        GreaterThan(new StringLocate(x, args.head), Literal(0)), Seq(x)))
    },
    // CH map arithmetic: union of keys, per-key sum/difference (absent
    // key counts as zero) — map_zip_with with a coalescing lambda
    "mapAdd" -> (args => mapArith(args, subtract = false)),
    "mapSubtract" -> (args => mapArith(args, subtract = true)),
    "trimLeft" -> (args => StringTrimLeft(one(args))),
    "trimRight" -> (args => StringTrimRight(one(args))),
    "toNullable" -> (args => one(args)), // type-system marker: value identity
    // ---- temporal names --------------------------------------------------
    // (CH monthName stays unmapped — Spark's monthname() builtin owns the
    // name, see the note beside toLastDayOfMonth; dateName('month', d)
    // below provides the full-name form)
    "dateName" -> { args =>
      val part = args.head match {
        case Literal(s, _) if s != null =>
          s.toString.toLowerCase(java.util.Locale.ROOT)
        case _ => throw new IllegalArgumentException(
          "dateName: part must be a string literal")
      }
      def str(e: Expression) =
        Cast(e, org.apache.spark.sql.types.StringType)
      val ts = Cast(args(1), org.apache.spark.sql.types.TimestampType)
      part match {
        case "year" => str(Year(args(1)))
        case "quarter" => str(Quarter(args(1)))
        case "month" => new DateFormatClass(ts, Literal("MMMM"))
        case "week" => str(WeekOfYear(args(1)))
        case "dayofyear" => str(DayOfYear(args(1)))
        case "day" => str(DayOfMonth(args(1)))
        case "weekday" => new DateFormatClass(ts, Literal("EEEE"))
        case "hour" => str(Hour(ts))
        case "minute" => str(Minute(ts))
        case "second" => str(Second(ts))
        case other => throw new IllegalArgumentException(
          s"dateName: unsupported part '$other'")
      }
    },
    "toIntervalDay" -> (args => new MakeDTInterval(one(args))),
    "toIntervalHour" -> (args => new MakeDTInterval(Literal(0), one(args))),
    "toIntervalMinute" -> (args =>
      new MakeDTInterval(Literal(0), Literal(0), one(args))),
    "toIntervalMonth" -> (args => MakeYMInterval(Literal(0), one(args))),
    "toIntervalYear" -> (args => MakeYMInterval(one(args), Literal(0))),
    // ---- geo -------------------------------------------------------------
    // haversine on a 6371 km mean-radius sphere, in meters. ClickHouse
    // uses an ellipsoid-corrected constant; agreement is within ~0.3% —
    // documented difference, not an oracle surface.
    "greatCircleDistance" -> (args => haversineMeters(args)),
    "geoDistance" -> (args => haversineMeters(args)),
    // ---- aggregates, seventh batch --------------------------------------
    // sample-adjusted skewness/kurtosis from the population aggregates +
    // count: skewSamp = skew_pop·((n−1)/n)^1.5, kurtSamp (raw, non-excess)
    // = (kurt_pop_excess+3)·((n−1)/n)²
    "skewSamp" -> { args =>
      val n = Cast(Count(Seq(one(args))).toAggregateExpression(),
        org.apache.spark.sql.types.DoubleType)
      Multiply(Skewness(one(args)).toAggregateExpression(),
        Pow(Divide(Subtract(n, Literal(1.0)), n), Literal(1.5)))
    },
    "kurtSamp" -> { args =>
      val n = Cast(Count(Seq(one(args))).toAggregateExpression(),
        org.apache.spark.sql.types.DoubleType)
      Multiply(Add(Kurtosis(one(args)).toAggregateExpression(), Literal(3.0d)),
        Pow(Divide(Subtract(n, Literal(1.0)), n), Literal(2.0)))
    },
    // ---- aggregates, eighth batch (r8 probe closures) --------------------
    // numeric-stability spellings: Spark's Welford/compensated kernels ARE
    // the stable algorithm, so the *Stable/Kahan names are aliases;
    // sumWithOverflow diverges documented-ly (Spark widens, CH wraps)
    "sumKahan" -> (args => Sum(Cast(one(args),
      org.apache.spark.sql.types.DoubleType))),
    "sumWithOverflow" -> (args => Sum(one(args))),
    "stddevPopStable" -> (args => StddevPop(one(args))),
    "stddevSampStable" -> (args => StddevSamp(one(args))),
    "varPopStable" -> (args => VariancePop(one(args))),
    "varSampStable" -> (args => VarianceSamp(one(args))),
    // simpleLinearRegression(x, y) → (k, b): k = cov_pop/var_pop, b =
    // avg(y) − k·avg(x) — composed from partial-aggregable kernels
    "simpleLinearRegression" -> { args =>
      val x = Cast(args.head, org.apache.spark.sql.types.DoubleType)
      val y = Cast(args(1), org.apache.spark.sql.types.DoubleType)
      val k = Divide(CovPopulation(x, y).toAggregateExpression(),
        VariancePop(x).toAggregateExpression())
      val b = Subtract(Average(y).toAggregateExpression(),
        Multiply(k, Average(x).toAggregateExpression()))
      CreateNamedStruct(Seq(Literal("k"), k, Literal("b"), b))
    },
    // order-dependent or whole-relation aggregates: no distributed engine
    // should promise block order / these need a plan, not a function —
    // throw with the registry's scale-safe re-expression
    "deltaSum" -> (_ => throw new IllegalArgumentException(
      "deltaSum depends on block order — rewrite with a keyed window " +
        "over an explicit ORDER BY (the q70_delta_sum recipe: " +
        "greatest(x - lag(x), 0) summed)")),
    "deltaSumTimestamp" -> (_ => throw new IllegalArgumentException(
      "deltaSumTimestamp depends on block order — order by the " +
        "timestamp explicitly and sum greatest(x - lag(x), 0) over a " +
        "keyed window (q70_delta_sum recipe)")),
    "rankCorr" -> (_ => throw new IllegalArgumentException(
      "rankCorr needs global ranks — rank both measures with " +
        "graft.plans.GroupedPrefix.withRank and corr() the ranks " +
        "(the q71_rank_corr recipe)")),
    "entropy" -> (_ => throw new IllegalArgumentException(
      "entropy aggregates the VALUE DISTRIBUTION — group by the value, " +
        "count, and sum -p*log2(p) over the counts relation " +
        "(the q69_entropy recipe)")),
    "intervalLengthSum" -> (_ => throw new IllegalArgumentException(
      "intervalLengthSum is a sweep over interval endpoints — use the " +
        "q66_interval_union_len recipe (GroupedPrefix running max of " +
        "ends vs starts)")),
    "maxIntersections" -> (_ => throw new IllegalArgumentException(
      "maxIntersections is a sweep over ±1 endpoint deltas — use the " +
        "q65_max_intersections recipe (GroupedPrefix running sum)")),
    "corrMatrix" -> (_ => throw new IllegalArgumentException(
      "corrMatrix returns a matrix — compute pairwise corr() columns " +
        "(the q113_corr_matrix recipe)")),
    "studentTTest" -> (_ => throw new IllegalArgumentException(
      "studentTTest returns (t, p) — compose per-group mean/var/count " +
        "partials (the q68_ttest recipe); p-values need a CDF, which " +
        "belongs in the report layer")),
    "welchTTest" -> (_ => throw new IllegalArgumentException(
      "welchTTest returns (t, p) — compose per-group mean/var/count " +
        "partials (the q68_ttest recipe)")),
    "meanZTest" -> (_ => throw new IllegalArgumentException(
      "meanZTest returns (z, p) — compose per-group mean/var/count " +
        "partials (the q68_ttest recipe)")),
    "groupArrayLast" -> (_ => throw new IllegalArgumentException(
      "groupArrayLast depends on insertion order — rewrite as a keyed " +
        "window over an explicit ORDER BY (slice of " +
        "collect_list over the ordered window, the groupArraySorted " +
        "shape)")),
    "groupArraySample" -> (_ => throw new IllegalArgumentException(
      "groupArraySample samples an UNORDERED collect (partition-order " +
        "nondeterminism) — rewrite as collect over a deterministic " +
        "sort key, then arrayRandomSample(arr, k, seed) (the seeded " +
        "SplitMix64 form)")),
    "meanZTest" -> (_ => throw new IllegalArgumentException(
      "meanZTest aggregates both samples' moments — rewrite as the " +
        "two-sample z fold over exact sums/counts (the q140_meanztest " +
        "recipe)")),
    "quantileInterpolatedWeighted" -> (_ =>
      throw new IllegalArgumentException(
        "quantileInterpolatedWeighted interpolates the weighted ECDF " +
          "— quantileExactWeighted(p)(x, w) is the supported exact " +
          "form (Spark Percentile takes frequencies natively); for " +
          "the interpolated variant rewrite via the " +
          "q86_weighted_quantile staged-sort recipe")),
    "sequenceNextNode" -> (_ => throw new IllegalArgumentException(
      "sequenceNextNode walks per-user event chains — rewrite as the " +
        "ordered per-user window + next-event lead() (the " +
        "q89_next_node recipe)")),
    "groupBitmapAnd" -> (_ => throw new IllegalArgumentException(
      "groupBitmapAnd intersects per-row bitmaps — over scalar rows " +
        "that is `count(DISTINCT x) = 1` logic; over bitmap columns " +
        "rewrite as array_intersect folds (q55_bitmap_distinct " +
        "recipe)")),
    // retention(c1, …, ck): r1 = any row satisfied c1; ri = r1 AND any
    // row satisfied ci — the CH cohort-retention aggregate as an array of
    // 0/1 ints composed from conditional-max partials
    "retention" -> { args =>
      def flag(c: Expression) =
        Max(CaseWhen(Seq((c, Literal(1))), Literal(0))).toAggregateExpression()
      val first = flag(args.head)
      CreateArray(first +: args.tail.map(c => Multiply(first, flag(c))))
    },
    // histogram(k)(x) — CH's adaptive histogram; Spark's equivalent
    // NumericHistogram sketch (same bins-merge algorithm family).
    // Params-first after rewriteParamCall flattening.
    "histogram" -> (args => new HistogramNumeric(args(1), args.head)),
    // sketch-family distinct counts all land on HLL++ (CH's theta/combined
    // variants differ in sketch internals, not contract)
    "uniqTheta" -> (args => HyperLogLogPlusPlus(one(args))),
    "uniqCombined64" -> (args => HyperLogLogPlusPlus(one(args))),
    // quantileDeterministic(p)(x, det): the determinism seed exists so CH
    // sampling reservoirs reproduce — exact Percentile is already
    // deterministic, so the seed argument is accepted and ignored
    "quantileDeterministic" -> (args => new Percentile(args(1), args.head)),
    // ---- eighth batch: hashes (CH binary-return forms), string/URL/
    // date long tail. chMD5/chSHA* exist because Spark's builtin
    // md5/sha1/sha2 return lowercase HEX STRINGS while CH's MD5/SHA*
    // return raw bytes (FixedString) — so the CH idiom hex(MD5(x))
    // would double-hex. ClickHouseSql.rewriteHashNames splices the
    // case-sensitive CH spellings onto these; unhex restores the byte
    // contract, and Spark's uppercase hex() then matches CH exactly.
    "chMD5" -> (args => Unhex(Md5(Cast(one(args),
      org.apache.spark.sql.types.BinaryType)))),
    "chSHA1" -> (args => Unhex(Sha1(Cast(one(args),
      org.apache.spark.sql.types.BinaryType)))),
    "chSHA224" -> (args => Unhex(Sha2(Cast(one(args),
      org.apache.spark.sql.types.BinaryType), Literal(224)))),
    "chSHA256" -> (args => Unhex(Sha2(Cast(one(args),
      org.apache.spark.sql.types.BinaryType), Literal(256)))),
    // string long tail
    "substringIndex" -> (args =>
      SubstringIndex(args.head, args(1), args(2))),
    "positionCaseInsensitiveUTF8" -> (args =>
      new StringLocate(Lower(args(1)), Lower(args.head))),
    "startsWithUTF8" -> (args => StartsWith(args.head, args(1))),
    "endsWithUTF8" -> (args => EndsWith(args.head, args(1))),
    "leftPadUTF8" -> (args => StringLPad(args.head, args(1),
      if (args.length > 2) args(2) else Literal(" "))),
    "rightPadUTF8" -> (args => StringRPad(args.head, args(1),
      if (args.length > 2) args(2) else Literal(" "))),
    // ngrams(s, n): all length-n character slices, in order
    "ngrams" -> { args =>
      val i = UnresolvedNamedLambdaVariable(Seq("graft_ng_i"))
      val n = Cast(args(1), org.apache.spark.sql.types.IntegerType)
      val count = Subtract(Add(Length(args.head), Literal(1)), n)
      If(LessThan(count, Literal(1)),
        Cast(CreateArray(Nil), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
        ArrayTransform(new Sequence(Literal(1), count),
          LambdaFunction(Substring(args.head, i, n), Seq(i))))
    },
    // date constructors and relative-epoch counters
    "makeDate" -> (args => MakeDate(args.head, args(1), args(2))),
    "makeDateTime" -> (args => MakeTimestamp(args.head, args(1), args(2),
      args(3), args(4),
      Cast(args(5), org.apache.spark.sql.types.DecimalType(8, 6)))),
    // chMonthName: spliced from CH's `monthName` spelling by
    // ClickHouseSql.rewriteNameOverrides — Spark 4 ships a builtin
    // `monthname` that returns the SHORT form ("Mar"), so registering
    // the CH name directly is skipped by the exists-check. A literal
    // table, not a format pattern: CH monthName is locale-independent
    // full English.
    "chMonthName" -> (args => ElementAt(CreateArray(Seq("January",
      "February", "March", "April", "May", "June", "July", "August",
      "September", "October", "November", "December").map(Literal(_))),
      Month(Cast(one(args), org.apache.spark.sql.types.DateType)))),
    "toStartOfSecond" -> (args => TruncTimestamp(Literal("second"), one(args))),
    "toRelativeDayNum" -> (args => DateDiff(
      Cast(one(args), org.apache.spark.sql.types.DateType),
      Cast(Literal("1970-01-01"), org.apache.spark.sql.types.DateType))),
    "toRelativeHourNum" -> (args => IntegralDivide(
      Cast(one(args), org.apache.spark.sql.types.LongType), Literal(3600L))),
    "toRelativeMinuteNum" -> (args => IntegralDivide(
      Cast(one(args), org.apache.spark.sql.types.LongType), Literal(60L))),
    "toRelativeSecondNum" -> (args =>
      Cast(one(args), org.apache.spark.sql.types.LongType)),
    // decimal casts: scale must be a literal (CH's contract too)
    "toDecimal32" -> (args => Cast(args.head,
      org.apache.spark.sql.types.DecimalType(9, decimalScale(args)))),
    "toDecimal64" -> (args => Cast(args.head,
      org.apache.spark.sql.types.DecimalType(18, decimalScale(args)))),
    "toDecimal128" -> (args => Cast(args.head,
      org.apache.spark.sql.types.DecimalType(38, decimalScale(args)))),
    // numeric odds and ends. (CH `sign` is NOT overridden: Spark's
    // builtin sign() already resolves — it returns -1.0/0.0/1.0 as
    // DOUBLE where CH returns Int8; value-equal in comparisons.)
    "ifNotFinite" -> { args =>
      val d = Cast(args.head, org.apache.spark.sql.types.DoubleType)
      If(And(Not(IsNaN(d)),
        Not(EqualTo(Abs(d), Literal(Double.PositiveInfinity)))),
        args.head, args(1))
    },
    // URL long tail. netloc ≈ HOST (CH also keeps user:password@ and
    // :port — the sf tables' URLs carry neither); the significant-
    // subdomain pair uses label position (multi-part public suffixes
    // like co.uk resolve one label short — CH consults a suffix list).
    "netloc" -> (args => parseUrl(one(args), "HOST")),
    "firstSignificantSubdomain" -> { args =>
      val labels = StringSplit(parseUrl(one(args), "HOST"),
        Literal("\\."), Literal(-1))
      ElementAt(labels, Literal(-2))
    },
    "cutToFirstSignificantSubdomain" -> { args =>
      val labels = StringSplit(parseUrl(one(args), "HOST"),
        Literal("\\."), Literal(-1))
      ArrayJoin(Slice(labels,
        Greatest(Seq(Subtract(Size(labels), Literal(1)), Literal(1))),
        Literal(2)), Literal("."), None)
    },
    "encodeURLComponent" -> (args => UrlEncode(one(args))),
    "decodeURLComponent" -> (args => UrlDecode(one(args))),
    "generateUUIDv4" -> (_ => Uuid()),
    // ---- ninth batch: FnProbe radar gaps ---------------------------------
    // tokens: split on non-alphanumeric runs, empties dropped (CH's
    // ASCII tokenizer)
    "tokens" -> { args =>
      val x = UnresolvedNamedLambdaVariable(Seq("graft_tk_x"))
      ArrayFilter(
        StringSplit(one(args), Literal("[^A-Za-z0-9]+"), Literal(-1)),
        LambdaFunction(Not(EqualTo(x, Literal(""))), Seq(x)))
    },
    // CH format('{} and {}', a, b): positional {} / indexed {n}
    // placeholders → format_string's %s / %n$s (pattern must be a
    // literal, as in CH)
    "format" -> { args =>
      require(args.nonEmpty && args.head.foldable,
        "format: the pattern must be a string literal")
      val pat = String.valueOf(args.head.eval())
      val sb = new StringBuilder
      var i = 0
      while (i < pat.length) {
        val c = pat.charAt(i)
        if (c == '{') {
          val close = pat.indexOf('}', i)
          require(close > 0, s"format: unclosed placeholder in $pat")
          val idx = pat.substring(i + 1, close)
          sb.append(if (idx.isEmpty) "%s" else s"%${idx.toInt + 1}$$s")
          i = close + 1
        } else {
          if (c == '%') sb.append("%%") else sb.append(c)
          i += 1
        }
      }
      FormatString(Literal(sb.toString) +: args.tail: _*)
    },
    "splitByRegexp" -> (args =>
      StringSplit(args(1), args.head, Literal(-1))),
    // extractGroups(s, re): every capture group of the FIRST match;
    // the regex must be a literal so the group count is known at plan
    // time (CH requires a constant pattern too)
    "extractGroups" -> { args =>
      require(args.length == 2 && args(1).foldable,
        "extractGroups(haystack, pattern): pattern must be a literal")
      val re = String.valueOf(args(1).eval())
      val n = java.util.regex.Pattern.compile(re).matcher("").groupCount()
      require(n > 0, s"extractGroups: pattern has no capture groups: $re")
      CreateArray((1 to n).map(i =>
        RegExpExtract(args.head, args(1), Literal(i)): Expression))
    },
    // arrayShingles(arr, n): every length-n contiguous window, in order
    "arrayShingles" -> { args =>
      val i = UnresolvedNamedLambdaVariable(Seq("graft_sh_i"))
      val n = Cast(args(1), org.apache.spark.sql.types.IntegerType)
      val count = Subtract(Add(Size(args.head), Literal(1)), n)
      // Slice(x, 1, max(count, 0)) empties the result when count ≤ 0
      // while keeping the element type (Sequence needs an ascending
      // range, so the generator uses max(count, 1))
      Slice(
        ArrayTransform(
          new Sequence(Literal(1), Greatest(Seq(count, Literal(1)))),
          LambdaFunction(Slice(args.head, i, n), Seq(i))),
        Literal(1), Greatest(Seq(count, Literal(0))))
    },
    // first-appearance dense ids (array_distinct preserves first-
    // appearance order, so the distinct position IS the dense id)
    "arrayEnumerateDense" -> { args =>
      val x = UnresolvedNamedLambdaVariable(Seq("graft_ed_x"))
      ArrayTransform(one(args),
        LambdaFunction(ArrayPosition(ArrayDistinct(one(args)), x), Seq(x)))
    },
    "sigmoid" -> { args =>
      val d = Cast(one(args), org.apache.spark.sql.types.DoubleType)
      Divide(Literal(1.0), Add(Literal(1.0), Exp(UnaryMinus(d))))
    },
    // ISO week-numbering year = calendar year of that week's Thursday
    "toISOYear" -> { args =>
      val d = Cast(one(args), org.apache.spark.sql.types.DateType)
      Year(DateAdd(d, Subtract(Literal(3), WeekDay(d))))
    },
    "dateTrunc" -> (args => TruncTimestamp(args.head,
      Cast(args(1), org.apache.spark.sql.types.TimestampType))),
    // timeSlots(start, duration[, size=1800]): the slot-grid starts
    // covering [start, start+duration]; size must be a literal (CH
    // requires a constant there too)
    "timeSlots" -> { args =>
      val size =
        if (args.length > 2) {
          require(args(2).foldable, "timeSlots: size must be a literal")
          String.valueOf(args(2).eval()).toLong
        } else 1800L
      val startL = Cast(args.head, org.apache.spark.sql.types.LongType)
      val endTs = Cast(Add(startL,
        Cast(args(1), org.apache.spark.sql.types.LongType)),
        org.apache.spark.sql.types.TimestampType)
      new Sequence(floorSeconds(args.head, size), floorSeconds(endTs, size),
        Literal(new org.apache.spark.unsafe.types.CalendarInterval(
          0, 0, size * 1000000L)))
    },
    // literal normalization only (CH also collapses IN-lists)
    "normalizeQuery" -> (args =>
      RegExpReplace(
        RegExpReplace(one(args), Literal("'[^']*'"), Literal("?")),
        Literal("\\b\\d+(\\.\\d+)?\\b"), Literal("?"))),
    // exact weighted quantile: Spark's Percentile takes a frequency
    // column natively — CH quantileExactWeighted(p)(x, w) is exactly it
    "quantileExactWeighted" -> (args =>
      new Percentile(args(1), args.head, args(2))),
    // exact no-interpolation quantiles: Low picks the lower of two
    // straddling elements (percentile_disc ascending), High the upper
    // (percentile_disc descending at 1 − p)
    "quantileExactLow" -> (args => PercentileDisc(args(1), args.head)),
    "quantileExactHigh" -> (args => PercentileDisc(args(1),
      Subtract(Literal(1.0),
        Cast(args.head, org.apache.spark.sql.types.DoubleType)),
      reverse = true)),
    // exactly one distinct non-null value ⟺ min = max
    "singleValueOrNull" -> { args =>
      def agg(f: org.apache.spark.sql.catalyst.expressions.aggregate
        .AggregateFunction): Expression = f.toAggregateExpression()
      If(EqualTo(agg(Min(args.head)), agg(Max(args.head))),
        agg(Min(args.head)), Literal.create(null,
          org.apache.spark.sql.types.NullType))
    },
    // ---- order-dependent names: loud migration guidance ------------------
    "runningDifference" -> (_ => throw new IllegalArgumentException(
      "runningDifference depends on ClickHouse block order — rewrite as " +
        "x - lag(x) OVER (ORDER BY <explicit order>)")),
    "neighbor" -> (_ => throw new IllegalArgumentException(
      "neighbor depends on ClickHouse block order — rewrite as " +
        "lag/lead OVER (ORDER BY <explicit order>)")),
    "exponentialMovingAverage" -> (_ => throw new IllegalArgumentException(
      "exponentialMovingAverage depends on row order — rewrite as an " +
        "explicit window aggregation (see q09's running frames)")),
    "groupArrayMovingSum" -> (_ => throw new IllegalArgumentException(
      "groupArrayMovingSum depends on insertion order — rewrite as " +
        "sum OVER (ORDER BY … ROWS n PRECEDING) (see q09)")),
    "groupArrayMovingAvg" -> (_ => throw new IllegalArgumentException(
      "groupArrayMovingAvg depends on insertion order — rewrite as " +
        "avg OVER (ORDER BY … ROWS n PRECEDING) (see q09)")),
    "cramersV" -> (_ => throw new IllegalArgumentException(
      "cramersV aggregates the joint distribution — build the " +
        "contingency cells with one groupBy and fold chi2 from them " +
        "(the q72_cramers_v recipe)")),
    "cramersVBiasCorrected" -> (_ => throw new IllegalArgumentException(
      "cramersVBiasCorrected aggregates the joint distribution — " +
        "build the contingency cells with one groupBy and fold the " +
        "Bergsma-corrected V from them (the q144_cramers_bc recipe)")),
    "kolmogorovSmirnovTest" -> (_ => throw new IllegalArgumentException(
      "kolmogorovSmirnovTest needs both samples' rank structure — " +
        "rewrite as the pooled-rank ECDF gap fold (the q130_ks_test " +
        "recipe)")),
    "maxIntersectionsPosition" -> (_ => throw new IllegalArgumentException(
      "maxIntersectionsPosition is the argmax twin of " +
        "maxIntersections — rewrite as the +1/-1 boundary sweep " +
        "keeping the position of the running max (the " +
        "q65_max_intersections recipe)")),
    "groupArrayInsertAt" -> (_ => throw new IllegalArgumentException(
      "groupArrayInsertAt builds a position-indexed array — rewrite " +
        "as collect_list of (pos, value) structs + array rebuild over " +
        "sequence(0, max(pos)) (the q95_minmax_map recipe); positional " +
        "collisions need YOUR tie rule, which CH leaves unspecified")),
    "aggThrow" -> (_ => throw new IllegalArgumentException(
      "aggThrow is ClickHouse's fault-injection test aggregate — " +
        "rewrite tests against raise_error(), or drop it (it computes " +
        "nothing)")),
    "categoricalInformationValue" -> (_ =>
      throw new IllegalArgumentException(
        "categoricalInformationValue aggregates per-category " +
          "good/bad splits — rewrite as the category groupBy + WoE " +
          "fold (the q131_info_value recipe)")),
    "nonNegativeDerivative" -> (_ => throw new IllegalArgumentException(
      "nonNegativeDerivative is a window function over (value, ts) — " +
        "rewrite as lag() deltas clamped at zero over a PARTITION BY " +
        "key ORDER BY ts window (the q110_nonneg_derivative recipe)")),
    // CH's internal Nothing aggregate: NULL over any input
    "nothing" -> (_ => Literal.create(null,
      org.apache.spark.sql.types.NullType)),
    "contingency" -> (_ => throw new IllegalArgumentException(
      "contingency aggregates the joint distribution — build the " +
        "contingency cells with one groupBy and fold the coefficient " +
        "from them (the q72_cramers_v recipe)")),
    "theilsU" -> (_ => throw new IllegalArgumentException(
      "theilsU aggregates the joint distribution — build the " +
        "contingency cells with one groupBy and fold conditional " +
        "entropy from them (the q72/q69 recipes)")),
    "largestTriangleThreeBuckets" -> (_ => throw new IllegalArgumentException(
      "largestTriangleThreeBuckets needs the series in time order — " +
        "use the bucketed LTTB plan (the q97_lttb recipe)")),
    "groupConcat" -> (_ => throw new IllegalArgumentException(
      "groupConcat depends on insertion order — rewrite as " +
        "array_join(array_sort(collect_list(x)), sep) with an explicit " +
        "order (the q28_collect_sorted recipe)")),
    "arrayAUC" -> (_ => throw new IllegalArgumentException(
      "arrayAUC over per-row arrays hides the corpus-level statistic — " +
        "compute exact AUC relationally from the score ranks (the " +
        "q112_auc recipe)")),
    // ---- tenth batch: FnProbe radar gaps ---------------------------------
    // replaceOne: first occurrence only (locate → splice; non-literal
    // needles supported, unlike a regex quote approach)
    "replaceOne" -> { args =>
      val pos = new StringLocate(args(1), args.head)
      If(EqualTo(pos, Literal(0)), args.head,
        Concat(Seq(
          Substring(args.head, Literal(1), Subtract(pos, Literal(1))),
          args(2),
          Substring(args.head, Add(pos, Length(args(1))),
            Literal(Int.MaxValue)))))
    },
    // multiSearchFirstIndex: 1-based index of the needle with the
    // LEFTMOST occurrence (array order breaks position ties) — CH's
    // contract, not first-needle-that-matches
    "multiSearchFirstIndex" -> { args =>
      val n = UnresolvedNamedLambdaVariable(Seq("graft_msf_n"))
      val p = UnresolvedNamedLambdaVariable(Seq("graft_msf_p"))
      val positions = ArrayTransform(args(1),
        LambdaFunction(new StringLocate(n, args.head), Seq(n)))
      val found = ArrayFilter(positions,
        LambdaFunction(GreaterThan(p, Literal(0)), Seq(p)))
      If(EqualTo(Size(found), Literal(0)), Literal(0),
        ArrayPosition(positions, ArrayMin(found)))
    },
    // chExtract: CH extract(haystack, re) — spliced from `extract(`
    // by ClickHouseSql (Spark's parser owns the EXTRACT(field FROM x)
    // spelling). First capturing group if the pattern has one, else
    // the whole match; '' when no match — CH's contract, which is why
    // the pattern must be a literal (the group choice is plan-time).
    "chExtract" -> { args =>
      val pat = litString(args(1), "extract pattern")
      val group = if (pat.replaceAll("\\\\\\(", "").contains("(")) 1 else 0
      RegExpExtract(args.head, args(1), Literal(group))
    },
    // hash long tail: javaHash IS Java's String.hashCode (Hive's string
    // hash is the same recurrence — Catalyst's HiveHash); CH hiveHash
    // is javaHash with the sign bit zeroed. murmurHash2_64 lands on
    // xxhash64 like the other CH-internal-constant families (same
    // dispersion contract, different values than CH — documented).
    "javaHash" -> (args => HiveHash(args)),
    "hiveHash" -> (args =>
      BitwiseAnd(Cast(HiveHash(args), org.apache.spark.sql.types.LongType),
        Literal(0x7fffffffL))),
    "murmurHash2_64" -> (args => XxHash64(args, 42L)),
    "murmurHash2_32" -> (args => Murmur3Hash(args, 42)),
    "murmurHash3_32" -> (args => Murmur3Hash(args, 42)),
    "murmurHash3_64" -> (args => XxHash64(args, 42L)),
    // isValidJSON: get_json_object('$') is null exactly on malformed
    // input (scalars included — '5' is valid JSON and round-trips)
    "isValidJSON" -> (args =>
      IsNotNull(GetJsonObject(one(args), Literal("$")))),
    // cutURLParameter(url, name): drop one query parameter, healing the
    // separator (mid-list keeps the following param's '&' under the
    // preceding '?'/'&'; list-end drops its own separator)
    "cutURLParameter" -> { args =>
      val q = java.util.regex.Pattern.quote(
        litString(args(1), "cutURLParameter name"))
      val step1 = RegExpReplace(args.head,
        Literal(s"([?&])$q=[^&#]*&"), Literal("$1"))
      RegExpReplace(step1, Literal(s"[?&]$q=[^&#]*"), Literal(""))
    },
    "isIPv4String" -> (args => ChStringKernelExpr(one(args), "isIPv4")),
    "isIPv6String" -> (args => ChStringKernelExpr(one(args), "isIPv6")),
    "arrayWithConstant" -> (args => ArrayRepeat(args(1), args.head)),
    // arrayReduce: literal combinator name over a row-local array
    "arrayReduce" -> { args =>
      val name = litString(args.head, "arrayReduce aggregate name")
        .toLowerCase(java.util.Locale.ROOT)
      val arr = args(1)
      name match {
        case "sum" => arraySumD(arr)
        case "min" => ArrayMin(arr)
        case "max" => ArrayMax(arr)
        case "avg" => Divide(arraySumD(arr),
          Cast(Size(arr), org.apache.spark.sql.types.DoubleType))
        case "count" => Size(arr)
        case "uniqexact" | "uniq" => Size(ArrayDistinct(arr))
        case other => throw new IllegalArgumentException(
          s"arrayReduce: unsupported combinator `$other` — sum/min/max/" +
            "avg/count/uniqExact map; anything stateful should be a " +
            "real aggregate over exploded rows")
      }
    },
    "arrayShiftLeft" -> (args => arrayShift(args, left = true)),
    "arrayShiftRight" -> (args => arrayShift(args, left = false)),
    // vector math: the codegen'd graft kernels (arrays cast to Float64
    // first — CH computes these in Float64 too)
    "dotProduct" -> (args => DotExpr(toDArr(args.head), toDArr(args(1)))),
    "L1Norm" -> { args =>
      val x = UnresolvedNamedLambdaVariable(Seq("graft_l1_x"))
      arraySumD(ArrayTransform(toDArr(one(args)),
        LambdaFunction(Abs(x), Seq(x))))
    },
    "L2Norm" -> (args =>
      Sqrt(DotExpr(toDArr(one(args)), toDArr(one(args))))),
    "LinfNorm" -> { args =>
      val x = UnresolvedNamedLambdaVariable(Seq("graft_li_x"))
      ArrayMax(ArrayTransform(toDArr(one(args)),
        LambdaFunction(Abs(x), Seq(x))))
    },
    "L1Distance" -> { args =>
      val x = UnresolvedNamedLambdaVariable(Seq("graft_l1d_x"))
      val y = UnresolvedNamedLambdaVariable(Seq("graft_l1d_y"))
      arraySumD(ZipWith(toDArr(args.head), toDArr(args(1)),
        LambdaFunction(Abs(Subtract(x, y)), Seq(x, y))))
    },
    "L2Distance" -> (args =>
      Sqrt(Dist2Expr(toDArr(args.head), toDArr(args(1))))),
    "L2SquaredDistance" -> (args =>
      Dist2Expr(toDArr(args.head), toDArr(args(1)))),
    "LinfDistance" -> { args =>
      val x = UnresolvedNamedLambdaVariable(Seq("graft_lid_x"))
      val y = UnresolvedNamedLambdaVariable(Seq("graft_lid_y"))
      ArrayMax(ZipWith(toDArr(args.head), toDArr(args(1)),
        LambdaFunction(Abs(Subtract(x, y)), Seq(x, y))))
    },
    "cosineDistance" -> { args =>
      val (a, b) = (toDArr(args.head), toDArr(args(1)))
      Subtract(Literal(1.0d), Divide(DotExpr(a, b),
        Multiply(Sqrt(DotExpr(a, a)), Sqrt(DotExpr(b, b)))))
    },
    "tupleHammingDistance" -> (args =>
      ChTupleHammingExpr(args.head, args(1))),
    "toTypeName" -> (args => ChTypeNameExpr(one(args))),
    // exact Long 10^n — the earlier Cast(Pow(10.0, n)) form loses
    // exactness past 1e15 (double mantissa), a wrong VALUE at n ≥ 16
    "intExp10" -> (args => ChIntExp10Expr(
      Cast(one(args), org.apache.spark.sql.types.IntegerType))),
    "lgamma" -> (args => ChGammaExpr(
      Cast(one(args), org.apache.spark.sql.types.DoubleType), log = true)),
    "tgamma" -> (args => ChGammaExpr(
      Cast(one(args), org.apache.spark.sql.types.DoubleType), log = false)),
    // roundAge/roundDuration: CH's fixed bucket ladders
    "roundAge" -> (args => bucketLadder(one(args),
      Seq(1L -> 17L, 18L -> 18L, 25L -> 25L, 35L -> 35L, 45L -> 45L,
        55L -> 55L))),
    "roundDuration" -> (args => bucketLadder(one(args),
      Seq(1L, 10L, 30L, 60L, 120L, 180L, 240L, 300L, 600L, 1200L, 1800L,
        3600L, 7200L, 18000L, 36000L).map(v => v -> v))),
    "formatReadableSize" -> (args => ChReadableExpr(
      Cast(one(args), org.apache.spark.sql.types.DoubleType), "size")),
    "formatReadableQuantity" -> (args => ChReadableExpr(
      Cast(one(args), org.apache.spark.sql.types.DoubleType), "quantity")),
    "formatReadableTimeDelta" -> (args => ChReadableExpr(
      Cast(one(args), org.apache.spark.sql.types.DoubleType), "timedelta")),
    "bar" -> (args => ChBarExpr(args)),
    // countDigits: digits of the integral part (CH counts the decimal
    // digits of the value's representation, sign excluded)
    "countDigits" -> (args => Length(Cast(Abs(Cast(one(args),
      org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.types.StringType))),
    "normalizeUTF8NFC" -> (args => ChNormalizeUtf8Expr(one(args), "NFC")),
    "normalizeUTF8NFD" -> (args => ChNormalizeUtf8Expr(one(args), "NFD")),
    "normalizeUTF8NFKC" -> (args => ChNormalizeUtf8Expr(one(args), "NFKC")),
    "normalizeUTF8NFKD" -> (args => ChNormalizeUtf8Expr(one(args), "NFKD")),
    "toValidUTF8" -> (args => ChStringKernelExpr(one(args), "toValidUtf8")),
    "editDistance" -> (args => Levenshtein(args.head, args(1))),
    "levenshteinDistance" -> (args => Levenshtein(args.head, args(1))),
    "jaroWinklerSimilarity" -> (args =>
      ChJaroWinklerExpr(args.head, args(1), winkler = true)),
    "jaroSimilarity" -> (args =>
      ChJaroWinklerExpr(args.head, args(1), winkler = false)),
    "regexpQuoteMeta" -> (args =>
      ChStringKernelExpr(one(args), "regexpQuoteMeta")),
    "negate" -> (args => UnaryMinus(one(args))),
    // CH's typed empty-array constructors
    "emptyArrayInt8" -> (_ => emptyArr(org.apache.spark.sql.types.ByteType)),
    "emptyArrayInt16" -> (_ => emptyArr(org.apache.spark.sql.types.ShortType)),
    "emptyArrayInt32" -> (_ => emptyArr(org.apache.spark.sql.types.IntegerType)),
    "emptyArrayInt64" -> (_ => emptyArr(org.apache.spark.sql.types.LongType)),
    "emptyArrayUInt8" -> (_ => emptyArr(org.apache.spark.sql.types.ShortType)),
    "emptyArrayUInt16" -> (_ => emptyArr(org.apache.spark.sql.types.IntegerType)),
    "emptyArrayUInt32" -> (_ => emptyArr(org.apache.spark.sql.types.LongType)),
    "emptyArrayUInt64" -> (_ => emptyArr(org.apache.spark.sql.types.LongType)),
    "emptyArrayFloat32" -> (_ => emptyArr(org.apache.spark.sql.types.FloatType)),
    "emptyArrayFloat64" -> (_ => emptyArr(org.apache.spark.sql.types.DoubleType)),
    "emptyArrayString" -> (_ => emptyArr(org.apache.spark.sql.types.StringType)),
    "emptyArrayDate" -> (_ => emptyArr(org.apache.spark.sql.types.DateType)),
    "emptyArrayDateTime" -> (_ => emptyArr(org.apache.spark.sql.types.TimestampType)),
    // ---- eleventh batch: date/string/array/map/tuple/URL/IP/JSON/math
    // ISO year start = Monday of the week containing Jan 4 of the ISO
    // year (reuses the Thursday rule toISOYear pins)
    "toStartOfISOYear" -> { args =>
      val d = Cast(one(args), org.apache.spark.sql.types.DateType)
      val isoY = Year(DateAdd(d, Subtract(Literal(3), WeekDay(d))))
      val jan4 = MakeDate(isoY, Literal(1), Literal(4))
      DateSub(jan4, WeekDay(jan4))
    },
    // toWeek mode 0 = the yearweek numbering's week component
    "toWeek" -> (args => Pmod(ToYearWeekExpr(
      Cast(one(args), org.apache.spark.sql.types.DateType)), Literal(100))),
    "toModifiedJulianDay" -> (args => DateDiff(
      Cast(one(args), org.apache.spark.sql.types.DateType),
      Cast(Literal("1858-11-17"), org.apache.spark.sql.types.DateType))),
    "fromModifiedJulianDay" -> (args => DateAdd(
      Cast(Literal("1858-11-17"), org.apache.spark.sql.types.DateType),
      one(args))),
    // proleptic days since 0000-01-01 = epoch days + 719528
    "toDaysSinceYearZero" -> (args => Add(DateDiff(
      Cast(one(args), org.apache.spark.sql.types.DateType),
      Cast(Literal("1970-01-01"), org.apache.spark.sql.types.DateType)),
      Literal(719528))),
    "ngramDistance" -> (args => ChNgramDistanceExpr(args.head, args(1))),
    "countSubstringsCaseInsensitive" -> { args =>
      if (!args(1).foldable)
        throw new IllegalArgumentException(
          "countSubstringsCaseInsensitive requires a literal needle")
      Subtract(Size(StringSplit(Lower(args.head),
        Literal(java.util.regex.Pattern.quote(
          String.valueOf(args(1).eval())
            .toLowerCase(java.util.Locale.ROOT))), Literal(-1))), Literal(1))
    },
    // the graft portable word-simhash kernel (CH's constants are
    // internal — same contract, different values, like the hash family)
    "wordShingleSimHash" -> (args => SimHash64Expr(one(args))),
    // soundex-agreement 0..4 (the MySQL `difference` contract)
    "difference" -> { args =>
      def c(i: Int): Expression = If(EqualTo(
        Substring(new SoundEx(args.head), Literal(i), Literal(1)),
        Substring(new SoundEx(args(1)), Literal(i), Literal(1))),
        Literal(1), Literal(0))
      Add(Add(c(1), c(2)), Add(c(3), c(4)))
    },
    "concatAssumeInjective" -> (args => Concat(args.map(a =>
      Cast(a, org.apache.spark.sql.types.StringType)))),
    "toStringCutToZero" -> (args => ElementAt(StringSplit(
      Cast(one(args), org.apache.spark.sql.types.StringType),
      Literal("\\x00"), Literal(2)), Literal(1))),
    "min2" -> (args => Least(args)),
    "max2" -> (args => Greatest(args)),
    // arrayFill: forward-fill where the predicate is FALSE from the
    // nearest earlier TRUE element (CH's scan); the user lambda is
    // duplicated per use — each higher-order site rebinds it
    "arrayFill" -> { args =>
      val lf = validateLambda(args.head)
      val arr = args(1)
      val x = UnresolvedNamedLambdaVariable(Seq("graft_af_x"))
      val i = UnresolvedNamedLambdaVariable(Seq("graft_af_i"))
      def freshLambda(): Expression = lf.transformUp {
        case v: UnresolvedNamedLambdaVariable => v.copy()
      }
      val kept = ArrayFilter(Slice(arr, Literal(1), Add(i, Literal(1))),
        freshLambda().asInstanceOf[LambdaFunction])
      val condX = ArrayExists(CreateArray(Seq(x)),
        freshLambda().asInstanceOf[LambdaFunction])
      ArrayTransform(arr, LambdaFunction(
        If(condX, x,
          If(GreaterThan(Size(kept), Literal(0)),
            ElementAt(kept, Literal(-1)), x)), Seq(x, i)))
    },
    "arraySplit" -> (_ => throw new IllegalArgumentException(
      "arraySplit builds nested segment arrays — rewrite as explode + " +
        "running boundary count + collect per segment (the dedup_cdc " +
        "recipe)")),
    // CH contract: first k sorted, rest unspecified — a full sort
    // satisfies it exactly
    "arrayPartialSort" -> { args =>
      require(args.length == 2,
        "arrayPartialSort(limit, arr): exactly 2 arguments — the " +
          "lambda-comparator form is not supported; the full ascending " +
          "sort refines CH's unspecified tail order (docs/MIGRATION.md)")
      new SortArray(args(1))
    },
    // mapExists / mapAll / mapApply live in ClickHouseSql as TEXT
    // rewrites (the arrayFirst precedent): the analyzer requires a
    // lambda argument's function to resolve to a higher-order
    // expression at top level, which size(map_filter(…)) is not.
    // right side wins on shared keys (MapZipWith unions the key space)
    "mapUpdate" -> { args =>
      val k = UnresolvedNamedLambdaVariable(Seq("mu_k"))
      val v1 = UnresolvedNamedLambdaVariable(Seq("mu_v1"))
      val v2 = UnresolvedNamedLambdaVariable(Seq("mu_v2"))
      MapZipWith(args.head, args(1),
        LambdaFunction(Coalesce(Seq(v2, v1)), Seq(k, v1, v2)))
    },
    "mapSort" -> (args =>
      new MapFromEntries(new SortArray(MapEntries(one(args)),
        Literal(true)))),
    "mapReverseSort" -> (args =>
      new MapFromEntries(new SortArray(MapEntries(one(args)),
        Literal(false)))),
    "tuplePlus" -> (args =>
      ChTupleArithExpr(args.head, Some(args(1)), "plus")),
    "tupleMinus" -> (args =>
      ChTupleArithExpr(args.head, Some(args(1)), "minus")),
    "tupleMultiplyByNumber" -> (args =>
      ChTupleArithExpr(args.head, Some(args(1)), "mulnum")),
    "tupleNegate" -> (args => ChTupleArithExpr(args.head, None, "negate")),
    "encodeURLFormComponent" -> (args =>
      ChStringKernelExpr2(one(args), "encodeForm")),
    "decodeURLFormComponent" -> (args =>
      ChStringKernelExpr2(one(args), "decodeForm")),
    "queryStringAndFragment" -> (args =>
      RegExpExtract(one(args), Literal("[?](.*)"), Literal(1))),
    "cutWWW" -> (args => RegExpReplace(one(args),
      Literal("^(([a-z]+:)?//)www\\."), Literal("$1"))),
    "URLHierarchy" -> (args =>
      ChStringKernelExpr2(one(args), "urlHierarchy")),
    "URLPathHierarchy" -> (args =>
      ChStringKernelExpr2(one(args), "urlPathHierarchy")),
    "extractURLParameters" -> { args =>
      val p = UnresolvedNamedLambdaVariable(Seq("eup_p"))
      ArrayFilter(StringSplit(parseUrl(one(args), "QUERY"),
        Literal("&"), Literal(-1)),
        LambdaFunction(Not(EqualTo(p, Literal(""))), Seq(p)))
    },
    "extractURLParameterNames" -> { args =>
      val p = UnresolvedNamedLambdaVariable(Seq("eun_p"))
      val q = UnresolvedNamedLambdaVariable(Seq("eun_q"))
      ArrayTransform(
        ArrayFilter(StringSplit(parseUrl(one(args), "QUERY"),
          Literal("&"), Literal(-1)),
          LambdaFunction(Not(EqualTo(p, Literal(""))), Seq(p))),
        LambdaFunction(SubstringIndex(q, Literal("="), Literal(1)), Seq(q)))
    },
    "toIPv6" -> (args => ChStringKernelExpr2(one(args), "canonIPv6")),
    "IPv4CIDRToRange" -> { args =>
      val x = Cast(args.head, org.apache.spark.sql.types.LongType)
      val bits = Cast(args(1), org.apache.spark.sql.types.IntegerType)
      // mask of the host part: 2^(32-bits) - 1
      val host = Subtract(ShiftLeft(Literal(1L),
        Subtract(Literal(32), bits)), Literal(1L))
      val lo = BitwiseAnd(x, BitwiseNot(host))
      val hi = BitwiseOr(x, host)
      def str(e: Expression): Expression = {
        def oct(sh: Int): Expression = Cast(
          BitwiseAnd(ShiftRightUnsigned(e, Literal(sh)), Literal(255L)),
          org.apache.spark.sql.types.StringType)
        new ConcatWs(Seq(Literal("."), oct(24), oct(16), oct(8), oct(0)))
      }
      CreateStruct(Seq(str(lo), str(hi)))
    },
    "isIPAddressInRange" -> (args =>
      ChIpInRangeExpr(args.head, args(1))),
    "JSONType" -> (args => ChJsonExpr(args, "type")),
    "JSONExtractArrayRaw" -> (args => ChJsonExpr(args, "arrayraw")),
    "JSONArrayLength" -> (args => ChJsonExpr(args, "arraylength")),
    "erf" -> (args => ChErfExpr(
      Cast(one(args), org.apache.spark.sql.types.DoubleType),
      complement = false)),
    "erfc" -> (args => ChErfExpr(
      Cast(one(args), org.apache.spark.sql.types.DoubleType),
      complement = true)),
    // decimal arithmetic with an explicit result scale (CH contract:
    // the scale argument is a literal)
    "divideDecimal" -> { args =>
      require(args.length == 3 && args(2).foldable,
        "divideDecimal(a, b, result_scale): scale must be a literal")
      // kernel, not Cast(Divide(..)): CH truncates the quotient toward
      // zero at the result scale; Spark's decimal cast rounds HALF_UP
      ChDecimalTruncDivExpr(args.head, args(1),
        String.valueOf(args(2).eval()).toInt)
    },
    "multiplyDecimal" -> { args =>
      val m = Multiply(args.head, args(1))
      if (args.length > 2) {
        require(args(2).foldable,
          "multiplyDecimal result_scale must be a literal")
        Cast(m, org.apache.spark.sql.types.DecimalType(38,
          String.valueOf(args(2).eval()).toInt))
      } else m
    },
    // two-sample proportions z-test: (z, p, ci_lo, ci_hi) — p via erfc,
    // the CI's normal quantile computed at PLAN time from the literal
    // confidence (commons-math3 inverse CDF)
    "proportionsZTest" -> { args =>
      require(args.length == 6 && args(4).foldable && args(5).foldable,
        "proportionsZTest(s1, s2, n1, n2, conf, 'pooled'|'unpooled') — " +
          "confidence and pooling must be literals")
      def d(e: Expression) = Cast(e, org.apache.spark.sql.types.DoubleType)
      val (s1, s2, n1, n2) = (d(args(0)), d(args(1)), d(args(2)), d(args(3)))
      val conf = String.valueOf(args(4).eval()).toDouble
      val pooled = String.valueOf(args(5).eval()).toLowerCase(
        java.util.Locale.ROOT) == "pooled"
      val (p1, p2) = (Divide(s1, n1), Divide(s2, n2))
      val diff = Subtract(p1, p2)
      val se: Expression =
        if (pooled) {
          val p = Divide(Add(s1, s2), Add(n1, n2))
          Sqrt(Multiply(Multiply(p, Subtract(Literal(1.0), p)),
            Add(Divide(Literal(1.0), n1), Divide(Literal(1.0), n2))))
        } else Sqrt(Add(
          Divide(Multiply(p1, Subtract(Literal(1.0), p1)), n1),
          Divide(Multiply(p2, Subtract(Literal(1.0), p2)), n2)))
      val z = Divide(diff, se)
      val pval = ChErfExpr(Divide(Abs(z), Literal(math.sqrt(2.0))),
        complement = true)
      val zq = new org.apache.commons.math3.distribution.NormalDistribution()
        .inverseCumulativeProbability(1.0 - (1.0 - conf) / 2.0)
      CreateStruct(Seq(z, pval,
        Subtract(diff, Multiply(Literal(zq), se)),
        Add(diff, Multiply(Literal(zq), se))))
    },
    // ---- twelfth batch: session/timezone/parse/geo/snowflake/uuid/bitmap
    "currentDatabase" -> (_ => Literal("default")),
    "currentUser" -> (_ => CurrentUser()),
    "timeZone" -> (_ => CurrentTimeZone()),
    "timezone" -> (_ => CurrentTimeZone()),
    // CH toTimeZone changes the DISPLAY zone of the same instant; with
    // Spark timestamps rendered in the session zone, the faithful
    // display move is the wall-clock conversion session-tz → target
    "toTimeZone" -> (args => ConvertTimezone(CurrentTimeZone(), args(1),
      Cast(args.head, org.apache.spark.sql.types.TimestampType))),
    // CH parseDateTime takes MySQL-style % patterns — the shared
    // translator turns them into Spark patterns at plan time
    "parseDateTime" -> { args =>
      require(args.length >= 2 && args(1).foldable,
        "parseDateTime(s, format): format must be a literal")
      new ParseToTimestamp(args.head,
        Some(Literal(translateDateFormat(String.valueOf(args(1).eval())))),
        org.apache.spark.sql.types.TimestampType, None, failOnError = true)
    },
    "parseDateTimeOrNull" -> { args =>
      require(args.length >= 2 && args(1).foldable,
        "parseDateTimeOrNull(s, format): format must be a literal")
      new ParseToTimestamp(args.head,
        Some(Literal(translateDateFormat(String.valueOf(args(1).eval())))),
        org.apache.spark.sql.types.TimestampType, None, failOnError = false)
    },
    "geohashEncode" -> (args => GeohashEncodeExpr(args)),
    "geohashDecode" -> (args => GeohashDecodeExpr(one(args))),
    // Twitter-epoch snowflake ids (CH's constants): ms = (id >> 22) +
    // 1288834974657
    "snowflakeIDToDateTime" -> (args => MillisToTimestamp(Add(
      ShiftRight(Cast(one(args), org.apache.spark.sql.types.LongType),
        Literal(22)), Literal(1288834974657L)))),
    "dateTimeToSnowflakeID" -> (args => ShiftLeft(
      Subtract(UnixMillis(Cast(one(args),
        org.apache.spark.sql.types.TimestampType)),
        Literal(1288834974657L)), Literal(22))),
    // UUID text validation (Spark has no UUID type: CH's toUUID maps
    // to the validated lowercase canonical STRING; the *OrNull form
    // nulls instead of raising)
    "toUUID" -> { args =>
      val re = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-" +
        "[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
      If(RLike(one(args), Literal(re)), Lower(one(args)),
        Cast(RaiseError(Literal("toUUID: malformed UUID string")),
          org.apache.spark.sql.types.StringType))
    },
    "toUUIDOrNull" -> { args =>
      val re = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-" +
        "[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
      If(RLike(one(args), Literal(re)), Lower(one(args)),
        Literal.create(null, org.apache.spark.sql.types.StringType))
    },
    "UUIDStringToNum" -> (args => Unhex(RegExpReplace(one(args),
      Literal("-"), Literal("")))),
    "runningAccumulate" -> (_ => throw new IllegalArgumentException(
      "runningAccumulate depends on CH block order — rewrite as " +
        "SUM(x) OVER (ORDER BY <explicit key> ROWS UNBOUNDED " +
        "PRECEDING) (the q09 recipe)")),
    "neighbor" -> (_ => throw new IllegalArgumentException(
      "neighbor depends on CH block order — rewrite as " +
        "lag/lead OVER (ORDER BY <explicit key>) (the q10 recipe)")),
    // CH bitmap objects modeled as SORTED DISTINCT ARRAYS — every
    // bitmap verb is then an exact array operation (documented: the
    // value surface matches; the roaring compression is CH-internal)
    "bitmapBuild" -> (args => new SortArray(ArrayDistinct(one(args)))),
    "bitmapToArray" -> (args => new SortArray(ArrayDistinct(one(args)))),
    "bitmapCardinality" -> (args => Size(ArrayDistinct(one(args)))),
    "bitmapContains" -> (args => ArrayContains(args.head, args(1))),
    "bitmapAnd" -> (args =>
      new SortArray(ArrayIntersect(args.head, args(1)))),
    "bitmapOr" -> (args => new SortArray(ArrayUnion(args.head, args(1)))),
    "bitmapXor" -> (args => new SortArray(ArrayExcept(
      ArrayUnion(args.head, args(1)),
      ArrayIntersect(args.head, args(1))))),
    "bitmapAndnot" -> (args =>
      new SortArray(ArrayExcept(args.head, args(1)))),
    "bitmapAndCardinality" -> (args =>
      Size(ArrayIntersect(args.head, args(1)))),
    "bitmapOrCardinality" -> (args =>
      Size(ArrayUnion(args.head, args(1)))),
    "bitmapMin" -> (args => ArrayMin(one(args))),
    "bitmapMax" -> (args => ArrayMax(one(args))),
    // ---- tenth batch: aggregates ----
    // groupBitmap over a scalar column is the bitmap's cardinality —
    // exact distinct; groupBitmapOr unions per-row singletons → same.
    "groupBitmap" -> (args =>
      Count(args).toAggregateExpression(isDistinct = true)),
    "groupBitmapOr" -> (args =>
      Count(args).toAggregateExpression(isDistinct = true)),
    "groupBitmapXor" -> (_ => throw new IllegalArgumentException(
      "groupBitmapXor keeps values seen an ODD number of times — " +
        "rewrite as a groupBy count having count % 2 = 1 (the " +
        "q55_bitmap_distinct recipe)")),
    // quantileGK(accuracy, q)(x): Spark's own GK-family sketch
    // (ApproximatePercentile), accuracy mapped through directly
    "quantileGK" -> (args => new ApproximatePercentile(args(2), args(1),
      Cast(args.head, org.apache.spark.sql.types.IntegerType))),
    "exponentialMovingAverage" -> (_ => throw new IllegalArgumentException(
      "exponentialMovingAverage is time-anchored — rewrite as " +
        "sum(v * pow(2, (t - T)/x)) / sum(pow(2, (t - T)/x)) with T a " +
        "fixed in-window reference (max(t) over the window), the " +
        "q114_decay recipe")),
    "mannWhitneyUTest" -> (_ => throw new IllegalArgumentException(
      "mannWhitneyUTest needs global ranks — compute them " +
        "relationally (rank the pooled sample, sum per group; the " +
        "q130_ks_test recipe shape)")),
    // minMap/maxMap: per-key min/max across rows of a MAP column —
    // fold the collected maps through map_zip_with (least/greatest
    // skip the missing-key nulls), then sort keys like CH
    "minMap" -> (args => mapMinMax(one(args), isMin = true)),
    "maxMap" -> (args => mapMinMax(one(args), isMin = false)),
    // ---- thirteenth batch: codecs, curves, fuzzy string, consistent
    // hashing, URL/net long tail ----
    "base58Encode" -> (args => ChStringKernelExpr3(
      Cast(one(args), org.apache.spark.sql.types.StringType), "base58Encode")),
    "base58Decode" -> (args => ChStringKernelExpr3(
      Cast(one(args), org.apache.spark.sql.types.StringType), "base58Decode")),
    "idnaEncode" -> (args => ChStringKernelExpr3(one(args), "idnaEncode")),
    "idnaDecode" -> (args => ChStringKernelExpr3(one(args), "idnaDecode")),
    "punycodeEncode" -> (args =>
      ChStringKernelExpr3(one(args), "punycodeEncode")),
    "punycodeDecode" -> (args =>
      ChStringKernelExpr3(one(args), "punycodeDecode")),
    "unbin" -> (args => ChStringKernelExpr3(one(args), "unbin")),
    // splitBy*: token extraction (CH returns the separated runs)
    "splitByNonAlpha" -> (args => new RegExpExtractAll(one(args),
      Literal("[A-Za-z0-9]+"), Literal(0))),
    "splitByWhitespace" -> (args => new RegExpExtractAll(one(args),
      Literal("[^\\s]+"), Literal(0))),
    // Morton / Hilbert 2-D curves (32-bit coords → one UInt64 key);
    // decode takes CH's (dimensions, code) form, 2-D only
    "mortonEncode" -> (args => ChCurveExpr(
      Cast(args.head, org.apache.spark.sql.types.LongType),
      Cast(args(1), org.apache.spark.sql.types.LongType), "morton")),
    "hilbertEncode" -> (args => ChCurveExpr(
      Cast(args.head, org.apache.spark.sql.types.LongType),
      Cast(args(1), org.apache.spark.sql.types.LongType), "hilbert")),
    "mortonDecode" -> { args =>
      require(args.length == 2 && args.head.foldable &&
        String.valueOf(args.head.eval()) == "2",
        "mortonDecode(dimensions, code): 2-D only")
      ChCurveDecodeExpr(Cast(args(1),
        org.apache.spark.sql.types.LongType), "morton")
    },
    "hilbertDecode" -> { args =>
      require(args.length == 2 && args.head.foldable &&
        String.valueOf(args.head.eval()) == "2",
        "hilbertDecode(dimensions, code): 2-D only")
      ChCurveDecodeExpr(Cast(args(1),
        org.apache.spark.sql.types.LongType), "hilbert")
    },
    // fuzzy-string long tail
    "damerauLevenshteinDistance" -> (args =>
      ChStringPairExpr3(args.head, args(1), "damerauLevenshtein")),
    "stringJaccardIndex" -> (args =>
      ChStringPairExpr3(args.head, args(1), "stringJaccard")),
    "byteHammingDistance" -> (args =>
      ChStringPairExpr3(args.head, args(1), "byteHamming")),
    "multiSearchFirstPosition" -> (args =>
      ChMultiSearchExpr3(args.head, args(1), "firstposition")),
    "multiSearchAllPositions" -> (args =>
      ChMultiSearchExpr3(args.head, args(1), "allpositions")),
    "hasToken" -> (args => ChMultiSearchExpr3(args.head, args(1), "hastoken")),
    // consistent hashing: jump is the published Lamping–Veach algorithm
    // (exact); kostik's constants are CH-internal → teaching thrower
    "jumpConsistentHash" -> (args => ChJumpHashExpr(
      Cast(args.head, org.apache.spark.sql.types.LongType),
      Cast(args(1), org.apache.spark.sql.types.IntegerType))),
    "kostikConsistentHash" -> (_ => throw new IllegalArgumentException(
      "kostikConsistentHash's constants are ClickHouse-internal — " +
        "rewrite with jumpConsistentHash (the published Lamping–Veach " +
        "algorithm, implemented exactly)")),
    // xxHash32/64 with seed 0 are the PUBLIC xxHash spec — exact for
    // string inputs (CH hashes the value bytes); the internal-constant
    // families (wyHash64/gccMurmurHash/intHash*) land on xxhash64 like
    // sipHash/cityHash (stable, same contract, different values)
    "xxHash64" -> (args => XxHash64(args, 0L)),
    "xxHash32" -> (args => ChStringKernelExpr3(
      Cast(one(args), org.apache.spark.sql.types.StringType), "xxHash32")),
    "murmurHash3_128" -> (args => ChStringKernelExpr3(
      Cast(one(args), org.apache.spark.sql.types.StringType), "murmur3_128")),
    "wyHash64" -> (args => XxHash64(args, 42L)),
    "gccMurmurHash" -> (args => XxHash64(args, 42L)),
    "intHash32" -> (args => XxHash64(args, 42L)),
    "intHash64" -> (args => XxHash64(args, 42L)),
    "chSHA512" -> (args => Unhex(Sha2(Cast(one(args),
      org.apache.spark.sql.types.BinaryType), Literal(512)))),
    "BLAKE3" -> (_ => throw new IllegalArgumentException(
      "BLAKE3 is not on the JVM classpath — rewrite with SHA256 for a " +
        "cryptographic digest or xxHash64 for a fast content key")),
    // array long tail
    "arrayCumSumNonNegative" -> (args =>
      ChArrayKernelExpr3(Seq(one(args)), "cumsumnn")),
    "arrayEnumerateUniq" -> (args =>
      ChArrayKernelExpr3(Seq(one(args)), "enumuniq")),
    "hasSubstr" -> (args =>
      ChArrayKernelExpr3(Seq(args.head, args(1)), "hassubstr")),
    "LpNorm" -> (args =>
      ChArrayKernelExpr3(Seq(args.head, args(1)), "lpnorm")),
    "arrayDotProduct" -> (args =>
      DotExpr(toDArr(args.head), toDArr(args(1)))),
    // URL / net / format long tail
    "port" -> (args => ChUrlPortExpr(args.head,
      if (args.length > 1)
        Cast(args(1), org.apache.spark.sql.types.IntegerType)
      else Literal(0))),
    "toDecimalString" -> (args => ChToDecimalStringExpr(
      Cast(args.head, org.apache.spark.sql.types.DoubleType),
      Cast(args(1), org.apache.spark.sql.types.IntegerType))),
    "formatReadableDecimalSize" -> (args => ChReadableExpr(
      Cast(one(args), org.apache.spark.sql.types.DoubleType), "decsize")),
    "greatCircleAngle" -> (args => ChGreatCircleAngleExpr(args.map(a =>
      Cast(a, org.apache.spark.sql.types.DoubleType)))),
    // temporal / numeric long tail
    "timeDiff" -> (args => Subtract(
      Cast(args(1), org.apache.spark.sql.types.LongType),
      Cast(args.head, org.apache.spark.sql.types.LongType))),
    "fromDaysSinceYearZero" -> (args => DateAdd(
      Cast(Literal("1970-01-01"), org.apache.spark.sql.types.DateType),
      Cast(Subtract(Cast(one(args), org.apache.spark.sql.types.LongType),
        Literal(719528L)), org.apache.spark.sql.types.IntegerType))),
    "nan" -> (_ => Literal(Double.NaN)),
    "inf" -> (_ => Literal(Double.PositiveInfinity)),
    // accurateCast: CH's overflow-checking cast — ANSI semantics (throws
    // on overflow/garbage); the OrNull form is a TRY cast. The type
    // argument is a CH spelling, mapped through the DDL type mapper.
    "accurateCast" -> { args =>
      require(args.length == 2 && args(1).foldable,
        "accurateCast(x, 'Type'): the type must be a literal string")
      Cast(args.head, org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseDataType(ClickHouseSql.mapChType(String.valueOf(args(1).eval()))),
        None, EvalMode.ANSI)
    },
    "accurateCastOrNull" -> { args =>
      require(args.length == 2 && args(1).foldable,
        "accurateCastOrNull(x, 'Type'): the type must be a literal string")
      Cast(args.head, org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseDataType(ClickHouseSql.mapChType(String.valueOf(args(1).eval()))),
        None, EvalMode.TRY)
    },
    // ---- fourteenth batch: the math/date long tail that was still
    // unmapped (the JSON family, exp/sigmoid/gcd/lcm, byteSize,
    // countEqual, the relative-num family and best-effort parsing all
    // exist in earlier batches) ----
    "positiveModulo" -> (args => Pmod(args.head, args(1))),
    "YYYYMMDDToDate" -> (args => new ParseToDate(
      Cast(one(args), org.apache.spark.sql.types.StringType),
      Literal("yyyyMMdd"))),
    // ---- fifteenth batch: relative-num completions, 64-bit unix
    // timestamps, readable sizes, reinterpret casts, UTF-8 validation,
    // seeded array shuffling, geometry, and the n-gram search form ----
    // DateLUTImpl's published formulas: year; year*4 + (month-1)/3;
    // year*12 + month; (dayNum + 8 - ISO weekday) / 7
    "toRelativeYearNum" -> (args => Cast(Year(Cast(one(args),
      org.apache.spark.sql.types.DateType)),
      org.apache.spark.sql.types.LongType)),
    "toRelativeQuarterNum" -> { args =>
      val d = Cast(one(args), org.apache.spark.sql.types.DateType)
      Add(Multiply(Cast(Year(d), org.apache.spark.sql.types.LongType),
        Literal(4L)),
        IntegralDivide(Subtract(Cast(Month(d),
          org.apache.spark.sql.types.LongType), Literal(1L)), Literal(3L)))
    },
    "toRelativeMonthNum" -> { args =>
      val d = Cast(one(args), org.apache.spark.sql.types.DateType)
      Add(Multiply(Cast(Year(d), org.apache.spark.sql.types.LongType),
        Literal(12L)), Cast(Month(d), org.apache.spark.sql.types.LongType))
    },
    "toRelativeWeekNum" -> { args =>
      val d = Cast(one(args), org.apache.spark.sql.types.DateType)
      val dayNum = Cast(DateDiff(d, Cast(Literal("1970-01-01"),
        org.apache.spark.sql.types.DateType)),
        org.apache.spark.sql.types.LongType)
      // Spark WeekDay: Monday = 0 … Sunday = 6; ISO weekday = +1
      val iso = Add(Cast(WeekDay(d), org.apache.spark.sql.types.LongType),
        Literal(1L))
      IntegralDivide(Subtract(Add(dayNum, Literal(8L)), iso), Literal(7L))
    },
    "fromUnixTimestamp64Milli" -> (args => MillisToTimestamp(
      Cast(one(args), org.apache.spark.sql.types.LongType))),
    "fromUnixTimestamp64Micro" -> (args => MicrosToTimestamp(
      Cast(one(args), org.apache.spark.sql.types.LongType))),
    "fromUnixTimestamp64Nano" -> (args => MicrosToTimestamp(IntegralDivide(
      Cast(one(args), org.apache.spark.sql.types.LongType), Literal(1000L)))),
    "toUnixTimestamp64Milli" -> (args => UnixMillis(Cast(one(args),
      org.apache.spark.sql.types.TimestampType))),
    "toUnixTimestamp64Micro" -> (args => UnixMicros(Cast(one(args),
      org.apache.spark.sql.types.TimestampType))),
    "toUnixTimestamp64Nano" -> (args => Multiply(UnixMicros(Cast(one(args),
      org.apache.spark.sql.types.TimestampType)), Literal(1000L))),
    // deprecated pre-24.x spellings of the snowflake pair
    "snowflakeToDateTime" -> (args => MillisToTimestamp(Add(
      ShiftRight(Cast(one(args), org.apache.spark.sql.types.LongType),
        Literal(22)), Literal(1288834974657L)))),
    "dateTimeToSnowflake" -> (args => ShiftLeft(
      Subtract(UnixMillis(Cast(one(args),
        org.apache.spark.sql.types.TimestampType)),
        Literal(1288834974657L)), Literal(22))),
    "cutQueryStringAndFragment" -> (args =>
      RegExpReplace(one(args), Literal("[?#].*$"), Literal(""))),
    "regexpExtract" -> (args => RegExpExtract(args.head, args(1),
      if (args.length > 2) args(2) else Literal(1))),
    // analysis-time coercion handles the literal's type — reading
    // args.head.dataType here would throw on an unresolved column ref
    "isZeroOrNull" -> (args => Coalesce(Seq(EqualTo(args.head,
      Literal(0)), Literal(true)))),
    // CH's toColumnTypeName reports the in-memory column type — for
    // every CH-surface type here that equals toTypeName's answer
    "toColumnTypeName" -> (args => ChTypeNameExpr(one(args))),
    "defaultValueOfTypeName" -> { args =>
      require(args.length == 1 && args.head.foldable,
        "defaultValueOfTypeName('Type'): the type must be a literal string")
      val dt = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseDataType(ClickHouseSql.mapChType(String.valueOf(args.head.eval())))
      dt match {
        case org.apache.spark.sql.types.StringType => Literal("")
        case n: org.apache.spark.sql.types.NumericType =>
          Cast(Literal(0), n)
        case org.apache.spark.sql.types.BooleanType => Literal(false)
        case org.apache.spark.sql.types.DateType =>
          Cast(Literal("1970-01-01"), org.apache.spark.sql.types.DateType)
        case org.apache.spark.sql.types.TimestampType =>
          Cast(Literal(0L), org.apache.spark.sql.types.TimestampType)
        case a: org.apache.spark.sql.types.ArrayType => emptyArr(a.elementType)
        case other => Literal.create(null, other)
      }
    },
    // xxhash64 stand-in over the normalized text (CH hashes its own
    // normalization with SipHash — MIGRATION.md hash-family note)
    "normalizedQueryHash" -> (args => XxHash64(Seq(
      RegExpReplace(
        RegExpReplace(one(args), Literal("'[^']*'"), Literal("?")),
        Literal("\\b\\d+(\\.\\d+)?\\b"), Literal("?"))), 0L)),
    "arrayPartialReverseSort" -> { args =>
      require(args.length == 2,
        "arrayPartialReverseSort(limit, arr): exactly 2 arguments — the " +
          "lambda-comparator form is not supported; the full descending " +
          "sort refines CH's unspecified tail order (docs/MIGRATION.md)")
      new SortArray(args(1), Literal(false))
    },
    "parseReadableSize" -> (args =>
      ChParseReadableSizeExpr(one(args), "throw")),
    "parseReadableSizeOrNull" -> (args =>
      ChParseReadableSizeExpr(one(args), "null")),
    "parseReadableSizeOrZero" -> (args =>
      ChParseReadableSizeExpr(one(args), "zero")),
    // binary→string cast copies bytes verbatim, so unhex'd (possibly
    // invalid) byte sequences validate correctly
    "isValidUTF8" -> (args => ChIsValidUtf8Expr(Cast(one(args),
      org.apache.spark.sql.types.StringType))),
    "bitSlice" -> { args =>
      require(args.length >= 2, "bitSlice(s, offset[, length])")
      ChBitSliceExpr(args.head,
        Cast(args(1), org.apache.spark.sql.types.IntegerType),
        if (args.length > 2) Cast(args(2),
          org.apache.spark.sql.types.IntegerType)
        else Literal(Int.MaxValue))
    },
    "reinterpretAsUInt8" -> (args => ChReinterpretUIntExpr(one(args), 1)),
    "reinterpretAsUInt16" -> (args => ChReinterpretUIntExpr(one(args), 2)),
    "reinterpretAsUInt32" -> (args => ChReinterpretUIntExpr(one(args), 4)),
    "reinterpretAsUInt64" -> (args => ChReinterpretUIntExpr(one(args), 8)),
    "reinterpretAsString" -> (args => ChReinterpretStringExpr(
      Cast(one(args), org.apache.spark.sql.types.LongType))),
    "arrayLevenshteinDistance" -> (args => ChArrayLevenshteinExpr(
      Cast(args.head, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)),
      Cast(args(1), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)))),
    "ngramSearch" -> (args => ChNgramSearchExpr(args.head, args(1))),
    "ngramSearchCaseInsensitive" -> (args =>
      ChNgramSearchExpr(Lower(args.head), Lower(args(1)))),
    // seeded DETERMINISTIC forms (SplitMix64 Fisher–Yates): the
    // unseeded CH forms are nondeterministic and violate the engine's
    // oracle-exactness rule, so they teach the seeded rewrite
    "arrayShuffle" -> { args =>
      require(args.length == 2,
        "arrayShuffle(arr, seed) — pass an explicit seed: the unseeded " +
          "CH form is nondeterministic; the seeded rewrite is exact " +
          "and reproducible (SplitMix64 permutation)")
      ChArrayShuffleExpr(args.head,
        Cast(args(1), org.apache.spark.sql.types.LongType), -1)
    },
    "arrayRandomSample" -> { args =>
      require(args.length == 3 && args(1).foldable,
        "arrayRandomSample(arr, k, seed) — pass an explicit seed: the " +
          "2-arg CH form is nondeterministic; the seeded rewrite takes " +
          "the first k of the SplitMix64 permutation")
      ChArrayShuffleExpr(args.head,
        Cast(args(2), org.apache.spark.sql.types.LongType),
        String.valueOf(args(1).eval()).toDouble.toInt)
    },
    "pointInPolygon" -> { args =>
      val pt = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("y",
          org.apache.spark.sql.types.DoubleType)))
      ChPointInPolygonExpr(Cast(args.head, pt),
        Cast(args(1), org.apache.spark.sql.types.ArrayType(pt)))
    },
    // H3 indexing needs the published H3 cell math (not on this
    // classpath) — teach the equivalent bucketed-geometry rewrites
    "geoToH3" -> (_ => throw new IllegalArgumentException(
      "geoToH3: H3 cell math is not on this classpath — rewrite with " +
        "geohashEncode(lon, lat, p) for bucketed spatial joins (the " +
        "q87_grid_join recipe); cell sizes differ but the plan shape " +
        "is identical")),
    "h3ToGeo" -> (_ => throw new IllegalArgumentException(
      "h3ToGeo: H3 cell math is not on this classpath — rewrite with " +
        "geohashDecode(h) over geohashEncode'd cells")),
    "h3ToString" -> (_ => throw new IllegalArgumentException(
      "h3ToString: H3 is not on this classpath — rewrite with hex(h) " +
        "for the raw index; geohash cells are the supported bucket key")),
    "stringToH3" -> (_ => throw new IllegalArgumentException(
      "stringToH3: H3 is not on this classpath — rewrite with " +
        "unhex/conv for the raw index; geohash cells are the " +
        "supported bucket key")),
    // ---- sixteenth batch: the date-change family, server/system
    // introspection stand-ins, MAC/UUID codecs, and the utility tail --
    // changeYear/…/changeSecond: recompose via make_timestamp with the
    // one part substituted. Inputs normalize to TIMESTAMP (a Date in
    // comes back as DateTime — MIGRATION note); an invalid recomposed
    // date (Feb 30) yields NULL where CH saturates (noted).
    "changeYear" -> (args => changeDatePart(args, "year")),
    "changeMonth" -> (args => changeDatePart(args, "month")),
    "changeDay" -> (args => changeDatePart(args, "day")),
    "changeHour" -> (args => changeDatePart(args, "hour")),
    "changeMinute" -> (args => changeDatePart(args, "minute")),
    "changeSecond" -> (args => changeDatePart(args, "second")),
    "overlayUTF8" -> { args =>
      require(args.length >= 3, "overlayUTF8(s, replace, pos[, len])")
      if (args.length > 3) new Overlay(args.head, args(1), args(2), args(3))
      else new Overlay(args.head, args(1), args(2))
    },
    "stringCompare" -> { args =>
      require(args.length == 2,
        "stringCompare(s1, s2) — the 5-arg offset form is not taken")
      If(LessThan(args.head, args(1)), Literal(-1),
        If(EqualTo(args.head, args(1)), Literal(0), Literal(1)))
    },
    "mid" -> (args => Substring(args.head, args(1),
      if (args.length > 2) args(2) else Literal(Int.MaxValue))),
    "UTCTimestamp" -> (_ => Cast(CurrentTimestamp(),
      org.apache.spark.sql.types.TimestampType)),
    // stable per JVM (the engine's "server"): a name-UUID of the
    // runtime's process identity
    "serverUUID" -> (_ => Literal(java.util.UUID.nameUUIDFromBytes(
      java.lang.management.ManagementFactory.getRuntimeMXBean.getName
        .getBytes("UTF-8")).toString)),
    "widthBucket" -> (args => WidthBucket(
      Cast(args.head, org.apache.spark.sql.types.DoubleType),
      Cast(args(1), org.apache.spark.sql.types.DoubleType),
      Cast(args(2), org.apache.spark.sql.types.DoubleType),
      Cast(args(3), org.apache.spark.sql.types.LongType))),
    "bitmaskToArray" -> { args =>
      val x = Cast(one(args), org.apache.spark.sql.types.LongType)
      val b = UnresolvedNamedLambdaVariable(Seq("graft_bm_bit"))
      val v = UnresolvedNamedLambdaVariable(Seq("graft_bm_v"))
      ArrayTransform(
        ArrayFilter(Sequence(Literal(0), Literal(62), None),
          LambdaFunction(Not(EqualTo(
            BitwiseAnd(x, ShiftLeft(Literal(1L), b)), Literal(0L))), Seq(b))),
        LambdaFunction(ShiftLeft(Literal(1L), v), Seq(v)))
    },
    // Int64-width byte reversal (CH swaps the RESOLVED type's width;
    // integers here are Int64 — 32-bit examples differ, MIGRATION note)
    "byteSwap" -> (args =>
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        classOf[java.lang.Long],
        org.apache.spark.sql.types.LongType, "reverseBytes",
        Seq(Cast(one(args), org.apache.spark.sql.types.LongType)),
        Seq(org.apache.spark.sql.types.LongType))),
    // whitespace normalization only (no pretty-printer here — noted)
    "formatQuery" -> (args => RegExpReplace(
      new StringTrim(one(args)), Literal("\\s+"), Literal(" "))),
    "formatQuerySingleLine" -> (args => RegExpReplace(
      new StringTrim(one(args)), Literal("\\s+"), Literal(" "))),
    "toBool" -> (args => Cast(one(args),
      org.apache.spark.sql.types.BooleanType)),
    "toBFloat16" -> (args => ChUnaryKernel4Expr(Cast(one(args),
      org.apache.spark.sql.types.DoubleType), "tobfloat16")),
    "MACNumToString" -> (args => ChUnaryKernel4Expr(Cast(one(args),
      org.apache.spark.sql.types.LongType), "macnumtostring")),
    "MACStringToNum" -> (args =>
      ChMacStringToNumExpr(one(args), "throw")),
    "MACStringToNumOrNull" -> (args =>
      ChMacStringToNumExpr(one(args), "null")),
    "MACStringToNumOrZero" -> (args =>
      ChMacStringToNumExpr(one(args), "zero")),
    "IPv4ToIPv6" -> { args =>
      val x = Cast(one(args), org.apache.spark.sql.types.LongType)
      def oct(sh: Int): Expression = Cast(
        BitwiseAnd(ShiftRightUnsigned(x, Literal(sh)), Literal(255L)),
        org.apache.spark.sql.types.StringType)
      Concat(Seq(Literal("::ffff:"),
        new ConcatWs(Seq(Literal("."), oct(24), oct(16), oct(8), oct(0)))))
    },
    "caseWithExpression" -> { args =>
      require(args.length >= 4 && args.length % 2 == 0,
        "caseWithExpression(x, k1, v1, …, default)")
      val x = args.head
      val default = args.last
      val pairs = args.tail.dropRight(1).grouped(2).toSeq
      CaseWhen(pairs.map(p => (EqualTo(x, p(0)), p(1))), Some(default))
    },
    "materialize" -> (args => one(args)),
    "identity" -> (args => one(args)),
    "ignore" -> (_ => Literal(0)),
    // no-op: a distributed engine does not sleep per block (noted)
    "sleep" -> (_ => Literal(0)),
    "sleepEachRow" -> (_ => Literal(0)),
    "hostName" -> (_ => Literal(
      try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: Exception => "localhost" })),
    "uptime" -> (_ => Literal(
      (System.currentTimeMillis() - java.lang.management.ManagementFactory
        .getRuntimeMXBean.getStartTime) / 1000L)),
    // Spark's partition model stands in for CH blocks (MIGRATION note)
    "blockNumber" -> (_ => SparkPartitionID()),
    "rowNumberInBlock" -> (_ => BitwiseAnd(MonotonicallyIncreasingID(),
      Literal((1L << 33) - 1))),
    "rowNumberInAllBlocks" -> (_ => MonotonicallyIncreasingID()),
    "blockSize" -> (_ => throw new IllegalArgumentException(
      "blockSize has no scalar Spark analog — rewrite as " +
        "count(*) grouped by spark_partition_id()")),
    "visibleWidth" -> (args => Length(Cast(one(args),
      org.apache.spark.sql.types.StringType))),
    "hasColumnInTable" -> { args =>
      require(args.length >= 2 && args.forall(_.foldable),
        "hasColumnInTable([db,] table, column): literal strings")
      val table = String.valueOf(args(args.length - 2).eval())
      val column = String.valueOf(args.last.eval())
      val exists = try org.apache.spark.sql.SparkSession.active
        .table(table).schema.fieldNames.exists(_.equalsIgnoreCase(column))
      catch { case scala.util.control.NonFatal(_) => false }
      Literal(exists)
    },
    "getSetting" -> { args =>
      require(args.length == 1 && args.head.foldable,
        "getSetting('name'): literal string")
      org.apache.spark.sql.SparkSession.active.conf
        .getOption(String.valueOf(args.head.eval()))
        .map(v => Literal(v): Expression)
        .getOrElse(Literal.create(null,
          org.apache.spark.sql.types.StringType))
    },
    "generateULID" -> (_ => ChUlidExpr()),
    "UUIDStringToNum" -> (args =>
      ChUnaryKernel4Expr(one(args), "uuidstringtonum")),
    "UUIDNumToString" -> (args =>
      ChUnaryKernel4Expr(Cast(one(args),
        org.apache.spark.sql.types.BinaryType), "uuidnumtostring")),
    "regionToName" -> (_ => throw new IllegalArgumentException(
      "regionToName needs ClickHouse's embedded geobase — rewrite as a " +
        "broadcast join against your own region dimension table")),
    "minSampleSizeContinuous" -> (_ => throw new IllegalArgumentException(
      "minSampleSizeContinuous is closed-form power analysis — rewrite " +
        "with the q111_min_sample_size recipe (exact z constants, " +
        "per-variant moments)")),
    "minSampleSizeConversion" -> (_ => throw new IllegalArgumentException(
      "minSampleSizeConversion is closed-form power analysis — rewrite " +
        "with the q111_min_sample_size recipe (exact z constants, " +
        "per-variant moments)")),
    // ---- seventeenth batch: text/codec kernels, v6 CIDR math, NLP
    // stand-ins, UUIDv7/ULID time codecs — divergences in MIGRATION.md
    "soundex" -> (args => SoundEx(one(args))),
    // CH words are alnum RUNS (Spark's initcap splits on space only);
    // ClickHouseSql text-rewrites `initcap(` → `chInitcap(` (the
    // chMonthName/chChar builtin-collision pattern)
    "chInitcap" -> (args => ChUnaryKernel5Expr(one(args), "initcapch")),
    "initcapUTF8" -> (args => ChUnaryKernel5Expr(one(args), "initcapch")),
    "cbrt" -> (args => Cbrt(one(args))),
    "degrees" -> (args => ToDegrees(one(args))),
    "radians" -> (args => ToRadians(one(args))),
    "space" -> (args => StringSpace(one(args))),
    // block-model stand-in like blockNumber (documented): the batch
    // engine evaluates now() once per QUERY, which is also what
    // nowInBlock's per-block stability degrades to in one plan
    "nowInBlock" -> (_ => Now()),
    "base32Encode" -> (args => ChUnaryKernel5Expr(one(args), "base32encode")),
    "base32Decode" -> (args => Cast(
      ChUnaryKernel5Expr(one(args), "base32decode"),
      org.apache.spark.sql.types.StringType)),
    "tryBase32Decode" -> (args => ChTryOrNullExpr(Cast(
      ChUnaryKernel5Expr(one(args), "base32decode"),
      org.apache.spark.sql.types.StringType))),
    "tryIdnaEncode" -> (args =>
      ChTryOrNullExpr(ChStringKernelExpr3(one(args), "idnaEncode"))),
    "stringBytesUniq" -> (args =>
      ChUnaryKernel5Expr(one(args), "stringbytesuniq")),
    "stringBytesEntropy" -> (args =>
      ChUnaryKernel5Expr(one(args), "stringbytesentropy")),
    "ULIDStringToDateTime" -> (args =>
      ChUnaryKernel5Expr(one(args), "ulidtomicros")),
    "generateUUIDv7" -> (_ => ChUuidV7Expr()),
    // CH's internal murmur2-with-kafka-seed: lands on the Murmur3
    // stand-in like the rest of the internal-constant hash families
    // (same dispersion + sign-bit-cleared contract, different values)
    "kafkaMurmurHash" -> (args => Cast(BitwiseAnd(
      Cast(Murmur3Hash(args, 42), org.apache.spark.sql.types.LongType),
      Literal(0x7fffffffL)), org.apache.spark.sql.types.IntegerType)),
    "arrayNormalizedGini" -> { args =>
      require(args.length == 2, "arrayNormalizedGini(predicted, label)")
      ChNormalizedGiniExpr(toDArr(args.head), toDArr(args(1)))
    },
    "IPv6CIDRToRange" -> { args =>
      require(args.length == 2, "IPv6CIDRToRange(ipv6, prefix)")
      ChIpv6CidrRangeExpr(one(args),
        Cast(args(1), org.apache.spark.sql.types.IntegerType))
    },
    "JSONExtractKeysAndValues" -> { args =>
      require(args.length >= 2 && args.last.foldable &&
        String.valueOf(args.last.eval()) == "String",
        "JSONExtractKeysAndValues(json[, keys…], 'String'): only the " +
          "String value form is provided — extract other types through " +
          "JSONExtract* per key")
      ChJsonKeysValuesExpr(args.init)
    },
    "pointInEllipses" -> { args =>
      require(args.length >= 6 && (args.length - 2) % 4 == 0,
        "pointInEllipses(x, y, x0, y0, a0, b0, …): 2 + 4·N arguments")
      ChPointInEllipsesExpr(args.map(a =>
        Cast(a, org.apache.spark.sql.types.DoubleType)))
    },
    // stem: the ORIGINAL Porter algorithm for 'en' (CH runs Snowball
    // english/Porter2 — stems differ on a documented minority; other
    // languages need CH's compiled Snowball set)
    "stem" -> { args =>
      require(args.length == 2 && args.head.foldable,
        "stem('language', word): literal language")
      val lang = String.valueOf(args.head.eval())
      require(lang == "en" || lang == "english",
        s"stem: only 'en' (original Porter) is provided, got '$lang' — " +
          "other Snowball languages are not on this classpath")
      ChUnaryKernel5Expr(args(1), "porterstem")
    },
    "arrayUnion" -> (args => args.reduceLeft(ArrayUnion(_, _))),
    "arraySymmetricDifference" -> { args =>
      require(args.length >= 2,
        "arraySymmetricDifference(arr1, arr2, …): at least 2 arrays")
      // present in at least one but NOT in all = union minus intersection
      ArrayExcept(args.reduceLeft(ArrayUnion(_, _)),
        args.reduceLeft(ArrayIntersect(_, _)))
    },
    "detectLanguage" -> (_ => throw new IllegalArgumentException(
      "detectLanguage needs CH's compiled language model — use the " +
        "text_langid operator's trigram heuristic (TextOps.langidOn) " +
        "for a model-free recipe")),
    "detectCharset" -> (_ => throw new IllegalArgumentException(
      "detectCharset needs CH's compiled charset model — rewrite with " +
        "isValidUTF8() for the UTF-8-or-not split this engine stores")),
    "lemmatize" -> (_ => throw new IllegalArgumentException(
      "lemmatize needs a server-side lemma dictionary in CH too — " +
        "rewrite as a broadcast join against your own lemma table")),
    "synonyms" -> (_ => throw new IllegalArgumentException(
      "synonyms needs a server-side extension dictionary in CH too — " +
        "rewrite as a broadcast join against your own synonym table")),
    "sparseGrams" -> (_ => throw new IllegalArgumentException(
      "sparseGrams is experimental in CH — rewrite with graft_shingles/" +
        "graft_bigrams, the shingling surface this engine indexes with")),
    "xxh3" -> (_ => throw new IllegalArgumentException(
      "XXH3 is not on the JVM classpath — rewrite with xxHash64 (same " +
        "family, different constants)")),
    "ripeMD160" -> (_ => throw new IllegalArgumentException(
      "RIPEMD-160 is not on the JVM classpath — rewrite with SHA1/SHA256")),
    "keccak256" -> (_ => throw new IllegalArgumentException(
      "Keccak-256 is not on the JVM classpath — rewrite with SHA256")),
    "sqidEncode" -> (_ => throw new IllegalArgumentException(
      "sqids are not on this classpath — rewrite with base58Encode/" +
        "base32Encode for the short-id codec surface")),
    "sqidDecode" -> (_ => throw new IllegalArgumentException(
      "sqids are not on this classpath — rewrite with base58Decode/" +
        "base32Decode for the short-id codec surface")),
    "bech32Encode" -> (_ => throw new IllegalArgumentException(
      "bech32 is not on this classpath — rewrite with base32Encode for " +
        "the 5-bit codec surface (no BCH checksum)")),
    "yandexConsistentHash" -> (_ => throw new IllegalArgumentException(
      "yandexConsistentHash's table is CH-internal — rewrite with " +
        "kostikConsistentHash/jumpConsistentHash, the provided " +
        "consistent-hash surface")),
    "studentTTestOneSample" -> (_ => throw new IllegalArgumentException(
      "studentTTestOneSample is closed-form over avg/stddev/count vs " +
        "the literal mean — rewrite as t = (avg(x) − μ)·sqrt(n)/" +
        "stddev(x) (the q68 recipe)")),
    // ---- eighteenth batch: tuple element-wise algebra, duration/uuid
    // codecs, map-key pattern ops, rand distributions, tz introspection
    "tupleMultiply" -> (args =>
      ChTupleArithExpr(args.head, Some(args(1)), "mul")),
    "tupleDivide" -> (args =>
      ChTupleArithExpr(args.head, Some(args(1)), "div")),
    "tupleIntDiv" -> (args =>
      ChTupleArithExpr(args.head, Some(args(1)), "intdiv")),
    "tupleModulo" -> (args =>
      ChTupleArithExpr(args.head, Some(args(1)), "mod")),
    "parseTimeDelta" -> (args =>
      ChUnaryKernel5Expr(one(args), "parsetimedelta")),
    "UUIDv7ToDateTime" -> (args =>
      ChUnaryKernel5Expr(one(args), "uuidv7tomicros")),
    "extractKeyValuePairs" -> { args =>
      require(args.length == 1,
        "extractKeyValuePairs(s): only the default dials (':' key-value" +
          " delimiter, space/','/';' pair delimiters) are provided — " +
          "custom delimiters rewrite with str_to_map")
      ChUnaryKernel5Expr(one(args), "extractkvp")
    },
    // CH mode-0 toLastDayOfWeek rounds UP to Saturday (the Sunday-start
    // convention toStartOfWeek already follows): date + (7 − dayofweek)
    "toLastDayOfWeek" -> (args => DateAdd(
      Cast(one(args), org.apache.spark.sql.types.DateType),
      Subtract(Literal(7), DayOfWeek(one(args))))),
    "addDate" -> (args => Add(args.head, args(1))),
    "subDate" -> (args => Subtract(args.head, args(1))),
    "makeDate32" -> (args => MakeDate(args.head, args(1), args(2))),
    "dateTime64ToSnowflake" -> (args => ShiftLeft(
      Subtract(UnixMillis(Cast(one(args),
        org.apache.spark.sql.types.TimestampType)),
        Literal(1288834974657L)), Literal(22))),
    // toTimezone changes the DISPLAY zone of the same instant; Spark
    // timestamps carry no zone, so the rendering change is the
    // convert_timezone rebase from the session zone (MIGRATION note)
    "toTimezone" -> (args => ConvertTimezone(CurrentTimeZone(), args(1),
      Cast(args.head, org.apache.spark.sql.types.TimestampType))),
    // value-zone introspection answers for the SESSION (the hostName/
    // serverUUID driver-JVM rule: Spark values carry no zone metadata)
    "timezoneOf" -> (_ => CurrentTimeZone()),
    "serverTimezone" -> (_ => CurrentTimeZone()),
    "mapConcat" -> (args => MapConcat(args)),
    "mapPartialSort" -> { args =>
      require(args.length == 2,
        "mapPartialSort(limit, map): exactly 2 arguments — the " +
          "lambda-comparator form is not supported; the full key sort " +
          "refines CH's unspecified tail order (the arrayPartialSort rule)")
      new MapFromEntries(new SortArray(MapEntries(args(1)), Literal(true)))
    },
    "mapContainsKeyLike" -> { args =>
      val k = UnresolvedNamedLambdaVariable(Seq("graft_mckl_k"))
      val v = UnresolvedNamedLambdaVariable(Seq("graft_mckl_v"))
      GreaterThan(Size(MapKeys(MapFilter(args.head,
        LambdaFunction(new Like(k, args(1)), Seq(k, v))))), Literal(0))
    },
    "mapExtractKeyLike" -> { args =>
      val k = UnresolvedNamedLambdaVariable(Seq("graft_mekl_k"))
      val v = UnresolvedNamedLambdaVariable(Seq("graft_mekl_v"))
      MapFilter(args.head, LambdaFunction(new Like(k, args(1)), Seq(k, v)))
    },
    // ---- nineteenth batch: subsequence probes, code-point edit
    // distance, char-n-gram signatures, vector normalization, UTC
    // timestamp rebase (CH's Spark-compat aliases)
    "hasSubsequence" -> (args =>
      ChStringPair6Expr(args.head, args(1), "hassubsequence")),
    "hasSubsequenceUTF8" -> (args =>
      ChStringPair6Expr(args.head, args(1), "hassubsequenceutf8")),
    "hasSubsequenceCaseInsensitive" -> (args =>
      ChStringPair6Expr(args.head, args(1), "hassubsequenceci")),
    "hasSubsequenceCaseInsensitiveUTF8" -> (args =>
      ChStringPair6Expr(args.head, args(1), "hassubsequenceciutf8")),
    // Spark's Levenshtein is already code-point-aware (4-byte UTF-8
    // chars are one edit), so the UTF8 spellings reuse it — no second
    // DP to maintain (r15 review simplification); Long like CH's UInt
    "editDistanceUTF8" -> (args =>
      Cast(Levenshtein(args.head, args(1)),
        org.apache.spark.sql.types.LongType)),
    "levenshteinDistanceUTF8" -> (args =>
      Cast(Levenshtein(args.head, args(1)),
        org.apache.spark.sql.types.LongType)),
    // the graft portable n-gram signatures (the wordShingleSimHash
    // rule: CH's hash constants are internal — same contract,
    // different bit values)
    "ngramSimHash" -> (args => ChUnaryKernel6Expr(one(args), "ngramsimhash")),
    "ngramSimHashCaseInsensitive" -> (args =>
      ChUnaryKernel6Expr(one(args), "ngramsimhashci")),
    "ngramMinHash" -> (args => ChUnaryKernel6Expr(one(args), "ngramminhash")),
    "ngramMinHashCaseInsensitive" -> (args =>
      ChUnaryKernel6Expr(one(args), "ngramminhashci")),
    "L1Normalize" -> (args => ChNormalizeExpr(toDArr(one(args)), 1)),
    "L2Normalize" -> (args => ChNormalizeExpr(toDArr(one(args)), 2)),
    "LinfNormalize" -> (args => ChNormalizeExpr(toDArr(one(args)), 3)),
    "toUTCTimestamp" -> (args => ToUTCTimestamp(
      Cast(args.head, org.apache.spark.sql.types.TimestampType), args(1))),
    "fromUTCTimestamp" -> (args => FromUTCTimestamp(
      Cast(args.head, org.apache.spark.sql.types.TimestampType), args(1))),
    // rand distribution family — nondeterministic like generateULID
    "randCanonical" -> (_ => new Rand(Literal(null))),
    "randUniform" -> (args => Add(args.head,
      Multiply(new Rand(Literal(null)),
        Subtract(args(1), args.head)))),
    "randNormal" -> (args => Add(args.head,
      Multiply(new Randn(Literal(null)), args(1)))),
    "randBernoulli" -> (args => Cast(
      LessThan(new Rand(Literal(null)), args.head),
      org.apache.spark.sql.types.IntegerType)),
    "randExponential" -> (args => Divide(
      UnaryMinus(Log(Subtract(Literal(1.0), new Rand(Literal(null))))),
      args.head)),
    "greatCircleAngle" -> (args => Multiply(haversineMeters(args),
      Literal(180.0 / (math.Pi * 6371000.0)))),
    // byteSlice works on the raw bytes (Substring over BINARY is
    // byte-indexed; the string form is code-point-indexed)
    "byteSlice" -> (args => Cast(Substring(
      Cast(args.head, org.apache.spark.sql.types.BinaryType),
      Cast(args(1), org.apache.spark.sql.types.IntegerType),
      Cast(args(2), org.apache.spark.sql.types.IntegerType)),
      org.apache.spark.sql.types.StringType)),
    "randPoisson" -> (_ => throw new IllegalArgumentException(
      "randPoisson has no closed inverse CDF — rewrite with the Knuth " +
        "product loop over randCanonical() in a generator job, or use " +
        "randExponential inter-arrival sums")),
    "untuple" -> (_ => throw new IllegalArgumentException(
      "untuple is a SELECT-clause splat — rewrite as t.* or name the " +
        "fields with tupleElement(t, i)")),
    "tupleConcat" -> (_ => throw new IllegalArgumentException(
      "tupleConcat needs resolved field lists — rewrite as " +
        "struct(a.*, b.*) or name the fields explicitly")),
    "fuzzBits" -> (_ => throw new IllegalArgumentException(
      "fuzzBits is a fuzz-testing helper — rewrite bit flips " +
        "explicitly with xor + shiftLeft over randCanonical()")),
    "transactionID" -> (_ => throw new IllegalArgumentException(
      "transactionID needs CH's experimental transactions — no Spark " +
        "analog; rewrite observability on the batch/epoch id")),
    "dumpColumnStructure" -> (_ => throw new IllegalArgumentException(
      "dumpColumnStructure inspects CH block columns — rewrite with " +
        "toTypeName / the DataFrame schema")),
    "structureToCapnProtoSchema" -> (_ => throw new IllegalArgumentException(
      "CapnProto schema generation is out of scope — rewrite with the " +
        "DataFrame schema's DDL string")),
    "geohashesInBox" -> (_ => throw new IllegalArgumentException(
      "geohashesInBox enumerates a cover set — rewrite as geohashEncode" +
        " over an explode of the box's lat/lon grid steps")))

  /** changeYear/… recomposition: make_timestamp with one part swapped.
    */
  private def changeDatePart(args: Seq[Expression], part: String): Expression = {
    require(args.length == 2, s"change${part.capitalize}(date, value)")
    val ts = Cast(args.head, org.apache.spark.sql.types.TimestampType)
    val v = Cast(args(1), org.apache.spark.sql.types.IntegerType)
    def p(name: String): Expression = name match {
      case "year" => Year(ts)
      case "month" => Month(ts)
      case "day" => DayOfMonth(ts)
      case "hour" => Hour(ts)
      case "minute" => Minute(ts)
      case "second" => Cast(Second(ts), org.apache.spark.sql.types.IntegerType)
    }
    val parts = Seq("year", "month", "day", "hour", "minute", "second")
      .map(n => if (n == part) v else p(n))
    MakeTimestamp(parts(0), parts(1), parts(2), parts(3), parts(4),
      Cast(parts(5), org.apache.spark.sql.types.DecimalType(16, 6)),
      None, None, failOnError = false)
  }

  private def toDArr(e: Expression): Expression =
    Cast(e, org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))

  /** Double-summing fold over a row-local array (vector-math helper). */
  private def arraySumD(arr: Expression): Expression = {
    val acc = UnresolvedNamedLambdaVariable(Seq("graft_as_acc"))
    val y = UnresolvedNamedLambdaVariable(Seq("graft_as_y"))
    ArrayAggregate(toDArr(arr), Literal(0.0d),
      LambdaFunction(Add(acc, y), Seq(acc, y)),
      LambdaFunction(acc, Seq(acc)))
  }

  /** arrayShiftLeft/Right(arr, n, fill): slide and pad — the fill is
    * required (CH defaults to the element type's zero; a silent wrong
    * default is worse than asking for it).
    */
  private def arrayShift(args: Seq[Expression], left: Boolean): Expression = {
    require(args.length == 3,
      "arrayShiftLeft/Right(arr, n, fill) — pass the fill explicitly " +
        "(CH's default is the element type's zero)")
    val arr = args.head
    val n = Cast(args(1), org.apache.spark.sql.types.IntegerType)
    val k = Least(Seq(Greatest(Seq(n, Literal(0))), Size(arr)))
    val pad = ArrayRepeat(args(2), k)
    // slice length is computed, never Int.MaxValue: Slice adds start +
    // length internally and a MaxValue sentinel overflows to an empty
    // result
    if (left)
      Concat(Seq(Slice(arr, Add(k, Literal(1)), Subtract(Size(arr), k)), pad))
    else
      Concat(Seq(pad, Slice(arr, Literal(1), Subtract(Size(arr), k))))
  }

  /** CH's fixed rounding ladders (roundAge/roundDuration): below the
    * first threshold → 0, else the largest (threshold → value) whose
    * threshold is ≤ x.
    */
  private def bucketLadder(x: Expression,
    ladder: Seq[(Long, Long)]): Expression = {
    val v = Cast(x, org.apache.spark.sql.types.LongType)
    CaseWhen(ladder.reverse.map { case (lo, out) =>
      (GreaterThanOrEqual(v, Literal(lo)), Literal(out): Expression)
    }, Some(Literal(0L)))
  }

  private def emptyArr(dt: org.apache.spark.sql.types.DataType): Expression =
    Literal.create(Array.empty[Any],
      org.apache.spark.sql.types.ArrayType(dt))

  /** minMap/maxMap: fold collected maps via MapZipWith — seeded from
    * the FIRST collected map so the fold is correctly typed without a
    * plan-time map literal; least/greatest skip missing-key nulls.
    * Result keys sorted, like CH's.
    */
  private def mapMinMax(m: Expression, isMin: Boolean): Expression = {
    val lst = CollectList(m).toAggregateExpression()
    val acc = UnresolvedNamedLambdaVariable(Seq("graft_mm_acc"))
    val x = UnresolvedNamedLambdaVariable(Seq("graft_mm_x"))
    val k = UnresolvedNamedLambdaVariable(Seq("graft_mm_k"))
    val v1 = UnresolvedNamedLambdaVariable(Seq("graft_mm_v1"))
    val v2 = UnresolvedNamedLambdaVariable(Seq("graft_mm_v2"))
    val pick: Expression =
      if (isMin) Least(Seq(v1, v2)) else Greatest(Seq(v1, v2))
    val folded = ArrayAggregate(
      Slice(lst, Literal(2),
        Greatest(Seq(Literal(0), Subtract(Size(lst), Literal(1))))),
      ElementAt(lst, Literal(1)),
      LambdaFunction(MapZipWith(acc, x,
        LambdaFunction(pick, Seq(k, v1, v2))), Seq(acc, x)),
      LambdaFunction(acc, Seq(acc)))
    new MapFromEntries(new SortArray(MapEntries(folded), Literal(true)))
  }

  /** mapAdd/mapSubtract: MapZipWith over the key union with null-coalesced
    * element arithmetic.
    */
  private def mapArith(args: Seq[Expression], subtract: Boolean): Expression = {
    require(args.length == 2, "mapAdd/mapSubtract expect exactly 2 maps")
    val k = UnresolvedNamedLambdaVariable(Seq("ma_k"))
    val v1 = UnresolvedNamedLambdaVariable(Seq("ma_v1"))
    val v2 = UnresolvedNamedLambdaVariable(Seq("ma_v2"))
    val a = Coalesce(Seq(v1, Literal(0)))
    val b = Coalesce(Seq(v2, Literal(0)))
    val body = if (subtract) Subtract(a, b) else Add(a, b)
    MapZipWith(args.head, args(1), LambdaFunction(body, Seq(k, v1, v2)))
  }

  /** Haversine distance in meters on the 6371 km mean-radius sphere;
    * args = (lon1, lat1, lon2, lat2) in degrees, ClickHouse's order.
    */
  private def haversineMeters(args: Seq[Expression]): Expression = {
    require(args.length == 4,
      "greatCircleDistance expects (lon1, lat1, lon2, lat2)")
    def rad(e: Expression) = Multiply(
      Cast(e, org.apache.spark.sql.types.DoubleType),
      Literal(math.Pi / 180.0))
    val dLat = Divide(Subtract(rad(args(3)), rad(args(1))), Literal(2.0))
    val dLon = Divide(Subtract(rad(args(2)), rad(args.head)), Literal(2.0))
    val h = Add(
      Multiply(Sin(dLat), Sin(dLat)),
      Multiply(Multiply(Cos(rad(args(1))), Cos(rad(args(3)))),
        Multiply(Sin(dLon), Sin(dLon))))
    Multiply(Literal(2.0 * 6371000.0), Asin(Sqrt(h)))
  }

  /** Literal scale for toDecimal32/64/128 (CH requires a literal too). */
  private def decimalScale(args: Seq[Expression]): Int = {
    require(args.length == 2 && args(1).foldable,
      "toDecimalN(x, scale): scale must be a literal")
    args(1).eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"toDecimalN: integer scale expected, got $other")
    }
  }

  /** JSONPath from CH trailing keys: strings descend, 1-based ints index. */
  private def jsonExtract(args: Seq[Expression]): Expression = {
    if (args.length < 2)
      throw new IllegalArgumentException("JSONExtract*: json and ≥1 key expected")
    val path = args.tail.map { k =>
      if (!k.foldable)
        throw new IllegalArgumentException("JSONExtract*: keys must be literals")
      k.eval() match {
        case i: Int => s"[${i - 1}]"
        case l: Long => s"[${l - 1}]"
        case s => "." + String.valueOf(s)
      }
    }.mkString
    GetJsonObject(args.head, Literal("$" + path))
  }

  /** MySQL/CH datetime specifiers → Spark pattern; non-specifier letters
    * are quoted so they stay literal.
    */
  private[functions] def translateDateFormat(ch: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < ch.length) {
      val c = ch.charAt(i)
      if (c == '%' && i + 1 < ch.length) {
        sb.append(ch.charAt(i + 1) match {
          case 'Y' => "yyyy"
          case 'y' => "yy"
          case 'm' => "MM"
          case 'd' => "dd"
          case 'H' => "HH"
          case 'I' => "hh"
          case 'i' => "mm"
          case 'M' => "MMMM"
          case 'S' | 's' => "ss" // CH: %S and %s are both seconds
          case 'p' => "a"
          case 'j' => "DDD"
          case 'e' => "d"
          case 'a' => "EEE"
          case 'W' => "EEEE"
          case 'b' | 'h' => "MMM"
          case 'F' => "yyyy-MM-dd"
          case 'D' => "MM/dd/yy"
          case 'T' => "HH:mm:ss"
          case 'R' => "HH:mm"
          case '%' => "%"
          case other => throw new IllegalArgumentException(
            s"formatDateTime: unsupported specifier %$other")
        })
        i += 2
      } else {
        if (Character.isLetter(c)) sb.append('\'').append(c).append('\'')
        else sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** `greatest(0, e)` — keeps empty-array edge cases (arrayPopBack([]))
    * total instead of erroring inside Slice.
    */
  private def greatestZero(e: Expression): Expression =
    Greatest(Seq(Literal(0), e))

  /** Floor a timestamp onto an n-second epoch grid (toStartOfFiveMinutes
    * and friends): integral-divide the epoch second, re-multiply.
    */
  private def floorSeconds(ts: Expression, n: Long): Expression =
    SecondsToTimestamp(Multiply(IntegralDivide(
      UnixSeconds(Cast(ts, org.apache.spark.sql.types.TimestampType)),
      Literal(n)), Literal(n)))

  /** Calendar grids toStartOfInterval accepts: 1 month / 1 quarter / 1
    * year as month counts (CH's sub-month year-month grids are unusual
    * enough to fail loudly instead of silently mis-aligning).
    */
  private def monthGridTrunc(months: Int, ts: Expression): Expression =
    months match {
      case 1 => TruncTimestamp(Literal("month"), ts)
      case 3 => TruncTimestamp(Literal("quarter"), ts)
      case 12 => TruncTimestamp(Literal("year"), ts)
      case other => throw new IllegalArgumentException(
        s"toStartOfInterval: unsupported $other-month grid (1, 3, or 12)")
    }

  private def parseUrl(url: Expression, part: String): Expression =
    new ParseUrl(Seq(url, Literal(part)))

  /** try_to_timestamp with a fixed pattern (null on mismatch). */
  private def tryTs(e: Expression, fmt: String): Expression =
    new ParseToTimestamp(e, Some(Literal(fmt)),
      org.apache.spark.sql.types.TimestampType, None, false)

  private def bestEffortTimestamp(e: Expression): Expression =
    Coalesce(Seq(
      tryTs(e, "yyyy-MM-dd'T'HH:mm:ss"),
      tryTs(e, "yyyy-MM-dd HH:mm:ss"),
      tryTs(e, "yyyy-MM-dd"),
      CaseWhen(Seq((RLike(e, Literal("^[0-9]{9,10}$")),
        SecondsToTimestamp(Cast(e, org.apache.spark.sql.types.LongType)))), None),
      tryTs(e, "yyyyMMdd"),
      tryTs(e, "dd/MM/yyyy")))

  /** OR of single-bit masks for bitTestAll/bitTestAny. */
  private def bitMask(bits: Seq[Expression]): Expression =
    bits.map(b => ShiftLeft(Literal(1L),
      Cast(b, org.apache.spark.sql.types.IntegerType)): Expression)
      .reduce((a, b) => BitwiseOr(a, b))

  /** arrayRotateLeft with a sign-total shift (Pmod handles negatives);
    * empty arrays pass through untouched.
    */
  private def rotateLeft(arr: Expression, n: Expression): Expression = {
    val k = Pmod(Cast(n, org.apache.spark.sql.types.IntegerType), Size(arr))
    If(LessThanOrEqual(Size(arr), Literal(0)), arr,
      Concat(Seq(Slice(arr, Add(k, Literal(1)), Subtract(Size(arr), k)),
        Slice(arr, Literal(1), k))))
  }

  /** Dotted-quad IPv4 → UInt32, shared by IPv4StringToNum and toIPv4. */
  private def ipv4ToNum(arg: Expression): Expression = {
    val parts = StringSplit(arg, Literal("\\."), Literal(-1))
    def p(i: Int): Expression = Cast(ElementAt(parts, Literal(i)),
      org.apache.spark.sql.types.LongType)
    Add(Add(Add(Multiply(p(1), Literal(16777216L)),
      Multiply(p(2), Literal(65536L))), Multiply(p(3), Literal(256L))), p(4))
  }

  /** Whole-document JSON arg (1-arg form) or the CH key path descended
    * (2+ args) — shared by JSONLength/JSONExtractKeys/JSONExtractRaw.
    */
  private def jsonNode(args: Seq[Expression]): Expression =
    if (args.length == 1) args.head else jsonExtract(args)

  /** CH higher-order functions put the lambda FIRST (arrayMap(x -> …, a));
    * Spark's resolver delivers it as a LambdaFunction expression already.
    */
  private def validateLambda(e: Expression): LambdaFunction = e match {
    case l: LambdaFunction => l
    case other => throw new IllegalArgumentException(
      s"expected a lambda (x -> …) as the first argument, got $other")
  }

  /** CH's fallible-conversion family, generated over the numeric/date
    * widths: `to<T>OrNull(x)` is a TRY cast (null on failure, like CH),
    * `to<T>OrZero(x)` coalesces the TRY cast with the type's zero —
    * the spellings every defensive CH ingest query uses.
    */
  private val castOrEntries: Seq[(String, Seq[Expression] => Expression)] = {
    import org.apache.spark.sql.types._
    def tryCast(e: Expression, dt: DataType): Expression =
      Cast(e, dt, None, EvalMode.TRY)
    val numeric: Seq[(String, DataType, Expression)] = Seq(
      ("Int8", ByteType, Literal(0.toByte)),
      ("Int16", ShortType, Literal(0.toShort)),
      ("Int32", IntegerType, Literal(0)),
      ("Int64", LongType, Literal(0L)),
      ("UInt8", ShortType, Literal(0.toShort)),
      ("UInt16", IntegerType, Literal(0)),
      ("UInt32", LongType, Literal(0L)),
      ("UInt64", LongType, Literal(0L)),
      ("Float32", FloatType, Literal(0.0f)),
      ("Float64", DoubleType, Literal(0.0)))
    val temporal: Seq[(String, DataType, Expression)] = Seq(
      ("Date", DateType, Cast(Literal("1970-01-01"), DateType)),
      ("DateTime", TimestampType,
        Cast(Literal("1970-01-01 00:00:00"), TimestampType)))
    (numeric ++ temporal).flatMap { case (ch, dt, zero) =>
      Seq(
        s"to${ch}OrNull" ->
          ((args: Seq[Expression]) => tryCast(one(args), dt)),
        s"to${ch}OrZero" ->
          ((args: Seq[Expression]) =>
            Coalesce(Seq(tryCast(one(args), dt), zero))))
    }
  }

  /** Register (or refresh) the dialect names on a live session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    (builders ++ castOrEntries).foreach { case (name, builder) =>
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id))
        reg.registerFunction(id, new ExpressionInfo(getClass.getName, name), builder)
    }
  }

  /** Names exposed by this dialect (for docs/tests). */
  def names: Seq[String] = (builders ++ castOrEntries).map(_._1)
}
