package graft

import graft.functions.{ClickHouseDialect, ClickHouseSql}

/** Dev probe (not part of the suite contract): evaluate a battery of
  * common ClickHouse expressions through the dialect and report which
  * fail — coverage radar for the function surface.
  */
object FnProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("fnprobe")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ClickHouseDialect.register(spark)
    val exprs = Seq(
      "arrayStringConcat(array('a','b'), '-')",
      "splitByChar(',', 'a,b,c')",
      "toStartOfFiveMinutes(toDateTime('2024-01-01 00:07:00'))",
      "toStartOfFifteenMinutes(toDateTime('2024-01-01 00:17:00'))",
      "formatDateTime(toDateTime('2024-01-02 03:04:05'), '%Y-%m-%d')",
      "toUnixTimestamp(toDateTime('2024-01-01 00:00:00'))",
      "has(array(1,2,3), 2)",
      "indexOf(array('x','y'), 'y')",
      "empty('')", "notEmpty('a')", "empty(array())",
      "lengthUTF8('héllo')",
      "substringUTF8('héllo', 2, 3)",
      "positionCaseInsensitive('Hello', 'LL')",
      "multiSearchAny('hello world', array('wor', 'zzz'))",
      "extractAll('a1b22c333', '\\\\d+')",
      "JSONExtractString('{\"a\":\"v\"}', 'a')",
      "JSONExtractInt('{\"a\":7}', 'a')",
      "mapKeys(map('k', 1))", "mapValues(map('k', 1))",
      "arrayIntersect(array(1,2,3), array(2,3,4))",
      "arrayDistinct(array(1,1,2))",
      "arrayReverse(array(1,2))",
      "arraySlice(array(1,2,3,4), 2, 2)",
      "arrayPushBack(array(1), 2)",
      "arrayPopFront(array(1,2))",
      "arrayCompact(array(1,1,2,1))",
      "arrayDifference(array(1,4,9))",
      "arrayCumSum(array(1,2,3))",
      "bitCount(7)",
      "toFixedString('ab', 4)",
      "leftPad('7', 3, '0')", "rightPad('7', 3, '0')",
      "trimBoth('  x  ')", "trimLeft(' x')", "trimRight('x ')",
      "startsWith('abc', 'ab')", "endsWith('abc', 'bc')",
      "tupleElement((1, 'x'), 2)",
      "greatest(1, 2, 3)", "least(1, 2, 3)",
      "intDivOrZero(7, 0)", "moduloOrZero(7, 0)",
      "ifNull(NULL, 5)", "nullIf(3, 3)", "assumeNotNull(3)",
      "toInt64OrZero('12x')", "toFloat64OrZero('x')",
      "toDateOrNull('not a date')",
      "coalesce(NULL, 2)",
      "roundToExp2(100)", "roundDown(5.7, array(1.0, 5.0, 10.0))",
      "e()", "pi()",
      "cityHash64('x')", "sipHash64('x')", "farmHash64('x')",
      "halfMD5('x')", "hex(255)", "unhex('ff')",
      "bitmaskToList(10)",
      "domainWithoutWWW('https://www.x.com/p')",
      "cutQueryString('http://x.com/p?a=1')",
      "toIPv4('1.2.3.4')",
      "dateName('month', toDate('2024-03-01'))",
      "monthName(toDate('2024-03-01'))",
      "toLastDayOfMonth(toDate('2024-02-05'))",
      "addDays(toDate('2024-01-01'), 5)",
      "subtractMonths(toDate('2024-03-01'), 1)",
      "age('day', toDate('2024-01-01'), toDate('2024-02-01'))",
      "timeSlot(toDateTime('2024-01-01 00:47:00'))",
      "arrayZip(array(1,2), array('a','b'))",
      "arrayAvg(array(1,2,3))", "arrayProduct(array(2,3))",
      "arrayNorm(array(3.0,4.0))",
      "arrayAll(x -> x > 0, array(1,2))",
      "arrayExists(x -> x > 1, array(1,2))",
      "arrayCount(x -> x > 1, array(1,2,3))",
      "arrayMap(x -> x * 2, array(1,2))",
      "arrayFilter(x -> x > 1, array(1,2,3))",
      "arraySort(array(3,1,2))", "arrayReverseSort(array(1,3,2))",
      // r9 eighth batch + fresh candidates
      "hex(MD5('abc'))", "length(SHA256('abc'))",
      "substringIndex('a.b.c', '.', 2)",
      "ngrams('abcd', 2)",
      "makeDate(2024, 2, 29)", "makeDateTime(2024, 1, 2, 3, 4, 5)",
      "monthName(toDate('2024-03-01'))",
      "toStartOfSecond(toDateTime('2024-01-01 01:02:03'))",
      "toRelativeDayNum(toDate('1970-01-11'))",
      "toDecimal64('2.50', 2)",
      "netloc('https://x.com/p')",
      "firstSignificantSubdomain('https://a.b.example.com/x')",
      "cutToFirstSignificantSubdomain('https://a.b.example.com/x')",
      "decodeURLComponent(encodeURLComponent('a b'))",
      "length(generateUUIDv4())",
      "ifNotFinite(acos(2.0), 42.0)",
      // untried candidates — the radar's next frontier
      "tokens('a b  c')",
      "soundex('Smith')", "ascii('A')", "char(65, 66)",
      "initcap('hello world')", "reverse('abc')", "repeat('ab', 2)",
      "format('{} and {}', 'a', 'b')",
      "splitByRegexp('\\\\d+', 'a1b22c')",
      "extractGroups('a1b2', '([a-z])(\\\\d)')",
      "arrayFirst(x -> x > 1, array(1,2,3))",
      "arrayLast(x -> x > 1, array(1,2,3))",
      "arrayFirstIndex(x -> x > 1, array(1,2,3))",
      "arrayLastIndex(x -> x > 1, array(1,2,3))",
      "arrayShingles(array(1,2,3,4), 2)",
      "arrayRotateRight(array(1,2,3), 1)",
      "arrayEnumerateDense(array(10,20,10))",
      "arrayAUC(array(0.1,0.4,0.35,0.8), array(0,0,1,1))",
      "log2(8)", "cbrt(27.0)", "sign(-5)", "sigmoid(0.0)",
      "gcd(12, 18)", "lcm(4, 6)",
      "isNaN(acos(2.0))",
      "toISOYear(toDate('2024-01-01'))",
      "toYearWeek(toDate('2024-03-05'))",
      "timeSlots(toDateTime('2024-01-01 00:00:00'), 3600)",
      "dateTrunc('month', toDate('2024-03-15'))",
      "byteSize('abc')",
      "normalizeQuery('SELECT 1 + 2')",
      "positionUTF8('héllo', 'llo')",
      // r11 tenth batch — bit ops, URL parts, IP, distances, readable
      // formats, JSON introspection, UTF-8 normalization, fuzzy strings
      "bitTest(5, 0)", "bitTestAll(7, 0, 1)", "bitTestAny(4, 0, 2)",
      "bitShiftLeft(1, 3)", "bitShiftRight(8, 3)",
      "bitHammingDistance(111, 109)",
      "concatWithSeparator('-', 'a', 'b')",
      "toStartOfTenMinutes(toDateTime('2024-01-01 00:17:00'))",
      "toMonday(toDate('2024-03-07'))",
      "toStartOfQuarter(toDate('2024-05-15'))",
      "toDayOfYear(toDate('2024-02-01'))",
      "toISOWeek(toDate('2024-01-04'))",
      "toYYYYMMDD(toDate('2024-03-05'))",
      "fromUnixTimestamp(0)",
      "dateDiff('day', toDate('2024-01-01'), toDate('2024-02-01'))",
      "addHours(toDateTime('2024-01-01 00:00:00'), 25)",
      "replaceOne('aaa', 'a', 'b')", "replaceRegexpAll('a1b2', '\\\\d', '#')",
      "countSubstrings('aaa', 'aa')", "countMatches('a1b22c', '\\\\d+')",
      "multiSearchFirstIndex('hello', array('zz', 'll'))",
      "extract('key=val', '=(.*)$')",
      "base64Encode('ab')", "base64Decode('YWI=')", "tryBase64Decode('!!')",
      "crc32('x')", "xxHash64('x')", "murmurHash2_64('x')",
      "javaHash('x')", "hiveHash('x')",
      "isValidJSON('{\"a\":1}')", "JSONLength('{\"a\":1,\"b\":2}')",
      "JSONHas('{\"a\":1}', 'a')", "JSONExtractKeys('{\"a\":1,\"b\":2}')",
      "JSONExtractFloat('{\"a\":2.5}', 'a')",
      "JSONExtractBool('{\"a\":true}', 'a')",
      "protocol('https://x.com/p')", "path('https://x.com/p?a=1')",
      "queryString('https://x.com/p?a=1&b=2')",
      "fragment('https://x.com/p#frag')",
      "topLevelDomain('https://a.example.com/x')",
      "extractURLParameter('http://x.com/?a=1&b=2', 'b')",
      "cutURLParameter('http://x.com/?a=1&b=2', 'a')",
      "IPv4NumToString(16909060)", "IPv4StringToNum('1.2.3.4')",
      "isIPv4String('1.2.3.4')", "isIPv6String('::1')",
      "arrayConcat(array(1), array(2,3))",
      "arrayResize(array(1,2), 4, 0)",
      "arrayFlatten(array(array(1,2), array(3)))",
      "arrayUniq(array(1,1,2))",
      "hasAll(array(1,2,3), array(2,3))", "hasAny(array(1,2), array(2,9))",
      "countEqual(array(1,2,1), 1)",
      "range(4)", "arrayWithConstant(3, 'x')",
      "arrayJaccardIndex(array(1,2,3), array(2,3,4))",
      "arrayReduce('sum', array(1,2,3))",
      "arrayRotateLeft(array(1,2,3), 1)",
      "arrayShiftLeft(array(1,2,3), 1, 0)",
      "mapContains(map('k', 1), 'k')",
      "mapFromArrays(array('a','b'), array(1,2))",
      "mapFilter((k, v) -> v > 1, map('a', 1, 'b', 2))",
      "mapAdd(map('a', 1), map('a', 2, 'b', 5))",
      "dotProduct(array(1.0,2.0), array(3.0,4.0))",
      "L1Norm(array(1.0,-2.0))", "L2Norm(array(3.0,4.0))",
      "LinfNorm(array(1.0,-5.0))",
      "L2Distance(array(0.0,0.0), array(3.0,4.0))",
      "cosineDistance(array(1.0,0.0), array(0.0,1.0))",
      "tupleHammingDistance((1, 2), (1, 3))",
      "toTypeName(CAST(1 AS BIGINT))", "isFinite(1.0)", "isInfinite(1.0)",
      "transform(2, array(1,2), array('a','b'), 'z')",
      "multiIf(1 > 2, 'a', 3 > 2, 'b', 'c')",
      "intExp2(3)", "intExp10(2)", "exp2(3.0)", "exp10(2.0)",
      "degrees(pi())", "hypot(3.0, 4.0)", "lgamma(5.0)", "tgamma(5.0)",
      "roundBankers(2.5)", "roundAge(25)", "roundDuration(100)",
      "formatReadableSize(1048576)", "formatReadableQuantity(1234567)",
      "formatReadableTimeDelta(3661)",
      "parseDateTimeBestEffort('2024-01-02 03:04:05')",
      "toUInt8('5')", "toInt32OrNull('x')",
      "bar(5, 0, 10, 10)", "countDigits(12345)",
      "normalizeUTF8NFC('é')", "toValidUTF8('ok')",
      "translate('abc', 'ab', 'xy')",
      "editDistance('abc', 'abd')", "levenshteinDistance('abc', 'axc')",
      "jaroWinklerSimilarity('abc', 'abd')",
      "regexpQuoteMeta('a.b')",
      "left('abcde', 2)", "right('abcde', 2)", "space(3)",
      "intDiv(7, 2)", "modulo(7, 3)", "negate(5)", "plus(1, 2)",
      "emptyArrayInt64()", "emptyArrayString()",
      // r11 eleventh batch — date/string/array/map/tuple/URL/JSON/math
      // long tails the tenth batch didn't reach
      "toStartOfISOYear(toDate('2024-01-01'))",
      "toWeek(toDate('2024-03-05'))",
      "subtractHours(toDateTime('2024-01-02 03:00:00'), 4)",
      "addQuarters(toDate('2024-01-15'), 2)",
      "toModifiedJulianDay('2024-01-01')",
      "fromModifiedJulianDay(60310)",
      "today()", "yesterday()",
      "toDaysSinceYearZero(toDate('2024-01-01'))",
      "ngramDistance('hello', 'hallo')",
      "countSubstringsCaseInsensitive('AaA', 'a')",
      "positionCaseInsensitiveUTF8('HÉllo', 'éll')",
      "wordShingleSimHash('a b c d e')",
      "difference('Smith', 'Smyth')",
      "concatAssumeInjective('a', 'b')",
      "toString(42)", "toStringCutToZero('ab cd')",
      "arrayFold((acc, x) -> acc + x, array(1,2,3), 0)",
      "arrayFill(x -> x > 0, array(1, 0, 2, 0))",
      "arraySplit((x, y) -> y > x, array(1, 3, 2, 5))",
      "arrayStringConcat(array('x','y'))",
      "arraySum(array(1,2,3))", "arrayMin(array(3,1))", "arrayMax(array(3,1))",
      "arrayPartialSort(2, array(3,1,2))",
      "mapExists((k, v) -> v > 1, map('a', 1, 'b', 2))",
      "mapAll((k, v) -> v > 0, map('a', 1))",
      "mapUpdate(map('a', 1, 'b', 2), map('b', 9))",
      "mapApply((k, v) -> (k, v * 2), map('a', 1))",
      "mapSort(map('b', 2, 'a', 1))",
      "tuplePlus((1, 2), (3, 4))", "tupleMinus((5, 5), (1, 2))",
      "tupleMultiplyByNumber((1, 2), 3)", "tupleNegate((1, -2))",
      "encodeURLFormComponent('a b')", "decodeURLFormComponent('a+b')",
      "queryStringAndFragment('http://x.com/p?a=1#f')",
      "cutWWW('https://www.x.com/p')",
      "URLHierarchy('https://x.com/a/b?c=1')",
      "URLPathHierarchy('https://x.com/a/b')",
      "extractURLParameters('http://x.com/?a=1&b=2')",
      "extractURLParameterNames('http://x.com/?a=1&b=2')",
      "toIPv6('::1')",
      "IPv4CIDRToRange(toIPv4('192.168.5.2'), 16)",
      "isIPAddressInRange('127.0.0.1', '127.0.0.0/8')",
      "JSONType('{\"a\":1}')", "JSONType('{\"a\":1}', 'a')",
      "JSONExtractArrayRaw('{\"a\":[1,2]}', 'a')",
      "JSONArrayLength('[1,2,3]')",
      "simpleJSONExtractString('{\"a\":\"v\"}', 'a')",
      "simpleJSONExtractInt('{\"a\":7}', 'a')",
      "simpleJSONHas('{\"a\":7}', 'a')",
      "erf(0.5)", "erfc(0.5)", "cosh(1.0)", "sinh(1.0)",
      "asinh(1.0)", "acosh(2.0)", "atanh(0.5)", "atan2(1.0, 2.0)",
      "log1p(0.5)", "cot(1.0)", "factorial(5)",
      "divideDecimal(toDecimal64('10.0', 2), toDecimal64('3.0', 2), 4)",
      "multiplyDecimal(toDecimal64('2.5', 2), toDecimal64('4.0', 2))",
      "min2(3, 5)", "max2(3, 5)",
      "proportionsZTest(10, 20, 100, 100, 0.95, 'unpooled')"
    )
    // aggregate battery over a tiny table — the same radar for the
    // aggregate-name surface
    spark.sql("""SELECT * FROM VALUES
      (1, 'a', 1.5, TIMESTAMP'2024-01-01 00:00:00'),
      (2, 'a', 2.5, TIMESTAMP'2024-01-01 00:01:00'),
      (3, 'b', 4.0, TIMESTAMP'2024-01-01 00:05:00')
      AS t(id, g, x, ts)""").createOrReplaceTempView("probe_t")
    val aggs = Seq(
      "sumCount(x)", "sumKahan(x)", "countDistinct(g)",
      "quantileTiming(0.5)(x)", "quantileBFloat16(0.5)(x)",
      "deltaSum(x)", "deltaSumTimestamp(x, ts)",
      "maxIntersections(id, id + 2)", "boundingRatio(id, x)",
      "groupBitmapAnd(id)", "groupArrayLast(2)(x)",
      "groupUniqArray(g)", "uniqTheta(g)", "uniqHLL12(g)",
      "stddevPopStable(x)", "varPopStable(x)",
      "avgWeighted(x, id)", "sumWithOverflow(x)",
      "rankCorr(id, x)", "studentTTest(x, id % 2)",
      "welchTTest(x, id % 2)", "meanZTest(x, id % 2)",
      "first_value(x)", "last_value(x)",
      "simpleLinearRegression(id, x)", "corrMatrix(id, x)",
      "entropy(g)", "intervalLengthSum(id, id + 2)",
      "skewPop(x)", "kurtPop(x)", "median(x)",
      "argMinIf(g, x, id > 1)", "anyIf(g, id > 1)",
      // untried aggregate candidates
      "quantileExactWeighted(0.5)(x, id)",
      "topKWeighted(2)(g, id)",
      "cramersV(g, id % 2)",
      "contingency(g, id % 2)",
      "theilsU(g, id % 2)",
      "singleValueOrNull(g)",
      "any_value(g)",
      "largestTriangleThreeBuckets(2)(id, x)",
      "groupConcat(g)",
      "quantileExactLow(0.5)(x)",
      "quantileExactHigh(0.5)(x)",
      // r11 tenth batch — sketch/bitmap/map/sequence aggregates
      "uniqExact(g)", "uniqCombined(g)", "uniqCombined64(g)",
      "topK(2)(g)", "groupArray(x)", "groupArray(2)(x)",
      "groupArrayMovingSum(x)", "groupArrayMovingAvg(x)",
      "groupBitAnd(id)", "groupBitOr(id)", "groupBitXor(id)",
      "groupBitmap(id)", "groupBitmapOr(id)", "groupBitmapXor(id)",
      "covarSamp(id, x)", "covarPop(id, x)", "corr(id, x)",
      "anyLast(g)", "anyHeavy(g)",
      "histogram(3)(x)",
      "sumIf(x, id > 1)", "avgIf(x, id > 1)",
      "quantilesExact(0.25, 0.5)(x)",
      "quantileTDigest(0.5)(x)",
      "quantileDeterministic(0.5)(x, id)",
      "quantileGK(100, 0.5)(x)",
      "exponentialMovingAverage(1)(x, id)",
      "mannWhitneyUTest(x, id % 2)",
      "minMap(map(g, x))", "maxMap(map(g, x))",
      "sequenceMatch('(?1)(?2)')(ts, id = 1, id = 2)",
      "sequenceCount('(?1)')(ts, id >= 1)",
      "windowFunnel(3600)(ts, id = 1, id = 2)",
      "retention(id >= 1, id >= 2)")
    var afailed = 0
    aggs.foreach { e =>
      try {
        val v = ClickHouseSql.sql(spark,
          s"SELECT $e AS v FROM probe_t").head().get(0)
        println(s"AOK  $e = $v")
      } catch {
        // a registered thrower TEACHING the scale-safe rewrite is
        // coverage, not a gap — only unresolved names count as failures
        case ex: Throwable if Option(ex.getMessage).exists(m =>
          m.contains("recipe") || m.contains("rewrite")) =>
          println(s"AGUIDE $e -- ${ex.getMessage.linesIterator.nextOption().getOrElse("").take(70)}")
        case ex: Throwable =>
          afailed += 1
          println(s"AFAIL $e -- ${ex.getMessage.linesIterator.nextOption().getOrElse("").take(110)}")
      }
    }
    var failed = 0
    exprs.foreach { e =>
      try {
        val v = ClickHouseSql.sql(spark, s"SELECT $e AS v").head().get(0)
        println(s"OK   $e = $v")
      } catch {
        case ex: Throwable if Option(ex.getMessage).exists(m =>
          m.contains("recipe") || m.contains("rewrite")) =>
          println(s"GUIDE $e -- ${ex.getMessage.linesIterator.nextOption().getOrElse("").take(70)}")
        case ex: Throwable =>
          failed += 1
          println(s"FAIL $e -- ${Option(ex.getMessage).getOrElse("").linesIterator.nextOption().getOrElse("").take(110)}")
      }
    }
    println(s"scalars: $failed / ${exprs.length} failed; " +
      s"aggregates: $afailed / ${aggs.length} failed")
    spark.stop()
  }
}
