package graft

import graft.functions.{ClickHouseFunctions => CH}
import org.apache.spark.sql.functions._

class ClickHouseFunctionsSpec extends SparkSpec {

  private lazy val orders = sf0001.orders

  test("countIf/sumIf match CASE-based equivalents") {
    val r = orders.agg(
      CH.countIf(col("o_orderstatus") === "F").as("a"),
      count(when(col("o_orderstatus") === "F", 1)).as("b"),
      CH.sumIf(col("o_totalprice"), col("o_totalprice") > 400000).as("c"),
      sum(when(col("o_totalprice") > 400000, col("o_totalprice"))).as("d")).head()
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getDouble(2) === r.getDouble(3))
  }

  test("argMax/argMin deterministic and correct") {
    val r = orders.groupBy(col("o_custkey"))
      .agg(CH.argMax(col("o_orderkey"), col("o_totalprice")).as("best"),
        max(col("o_totalprice")).as("maxp"))
    val joined = r.join(orders, r("best") === orders("o_orderkey"))
    assert(joined.filter(col("o_totalprice") =!= col("maxp")).count() === 0)
  }

  test("quantileExact matrix and uniq bounds") {
    val r = orders.agg(
      CH.medianExact(col("o_totalprice")).as("med"),
      CH.quantileExact(col("o_totalprice"), 0.9).as("p90"),
      CH.uniq(col("o_custkey")).as("u"),
      CH.uniqExact(col("o_custkey")).as("ue")).head()
    assert(r.getDouble(0) <= r.getDouble(1))
    val u = r.getLong(2); val ue = r.getLong(3)
    assert(math.abs(u - ue).toDouble / ue <= 0.05)
  }

  test("sumMap aggregates per-key") {
    val m = orders.agg(CH.sumMap(col("o_orderstatus"), lit(1L)).as("m"))
      .head().getAs[Map[String, Long]]("m")
    assert(m.keySet === Set("F", "O", "P"))
    assert(m.values.sum === orders.count())
  }

  test("toStartOfWeek is Sunday-start (ClickHouse mode 0); mode 1 is Monday") {
    import spark.implicits._
    // 2024-01-03 is a Wednesday: mode 0 → Sun 2023-12-31, mode 1 → Mon 2024-01-01
    val df = Seq("2024-01-03", "2023-12-31", "2024-01-01").toDF("d")
      .select(to_date(col("d")).as("d"))
    val r = df.select(
      CH.toStartOfWeek(col("d")).cast("string").as("sun"),
      CH.toStartOfWeek(col("d"), mode = 1).cast("string").as("mon"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(r(0) === ("2023-12-31", "2024-01-01"))
    assert(r(1) === ("2023-12-31", "2023-12-25")) // Sunday maps to itself in mode 0
    assert(r(2) === ("2023-12-31", "2024-01-01"))
  }

  test("toStartOfInterval aligns to the grid") {
    val r = sf0001.events
      .select(CH.toStartOfInterval(col("ts"), 900).as("b"))
      .select((unix_timestamp(col("b")) % 900).as("rem"))
      .agg(max(col("rem"))).head().getLong(0)
    assert(r === 0L)
  }

  test("array functions compose") {
    import spark.implicits._
    val df = Seq((1, Seq(1.0, 2.0, 3.0))).toDF("id", "xs")
    val r = df.select(
      CH.arraySum(col("xs")).as("s"),
      CH.arrayCount(col("xs"), _ > 1.5).as("c"),
      CH.arrayExists(col("xs"), _ === 2.0).as("e"),
      CH.arrayStringConcat(CH.arrayMap(col("xs"), x => x.cast("int").cast("string")), ",").as("j")
    ).head()
    assert(r.getDouble(0) === 6.0)
    assert(r.getInt(1) === 2)
    assert(r.getBoolean(2))
    assert(r.getString(3) === "1,2,3")
  }

  test("arrayDifference/arrayCumSum/arrayCompact match ClickHouse semantics") {
    import spark.implicits._
    val df = Seq((1, Seq(3.0, 3.0, 5.0, 2.0, 2.0, 2.0, 7.0))).toDF("id", "xs")
    val r = df.select(
      CH.arrayDifference(col("xs")).as("d"),
      CH.arrayCumSum(col("xs")).as("cs"),
      CH.arrayCompact(col("xs")).as("cp")).head()
    assert(r.getSeq[Double](0) === Seq(0.0, 0.0, 2.0, -3.0, 0.0, 0.0, 5.0))
    assert(r.getSeq[Double](1) === Seq(3.0, 6.0, 11.0, 13.0, 15.0, 17.0, 24.0))
    assert(r.getSeq[Double](2) === Seq(3.0, 5.0, 2.0, 7.0))
    // empty and single-element edges
    val e = Seq((1, Seq.empty[Double], Seq(4.0))).toDF("id", "e", "one")
      .select(CH.arrayDifference(col("e")).as("de"), CH.arrayCumSum(col("e")).as("ce"),
        CH.arrayCompact(col("e")).as("pe"), CH.arrayDifference(col("one")).as("d1"),
        CH.arrayCumSum(col("one")).as("c1"), CH.arrayCompact(col("one")).as("p1")).head()
    assert(e.getSeq[Double](0).isEmpty && e.getSeq[Double](1).isEmpty && e.getSeq[Double](2).isEmpty)
    assert(e.getSeq[Double](3) === Seq(0.0))
    assert(e.getSeq[Double](4) === Seq(4.0))
    assert(e.getSeq[Double](5) === Seq(4.0))
  }

  test("tenth-batch dialect names: pinned values, not just non-throwing") {
    graft.functions.ClickHouseDialect.register(spark)
    def one(e: String): Any =
      graft.functions.ClickHouseSql.sql(spark, s"SELECT $e AS v").head().get(0)
    assert(one("replaceOne('aaa', 'a', 'b')").toString === "baa")
    assert(one("replaceOne('xyz', 'q', 'b')").toString === "xyz")
    assert(one("multiSearchFirstIndex('hello', array('zz', 'll'))") === 2)
    // leftmost OCCURRENCE wins, not first needle that matches
    assert(one("multiSearchFirstIndex('hello', array('llo', 'he'))") === 2)
    assert(one("multiSearchFirstIndex('hello', array('zz'))") === 0)
    assert(one("extract('key=val', '=(.*)$')").toString === "val")
    assert(one("extract('a1b', '[0-9]')").toString === "1")
    // the SQL-standard spelling still parses alongside the CH call
    assert(one("extract(YEAR FROM DATE'2024-03-01')") === 2024)
    assert(one("arrayShiftLeft(array(1,2,3), 1, 0)") ===
      Seq(2, 3, 0))
    assert(one("arrayShiftRight(array(1,2,3), 1, 0)") ===
      Seq(0, 1, 2))
    assert(one("arrayShiftLeft(array(1,2), 5, 9)") === Seq(9, 9))
    assert(one("dotProduct(array(1.0,2.0), array(3.0,4.0))") === 11.0)
    assert(one("L2Distance(array(0.0,0.0), array(3.0,4.0))") === 5.0)
    assert(one("L1Norm(array(1.0,-2.0))") === 3.0)
    assert(one("LinfNorm(array(1.0,-5.0))") === 5.0)
    assert(one("cosineDistance(array(1.0,0.0), array(1.0,0.0))") === 0.0)
    assert(one("tupleHammingDistance((1, 2, 3), (1, 9, 3))") === 1)
    assert(one("toTypeName(CAST(1 AS BIGINT))").toString === "Int64")
    assert(one("roundAge(3)") === 17L)
    assert(one("roundAge(0)") === 0L)
    assert(one("roundDuration(250)") === 240L)
    assert(one("formatReadableSize(1048576)").toString === "1.00 MiB")
    assert(one("formatReadableTimeDelta(3661)").toString ===
      "1 hour, 1 minute, 1 second")
    assert(one("bar(5, 0, 10, 10)").toString === "█████")
    assert(one("isIPv4String('1.2.3.4')") === true)
    assert(one("isIPv4String('1.2.3.256')") === false)
    assert(one("isIPv6String('2001:db8::1')") === true)
    assert(one("isIPv6String('2001:db8::1::2')") === false)
    assert(one("isIPv6String('::ffff:1.2.3.4')") === true)
    assert(one("levenshteinDistance('abc', 'axc')") === 1)
    assert(one("jaroSimilarity('abc', 'abc')") === 1.0)
    assert(one("regexpQuoteMeta('a.b')").toString === "a\\.b")
    assert(one("countDigits(12345)") === 5)
    assert(one("arrayReduce('max', array(1,2,3))") === 3)
    assert(one("cutURLParameter('http://x.com/?a=1&b=2', 'a')").toString ===
      "http://x.com/?b=2")
    assert(one("cutURLParameter('http://x.com/?a=1&b=2', 'b')").toString ===
      "http://x.com/?a=1")
    assert(one("isValidJSON('{\"a\":1}')") === true)
    assert(one("isValidJSON('nope')") === false)
    assert(one("emptyArrayInt64()") === Seq.empty)
    // aggregates over a tiny frame
    spark.sql("""SELECT id, g, CAST(x AS DOUBLE) AS x FROM VALUES
      (1, 'a', 1.5), (2, 'a', 2.5),
      (3, 'b', 4.0) AS t(id, g, x)""").createOrReplaceTempView("tb_probe")
    def agg(e: String): Any = graft.functions.ClickHouseSql.sql(spark,
      s"SELECT $e AS v FROM tb_probe").head().get(0)
    assert(agg("groupArray(2)(x)")
      .asInstanceOf[scala.collection.Seq[Double]].toList === List(1.5, 2.5))
    assert(agg("groupBitmap(g)") === 2L)
    assert(agg("minMap(map(g, x))") === Map("a" -> 1.5, "b" -> 4.0))
    assert(agg("maxMap(map(g, x))") === Map("a" -> 2.5, "b" -> 4.0))
  }

  test("eleventh-batch dialect names: pinned values") {
    graft.functions.ClickHouseDialect.register(spark)
    def one(e: String): Any =
      graft.functions.ClickHouseSql.sql(spark, s"SELECT $e AS v").head().get(0)
    // ISO-year start: 2024 starts Mon Jan 1; 2023 starts Mon Jan 2
    assert(one("toStartOfISOYear(toDate('2024-06-01'))").toString === "2024-01-01")
    assert(one("toStartOfISOYear(toDate('2023-06-01'))").toString === "2023-01-02")
    assert(one("toModifiedJulianDay('1858-11-17')") === 0)
    assert(one("fromModifiedJulianDay(0)").toString === "1858-11-17")
    assert(one("difference('Smith', 'Smyth')") === 4)
    assert(one("difference('Smith', 'Jones')") === 2) // S530 vs J520: positions 3,4 agree
    assert(one("toStringCutToZero('ab')") === org.apache.spark.unsafe.types
      .UTF8String.fromString("ab").toString)
    assert(one("min2(3, 5)") === 3 && one("max2(3, 5)") === 5)
    assert(one("arrayFill(x -> x > 0, array(1, 0, 2, 0))") === Seq(1, 1, 2, 2))
    assert(one("arrayPartialSort(2, array(3,1,2))") === Seq(1, 2, 3))
    assert(one("mapExists((k, v) -> v > 1, map('a', 1))") === false)
    assert(one("mapAll((k, v) -> v > 1, map('a', 1, 'b', 2))") === false)
    assert(one("mapApply((k, v) -> (k, v * 2), map('a', 1))") === Map("a" -> 2))
    assert(one("mapUpdate(map('a', 1, 'b', 2), map('b', 9))") ===
      Map("a" -> 1, "b" -> 9))
    assert(one("mapSort(map('b', 2, 'a', 1))").toString.startsWith("Map(a"))
    assert(one("tuplePlus((1, 2), (3, 4))").toString === "[4,6]")
    assert(one("tupleNegate((1, -2))").toString === "[-1,2]")
    assert(one("tupleMultiplyByNumber((1, 2), 3)").toString === "[3,6]")
    assert(one("encodeURLFormComponent('a b')").toString === "a+b")
    assert(one("decodeURLFormComponent('a+b')").toString === "a b")
    assert(one("cutWWW('https://www.x.com/p')").toString === "https://x.com/p")
    assert(one("queryStringAndFragment('http://x.com/p?a=1#f')").toString === "a=1#f")
    assert(one("URLPathHierarchy('https://x.com/a/b')") ===
      Seq("/a/", "/a/b"))
    assert(one("extractURLParameterNames('http://x.com/?a=1&b=2')") ===
      Seq("a", "b"))
    assert(one("toIPv6('0:0:0:0:0:0:0:1')").toString === "::1")
    assert(one("toIPv6('2001:0db8:0:0:1:0:0:1')").toString === "2001:db8::1:0:0:1")
    assert(one("IPv4CIDRToRange(toIPv4('192.168.5.2'), 16)").toString ===
      "[192.168.0.0,192.168.255.255]")
    assert(one("isIPAddressInRange('192.168.1.1', '10.0.0.0/8')") === false)
    assert(one("isIPAddressInRange('2001:db8::1', '2001:db8::/32')") === true)
    assert(one("JSONType('[1,2]')").toString === "Array")
    assert(one("JSONType('{\"a\":\"x\"}', 'a')").toString === "String")
    assert(one("JSONArrayLength('[1,2,3]')") === 3L)
    assert(one("JSONExtractArrayRaw('{\"a\":[1,{\"b\":2}]}', 'a')") ===
      Seq("1", "{\"b\":2}"))
    assert(one("round(erf(0.5), 6)") === 0.5205)
    assert(one("ngramDistance('abcd', 'abcd')") === 0.0)
    // the SQL-EXTRACT coexistence holds inside bigger statements too
    assert(one("mapExists((k, v) -> v > 0, map('a', 1)) AND extract(YEAR FROM DATE'2024-01-01') = 2024") === true)
  }

  test("twelfth-batch kernel fixes: pinned values") {
    graft.functions.ClickHouseDialect.register(spark)
    def one(e: String): Any =
      graft.functions.ClickHouseSql.sql(spark, s"SELECT $e AS v").head().get(0)
    // tuple arithmetic on Int64 fields is EXACT above 2^53 (a Double
    // round-trip would collapse 2^53+1 onto 2^53)
    assert(one("tuplePlus((9007199254740993, 1), (2, 1))").toString ===
      "[9007199254740995,2]")
    assert(one("tupleMinus((9007199254740995, 5), (2, 1))").toString ===
      "[9007199254740993,4]")
    assert(one("tupleMultiplyByNumber((9007199254740993, 2), 1)").toString ===
      "[9007199254740993,2]")
    assert(one("tupleNegate((9007199254740993, -1))").toString ===
      "[-9007199254740993,1]")
    // fractional by-number scalar still rides the Double path (the
    // integral result fields truncate — MIGRATION.md twelfth batch)
    assert(one("tupleMultiplyByNumber((4, 2), 0.5)").toString === "[2,1]")
    assert(one("tuplePlus((1.5, 2.5), (1.0, 1.0))").toString === "[2.5,3.5]")
    // an embedded IPv4 quad is legal ONLY as the final group of the
    // whole address — '1.2.3.4::' is malformed, not canonicalizable
    assert(one("isIPv6String('1.2.3.4::')") === false)
    assert(one("isIPv6String('::1.2.3.4')") === true)
    assert(one("isIPv6String('64:ff9b::192.0.2.1')") === true)
    intercept[Exception] { one("toIPv6('1.2.3.4::')") }
    // divideDecimal truncates toward zero at the result scale, as CH
    // does — never Spark's HALF_UP decimal cast
    assert(one("divideDecimal(2, 3, 0)").toString === "0")
    assert(one("divideDecimal(-2, 3, 0)").toString === "0")
    assert(one("divideDecimal(2, 3, 2)").toString === "0.66")
    assert(one("divideDecimal(CAST(10.5 AS DECIMAL(4,1)), 3, 2)").toString ===
      "3.50")
    assert(one("divideDecimal(1, 0, 2)") === null)
  }

  test("thirteenth-batch dialect names: pinned values") {
    graft.functions.ClickHouseDialect.register(spark)
    def one(e: String): Any =
      graft.functions.ClickHouseSql.sql(spark, s"SELECT $e AS v").head().get(0)
    // base58 (bitcoin alphabet): round trip + a known vector
    assert(one("base58Encode('abc')").toString === "ZiCa")
    assert(one("base58Decode(base58Encode('hello world'))").toString ===
      "hello world")
    // Morton: x rides even bits — (3, 5) = interleave(011, 101) = 100111
    assert(one("mortonEncode(3, 5)") === 39L)
    assert(one("mortonDecode(2, 39)").toString === "[3,5]")
    assert(one("mortonDecode(2, mortonEncode(12345, 67890))").toString ===
      "[12345,67890]")
    // Hilbert: encode/decode are exact inverses; d(0,0)=0
    assert(one("hilbertEncode(0, 0)") === 0L)
    assert(one("hilbertDecode(2, hilbertEncode(3, 4))").toString === "[3,4]")
    assert(one("hilbertDecode(2, hilbertEncode(123456, 654321))").toString ===
      "[123456,654321]")
    // coords >= 2^31 push d past 2^63 (Long wrap) — decode must stay
    // the exact inverse via UNSIGNED bit extraction (>>> not /)
    assert(one("hilbertDecode(2, hilbertEncode(4198735385, 2147483648))")
      .toString === "[4198735385,2147483648]")
    assert(one("hilbertDecode(2, hilbertEncode(4294967295, 4294967295))")
      .toString === "[4294967295,4294967295]")
    assert(one("hilbertDecode(2, hilbertEncode(2147483648, 0))")
      .toString === "[2147483648,0]")
    // IDNA / punycode via the JDK codec
    assert(one("idnaEncode('münchen.de')").toString === "xn--mnchen-3ya.de")
    assert(one("idnaDecode('xn--mnchen-3ya.de')").toString === "münchen.de")
    assert(one("punycodeEncode('münchen')").toString === "mnchen-3ya")
    assert(one("punycodeDecode('mnchen-3ya')").toString === "münchen")
    assert(one("punycodeDecode('abc-')").toString === "abc")
    // fuzzy-string long tail
    assert(one("damerauLevenshteinDistance('ab', 'ba')") === 1)
    assert(one("damerauLevenshteinDistance('kitten', 'sitting')") === 3)
    assert(one("byteHammingDistance('abc', 'abd')") === 1)
    assert(one("byteHammingDistance('abc', 'a')") === 2)
    assert(one("stringJaccardIndex('abc', 'bcd')") === 0.5)
    // jump consistent hash: the paper's invariants — stable, in-range,
    // and growing the ring only MOVES keys forward
    assert(one("jumpConsistentHash(42, 57)") ===
      one("jumpConsistentHash(42, 57)"))
    val b10 = one("jumpConsistentHash(123456789, 10)").asInstanceOf[Int]
    assert(b10 >= 0 && b10 < 10)
    // multiSearch family (1-based byte positions, 0 = absent)
    assert(one("multiSearchFirstPosition('hello world', array('wor', 'zzz'))")
      === 7L)
    assert(one("multiSearchAllPositions('hello world', array('lo', 'zzz'))")
      === Seq(4L, 0L))
    // BYTE positions (CH semantics): 'é' is 2 UTF-8 bytes, so 'llo'
    // in 'héllo' sits at byte 4, not char 3
    assert(one("multiSearchFirstPosition('héllo', array('llo'))") === 4L)
    assert(one("multiSearchAllPositions('héllo wörld', array('llo', 'rld'))")
      === Seq(4L, 11L))
    assert(one("hasToken('a bc def', 'bc')") === true)
    assert(one("hasToken('abc def', 'bc')") === false)
    // array long tail
    assert(one("arrayCumSumNonNegative(array(1, -3, 2, -1, 4))") ===
      Seq(1L, 0L, 2L, 1L, 5L))
    assert(one("arrayEnumerateUniq(array(10, 20, 10, 30, 10))") ===
      Seq(1L, 1L, 2L, 1L, 3L))
    assert(one("hasSubstr(array(1,2,3,4), array(2,3))") === true)
    assert(one("hasSubstr(array(1,2,3,4), array(2,4))") === false)
    assert(one("LpNorm(array(3.0, 4.0), 2)") === 5.0)
    assert(one("arrayDotProduct(array(1.0, 2.0), array(3.0, 4.0))") === 11.0)
    // splits, port, formats, curves of the long tail
    assert(one("splitByNonAlpha('ab.cd ef')") === Seq("ab", "cd", "ef"))
    assert(one("splitByWhitespace('ab  cd')") === Seq("ab", "cd"))
    assert(one("port('http://example.com:8080/path')") === 8080)
    assert(one("port('http://example.com/path')") === 0)
    assert(one("toDecimalString(3.14, 4)").toString === "3.1400")
    assert(one("formatReadableDecimalSize(1000000)").toString === "1.00 MB")
    assert(one("unbin('110000')").toString === "0")
    assert(one("round(greatCircleAngle(0.0, 0.0, 0.0, 1.0), 6)") === 1.0)
    // temporal / cast long tail
    assert(one("timeDiff(toDateTime('2024-01-01 00:00:00'), " +
      "toDateTime('2024-01-01 00:01:30'))") === 90L)
    assert(one("fromDaysSinceYearZero(toDaysSinceYearZero(toDate('2024-01-01')))")
      .toString === "2024-01-01")
    assert(one("accurateCastOrNull('xx', 'Int64')") === null)
    assert(one("accurateCast(12, 'Int64')") === 12L)
    intercept[Exception] { one("accurateCast(300, 'Int8')") }
    // xxHash32: public-spec vectors (seed 0)
    assert(one("xxHash32('')") === 0x02cc5d05L)
    // nan/inf are niladic FUNCTIONS here (bare keywords would parse as
    // column references) — MIGRATION.md thirteenth batch
    assert(one("isNaN(nan())") === true)
    assert(one("isFinite(inf())") === false)
  }

  test("fourteenth-batch dialect names: pinned values") {
    graft.functions.ClickHouseDialect.register(spark)
    def one(e: String): Any =
      graft.functions.ClickHouseSql.sql(spark, s"SELECT $e AS v").head().get(0)
    // JSON long tail (regression pins over the pre-existing mappings)
    assert(one("JSONExtractFloat('{\"a\":1.5}', 'a')") === 1.5)
    assert(one("JSONExtractBool('{\"a\":true}', 'a')") === true)
    assert(one("JSONHas('{\"a\":1}', 'a')") === true)
    assert(one("JSONHas('{\"a\":1}', 'b')") === false)
    assert(one("JSONExtractKeys('{\"b\":1,\"a\":2}')") === Seq("b", "a"))
    assert(one("JSONLength('{\"a\":1,\"b\":2}')") === 2L)
    assert(one("JSONLength('[1,2,3]')") === 3L)
    // math long tail: intExp10 is EXACT past the 2^53 double cliff
    assert(one("exp2(10)") === 1024.0)
    assert(one("intExp2(10)") === 1024L)
    assert(one("intExp10(18)") === 1000000000000000000L)
    assert(one("sigmoid(0.0)") === 0.5)
    assert(one("tgamma(5.0)") === 24.0)
    assert(one("gcd(12, 18)") === 6L)
    assert(one("lcm(4, 6)") === 12L)
    // exact lcm where the naive a·b/g product would overflow BIGINT
    assert(one("lcm(4611686018427387904, 2)") === 4611686018427387904L)
    assert(one("positiveModulo(-7, 3)") === 2)
    // regression pins over the pre-existing byteSize (CH-exact: String
    // carries the 9-byte length prefix)
    assert(one("byteSize(CAST(1 AS BIGINT))") === 8L)
    assert(one("byteSize('abc')") === 12L)
    // date arithmetic long tail (regression pins + the new
    // YYYYMMDDToDate inverse)
    assert(one("toYYYYMMDDhhmmss(toDateTime('2024-01-02 03:04:05'))")
      .toString === "20240102030405")
    assert(one("YYYYMMDDToDate(20240102)").toString === "2024-01-02")
    assert(one("YYYYMMDDToDate(toYYYYMMDD(toDate('2024-03-05')))")
      .toString === "2024-03-05")
    // membership long tail (regression pins)
    assert(one("countEqual(array(1, 2, 1, 3), 1)") === 2)
    assert(one("arrayElementOrNull(array(1, 2), 9)") === null)
    assert(one("mapContains(map('a', 1), 'a')") === true)
  }

  test("fifteenth-batch dialect names: pinned values") {
    graft.functions.ClickHouseDialect.register(spark)
    def one(e: String): Any =
      graft.functions.ClickHouseSql.sql(spark, s"SELECT $e AS v").head().get(0)
    // relative-num completions (DateLUTImpl's published formulas)
    assert(one("toRelativeYearNum(toDate('2024-05-01'))") === 2024L)
    assert(one("toRelativeQuarterNum(toDate('2024-05-01'))") === 8097L)
    assert(one("toRelativeMonthNum(toDate('2024-05-01'))") === 24293L)
    // 1970-01-01 was a Thursday: (0 + 8 - 4) / 7 = 0; the first Monday
    // (1970-01-05: dayNum 4, weekday 1) opens week 1
    assert(one("toRelativeWeekNum(toDate('1970-01-01'))") === 0L)
    assert(one("toRelativeWeekNum(toDate('1970-01-05'))") === 1L)
    // 64-bit unix timestamp round trips
    assert(one("toUnixTimestamp64Milli(fromUnixTimestamp64Milli(1704067200123))")
      === 1704067200123L)
    assert(one("toUnixTimestamp64Micro(fromUnixTimestamp64Micro(1704067200123456))")
      === 1704067200123456L)
    assert(one("toUnixTimestamp64Nano(toDateTime('2024-01-01 00:00:00'))")
      === 1704067200000000000L)
    // deprecated snowflake spellings alias the ID forms
    assert(one("dateTimeToSnowflake(toDateTime('2024-01-01 00:00:00'))") ===
      one("dateTimeToSnowflakeID(toDateTime('2024-01-01 00:00:00'))"))
    // readable sizes: decimal vs binary units, ceil, Or* fallbacks
    assert(one("parseReadableSize('1 KiB')") === 1024L)
    assert(one("parseReadableSize('1 KB')") === 1000L)
    assert(one("parseReadableSize('1.5 MiB')") === 1572864L)
    assert(one("parseReadableSizeOrNull('garbage')") === null)
    assert(one("parseReadableSizeOrZero('garbage')") === 0L)
    // reinterpret casts: little-endian, trailing zeros trimmed
    assert(one("reinterpretAsUInt8('a')") === 97L)
    assert(one("reinterpretAsUInt16('ab')") === 25185L) // 0x6261
    assert(one("reinterpretAsUInt32('abcd')") === 1684234849L)
    assert(one("reinterpretAsString(97)").toString === "a")
    assert(one("reinterpretAsString(25185)").toString === "ab")
    // UTF-8 validation catches raw invalid bytes through unhex
    assert(one("isValidUTF8('héllo')") === true)
    assert(one("isValidUTF8(unhex('ff'))") === false)
    assert(one("isValidUTF8(unhex('EDA080'))") === false) // surrogate
    // bitSlice: 1-based bit offset; bits 2-9 of 'h' (01101000) + 'e'
    // (01100101) = 11010000 11...: first 8 bits from offset 2 = 0xD0
    assert(one("hex(bitSlice('hello', 2, 8))").toString === "D0")
    // array Levenshtein and the n-gram search pair
    assert(one("arrayLevenshteinDistance(array(1,2,3), array(1,3))") === 1L)
    assert(one("arrayLevenshteinDistance(array('a'), array('b', 'a'))") === 1L)
    assert(one("ngramSearch('hello', 'hell')") === 1.0)
    assert(one("ngramSearchCaseInsensitive('Hello', 'HELL')") === 1.0)
    // seeded deterministic shuffle/sample: stable across runs, the
    // sample IS the permutation's prefix, unseeded forms teach
    assert(one("arrayShuffle(array(1,2,3), 42)") ===
      one("arrayShuffle(array(1,2,3), 42)"))
    assert(one("arrayShuffle(array(1,2,3,4,5), 7)")
      .asInstanceOf[scala.collection.Seq[Int]].sorted.toSeq
      === Seq(1, 2, 3, 4, 5))
    assert(one("arrayRandomSample(array(1,2,3,4,5), 2, 7)")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq ===
      one("arrayShuffle(array(1,2,3,4,5), 7)")
        .asInstanceOf[scala.collection.Seq[Int]].take(2).toSeq)
    intercept[Exception](one("arrayShuffle(array(1,2,3))"))
    intercept[Exception](one("arrayRandomSample(array(1,2,3), 2)"))
    // point-in-polygon: even-odd rule, boundary counts as inside
    assert(one("pointInPolygon((1.0, 1.0), " +
      "array((0.0,0.0),(4.0,0.0),(4.0,4.0),(0.0,4.0)))") === true)
    assert(one("pointInPolygon((5.0, 1.0), " +
      "array((0.0,0.0),(4.0,0.0),(4.0,4.0),(0.0,4.0)))") === false)
    assert(one("pointInPolygon((4.0, 2.0), " +
      "array((0.0,0.0),(4.0,0.0),(4.0,4.0),(0.0,4.0)))") === true)
    // misc completions
    assert(one("cutQueryStringAndFragment('http://x.com/p?a=1#f')")
      .toString === "http://x.com/p")
    assert(one("regexpExtract('a1b22', '([a-z])(\\\\d+)', 2)")
      .toString === "1")
    assert(one("isZeroOrNull(0)") === true)
    assert(one("isZeroOrNull(3)") === false)
    assert(one("isZeroOrNull(CAST(NULL AS INT))") === true)
    assert(one("toColumnTypeName(1)").toString === "Int32")
    assert(one("defaultValueOfTypeName('Int64')") === 0L)
    assert(one("defaultValueOfTypeName('String')").toString === "")
    assert(one("arrayPartialReverseSort(2, array(3,1,2))") === Seq(3, 2, 1))
    assert(one("normalizedQueryHash('SELECT 1 + 2')") ===
      one("normalizedQueryHash('SELECT 7 + 9')"))
    // combinator algebra long tail: stacked -IfOrNull (suffixes apply
    // left to right; count-like bases need the nullif wrap because
    // FILTER'd count returns 0 where CH's OrNull gives NULL),
    // -OrDefault (numeric 0 over empty), uniqArray/uniqExactArray
    spark.sql("""SELECT id, g, CAST(x AS DOUBLE) AS x FROM VALUES
      (1, 'a', 1.5), (2, 'a', 2.5), (3, 'b', 4.0)
      AS t(id, g, x)""").createOrReplaceTempView("c15_probe")
    def agg(e: String): Any = graft.functions.ClickHouseSql.sql(spark,
      s"SELECT $e AS v FROM c15_probe").head().get(0)
    assert(agg("sumIfOrNull(x, id > 9)") === null)
    assert(agg("sumIfOrNull(x, id > 1)") === 6.5)
    assert(agg("countIfOrNull(id > 9)") === null)
    assert(agg("countIfOrNull(id > 1)") === 2L)
    assert(agg("uniqExactIfOrNull(g, id > 9)") === null)
    assert(agg("anyIfOrNull(g, id > 9)") === null)
    assert(agg("sumOrDefault(CASE WHEN id > 9 THEN x END)") === 0.0)
    assert(agg("maxOrDefault(CASE WHEN id > 9 THEN x END)") === 0.0)
    assert(agg("uniqArray(array(id, id + 1))") === 4)
    assert(agg("uniqExactArray(array(id, id + 1))") === 4)
  }

  test("sixteenth-batch dialect names: pinned values") {
    graft.functions.ClickHouseDialect.register(spark)
    def one(e: String): Any =
      graft.functions.ClickHouseSql.sql(spark, s"SELECT $e AS v").head().get(0)
    // date-change family: recomposition with one part swapped
    assert(one("changeYear(toDate('2024-03-05'), 2020)").toString
      === "2020-03-05 00:00:00.0")
    assert(one("changeMonth(toDate('2024-03-05'), 12)").toString
      === "2024-12-05 00:00:00.0")
    assert(one("changeDay(toDateTime('2024-03-05 01:02:03'), 28)").toString
      === "2024-03-28 01:02:03.0")
    assert(one("changeHour(toDateTime('2024-03-05 01:02:03'), 23)").toString
      === "2024-03-05 23:02:03.0")
    assert(one("changeSecond(toDateTime('2024-03-05 01:02:03'), 59)").toString
      === "2024-03-05 01:02:59.0")
    // invalid recomposition -> NULL (CH saturates; MIGRATION note)
    assert(one("changeDay(toDate('2024-02-05'), 30)") === null)
    // string tail
    assert(one("overlayUTF8('héllo', 'XY', 2)").toString === "hXYlo")
    assert(one("stringCompare('abc', 'abd')") === -1)
    assert(one("stringCompare('abc', 'abc')") === 0)
    assert(one("mid('hello', 2, 3)").toString === "ell")
    assert(one("visibleWidth('abc')") === 3)
    // numeric / bit tail
    assert(one("widthBucket(5.0, 0.0, 10.0, 5)") === 3L)
    assert(one("bitmaskToArray(10)") === Seq(2L, 8L))
    // Int64-width reversal (CH swaps the resolved type's width — the
    // 32-bit doc example differs; MIGRATION note)
    assert(one("byteSwap(byteSwap(123456789))") === 123456789L)
    assert(one("toBFloat16(1.5)") === 1.5)
    assert(one("toBool('true')") === true)
    // MAC / UUID / IP codecs round-trip
    assert(one("MACNumToString(1099511627775)").toString
      === "00:FF:FF:FF:FF:FF")
    assert(one("MACStringToNum(MACNumToString(112233445566))")
      === 112233445566L)
    assert(one("IPv4ToIPv6(16909060)").toString === "::ffff:1.2.3.4")
    assert(one("UUIDNumToString(UUIDStringToNum(" +
      "'12345678-1234-1234-1234-123456789012'))").toString
      === "12345678-1234-1234-1234-123456789012")
    assert(one("length(generateULID())") === 26)
    // utility stand-ins
    assert(one("caseWithExpression(2, 1, 'one', 2, 'two', 'other')")
      .toString === "two")
    assert(one("caseWithExpression(9, 1, 'one', 2, 'two', 'other')")
      .toString === "other")
    assert(one("materialize(5)") === 5)
    assert(one("identity(7)") === 7)
    assert(one("ignore(1, 2)") === 0)
    assert(one("sleep(0)") === 0)
    assert(one("formatQuerySingleLine('select   1  +2')").toString
      === "select 1 +2")
    assert(one("hasColumnInTable('no_such_table', 'c')") === false)
    assert(one("uptime() >= 0") === true)
  }

  test("r14 dialect names: MAC strictness modes, sketch quantile spellings, partial-sort arity") {
    graft.functions.ClickHouseDialect.register(spark)
    def one(e: String): Any =
      graft.functions.ClickHouseSql.sql(spark, s"SELECT $e AS v").head().get(0)
    // base name throws like CH; lenient behavior only via explicit names
    assertThrows[Exception](one("MACStringToNum('not-a-mac')"))
    assert(one("MACStringToNumOrNull('not-a-mac')") === null)
    assert(one("MACStringToNumOrZero('not-a-mac')") === 0L)
    assert(one("MACStringToNumOrNull('00:FF:FF:FF:FF:FF')") === 1099511627775L)
    // median*/quantiles* sketch spellings land on the GK family
    def agg(e: String): Any =
      graft.functions.ClickHouseSql.sql(spark,
        s"SELECT $e AS v FROM (SELECT explode(sequence(1, 100)) AS x)")
        .head().get(0)
    assert(agg("medianTDigest(x)") === 50)
    assert(agg("medianTiming(x)") === 50)
    assert(agg("quantilesTDigest(0.1, 0.9)(x)") === Seq(10, 90))
    assert(agg("quantilesTiming(0.5)(x)") === Seq(50))
    // arrayPartialSort: first-k contract held by a full sort; wrong
    // arity teaches instead of IndexOutOfBounds
    assert(one("arrayPartialSort(2, array(3, 1, 2))") === Seq(1, 2, 3))
    assert(one("arrayPartialReverseSort(2, array(3, 1, 2))") === Seq(3, 2, 1))
    val err = intercept[Exception](one("arrayPartialSort(array(3, 1, 2))"))
    assert(err.getMessage.contains("exactly 2 arguments"), err.getMessage)
  }

  test("seventeenth-batch dialect names: pinned values") {
    graft.functions.ClickHouseDialect.register(spark)
    def one(e: String): Any =
      graft.functions.ClickHouseSql.sql(spark, s"SELECT $e AS v").head().get(0)
    assert(one("soundex('Robert')").toString === "R163")
    // CH initcap: words are ALNUM RUNS — 'foo-bar' gets two capitals
    // (Spark's whitespace-splitting builtin is text-rewritten away)
    assert(one("initcap('foo-bar baz QUX')").toString === "Foo-Bar Baz Qux")
    // CH accepts initcap case-INSENSITIVELY — INITCAP/InitCap must hit
    // the same rewrite, not fall through to Spark's whitespace-word
    // builtin (r14 ADVICE)
    assert(one("INITCAP('FOO-BAR')").toString === "Foo-Bar")
    assert(one("InitCap('foo-bar')").toString === "Foo-Bar")
    assert(one("CHAR(72, 105)").toString === "Hi")
    assert(one("initcapUTF8('héllo wörld')").toString === "Héllo Wörld")
    assert(one("cbrt(27.0)") === 3.0)
    assert(one("degrees(pi())") === 180.0)
    assert(one("radians(180.0)") === math.Pi)
    assert(one("space(3)").toString === "   ")
    // RFC 4648 test vectors
    assert(one("base32Encode('foobar')").toString === "MZXW6YTBOI======")
    assert(one("base32Encode('f')").toString === "MY======")
    assert(one("base32Decode('MZXW6YTB')").toString === "fooba")
    assert(one("tryBase32Decode('!!bad!!!')") === null)
    assert(one("tryBase32Decode('MY======')").toString === "f")
    assert(one("tryIdnaEncode('münchen.de')").toString === "xn--mnchen-3ya.de")
    assert(one("stringBytesUniq('aab')") === 2L)
    assert(one("stringBytesEntropy('aabb')") === 1.0)
    assert(one("stringBytesEntropy('')") === 0.0)
    // ULID time codec: ms=1 encodes as 9 zeros + '1' in Crockford
    assert(one("ULIDStringToDateTime('00000000010000000000000000')")
      .toString === "1970-01-01 00:00:00.001")
    val u7 = one("generateUUIDv7()").toString
    assert(u7.length === 36 && u7.charAt(14) === '7')
    assert(one("kafkaMurmurHash('x')").asInstanceOf[Int] >= 0)
    // predictions ranked exactly like labels → normalized Gini = 1
    assert(one("tupleElement(arrayNormalizedGini(" +
      "array(0.9, 0.5, 0.1), array(1.0, 1.0, 0.0)), 3)") === 1.0)
    assert(one("tupleElement(IPv6CIDRToRange(toIPv6('2001:db8::1'), 32), 1)")
      .toString === "2001:db8::")
    assert(one("tupleElement(IPv6CIDRToRange(toIPv6('2001:db8::1'), 32), 2)")
      .toString === "2001:db8:ffff:ffff:ffff:ffff:ffff:ffff")
    assert(one("size(JSONExtractKeysAndValues('{\"a\":\"1\",\"b\":\"2\"}', 'String'))") === 2)
    assert(one("tupleElement(element_at(JSONExtractKeysAndValues(" +
      "'{\"a\":\"1\"}', 'String'), 1), 2)").toString === "1")
    assert(one("pointInEllipses(1.0, 1.0, 0.0, 0.0, 2.0, 2.0)") === true)
    assert(one("pointInEllipses(3.0, 0.0, 0.0, 0.0, 2.0, 1.0)") === false)
    // original-Porter pins (Porter 1980 paper examples; CH runs
    // Snowball english — divergence documented in MIGRATION.md)
    for ((w, s) <- Seq("caresses" -> "caress", "ponies" -> "poni",
      "agreed" -> "agre", "motoring" -> "motor", "happy" -> "happi",
      "relational" -> "relat", "conditional" -> "condit",
      "hopefulness" -> "hope", "electricity" -> "electr",
      "adjustable" -> "adjust", "adoption" -> "adopt", "rate" -> "rate",
      "cease" -> "ceas", "controll" -> "control", "roll" -> "roll"))
      assert(one(s"stem('en', '$w')").toString === s, w)
    assert(one("arrayUnion(array(1, 2), array(2, 3))") === Seq(1, 2, 3))
    assert(one("arraySymmetricDifference(array(1, 2), array(2, 3))")
      === Seq(1, 3))
  }

  test("eighteenth-batch dialect names: pinned values") {
    graft.functions.ClickHouseDialect.register(spark)
    def one(e: String): Any =
      graft.functions.ClickHouseSql.sql(spark, s"SELECT $e AS v").head().get(0)
    def row(e: String): org.apache.spark.sql.Row =
      one(e).asInstanceOf[org.apache.spark.sql.Row]
    // tuple element-wise algebra: exact Long fields (the mulnum rule —
    // field types stay the tuple's own; zero divisor nulls the field)
    assert(row("tupleMultiply((2, 3), (4, 5))").toSeq === Seq(8, 15))
    assert(row("tupleDivide((8, 9), (2, 3))").toSeq === Seq(4, 3))
    assert(row("tupleIntDiv((9, 7), (2, 3))").toSeq === Seq(4, 2))
    assert(row("tupleModulo((9, 7), (2, 3))").toSeq === Seq(1, 1))
    // fractional literals are DECIMAL(2,1) in Spark SQL — div truncates
    // toward zero AT THE FIELD'S SCALE (the ChDecimalTruncDivExpr rule)
    assert(row("tupleDivide((1.0, 3.0), (2.0, 2.0))").toSeq
      .map(_.toString) === Seq("0.5", "1.5"))
    assert(row("tupleDivide((CAST(1 AS DOUBLE), CAST(3 AS DOUBLE)), " +
      "(CAST(2 AS DOUBLE), CAST(2 AS DOUBLE)))").toSeq === Seq(0.5, 1.5))
    assert(row("tupleIntDiv((9, 7), (2, 0))").toSeq === Seq(4, null))
    // negative quotients truncate TOWARD ZERO on both the integral and
    // the FP path (r14 ADVICE: the FP branch floored, so (-7.0)/(2.0)
    // read -4.0 while (-7)/(2) read -3)
    assert(row("tupleIntDiv((-7, -7), (2, -2))").toSeq === Seq(-3, 3))
    assert(row("tupleIntDiv((CAST(-7 AS DOUBLE), CAST(-7 AS DOUBLE)), " +
      "(CAST(2 AS DOUBLE), CAST(-2 AS DOUBLE)))").toSeq === Seq(-3.0, 3.0))
    // mixed-type tuple-tuple: the right tuple's fields are read with
    // their OWN types (r14 ADVICE: an UnsafeRow right read with the
    // left's types reinterpreted bytes)
    assert(row("tupleDivide((8L, 9L), " +
      "(CAST(2 AS DOUBLE), CAST(3 AS DOUBLE)))").toSeq === Seq(4, 3))
    assert(row("tupleMultiply((CAST(1.5 AS DOUBLE), CAST(2.5 AS DOUBLE)), " +
      "(2L, 4L))").toSeq === Seq(3.0, 10.0))
    // duration / uuid codecs
    assert(one("parseTimeDelta('1h 30m')") === 5400.0)
    assert(one("parseTimeDelta('2 weeks, 1 day')") === 1296000.0)
    assert(one("parseTimeDelta('250ms')") === 0.25)
    // r15: CH's full unit table — year=365d, month=30.5d, us/ns,
    // 'mins'/'hrs' spellings (these threw before; r14 ADVICE)
    assert(one("parseTimeDelta('1 year')") === 31536000.0)
    assert(one("parseTimeDelta('2mo')") === 5270400.0)
    assert(one("parseTimeDelta('5 mins 2 hrs')") === 7500.0)
    assert(math.abs(one("parseTimeDelta('10us')")
      .asInstanceOf[Double] - 1e-5) < 1e-18)
    assert(math.abs(one("parseTimeDelta('1500 nanoseconds')")
      .asInstanceOf[Double] - 1.5e-6) < 1e-18)
    assertThrows[Exception](one("parseTimeDelta('nonsense')"))
    // the v7 example from RFC 9562 carries ts 0x017F22E279B0 ms
    assert(one("CAST(UUIDv7ToDateTime(" +
      "'017f22e2-79b0-7cc3-98c4-dc0c0c07398f') AS BIGINT)")
      === 0x017f22e279b0L / 1000)
    assertThrows[Exception](
      one("UUIDv7ToDateTime('12345678-1234-1234-1234-123456789012')"))
    // kv pairs: default dials, first key wins
    assert(one("extractKeyValuePairs('a:1, b:2 a:9')")
      .asInstanceOf[Map[String, String]] === Map("a" -> "1", "b" -> "2"))
    // dates: Sunday-start convention → last day = Saturday
    assert(one("toLastDayOfWeek(toDate('2024-03-05'))").toString
      === "2024-03-09") // Tue Mar 5 → Sat Mar 9
    assert(one("addDate(toDate('2024-03-05'), INTERVAL 2 DAY)").toString
      === "2024-03-07")
    assert(one("makeDate32(2024, 2, 29)").toString === "2024-02-29")
    // snowflake round trip through the 64-bit form
    assert(one("snowflakeIDToDateTime(dateTime64ToSnowflake(" +
      "toDateTime('2024-01-01 00:00:00')))").toString
      === "2024-01-01 00:00:00.0")
    // map ops
    assert(one("mapConcat(map('a', 1), map('b', 2))")
      .asInstanceOf[Map[String, Int]] === Map("a" -> 1, "b" -> 2))
    assert(one("map_keys(mapPartialSort(1, map('b', 2, 'a', 1)))")
      === Seq("a", "b"))
    assert(one("mapContainsKeyLike(map('abc', 1), 'a%')") === true)
    assert(one("mapContainsKeyLike(map('abc', 1), 'z%')") === false)
    assert(one("mapExtractKeyLike(map('abc', 1, 'xyz', 2), 'a%')")
      .asInstanceOf[Map[String, Int]] === Map("abc" -> 1))
    // rand distributions: range contracts (values are nondeterministic)
    val u = one("randUniform(5.0, 6.0)").asInstanceOf[Double]
    assert(u >= 5.0 && u < 6.0)
    val b = one("randBernoulli(0.5)").asInstanceOf[Int]
    assert(b == 0 || b == 1)
    assert(one("randExponential(2.0)").asInstanceOf[Double] >= 0.0)
    // quarter of the meridian = 90 degrees
    assert(math.abs(one("greatCircleAngle(0.0, 0.0, 90.0, 0.0)")
      .asInstanceOf[Double] - 90.0) < 0.5)
    assert(one("byteSlice('hello', 2, 3)").toString === "ell")
  }

  test("nineteenth-batch dialect names: pinned values") {
    graft.functions.ClickHouseDialect.register(spark)
    def one(e: String): Any =
      graft.functions.ClickHouseSql.sql(spark, s"SELECT $e AS v").head().get(0)
    // subsequence = in-order, not contiguous; case/code-point variants
    assert(one("hasSubsequence('garbage', 'arg')") === 1)
    assert(one("hasSubsequence('abc', 'acb')") === 0)
    assert(one("hasSubsequence('abc', '')") === 1)
    assert(one("hasSubsequenceCaseInsensitive('GARBAGE', 'arg')") === 1)
    assert(one("hasSubsequenceUTF8('héllo wörld', 'hw')") === 1)
    assert(one("hasSubsequenceCaseInsensitiveUTF8('HÉLLO', 'héo')") === 1)
    // code-point edit distance: é is ONE edit (CH's byte form would
    // say two; this engine's editDistance maps to Spark's levenshtein,
    // which is already code-point-aware — a documented divergence on
    // the BYTE form, while editDistanceUTF8 matches CH exactly)
    assert(one("editDistanceUTF8('héllo', 'hallo')") === 1L)
    assert(one("editDistance('héllo', 'hallo')") === 1)
    assert(one("editDistanceUTF8('', 'abc')") === 3L)
    assert(one("levenshteinDistanceUTF8('héllo', 'héllos')") === 1L)
    // a supplementary code point (4-byte UTF-8, surrogate pair) is ONE
    // edit — the builtin these spellings reuse counts UTF-8 chars
    assert(one("editDistanceUTF8('a😀', 'a')") === 1L)
    // n-gram signatures: deterministic, CI == lowercase, a one-char
    // edit stays hamming-closer than unrelated text
    assert(one("ngramSimHash('the quick brown fox')") ===
      one("ngramSimHash('the quick brown fox')"))
    assert(one("ngramSimHashCaseInsensitive('The Quick Brown Fox')") ===
      one("ngramSimHash('the quick brown fox')"))
    val near = one("bitCount(bitXor(ngramSimHash('the quick brown fox')," +
      " ngramSimHash('the quick brown fux')))").asInstanceOf[Number].longValue
    val far = one("bitCount(bitXor(ngramSimHash('the quick brown fox')," +
      " ngramSimHash('completely different words here')))")
      .asInstanceOf[Number].longValue
    assert(near < far, s"near=$near far=$far")
    val mm = one("ngramMinHash('the quick brown fox')")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(mm.getLong(0) <= mm.getLong(1))
    // normalization: exact simple cases; zero vector passes unchanged
    def arr(e: String): Seq[Double] =
      one(e).asInstanceOf[scala.collection.Seq[Double]].toSeq
    assert(arr("L2Normalize(array(3.0, 4.0))") === Seq(0.6, 0.8))
    assert(arr("L1Normalize(array(1.0, 3.0))") === Seq(0.25, 0.75))
    assert(arr("LinfNormalize(array(2.0, -4.0))") === Seq(0.5, -1.0))
    assert(arr("L2Normalize(array(0.0, 0.0))") === Seq(0.0, 0.0))
    // a NULL element nulls the WHOLE result — getDouble on a null slot
    // would fabricate 0.0 and normalize garbage (r15 review)
    assert(one("L2Normalize(array(CAST(3.0 AS DOUBLE), " +
      "CAST(NULL AS DOUBLE)))") === null)
    // same contract through WHOLE-STAGE CODEGEN (non-foldable input —
    // the constant-folded form above runs the interpreted eval, which
    // masked the r15 ADVICE bug: defineCodeGen left isNull=false on a
    // null ArrayData and NPE'd in the UnsafeRow writer)
    val cg = graft.functions.ClickHouseSql.sql(spark,
      "SELECT id, L2Normalize(CASE WHEN id = 1 THEN " +
        "array(CAST(3.0 AS DOUBLE), CAST(NULL AS DOUBLE)) ELSE " +
        "array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE)) END) AS n " +
        "FROM range(2) ORDER BY id").collect()
    assert(cg(0).getSeq[Double](1) === Seq(0.6, 0.8))
    assert(cg(1).isNullAt(1), "codegen path must surface the null-element NULL")
    // the char()-as-TYPE guard is positional, not statement-prefix:
    // CTAS still splices the byte-assembling call, a column-def list
    // does not (spliced there it would corrupt the type)
    assert(graft.functions.ClickHouseSql
      .rewrite("CREATE TABLE t2 AS SELECT char(72, 105) AS v", _ => Nil)
      .contains("chChar"))
    assert(!graft.functions.ClickHouseSql
      .rewrite("CREATE TABLE t3 (c CHAR(5)) USING parquet", _ => Nil)
      .contains("chChar"))
    // a '::' cast's type slot is not a call even though no bare
    // identifier precedes it, and DEFAULT re-opens expression context
    // inside a definition list (r15 ADVICE, both directions)
    assert(!graft.functions.ClickHouseSql
      .rewrite("SELECT x::CHAR(3) FROM t4", _ => Nil).contains("chChar"))
    assert(graft.functions.ClickHouseSql
      .rewrite("CREATE TABLE t5 (c STRING DEFAULT char(72, 105)) USING parquet",
        _ => Nil).contains("chChar"))
    // UTC rebase pair (CH's Spark-compat aliases): Jan = UTC-5 in NY
    assert(one("CAST(fromUTCTimestamp(toDateTime('2024-01-01 00:00:00')," +
      " 'America/New_York') AS STRING)").toString ===
      "2023-12-31 19:00:00")
    assert(one("CAST(toUTCTimestamp(toDateTime('2023-12-31 19:00:00')," +
      " 'America/New_York') AS STRING)").toString ===
      "2024-01-01 00:00:00")
  }
}
