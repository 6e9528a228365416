package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Known-answer assertions for the q_edge_* per-function boundary corpus
 * (functions.EdgeCaseQueries) — the oracle run proves Spark == DuckDB; these prove
 * both equal the SPEC'd boundary semantics (an agreeing-but-wrong pair would pass
 * the oracle, so the known answers are pinned here).
 */
class EdgeCaseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("NATURAL JOIN: key inferred, output key coalesced; no-common-column is a cross join") {
    graft.sources.TableIO.registerAll(spark, sf)
    val rows = q("q_edge_natural_join").collect()
    // multi-column natural self-join on the (custkey, nationkey) unique key: 1:1
    assert(rows.filter(_.getString(0) == "multi").forall(_.getLong(2) == 1L),
      "NATURAL JOIN must infer BOTH shared columns — a single-column match would fan out")
    val full = rows.filter(_.getString(0) == "full")
    assert(full.exists(r => r.getLong(1) >= 100),
      "FULL natural join must surface right-only keys through the coalesced output column")
    assert(full.exists(r => r.getDouble(3) == -1.0),
      "FULL natural join must null-extend measures for left-only keys")
    // NATURAL == explicit USING on the same frames
    val viaNatural = spark.sql(
      """SELECT count(*) FROM (SELECT c_custkey AS custkey FROM customer WHERE c_custkey < 300) c
        |NATURAL JOIN (SELECT o_custkey AS custkey FROM orders) o""".stripMargin).head().getLong(0)
    val viaUsing = spark.sql(
      """SELECT count(*) FROM (SELECT c_custkey AS custkey FROM customer WHERE c_custkey < 300) c
        |JOIN (SELECT o_custkey AS custkey FROM orders) o USING (custkey)""".stripMargin).head().getLong(0)
    assert(viaNatural == viaUsing && viaNatural > 0)
    // the no-common-column corner: Spark degenerates to a cross join (DuckDB errors
    // here — the divergence is why this lives in the spec, not the oracle)
    val nc = spark.sql("SELECT count(*) FROM customer WHERE c_custkey < 5").head().getLong(0)
    val nn = spark.sql("SELECT count(*) FROM nation").head().getLong(0)
    val cross = spark.sql(
      """SELECT count(*) FROM (SELECT c_custkey FROM customer WHERE c_custkey < 5)
        |NATURAL JOIN (SELECT n_name FROM nation)""".stripMargin).head().getLong(0)
    assert(cross == nc * nn, "no shared columns -> cartesian product, the Spark contract")
  }

  test("datetime patterns: week-based symbols and illegal characters are rejected") {
    // Spark >= 3 (CORRECTED formatter) removed all week-based pattern symbols; the
    // error is the contract a migrating user hits, so pin it per symbol.
    for (p <- Seq("Y", "w", "W", "u", "e")) {
      val e = intercept[Throwable](
        spark.sql(s"SELECT date_format(DATE '2026-01-01', '$p')").collect())
      assert(e.getMessage.contains("Spark >= 3.0"),
        s"pattern '$p' must be rejected with the upgrade-guidance error, got: ${e.getMessage.take(120)}")
    }
    val bad = intercept[Throwable](
      spark.sql("SELECT to_timestamp('2026', 'qqqq-B')").collect())
    assert(bad.getMessage.contains("Unrecognized datetime pattern"))
  }

  test("CORRECTED parser rejects out-of-range dates; try_to_timestamp tolerates them") {
    val e = intercept[Throwable](
      spark.sql("SELECT to_timestamp('2026-02-30', 'yyyy-MM-dd')").collect())
    assert(e.getMessage.contains("CANNOT_PARSE_TIMESTAMP"))
    val r = q("q_edge_datefmt").head()
    assert(r.getBoolean(14) && r.getBoolean(15),
      "try_to_timestamp must return NULL on Feb 30 and month 13")
    assert(r.getString(7) == "02:02:14:14", "hh/KK/kk/HH must disagree exactly as pinned at 14:05")
    assert(r.getLong(16) > 0, "the orders table contains Mondays")
  }

  test("NOT IN against a subquery containing NULL matches nothing") {
    val r = q("q_edge_in_null").head()
    assert(r.getLong(0) == 0, "NOT IN (…, NULL, …) must be empty — three-valued logic")
    assert(r.getLong(1) > 0, "the NULL-free NOT IN control must match rows")
    assert(r.getLong(2) > 0, "IN ignores the NULL entries and still matches")
  }

  test("try_* returns NULL on overflow and divide-by-zero; nullif guards ANSI division") {
    val rows = q("q_edge_try").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(3), "bigint overflow must be NULL under try_*")
      val ln = r.getInt(1)
      assert(r.isNullAt(4) == (ln == 1), "try_divide by zero exactly when ln=1")
      assert(r.isNullAt(5) == (ln == 1), "x / nullif(0) is NULL on the same rows (ANSI-safe)")
      assert(r.isNullAt(6) == (ln == 1), "try_cast('abc') is NULL exactly on the seeded rows")
    }
  }

  test("aggregates over empty and all-NULL input: count 0, sum/min/avg NULL") {
    val r = q("q_edge_agg_empty").head()
    assert(r.getLong(1) == 0)                       // count over all-NULL arg
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4)) // sum/min/avg over all-NULL
    assert(r.getLong(6) == 0 && r.isNullAt(7))      // count/sum over EMPTY relation
  }

  test("leap-day and month-clamp date arithmetic") {
    val r = q("q_edge_dates").head()
    assert(r.getDate(0).toString == "2000-02-29", "2000 is a leap year (div-400 rule)")
    assert(r.getDate(1).toString == "1999-02-28")
    assert(r.getDate(2).toString == "2000-02-29", "Jan 31 + 1 month clamps to Feb EOM")
    assert(r.getDate(3).toString == "2001-02-28", "leap day + 12 months clamps")
    assert(r.getInt(4) == 2, "Feb 28 -> Mar 1 is 2 days in a leap year")
  }

  test("decimal round is half-away-from-zero and sums stay exact") {
    // rendered AS STRING at the comparison edge (driver hash is type-sensitive);
    // the scale-preserving decimal render is itself part of the pinned contract
    val r = q("q_edge_decimal").head()
    assert(r.getString(0) == "3")
    assert(r.getString(1) == "-3", "round(-2.5) is -3: half-AWAY-from-zero, not banker's")
    assert(r.getString(2) == "2.45", "round(2.445, 2) must not double-round up to 2.45+")
    assert(r.getString(3).matches("-?[0-9]+\\.[0-9]{2}"), "sum renders at exactly scale 2")
  }

  test("string boundaries: NULL-absorbing concat, truncating pads, zero repeat") {
    val rows = q("q_edge_strings").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.isNullAt(5), "s || NULL is NULL")
      assert(r.isNullAt(6), "Spark concat(s, NULL) is NULL (unlike DuckDB's skip)")
      assert(r.getString(7) == "", "repeat(s, 0) is empty, not NULL")
      assert(r.getString(2).length == 5 && r.getString(3).length == 3, "lpad/rpad truncate")
      assert(r.getInt(4) == 0, "instr miss is 0, not NULL")
    }
  }

  test("least/greatest skip NULLs; all-NULL input yields NULL") {
    val rows = q("q_edge_least").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.isNullAt(3), "least(NULL, NULL) is NULL")
      assert(!r.isNullAt(1) && !r.isNullAt(2), "a NULL argument is skipped, not absorbed")
      assert(r.getDouble(1) <= 0.0 && r.getDouble(2) >= 0.0)
    }
  }

  test("three-valued logic: NULL AND FALSE = FALSE, NULL OR TRUE = TRUE") {
    val rows = q("q_edge_null_arith").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.isNullAt(2), "NULL + x is NULL")
      assert(!r.getBoolean(6), "NULL AND FALSE must collapse to FALSE")
      assert(r.getBoolean(7), "NULL OR TRUE must collapse to TRUE")
      assert(r.getBoolean(8), "NULL = NULL is NULL, never TRUE")
    }
  }

  test("grouping() distinguishes data NULL from the subtotal row's NULL") {
    val rows = q("q_edge_grouping").collect()
    val dataNull = rows.filter(r => r.getString(0) == "<DATA NULL>" && r.getInt(1) == 0)
    val total = rows.filter(_.getInt(1) == 1)
    assert(dataNull.length == 1, "seeded data NULLs must aggregate into a g=0 row")
    assert(total.length == 1, "exactly one grand-total row with g=1")
    assert(total.head.getLong(2) == rows.filter(_.getInt(1) == 0).map(_.getLong(2)).sum,
      "the total row must equal the sum of the per-segment rows")
  }

  test("explicit NULLS FIRST puts every NULL before every value") {
    val vs = q("q_edge_nulls_order").collect().map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    val firstValue = vs.indexWhere(_.isDefined)
    assert(vs.take(firstValue).forall(_.isEmpty) && vs.drop(firstValue).forall(_.isDefined),
      "NULLs must form a contiguous prefix under ASC NULLS FIRST")
  }

  test("regexp boundaries: no-match is empty string, replace is global, anchors hold") {
    val rows = q("q_edge_regex").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1) == "", "regexp_extract without a match is '' — not NULL")
      assert(r.getBoolean(2), "every derived name must satisfy the anchored pattern")
      assert(!r.getString(3).exists(_.isDigit), "regexp_replace must replace ALL digits")
      assert(r.getString(5).nonEmpty && r.getString(5).forall(_.isDigit))
    }
  }

  test("array boundaries: NULL placement in sorts, three-valued contains, safe indexing") {
    // sorted arrays render to '[a,b,c]' text (NULL spelled out) at the comparison
    // edge; the placement boundary stays visible in the string
    val rows = q("q_edge_array").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1).startsWith("[NULL,"), "ASC sorts NULL first")
      assert(r.getString(2).endsWith(",NULL]"), "DESC sorts NULL last")
      assert(r.isNullAt(3), "contains(missing) over an array WITH a null is NULL, not false")
      assert(r.isNullAt(5), "try_element_at out of bounds is NULL")
      assert(r.getInt(6) == 2, "element_at(-1) indexes from the end")
    }
  }

  test("string-to-number parsing: scientific/hex accepted only where the dialect says") {
    val r = q("q_edge_parse").head()
    assert(r.getDouble(0) == 1000.0 && r.getDouble(1) == 0.5)
    assert(r.getInt(2) == 7 && r.getInt(3) == 12)
    assert(r.isNullAt(4), "20 digits overflow BIGINT even under try_cast")
    assert(r.isNullAt(5), "Spark's integral cast rejects scientific notation")
    assert(r.isNullAt(6), "Spark's integral cast rejects hex strings")
  }

  test("window frames: RANGE includes order-key peers that ROWS excludes") {
    val rows = q("q_edge_window").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), "RANGE cum can never be below ROWS cum")
      assert(r.getLong(2) == r.getLong(6), "sum(1) over RANGE == count(*) over RANGE")
    }
    assert(rows.exists(r => r.getLong(2) > r.getLong(1)),
      "with date ties, RANGE must strictly exceed ROWS on some non-final peer")
    assert(rows.exists(_.isNullAt(3)),
      "a NULL heading the frame must surface through plain first_value")
  }

  test("timestamp boundaries produce stable UTC classes") {
    val r = q("q_edge_ts").head()
    assert(!r.isNullAt(0) && !r.isNullAt(1))
    assert(r.getLong(2) > 0)
  }

  test("session timezone is honored: the same instant renders differently per zone") {
    // The reference hard-coded UTC rendering (its Expressions-Compatibility #3);
    // vanilla Spark renders timestamps in spark.sql.session.timeZone. Proven in an
    // isolated newSession so the shared UTC test session is untouched.
    val ny = spark.newSession()
    ny.conf.set("spark.sql.session.timeZone", "America/New_York")
    val q = "SELECT from_unixtime(0) AS t, CAST(from_unixtime(0) AS DATE) AS d"
    val u = spark.sql(q).head()
    val n = ny.sql(q).head()
    assert(u.getString(0) == "1970-01-01 00:00:00", "UTC session renders the epoch at midnight")
    assert(n.getString(0) == "1969-12-31 19:00:00", "NY session renders the SAME instant at -5")
    assert(u.getDate(1).toString == "1970-01-01" && n.getDate(1).toString == "1969-12-31",
      "timestamp->date truncation is session-zone-dependent — the date FLIPS")
  }

  test("timezone boundaries: DST gap shifts forward, overlap takes the earlier offset") {
    val r = q("q_edge_tz").head()
    assert(r.getString(0) == "1999-12-31 22:30:00", "winter NY is UTC-5 and flips the date")
    assert(r.getString(1) == "2000-04-02 01:30:00", "09:30Z is before the 10:00Z transition: PST -8")
    assert(r.getString(2) == "2000-04-02 03:30:00", "10:30Z is after it: PDT -7")
    assert(r.getString(3) == "2000-04-02 10:30:00",
      "02:30 local never existed: the gap resolves by shifting forward (java.time ofLocal)")
    assert(r.getString(4) == "2000-10-29 08:30:00",
      "01:30 local happened twice on fall-back day: the EARLIER offset (PDT) wins")
    assert(r.getString(5) == r.getString(3), "make_timestamp resolves the same gap identically")
    assert(r.getString(6) == "2000-01-02", "+9h crosses midnight: the DATE flips")
    assert(r.getString(7) == "2000-06-01 08:45:00", "Australia/Eucla is +8:45 — sub-hour offsets exist")
    assert(r.getString(8).matches("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d{6}"))
  }

  test("the reference's documented divergences pin to the vanilla contract") {
    // gazelle_plugin docs/Expressions-Compatibility.md:1-16 — each case the
    // reference's native kernels got wrong relative to Apache Spark
    val r = q("q_edge_compat").head()
    assert(r.isNullAt(0), "'123abc' casts to NULL, not the leading digits")
    assert(r.getString(1) == "1", "single-quoted JSON is accepted")
    assert(r.getString(2) == "v1", "the FIRST duplicate JSON key wins, not null")
    assert(r.getString(3) == "1970-01-01 00:00:00", "from_unixtime renders in the session zone")
    assert(r.getString(4) == "1970-01-02 01:01", "user-specified format is honored")
    assert(r.isNullAt(5), "CORRECTED parser policy rejects Feb 30 — no LEGACY roll-over")
    assert(r.getString(6) == "2020-02-29 12:00:00")
    assert(r.getString(7) == "2000-1-9" && r.getString(8) == "Sunday")
  }

  test("higher-order lambdas: vacuous truth, empty-preserving transforms, NULL-padded zip") {
    val r = q("q_edge_hof").head()
    assert(r.getString(1) == "[]" && r.getString(2) == "[]",
      "transform/filter of empty is empty, never NULL")
    assert(!r.getBoolean(3), "exists over an empty array has no witness: false")
    assert(r.getBoolean(4), "forall over an empty array is VACUOUSLY true")
    assert(r.getInt(5) == 1234 && r.getInt(9) == 1234, "positional left fold with explicit zero")
    assert(r.getString(7) == "[1:10,2:20,3:NULL]", "zip_with pads the shorter side with NULL")
    assert(r.getInt(8) == 0, "size of empty is 0, not NULL")
  }

  test("structs: positional lexicographic compare, NULL struct vs struct of NULLs") {
    val r = q("q_edge_struct").head()
    assert(r.getBoolean(2) && r.getBoolean(3), "field-wise equality; later field breaks ties")
    assert(r.getBoolean(4), "the EARLIER field dominates the comparison")
    assert(r.getBoolean(5), "a typed NULL struct IS NULL")
    assert(!r.getBoolean(6), "a struct OF nulls is a value, not NULL")
    assert(r.getBoolean(7), "field access through a NULL struct is NULL, not an error")
    assert(r.getString(8) == "{\"a\":1,\"b\":\"x\"}")
  }

  test("maps: ANSI-safe missing-key access, sorted key render, value fold") {
    val r = q("q_edge_map").head()
    assert(r.isNullAt(1), "try_element_at on a missing key is NULL (plain element_at throws under ANSI)")
    assert(r.getInt(2) == 2 && r.getInt(3) == 2)
    assert(r.getString(4) == "[a,b]", "map_keys carries no order guarantee — render sorted")
    assert(r.getBoolean(5) && !r.getBoolean(6))
    assert(r.getInt(7) == 3, "fold over map_values")
  }

  test("collation: UTF8_LCASE folds case, UNICODE_CI_AI folds accents, binary does neither") {
    val r = q("q_edge_collate").head()
    assert(r.getBoolean(0) && !r.getBoolean(1), "CI equality holds exactly where binary fails")
    assert(r.getBoolean(2), "contains() under UTF8_LCASE matches across case")
    assert(r.getBoolean(3), "UNICODE_CI_AI equates à and A")
    assert(!r.getBoolean(4), "plain UNICODE keeps the accent distinct")
    assert(r.getString(5) == "STRASSE", "Java case table: sharp-s uppercases to SS")
    assert(r.getString(6) == "àbç" && r.getString(7) == "Hello World")
    // Semantic relation, not a data-dependent count (r10 advice): case-insensitive
    // distinct can never exceed binary distinct, and binary distinct can at most see
    // each CI class in both cases. Exact 2x holds for the committed dataset (every
    // c_mktsegment occurs under both c_custkey parities) but would silently couple
    // the spec to that accident on regenerated data.
    val (nCi, nCs) = (r.getLong(8), r.getLong(9))
    assert(nCi >= 1 && nCi <= nCs && nCs <= 2 * nCi,
      s"CI distinct ($nCi) bounds binary distinct ($nCs) within [n_ci, 2*n_ci]")
  }

  test("intervals: month-end clamping, normalized render, try_* overflow, date-minus-date") {
    val r = q("q_edge_interval").head()
    assert(r.getString(0) == "2024-02-29", "Jan-31 + 1 MONTH clamps to leap Feb-29")
    assert(r.getString(1) == "2024-03-31" && r.getString(2) == "2024-03-29",
      "each month-add clamps independently: (+1M)(+1M) loses the 31st, (+2M) keeps it")
    assert(r.getString(3) == "2024-02-29", "subtraction clamps the same way")
    assert(r.getString(4) == "2025-02-28", "Feb-29 + 1 YEAR clamps into the non-leap year")
    assert(r.getString(5) == "2024-01-02 12:30:15")
    assert(r.getString(6) == "INTERVAL '1-2' YEAR TO MONTH",
      "casting normalizes 14 months into the year-month render")
    assert(r.getString(7) == "INTERVAL '1 01:01:01' DAY TO SECOND",
      "casting normalizes 90061 seconds into the day-time render")
    assert(r.getString(8) == "INTERVAL '-13' MONTH", "a literal keeps its declared unit")
    assert(r.getString(9) == "INTERVAL '2 12:00:00' DAY TO SECOND", "interval * decimal scales")
    assert(r.isNullAt(10), "year-month overflow (int32 months) under try_add is NULL")
    assert(r.isNullAt(11), "try_divide(interval, 0) is NULL")
    assert(r.getLong(12) == 2, "EXTRACT(MONTH FROM '1-2') is the month field, 2")
    assert(r.getString(13) == "INTERVAL '30' DAY" && r.getString(14) == "INTERVAL '29' DAY",
      "date-minus-date is a day-time interval; the clamp is visible in the diff")
    assert(r.getBoolean(15), "day-time intervals compare by physical duration")
    assert(r.getLong(16) > 0, "the o_orderdate sweep must hit clamped month-ends")
  }

  test("char/varchar: CHAR(n) pads the value itself; VARCHAR(n) enforces length on cast") {
    val r = q("q_edge_char").head()
    assert(r.getString(0) == "[ab   ]" && r.getLong(1) == 5,
      "CHAR(5) pads to 5 — the padding is IN the value, length() sees it")
    assert(!r.getBoolean(2) && r.getBoolean(3),
      "comparison stays binary: padded != short, padded == explicitly-padded (no ANSI blank-pad compare)")
    assert(r.getBoolean(4), "rpad(x, n) is exactly the CHAR(n) padding")
    assert(r.getString(5) == "[ab]" && r.getLong(6) == 2, "VARCHAR(n) never pads")
    assert(r.isNullAt(7),
      "over-length VARCHAR(n): try_cast is NULL (plain cast raises EXCEED_LIMIT_LENGTH)")
    assert(!r.getBoolean(8) && r.getBoolean(9), "trailing spaces are significant in =")
    assert(r.getLong(10) >= 1, "CHAR padding preserves distinctness of the segment values")
  }

  test("LIKE ALL/ANY: three-valued lowering, NOT inside the quantifier, escape boundaries") {
    val rows = q("q_edge_like").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(1), "every sf name matches both patterns")
      assert(!r.getBoolean(4), "NOT LIKE ANY is false when NO pattern fails")
      assert(r.getBoolean(6), "LIKE ALL (true, NULL) is NULL — three-valued AND")
      assert(r.getBoolean(7), "LIKE ANY (false, NULL) is NULL — three-valued OR")
      assert(r.getBoolean(8), "a literal # needs no escape")
      assert(r.getBoolean(9), "doubled escape char matches a literal escape char")
      assert(r.getBoolean(10) && !r.getBoolean(11), "escaped % is literal")
      assert(r.getBoolean(12) && !r.getBoolean(13), "'' matches % but not _")
    }
    // nla_var varies with the key digits: both outcomes must occur in the window
    val varCol = rows.map(_.getBoolean(5)).distinct
    assert(varCol.length == 2, "the varying NOT LIKE ALL column must take both values")
  }

  test("coercion lattice: string+int is BIGINT, int+decimal widens, comparisons go numeric") {
    val r = q("q_edge_coercion").head()
    assert(r.getString(0) == "bigint" && r.getString(1) == "15",
      "ANSI string + int coerces the string to BIGINT, not double")
    assert(r.getString(2) == "decimal(3,1)" && r.getString(3) == "1.5")
    assert(r.getString(4) == "double", "E-notation literal pulls the result to double")
    assert(r.getString(5) == "bigint", "integral widening takes the larger type")
    assert(r.getBoolean(6), "1 = '1' compares numerically")
    assert(!r.getBoolean(7), "'2' > 10 is numeric 2 > 10, NOT lexicographic '2' > '10'")
    assert(r.getBoolean(8), "date vs string compares as dates")
    assert(r.getString(9) == "a1", "|| stringifies the int operand")
    assert(r.getString(10) == "array<decimal(11,1)>", "array element type is the widened one")
    assert(r.getString(11) == "double" && r.getString(13) == "decimal(12,2)",
      "coalesce/if take the wider branch type")
    assert(r.getBoolean(12), "IN-list strings coerce to the probe's numeric type")
  }
}
