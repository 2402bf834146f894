"""Pins for the DateTimeParser port (functions/datetime_parse.py).

Expected values lifted from the reference's own tests:
Tests/Shared/DateTimeUtilsTest.cpp (TIME legal/illegal parse) and
Tests/ExecuteTest.cpp:27869-28010 (DateAndTimeFunctionsTest
CastLiteralToDate / CastLiteralToTime / CastLiteralToTimestamp_
CustomFormat / _IsoFormat / _AlternateSyntax), plus hand-simulated
edge semantics of Shared/DateTimeParser.cpp (quirk pins).
"""

from __future__ import annotations

import pytest

from heavydb_spark.functions.datetime_parse import (
    date_literal,
    parse_date,
    parse_time,
    parse_timestamp,
    time_seconds,
    timestamp_literal,
)


class TestTimeParse:
    # Tests/Shared/DateTimeUtilsTest.cpp LegalParseTimeString
    @pytest.mark.parametrize(
        "s,expected",
        [
            ("22:28:48", 80928),
            ("22:28:48.876", 80928),
            ("T22:28:48", 80928),
            ("222848", 80928),
            ("22:28:48-05:00", 98928),
            ("22:28:48+05:00", 62928),
            ("22:28", 80880),
        ],
    )
    def test_legal(self, s, expected):
        assert parse_time(s) == expected

    # Tests/Shared/DateTimeUtilsTest.cpp IllegalParseTimeString
    @pytest.mark.parametrize("s", ["22-28-48", "2228.48", "22.28.48", "22"])
    def test_illegal(self, s):
        assert parse_time(s) is None

    def test_twelve_hour(self):
        # %I:%M:%S %p / %I %p semantics (DateTimeParser.cpp:383-392,
        # getTime :206: pm&&H!=12 -> +12h, am&&H==12 -> -12h)
        assert parse_time("9:00:00 PM") == 21 * 3600
        assert parse_time("12:30 PM") == 12 * 3600 + 30 * 60
        assert parse_time("12:30 AM") == 30 * 60
        assert parse_time("9 pm") == 21 * 3600
        assert parse_time("9 p.m.") == 21 * 3600
        # %p is optional: a bare in-range hour parses via '%I %p'
        assert parse_time("9") == 9 * 3600
        # ...but %H-only strings with trailing text don't (strict
        # whole-string consumption for kTIME)
        assert parse_time("22:28:48 pm") is None

    def test_execute_test_time_formats(self):
        # ExecuteTest CastLiteralToTime: '15:13:15' and '151315'
        assert parse_time("15:13:15") == 54795
        assert parse_time("151315") == 54795
        assert time_seconds("151315") == 54795


class TestDateParse:
    def test_iso_pin(self):
        # ExecuteTest:27903 select CAST('2015-06-21' AS DATE) == 1434844800
        assert parse_date("2015-06-21") == 1434844800

    @pytest.mark.parametrize(
        "s",
        ["06/21/2015", "21-Jun-15", "21/Jun/2015", "1434844800"],
    )
    def test_formats_agree(self, s):
        # ExecuteTest:27905-27919: all compare equal against column o
        assert parse_date(s) == 1434844800

    @pytest.mark.parametrize(
        "s,lit",
        [
            ("1999-09-10", "1999-09-10"),
            ("10/09/1999", "1999-10-09"),
            ("10/09/99", "1999-10-09"),
            ("10-Sep-99", "1999-09-10"),
            ("9/10/99", "1999-09-10"),
            ("31/Oct/2013", "2013-10-31"),
            ("10/31/13", "2013-10-31"),
        ],
    )
    def test_cast_literal_to_date_formats(self, s, lit):
        # ExecuteTest:27871-27891 format family
        assert date_literal(s) == lit

    def test_century_rule(self):
        # %y: <69 -> 2000+, <100 -> 1900+ (DateTimeParser.cpp:284-292)
        assert date_literal("01/02/68") == "2068-01-02"
        assert date_literal("01/02/69") == "1969-01-02"
        assert date_literal("1/2/5") == "2005-01-02"

    def test_y_m_d_slash(self):
        # %Y/%m/%d is tried after the month-first forms
        assert date_literal("2020/02/03") == "2020-02-03"
        # first field >12 with a 2-digit tail falls to %Y/%m/%d:
        # year 13 AD (faithful to the reference's format order)
        assert parse_date("13/05/06") == parse_date("0013-05-06")

    def test_month_name_prefix_rule(self):
        # eatMonth (:88-94) with the reference's comma-bug-shifted
        # suffix table (DateTimeParser.cpp:46-59: '"" "uary"'
        # concatenates, so each month eats the NEXT month's suffix):
        # 3-letter abbreviations always parse; of the full names only
        # 'november' survives; hybrids like 'janruary'/'maril' parse.
        assert date_literal("15-Mar-21") == "2021-03-15"
        assert date_literal("15-March-21") is None
        assert date_literal("15-January-21") is None
        assert date_literal("15-November-21") == "2021-11-15"
        assert date_literal("15-Janruary-21") == "2021-01-15"
        assert date_literal("15-Maril-21") == "2021-03-15"
        assert date_literal("15-Maye-21") == "2021-05-15"
        assert date_literal("15-Octember-21") == "2021-10-15"
        assert date_literal("15-Marx-21") is None
        assert date_literal("15-Janu-21") is None

    def test_trailing_junk_ignored(self):
        # kDATE ignores everything after the date (:199-203): a
        # timestamp string casts to its date
        assert date_literal("1999-09-09 23:59:59") == "1999-09-09"

    def test_unix_time_fallback(self):
        # unixTime (:119-129): integer strings are epoch seconds;
        # fraction after '.' is ignored; spaces invalidate
        assert parse_date("936835200") == 936835200
        assert parse_date("936835200.75") == 936835200
        assert parse_date(" 936835200") is None
        assert parse_date("2020") == 2020  # 1970-01-01 + 2020s
        assert date_literal("2020") == "1970-01-01"
        # negative epoch floors toward -inf when rendered as a day
        # (DateConverters::get_epoch_days_from_seconds flooring,
        # Tests/Shared/DateTimeUtilsTest.cpp SampleDateEpochs)
        assert date_literal("-31496400") == "1969-01-01"

    def test_bad(self):
        assert parse_date("garbage") is None
        assert parse_date("") is None


class TestTimestampParse:
    def test_custom_format_pins(self):
        # ExecuteTest CastLiteralToTimestamp_CustomFormat:27952-27976
        expect = 1434896116  # '2015-06-21 14:15:16'
        assert parse_timestamp("2015-06-21 14:15:16") == expect
        assert parse_timestamp("2015-06-21:141516") == expect
        assert parse_timestamp("21-JUN-15 2.15.16.12345 PM") == expect
        assert parse_timestamp("06/21/2015 14:15:16") == expect
        assert (parse_timestamp("21-JUN-15 2:15:16 AM")
                == expect - 12 * 3600)

    def test_iso_offset_pins(self):
        # ExecuteTest CastLiteralToTimestamp_IsoFormat:27979-28001
        expect = parse_timestamp("2015-08-21T18:13:14")
        assert expect is not None
        assert parse_timestamp("21/Aug/2015:12:13:14 -0600") == expect
        assert parse_timestamp("2015-08-21T12:13:14 -0600") == expect
        assert parse_timestamp("21-Aug-15 12:13:14 -0600") == expect
        assert parse_timestamp("21/Aug/2015:13:13:14 -0500") == expect

    def test_alternate_syntax(self):
        # ExecuteTest:28005 timestamp(0) '2014-12-13T000000'
        assert parse_timestamp("2014-12-13T000000") == 1418428800

    def test_dimension_scaling(self):
        # StringFunctionsTest TryCastTimestampTypes:1188-1191
        assert parse_timestamp("2013-09-10 09:00:00") == 1378803600
        assert (parse_timestamp("2013-09-10 09:00:00.123", 3)
                == 1378803600123)
        # fraction truncates to the dimension (getTime n/pow10[9-dim])
        assert parse_timestamp("2013-09-10 09:00:00.999", 0) == 1378803600

    def test_bare_date_quirk(self):
        # dateTimeParseOptional<kTIMESTAMP>:173-176 — a date with no
        # time-of-day at all returns nullopt... but ANY trailing
        # character (even a space) makes it parse as midnight.
        assert parse_timestamp("2013-09-10") is None
        assert parse_timestamp("2013-09-10 ") == 1378771200

    def test_failed_time_is_midnight(self):
        # time parse failure contributes 0 (time.value_or(0), :181)
        assert parse_timestamp("2013-09-10 garbage") == 1378771200

    def test_timezone_without_time(self):
        # tz is attempted on whatever the time parse left (:182-184)
        assert parse_timestamp("2020-01-01 -0500") == 1577836800 + 5 * 3600

    def test_dt_carryover_quirk(self):
        # dt_ persists across format attempts within one parse():
        # '9.30' fails '%I . %M . %S %p' AFTER setting M=30, then
        # matches '%I %p' -> 09:30:00, not 09:00:00.
        assert (parse_timestamp("2020-01-01 9.30")
                == 1577836800 + 9 * 3600 + 30 * 60)

    def test_unix_time_fallback_unscaled(self):
        # :172/:197 return unixTime unscaled by dim (ported quirk)
        assert parse_timestamp("1378803600") == 1378803600
        assert parse_timestamp("1378803600", 3) == 1378803600

    def test_overflow_dims_no_throw(self):
        # Tests/Shared/DateTimeUtilsTest.cpp OverflowUnderflow
        for s in ("2273-01-01 23:12:12", "2263-01-01 00:00:00",
                  "09/21/1676 00:12:43.145224193",
                  "09/21/1677 00:00:43.145224193"):
            for dim in (0, 3, 6, 9):
                assert parse_timestamp(s, dim) is not None


class TestLiterals:
    def test_timestamp_literal(self):
        assert (timestamp_literal("21-JUN-15 2.15.16.12345 PM")
                == "2015-06-21 14:15:16")
        assert (timestamp_literal("21-JUN-15 2.15.16.12345 PM", 6)
                == "2015-06-21 14:15:16.123450")
        assert (timestamp_literal("2015-08-21T12:13:14 -0600")
                == "2015-08-21 18:13:14")
        assert timestamp_literal("garbage") is None
        assert timestamp_literal("2013-09-10") is None

    def test_out_of_range_returns_none(self):
        # Spark literals cover years 1-9999; beyond -> None (caller
        # leaves the SQL untouched)
        assert timestamp_literal("123456-01-01 00:00:00") is None
        assert date_literal("123456-01-01") is None
