"""Multi-format date/time string parsing — exact port of the
reference's DateTimeParser.

Semantics from Shared/DateTimeParser.cpp: format tables (formatViews
:76-84), the field handlers (updateDateTimeAndStr :282-394), the
format walker (parseWithFormat :219-238), epoch math
(DateTime::getTime :206-214, daysFromCivil :62-71), the three drivers
(dateTimeParseOptional<kTIME> :133-155, <kTIMESTAMP> :159-185,
<kDATE> :189-204), the integer fallback (unixTime :119-129) and month
eating (eatMonth :88-94).  Pinned by Tests/Shared/DateTimeUtilsTest.cpp
and Tests/ExecuteTest.cpp:27869-28010 (DateAndTimeFunctionsTest
CastLiteralToDate / CastLiteralToTime / CastLiteralToTimestamp_*).

Three deliberately ported quirks (all observable in the reference):

* eatMonth (:88-94) indexes a suffix table whose initializer is
  missing a comma (:46, '"" "uary"'), shifting every suffix to the
  NEXT month — see _MONTH_SUFFIX_SHIFTED below.  '15-March-21' fails
  while '15-Janruary-21' parses; 'november' is the only full month
  name accepted.

* dt_ is reset per parse() call, NOT between format attempts inside
  one call — a failed attempt's partially-assigned fields leak into a
  later attempt that succeeds without assigning them.  Example:
  '9.30' fails '%I . %M . %S %p' AFTER assigning M=30, then matches
  '%I %p' (H=9, p unset) — so the time-of-day of TIMESTAMP
  '2020-01-01 9.30' is 09:30:00, not 09:00:00.
* unixTime fallback (whole string is /^-?\\d+(\\.\\d*)?$/) returns the
  integer UNSCALED by the type's dimension (DateTimeParser.cpp:172,
  :197 return unixTime(str) directly, skipping the *10^dim of
  getTime).

The int64 range check mirrors std::from_chars rejecting
out-of-range parses (errc::result_out_of_range).
"""

from __future__ import annotations

import datetime as _datetime

_MONTH_FULL = (
    "january", "february", "march", "april", "may", "june", "july",
    "august", "september", "october", "november", "december",
)
_MONTH_PREFIX = {m[:3]: i + 1 for i, m in enumerate(_MONTH_FULL)}
# month_suffixes as the reference ACTUALLY compiles them: the array
# initializer at DateTimeParser.cpp:46-59 is missing a comma ('""
# "uary"' concatenates), shifting every suffix to the NEXT month.
# eatMonth(month, str) indexes month_suffixes[month] with 1-based
# month, so jan tries to eat 'ruary', feb 'ch', ..., dec '' — of the
# full English month names only 'november' (suffix 'ember' ==
# shifted 'ember') parses; hybrids like 'janruary'/'maril' parse
# while 'january'/'march' fail.  Ported bug-for-bug (same stance as
# the dt_-carryover and unixTime quirks below); index with month-1.
_MONTH_SUFFIX_SHIFTED = ("ruary", "ch", "il", "", "e", "y", "ust",
                         "tember", "ober", "ember", "ember", "")

# Order matters: first successful format wins (DateTimeParser.cpp:246).
DATE_FORMATS = ("%Y-%m-%d", "%m/%d/%y", "%m/%d/%Y", "%Y/%m/%d",
                "%d-%b-%y", "%d/%b/%Y")
TIME_FORMATS = ("%I:%M:%S %p", "%H:%M:%S", "%I:%M %p", "%H:%M",
                "%H%M%S", "%I . %M . %S %p", "%I %p")

_INT64_MAX = (1 << 63) - 1
_INT64_MIN = -(1 << 63)
_POW10 = tuple(10 ** i for i in range(10))


class _DateTime:
    """DateTimeParser::DateTime defaults (DateTimeParser.h:63-71)."""

    __slots__ = ("Y", "m", "d", "H", "M", "S", "n", "z", "p")

    def __init__(self) -> None:
        self.Y = 1970
        self.m = 1
        self.d = 1
        self.H = 0
        self.M = 0
        self.S = 0
        self.n = 0
        self.z = 0
        self.p: bool | None = None


def _days_from_civil(y: int, m: int, d: int) -> int:
    """Gregorian y-m-d minus 1970-01-01 in days (daysFromCivil :62)."""
    y -= m <= 2
    era = y // 400  # == trunc((y<0 ? y-399 : y)/400) in C++
    yoe = y - era * 400
    doy = (153 * (m + (9 if m <= 2 else -3)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _eat_space(s: str, i: int) -> int:
    while i < len(s) and s[i].isspace():
        i += 1
    return i


def _from_chars_unsigned(s: str, i: int, maxlen: int = 1 << 60):
    """std::from_chars<unsigned> over at most maxlen chars."""
    j = i
    end = min(len(s), i + maxlen)
    while j < end and s[j].isdigit():
        j += 1
    if j == i:
        return None
    val = int(s[i:j])
    if val > _INT64_MAX:  # from_chars result_out_of_range
        return None
    return val, j


def _from_chars_signed(s: str, i: int):
    """std::from_chars<int64_t>: optional '-', then digits."""
    j = i
    neg = j < len(s) and s[j] == "-"
    if neg:
        j += 1
    k = j
    while k < len(s) and s[k].isdigit():
        k += 1
    if k == j:
        return None
    val = int(s[j:k])
    if neg:
        val = -val
    if not (_INT64_MIN <= val <= _INT64_MAX):
        return None
    return val, k


def _update_field(field: str, s: str, i: int, dt: _DateTime):
    """updateDateTimeAndStr (:282-394): returns new index or None."""
    if field == "Y":
        r = _from_chars_signed(s, i)
        if r is None:
            return None
        dt.Y, i = r
        return i
    if field == "y":
        # 1-2 digits only; 3+ digits fail (:281-295)
        r = _from_chars_unsigned(s, i)
        if r is None:
            return None
        year, i = r
        if year < 69:
            dt.Y = 2000 + year
            return i
        if year < 100:
            dt.Y = 1900 + year
            return i
        return None
    if field == "m":
        r = _from_chars_unsigned(s, i, 2)
        if r is None:
            return None
        month, i = r
        if 1 <= month <= 12:
            dt.m = month
            return i
        return None
    if field == "b":
        if len(s) - i < 3:
            return None
        month = _MONTH_PREFIX.get(s[i:i + 3].lower())
        if month is None:
            return None
        dt.m = month
        i += 3
        # eatMonth (:88): eat the (comma-bug-shifted) suffix if present
        suffix = _MONTH_SUFFIX_SHIFTED[month - 1]
        if suffix and s[i:i + len(suffix)].lower() == suffix:
            i += len(suffix)
        return i
    if field == "d":
        r = _from_chars_unsigned(s, i, 2)
        if r is None:
            return None
        day, i = r
        if 1 <= day <= 31:
            dt.d = day
            return i
        return None
    if field == "H":
        r = _from_chars_unsigned(s, i, 2)
        if r is None:
            return None
        hour, i = r
        if hour <= 23:
            dt.H = hour
            return i
        return None
    if field == "I":
        r = _from_chars_unsigned(s, i, 2)
        if r is None:
            return None
        hour, i = r
        if 1 <= hour <= 12:
            dt.H = hour
            return i
        return None
    if field == "M":
        r = _from_chars_unsigned(s, i, 2)
        if r is None:
            return None
        minute, i = r
        if minute <= 59:
            dt.M = minute
            return i
        return None
    if field == "S":
        r = _from_chars_unsigned(s, i, 2)
        if r is None:
            return None
        sec, i = r
        if sec > 61:
            return None
        dt.S = sec
        if i < len(s) and s[i] == ".":
            # period must be followed by >=1 digit (:355-360)
            r = _from_chars_unsigned(s, i + 1, 9)
            if r is None:
                return None
            frac, j = r
            dt.n = frac * _POW10[9 - (j - (i + 1))]
            i = j
        return i
    if field == "z":
        # [-+]\d\d:?\d\d (:368-381)
        if (len(s) - i >= 5 and s[i] in "+-" and s[i + 1].isdigit()
                and s[i + 2].isdigit() and s[i + 4].isdigit()
                and (s[i + 3] == ":"
                     and len(s) - i >= 6 and s[i + 5].isdigit()
                     or s[i + 3] != ":" and s[i + 3].isdigit())):
            hours = int(s[i + 1:i + 3])
            if s[i + 3] == ":":
                minutes = int(s[i + 4:i + 6])
                consumed = 6
            else:
                minutes = int(s[i + 3:i + 5])
                consumed = 5
            dt.z = (-60 if s[i] == "-" else 60) * (60 * hours + minutes)
            return i + consumed
        return None
    if field == "p":
        # %p is optional: never fails, resets p on no-match (:383-392)
        low = s[i:i + 4].lower()
        if low.startswith(("am", "pm")):
            dt.p = low[0] == "p"
            return i + 2
        if low in ("a.m.", "p.m."):
            dt.p = low[0] == "p"
            return i + 4
        dt.p = None
        return i
    raise ValueError(f"Unrecognized format: %{field}")


def _parse_with_format(fmt: str, s: str, dt: _DateTime):
    """parseWithFormat (:219-238): returns end index in s or None."""
    i = 0
    j = 0
    while j < len(fmt):
        c = fmt[j]
        if c == "%":
            i = _eat_space(s, i)
            i = _update_field(fmt[j + 1], s, i, dt)
            if i is None:
                return None
            j += 2
        elif c.isspace():
            while j < len(fmt) and fmt[j].isspace():
                j += 1
            i = _eat_space(s, i)
        elif i < len(s) and s[i] == c:
            i += 1
            j += 1
        else:
            return None
    return i


def _try_formats(formats, s: str):
    """DateTimeParser::parse (:244-258).  dt is shared across format
    attempts (reset happens only in setFormatType), so a failed
    attempt's fields leak into a later success — ported deliberately,
    see module docstring.  Returns (dt|None, unparsed)."""
    dt = _DateTime()
    for fmt in formats:
        end = _parse_with_format(fmt, s, dt)
        if end is not None:
            return dt, s[end:]
    return None, s


def _get_time(dt: _DateTime, dim: int) -> int:
    """DateTime::getTime (:206-214)."""
    days = _days_from_civil(dt.Y, dt.m, dt.d)
    seconds = 3600 * dt.H + 60 * dt.M + dt.S - dt.z
    if dt.p is not None:
        if dt.p and dt.H != 12:
            seconds += 12 * 3600
        elif not dt.p and dt.H == 12:
            seconds -= 12 * 3600
    return (86400 * days + seconds) * _POW10[dim] + dt.n // _POW10[9 - dim]


def _unix_time(s: str):
    """unixTime (:119-129): /^-?\\d+(\\.\\d*)?$/ -> int64 seconds
    (fraction ignored), else None."""
    r = _from_chars_signed(s, 0)
    if r is None:
        return None
    val, i = r
    if i == len(s):
        return val
    if s[i] == "." and all(c.isdigit() for c in s[i + 1:]):
        return val
    return None


def parse_time(s: str, dim: int = 0):
    """dateTimeParseOptional<kTIME> (:133-155): seconds-of-day scaled
    by 10^dim, or None.  The whole string must be consumed."""
    if s.startswith("T"):
        s = s[1:]
    dt, rest = _try_formats(TIME_FORMATS, s)
    if dt is None:
        return None
    zdt, rest = _try_formats(("%z",), rest)
    if rest:
        return None
    return _get_time(dt, dim) + (_get_time(zdt, dim) if zdt else 0)


def parse_date(s: str):
    """dateTimeParseOptional<kDATE> (:189-204): epoch seconds, or
    None.  Trailing junk after the date (including a time-of-day) is
    ignored; a bare integer string is epoch seconds (unscaled)."""
    dt, rest = _try_formats(DATE_FORMATS, s)
    if dt is None:
        return _unix_time(s)
    zdt, _ = _try_formats(("%z",), rest)
    return _get_time(dt, 0) + (_get_time(zdt, 0) if zdt else 0)


def parse_timestamp(s: str, dim: int = 0):
    """dateTimeParseOptional<kTIMESTAMP> (:159-185): epoch count in
    10^-dim seconds, or None.  Quirks ported: a bare date with NO
    time-of-day and no trailing characters returns None (:173-176);
    a failed time-of-day parse contributes midnight; the timezone is
    attempted on whatever the time parse left; trailing junk is
    accepted; a bare integer string is epoch (unscaled)."""
    if s.startswith("T"):
        s = s[1:]
    dt, rest = _try_formats(DATE_FORMATS, s)
    if dt is None:
        return _unix_time(s)
    if not rest:
        return None
    if rest[0] in "T:":
        rest = rest[1:]
    tdt, rest = _try_formats(TIME_FORMATS, rest)
    zdt, _ = _try_formats(("%z",), rest)
    return (_get_time(dt, dim)
            + (_get_time(tdt, dim) if tdt else 0)
            + (_get_time(zdt, dim) if zdt else 0))


# ---------------------------------------------------------------------------
# Literal emission for the SQL rewriter: canonical Spark literals.
# ---------------------------------------------------------------------------

_EPOCH = _datetime.datetime(1970, 1, 1)
# Spark DATE/TIMESTAMP literals cover years 0001-9999.
_MIN_US = int((_datetime.datetime(1, 1, 1) - _EPOCH).total_seconds()) * 10 ** 6
_MAX_US = (int((_datetime.datetime(9999, 12, 31, 23, 59, 59)
                - _EPOCH).total_seconds()) + 1) * 10 ** 6 - 1


def date_literal(s: str):
    """'YYYY-MM-DD' for a parseable date string (epoch seconds floored
    to the day, matching DateConverters::get_epoch_days_from_seconds),
    else None."""
    v = parse_date(s)
    if v is None:
        return None
    days, _ = divmod(v, 86400)
    us = days * 86400 * 10 ** 6
    if not (_MIN_US <= us <= _MAX_US):
        return None
    return (_EPOCH + _datetime.timedelta(days=days)).strftime("%Y-%m-%d")


def timestamp_literal(s: str, dim: int = 0):
    """'YYYY-MM-DD HH:MM:SS[.ffffff]' for a parseable timestamp
    string at the given dimension, else None.  Nanoseconds (dim 9)
    truncate to micros — Spark's timestamp is microsecond-precision
    (documented delta, see TIMESTAMP(9) literal handling)."""
    v = parse_timestamp(s, dim)
    if v is None:
        return None
    us = v * 10 ** (6 - dim) if dim <= 6 else v // 10 ** (dim - 6)
    if not (_MIN_US <= us <= _MAX_US):
        return None
    secs, frac = divmod(us, 10 ** 6)
    out = (_EPOCH + _datetime.timedelta(seconds=secs)).strftime(
        "%Y-%m-%d %H:%M:%S")
    if frac:
        out += f".{frac:06d}"
    return out


def time_seconds(s: str):
    """Seconds-of-day int for a parseable TIME string (the engine's
    TIME representation), else None."""
    return parse_time(s, 0)


# ---------------------------------------------------------------------------
# JVM-native SQL chains for runtime string-column casts.
#
# Same semantics as the Python port above, expressed as Spark SQL
# (regexp + arithmetic over built-ins — zero UDFs, fully codegen-able)
# so CAST/TRY_CAST of a string COLUMN to DATE/TIME/TIMESTAMP matches
# the reference at scale.  Differentially tested against the Python
# port in tests/test_datetime_parse.py.
#
# Regex notes mirroring parseWithFormat: whitespace is eaten BEFORE
# each %-field only (so '\\s*' appears after separators, never before
# them); digit groups use possessive {1,n}+ where regex backtracking
# could otherwise split digits differently from std::from_chars
# (e.g. '1513' must NOT parse as 15:01:03).  The dt_-carryover quirk
# is encoded as explicit carry branches (see _time_chain).
# ---------------------------------------------------------------------------

_TZ_PAT = r"[+-]\d\d:?\d\d"
_AMPM_PAT = r"(?i:am|pm|a\.m\.|p\.m\.)"
# 3-letter prefix + the reference's comma-bug-shifted optional suffix
# (_MONTH_SUFFIX_SHIFTED above): 'nov(ember)' is the only full month
# name accepted; 'janruary' parses while 'january' leaves 'uary'
# unmatched and the format fails.
# suffix groups are possessive ((?:...)?+): eatMonth eats the suffix
# whenever it is present and never reconsiders, so the regex must not
# backtrack out of an eaten suffix either.
_MONTH_PAT = (r"(?i:jan(?:ruary)?+|feb(?:ch)?+|mar(?:il)?+|apr|"
              r"may(?:e)?+|jun(?:y)?+|jul(?:ust)?+|aug(?:tember)?+|"
              r"sep(?:ober)?+|oct(?:ember)?+|nov(?:ember)?+|dec)")
# \z, not $: Java's $ also matches before a trailing newline, but
# unixTime (DateTimeParser.cpp:119-129) requires whole-string
# consumption — '123\n' must NOT take the integer fallback.
_UNIX_PAT = r"^-?\d+(?:\.\d*)?\z"


def _sq(rx: str) -> str:
    """Embed a regex as a Spark SQL string literal."""
    return "'" + rx.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _rex(s: str, rx: str, g: int) -> str:
    return f"regexp_extract({s}, {_sq(rx)}, {g})"


def _int_g(s: str, rx: str, g: int) -> str:
    return f"CAST({_rex(s, rx, g)} AS INT)"


def _bind(val_sql: str, var: str, body: str) -> str:
    """Bind val_sql to `var` inside body (single-element transform)."""
    return f"element_at(transform(array({val_sql}), {var} -> {body}), 1)"


def _tz_secs(g: str) -> str:
    """Signed tz offset seconds from a '[+-]hh[:]mm' capture ('' -> 0).
    getTime SUBTRACTS this (DateTimeParser.cpp:208)."""
    return (f"IF({g} = '', 0, "
            f"IF(substr({g}, 1, 1) = '-', -1, 1) * "
            f"(CAST(substr({g}, 2, 2) AS INT) * 3600 "
            f"+ CAST(right({g}, 2) AS INT) * 60))")


def _p_adjust(ampm: str, h: str) -> str:
    """12-hour adjustment (getTime :209-212)."""
    return (f"CASE WHEN lower({ampm}) LIKE 'p%' AND {h} <> 12 THEN 43200 "
            f"WHEN lower({ampm}) LIKE 'a%' AND {h} = 12 THEN -43200 "
            f"ELSE 0 END")


def _frac_us(g: str) -> str:
    """Fraction-digits capture -> microseconds (truncating, n/1000)."""
    return f"IF({g} = '', 0, CAST(substr(rpad({g}, 6, '0'), 1, 6) AS BIGINT))"


def _year_ok(g: str) -> str:
    """Guard %Y-format years to Spark's workable range: make_date /
    unix_date overflow (even ANSI-off) outside it, while the reference
    computes int64 epochs for any year.  Documented range delta (the
    literal path's 1-9999 guard is the same stance)."""
    return f"CAST({g} AS BIGINT) BETWEEN -9999 AND 9999"


def _month_num(g: str) -> str:
    parts = " ".join(
        f"WHEN '{m[:3]}' THEN {i + 1}" for i, m in enumerate(_MONTH_FULL))
    return f"(CASE lower(substr({g}, 1, 3)) {parts} END)"


# Date formats: (regex-without-tz, builder(s) -> (cond_sql, date_sql)).
# Group layout is fixed per entry; order mirrors formatViews().
def _date_formats():
    def mk(y, m, d):
        # day overflow extrapolates like daysFromCivil: month anchor + d-1
        return f"date_add(make_date({y}, {m}, 1), {d} - 1)"

    def century(y):
        return f"IF({y} < 69, 2000 + {y}, 1900 + {y})"

    out = []
    # %Y-%m-%d
    rx = r"^\s*(-?\d+)-\s*(\d{1,2}+)-\s*(\d{1,2}+)"
    out.append((rx, lambda s, rx=rx: (
        f"{_rex(s, rx, 0)} <> '' AND {_int_g(s, rx, 2)} BETWEEN 1 AND 12 "
        f"AND {_int_g(s, rx, 3)} BETWEEN 1 AND 31 "
        f"AND {_year_ok(_rex(s, rx, 1))}",
        mk(f"CAST({_rex(s, rx, 1)} AS BIGINT)", _int_g(s, rx, 2),
           _int_g(s, rx, 3)))))
    # %m/%d/%y — %y is VALUE-based, not digit-count-based: fromChars
    # (DateTimeParser.cpp:284) consumes ALL digits then checks the
    # value, so zero-padded '012' -> 12 -> century rule -> 2012 while
    # '123' (>= 100) fails over to %m/%d/%Y.  The CASE branch order
    # (this entry first) implements the format-priority dispatch.
    rx = r"^\s*(\d{1,2})/\s*(\d{1,2}+)/\s*(\d++)"
    out.append((rx, lambda s, rx=rx: (
        f"{_rex(s, rx, 0)} <> '' AND {_int_g(s, rx, 1)} BETWEEN 1 AND 12 "
        f"AND {_int_g(s, rx, 2)} BETWEEN 1 AND 31 "
        f"AND CAST({_rex(s, rx, 3)} AS BIGINT) < 100",
        mk(century(f"CAST({_rex(s, rx, 3)} AS BIGINT)"),
           _int_g(s, rx, 1), _int_g(s, rx, 2)))))
    # %m/%d/%Y (negative, or any year the %y branch's value check
    # rejected — unreachable for values < 100 thanks to CASE order)
    rx = r"^\s*(\d{1,2})/\s*(\d{1,2}+)/\s*(-?\d++)"
    out.append((rx, lambda s, rx=rx: (
        f"{_rex(s, rx, 0)} <> '' AND {_int_g(s, rx, 1)} BETWEEN 1 AND 12 "
        f"AND {_int_g(s, rx, 2)} BETWEEN 1 AND 31 "
        f"AND {_year_ok(_rex(s, rx, 3))}",
        mk(f"CAST({_rex(s, rx, 3)} AS BIGINT)", _int_g(s, rx, 1),
           _int_g(s, rx, 2)))))
    # %Y/%m/%d
    rx = r"^\s*(-?\d+)/\s*(\d{1,2}+)/\s*(\d{1,2}+)"
    out.append((rx, lambda s, rx=rx: (
        f"{_rex(s, rx, 0)} <> '' AND {_int_g(s, rx, 2)} BETWEEN 1 AND 12 "
        f"AND {_int_g(s, rx, 3)} BETWEEN 1 AND 31 "
        f"AND {_year_ok(_rex(s, rx, 1))}",
        mk(f"CAST({_rex(s, rx, 1)} AS BIGINT)", _int_g(s, rx, 2),
           _int_g(s, rx, 3)))))
    # %d-%b-%y (same value-based %y; no -%Y fallback format exists,
    # so a >= 100 year value fails the whole dash-%b family)
    rx = r"^\s*(\d{1,2})-\s*(" + _MONTH_PAT + r")-\s*(\d++)"
    out.append((rx, lambda s, rx=rx: (
        f"{_rex(s, rx, 0)} <> '' AND {_int_g(s, rx, 1)} BETWEEN 1 AND 31 "
        f"AND CAST({_rex(s, rx, 3)} AS BIGINT) < 100",
        mk(century(f"CAST({_rex(s, rx, 3)} AS BIGINT)"),
           _month_num(_rex(s, rx, 2)), _int_g(s, rx, 1)))))
    # %d/%b/%Y
    rx = r"^\s*(\d{1,2})/\s*(" + _MONTH_PAT + r")/\s*(-?\d+)"
    out.append((rx, lambda s, rx=rx: (
        f"{_rex(s, rx, 0)} <> '' AND {_int_g(s, rx, 1)} BETWEEN 1 AND 31 "
        f"AND {_year_ok(_rex(s, rx, 3))}",
        mk(f"CAST({_rex(s, rx, 3)} AS BIGINT)", _month_num(_rex(s, rx, 2)),
           _int_g(s, rx, 1)))))
    return out


def _time_chain(t: str, anchored: bool, unit: str) -> str:
    """Ordered time-format CASE over bound string `t`.

    unit='us' -> signed micros-of-day incl. frac/%p/-tz (timestamp
    path: prefix match, trailing junk OK, tz-only fallback branch);
    unit='s' -> seconds (kTIME path: anchored full-string match,
    where formats whose last token is ' %p' eat trailing spaces even
    with no am/pm present — parseWithFormat's format-space branch —
    while %p-less formats reject them).  Carry branches encode the
    dt_-across-attempts quirk: a failed earlier format leaves M/S
    assigned for a later format that succeeds without setting them
    (timestamp path only — with junk present the strict path already
    failed)."""
    # \z, not $: parse_time demands full consumption and Java's $
    # would accept a trailing newline ('22:30\n' must be NULL).
    end = r"\z" if anchored else ""

    # every digit group is possessive ({1,2}+): std::from_chars grabs
    # min(2, available) digits and never gives one back, so Java regex
    # backtracking (e.g. splitting '14' into S='1' + junk '4' to save
    # a match) would diverge from the reference
    d2 = r"(\d{1,2}+)"
    frac = r"(?:\.(\d{1,9}+)|(?!\.))"
    # ' %p'-ending formats: unconditional \s* (the format-space eats
    # str spaces before the optional %p) then optional ampm
    tail_p = (r"\s*(" + _AMPM_PAT + r")?(?:\s*(" + _TZ_PAT + r"))?" + end)
    # %p-less formats: tz may follow (its own eatSpace), nothing else
    tail_np = r"(?:\s*(" + _TZ_PAT + r"))?" + end

    colon3_p = rf"^\s*{d2}:\s*{d2}:\s*{d2}" + frac + tail_p   # T1
    colon3_np = rf"^\s*{d2}:\s*{d2}:\s*{d2}" + frac + tail_np  # T2
    colon2_p = rf"^\s*{d2}:\s*{d2}" + tail_p                   # T3
    colon2_np = rf"^\s*{d2}:\s*{d2}" + tail_np                 # T4
    t5 = rf"^\s*{d2}\s*{d2}\s*{d2}" + frac + tail_np          # T5
    t6 = rf"^\s*{d2}\s*\.\s*{d2}\s*\.\s*{d2}" + frac + tail_p  # T6
    t7 = rf"^\s*{d2}" + tail_p                                  # T7
    # carry shapes (timestamp path): the failed format's partially
    # assigned fields leak into the next success
    c_s = rf"^\s*{d2}:\s*{d2}:\s*{d2}\.(?!\d)"      # colon3 badfrac: S -> T3/T4
    c2 = rf"^\s*{d2}\s*\.\s*{d2}\s*\.\s*{d2}\.(?!\d)"  # t6 badfrac: M,S -> T7
    c4 = rf"^\s*{d2}\s*{d2}\s*{d2}\.(?!\d)"         # t5 badfrac: M,S -> T7
    c1 = rf"^\s*{d2}\s*\.\s*{d2}"                    # t6 partial: M -> T7
    c3 = rf"^\s*{d2}\s*{d2}"                           # t5 partial: M -> T7

    def g(rx, i):
        return _int_g(t, rx, i)

    def sg(rx, i):
        return _rex(t, rx, i)

    def val(h, m, s, padj, tz, fr):
        secs = f"(CAST({h} AS BIGINT)*3600 + {m}*60 + {s} + {padj} - ({tz}))"
        if unit == "s":
            return secs
        return f"{secs}*1000000 + {fr}"

    zero_us = "CAST(0 AS BIGINT)"
    branches = []
    # T1 %I:%M:%S %p
    branches.append((
        f"{t} RLIKE {_sq(colon3_p)} AND {g(colon3_p, 1)} BETWEEN 1 AND 12 "
        f"AND {g(colon3_p, 2)} <= 59 AND {g(colon3_p, 3)} <= 61",
        val(g(colon3_p, 1), g(colon3_p, 2), g(colon3_p, 3),
            _p_adjust(sg(colon3_p, 5), g(colon3_p, 1)),
            _tz_secs(sg(colon3_p, 6)), _frac_us(sg(colon3_p, 4)))))
    # T2 %H:%M:%S (no %p: an am/pm suffix is junk that also blocks tz)
    branches.append((
        f"{t} RLIKE {_sq(colon3_np)} AND {g(colon3_np, 1)} <= 23 "
        f"AND {g(colon3_np, 2)} <= 59 AND {g(colon3_np, 3)} <= 61",
        val(g(colon3_np, 1), g(colon3_np, 2), g(colon3_np, 3), "0",
            _tz_secs(sg(colon3_np, 5)), _frac_us(sg(colon3_np, 4)))))
    # T3 %I:%M %p (with S carried from a bad-fraction colon3 attempt)
    carry_s = (f"IF({t} RLIKE {_sq(c_s)} AND {g(c_s, 3)} <= 61, "
               f"{g(c_s, 3)}, 0)") if not anchored else "0"
    branches.append((
        f"{t} RLIKE {_sq(colon2_p)} AND {g(colon2_p, 1)} BETWEEN 1 AND 12 "
        f"AND {g(colon2_p, 2)} <= 59",
        val(g(colon2_p, 1), g(colon2_p, 2), carry_s,
            _p_adjust(sg(colon2_p, 3), g(colon2_p, 1)),
            _tz_secs(sg(colon2_p, 4)), zero_us)))
    # T4 %H:%M
    branches.append((
        f"{t} RLIKE {_sq(colon2_np)} AND {g(colon2_np, 1)} <= 23 "
        f"AND {g(colon2_np, 2)} <= 59",
        val(g(colon2_np, 1), g(colon2_np, 2), carry_s, "0",
            _tz_secs(sg(colon2_np, 3)), zero_us)))
    # T5 %H%M%S
    branches.append((
        f"{t} RLIKE {_sq(t5)} AND {g(t5, 1)} <= 23 AND {g(t5, 2)} <= 59 "
        f"AND {g(t5, 3)} <= 61",
        val(g(t5, 1), g(t5, 2), g(t5, 3), "0", _tz_secs(sg(t5, 5)),
            _frac_us(sg(t5, 4)))))
    # T6 %I . %M . %S %p
    branches.append((
        f"{t} RLIKE {_sq(t6)} AND {g(t6, 1)} BETWEEN 1 AND 12 "
        f"AND {g(t6, 2)} <= 59 AND {g(t6, 3)} <= 61",
        val(g(t6, 1), g(t6, 2), g(t6, 3),
            _p_adjust(sg(t6, 5), g(t6, 1)),
            _tz_secs(sg(t6, 6)), _frac_us(sg(t6, 4)))))
    # T7 %I %p (with M[,S] carried from failed T5/T6-shaped attempts:
    # bad-fraction shapes carry M and S, otherwise-failed shapes with
    # a parsed M carry M alone — T5/T6 branch order guarantees any
    # fully-valid shape was already taken)
    if anchored:
        carry_m, carry_s7 = "0", "0"
    else:
        carry_m = (
            f"CASE WHEN {t} RLIKE {_sq(c2)} AND {g(c2, 2)} <= 59 "
            f"AND {g(c2, 3)} <= 61 THEN {g(c2, 2)} "
            f"WHEN {t} RLIKE {_sq(c4)} AND {g(c4, 1)} <= 23 "
            f"AND {g(c4, 2)} <= 59 AND {g(c4, 3)} <= 61 THEN {g(c4, 2)} "
            f"WHEN {t} RLIKE {_sq(c1)} AND {g(c1, 2)} <= 59 "
            f"THEN {g(c1, 2)} "
            f"WHEN {t} RLIKE {_sq(c3)} AND {g(c3, 1)} <= 23 "
            f"AND {g(c3, 2)} <= 59 THEN {g(c3, 2)} ELSE 0 END")
        carry_s7 = (
            f"CASE WHEN {t} RLIKE {_sq(c2)} AND {g(c2, 2)} <= 59 "
            f"AND {g(c2, 3)} <= 61 THEN {g(c2, 3)} "
            f"WHEN {t} RLIKE {_sq(c4)} AND {g(c4, 1)} <= 23 "
            f"AND {g(c4, 2)} <= 59 AND {g(c4, 3)} <= 61 THEN {g(c4, 3)} "
            f"ELSE 0 END")
    branches.append((
        f"{t} RLIKE {_sq(t7)} AND {g(t7, 1)} BETWEEN 1 AND 12",
        val(g(t7, 1), carry_m, carry_s7,
            _p_adjust(sg(t7, 2), g(t7, 1)), _tz_secs(sg(t7, 3)), zero_us)))
    # T8 (timestamp path only): time failed entirely, tz alone applies
    if not anchored:
        tzonly = r"^\s*(" + _TZ_PAT + r")"
        branches.append((
            f"{t} RLIKE {_sq(tzonly)}",
            val("0", "0", "0", "0", _tz_secs(sg(tzonly, 1)), zero_us)))

    whens = " ".join(f"WHEN {cond} THEN {v}" for cond, v in branches)
    default = "NULL" if unit == "s" else zero_us
    return f"(CASE {whens} ELSE {default} END)"


# Epoch-seconds window for the unixTime fallback: the literal path's
# 0001-01-01..9999-12-31 bounds TIGHTENED by one day on each side —
# pyspark's collect layer converts timestamps through the OS-local
# datetime.fromtimestamp, which under/overflows (year 0 / year 10000)
# at the exact boundary days for any non-UTC host offset.
_EPOCH_S_MIN = -62135596800 + 86400
_EPOCH_S_MAX = 253402300799 - 86400


def _guarded_ts_seconds(s: str) -> str:
    """timestamp_seconds over the unixTime integer fallback, NULL
    outside Spark's representable window — an unguarded call THROWS
    java.lang.ArithmeticException (long overflow in the seconds->
    micros multiply) for |epoch| > ~9.2e12, e.g. the 15-digit string
    a date+time concatenation can form (sweep seed range [9300,9600)
    found it).  The reference computes int64 epochs for any value —
    same documented range delta as the %Y ±9999 guard."""
    v = f"CAST(regexp_extract({s}, {_sq(r'^(-?[0-9]+)')}, 1) AS BIGINT)"
    return (f"timestamp_seconds(IF({v} BETWEEN {_EPOCH_S_MIN} "
            f"AND {_EPOCH_S_MAX}, {v}, CAST(NULL AS BIGINT)))")


def sql_parse_date(expr: str) -> str:
    """DATE-or-NULL Spark SQL chain over a string expression —
    dateTimeParseOptional<kDATE> semantics (trailing junk ignored,
    optional adjacent tz shifts the epoch before day flooring,
    integer fallback)."""
    s = "_dtp_s"
    tzg = r"(?:\s*(" + _TZ_PAT + r"))?"
    whens = []
    for rx, build in _date_formats():
        cond, date_sql = build(s)
        rxz = rx + tzg
        ntz = rx.count("(") - rx.count("(?") + 1  # tz group index
        tz = _rex(s, rxz, ntz)
        whens.append(
            f"WHEN {cond} THEN IF({tz} = '', {date_sql}, "
            f"CAST(timestamp_seconds(CAST(unix_date({date_sql}) AS BIGINT)"
            f"*86400 - ({_tz_secs(tz)})) AS DATE))")
    unix = (f"WHEN {s} RLIKE {_sq(_UNIX_PAT)} THEN "
            f"CAST({_guarded_ts_seconds(s)} AS DATE)")
    body = f"(CASE {' '.join(whens)} {unix} ELSE NULL END)"
    return _bind(f"CAST({expr} AS STRING)", s, body)


def sql_parse_time(expr: str) -> str:
    """BIGINT seconds-of-day-or-NULL chain over a string expression —
    dateTimeParseOptional<kTIME> semantics (strict full-string match,
    result may be negative or >= 86400 via tz)."""
    s = "_dtp_s"
    strip = f"IF({s} LIKE 'T%', substr({s}, 2), {s})"
    return _bind(f"CAST({expr} AS STRING)", s,
                 _bind(strip, "_dtp_t", _time_chain("_dtp_t", True, "s")))


def sql_parse_timestamp(expr: str) -> str:
    """TIMESTAMP-or-NULL chain over a string expression —
    dateTimeParseOptional<kTIMESTAMP> semantics (date then optional
    [T:]-separated time then optional tz, trailing junk accepted,
    bare-date-with-no-trailing-character rejected, integer fallback)."""
    s = "_dtp_s"
    d_whens, r_whens = [], []
    for rx, build in _date_formats():
        cond, date_sql = build(s)
        d_whens.append(f"WHEN {cond} THEN {date_sql}")
        r_whens.append(
            f"WHEN {cond} THEN regexp_replace({s}, {_sq(rx)}, '')")
    d_case = f"(CASE {' '.join(d_whens)} ELSE NULL END)"
    r_case = f"(CASE {' '.join(r_whens)} ELSE NULL END)"
    x = "_dtp_x"
    strip = (f"IF({x}.r RLIKE {_sq(r'^[T:]')}, substr({x}.r, 2), {x}.r)")
    tmicros = _bind(strip, "_dtp_t", _time_chain("_dtp_t", False, "us"))
    combine = (
        f"CASE WHEN {x}.d IS NOT NULL THEN "
        f"IF({x}.r = '', NULL, "
        f"timestamp_micros(CAST(unix_date({x}.d) AS BIGINT)*86400000000 "
        f"+ {tmicros})) "
        f"WHEN {s} RLIKE {_sq(_UNIX_PAT)} THEN "
        f"{_guarded_ts_seconds(s)} "
        f"ELSE NULL END")
    body = _bind(f"named_struct('d', {d_case}, 'r', {r_case})", x, combine)
    outer = "_dtp_o"
    tstrip = f"IF({outer} LIKE 'T%', substr({outer}, 2), {outer})"
    return _bind(f"CAST({expr} AS STRING)", outer, _bind(tstrip, s, body))
