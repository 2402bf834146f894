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

Two deliberately ported quirks (both observable in the reference):

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
        # eatMonth (:88): eat the rest of the month name if it follows
        suffix = _MONTH_FULL[month - 1][3:]
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
