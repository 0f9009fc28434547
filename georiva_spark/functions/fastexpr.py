"""Driver-fast construction of large literal expression trees (r13).

Building a Column through nested ``pyspark.sql.functions`` calls costs
one py4j round trip per operator/literal.  The ANN family's in-row
argmin / ADC-table expressions embed thousands of codebook literals, so
a single ``ivf_pq_trained`` evaluation was measured at **115,677
py4j ``send_command`` calls — 23.7 s of a 33 s run** spent with the
driver single-threadedly chatting to the JVM while every executor sat
idle (tools/profile_query.py, r13 round).  That cost is pure driver
fixed overhead: it is identical at sf0.1 and at 100 TB, and on a real
cluster it is paid while 1000 executors wait (guide §5 "the driver
should do almost no data work", §7.3 planning stalls).

The fix: render the SAME expression as ONE SQL string and hand it to
``F.expr`` — one py4j call, parsed inside the JVM (Spark's ANTLR
parser handles ~100 KB strings in milliseconds).  Catalyst sees an
IDENTICAL tree — the helpers here mirror the DataFrame-API
constructions operator for operator, literal for literal, in the same
order — so results are bit-identical (proven by the dtype-strict
oracle gate over every ANN query after the rewrite).

Exactness of double literals: ``repr(float)`` is the shortest
round-trip decimal and Java's ``Double.parseDouble`` (what Spark's
lexer uses for a ``D``-suffixed literal) recovers the identical IEEE
double, so a literal built here equals the ``F.lit(v)`` it replaces
bit for bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

#: sessions already checked for parser-conf compatibility (by id —
#: a dead session's id reuse would only re-run the cheap check)
_parser_checked: set[int] = set()


def check_parser_conf(spark=None) -> None:
    """Fail BY NAME if ``spark.sql.parser.escapedStringLiterals`` is
    enabled: every SQL string this module (and textops' parsed
    renderings) builds assumes the default parser, where ``'\\n'`` /
    ``'\\s+'`` escape — under the legacy conf they parse as raw
    backslash sequences and the expressions silently compute wrong
    values instead of failing. Memoized per session."""
    if spark is None:
        from pyspark.sql import SparkSession
        spark = SparkSession.getActiveSession()
        if spark is None:
            return
    if id(spark) in _parser_checked:
        return
    v = str(spark.conf.get(
        "spark.sql.parser.escapedStringLiterals", "false"))
    if v.lower() == "true":
        raise ValueError(
            "fastexpr: spark.sql.parser.escapedStringLiterals=true — "
            "the parsed-SQL renderings assume the default parser's "
            "string escapes; disable the legacy conf for this "
            "session")
    _parser_checked.add(id(spark))


def ident(name: str) -> str:
    """Backtick-quoted SQL identifier with embedded backticks doubled
    (and control characters rejected) — every interpolated column
    name in a parsed rendering must come through here, or a hostile
    name injects arbitrary SQL into the plan."""
    if any(ord(c) < 32 for c in name):
        raise ValueError(
            f"fastexpr.ident: control character in identifier "
            f"{name!r}")
    return "`" + name.replace("`", "``") + "`"


def dlit(v: float) -> str:
    """Exact SQL double literal for ``v`` (finite only)."""
    v = float(v)
    if not math.isfinite(v):
        raise ValueError(f"dlit: non-finite literal {v!r}")
    return f"{v!r}D"


def darr(vals) -> str:
    """``array(…)`` of exact double literals."""
    return "array(" + ", ".join(dlit(v) for v in vals) + ")"


def larr(vals) -> str:
    """``array(…)`` of BIGINT literals — the bounded-id-list shape
    (takedown / retraction requests). One parsed string instead of
    2 py4j round trips per element (a 2 000-id list cost ~5 s of
    driver chatter through the Column API). An empty list renders a
    TYPED empty array (a bare ``array()`` breaks ``arrays_overlap``
    against array<bigint>)."""
    vals = list(vals)
    if not vals:
        return "CAST(array() AS ARRAY<BIGINT>)"
    return "array(" + ",".join(f"{int(v)}L" for v in vals) + ")"


def in_longs(col: str, vals) -> str:
    """``  `col` IN (…L, …)`` over a bounded id list — same In
    predicate (and parquet pushdown) the Column ``isin`` builds,
    constructed in one parse. An empty list renders ``false``, the
    value ``isin([])`` evaluates to — callers keep short-circuiting
    empties for plan economy, but the helper is no longer a
    footgun."""
    vals = list(vals)
    if not vals:
        return "false"
    return (f"{ident(col)} IN ("
            + ",".join(f"{int(v)}L" for v in vals) + ")")


def sq_diff_lambda(cast_a: bool) -> str:
    """``(a, b) -> (a - b)²`` with the call site's exact cast shape."""
    a = "CAST(a AS DOUBLE)" if cast_a else "a"
    return f"(a, b) -> ({a} - b) * ({a} - b)"


def fold_sum(inner: str) -> str:
    """``aggregate(inner, 0.0D, (acc, x) -> acc + x)`` — the left-fold
    sum every l2/dot site uses (same evaluation order as the HOF
    chain it replaces)."""
    return f"aggregate({inner}, 0.0D, (acc, x) -> acc + x)"


def l2_sql(vec_sql: str, lits, cast_a: bool = True) -> str:
    """``Σ (vec[i] − lit[i])²`` — the literal-vector L2² idiom."""
    return fold_sum(
        f"zip_with({vec_sql}, {darr(lits)}, {sq_diff_lambda(cast_a)})")


def dot_sql(vec_sql: str, lits, cast_a: bool = True) -> str:
    """``Σ vec[i]·lit[i]`` — the literal-vector dot idiom."""
    a = "CAST(a AS DOUBLE)" if cast_a else "a"
    return fold_sum(
        f"zip_with({vec_sql}, {darr(lits)}, (a, b) -> {a} * b)")


def argmin_sql(dist_sqls: list[str]) -> str:
    """Lexicographic in-row argmin: ``array_min`` over (d, c) structs,
    lower index wins ties — the `_argmin_cell` shape."""
    entries = ", ".join(f"named_struct('d', {d}, 'c', {i})"
                        for i, d in enumerate(dist_sqls))
    return f"array_min(array({entries})).c"


def argmin_col(dist_sqls: list[str]) -> Column:
    return F.expr(argmin_sql(dist_sqls))


def dist_structs_sql(vec_sql: str, cents: list[list[float]],
                     cast_a: bool = True) -> str:
    """``array(named_struct('d', ‖v−cᵢ‖², 'c', i), …)`` — the routing
    distance array every probe's argsort runs over."""
    entries = ", ".join(
        f"named_struct('d', {l2_sql(vec_sql, c, cast_a)}, 'c', {i})"
        for i, c in enumerate(cents))
    return f"array({entries})"


def route_cells_sql(vec_sql: str, cents: list[list[float]],
                    nprobe: int, cast_a: bool = True) -> str:
    """The full in-row nprobe routing: argsort the literal centroid
    distances, keep the first ``nprobe`` cells."""
    return (f"transform(slice(array_sort("
            f"{dist_structs_sql(vec_sql, cents, cast_a)}), 1, "
            f"{nprobe}), s -> s.c)")


def cell_lookup_sql(cents: list[list[float]],
                    cell_sql: str = "cell") -> str:
    """``cent[cell]`` from an array-of-arrays literal — the
    `_cent_lookup` shape."""
    outer = "array(" + ", ".join(darr(c) for c in cents) + ")"
    return f"element_at({outer}, {cell_sql} + 1)"


def rotate_sql(R: list[list[float]], col: str = "embedding") -> str:
    """``x' = R·x`` as an array of literal-fold dots — the
    `_rotate_expr` shape (d² multiply-adds, one parsed string instead
    of d² py4j literal calls)."""
    return ("array(" + ", ".join(dot_sql(col, row) for row in R)
            + ")")
