"""Shared column/SQL helpers used by the LLM-pipeline operators.

Parity discipline: every operator that crosses the DuckDB oracle hash keeps
its transformation expressible with byte-identical semantics on both engines
(md5 hex, lexicographic mins, integer microseconds, double-precision folds),
so the hash compare never fails on implementation noise.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def normalize_text(col: Column) -> Column:
    """lower → strip non-alnum → collapse whitespace → trim.

    Spark regexp_replace replaces all matches; the DuckDB twin
    (NORM_TEXT_DUCK) must pass the 'g' flag for the same behavior.
    """
    c = F.lower(col)
    c = F.regexp_replace(c, "[^a-z0-9 ]", "")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


# DuckDB SQL fragment equivalent to normalize_text({col})
NORM_TEXT_DUCK = (
    "TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER({col}), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
)


def explode_ordered_pairs(df, col: str, u: str = "u", v: str = "v"):
    """All ordered (u < v) pairs of a SORTED-ascending, duplicate-free
    array column, exploded to one row per pair — the JVM-side replacement
    for the basket equi-self-join (``a.key = b.key AND a.item < b.item``):
    because the array is sorted and duplicate-free, ``(s[i], s[j]) for
    i < j`` enumerates exactly the self-join's output, with no join and no
    second fact-scale exchange (optimization guide §2.4). Two generator
    stages (posexplode, then slice+explode) rather than materializing a
    C(n, 2) struct array per row — the flatten(transform(...)) form was
    measured ~2× slower than the self-join it replaced, this form ~1.2×
    faster. Work per basket is C(size, 2), so the callers' basket caps
    keep it bounded."""
    return df.select(
        F.col(col), F.posexplode(col).alias("_pp_i", u)
    ).select(
        u,
        F.explode(
            F.expr(f"slice({col}, _pp_i + 2, size({col}))")
        ).alias(v),
    )


def word_shingles(tokens_col: str, n: int = 3) -> Column:
    """n-word shingles from a tokens array column; empty array when too short.

    Guarded so Spark's sequence() never sees start > stop (which would
    produce a *descending* sequence rather than an empty one).
    """
    joined = " || ' ' || ".join(f"{tokens_col}[i - 1 + {j}]" for j in range(n))
    return F.expr(
        f"CASE WHEN size({tokens_col}) >= {n} "
        f"THEN transform(sequence(1, size({tokens_col}) - {n - 1}), i -> {joined}) "
        f"ELSE array() END"
    )


def hex_digit_sql(expr: str) -> str:
    """Dialect-shared SQL: map one lowercase hex char to its integer value."""
    cases = " ".join(f"WHEN '{c}' THEN {int(c, 16)}" for c in "0123456789abcdef")
    return f"(CASE {expr} {cases} END)"


def simhash_bit_weight_sql(md5_expr: str, bit: int) -> str:
    """Dialect-shared SQL: ±1 weight of simhash bit ``bit`` (0..15) of the
    first 16 bits of ``md5_expr`` (an md5-hex SQL expression).

    Bit 15 is the high bit of hex char 1. Uses only CASE/substr/%/>= so the
    identical text runs on Spark SQL and DuckDB.
    """
    hex_pos = 1 + (15 - bit) // 4       # which hex char (1-based)
    bit_in_char = bit % 4               # bit index within that char
    hv = hex_digit_sql(f"substr({md5_expr}, {hex_pos}, 1)")
    lo = 2 ** bit_in_char
    hi = 2 ** (bit_in_char + 1)
    return f"(CASE WHEN ({hv} % {hi}) >= {lo} THEN 1 ELSE -1 END)"


def div_round4(num: Column, den: Column) -> Column:
    """``ROUND(num/den, 4)`` via ``FLOOR(x*1e4 + .5)/1e4`` — pure IEEE
    double ops, so both engines produce the same bits even when num/den
    lands exactly on a .00005 tie (where Spark's HALF_UP-on-decimal and
    DuckDB's double ROUND disagree; small per-group counts make such
    ties real — this bit the hourly rollups at sf0.1). Pair with
    DIV_ROUND4_DUCK on the oracle side."""
    return F.floor(num * 10000.0 / den + 0.5) / 10000.0


# DuckDB twin of div_round4 (format with num=..., den=...)
DIV_ROUND4_DUCK = "FLOOR(({num}) * 10000.0 / ({den}) + 0.5) / 10000.0"


def money_cents(col: Column) -> Column:
    """DOUBLE money → exact integer cents via ``FLOOR(x*100 + 0.5)`` —
    pure IEEE double ops, bit-identical in every engine/version. The
    double→DECIMAL(18,2) cast this replaces is *engine-defined* at the
    half-cent boundary (DuckDB switched truncate→round across versions;
    Spark is HALF_UP), which made `scalar_decimal_money_arithmetic` pass
    locally and fail on the driver's DuckDB. Never let a double→DECIMAL
    cast carry semantics; derive cents here, do all arithmetic in BIGINT
    cents, and only render DECIMAL via cents_to_decimal."""
    return F.floor(col * 100.0 + 0.5).cast("long")


# DuckDB twin of money_cents (format with col=...)
MONEY_CENTS_DUCK = "CAST(FLOOR(({col}) * 100 + 0.5) AS BIGINT)"


def cents_to_decimal(cents: Column, precision: int = 18) -> Column:
    """Exact BIGINT cents → DECIMAL(precision, 2). Uses decimal×decimal
    multiplication by the exact constant 0.01 (never division, never a
    double hop): decimal(28,0) * decimal(3,2) is exact in both engines,
    and the final cast only narrows precision of an exactly-representable
    scale-2 value, so no rounding mode is ever consulted."""
    scaled = cents.cast("decimal(28,0)") * F.lit("0.01").cast("decimal(3,2)")
    return scaled.cast(f"decimal({precision},2)")


# DuckDB twin of cents_to_decimal (format with cents=..., p=precision)
CENTS_TO_DECIMAL_DUCK = (
    "CAST(CAST(({cents}) AS DECIMAL(28,0)) * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL({p},2))"
)


def cents_to_money_str(cents: Column) -> Column:
    """BIGINT cents → canonical money VARCHAR (``'123.45'``, ``'-0.07'``,
    ``'0.00'``) by pure digit slicing — no division, no decimal type, no
    rounding mode, so the bytes are identical in every engine/version.
    This is the DRIVER-GATE rendering for money columns: the driver's
    value hash is type/rendering-sensitive for DECIMAL the way it
    provably was for HUGEINT, so gated projections carry money as BIGINT
    cents + this VARCHAR; DECIMAL stays a pytest-audited semantic
    (tests/test_money_cents.py), never a gated output type
    (tests/test_oracle_types.py bans DecimalType registry-wide)."""
    a = F.abs(cents)
    raw = a.cast("string")
    # left-pad to >= 3 digits WITHOUT lpad (lpad truncates longer input)
    padded = F.concat(
        F.when(a < 10, F.lit("00")).when(a < 100, F.lit("0")).otherwise(F.lit("")),
        raw,
    )
    int_part = F.substring(padded, F.lit(1), F.length(padded) - F.lit(2))
    frac = F.substring(padded, F.lit(-2), F.lit(2))
    sign = F.when(cents < 0, F.lit("-")).otherwise(F.lit(""))
    # Explicit NULL pin: NULL cents → NULL string. Spark's concat already
    # null-propagates, but DuckDB's CONCAT *skips* NULL arguments (yields
    # '.'), so the twin below needs a CASE guard — make the contract
    # visible on both sides rather than relying on one engine's default.
    return F.when(cents.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(sign, int_part, F.lit("."), frac)
    )


def money_str_duck(cents_expr: str) -> str:
    """DuckDB twin of cents_to_money_str over a cents SQL expression.

    The expression is inlined several times, so pass a simple column
    reference (derive cents in a CTE first)."""
    a = f"ABS({cents_expr})"
    p = (
        f"CONCAT(CASE WHEN {a} < 10 THEN '00' WHEN {a} < 100 THEN '0' "
        f"ELSE '' END, CAST({a} AS VARCHAR))"
    )
    body = (
        f"CONCAT(CASE WHEN ({cents_expr}) < 0 THEN '-' ELSE '' END, "
        f"SUBSTR({p}, 1, LENGTH({p}) - 2), '.', SUBSTR({p}, -2, 2))"
    )
    # NULL pin (see cents_to_money_str): DuckDB's CONCAT skips NULL args
    # (a NULL cents would render as '.'), Spark's null-propagates — guard
    # so both engines agree on NULL → NULL.
    return f"CASE WHEN ({cents_expr}) IS NULL THEN NULL ELSE {body} END"
