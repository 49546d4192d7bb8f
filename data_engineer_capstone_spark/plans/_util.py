"""Shared expression helpers for oracle-checked queries.

Two cross-engine determinism problems and their fixes:

1. **Partition-order float addition.** A parallel SUM over doubles is not
   bit-stable against a single-threaded oracle. Every money aggregate
   routes through an exact DECIMAL(18,4) sum (associative, overflow-checked)
   and is rounded *while still decimal* — decimal ROUND(x, 2) is exact
   ties-away-from-zero in both Spark and DuckDB — then cast to double.
   Decimal partial aggregates are Tungsten-native and keep map-side combine,
   so this is also the right call at 100 TB.

2. **ROUND-on-double divergence.** For an *identical* double input, Spark's
   ``round(x, 2)`` rounds the exact decimal expansion (BigDecimal HALF_UP)
   while DuckDB scales by 100 in floating point first — they disagree near
   .xx5 boundaries. Wherever a computed double must be rounded per-row (or a
   quotient after an exact sum), we instead emit ``floor(x*100 + 0.5)/100``:
   plain IEEE ops that produce bit-identical results in any engine. (Ties
   round toward +inf rather than away from zero — a documented, deterministic
   choice.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def round_det(expr: Column, digits: int = 2) -> Column:
    """Deterministic cross-engine rounding of a double: floor(x*s + .5)/s."""
    scale = 10**digits
    return (F.floor(expr * scale + F.lit(0.5)) / scale).alias(f"_r{digits}")


def sql_round_det(expr: str, digits: int = 2) -> str:
    scale = 10**digits
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def _dec4(expr: Column) -> Column:
    """Double -> exact DECIMAL(18,4), with a floor-trick pre-round so the
    double→decimal cast itself cannot land on a rounding boundary (the two
    engines disagree on cast-rounding of raw doubles near .xxxx5)."""
    return (F.floor(expr * 10000 + F.lit(0.5)) / 10000).cast(DEC)


def _sql_dec4(expr: str) -> str:
    return f"CAST(floor(({expr}) * 10000 + 0.5) / 10000 AS DECIMAL(18,4))"


def money_sum(expr: Column, alias: str) -> Column:
    """Exact decimal sum, rounded as decimal, cast to double."""
    return F.round(F.sum(_dec4(expr)), 2).cast("double").alias(alias)


def money_avg(expr: Column, alias: str) -> Column:
    """Exact decimal numerator / count, deterministically rounded."""
    q = F.sum(_dec4(expr)).cast("double") / F.count(expr)
    return round_det(q, 2).alias(alias)


def sql_money_sum(expr: str, alias: str) -> str:
    return f"CAST(ROUND(SUM({_sql_dec4(expr)}), 2) AS DOUBLE) AS {alias}"


def _idiv(a: Column, b: Column) -> Column:
    """Exact floor division for nonnegative longs (b > 0). Subtracting the
    remainder first makes the double division exact (an exactly divisible
    quotient of integers < 2^53 has no rounding error), so this never hits
    the floor(4.9999…) trap of a plain ``(a / b).cast("long")``."""
    return ((a - a % b) / b).cast("long")


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """Exact SQL ``NTILE(k)`` from a precomputed 1-based global rank and the
    row total, for plans that mint the rank distributedly (the zipWithIndex
    shape) instead of a partitionless window.

    SQL NTILE semantics: with ``q = n div k`` and ``r = n mod k``, the first
    ``r`` buckets hold ``q+1`` rows and the remaining ``k-r`` hold ``q``
    rows. Closed form::

        bucket = (rank-1) div (q+1) + 1              if rank <= r*(q+1)
               = r + (rank-1 - r*(q+1)) div q + 1    otherwise

    The naive ``(rank-1)*k div n + 1`` is NOT NTILE — it spreads the extra
    rows Bresenham-style across the buckets and diverges whenever
    ``n mod k`` ∈ {2..k-2} (the round-2 ADVICE high finding). The else
    branch's divisor is ``greatest(q, 1)``: when n < k (q = 0) every rank
    satisfies the first branch, so the guard only silences a div-by-zero on
    a branch that is never taken."""
    rank = rank.cast("long")
    n = n.cast("long")
    kq = F.lit(int(k)).cast("long")
    q = _idiv(n, kq)
    r = n % kq
    cut = r * (q + 1)
    return (
        F.when(rank <= cut, _idiv(rank - 1, q + 1) + 1)
        .otherwise(r + _idiv(rank - 1 - cut, F.greatest(q, F.lit(1))) + 1)
        .cast("int")
    )


def sql_money_avg(expr: str, alias: str) -> str:
    q = f"CAST(SUM({_sql_dec4(expr)}) AS DOUBLE) / COUNT({expr})"
    return f"{sql_round_det(q, 2)} AS {alias}"


def _split_schema(schema: str) -> list[tuple[str, str]]:
    """Split a ``"name type, name type"`` schema string on top-level commas
    only, so parameterized types (``decimal(10,2)``, ``map<string,int>``)
    survive (ADVICE r8). Each fragment must be exactly ``name type``.
    Bracket depth is validated (ADVICE r9 #2): an unbalanced schema like
    ``'a decimal(10, b int'`` fails HERE naming the schema string, instead
    of mis-merging fragments and surfacing as a confusing downstream
    fragment assertion or a wrong CAST."""
    parts: list[str] = []
    depth, cur = 0, []
    for i, ch in enumerate(schema):
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
            if depth < 0:
                # ValueError, not assert: the validation must survive
                # python -O / PYTHONOPTIMIZE (ADVICE r10 #1)
                raise ValueError(
                    f"unbalanced bracket: unmatched {ch!r} at index {i} "
                    f"in schema {schema!r}"
                )
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    if depth != 0:
        raise ValueError(
            f"unbalanced bracket: {depth} unclosed '(' or '<' "
            f"in schema {schema!r}"
        )
    cols = []
    for frag in parts:
        toks = frag.strip().split(None, 1)
        assert len(toks) == 2, f"bad schema fragment {frag!r} in {schema!r}"
        cols.append((toks[0], toks[1]))
    return cols


def literal_frame(spark, rows: list[tuple], schema: str):
    """Tiny literal dimension as a JVM-side ``VALUES`` LocalRelation.

    NEVER build these with ``spark.createDataFrame(list)``: that
    parallelizes the Python list into a defaultParallelism-partition
    Python RDD, and every task evaluating the scan forks a Python worker
    serialized on the SparkEnv lock — measured on q410 at sf0.1: a 4-row
    percentile dim cost 326 blocked core-seconds (~1 s per task, ~0 CPU)
    across the stages that re-evaluated it. A SQL ``VALUES`` relation is
    a Catalyst LocalRelation: constant-folded, broadcastable, zero tasks.

    ``schema`` is the same ``"name type, name type"`` string
    ``createDataFrame`` accepted; values may be str/int/float/bool/None.
    Parameterized types with embedded commas (``decimal(10,2)``,
    ``map<string,int>``) are supported — fragments split only on
    top-level commas.
    """
    cols = _split_schema(schema)
    assert rows, "literal_frame needs at least one row"

    def _sql_lit(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            # Spark's default parser (escapedStringLiterals=false) treats
            # backslash sequences in literals as escapes — double them
            # first, then double single quotes (ADVICE r8).
            return "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"
        if isinstance(v, float):
            return repr(v) + "D"
        return str(v)

    values = ", ".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in rows
    )
    names = ", ".join(f"c{i}" for i in range(len(cols)))
    select = ", ".join(
        f"CAST(c{i} AS {typ}) AS {name}"
        for i, (name, typ) in enumerate(cols)
    )
    return spark.sql(f"SELECT {select} FROM VALUES {values} AS t({names})")
