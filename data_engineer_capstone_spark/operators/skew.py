"""Skew-handling join (salting) for hot keys.

AQE's skew-join splitting (on in session.py) handles most skew by
splitting oversized SORT-MERGE partitions. Salting is the complementary
tool for the cases AQE can't fix: a shuffled-hash/broadcast-ineligible
join where ONE key holds a double-digit percentage of the rows, or a
groupBy on that key. Mechanics:

- fact side: append a uniform random salt in [0, n_salts);
- dim side: explode one row into n_salts rows (one per salt value);
- join on (key, salt) — the hot key's rows now land on n_salts tasks.

The dim side grows n_salts×, so salt the SMALLER side and keep n_salts
modest (8-32). Equivalent result set to the unsalted join: the salt is a
partitioning artifact only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 0,
    salt_src=None,
) -> DataFrame:
    """Equi-join with the large side salted and the small side replicated.

    ``on`` columns must exist on both sides (they are coalesced in the
    output like a USING join). Supported ``how``: inner / left — the
    replication breaks right/full-outer null semantics (a dim row with no
    match would appear n_salts times), so those are rejected.

    The salt only partitions — any value in [0, n_salts) yields the same
    result set. Default is ``rand(seed)`` (cheapest); pass ``salt_src`` (a
    Column, ideally a row-unique id) to derive it as a hash instead, which
    makes the whole plan deterministic under retries/re-shards and lets an
    oracle pin the salted plan to the unsalted join (q229).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt_src is not None:
        from ..functions.text import h64

        salt_col = h64(F.concat(F.lit("jsalt:"), salt_src.cast("string"))) % n_salts
    else:
        salt_col = (F.rand(seed=seed) * n_salts).cast("int")
    lg = large.withColumn(SALT, salt_col)
    sm = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = lg.join(sm, on=[*on, SALT], how=how)
    return out.drop(SALT)


def salted_sum(
    df: DataFrame,
    keys: list[str],
    expr,
    salt_src,
    alias: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-resistant sum: partial sums per (keys, salt), then a
    final regroup per keys.

    A hot group key concentrates its entire sum into one reducer; salting
    splits each group into ``n_salts`` sub-groups so the first shuffle
    spreads the hot key over n_salts tasks, and the second shuffle moves
    only |groups|·n_salts pre-summed rows. ``expr`` must be an exact type
    (decimal / integer) so regrouping the partials is lossless — float
    partials would make the result depend on the salt layout. The salt is
    a deterministic hash of ``salt_src`` (not rand()) so the plan stays
    replayable and oracle-checkable.
    """
    from ..functions.text import h64

    salt = (h64(F.concat(F.lit("salt:"), salt_src.cast("string"))) % n_salts).alias(SALT)
    partial = (
        df.select(*keys, salt, expr.alias("__v"))
        .groupBy(*keys, SALT)
        .agg(F.sum("__v").alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias(alias))
