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
) -> DataFrame:
    """Equi-join with the large side salted and the small side replicated.

    ``on`` columns must exist on both sides (they are coalesced in the
    output like a USING join). Supported ``how``: inner / left — the
    replication breaks right/full-outer null semantics (a dim row with no
    match would appear n_salts times), so those are rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    lg = large.withColumn(SALT, (F.rand(seed=seed) * n_salts).cast("int"))
    sm = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = lg.join(sm, on=[*on, SALT], how=how)
    return out.drop(SALT)
