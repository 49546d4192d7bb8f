"""Declared star-schema table schemas, cast-enforced.

Source of truth mirroring the reference's `get_schema()` registry
(/root/reference/scripts/pyspark.py:78-156) with the documented corrections
(SURVEY.md §1.2, §7.2):

- Types are ENFORCED on ingest (reference's empty-df-union silently widened
  them to string).
- `temperatures.avg_temperature{,_uncertainty}`: DoubleType. The reference
  declares IntegerType (pyspark.py:94-95) but feeds decimal strings — a
  faithful int cast would null the column; runtime values were strings.
- weekday columns: StringType per README.md:129 (reference declares Integer
  at pyspark.py:114,118 but feeds 'mon'-style strings). The oracle-checked
  query variants use ISO ints instead (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _schema(fields: list[tuple[str, T.DataType, bool]]) -> T.StructType:
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


ASYLUM = _schema(
    [
        ("id", T.LongType(), False),
        ("country", T.StringType(), False),
        ("year", T.LongType(), False),
        ("num_arrivals", T.IntegerType(), True),
        ("num_accepted_affirmitavely", T.IntegerType(), True),  # load-bearing typo
        ("num_accepted_defensively", T.IntegerType(), True),
    ]
)

TEMPERATURES = _schema(
    [
        ("avg_temperature", T.DoubleType(), True),
        ("avg_temperature_uncertainty", T.DoubleType(), True),
        ("country", T.StringType(), False),
        ("year", T.IntegerType(), False),
        ("month", T.IntegerType(), False),
        ("day", T.IntegerType(), False),
        ("weekday", T.StringType(), False),
    ]
)


def visitor_schema(weekday_type: T.DataType = T.StringType()) -> T.StructType:
    return _schema(
        [
            ("id", T.IntegerType(), False),
            ("visa_category", T.StringType(), False),
            ("visa_type", T.StringType(), False),
            ("port_of_entry_municipality", T.StringType(), True),
            ("port_of_entry_region", T.StringType(), True),
            ("country", T.StringType(), False),
            ("visiting_state", T.StringType(), False),
            ("arrival_year", T.IntegerType(), True),
            ("arrival_month", T.IntegerType(), True),
            ("arrival_day", T.IntegerType(), True),
            ("arrival_weekday", weekday_type, True),
            ("expiry_year", T.IntegerType(), True),
            ("expiry_month", T.IntegerType(), True),
            ("expiry_day", T.IntegerType(), True),
            ("expiry_weekday", weekday_type, True),
        ]
    )


def worker_schema(weekday_type: T.DataType = T.StringType()) -> T.StructType:
    return _schema(
        [
            ("id", T.LongType(), False),
            ("case_status", T.StringType(), False),
            ("visa_type", T.StringType(), True),
            ("employer_name", T.StringType(), False),
            ("employer_city", T.StringType(), True),
            ("employer_state", T.StringType(), True),
            ("worksite_city", T.StringType(), False),
            ("worksite_state", T.StringType(), False),
            ("arrival_year", T.IntegerType(), False),
            ("arrival_month", T.IntegerType(), True),
            ("arrival_day", T.IntegerType(), True),
            ("arrival_weekday", weekday_type, True),
            ("expiry_year", T.IntegerType(), True),
            ("expiry_month", T.IntegerType(), True),
            ("expiry_day", T.IntegerType(), True),
            ("expiry_weekday", weekday_type, True),
        ]
    )


def time_schema(weekday_type: T.DataType = T.StringType()) -> T.StructType:
    return _schema(
        [
            ("id", T.LongType(), False),
            ("immigration_type", T.StringType(), False),
            ("arrival_year", T.IntegerType(), False),
            ("arrival_month", T.IntegerType(), True),
            ("arrival_day", T.IntegerType(), True),
            ("arrival_weekday", weekday_type, True),
            ("expiry_year", T.IntegerType(), True),
            ("expiry_month", T.IntegerType(), True),
            ("expiry_day", T.IntegerType(), True),
            ("expiry_weekday", weekday_type, True),
        ]
    )


FACT = _schema(
    [
        ("id", T.LongType(), False),
        ("country", T.StringType(), True),
        ("immigration_type", T.StringType(), False),
        ("time_id", T.LongType(), False),
    ]
)

# Output partitioning per the reference's write calls (pyspark.py:462-469)
PARTITION_SPECS = {
    "temperatures": ["country"],
    "asylum": ["country"],
    "visitors": ["country", "visa_category"],
    "workers": ["visa_type"],
    "time": ["immigration_type", "arrival_year"],
    "immigration_facts": ["immigration_type"],
}
