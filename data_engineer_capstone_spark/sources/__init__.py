"""Ingestion / sink surface (SURVEY.md §2.1 S1-S12).

Readers are cast-enforcing: the reference reads CSV header-only so every
column arrives as a string and its declared schemas are never actually
applied (SURVEY §1.2) — here a declared schema is enforced on read, either
natively by the reader (parquet/CSV with ``schema=``) or by a projected
cast (JSON after inference).

Sinks repartition on the partition columns before ``partitionBy`` so one
task owns each output partition — the guard against small-file explosions
at 100 TB scale.
"""

from .fixture_prep import parse_excel_workbooks, parse_sas_labels, write_csv, write_json
from .readers import (
    avro_source,
    conform,
    csv_source,
    fixed_width_source,
    json_source,
    orc_source,
    parquet_source,
)
from .sinks import write_table
from .warclite import register_warclite

__all__ = [
    "register_warclite",
    "conform",
    "csv_source",
    "fixed_width_source",
    "json_source",
    "parquet_source",
    "orc_source",
    "avro_source",
    "write_table",
    "parse_excel_workbooks",
    "parse_sas_labels",
    "write_csv",
    "write_json",
]
