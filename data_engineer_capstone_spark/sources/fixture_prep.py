"""Offline fixture-prep sources/sinks (SURVEY.md §2.1 S9-S12).

The reference ships two single-process pre-parsers that run before Spark:
an Excel cell-coordinate extractor (parse_excel_files.py:15-39, via xlrd)
and a hand-rolled character-level tokenizer for SAS label files
(parse_immigration_sas.py:6-81). These produce the CSV/JSON inputs the
Spark job reads (S1, S4).

This module provides the same capabilities as fresh implementations:

- ``parse_sas_labels``: a line/regex block parser for the common
  ``value <fmtname> ... CODE = 'LABEL' ...`` SAS PROC FORMAT structure —
  not a port of the reference's index-arithmetic tokenizer; it handles
  the same inputs (quoted/unquoted codes, embedded quotes, INVALID/no-code
  scrubbing) declaratively.
- ``parse_excel_workbooks``: gated behind an Excel engine import
  (openpyxl/xlrd are not in this container); the Spark-side contract —
  list-of-dict rows → ``spark.createDataFrame`` — is real and tested via
  the deterministic fake.
- ``write_csv`` / ``write_json``: stdlib sinks for the prepared fixtures.

These are driver-side utilities by design: fixture prep handles small
metadata files (code books, workbook summaries), not the 100 TB fact
data — that always flows through the Spark readers in ``readers.py``.
"""

from __future__ import annotations

import csv
import json
import re
from typing import Any

_VALUE_BLOCK = re.compile(r"^\s*value\s+(\$?)(\w+)", re.IGNORECASE)
# CODE = 'LABEL'  — code either quoted or bare; label single-quoted with
# '' as the escaped embedded quote.
_PAIR = re.compile(r"^\s*(?:'([^']*)'|(\S+))\s*=\s*'((?:[^']|'')*)'")
_SCRUB = re.compile(r"INVALID|No\s+\w+\s+Code|Collapsed|Should not show", re.IGNORECASE)


def parse_sas_labels(
    text: str,
    scrub: bool = True,
    title_case: set[str] | None = None,
) -> dict[str, dict[str, str]]:
    """Parse SAS PROC FORMAT label definitions into {format: {code: label}}.

    ``scrub`` drops entries whose label marks them invalid (the reference
    scrubs ``INVALID:`` / ``No Country Code`` / ``No PORT Code``,
    parse_immigration_sas.py:28-31,63-64). ``title_case`` is a set of
    format names whose labels get Title Casing (the reference title-cases
    port names, parse_immigration_sas.py:66-75).
    """
    out: dict[str, dict[str, str]] = {}
    current: dict[str, str] | None = None
    current_name = ""
    for line in text.splitlines():
        m = _VALUE_BLOCK.match(line)
        if m:
            current_name = m.group(2).lower()
            current = out.setdefault(current_name, {})
            continue
        if current is None:
            continue
        if line.strip() == ";":
            current = None
            continue
        p = _PAIR.match(line)
        if not p:
            continue
        code = p.group(1) if p.group(1) is not None else p.group(2)
        label = p.group(3).replace("''", "'").strip()
        if scrub and _SCRUB.search(label):
            continue
        if title_case and current_name in title_case:
            label = label.title()
        current[code.strip()] = label
    return {k: v for k, v in out.items() if v}


def parse_excel_workbooks(
    paths: list[str],
    sheet: int = 0,
    header_row: int = 0,
    fake: bool = False,
) -> list[dict[str, Any]]:
    """Extract rows from Excel workbooks as list-of-dicts (S9).

    Requires an Excel engine (openpyxl or xlrd) which this container does
    not ship — the real path raises with guidance, and ``fake=True``
    returns a deterministic synthetic extraction so the downstream
    plumbing (``spark.createDataFrame(rows)`` → CSV fixture) is testable.
    """
    if fake:
        return [
            {"source": p, "country": f"country_{i}", "year": 2015 + i, "value": i * 10}
            for i, p in enumerate(sorted(paths))
        ]
    try:  # gate BEFORE touching files: pandas sniffs bytes pre-engine-import
        import openpyxl  # noqa: F401
    except ImportError:
        try:
            import xlrd  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "Excel extraction needs pandas + openpyxl/xlrd; install one "
                "or pre-convert the workbooks to CSV (see write_csv)."
            ) from exc
    import pandas as pd

    frames = [pd.read_excel(p, sheet_name=sheet, header=header_row) for p in paths]
    return [row for f in frames for row in f.to_dict(orient="records")]


def write_csv(rows: list[dict[str, Any]], path: str, header: list[str]) -> None:
    """CSV sink for prepared fixtures (S10; ref parse_excel_files.py:36-39)."""
    with open(path, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=header)
        w.writeheader()
        w.writerows(rows)


def write_json(obj: Any, path: str) -> None:
    """JSON sink for lookup dims (S12; ref parse_immigration_sas.py:104-111).

    Lookup dicts are written as a pretty-printed ARRAY of {code, ...}
    objects — the multiLine JSON shape ``readers.json_source`` (S4) reads.
    """
    with open(path, "w") as fh:
        json.dump(obj, fh, indent=2, sort_keys=True)
