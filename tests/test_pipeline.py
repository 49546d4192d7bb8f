"""End-to-end star-schema lake build: t1 smoke (SURVEY.md §5) —
all six tables build, pass DQ gates, and write partitioned parquet."""

from __future__ import annotations

import os

from data_engineer_capstone_spark.pipeline import build, schemas


def test_build_all_and_write_lake(spark, tmp_path):
    tables = build.build_all(spark)
    assert set(tables) == {
        "temperatures",
        "asylum",
        "visitors",
        "workers",
        "time",
        "immigration_facts",
    }
    gates = build.run_quality_gates(tables)
    for name, checks in gates.items():
        assert all(checks.values()), f"{name}: {checks}"

    # time/fact composite-key integrity (README.md:139-142)
    t = tables["time"]
    assert t.count() == t.select("id", "immigration_type").distinct().count()

    out = str(tmp_path / "lake")
    build.write_lake(tables, out)
    for name, part_cols in schemas.PARTITION_SPECS.items():
        root = os.path.join(out, name)
        assert os.path.isdir(root), name
        # Hive-style partition dirs for the first partition column
        entries = [e for e in os.listdir(root) if e.startswith(f"{part_cols[0]}=")]
        assert entries, f"{name}: no partition dirs under {root}"
        back = spark.read.parquet(root)
        assert back.count() == tables[name].count()

    for df in tables.values():
        df.unpersist()


def test_cli_end_to_end(spark, tmp_path, capsys):
    """python -m data_engineer_capstone_spark: gates pass, lake written."""
    from data_engineer_capstone_spark.__main__ import main

    out = str(tmp_path / "cli_lake")
    rc = main(["--out", out, "--weekday", "iso"])
    assert rc == 0
    assert os.path.isdir(os.path.join(out, "immigration_facts"))
    assert "lake written" in capsys.readouterr().out


def test_worker_pipeline_reference_quirks(spark):
    workers = build.parse_worker(spark)
    # kaggle-only rows: no dates at all -> arrival parts null, year present
    df1_rows = workers.filter(workers.arrival_month.isNull())
    assert df1_rows.count() > 0
    # state gate: every df2-originated worksite_state is a valid 2-letter code,
    # while df1 passthroughs may keep the leading space (reference semantics)
    spaced = workers.filter(workers.worksite_state.startswith(" ")).count()
    assert spaced > 0  # ' PUERTO RICO' style passthrough survives
