"""COVERAGE.md freshness gate.

COVERAGE.md is the hand-maintained audit table mapping SURVEY.md §2
ids to catalog entries. Hand-maintained docs drift: an entry added to
the catalog without a row (or at least a mention) in COVERAGE.md
silently falls out of the audit trail. This test asserts every
catalog entry name appears verbatim somewhere in COVERAGE.md, so the
doc cannot lag the catalog. (Composite entries that ride an existing
row still need their name mentioned on that row — that is the point.)

No SparkSession needed: importing the catalog only registers
callables.
"""

import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_catalog_entry_named_in_coverage_md():
    from trisk_datawrangle_spark.catalog import QUERIES

    with open(os.path.join(REPO, "COVERAGE.md")) as fh:
        text = fh.read()

    missing = sorted(n for n in QUERIES if n not in text)
    assert not missing, (
        "catalog entries absent from COVERAGE.md (add a row or mention "
        f"them on the row that exercises them): {missing}"
    )


def test_every_catalog_entry_named_in_survey_or_coverage():
    """Weaker companion: the SURVEY §2 checklist plus COVERAGE.md
    together must reference the whole catalog — catches a rename that
    updates one doc but not the other."""
    from trisk_datawrangle_spark.catalog import QUERIES

    blob = ""
    for doc in ("COVERAGE.md", "SURVEY.md"):
        p = os.path.join(REPO, doc)
        if os.path.exists(p):
            with open(p) as fh:
                blob += fh.read()
    missing = sorted(n for n in QUERIES if n not in blob)
    assert not missing, f"entries unnamed in any audit doc: {missing}"


def test_bench_headline_entries_exist():
    """bench.py's HEADLINE list must name real catalog entries — a
    renamed entry would otherwise surface only as a per-query bench
    error at round end."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from trisk_datawrangle_spark.catalog import QUERIES

    unknown = sorted(n for n in bench.HEADLINE if n not in QUERIES)
    assert not unknown, f"bench HEADLINE names unknown entries: {unknown}"
