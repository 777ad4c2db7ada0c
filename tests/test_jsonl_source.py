"""JSONL corpus source: strict scan dies on a torn line, lenient scan
degrades it to NULLs + captured raw line, and the quarantine report
counts casualties exactly."""

from __future__ import annotations

import tempfile

import pytest

from udacity_data_wrangling_osm_case_study_spark.sources import jsonl

GOOD = [
    '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "src0", "n_chars": 11}',
    '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "src1", "n_chars": 7}',
    '{"doc_id": 3, "text": "ni hao", "lang": "zh", "source": "src0", "n_chars": 6}',
]
TORN = '{"doc_id": 4, "text": "trunca'  # mid-line shard cut
BAD_TYPE = '{"doc_id": "not-a-number", "text": "x", "lang": "en", "source": "src1", "n_chars": 1}'


@pytest.fixture(scope="module")
def jsonl_dir():
    d = tempfile.mkdtemp(prefix="jsonl_")
    with open(f"{d}/shard-000.jsonl", "w") as fh:
        fh.write("\n".join([*GOOD[:2], TORN]) + "\n")
    with open(f"{d}/shard-001.jsonl", "w") as fh:
        fh.write("\n".join([GOOD[2], BAD_TYPE]) + "\n")
    return d


def test_strict_scan_fails_on_torn_line(spark, jsonl_dir):
    with pytest.raises(Exception, match="FAILED_READ_FILE|Malformed|FAILFAST"):
        jsonl.read_documents_jsonl(spark, jsonl_dir).collect()


def test_lenient_scan_degrades_and_captures(spark, jsonl_dir):
    df = jsonl.read_documents_jsonl(spark, jsonl_dir, lenient=True)
    rows = df.collect()
    assert len(rows) == 5
    by_id = {r.doc_id: r for r in rows if r.doc_id is not None}
    # clean rows parse fully, corrupt column NULL
    assert by_id[1].text == "hello world"
    assert by_id[1]._corrupt_record is None
    assert by_id[3].lang == "zh"
    # casualties: NULL id, raw line captured
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert len(corrupt) == 2
    captured = {r._corrupt_record for r in corrupt}
    assert any("trunca" in c for c in captured)
    assert any("not-a-number" in c for c in captured)


def test_corrupt_line_report_counts_exactly(spark, jsonl_dir):
    df = jsonl.read_documents_jsonl(spark, jsonl_dir, lenient=True)
    rep = jsonl.corrupt_line_report(df).collect()[0]
    assert (rep.n_rows, rep.n_first_parsed, rep.n_corrupt, rep.corrupt_pm) == (
        5,
        3,
        2,
        400,
    )


def test_corrupt_report_rejects_strict_frame(spark, jsonl_dir):
    strict = jsonl.read_documents_jsonl(spark, jsonl_dir)
    with pytest.raises(ValueError, match="_corrupt_record"):
        jsonl.corrupt_line_report(strict)


def test_lenient_matches_parquet_documents_contract(spark):
    # The JSONL schema IS the documents-table contract: a JSONL dump of
    # the parquet table round-trips column-for-column.
    import os

    pq = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = tempfile.mkdtemp(prefix="jsonl_rt_")
    path = os.path.join(d, "docs.jsonl")
    with open(path, "w") as fh:
        for row in pq.toJSON().collect():
            fh.write(row + "\n")
    back = jsonl.read_documents_jsonl(spark, path)
    assert back.schema == pq.schema
    assert back.count() == pq.count()
    assert back.selectExpr("sum(doc_id)", "sum(n_chars)").collect() == (
        pq.selectExpr("sum(doc_id)", "sum(n_chars)").collect()
    )
