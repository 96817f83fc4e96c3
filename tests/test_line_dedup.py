from __future__ import annotations

import hashlib

from ndap_data_validator_spark.operators.repeated import line_dedup

DOCS = [
    (1, "alpha unique opening\nCookie Banner Accept All\nbody text one\n\nclosing line one"),
    (2, "beta unique opening\ncookie banner accept all\nbody text two"),
    # entirely boilerplate: every line removed -> cleaned ''
    (3, "Cookie Banner Accept All"),
    # no repeated lines at all
    (4, "gamma totally novel\nnothing shared here"),
]


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_line_dedup_removes_cross_doc_lines(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    cleaned, report = line_dedup(docs, min_docs=2)
    got = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    # casefolded match: both spellings of the banner are removed
    assert got[1] == "alpha unique opening\nbody text one\n\nclosing line one"
    assert got[2] == "beta unique opening\nbody text two"
    assert got[3] == ""
    assert got[4] == DOCS[3][1]
    rep = {r["doc_id"]: r for r in report.collect()}
    assert rep[1]["n_lines"] == 5 and rep[1]["n_repeated"] == 1
    assert rep[3]["n_lines"] == 1 and rep[3]["n_repeated"] == 1
    assert rep[3]["repeated_frac"] == 1.0
    assert rep[4]["n_repeated"] == 0 and rep[4]["max_repeated_run"] == 0
    for d, txt in got.items():
        assert rep[d]["cleaned_md5"] == _md5(txt)


def test_line_dedup_run_length_and_empty_exemption(spark):
    shared_a, shared_b = "shared line aaa", "shared line bbb"
    docs = spark.createDataFrame(
        [
            (1, f"own one\n{shared_a}\n{shared_b}\nown two\n\n{shared_a}"),
            (2, f"{shared_a}\n{shared_b}"),
            (3, "\n\n"),  # only empty lines: exempt, nothing removed
        ],
        "doc_id long, text string",
    )
    cleaned, report = line_dedup(docs, min_docs=2)
    rep = {r["doc_id"]: r for r in report.collect()}
    # doc 1: positions 2,3 removed (run 2) and position 6 removed (run 1)
    assert rep[1]["n_repeated"] == 3 and rep[1]["max_repeated_run"] == 2
    got = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    assert got[1] == "own one\nown two\n"
    assert got[3] == "\n\n"  # empty lines survive untouched
    assert rep[3]["n_repeated"] == 0


def test_line_dedup_null_id_doc_still_marked(spark):
    """A NULL doc id is one anonymous document: its boilerplate lines must
    still be removed (a plain equi-join would never mark them)."""
    docs = spark.createDataFrame(
        [(None, "own text\nshared banner"), (2, "other\nshared banner")],
        "doc_id long, text string",
    )
    cleaned, report = line_dedup(docs, min_docs=2)
    rep = {r["doc_id"]: r for r in report.collect()}
    assert rep[None]["n_repeated"] == 1 and rep[2]["n_repeated"] == 1
    got = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    assert got[None] == "own text" and got[2] == "other"


def test_line_dedup_deterministic_under_repartition(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = line_dedup(docs, min_docs=2)[1].collect()
    b = line_dedup(docs.repartition(7), min_docs=2)[1].collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
