"""JSON payload validation (operators/jsonschema.py) — tool-call argument
conformance for agent transcripts."""

from pyspark.sql import functions as F

from ndap_data_validator_spark.operators.jsonschema import (
    json_schema_report,
    json_schema_summary,
)

DDL = "name string, count int, tags array<string>"


def _rep(spark, rows, required=("name", "count")):
    df = spark.createDataFrame(rows, "id int, payload string")
    out = json_schema_report(
        df, "payload", DDL, required=required, id_cols=("id",)
    )
    return {r["id"]: r.asDict() for r in out.collect()}


def test_json_ok_row(spark):
    r = _rep(spark, [(1, '{"name":"x","count":3,"tags":["a","b"]}')])
    assert r[1]["parse_ok"] is True
    assert r[1]["missing"] == [] and r[1]["type_errors"] == []
    assert r[1]["json_ok"] is True


def test_malformed_payload(spark):
    r = _rep(spark, [(1, '{"name": broken')])
    assert r[1]["parse_ok"] is False
    assert r[1]["missing"] == ["name", "count"]  # nothing parsed
    assert r[1]["type_errors"] == []
    assert r[1]["json_ok"] is False


def test_missing_required_field(spark):
    r = _rep(spark, [(1, '{"name":"x"}'), (2, '{"name":"x","count":null}')])
    assert r[1]["missing"] == ["count"] and r[1]["json_ok"] is False
    # JSON null counts as missing (documented contract)
    assert r[2]["missing"] == ["count"] and r[2]["json_ok"] is False


def test_type_mismatch_vs_absent(spark):
    r = _rep(
        spark,
        [
            (1, '{"name":"x","count":"three"}'),      # present, wrong type
            (2, '{"name":"x","count":3,"tags":5}'),   # tags wrong type
        ],
    )
    assert r[1]["type_errors"] == ["count"]
    assert r[1]["missing"] == [] and r[1]["json_ok"] is False
    assert r[2]["type_errors"] == ["tags"] and r[2]["json_ok"] is False


def test_null_payload_is_nulls(spark):
    r = _rep(spark, [(1, None)])
    assert r[1]["parse_ok"] is None
    assert r[1]["missing"] is None and r[1]["type_errors"] is None
    assert r[1]["json_ok"] is None


def test_summary_rollup(spark):
    rows = [
        (1, '{"name":"x","count":3}'),
        (2, '{"name":"x"}'),
        (3, 'not json'),
        (4, '{"name":"x","count":"bad"}'),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id int, payload string")
    s = json_schema_summary(
        df, "payload", DDL, required=("name", "count")
    ).first()
    assert s["n_rows"] == 5
    assert s["n_null"] == 1
    assert s["n_malformed"] == 1
    assert s["n_missing_required"] == 2  # row 2 AND row 3 (malformed)
    assert s["n_type_errors"] == 1
    assert s["n_ok"] == 1


def test_no_shuffle_in_report_plan(spark):
    """The per-row report must stay a scan-level projection."""
    df = spark.createDataFrame(
        [(1, '{"name":"x","count":3}')], "id int, payload string"
    )
    plan = (
        json_schema_report(df, "payload", DDL, required=("name",),
                           id_cols=("id",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_required_field_outside_ddl(spark):
    """A required name absent from the DDL is still presence-checked on
    the raw payload (it just can't be type-checked)."""
    df = spark.createDataFrame(
        [(1, '{"name":"x","extra":1}'), (2, '{"name":"x"}')],
        "id int, payload string",
    )
    out = {
        r["id"]: r.asDict()
        for r in json_schema_report(
            df, "payload", "name string", required=("name", "extra"),
            id_cols=("id",),
        ).collect()
    }
    assert out[1]["missing"] == [] and out[1]["json_ok"] is True
    assert out[2]["missing"] == ["extra"] and out[2]["json_ok"] is False
