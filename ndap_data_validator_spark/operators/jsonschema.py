"""JSON payload validation — schema conformance for embedded JSON columns
(agent-transcript tool-call arguments, API event payloads, metrics blobs).

The reference validates flat CSV frames only (utils/validation.py); a
transcript pipeline additionally carries JSON-typed text columns — the
``arguments`` of a tool call, structured event payloads — and the same
rule-catalog discipline applies to them: is it parseable, are the required
fields there, are the typed fields actually the declared type. This module
answers those with pure Catalyst expressions:

  * MALFORMED means not-valid-JSON, probed with ``get_json_object('$')``
    (NULL exactly for unparseable text). ``from_json``'s PERMISSIVE
    corrupt column cannot serve as that classifier: partial-result
    parsing also sets it on a mere field type mismatch;
  * field PRESENCE vs TYPE MISMATCH are distinguished by pairing the
    ``from_json``-parsed (typed) field with ``get_json_object`` on the
    raw text: parsed NULL + raw present ⇒ the value exists but is not
    the declared type; raw absent ⇒ missing (JSON ``null`` values count
    as missing — the raw probe cannot distinguish them, documented
    contract);
  * every check is a scan-level projection — no shuffle, no UDF; the
    only exchange in the summary is ONE partial-aggregated global agg.

At 100 TB the per-row report is a projection pipelined into whatever
consumes it (violation sink, quarantine filter); the summary costs one
map-side-combined aggregate, the same shape as the validation engine's
shared-scan report (operators/validate.py).

No counterpart in the reference; north-star transcript-pipeline op.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CORRUPT = "_corrupt_record"


def _parse(col: Column, ddl: str) -> Column:
    """from_json with the corrupt-record column appended (PERMISSIVE)."""
    return F.from_json(
        col,
        f"{ddl}, {_CORRUPT} string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
    )


def json_schema_report(
    df: DataFrame,
    json_col: str,
    ddl: str,
    required: tuple[str, ...] = (),
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-row JSON conformance report. ``ddl`` is a Spark DDL struct body
    (e.g. ``"name string, count int, tags array<string>"``); ``required``
    names top-level fields that must be present (and parseable as their
    declared type); ``id_cols`` are carried through for joining back.

    Output columns: ``id_cols…, parse_ok boolean`` (NULL payload → NULL —
    absent payloads are the null-rule's business, not the JSON rule's),
    ``missing array<string>`` (required fields with no raw key — JSON
    ``null`` counts as missing), ``type_errors array<string>`` (declared
    fields whose raw value exists but does not read as the declared
    type), ``json_ok boolean`` (parse_ok AND no missing AND no type
    errors). Malformed payloads report ``parse_ok=false`` with
    ``missing = required`` and no type attribution (nothing parsed).
    """
    fields = [
        f.split(None, 1)[0].strip("`")
        for f in _split_ddl(ddl)
    ]
    raw = F.col(json_col)
    parsed = _parse(raw, ddl)
    # well-formedness probe: get_json_object('$') is NULL exactly when the
    # text is not valid JSON. from_json's corrupt column can NOT serve
    # here — partial-result parsing also sets it on a mere field type
    # mismatch (verified against Spark 4.1), which must classify as a
    # type error, not a malformed payload.
    is_json = F.get_json_object(raw, "$").isNotNull()
    parse_ok = F.when(raw.isNull(), F.lit(None).cast("boolean")).otherwise(
        is_json
    )
    raw_has = {
        name: F.get_json_object(raw, f"$.{name}").isNotNull()
        for name in {*fields, *required}
    }
    missing = F.array_compact(
        F.array(
            *[
                F.when(~raw_has[name] | ~is_json, F.lit(name))
                for name in required
            ]
        )
    )
    type_errs = F.array_compact(
        F.array(
            *[
                F.when(
                    is_json & raw_has[name] & parsed[name].isNull(),
                    F.lit(name),
                )
                for name in fields
            ]
        )
    )
    null_arr = F.lit(None).cast("array<string>")
    return df.select(
        *[F.col(c) for c in id_cols],
        parse_ok.alias("parse_ok"),
        F.when(raw.isNull(), null_arr).otherwise(missing).alias("missing"),
        F.when(raw.isNull(), null_arr)
        .otherwise(type_errs)
        .alias("type_errors"),
        F.when(raw.isNull(), F.lit(None).cast("boolean"))
        .otherwise(
            is_json & (F.size(missing) == 0) & (F.size(type_errs) == 0)
        )
        .alias("json_ok"),
    )


def json_schema_summary(
    df: DataFrame,
    json_col: str,
    ddl: str,
    required: tuple[str, ...] = (),
) -> DataFrame:
    """ONE-row corpus rollup of :func:`json_schema_report`:
    (n_rows, n_null, n_malformed, n_missing_required, n_type_errors,
    n_ok) — a single partial-aggregated agg over the same scan-level
    projection (no second pass, no shuffle beyond the 1-row exchange)."""
    rep = json_schema_report(df, json_col, ddl, required=required)
    return rep.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("parse_ok").isNull().cast("int")).alias("n_null"),
        F.sum((~F.coalesce(F.col("parse_ok"), F.lit(True))).cast("int")).alias(
            "n_malformed"
        ),
        F.sum(
            (F.coalesce(F.size("missing"), F.lit(0)) > 0).cast("int")
        ).alias("n_missing_required"),
        F.sum(
            (F.coalesce(F.size("type_errors"), F.lit(0)) > 0).cast("int")
        ).alias("n_type_errors"),
        F.sum(F.coalesce(F.col("json_ok"), F.lit(False)).cast("int")).alias(
            "n_ok"
        ),
    )


def _split_ddl(ddl: str) -> list[str]:
    """Split a DDL struct body on top-level commas (commas inside
    ``array<…>`` / ``struct<…>`` / ``map<…>`` angle brackets don't
    separate fields)."""
    parts, depth, cur = [], 0, []
    for ch in ddl:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
            continue
        cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts
