"""Chat-template rendering + loss-mask spans (operators/render.py) vs a
pure-Python rendering of the same template."""

import hashlib

from ndap_data_validator_spark.operators.render import (
    MID,
    PRE,
    SUF,
    render_conversations,
    render_turn_spans,
)

TURNS = [
    # conv 1: system + 2 exchanges, shuffled input order on purpose
    (1, 3, "assistant", "fine, thanks"),
    (1, 1, "system", "be helpful"),
    (1, 2, "user", "how are you?"),
    (1, 4, "user", "bye"),
    (1, 5, "assistant", "bye!"),
    # conv 2: single user turn — zero target chars
    (2, 1, "user", "anyone here?"),
    # conv 3: unicode text (char offsets, not bytes)
    (3, 1, "user", "héllo ✓"),
    (3, 2, "assistant", "ok ✓"),
]
SCHEMA = "conv_id long, turn_idx int, role string, text string"


def _py_render(turns):
    """Independent oracle: rendered string + per-turn char spans."""
    out = {}
    for conv in sorted({t[0] for t in turns}):
        ordered = sorted([t for t in turns if t[0] == conv], key=lambda t: t[1])
        rendered, spans, pos = "", {}, 0
        for _, idx, role, text in ordered:
            piece = PRE + role + MID + text + SUF
            text_start = pos + len(PRE) + len(role) + len(MID)
            spans[idx] = {
                "start_char": pos,
                "text_start": text_start,
                "text_end": text_start + len(text),
                "n_chars": len(piece),
                "is_target": role == "assistant",
            }
            rendered += piece
            pos += len(piece)
        out[conv] = (rendered, spans)
    return out


def test_turn_spans_match_python_oracle(spark):
    df = spark.createDataFrame(TURNS, SCHEMA)
    got = {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in render_turn_spans(df).collect()
    }
    oracle = _py_render(TURNS)
    assert len(got) == len(TURNS)
    for (conv, idx), row in got.items():
        exp = oracle[conv][1][idx]
        for k, v in exp.items():
            assert row[k] == v, (conv, idx, k, row, exp)


def test_spans_slice_the_rendered_string(spark):
    """The span manifest must index INTO the rendered string: slicing
    [text_start:text_end) out of render_conversations' output recovers
    the turn's raw text exactly (incl. multibyte chars)."""
    df = spark.createDataFrame(TURNS, SCHEMA)
    rendered = {
        r["conv_id"]: r["rendered"]
        for r in render_conversations(df).collect()
    }
    spans = render_turn_spans(df).collect()
    raw = {(t[0], t[1]): t[3] for t in TURNS}
    for r in spans:
        s = rendered[r["conv_id"]][r["text_start"] : r["text_end"]]
        assert s == raw[(r["conv_id"], r["turn_idx"])]


def test_conversation_rollup_and_md5(spark):
    df = spark.createDataFrame(TURNS, SCHEMA)
    got = {r["conv_id"]: r.asDict() for r in render_conversations(df).collect()}
    oracle = _py_render(TURNS)
    for conv, (rendered, spans) in oracle.items():
        row = got[conv]
        assert row["rendered"] == rendered
        assert row["rendered_md5"] == hashlib.md5(
            rendered.encode("utf-8")
        ).hexdigest()
        assert row["n_turns"] == len(spans)
        assert row["n_chars"] == len(rendered)
        assert row["n_target_chars"] == sum(
            s["text_end"] - s["text_start"]
            for s in spans.values()
            if s["is_target"]
        )
    assert got[2]["n_target_chars"] == 0


def test_custom_template_affixes(spark):
    df = spark.createDataFrame(TURNS[:3], SCHEMA)
    kw = dict(pre="[", mid="] ", suf="\n")
    row = {
        r["conv_id"]: r
        for r in render_conversations(df, **kw).collect()
    }[1]
    assert (
        row["rendered"]
        == "[system] be helpful\n[user] how are you?\n[assistant] fine, thanks\n"
    )
    spans = {
        r["turn_idx"]: r for r in render_turn_spans(df, **kw).collect()
    }
    assert row["rendered"][spans[2]["text_start"] : spans[2]["text_end"]] == (
        "how are you?"
    )
