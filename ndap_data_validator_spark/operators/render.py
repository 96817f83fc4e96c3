"""Chat-template rendering with loss-mask character spans — the SFT step
between a transcript table and the packer.

A fine-tuning pipeline does not train on (conv_id, turn_idx, role, text)
rows; it trains on ONE rendered string per conversation (role-tagged turns
laid head-to-tail in turn order) plus a LOSS MASK saying which character
spans of that string are supervision targets (the assistant's text) and
which are context (user/system turns, role tags, separators — the
completion-only-loss convention). This operator produces both, exactly:

* :func:`render_turn_spans` — per-turn manifest: where each turn starts in
  the rendered conversation, where its TEXT portion starts/ends (the loss
  span when ``is_target``), all in characters;
* :func:`render_conversations` — the rendered string itself (plus md5,
  char totals, target-char totals) per conversation.

The template is the fixed three-affix form ``PRE + role + MID + text +
SUF`` (defaults ``<|``, ``|>\\n``, ``<|end|>\\n``) — the shape of every
public chat template (ChatML, Llama-chat, …) once the role names are
substituted; affixes are parameters, not constants, so any such template
renders with the same plan.

Plan shape, sized for 100 TB of transcripts:

* span arithmetic is ONE window shuffle on the conversation key (a
  running sum of per-turn rendered lengths — each length is a pure
  projection of ``length(role)+length(text)+const``);
* the rendered string is ONE groupBy on the same key
  (``array_sort(collect_list(struct(turn_idx, rendered_turn)))`` →
  ``array_join``) — Catalyst reuses the window's hash partitioning for
  the aggregation (subset-of-keys rule), so turns shuffle once, total;
* no Python anywhere; every expression is codegen'd.

Everything is character arithmetic on deterministic strings, so DuckDB
replays it verbatim (``SUM(...) OVER`` prefix sums +
``string_agg(... ORDER BY turn_idx)``) and the conversation md5
hash-checks the ENTIRE rendered string, not just its length.

No counterpart in the reference (tabular validation scope —
``utils/validation.py``); north-star training-data op alongside packing
(``operators/pack.py``) and the sequence checks (``operators/convchecks.py``)
that validate the same transcript shape upstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PRE = "<|"
MID = "|>\n"
SUF = "<|end|>\n"


def _turn_len(role: Column, text: Column, pre: str, mid: str, suf: str) -> Column:
    return (
        F.length(role) + F.length(text) + F.lit(len(pre) + len(mid) + len(suf))
    )


def rendered_turn(
    role: Column,
    text: Column,
    pre: str = PRE,
    mid: str = MID,
    suf: str = SUF,
) -> Column:
    """``pre + role + mid + text + suf`` — one turn's rendered form."""
    return F.concat(F.lit(pre), role, F.lit(mid), text, F.lit(suf))


def render_turn_spans(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    target_role: str = "assistant",
    pre: str = PRE,
    mid: str = MID,
    suf: str = SUF,
) -> DataFrame:
    """Per-turn character-span manifest of the rendered conversation:
    (conv, turn_idx, role, n_chars, start_char, text_start, text_end,
    is_target).

    ``start_char`` is the 0-based offset of the turn's first rendered
    character inside the conversation string; ``[text_start, text_end)``
    brackets the turn's raw text (the loss span when ``is_target`` — the
    completion-only convention: role tags and separators are never
    supervision targets). One window shuffle on the conversation key."""
    role, text = F.col(role_col), F.col(text_col)
    tl = _turn_len(role, text, pre, mid, suf)
    w = (
        Window.partitionBy(conv_col)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(tl).over(w) - tl).cast("long")
    text_start = start + F.lit(len(pre)) + F.length(role) + F.lit(len(mid))
    return turns.select(
        conv_col,
        idx_col,
        role_col,
        tl.cast("long").alias("n_chars"),
        start.alias("start_char"),
        text_start.cast("long").alias("text_start"),
        (text_start + F.length(text)).cast("long").alias("text_end"),
        (role == F.lit(target_role)).alias("is_target"),
    )


def render_conversations(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    target_role: str = "assistant",
    pre: str = PRE,
    mid: str = MID,
    suf: str = SUF,
) -> DataFrame:
    """Rendered conversation strings: (conv, n_turns, n_chars,
    n_target_chars, rendered, rendered_md5). ``n_target_chars`` is the
    total loss-span length (sum of target-role text lengths) — the number
    a token-budgeting SFT mix planner actually wants per conversation.
    One aggregation shuffle on the conversation key; turn order inside a
    conversation comes from ``array_sort`` on (turn_idx, …) structs, not
    from any incidental row order."""
    role, text = F.col(role_col), F.col(text_col)
    rt = rendered_turn(role, text, pre, mid, suf)
    agg = turns.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(
            F.when(role == F.lit(target_role), F.length(text)).otherwise(0)
        ).cast("long").alias("n_target_chars"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col(idx_col).alias("i"), rt.alias("r"))
                    )
                ),
                lambda s: s["r"],
            ),
            "",
        ).alias("rendered"),
    )
    return agg.select(
        conv_col,
        "n_turns",
        F.length("rendered").cast("long").alias("n_chars"),
        "n_target_chars",
        "rendered",
        F.md5("rendered").alias("rendered_md5"),
    )
