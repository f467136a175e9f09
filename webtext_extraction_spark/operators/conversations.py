"""Conversation-level operators over the transcripts input shape
(conv_id, turn_idx, role, text) — the table this engine extracts from
per BASELINE.json:input_hint.

Two standard steps of an LLM training-data pipeline that act on whole
conversations rather than single turns:

- conversation_pairs: materialize (prompt, completion) training
  examples — for every assistant turn, the prompt is the role-tagged
  concatenation of the preceding ``context_turns`` turns in
  stable turn order.  Pure window expressions (collect_list over a
  bounded ROWS frame), one shuffle on conv_id.  Conversations are
  bounded-length, so conv_id keys carry no skew; the k-fold text
  duplication in materialized prompts is inherent to pair
  materialization (at 100 TB you'd emit turn references and join at
  tokenization time — this operator is the materializing variant).
- conversation_digest: conversation-level exact dedup — an
  order-sensitive digest of the turn sequence, with the canonical
  keeper (min conv_id) per digest group.  Per-turn md5 digests are
  concatenated THEN re-hashed (md5(t1)‖md5(t2)…): hashing each turn
  first keeps the combined key injective even when turn text contains
  any would-be separator.  One groupBy(conv) shuffle carrying only
  (idx, 32-byte digest) per turn, then a broadcast-sized group join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def conversation_pairs(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    completion_role: str = "assistant",
    context_turns: int = 4,
) -> DataFrame:
    """(prompt, completion) pairs for every ``completion_role`` turn.

    The prompt concatenates up to ``context_turns`` immediately
    preceding turns as ``role: text`` lines joined by newlines; turns
    with no preceding context yield an empty prompt (kept — callers
    filter on n_context if they want multi-turn-only examples).  NULL
    turn text is treated as empty string (``role: ``) so the operator
    and its SQL oracle agree — bare ``concat_ws`` would keep a
    ``role``-only line where ``||`` would drop the whole line.
    """
    if context_turns < 1:
        raise ValueError(f"context_turns must be >= 1, got {context_turns}")
    w = (
        Window.partitionBy(conv_col)
        .orderBy(idx_col)
        .rowsBetween(-context_turns, -1)
    )
    tagged = F.concat_ws(": ", F.col(role_col), F.coalesce(F.col(text_col), F.lit("")))
    ctx = F.collect_list(tagged).over(w)
    return (
        df.select(
            F.col(conv_col),
            F.col(idx_col),
            F.col(role_col),
            F.col(text_col),
            ctx.alias("_ctx"),
        )
        .filter(F.col(role_col) == completion_role)
        .select(
            conv_col,
            idx_col,
            F.concat_ws("\n", F.col("_ctx")).alias("prompt"),
            F.col(text_col).alias("completion"),
            F.size("_ctx").cast("int").alias("n_context"),
        )
    )


def conversation_digest(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Order-sensitive per-conversation digest + dedup grouping.

    Returns one row per conversation: (conv_id, n_turns, digest,
    keeper_conv, is_keeper) where keeper_conv is the smallest conv_id
    sharing the digest.  array_sort over (idx, md5(text)) structs makes
    the digest independent of shuffle arrival order.  A NULL turn text
    hashes to the literal 'null' (4 chars — can never collide with a
    32-hex md5), keeping the digest INJECTIVE over turn sequences:
    without it concat_ws would skip the NULL and [NULL, 'x'] would
    digest equal to ['x'], silently deduping distinct conversations.
    """
    per_conv = (
        df.select(
            F.col(conv_col).alias("_conv"),
            F.struct(
                F.col(idx_col).alias("idx"),
                F.coalesce(F.md5(text_col), F.lit("null")).alias("h"),
            ).alias("_t"),
        )
        .groupBy("_conv")
        .agg(
            F.count("*").cast("int").alias("n_turns"),
            F.md5(
                F.concat_ws(
                    "", F.transform(F.array_sort(F.collect_list("_t")), lambda t: t["h"])
                )
            ).alias("digest"),
        )
    )
    # keeper via a window min over the digest partition: one shuffle on
    # digest, no second aggregate + join back (per_conv rows are tiny —
    # conv id + digest — so the extra sort inside the window is cheap)
    keeper = F.min("_conv").over(Window.partitionBy("digest"))
    return per_conv.select(
        F.col("_conv").alias(conv_col),
        "n_turns",
        "digest",
        keeper.alias("keeper_conv"),
        (F.col("_conv") == keeper).alias("is_keeper"),
    )
