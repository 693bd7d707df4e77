"""Sequence packing: assign documents to fixed-length training sequences.

The standard "concatenate-and-chunk" packing used to build LLM training
batches: within a shard, documents are laid end-to-end in a deterministic
order and the token stream is cut into ``seq_len``-token sequences; each
document lands in the sequence span ``[seq_first, seq_last]``.

Plan shape for 100 TB: the only non-row-local step is one running sum
per shard (``Window.partitionBy(shard).orderBy(id)``) — a single
exchange on the shard key, with the sort local to each partition.
Parallelism is the shard count, which is the natural packing unit anyway
(training pipelines pack per input shard so shard files stay
independently reproducible); a global pack order would serialize the
prefix-sum and is deliberately not offered.

(Beyond-reference scope: training-data pipeline surface from the build
brief; the reference has no corpus operators.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences", "chunk_documents"]


def pack_sequences(
    df: DataFrame,
    seq_len: int = 256,
    shard_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-shard concat-and-chunk packing plan.

    Emits one row per document: whitespace token count, the document's
    first token offset in its shard's concatenated stream, and the first
    and last ``seq_len``-token sequence the document overlaps. All
    arithmetic is exact integer (``DIV``), so the DuckDB oracle is
    bit-identical.
    """
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    base = df.select(
        F.col(id_col), F.col(shard_col), n_tokens.alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = base.withColumn("tok_end", F.sum("n_tokens").over(w))
    return cum.select(
        F.col(id_col),
        F.col(shard_col),
        F.col("n_tokens"),
        (F.col("tok_end") - F.col("n_tokens")).alias("tok_start"),
        F.expr(f"CAST((tok_end - n_tokens) DIV {seq_len} AS BIGINT)").alias("seq_first"),
        F.expr(f"CAST((tok_end - 1) DIV {seq_len} AS BIGINT)").alias("seq_last"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping fixed-size token windows per document — the chunking
    step feeding embedding/indexing pipelines (stride < chunk_tokens
    gives the standard sliding overlap; the final chunk is short rather
    than padded).

    Chunk starts are multiples of ``stride`` below the token count, so
    every token is covered and chunk_id is stable under re-runs. Output
    carries the chunk's md5 (content-addressable id for downstream
    dedup/indexing) instead of the text itself.

    Purely row-local: one explode, no shuffle at all — scales with input
    splits.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col), toks.alias("toks")).filter(F.size("toks") >= 1)
    n = F.size("toks").cast("long")
    exploded = base.select(
        F.col(id_col),
        F.col("toks"),
        n.alias("n_tokens"),
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.expr(f"CAST((size(toks) - 1) DIV {stride} AS BIGINT)"),
            )
        ).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride
    chunk_len = F.least(F.lit(chunk_tokens).cast("long"), F.col("n_tokens") - start)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        chunk_len.alias("chunk_len"),
        F.md5(
            F.concat_ws(
                " ", F.slice(F.col("toks"), (start + 1).cast("int"), chunk_len.cast("int"))
            ).cast("binary")
        ).alias("chunk_md5"),
    )
