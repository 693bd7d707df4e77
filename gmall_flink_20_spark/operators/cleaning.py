"""Text cleaning for training-data pipelines: HTML stripping, PII
redaction, whitespace normalization.

All pure codegen column expressions (``regexp_replace`` /
``regexp_count`` — JVM-side, zero shuffle, scale-linear). Patterns are
deliberately written in the regex subset Java and RE2 share (no
backreferences, no lookaround, no ``\\b``), so the DuckDB oracles run the
byte-identical patterns — cross-engine parity of the *semantics*, not
just the plumbing.

No reference parity: the reference has no text operators; this extends
the training-data pipeline (build brief). The synthetic corpus contains
no markup, so the gated query injects deterministic doc_id-derived
HTML/PII on both engines before cleaning — the oracle then verifies the
actual regex behavior, not a no-op.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "EMAIL_RE",
    "PHONE_RE",
    "IP_RE",
    "TAG_RE",
    "strip_html",
    "redact_pii",
    "normalize_ws",
    "clean_documents",
    "dedup_lines",
]

# Java ∩ RE2 regex subset — keep in sync with oracles.py
TAG_RE = "<[^>]+>"
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "[0-9]{3}-[0-9]{3,4}-[0-9]{4}"
IP_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&nbsp;", " ")]


def strip_html(col: Column) -> Column:
    """Tags → space, basic entities unescaped, whitespace collapsed."""
    out = F.regexp_replace(col, TAG_RE, " ")
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return normalize_ws(out)


def redact_pii(col: Column) -> Column:
    """Emails/phones/IPs → typed placeholder tokens. Order matters and is
    fixed (email first: its local part may contain digits that the
    narrower patterns would otherwise bite into)."""
    out = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    out = F.regexp_replace(out, IP_RE, "<IP>")
    return out


def normalize_ws(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, "\\s+", " "))


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-global line dedup (the C4 pipeline's repeated-line removal,
    Raffel et al. 2020 §2.2): every line keeps exactly its FIRST corpus
    occurrence — ordered by (doc id, position) — and later copies are cut
    from their documents. Documents whose every line was seen earlier
    drop out entirely.

    Plan shape for 100 TB: lines shuffle once on their md5 (the
    first-occurrence window), survivors shuffle once on doc id for
    reassembly — both keyed, no cross-key state, no skew beyond genuinely
    viral lines (and a line dominating the corpus is exactly what this
    op deletes). The md5 keeps shuffle bytes flat regardless of line
    length; an md5 collision would merge two distinct lines, which both
    engines would do identically (~2^-64, documented not handled).

    Emits (id, text) with ≥1 surviving line, reassembled in original
    order with ``sep``.
    """
    from pyspark.sql import Window as W

    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(sep))).alias("pos", "line"),
    ).withColumn("h", F.md5(F.col("line").cast("binary")))
    first = F.row_number().over(W.partitionBy("h").orderBy(F.col(id_col), F.col("pos")))
    kept = lines.withColumn("rn", first).filter(F.col("rn") == 1)
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "line"))).alias("parts")
        )
        .select(
            F.col(id_col),
            F.concat_ws(sep, F.transform("parts", lambda p: p["line"])).alias("text"),
        )
    )


def clean_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The standard cleaning pass: count PII hits, strip markup, redact.
    Emits (id, clean_text, n_emails, n_phones, n_ips, had_html)."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        redact_pii(strip_html(c)).alias("clean_text"),
        F.regexp_count(c, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(c, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(c, F.lit(IP_RE)).cast("long").alias("n_ips"),
        (F.regexp_count(c, F.lit(TAG_RE)) > 0).cast("int").alias("had_html"),
    )
