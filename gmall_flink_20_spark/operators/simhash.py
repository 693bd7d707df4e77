"""SimHash fingerprinting + hamming-distance near-dup detection.

Beyond-reference scope (training-data pipeline). 32-bit SimHash built
entirely from row-local array expressions over the token array:

    bit b of doc = sign( Σ_tokens (bit b of md5(token)) ? +1 : −1 )

The per-token bit comes from the md5 hex nibbles (both engines produce
identical lowercase hex, so the oracle agrees bit-for-bit). Production
would use 64/128-bit xxhash-based signatures — identical plan shape.

Near-dup pairs use the classic banding trick: with ≤ k bit flips, two
32-bit signatures still agree on ≥ 1 of k+1 bands, so banding the
signature into (k+1) 8-bit bands and equi-joining on (band_id, band_val)
finds every pair with hamming ≤ k (k ≤ 3 here); a bit_count(xor) filter
verifies exactly. One shuffle (the band join), uniform join keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._cache import eager_persist

__all__ = ["simhash32", "simhash_near_dup"]

_HEX = "0123456789abcdef"


def simhash32(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash: long) — 32-bit signature.

    Shape: explode distinct tokens → one md5 per row (codegen'd) → 32
    per-bit ±1 votes as flat CASE columns → 32 sums in one groupBy →
    row-local sign/pack. Nested per-bit lambdas would recompute the token
    hash 32× in interpreted mode; this formulation hashes once per token
    and stays inside whole-stage codegen end to end.

    bit b of md5 hex: nibble = instr('{hex}', substr(h, b DIV 4 + 1, 1))−1,
    vote_b = ((nibble >> (b % 4)) % 2) ? +1 : −1; signature packs
    sign(Σ votes) little-endian.
    """
    toks = f"array_distinct(split(trim({text_col}), '\\\\s+'))"
    exploded = df.select(
        F.col(id_col), F.explode(F.expr(f"transform({toks}, t -> md5(cast(t as binary)))")).alias("h")
    )
    vote_cols = [
        F.expr(
            f"CASE WHEN ((instr('{_HEX}', substring(h, {b // 4 + 1}, 1)) - 1) "
            f">> {b % 4}) % 2 = 1 THEN 1 ELSE -1 END"
        ).alias(f"v{b}")
        for b in range(32)
    ]
    packed = None
    for b in range(32):
        term = F.when(F.col(f"s{b}") >= 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        packed = term if packed is None else packed + term
    return (
        exploded.select(F.col(id_col), *vote_cols)
        .groupBy(id_col)
        .agg(*[F.sum(f"v{b}").alias(f"s{b}") for b in range(32)])
        .select(F.col(id_col), packed.alias("simhash"))
    )


def simhash_near_dup(
    sig_df: DataFrame,
    max_hamming: int = 1,
    id_col: str = "doc_id",
    sim_col: str = "simhash",
    bits: int = 32,
) -> DataFrame:
    """Pairs (doc_a, doc_b, hamming) with hamming(sig_a, sig_b) ≤ k.

    Bands = k+1 equal slices of the ``bits``-wide signature (pigeonhole:
    ≤ k flips leave one band untouched), so recall is exact for any k
    with bits % (k+1) == 0. Wider bands (small k) mean more selective
    buckets — k=1 at 32 bits gives 2×16-bit bands, 65536 buckets each.
    ``bits`` generalizes the machinery to other Hamming-space
    fingerprints (the 40-bit image dHash in multimodal.py reuses it).
    """
    bands = max_hamming + 1
    assert bits % bands == 0, "band width must divide the signature width"
    width = bits // bands
    mask = (1 << width) - 1
    outs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.shiftrightunsigned(F.col(sim_col), b * width).bitwiseAND(F.lit(mask)).alias("band_val"),
        )
        for b in range(bands)
    ]
    banded = sig_df.select(
        F.col(id_col), F.col(sim_col), F.explode(F.array(*outs)).alias("bk")
    ).select(id_col, sim_col, F.col("bk.band_id").alias("band_id"), F.col("bk.band_val").alias("band_val"))
    # self-join would otherwise recompute the signature lineage twice
    banded = eager_persist(banded)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(
                F.col(f"a.{sim_col}").bitwiseXOR(F.col(f"b.{sim_col}"))
            ).cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
