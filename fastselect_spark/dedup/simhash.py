"""SimHash near-duplicate detection.

Signature: 64-bit SimHash over token hashes, computed in a vectorized Arrow
pandas UDF (bit-matrix accumulation in NumPy — the designated escape hatch
where pure SQL bit-unpacking would be unreadable and slower). Candidate
generation: band the 64-bit signature into 16-bit chunks (any pair within
Hamming distance 3 shares at least one intact chunk — pigeonhole), bucket
self-join, verify with JVM-side ``bit_count(a XOR b)``.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_N_BANDS = 4  # 4 x 16-bit chunks of the 64-bit signature


def _token_hash64(tok: str) -> np.int64:
    """Deterministic 64-bit token hash from two CRC32 views."""
    b = tok.encode("utf-8")
    return np.int64(
        (np.uint64(zlib.crc32(b)) << np.uint64(32)) | np.uint64(zlib.crc32(b[::-1]))
    )


def _simhash_series(texts: pd.Series) -> pd.Series:
    out = np.empty(len(texts), dtype=np.int64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = ("" if t is None else t).lower().split()
        if not toks:
            out[i] = 0
            continue
        hashes = np.array([_token_hash64(tok) for tok in toks], dtype=np.uint64)
        bits = ((hashes[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
        votes = bits.sum(axis=0) * 2 - len(toks)  # +1 per set bit, -1 per clear
        sig = np.uint64(0)
        for b in np.where(votes > 0)[0]:
            sig |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sig)
    return pd.Series(out)


def add_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    # pandas_udf parses its return type against the active session, so the
    # UDF object is created lazily here rather than at import time.
    udf = pandas_udf(_simhash_series, "long")
    return df.withColumn("simhash", udf(F.col(text_col)))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs (id_a < id_b) with Hamming(simhash_a, simhash_b) <= max_hamming.

    Exact for max_hamming <= 3 with 4 bands (pigeonhole guarantee)."""
    sig = add_simhash(df, text_col).select(id_col, "simhash")
    chunks = [
        F.shiftrightunsigned(F.col("simhash"), 16 * b).bitwiseAND(F.lit(0xFFFF)).alias(
            f"c{b}"
        )
        for b in range(_N_BANDS)
    ]
    banded = sig.select(
        id_col, "simhash", F.posexplode(F.array(*chunks)).alias("band", "chunk")
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"), "band", "chunk"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"), "band", "chunk"
    )
    cand = (
        a.join(b, ["band", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
