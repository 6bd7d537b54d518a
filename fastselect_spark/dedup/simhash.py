"""SimHash near-duplicate detection.

Signature: 60-bit SimHash over md5-derived token hashes, computed in a
vectorized Arrow pandas UDF (bit-matrix accumulation in NumPy — the
designated escape hatch where pure SQL bit-unpacking would be unreadable
and slower). The token hash is the 60-bit md5 prefix (int of the first 15
hex chars) so every stage — token hash, per-bit vote, signature, banding,
Hamming verify — is reproducible in ANSI SQL on an independent engine
(the driver-contract DuckDB oracle recomputes the whole pipeline).

Candidate generation: band the 60-bit signature into 4 × 15-bit chunks
(any pair within Hamming distance 3 shares at least one intact chunk —
pigeonhole), bucket self-join, verify with JVM-side ``bit_count(a XOR b)``.
For max_hamming > 3 the pigeonhole guarantee lapses: the output is then
the DETERMINISTIC banded subset (pairs sharing >=1 intact chunk), which is
what the SQL oracle replicates.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

SIG_BITS = 60
_N_BANDS = 4  # 4 x 15-bit chunks of the 60-bit signature
_CHUNK_BITS = SIG_BITS // _N_BANDS


def _token_hash60(tok: str) -> int:
    """60-bit md5-prefix token hash — matches
    CAST('0x'||substr(md5(tok),1,15) AS BIGINT) in DuckDB and
    conv(substring(md5(tok),1,15),16,10) in Spark SQL."""
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)


def _simhash_series(texts: pd.Series) -> pd.Series:
    out = np.empty(len(texts), dtype=np.int64)
    bit_idx = np.arange(SIG_BITS, dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = ("" if t is None else t).lower().split()
        if not toks:
            out[i] = 0
            continue
        hashes = np.array([_token_hash60(tok) for tok in toks], dtype=np.uint64)
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

    Exact for max_hamming <= 3 with 4 bands (pigeonhole guarantee); a
    deterministic banded subset above that."""
    from fastselect_spark.dedup.minhash import ensure_parallelism

    sig = add_simhash(ensure_parallelism(df), text_col).select(id_col, "simhash")
    chunks = [
        F.shiftrightunsigned(F.col("simhash"), _CHUNK_BITS * b)
        .bitwiseAND(F.lit((1 << _CHUNK_BITS) - 1))
        .alias(f"c{b}")
        for b in range(_N_BANDS)
    ]
    # both self-join sides read the banded table; persist so the pandas-UDF
    # signature computes once, not once per side (4 small rows per doc)
    banded = sig.select(
        id_col, "simhash", F.posexplode(F.array(*chunks)).alias("band", "chunk")
    ).persist()
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
    result = (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    # eager: materialize pairs, release the banded cache (persist hygiene)
    result = result.localCheckpoint()
    banded.unpersist()
    return result
