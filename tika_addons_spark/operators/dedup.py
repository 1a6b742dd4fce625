"""Deduplication operators for training-data pipelines.

Five variants, each designed scale-first (the candidate-generation step is
always a bucket equi-join, never an O(n²) cross join over the corpus):

- exact:       sha256(text) groupBy — one shuffle, map-side combine.
- minhash_lsh: shingles → minhash signature → bands → bucket self-join.
- simhash:     64-bit sign-vote fingerprint → Hamming-ball candidate pairs
               via rotated-prefix bucketing.
- ngram_jaccard: token-set Jaccard verified on blocked candidate pairs.
- (embedding cosine near-dup lives in operators/similarity.py)

The reference's only dedup is Set-based exact key dedup
(``GithubScraper.java:171-218`` seen-sets, A15) and bag-of-words equality
grouping (``MultiComparer.java:135-148``, J3) — these generalize it to the
near-dup family a 100 TB corpus needs.

MinHash/simhash signatures are computed in a vectorized pandas UDF (numpy
matrix ops per batch, no per-row Python); candidate joins and Jaccard
verification are pure DataFrame ops so Catalyst/AQE handle distribution.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.stats import tokens_col

# ---------------------------------------------------------------------------
# exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------
def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical texts: (digest, keep_id, n_copies, ids).
    keep_id = min id (deterministic survivor)."""
    return (
        df.select(F.col(id_col).alias("id"), F.sha2(F.col(text_col), 256).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min("id").alias("keep_id"),
            F.count("*").alias("n_copies"),
            F.sort_array(F.collect_list("id")).alias("ids"),
        )
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Survivors only — the classic exact-dedup pass."""
    w_digest = F.sha2(F.col(text_col), 256)
    from pyspark.sql import Window

    w = Window.partitionBy(w_digest).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
_MERSENNE = (1 << 61) - 1


def _minhash_params(n_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=n_hashes, dtype=np.int64)
    return a, b


def _hash_strings(strings: list[str] | np.ndarray) -> np.ndarray:
    """Deterministic vectorized 64-bit string hashing (pd.util.hash_array —
    siphash with a fixed key, stable across processes/runs)."""
    if len(strings) == 0:
        return np.array([], dtype=np.uint64)
    return pd.util.hash_array(np.asarray(strings, dtype=object))


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Character k-shingle 64-bit hashes (vectorized, deterministic)."""
    if len(text) < k:
        text = text + " " * (k - len(text))
    shingles = [text[i : i + k] for i in range(len(text) - k + 1)]
    return np.unique(_hash_strings(shingles))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(id, signature array<long>) via a vectorized pandas UDF."""
    a, b = _minhash_params(n_hashes, seed)

    def batch(it):
        for pdf in it:
            sigs = []
            for t in pdf[text_col]:
                t = t if isinstance(t, str) else ""
                sh = _shingle_hashes(t.lower(), shingle_k).astype(np.int64)
                if len(sh) == 0:
                    sigs.append([0] * n_hashes)
                    continue
                # (n_hashes, n_shingles) affine hash, min per row
                vals = (a[:, None] * (sh[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
                sigs.append(vals.min(axis=1).tolist())
            yield pd.DataFrame({"id": pdf[id_col], "signature": sigs})

    schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType, False),
            T.StructField("signature", T.ArrayType(T.LongType()), False),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(batch, schema=schema)


def minhash_lsh_pairs(
    sigs: DataFrame, n_bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: explode (band, band-hash) keys, self-join per bucket.

    Scale path: the join key is (band, hash-of-band-slice) so only
    colliding docs meet — shuffle is proportional to candidates, not n²."""
    banded = sigs.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.sha2(
                        F.concat_ws(
                            ",",
                            F.slice(
                                "signature", i * rows_per_band + 1, rows_per_band
                            ).cast("array<string>"),
                        ),
                        256,
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


def minhash_jaccard_estimate(sigs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Estimated Jaccard = fraction of matching signature positions."""
    s1 = sigs.select(F.col("id").alias("id_a"), F.col("signature").alias("sig_a"))
    s2 = sigs.select(F.col("id").alias("id_b"), F.col("signature").alias("sig_b"))
    return (
        pairs.join(s1, "id_a")
        .join(s2, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda m: m,
                    )
                )
                / F.size("sig_a"),
                4,
            ).alias("est_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64
) -> DataFrame:
    """64-bit simhash: per-token FNV hash, sign-vote per bit — vectorized
    numpy inside a pandas UDF."""

    def batch(it):
        import re as _re

        tok = _re.compile(r"[^\W\d_]+", _re.UNICODE)
        powers = np.uint64(1) << np.arange(bits, dtype=np.uint64)
        for pdf in it:
            out = []
            for t in pdf[text_col]:
                t = t if isinstance(t, str) else ""
                toks = tok.findall(t.lower())
                if not toks:
                    out.append(0)
                    continue
                hs = _hash_strings(toks)
                bits_mat = ((hs[:, None] & powers[None, :]) != 0).astype(np.int32)
                votes = bits_mat.sum(axis=0) * 2 - len(toks)
                sig = np.uint64(0)
                for bpos in np.nonzero(votes > 0)[0]:
                    sig |= powers[bpos]
                out.append(int(np.int64(sig)))  # store as signed long
            yield pd.DataFrame({"id": pdf[id_col], "simhash": out})

    schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType, False),
            T.StructField("simhash", T.LongType(), False),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(batch, schema=schema)


def simhash_near_pairs(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Candidate pairs within a Hamming ball: 4×16-bit block bucketing
    (pigeonhole: ≤3 differing bits ⇒ at least one 16-bit block identical),
    then exact Hamming verify via bit_count(xor)."""
    blocks = sigs.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(0xFFFF)
                    for i in range(4)
                ]
            )
        ).alias("block_idx", "block_val"),
    )
    l, r = blocks.alias("l"), blocks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.block_idx") == F.col("r.block_idx"))
            & (F.col("l.block_val") == F.col("r.block_val"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


# ---------------------------------------------------------------------------
# token-set Jaccard on blocked candidates (SQL-expressible; oracle-checked)
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact token-set Jaccard over candidate pairs blocked on ``block_col``
    (language, domain, length bucket...). The block join bounds the pair
    count; at scale block on an LSH bucket instead of a natural key."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("block"),
        F.array_distinct(F.array_sort(tokens_col(text_col))).alias("toks"),
    )
    l, r = toks.alias("l"), toks.alias("r")
    inter = F.size(F.array_intersect(F.col("l.toks"), F.col("r.toks")))
    union = F.size(F.array_union(F.col("l.toks"), F.col("r.toks")))
    return (
        l.join(
            r,
            (F.col("l.block") == F.col("r.block")) & (F.col("l.id") < F.col("r.id")),
        )
        .filter(union > 0)  # both-empty pairs have undefined similarity
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(inter / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
