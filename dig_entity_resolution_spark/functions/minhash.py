"""MinHash signatures + LSH banding (SURVEY.md §2.B B10/B11).

Pure native Column expressions — the signature for permutation i is
min over shingles s of hash(i || ':' || s). Two hash families:

  * hash_fn="xxhash64" (default) — fastest JVM path for production blocking.
  * hash_fn="md5" — bit-identical to DuckDB's
    ('0x'||substring(md5(...),1,15))::BIGINT, making the whole
    MinHash → banding → bucket-join path oracle-checkable by the driver.

Banding (Leskovec/Rajaraman/Ullman MMDS ch.3): split the k-long signature
into b bands of r rows; the block key is hash of the band slice. Two docs
collide in a band iff the r minhashes in that band are all equal.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import md5_long


def _perm_hash(shingle: Column, perm: int, hash_fn: str) -> Column:
    seeded = F.concat(F.lit(f"{perm}:"), shingle)
    if hash_fn == "xxhash64":
        return F.xxhash64(seeded)
    if hash_fn == "md5":
        return md5_long(seeded)
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def minhash_signature(
    shingles_col: Column | str, num_perm: int = 32, hash_fn: str = "xxhash64"
) -> Column:
    """array<long> of num_perm min-hashes over a shingle array. (B10)

    Empty shingle arrays produce an array of NULLs (array_min of empty);
    callers should filter empty docs first.
    """
    c = F.col(shingles_col) if isinstance(shingles_col, str) else shingles_col
    mins = [
        F.array_min(F.transform(c, lambda s, i=i: _perm_hash(s, i, hash_fn)))
        for i in range(num_perm)
    ]
    return F.array(*mins)


def lsh_band_keys(
    sig_col: Column | str, bands: int, rows: int, hash_fn: str = "xxhash64"
) -> Column:
    """array<struct<band_id:int, band_hash:long>> from a signature. (B11)

    band_hash = hash over the concatenated r values of the band, prefixed
    with the band id so different bands never collide.
    """
    c = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    out = []
    for b in range(bands):
        band_slice = F.slice(c, b * rows + 1, rows)
        joined = F.concat_ws("|", F.transform(band_slice, lambda v: v.cast("string")))
        key_src = F.concat(F.lit(f"band{b}|"), joined)
        if hash_fn == "xxhash64":
            h = F.xxhash64(key_src)
        else:
            h = md5_long(key_src)
        out.append(F.struct(F.lit(b).alias("band_id"), h.alias("band_hash")))
    return F.array(*out)


def simhash64(tokens_col: Column | str, hash_fn: str = "xxhash64") -> Column:
    """64-bit SimHash (Charikar 2002) of a token array, as BIGINT. (dedup op)

    bit i of the fingerprint is 1 iff sum over tokens of (2*bit_i(h)-1) > 0,
    h = 60-bit token hash. Pure native: aggregate over the token array with a
    64-slot accumulator encoded as array<int>.
    """
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    if hash_fn == "xxhash64":
        th = lambda t: F.xxhash64(t)  # noqa: E731
    else:
        th = lambda t: md5_long(t)  # noqa: E731
    # per-token contribution vector: for bit j, +1 if set else -1
    bits = F.sequence(F.lit(0), F.lit(59))
    contrib = lambda t: F.transform(  # noqa: E731
        bits,
        lambda j: (F.shiftright(th(t), j).bitwiseAND(F.lit(1)) * 2 - 1).cast("long"),
    )
    acc = F.aggregate(
        c,
        F.array_repeat(F.lit(0).cast("long"), 60),
        lambda a, t: F.zip_with(a, contrib(t), lambda x, y: x + y),
    )
    # fold bits into a single bigint: sum of 2^j where acc[j] > 0
    idx = F.sequence(F.lit(0), F.lit(59))
    return F.aggregate(
        F.zip_with(
            acc,
            idx,
            lambda v, j: F.when(v > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda s, v: s + v,
    )


def hamming64(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two 64-bit fingerprints: popcount(a XOR b)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    x = ca.bitwiseXOR(cb)
    bits = F.sequence(F.lit(0), F.lit(63))
    return F.aggregate(
        F.transform(bits, lambda j: F.shiftright(x, j).bitwiseAND(F.lit(1))),
        F.lit(0).cast("long"),
        lambda s, v: s + v,
    ).cast("int")
