"""Split-block Bloom filter primitives shared by the runtime
bloom-pruned semi join (``operators/joins.py``) and the per-file bloom
data-skipping sidecars (``plans/versioned.py``).

Design: parquet-format's SBBF is the public reference for the layout —
one hash selects a 64-bit block, a second hash's 6-bit slices select
bits WITHIN the block. Everything the executors run is whole-stage-
codegen arithmetic (two xxhash64 calls, shifts, ORs); the pure-Python
twin below reproduces the exact same (block, mask) from the two raw
hashes so a DRIVER-side membership probe (file skipping at plan time)
agrees bit-for-bit with the JVM build side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

BLOOM_BITS_PER_BLOCK = 6  # bits set per key inside its 64-bit block
_MASK64 = (1 << 64) - 1


def bloom_block_and_mask(key, nblocks: int):
    """(block index, in-block bit mask) Columns for a key expression.
    JVM-side: ``pmod(xxhash64(key, 1), nblocks)`` picks the block,
    ``xxhash64(key, 2)``'s 6-bit slices pick the bits."""
    block = F.pmod(F.xxhash64(key, F.lit(1)), F.lit(nblocks))
    h2 = F.xxhash64(key, F.lit(2))
    mask = None
    for j in range(BLOOM_BITS_PER_BLOCK):
        bit = (
            F.call_function("shiftright", h2, F.lit(6 * j))
            .bitwiseAND(F.lit(63))
            .cast("int")
        )
        term = F.call_function("shiftleft", F.lit(1).cast("long"), bit)
        mask = term if mask is None else mask.bitwiseOR(term)
    return block, mask


def block_and_mask_from_hashes(h1: int, h2: int, nblocks: int) -> tuple[int, int]:
    """Pure-Python twin of ``bloom_block_and_mask`` given the two raw
    ``xxhash64`` values (as SIGNED 64-bit ints, exactly as Spark
    returns them). Python's ``%`` on a positive modulus matches Spark's
    ``pmod``, and Python's ``>>`` on a signed int matches Java's
    arithmetic ``>>`` for the low-6-bit slices — so the driver-side
    probe and the JVM build side agree on every key."""
    block = h1 % nblocks
    mask = 0
    for j in range(BLOOM_BITS_PER_BLOCK):
        mask |= 1 << ((h2 >> (6 * j)) & 63)
    return block, mask & _MASK64
