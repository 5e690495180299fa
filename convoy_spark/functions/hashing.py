"""Cross-engine deterministic hashing.

The dedup/fingerprint operators (MinHash, SimHash, winnowing) need a
hash that Spark and the DuckDB oracle compute **identically**, or the
driver's value-hash comparison can never pass. Spark's ``xxhash64`` and
DuckDB's ``hash`` disagree, so we build one from ``md5`` (bit-identical
everywhere): take the first 15 hex digits (60 bits — fits signed int64
with headroom) and parse as an integer.

MinHash permutations are the classic universal family
``(a·x + b) mod P`` with ``P = 2^31 − 1`` (Mersenne prime). Operands
are reduced mod P first so every product stays under 2^62 — no int64
overflow on either engine, hence identical results. Parameters a_i/b_i
are derived from the permutation index with Knuth's multiplicative
constant, not drawn from an RNG: reproducibility across engines, runs
and cluster sizes is a feature (cf. SURVEY §5 — the driver hashes
values).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = (1 << 31) - 1
_KNUTH = 2654435761

# Whitespace tokenization pattern, shared verbatim by the Spark
# operators and the DuckDB oracle SQL. Written as an explicit
# character class because ``\s`` itself is engine-dependent: Java
# regex ``\s`` matches [ \t\n\x0B\f\r] while DuckDB's RE2 ``\s``
# excludes vertical tab — a \x0b adjacent to a token would tokenize
# differently engine vs oracle and fail the driver's value-hash check
# (round-2 advice). Java and RE2 parse this exact literal identically
# (\x0b is a two-hex-digit escape in both).
WS_SPLIT = r"[ \t\n\x0b\f\r]+"


def hash60(col: Column) -> Column:
    """Deterministic 60-bit hash of a string column (non-negative)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def sql_hash60(expr: str) -> str:
    """DuckDB fragment identical to :func:`hash60`."""
    return f"CAST(concat('0x', substring(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_params(n: int) -> list[tuple[int, int, int]]:
    """(i, a_i, b_i) for n permutations — same table inlined on both
    engines."""
    out = []
    for i in range(n):
        a = ((i + 1) * _KNUTH + 1) % MERSENNE31
        b = ((i + 1) * 40503 + 17) % MERSENNE31
        out.append((i, a or 1, b))
    return out


def perm_hash(h: Column, a: Column, b: Column) -> Column:
    """(a·(h mod P) + b) mod P — the permuted hash, overflow-free."""
    return (a * (h % MERSENNE31) + b) % MERSENNE31


def sql_perm_hash(h: str, a: str, b: str) -> str:
    return f"(({a}) * (({h}) % {MERSENNE31}) + ({b})) % {MERSENNE31}"
