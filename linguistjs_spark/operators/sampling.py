"""Deterministic sampling for training-mix construction.

``df.sample()`` is the wrong tool for corpus work at scale: it draws from a
per-partition RNG, so the selected set changes under task retry, AQE
repartitioning, or any upstream reordering — a resumed 10^12-doc job would
emit a *different* corpus. These operators sample by **key hash** instead:
a document is in the sample iff ``xxhash64(key, seed) mod 1e6 <
fraction*1e6``. That makes the sample

  * reproducible (same key + seed -> same decision, on any cluster layout),
  * stable under retries/resume (decision is a pure row function),
  * composable (disjoint seeds give independent samples; the same seed
    gives nested samples: fraction 0.1 is a subset of fraction 0.2),
  * shuffle-free (a narrow filter; Catalyst pushes it into the scan).

The reference has no sampling surface; this is a graft addition for the
training-data tier (SURVEY.md §2.8 posture: every operator must be safe to
re-run).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def sample_hash_col(key: Column, seed: int = 0) -> Column:
    """Uniform bucket in [0, 1e6) derived from xxhash64(key, seed).

    The seed rides as a literal second hash input (Spark's xxhash64 chains
    arguments), so distinct seeds give independent decisions per key. The
    cast pins the literal to the 8-byte hash path, matching the python twin
    (hash_twin.spark_xxhash64 with a plain int)."""
    return F.pmod(F.xxhash64(key, F.lit(seed).cast("long")), F.lit(_BUCKETS))


def deterministic_sample(
    docs: DataFrame, fraction: float, key_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per key hash (see module doc)."""
    return docs.filter(
        sample_hash_col(F.col(key_col), seed) < int(fraction * _BUCKETS)
    )


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (training-mix reweighting):
    ``fractions`` maps stratum value -> keep fraction; strata not listed
    keep ``default_fraction``. Narrow (no shuffle); the fractions dict is
    compiled into a literal map, so Zipf-skewed strata cost nothing extra —
    every row makes its own decision."""
    thresh = F.coalesce(
        F.create_map(
            *[x for k, v in fractions.items()
              for x in (F.lit(k), F.lit(int(v * _BUCKETS)))]
        )[F.col(strata_col)],
        F.lit(int(default_fraction * _BUCKETS)),
    )
    return docs.filter(sample_hash_col(F.col(key_col), seed) < thresh)
