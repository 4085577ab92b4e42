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
    return _threshold_sample(
        docs,
        {k: int(v * _BUCKETS) for k, v in fractions.items()},
        strata_col, key_col, seed, int(default_fraction * _BUCKETS),
    )


def _threshold_sample(
    docs: DataFrame,
    thresholds_ppm: dict[str, int],
    strata_col: str,
    key_col: str,
    seed: int,
    default_ppm: int = 0,
) -> DataFrame:
    """Integer-ppm core of stratified_sample: keep iff hash-bucket < ppm."""
    thresh = F.coalesce(
        F.create_map(
            *[x for k, v in thresholds_ppm.items()
              for x in (F.lit(k), F.lit(v))]
        )[F.col(strata_col)],
        F.lit(default_ppm),
    )
    return docs.filter(sample_hash_col(F.col(key_col), seed) < thresh)


# ---------------------------------------------------------------------------
# Temperature sampling (multinomial alpha-smoothing)
# ---------------------------------------------------------------------------


def temperature_rates_ppm(
    counts: dict[str, int], alpha: float = 0.5, budget_frac: float = 0.5
) -> dict[str, int]:
    """Per-stratum keep rates (ppm) for temperature-based corpus mixing —
    the multinomial alpha-smoothing of mC4 / XLM-R (Conneau et al. 2020,
    §5.1 "Language sampling"): sample strata proportionally to
    p_l ∝ (n_l / N)^alpha, which up-weights tail languages relative to
    natural frequency (alpha=1 is natural, alpha->0 is uniform).

    rate_l = min(1, T * p_l / n_l) with T = budget_frac * N the target kept
    total, floored to integer ppm for the deterministic key-hash filter.

    Pure-Python on a counts dict because strata counts are a bounded
    driver-side object (#languages, same stance as DSIR's 1024 floats) and
    because reproducibility demands a FIXED float summation order: the
    normalizer folds stratum weights in sorted-key order, which the DuckDB
    oracle mirrors with list_reduce(list(... ORDER BY lang)). alpha=0.5
    uses math.sqrt (correctly rounded IEEE in every engine); other alphas
    go through pow, whose last-ulp rounding is libm-specific — fine for
    production, not for a hash-exact oracle."""
    import math

    keys = sorted(counts)
    n_total = sum(counts[k] for k in keys)  # exact int
    if not keys or n_total == 0:
        return {k: 0 for k in keys}
    powed = {
        k: (math.sqrt(counts[k]) if alpha == 0.5 else float(counts[k]) ** alpha)
        for k in keys
    }
    norm = 0.0
    for k in keys:  # fixed fold order (see docstring)
        norm += powed[k]
    target = budget_frac * n_total
    return {
        k: int(math.floor(min(1.0, target * (powed[k] / norm) / counts[k]) * _BUCKETS))
        for k in keys
    }


def temperature_sample(
    docs: DataFrame,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    seed: int = 0,
) -> DataFrame:
    """Deterministic temperature-sampled corpus mix: one tiny groupBy for
    the per-stratum counts (bounded collect: #strata rows), rates from
    temperature_rates_ppm, then the same narrow key-hash filter as
    stratified_sample — reproducible, retry-stable, shuffle-free on the
    corpus itself."""
    counts = {
        r[0]: r[1]
        for r in docs.groupBy(strata_col).count().collect()
        if r[0] is not None
    }
    ppm = temperature_rates_ppm(counts, alpha=alpha, budget_frac=budget_frac)
    return _threshold_sample(docs, ppm, strata_col, key_col, seed)
