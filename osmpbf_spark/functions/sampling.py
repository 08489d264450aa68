"""Deterministic sampling for pipeline stages.

``sample(fraction, seed)`` on a DataFrame is partition-order-dependent
(Bernoulli per split), so two runs over differently-partitioned input —
or the same job at two cluster sizes — draw DIFFERENT rows. Training
steps that must be reproducible (e.g. the k-means sample feeding
``operators/knn.train_centroids``) need a sample that is a pure
function of the DATA: hash the key, keep a residue class.

No reference counterpart (sampling is pipeline-tier); the determinism
contract matches the engine-wide rule that every operator's output is
independent of partitioning and cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_sample(df: DataFrame, key_col: str, m: int, *,
                r: int = 0) -> DataFrame:
    """Keep rows whose ``xxhash64(key) mod m == r`` — a deterministic
    ~1/m sample, identical at any partitioning or cluster size, and
    cheap (one codegen'd hash per row, filter fully pushed into the
    scan pipeline). Different residues ``r`` give DISJOINT samples, so
    train/holdout splits are one parameter apart. Seeded variants
    (vary the hashed expression, e.g. ``hash_sample(df, "id", m)`` vs
    a salted key column) never correlate the way ``sample(seed=)``
    re-draws do."""
    if m < 1:
        raise ValueError(f"modulus m must be >= 1, got {m}")
    if not 0 <= r < m:
        raise ValueError(f"residue {r} outside [0, {m})")
    return df.filter(F.pmod(F.xxhash64(F.col(key_col)), F.lit(m))
                     == F.lit(r))
