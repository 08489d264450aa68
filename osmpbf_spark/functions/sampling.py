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
from ..session import local_relation


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


# 2^30 — the fixed denominator for fractional hash thresholds: rate is
# quantized to ~1e-9, and a row's keep-decision is monotone in rate
# (same hash, higher threshold ⇒ superset), so lower-budget samples
# NEST inside higher-budget ones
HASH_FRAC_DENOM = 1 << 30


def weighted_sample(df: DataFrame, key_col: str, rate,
                    *, salt: str = "") -> DataFrame:
    """Keep each row with probability ``rate`` (a float column name or a
    Python float in [0, 1]) — deterministically: the decision is
    ``pmod(xxhash64(key, salt), 2^30) < rate·2^30``, a pure function of
    the key. Unlike ``df.sample``: identical at any partitioning or
    cluster size, and MONOTONE in rate (rate=0.1 rows ⊆ rate=0.3 rows
    for the same salt — budget sweeps reuse their smaller runs).
    Different ``salt`` values give independent draws."""
    thresh = (F.col(rate) if isinstance(rate, str) else F.lit(float(rate)))
    h = F.pmod(F.xxhash64(F.col(key_col), F.lit(salt)),
               F.lit(HASH_FRAC_DENOM))
    return df.filter(h < (thresh * HASH_FRAC_DENOM).cast("long"))


def mix_corpus(docs: DataFrame, category_col: str, token_col: str,
               target_fracs: dict, total_tokens: int, *,
               key_col: str = "doc_id", salt: str = ""):
    """Deterministic data-mixing: sample ``docs`` so each category
    contributes ≈ ``target_fracs[cat] · total_tokens`` tokens — the
    "mixture weights" step of a training-data pipeline (e.g. 30% web /
    30% code / 40% books at a 500B-token budget).

    Returns ``(sampled_df, report)``. Per-category sampling rate =
    min(1, wanted / available) over ONE small aggregate (rows =
    #categories, driver-side metadata); the row filter is then a
    broadcast join on the category plus the row-local
    :func:`weighted_sample` hash threshold — payloads never shuffle,
    and the whole pass is scan + filter at any scale. ``report`` maps
    each category to {"available", "wanted", "rate", "expected"} with
    ``shortfall`` > 0 when the category simply does not have enough
    tokens (rate clamps at 1.0; re-balance the targets or accept the
    smaller corpus — silent up-weighting of other categories would
    change the mixture, so it is NOT done).

    Sampling is by document (category fractions hold in expectation;
    exact-token packing is :mod:`..operators.packing`'s job downstream)
    and monotone in ``total_tokens``: a 100B-token mix is a subset of
    the 500B one, so budget ablations share data."""
    fracs = {k: float(v) for k, v in target_fracs.items()}
    bad = {k: v for k, v in fracs.items() if v < 0}
    if bad:
        raise ValueError(f"negative target fractions: {bad}")
    if sum(fracs.values()) > 1.0 + 1e-9:
        raise ValueError(
            f"target fractions sum to {sum(fracs.values()):.4f} > 1")
    avail = {r["cat"]: r["toks"] for r in
             (docs.groupBy(F.col(category_col).alias("cat"))
              .agg(F.sum(token_col).alias("toks")).collect())}
    report = {}
    for cat, frac in fracs.items():
        a = int(avail.get(cat, 0) or 0)
        wanted = frac * total_tokens
        rate = 1.0 if a == 0 else min(1.0, wanted / a)
        report[cat] = {
            "available": a,
            "wanted": int(wanted),
            "rate": rate,
            "expected": int(min(wanted, a)),
            "shortfall": int(max(0, wanted - a)),
        }
    spark = docs.sparkSession
    rates = F.broadcast(local_relation(
        spark, [(cat, report[cat]["rate"]) for cat in fracs],
        f"{category_col} string, _mix_rate double"))
    sampled = (docs.join(rates, category_col)
               .transform(lambda d: weighted_sample(
                   d, key_col, "_mix_rate", salt=salt))
               .drop("_mix_rate"))
    return sampled, report
