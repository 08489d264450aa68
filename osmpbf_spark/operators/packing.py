"""Sequence packing: lay documents end-to-end and split into
fixed-size token windows (the standard pretraining "pack-and-split" —
concatenate the token stream, cut every ``budget`` tokens, so every
training sequence is exactly full and a document may straddle a cut).

Spark-first shape: a deterministic hash stratum bounds the sequential
region (token order must be sequential SOMEWHERE; making it sequential
per stratum instead of globally keeps the cumulative sum a per-stratum
window — ONE shuffle — and makes results independent of cluster size,
the same reproducibility argument as ``functions/sampling.hash_sample``).
Within a stratum documents order by id; the window cumsum gives each
document its [start, end) token interval; the bins it overlaps are a
row-local ``sequence`` + ``posexplode``. No Python anywhere — every step
is a Catalyst built-in, and the whole computation is expressible in
ANSI SQL (the pytest oracle runs the identical DuckDB rendering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import poly_hash_sql, tokens_sql


def pack_sequences(docs: DataFrame, budget: int, *, n_strata: int = 64,
                   text_col: str = "text", id_col: str = "doc_id",
                   token_count_col: str | None = None) -> DataFrame:
    """Assign every document its slice positions in fixed-``budget``
    token windows → one row per (document × overlapped window):

    - ``stratum``     — the dual-rendered polynomial hash of the id
      mod n_strata (NOT xxhash64: the DuckDB oracle must compute the
      identical stratum, and the poly hash is the one hash both
      engines share): the independent packing stream;
    - ``bin_no``      — window index within the stratum;
    - ``tok_start``   — first token of this document inside this bin
      (offset WITHIN the document);
    - ``tok_len``     — how many of the document's tokens land in this
      bin (a straddling document appears in consecutive bins, lengths
      summing to its token count);
    - ``fill_start``  — where in the bin the slice begins (0-based).

    Zero-token documents are dropped (they contribute nothing to any
    window). Every bin except each stratum's last is exactly full —
    the property tests assert both invariants. ``token_count_col``
    skips tokenization when counts are precomputed upstream (the
    curation job's ``n_tokens``).

    100 TB notes: one shuffle (the per-stratum window sort); bins per
    stratum ≈ stratum_tokens / budget; raise ``n_strata`` so each
    stratum's token stream fits a task comfortably — strata are
    embarrassingly parallel and results don't change with cluster
    size, only with (budget, n_strata)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    n = (F.col(token_count_col) if token_count_col
         else F.expr(f"size({tokens_sql(text_col)})"))
    d = (docs.select(F.col(id_col), n.cast("long").alias("n_tokens"))
         .filter(F.col("n_tokens") > 0)
         .withColumn("stratum", F.pmod(
             F.expr(poly_hash_sql(f"CAST({id_col} AS STRING)")),
             F.lit(n_strata))))
    w = (Window.partitionBy("stratum").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = (d.withColumn("tok_end", F.sum("n_tokens").over(w))
         .withColumn("tok_begin", F.col("tok_end") - F.col("n_tokens")))
    first_bin = F.floor(F.col("tok_begin") / budget)
    last_bin = F.floor((F.col("tok_end") - 1) / budget)
    d = d.select(
        id_col, "n_tokens", "stratum", "tok_begin",
        F.posexplode(F.sequence(first_bin, last_bin))
        .alias("_i", "bin_no"))
    bin_lo = F.col("bin_no") * budget
    slice_lo = F.greatest(F.col("tok_begin"), bin_lo)
    slice_hi = F.least(F.col("tok_begin") + F.col("n_tokens"),
                       bin_lo + budget)
    return d.select(
        id_col, "stratum",
        F.col("bin_no").cast("long").alias("bin_no"),
        (slice_lo - F.col("tok_begin")).cast("long").alias("tok_start"),
        (slice_hi - slice_lo).cast("long").alias("tok_len"),
        (slice_lo - bin_lo).cast("long").alias("fill_start"))


def pack_sequences_oracle_sql(budget: int, *, n_strata: int = 64,
                              dialect: str = "duckdb") -> str:
    """The identical computation as ANSI SQL over a ``documents`` view
    (DuckDB rendering) — the pytest oracle. Kept next to the operator
    so the two renderings evolve together (CLAUDE.md single-source
    rule)."""
    toks = tokens_sql("text", dialect)
    return f"""
WITH n AS (
  SELECT doc_id, CAST(len({toks}) AS BIGINT) AS n_tokens,
         {poly_hash_sql("CAST(doc_id AS VARCHAR)", dialect)}
           % {n_strata} AS stratum
  FROM documents
), c AS (
  SELECT doc_id, n_tokens, stratum,
         SUM(n_tokens) OVER (PARTITION BY stratum ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS tok_end
  FROM n WHERE n_tokens > 0
), e AS (
  SELECT doc_id, n_tokens, stratum, tok_end - n_tokens AS tok_begin,
         u.bin_no
  FROM c, UNNEST(range(CAST(FLOOR((tok_end - n_tokens) / {budget})
                            AS BIGINT),
                       CAST(FLOOR((tok_end - 1) / {budget})
                            AS BIGINT) + 1)) AS u(bin_no)
)
SELECT doc_id, stratum, bin_no,
       GREATEST(tok_begin, bin_no * {budget}) - tok_begin AS tok_start,
       LEAST(tok_begin + n_tokens, (bin_no + 1) * {budget})
         - GREATEST(tok_begin, bin_no * {budget}) AS tok_len,
       GREATEST(tok_begin, bin_no * {budget}) - bin_no * {budget}
         AS fill_start
FROM e
"""
