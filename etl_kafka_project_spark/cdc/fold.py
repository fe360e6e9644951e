"""Per-batch LWW fold: collapse a micro-batch of change events to one
resolved action per key.

This is the engine's core operator — the vectorized replacement for the
reference's per-message keyed state surgery (``pyspark_interface.py:38-70``:
per-event ``filter(key == id)`` + ``withColumn`` per non-null field +
``union``). Semantics reproduced, per key, in LSN order:

* ``I``  — full-row insert/replace: the row becomes exactly the event's
  payload — columns the event does NOT carry (e.g. a late old-schema
  writer after an evolution, FIXTURES.md §3) reset to null, implemented
  as a *reset barrier*: value cells older than the newest I/D die,
* ``U``  — upsert; **non-null columns win** (column-granular LWW — the
  analog of the reference's "for each non-None field: withColumn",
  ``pyspark_interface.py:45-48``), null columns fall through to the
  previous value,
* ``D``  — delete; state after the delete is rebuilt only from events
  *newer than the delete* (tombstone-then-reinsert correctness),
* duplicate ``lsn`` — exact replay duplicates are no-ops
  (``dropDuplicates`` on the LSN authority; the analog of the reference's
  sink existence probe, ``tmdb_data_fetcher.py:163-166``).

Implementation notes (scale-first):

Instead of a ``row_number() OVER (PARTITION BY key ORDER BY lsn DESC)``
window — which must shuffle *every event* to its key's reducer and sort —
the fold is a pure **hash aggregation**: per column we take
``max(struct(lsn_if_nonnull, value))``, i.e. "the value whose last
non-null write has the highest LSN". ``max`` over a struct is associative
and commutative, so Catalyst plans a partial (map-side) aggregate before
the shuffle: a hot key with 10M events in a batch sends one partial row
per map task, not 10M rows, to the reducer. This is what makes the fold
skew-tolerant at 100 TB. A two-phase *salted* variant is still provided
(``fold_batch(salt=...)``) for the pathological case of a single key
dominating an entire batch AND a wide payload making partial-agg rows
expensive; correctness is identical because the aggregate is associative.

Cross-batch delivery contract: batches must be LSN-range-disjoint from
already-committed epochs except for verbatim re-delivery of old events
(which the merge's staleness guard drops). Within a batch, arbitrary
disorder is fine — lsn is the authority. Partial interleaving of NEW
events below a key's applied ``last_lsn`` across different epochs is out
of contract (the table stores one ``last_lsn`` per key, not one per
column) — the standard row-sequence LWW contract of lake CDC mergers.

The fold outputs one row per key:

    key..., _max_lsn, _last_d_lsn, _last_reset_lsn, _is_delete, _applied,
    <payload cols>

where ``_is_delete`` means the newest event for the key is a delete and
``_applied`` counts events folded (the generalization of the reference's
per-key ``touch_counter``, ``utils/schemas.py:29``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: LSN sentinel for "this column was never set by a surviving event".
NEVER = -1


def fold_batch(
    events: DataFrame,
    key_columns: Sequence[str],
    payload_columns: Sequence[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
    salt: int | None = None,
) -> DataFrame:
    """Collapse a batch of change events to one resolved row per key.

    Output columns: ``*key_columns, <payload> (value), <payload>_lsn
    (last-non-null write lsn, -1 if never), _max_lsn, _last_d_lsn,
    _is_delete, _applied``.

    ``salt``: if given, run the aggregation in two phases — first
    ``groupBy(key, pmod(lsn, salt))`` partials, then the final merge by
    key. Only worth it when one key dominates the batch; the plain path
    already does map-side partial aggregation.
    """
    key_columns = list(key_columns)
    payload_columns = [c for c in payload_columns if c not in key_columns]

    # Replay duplicates (same lsn re-delivered) are no-ops: lsn is the
    # global authority, one event per lsn.
    ev = events.dropDuplicates([lsn_col])

    # Survivor rule: a delete resets the key; only events strictly newer
    # than the key's newest delete contribute values. Computed without a
    # join: fold delete-lsn and value cells in ONE aggregation by masking
    # value cells on D rows, then discarding value cells whose lsn is
    # <= the newest delete. Masking works because the per-column cell max
    # is monotone in lsn: a D row contributes (NEVER, null) which never
    # wins over a real write.
    d_lsn = F.max(F.when(F.col(op_col) == "D", F.col(lsn_col))).alias("_last_d_lsn")
    # reset barrier: I and D both replace the whole row as of their lsn
    reset_lsn = F.max(F.when(F.col(op_col).isin("I", "D"), F.col(lsn_col))).alias(
        "_last_reset_lsn"
    )

    def masked_cell(col: str) -> F.Column:
        live = F.when(F.col(op_col) != "D", F.col(col))
        return F.max(
            F.struct(
                F.when(live.isNotNull(), F.col(lsn_col)).otherwise(F.lit(NEVER)).alias("l"),
                live.alias("v"),
            )
        ).alias(f"_cell_{col}")

    aggs = [
        F.max(F.col(lsn_col)).alias("_max_lsn"),
        d_lsn,
        reset_lsn,
        F.count(F.lit(1)).alias("_applied"),
    ] + [masked_cell(c) for c in payload_columns]

    if salt is None:
        folded = ev.groupBy(*key_columns).agg(*aggs)
    else:
        # Two-phase salted aggregation: partial per (key, salt), final per
        # key. Exactly correct because every aggregate here (max of struct,
        # max, sum-of-counts) is associative + commutative.
        partial = ev.groupBy(
            *key_columns, F.pmod(F.col(lsn_col), F.lit(salt)).alias("_salt")
        ).agg(*aggs)
        final_aggs = [
            F.max("_max_lsn").alias("_max_lsn"),
            F.max("_last_d_lsn").alias("_last_d_lsn"),
            F.max("_last_reset_lsn").alias("_last_reset_lsn"),
            F.sum("_applied").alias("_applied"),
        ] + [F.max(f"_cell_{c}").alias(f"_cell_{c}") for c in payload_columns]
        folded = partial.groupBy(*key_columns).agg(*final_aggs)

    # Post-aggregation resolution: discard value cells at or below the
    # newest delete (they were erased), surface (value, value_lsn) pairs.
    out_cols: list[F.Column] = [F.col(c) for c in key_columns] + [
        F.col("_max_lsn"),
        F.col("_last_d_lsn"),
        F.col("_last_reset_lsn"),
        (F.col("_last_d_lsn").isNotNull() & (F.col("_last_d_lsn") == F.col("_max_lsn"))).alias(
            "_is_delete"
        ),
        F.col("_applied"),
    ]
    # a cell survives if it is newer than the newest delete (strict — a D
    # erases everything at its lsn) and not older than the newest reset
    # (>= — an I's own writes share its lsn and survive)
    erased_below = F.coalesce(F.col("_last_d_lsn"), F.lit(NEVER))
    reset_floor = F.coalesce(F.col("_last_reset_lsn"), F.lit(NEVER))
    for c in payload_columns:
        cell = F.col(f"_cell_{c}")
        alive = (cell["l"] > erased_below) & (cell["l"] >= reset_floor)
        out_cols.append(F.when(alive, cell["v"]).alias(c))
        out_cols.append(F.when(alive, cell["l"]).otherwise(F.lit(NEVER)).alias(f"{c}_lsn"))
    return folded.select(*out_cols)
