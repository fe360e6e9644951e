"""The reference's stateful core as a REAL Structured Streaming stateful
operator: ``applyInPandasWithState`` per movie key.

``compat/movies.py`` reproduces the two-source merge as batch MERGE +
read-back (option (c) of SURVEY §2.3 J1). This module is option (a): a
custom streaming stateful operator that holds each key's partially-merged
row + touch counter in Spark state, emits the completed row the moment
BOTH sources have touched it, and drops the state — the literal
``edit_row_and_visualize`` / ``_send_to_loader`` behavior
(``pyspark_interface.py:38-95``: column-granular non-null merge,
``touch_counter`` increment, emit on ``touch_counter == 2``, tombstone
after emit), vectorized per Arrow batch instead of per message.

State schema: one value + one seq per merged column, plus the touch
counter; emitted rows leave state immediately (the reference ``pop``),
so state size is bounded by in-flight (incomplete) keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MERGE_COLUMNS = ["movie_name", "rating", "release_date", "directors"]

OUTPUT_SCHEMA = T.StructType(
    [T.StructField("imdb_id", T.StringType())]
    + [T.StructField(c, T.StringType()) for c in MERGE_COLUMNS]
    + [T.StructField("touch_counter", T.IntegerType())]
)

STATE_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType()) for c in MERGE_COLUMNS]
    + [T.StructField("touches", T.IntegerType())]
)


def _merge_group(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this key's new events into state; emit + clear when both
    sources have been seen (reference emit-on-2 + tombstone)."""
    if state.exists:
        vals = dict(zip(MERGE_COLUMNS, state.get[: len(MERGE_COLUMNS)]))
        touches = state.get[len(MERGE_COLUMNS)]
    else:
        vals = {c: None for c in MERGE_COLUMNS}
        touches = 0

    emitted: list[dict] = []
    for pdf in batches:
        for row in pdf.sort_values("seq").itertuples(index=False):
            touches += 1
            for c in MERGE_COLUMNS:
                v = getattr(row, c, None)
                if v is not None and not (isinstance(v, float) and pd.isna(v)):
                    vals[c] = v  # non-null wins (pyspark_interface.py:45-48)
            if touches >= 2:
                emitted.append({"imdb_id": key[0], **vals, "touch_counter": touches})

    if emitted:
        state.remove()  # tombstone-after-emit (pyspark_interface.py:80)
        yield pd.DataFrame(emitted[-1:])  # the completing event emits once
    else:
        state.update((*[vals[c] for c in MERGE_COLUMNS], touches))
        yield pd.DataFrame(columns=[f.name for f in OUTPUT_SCHEMA.fields])


def streaming_touch_counter(events: DataFrame) -> DataFrame:
    """events: a streaming union of the two source topics with columns
    (seq long, imdb_id string, <MERGE_COLUMNS> nullable). Returns the
    append-mode stream of completed movies."""
    return events.groupBy("imdb_id").applyInPandasWithState(
        _merge_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
