"""Stateful streaming: per-segment sequence validation with
applyInPandasWithState.

The reference validates `record.Sequence == lastSequence+1` against state
it keeps per segment during produce (/root/reference/server/pebble/
service.go:309-313, 345-363). In streaming mode that state lives in the
state store, keyed by (space, segment), surviving across micro-batches
and restarts via the checkpoint.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "space string, segment string, n_ok long, n_violations long, "
    "last_sequence long"
)
STATE_SCHEMA = "last_sequence long"


def _validate_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (space, segment) = key
    last = state.get[0] if state.exists else 0
    n_ok = n_bad = 0
    for pdf in pdfs:
        for seq in sorted(pdf["sequence"].tolist()):
            if seq == last + 1:
                n_ok += 1
                last = seq
            else:
                n_bad += 1
    state.update((last,))
    yield pd.DataFrame(
        [
            {
                "space": space,
                "segment": segment,
                "n_ok": n_ok,
                "n_violations": n_bad,
                "last_sequence": last,
            }
        ]
    )


def streaming_sequence_validation(log_stream: DataFrame) -> DataFrame:
    """Per-micro-batch conformance report per (space, segment), with the
    last accepted sequence carried in the state store."""
    return log_stream.groupBy("space", "segment").applyInPandasWithState(
        _validate_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
