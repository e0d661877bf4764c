"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.G / brief: custom stateful ops are the one query family with
no SQL-expressible oracle — tests compare against a batch recomputation).

crawl_url_state: per-url incremental crawl tracker. For every url the state
holds (n_crawls, first_ts, last_ts); each micro-batch updates the state and
emits the refreshed row. This is the streaming building block for
incremental re-blocking: downstream stages re-block only urls whose state
row changed in the batch (the delta), instead of the whole corpus.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "url string, n_crawls long, first_ts timestamp, last_ts timestamp"
STATE_SCHEMA = "n_crawls long, first_ts timestamp, last_ts timestamp"


def _update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    # GroupState.get is a property in PySpark (raises when absent)
    n, first, last = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        ts = pd.to_datetime(pdf["warc_ts"])
        n += len(pdf)
        lo, hi = ts.min(), ts.max()
        first = lo if first is None or lo < first else first
        last = hi if last is None or hi > last else last
    state.update((n, first, last))
    yield pd.DataFrame(
        {
            "url": [key[0]],
            "n_crawls": [n],
            "first_ts": [first],
            "last_ts": [last],
        }
    )


def crawl_url_state(pages_stream: DataFrame) -> DataFrame:
    """Stateful per-url crawl tracker over a pages stream.

    Update-mode output: one refreshed row per url per micro-batch in which
    that url appeared.
    """
    return (
        pages_stream.select("url", "warc_ts")
        .groupBy("url")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
