"""Grouped-map (applyInPandas) operators — the per-group Arrow surface
(SURVEY.md §2.H row 'Grouped map').

block_profile: per-block similarity profile computed with the numpy kernels
over ALL in-block pairs of one group at once — the pattern for operators
that need a whole block as a single batch (e.g. in-block clustering,
per-block threshold tuning). Groups are the (capped) blocks, so the batch
size is bounded by C3's top-N cap — safe at any corpus size.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.similarity import jaro_winkler_batch

PROFILE_SCHEMA = (
    "block_key string, n_records int, n_pairs int, "
    "jw_mean double, jw_max double"
)


def block_profile(blocks_with_text: DataFrame) -> DataFrame:
    """Input: (block_key, record_id, norm_text); output: one profile row per
    block with ≥2 records — pair count and JW statistics (rounded 6dp)."""

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["block_key"].iloc[0]
        texts = pdf.sort_values("record_id")["norm_text"].tolist()
        n = len(texts)
        if n < 2:
            return pd.DataFrame(
                columns=["block_key", "n_records", "n_pairs", "jw_mean", "jw_max"]
            )
        a, b = zip(*combinations(texts, 2))
        jw = jaro_winkler_batch(pd.Series(a), pd.Series(b))
        return pd.DataFrame(
            {
                "block_key": [key],
                "n_records": [n],
                "n_pairs": [len(jw)],
                "jw_mean": [round(float(np.mean(jw)), 6)],
                "jw_max": [round(float(np.max(jw)), 6)],
            }
        )

    return blocks_with_text.groupBy("block_key").applyInPandas(
        profile, PROFILE_SCHEMA
    )
