"""Conversation profiles — the groupwise (applyInPandas) operator:
per-conversation features for corpus curation (turn cadence, role mix,
text volume).

Grouped-map UDF rather than SQL because the cadence features need
ordered in-group numpy work (gap quantiles over sorted timestamps);
everything SQL-friendly stays in plain aggregations elsewhere. The
shuffle key is conv_id — the pipeline's canonical partitioning — so at
10^12 turns this rides the same exchange as every other per-conv stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

PROFILE_SCHEMA = (
    "conv_id string, n_turns int, n_roles int, total_chars long, "
    "mean_text_len double, median_gap_s double, max_gap_s double"
)


def _profile(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("turn_idx")
    ts = pdf["ts"].values.astype("datetime64[s]").astype(np.int64)
    gaps = np.diff(ts) if len(ts) > 1 else np.array([], dtype=np.int64)
    lens = pdf["text"].str.len().fillna(0).values
    return pd.DataFrame(
        {
            "conv_id": [pdf["conv_id"].iloc[0]],
            "n_turns": [len(pdf)],
            "n_roles": [pdf["role"].nunique()],
            "total_chars": [int(lens.sum())],
            "mean_text_len": [round(float(lens.mean()), 4) if len(lens) else 0.0],
            "median_gap_s": [round(float(np.median(gaps)), 1) if len(gaps) else 0.0],
            "max_gap_s": [float(gaps.max()) if len(gaps) else 0.0],
        }
    )


def conversation_profiles(transcripts: DataFrame) -> DataFrame:
    return (
        transcripts.select("conv_id", "turn_idx", "role", "text", "ts")
        .groupBy("conv_id")
        .applyInPandas(_profile, schema=PROFILE_SCHEMA)
    )
