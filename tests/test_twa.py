"""Time-weighted value integral: step-function semantics."""

import numpy as np
import pandas as pd


def test_twa_matches_reference(ray_session):
    import ray.data

    from opentapioca_ray.stages.windows import time_weighted_value

    rows = [
        # user 1: value 10 held 5s, value 30 held 10s, last holds 0
        {"event_id": 1, "user_id": 1, "ts": pd.Timestamp(0, unit="s"), "value": 10.0},
        {"event_id": 2, "user_id": 1, "ts": pd.Timestamp(5, unit="s"), "value": 30.0},
        {"event_id": 3, "user_id": 1, "ts": pd.Timestamp(15, unit="s"), "value": 99.0},
        # user 2: single event -> zero span, zero integral
        {"event_id": 4, "user_id": 2, "ts": pd.Timestamp(7, unit="s"), "value": 50.0},
    ]
    out = (
        time_weighted_value(ray.data.from_items(rows).repartition(2))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert out.loc[1, "weighted_sum_cs"] == 1000 * 5 + 3000 * 10
    assert out.loc[1, "span_s"] == 15
    assert out.loc[1, "n_events"] == 3
    assert out.loc[2, "weighted_sum_cs"] == 0
    assert out.loc[2, "span_s"] == 0
    assert out.loc[2, "n_events"] == 1


def test_twa_timestamp_peers_order_by_id(ray_session):
    import ray.data

    from opentapioca_ray.stages.windows import time_weighted_value

    rows = [
        {"event_id": 2, "user_id": 1, "ts": pd.Timestamp(0, unit="s"), "value": 70.0},
        {"event_id": 1, "user_id": 1, "ts": pd.Timestamp(0, unit="s"), "value": 10.0},
        {"event_id": 3, "user_id": 1, "ts": pd.Timestamp(4, unit="s"), "value": 1.0},
    ]
    out = time_weighted_value(ray.data.from_items(rows)).to_pandas()
    # order: id1 (holds 0s to id2), id2 holds 4s, id3 holds 0
    assert int(out["weighted_sum_cs"][0]) == 7000 * 4
