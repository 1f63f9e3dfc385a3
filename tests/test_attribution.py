"""Last-touch attribution: window cutoff, strict precedence, tie order."""

import numpy as np
import pandas as pd


def _run(rows, ray_session, **kw):
    import ray.data

    from opentapioca_ray.stages.funnel import last_touch_attribution

    ds = ray.data.from_items(rows).repartition(3)
    out = last_touch_attribution(ds, **kw).to_pandas()
    return out.set_index("touch_type").sort_index()


def _ev(eid, user, sec, kind, value=10.0):
    return {
        "event_id": eid,
        "user_id": user,
        "ts": pd.Timestamp(sec, unit="s"),
        "event_type": kind,
        "value": float(value),
    }


def test_attribution_basic_and_window(ray_session):
    DAY = 86400
    rows = [
        # user 1: click then purchase inside window -> click credited
        _ev(1, 1, 0, "click"),
        _ev(2, 1, DAY, "purchase", 25.0),
        # user 2: view 8 days before purchase -> outside window -> none
        _ev(3, 2, 0, "view"),
        _ev(4, 2, 8 * DAY, "purchase", 11.0),
        # user 3: view then click then purchase -> LAST touch (click) wins
        _ev(5, 3, 0, "view"),
        _ev(6, 3, 100, "click"),
        _ev(7, 3, 200, "purchase", 7.5),
        # user 4: purchase with no touches at all -> none
        _ev(8, 4, 50, "purchase", 3.0),
    ]
    out = _run(rows, ray_session)
    assert out.loc["click", "n_conversions"] == 2
    assert out.loc["click", "attributed_value_c"] == 2500 + 750
    assert out.loc["none", "n_conversions"] == 2
    assert out.loc["none", "attributed_value_c"] == 1100 + 300
    assert "view" not in out.index


def test_attribution_strictly_preceding_same_timestamp(ray_session):
    # touch at the SAME (ts) but lower event_id precedes the purchase;
    # a touch with higher event_id at the same ts does not
    rows = [
        _ev(1, 1, 0, "view"),
        _ev(2, 1, 0, "purchase", 5.0),
        _ev(3, 1, 0, "click"),  # later in (ts, id) order -> not credited
    ]
    out = _run(rows, ray_session)
    assert out.loc["view", "n_conversions"] == 1
    assert "click" not in out.index
