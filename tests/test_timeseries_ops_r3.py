"""Hand cases for max drawdown, hopping windows, interpolation."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def test_max_drawdown_hand_case(ray_session, tmp_path):
    """Balance path 10, 30, 5, 20, -10 -> peak 40 at step 2, trough
    -10 + 55 cum... computed directly: cum = [10,40,45,65,55]? No —
    values ARE deltas; verify against a straight numpy reference."""
    import __ray_entry__ as e

    rng = np.random.RandomState(2)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 5, n).astype(np.int64),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
            "value": rng.uniform(-50, 50, n).round(2),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    df.to_parquet(sf / "events.parquet")

    out = (
        e.queries()["max_drawdown"](str(sf))
        .to_pandas()
        .set_index("user_id")["max_drawdown"]
        .to_dict()
    )

    want = {}
    cents = np.sign(df["value"].to_numpy() * 100.0) * np.floor(
        np.abs(df["value"].to_numpy() * 100.0) + 0.5
    )
    df2 = df.assign(cents=cents.astype(np.int64)).sort_values(
        ["ts", "event_id"]
    )
    for k, g in df2.groupby("user_id"):
        bal = g["cents"].cumsum().to_numpy()
        peak = np.maximum.accumulate(bal)
        want[int(k)] = int((peak - bal).max())
    assert out == want


def test_hopping_window_membership(ray_session, tmp_path):
    """An event at minute 7 lands in windows starting at minutes 0
    and 5 (width 10, slide 5); one at minute 2 only in window 0."""
    import __ray_entry__ as e

    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:07:00", "2024-01-01 00:02:00"]
            ),
            "event_type": ["click", "click"],
            "value": [1.0, 2.0],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    df.to_parquet(sf / "events.parquet")
    out = (
        e.queries()["hopping_window"](str(sf))
        .to_pandas()
        .sort_values("wstart_us")
        .reset_index(drop=True)
    )
    base = pd.Timestamp("2024-01-01").value // 1000
    m5 = 300_000_000
    got = {
        (int(r.wstart_us - base) // m5, int(r.n_events), int(r.sum_cents))
        for r in out.itertuples()
    }
    # windows align to the epoch: the 00:02 event also belongs to the
    # [23:55, 00:05) window of the previous day (rel index -1); @0
    # holds both events; @5min holds only the 07:00 one
    assert got == {(-1, 1, 200), (0, 2, 300), (1, 1, 100)}


def test_interpolation_midpoint_and_edges(ray_session, tmp_path):
    """Masked value exactly between 100 and 200 cents -> 150; leading
    null takes the next value, trailing null the previous."""
    import __ray_entry__ as e

    df = pd.DataFrame(
        {
            # event_id % 5 == 0 masked: ids 0, 5, 10
            "event_id": np.array([0, 1, 5, 2, 10], np.int64),
            "user_id": np.array([7, 7, 7, 7, 7], np.int64),
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",  # leading null
                    "2024-01-01 00:01:00",  # 100 cents
                    "2024-01-01 00:02:00",  # null, midpoint
                    "2024-01-01 00:03:00",  # 200 cents
                    "2024-01-01 00:04:00",  # trailing null
                ]
            ),
            "value": [9.99, 1.00, 9.99, 2.00, 9.99],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    df.to_parquet(sf / "events.parquet")
    out = (
        e.queries()["interpolate_missing"](str(sf))
        .to_pandas()
        .set_index("event_id")["cents"]
        .to_dict()
    )
    assert out == {0: 100, 1: 100, 5: 150, 2: 200, 10: 200}
