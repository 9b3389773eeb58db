"""Event-stream operators: tumbling windows, sessionization, user stats."""

from __future__ import annotations

import datetime as dt

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from quickner_ray.stages import events as ev

EPOCH = dt.datetime(2024, 1, 1)


def _events_table(rows):
    """rows: (event_id, minutes_offset, user_id, event_type, value)"""
    return pa.Table.from_pydict(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array(
                [EPOCH + dt.timedelta(minutes=r[1]) for r in rows],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            "value": pa.array([r[4] for r in rows], type=pa.float64()),
        }
    )


ROWS = [
    # user 1: two sessions (gap 45 min between minute 20 and 65)
    (0, 0, 1, "view", 1.0),
    (1, 10, 1, "click", 2.0),
    (2, 20, 1, "view", 3.0),
    (3, 65, 1, "error", 4.0),
    (4, 70, 1, "view", 5.0),
    # user 2: one session spanning the hour boundary
    (5, 55, 2, "view", 10.0),
    (6, 75, 2, "click", 20.0),
]


class TestKernels:
    def test_sessionize_group(self):
        g = _events_table([r for r in ROWS if r[2] == 1])
        out = ev._sessionize_group(g).to_pandas().sort_values("session_id")
        assert out["session_id"].tolist() == [1, 2]
        assert out["n_events"].tolist() == [3, 2]
        base = int(EPOCH.timestamp() * 1_000_000)
        assert out["start_us"].tolist() == [base, base + 65 * 60_000_000]
        assert out["end_us"].tolist() == [base + 20 * 60_000_000, base + 70 * 60_000_000]

    def test_window_partial(self):
        out = ev.partial_window_counts(_events_table(ROWS)).to_pandas()
        # hour 0: events at minutes 0..55; hour 1: minutes 65..75
        assert out["partial_count"].sum() == len(ROWS)
        assert out["window_start_us"].nunique() == 2


class TestPipelines:
    @pytest.fixture(scope="class")
    def events_path(self, tmp_path_factory):
        p = tmp_path_factory.mktemp("ev") / "events.parquet"
        pq.write_table(_events_table(ROWS), str(p))
        return str(p)

    def _con(self, events_path):
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{events_path}'")
        return con

    def test_window_counts_matches_sql(self, ray_session, events_path):
        import ray.data as rd

        ours = (
            ev.window_counts(rd.read_parquet(events_path))
            .to_pandas()
            .sort_values(["window_start_us", "event_type"])
            .reset_index(drop=True)
        )
        con = self._con(events_path)
        oracle = (
            con.sql(ev.sql_window_counts())
            .df()
            .sort_values(["window_start_us", "event_type"])
            .reset_index(drop=True)
        )
        assert ours["n_events"].tolist() == oracle["n_events"].tolist()
        assert ours["sum_value_cents"].tolist() == oracle["sum_value_cents"].tolist()

    def test_sessionize_matches_sql(self, ray_session, events_path):
        import ray.data as rd

        cols = ["user_id", "session_id", "n_events", "start_us", "end_us"]
        ours = (
            ev.sessionize(rd.read_parquet(events_path))
            .to_pandas()[cols]
            .sort_values(cols)
            .reset_index(drop=True)
        )
        con = self._con(events_path)
        oracle = (
            con.sql(ev.sql_sessionize())
            .df()[cols]
            .sort_values(cols)
            .reset_index(drop=True)
        )
        assert ours.astype("int64").equals(oracle.astype("int64"))

    def test_user_stats_matches_sql(self, ray_session, events_path):
        import ray.data as rd

        ours = (
            ev.user_stats(rd.read_parquet(events_path))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        con = self._con(events_path)
        oracle = (
            con.sql(ev.sql_user_stats())
            .df()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert ours["n_events"].tolist() == oracle["n_events"].tolist()
        assert ours["n_errors"].tolist() == oracle["n_errors"].tolist()
        assert ours["sum_value_cents"].tolist() == oracle["sum_value_cents"].tolist()


class TestSlidingWindows:
    def test_event_window_membership(self):
        """Each event lands in exactly size/slide windows covering its ts."""
        t = _events_table(ROWS)
        out = ev.partial_sliding_counts(t, ev.US_PER_HOUR, ev.US_PER_HOUR // 4)
        assert out["partial_count"].to_pandas().sum() == len(ROWS) * 4

    def test_sliding_matches_sql(self, ray_session, tmp_path):
        import ray.data as rd

        p = str(tmp_path / "events.parquet")
        pq.write_table(_events_table(ROWS), p)
        cols = ["window_start_us", "event_type"]
        ours = (
            ev.sliding_window_counts(rd.read_parquet(p))
            .to_pandas()
            .sort_values(cols)
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{p}'")
        oracle = (
            con.sql(ev.sql_sliding_window_counts())
            .df()
            .sort_values(cols)
            .reset_index(drop=True)
        )
        assert ours["n_events"].tolist() == oracle["n_events"].tolist()
        assert ours["sum_value_cents"].tolist() == oracle["sum_value_cents"].tolist()
        assert (ours["window_start_us"].values == oracle["window_start_us"].values).all()


class TestGroupedQuantiles:
    def test_matches_duckdb_across_sizes(self, ray_session):
        """quantile_disc convention pinned element-for-element for every
        group size 1..40 (guards the ceil boundary against float drift)."""
        import duckdb
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.stages.events import grouped_quantiles, sql_grouped_quantiles

        rng = np.random.RandomState(11)
        keys, vals = [], []
        for size in range(1, 41):
            keys += [f"g{size}"] * size
            vals += rng.rand(size).tolist()
        tbl = pa.table({"event_type": keys, "value": vals})
        got = (
            grouped_quantiles(rd.from_arrow(tbl), "event_type", "value")
            .to_pandas()
            .sort_values(["event_type", "q"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql("SET threads=2")
        con.register("events", tbl)
        ora = (
            con.sql(sql_grouped_quantiles())
            .df()
            .sort_values(["event_type", "q"])
            .reset_index(drop=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(got, ora[got.columns], check_dtype=False)


class TestGroupedQuantilesCont:
    def test_lerp_bit_exact_across_sizes(self, ray_session):
        """percentile_cont interpolation (lo*(1-frac)+hi*frac, frac from
        q*(n-1)) pinned BIT-exact vs DuckDB for every group size 1..40 on
        random doubles — the value comparison is == on float64, no
        tolerance."""
        import duckdb
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.stages.events import (
            grouped_quantiles_cont,
            sql_grouped_quantiles_cont,
        )

        rng = np.random.RandomState(7)
        keys, vals = [], []
        for size in range(1, 41):
            keys += [f"g{size}"] * size
            vals += (rng.randn(size) * 1000).tolist()
        tbl = pa.table({"event_type": keys, "value": vals})
        got = (
            grouped_quantiles_cont(rd.from_arrow(tbl), "event_type", "value")
            .to_pandas()
            .sort_values(["event_type", "q"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql("SET threads=2")
        con.register("events", tbl)
        ora = (
            con.sql(sql_grouped_quantiles_cont())
            .df()
            .sort_values(["event_type", "q"])
            .reset_index(drop=True)
        )
        assert got["qvalue"].tolist() == ora["qvalue"].tolist()


class TestGroupedMad:
    def test_bit_exact_across_sizes(self, ray_session):
        import duckdb
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.stages.events import grouped_mad, sql_grouped_mad

        rng = np.random.RandomState(5)
        keys, vals = [], []
        for size in range(1, 31):
            keys += [f"g{size}"] * size
            vals += (rng.randn(size) * 500).tolist()
        tbl = pa.table({"event_type": keys, "value": vals})
        got = (
            grouped_mad(rd.from_arrow(tbl), "event_type", "value")
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql("SET threads=2")
        con.register("events", tbl)
        ora = (
            con.sql(sql_grouped_mad())
            .df()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        assert got["med"].tolist() == ora["med"].tolist()
        assert got["mad_value"].tolist() == ora["mad_value"].tolist()


@pytest.mark.usefixtures("ray_session")
class TestEventGaps:
    def test_lag_matches_pandas(self):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from quickner_ray.stages.events import event_gaps

        rng = np.random.default_rng(5)
        n = 200
        df = pd.DataFrame(
            {
                "event_id": np.arange(n),
                "ts": pd.to_datetime(
                    rng.integers(0, 10**7, n), unit="us"
                ),
                "user_id": rng.integers(0, 9, n),
            }
        )
        got = event_gaps(rd.from_pandas(df)).to_pandas()
        # ts is datetime64[ns] in pandas; convert to epoch us
        ref = df.assign(us=df.ts.astype("int64") // 1000)
        ref = ref.sort_values(["user_id", "us", "event_id"])
        ref["gap_us"] = ref.groupby("user_id")["us"].diff().fillna(-1).astype("int64")
        a = got.sort_values(["user_id", "us", "event_id"]).reset_index(drop=True)
        b = ref[["user_id", "event_id", "us", "gap_us"]].reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a[["user_id", "event_id", "us", "gap_us"]].astype("int64"), b.astype("int64")
        )

    def test_first_event_gap_is_minus_one(self):
        import pandas as pd
        import ray.data as rd

        from quickner_ray.stages.events import event_gaps

        df = pd.DataFrame(
            {
                "event_id": [1, 2],
                "ts": pd.to_datetime([100, 400], unit="us"),
                "user_id": [7, 7],
            }
        )
        out = event_gaps(rd.from_pandas(df)).take_all()
        out.sort(key=lambda r: r["event_id"])
        assert out[0]["gap_us"] == -1 and out[1]["gap_us"] == 300


@pytest.mark.usefixtures("ray_session")
def test_resample_fills_gap_windows():
    import pandas as pd
    import ray.data as rd

    from quickner_ray.stages.events import resample_user_windows

    H = 3_600_000_000
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            # user 1: events in hour 0 and hour 3 -> hours 1,2 filled with 0
            "ts": pd.to_datetime([10, 3 * H + 5, 7 * H], unit="us"),
        }
    )
    out = resample_user_windows(rd.from_pandas(df)).take_all()
    got = {(r["user_id"], r["window_start_us"]): r["n_events"] for r in out}
    assert got == {
        (1, 0): 1, (1, H): 0, (1, 2 * H): 0, (1, 3 * H): 1,
        (2, 7 * H): 1,
    }


@pytest.mark.usefixtures("ray_session")
def test_running_extrema_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quickner_ray.stages.events import running_extrema

    rng = np.random.default_rng(11)
    n = 300
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="us"),
            "user_id": rng.integers(0, 7, n),
            "value": rng.normal(size=n),
        }
    )
    got = running_extrema(rd.from_pandas(df)).to_pandas()
    ref = df.assign(us=df.ts.astype("int64") // 1000).sort_values(
        ["user_id", "us", "event_id"]
    )
    g = ref.groupby("user_id")["value"]
    ref["running_max"] = g.cummax()
    ref["running_min"] = g.cummin()
    a = got.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    b = ref.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["user_id", "event_id", "running_max", "running_min"]],
        b[["user_id", "event_id", "running_max", "running_min"]].reset_index(drop=True),
        check_dtype=False,
    )


@pytest.mark.usefixtures("ray_session")
def test_trailing_max_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quickner_ray.stages.events import trailing_max

    rng = np.random.default_rng(13)
    n = 250
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="us"),
            "user_id": rng.integers(0, 6, n),
            "value": rng.normal(size=n),
        }
    )
    got = trailing_max(rd.from_pandas(df), k=4).to_pandas()
    ref = df.assign(us=df.ts.astype("int64") // 1000).sort_values(
        ["user_id", "us", "event_id"]
    )
    ref["trailing_max"] = (
        ref.groupby("user_id")["value"].rolling(4, min_periods=1).max().values
    )
    a = got.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    b = ref.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["user_id", "event_id", "trailing_max"]],
        b[["user_id", "event_id", "trailing_max"]],
        check_dtype=False,
    )


@pytest.mark.usefixtures("ray_session")
class TestSessionFunnel:
    def _run(self, rows):
        import pandas as pd
        import ray.data as rd

        from quickner_ray.stages.events import session_funnel

        df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_us", "event_type"])
        df["ts"] = pd.to_datetime(df.ts_us, unit="us")
        out = session_funnel(rd.from_pandas(df[["event_id", "user_id", "ts", "event_type"]])).take_all()
        return {(r["user_id"], r["session_id"]): r for r in out}

    def test_converted_and_order_rules(self):
        M = 60_000_000  # 1 min
        GAP = 1_800_000_000
        got = self._run(
            [
                # session 1: click then purchase -> converted
                (1, 7, 0, "click"),
                (2, 7, M, "purchase"),
                # session 2 (after gap): purchase BEFORE click -> not converted
                (3, 7, GAP + 2 * M, "purchase"),
                (4, 7, GAP + 3 * M, "click"),
                # user 8: clicks only -> not converted
                (5, 8, 0, "click"),
            ]
        )
        assert got[(7, 1)]["converted"] == 1
        assert got[(7, 1)]["n_clicks"] == 1 and got[(7, 1)]["n_purchases"] == 1
        assert got[(7, 2)]["converted"] == 0
        assert got[(8, 1)]["converted"] == 0 and got[(8, 1)]["n_purchases"] == 0

    def test_same_timestamp_counts_as_conversion(self):
        got = self._run([(1, 3, 500, "click"), (2, 3, 500, "purchase")])
        assert got[(3, 1)]["converted"] == 1


@pytest.mark.usefixtures("ray_session")
def test_first_seen_daily():
    import pandas as pd
    import ray.data as rd

    from quickner_ray.stages.events import US_PER_DAY, first_seen_daily

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 3, 3],
            "ts": pd.to_datetime(
                [10, 5 * US_PER_DAY, 2 * US_PER_DAY + 7, 99, 2 * US_PER_DAY],
                unit="us",
            ),
        }
    )
    out = first_seen_daily(rd.from_pandas(df)).take_all()
    got = {r["day"]: r["new_users"] for r in out}
    assert got == {0: 2, 2: 1}  # users 1,3 first on day 0; user 2 on day 2


@pytest.mark.usefixtures("ray_session")
class TestRecentCountTransitions:
    def test_recent_count_range_peer_semantics(self):
        import pandas as pd
        import ray.data as rd

        from quickner_ray.stages.events import recent_count

        W = 600_000_000
        # events at t=0, W/2, W/2 (peer pair), 3W; RANGE frame counts ALL
        # peers of the current ts, including later-event_id ones
        df = pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4],
                "ts": pd.to_datetime([0, W // 2, W // 2, 3 * W], unit="us"),
                "user_id": [5, 5, 5, 5],
            }
        )
        out = {r["event_id"]: r["recent_count"]
               for r in recent_count(rd.from_pandas(df), W).take_all()}
        assert out == {1: 1, 2: 3, 3: 3, 4: 1}

    def test_transitions_match_pandas(self):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from quickner_ray.stages.events import event_type_transitions

        rng = np.random.default_rng(17)
        n = 400
        df = pd.DataFrame(
            {
                "event_id": np.arange(n),
                "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="us"),
                "user_id": rng.integers(0, 10, n),
                "event_type": rng.choice(["a", "b", "c"], n),
            }
        )
        got = event_type_transitions(rd.from_pandas(df)).to_pandas()
        ref = df.assign(us=df.ts.astype("int64") // 1000).sort_values(
            ["user_id", "us", "event_id"]
        )
        ref["prev"] = ref.groupby("user_id")["event_type"].shift()
        ref = (
            ref.dropna(subset=["prev"])
            .groupby(["prev", "event_type"])
            .size()
            .reset_index(name="n")
        )
        a = got.sort_values(["from_type", "to_type"]).reset_index(drop=True)
        b = ref.rename(columns={"prev": "from_type", "event_type": "to_type"})
        b = b.sort_values(["from_type", "to_type"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_active_users_daily_and_weekly():
    import pandas as pd
    import ray.data as rd

    from quickner_ray.stages.events import (
        US_PER_DAY,
        daily_active_users,
        weekly_active_users,
    )

    D = US_PER_DAY
    # user 1 active days 0,1 (twice on day 0); user 2 day 0; user 3 day 8
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 3],
            "ts": pd.to_datetime([5, 60, D + 1, 7, 8 * D], unit="us"),
        }
    )
    dau = {r["day"]: r["active_users"]
           for r in daily_active_users(rd.from_pandas(df)).take_all()}
    assert dau == {0: 2, 1: 1, 8: 1}
    wau = {r["window_start_day"]: r["active_users"]
           for r in weekly_active_users(rd.from_pandas(df)).take_all()}
    # window starting day 0 covers days 0-6: users 1,2 -> 2
    assert wau[0] == 2
    # window starting day 1 covers 1-7: user 1 only
    assert wau[1] == 1
    # windows 2..8 cover day 8 only via starts 2..8: user 3
    assert wau[8] == 1 and wau[2] == 1
    # dedup within window: user 1 active on 2 days of window -5..1? start -5
    # covers days -5..1 -> users 1,2 once each
    assert wau[-5] == 2


class TestGroupedQuantileSketch:
    def _rank_err(self, data, key, q, est):
        import numpy as np

        v = np.sort(data[key])
        n = len(v)
        # rank interval occupied by est in sorted order
        lo = np.searchsorted(v, est, "left")
        hi = np.searchsorted(v, est, "right")
        target = max(int(np.ceil(q * n)), 1)
        if lo + 1 <= target <= hi:
            return 0
        return min(abs(target - (lo + 1)), abs(target - hi))

    def test_error_bound_across_layouts(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.stages.events import grouped_quantile_sketch

        rng = np.random.RandomState(13)
        keys = np.repeat([f"g{i}" for i in range(3)], 4000)
        vals = np.concatenate(
            [rng.randn(4000) * 10, rng.exponential(5, 4000), rng.rand(4000)]
        )
        tbl = pa.table({"event_type": keys, "value": vals})
        data = {
            f"g{i}": vals[i * 4000 : (i + 1) * 4000] for i in range(3)
        }
        k = 64
        for parts in (1, 4, 13):
            got = (
                grouped_quantile_sketch(
                    rd.from_arrow(tbl).repartition(parts),
                    "event_type",
                    "value",
                    qs=(0.1, 0.5, 0.9, 0.99),
                    k=k,
                )
                .to_pandas()
            )
            assert len(got) == 12
            for r in got.itertuples():
                err = self._rank_err(data, r.event_type, r.q, r.qvalue)
                # bound: n/k per level of summarization + slack 1
                assert err <= 4000 / k + 1, (parts, r, err)

    def test_exact_when_group_fits(self, ray_session):
        # n <= k and one batch: the sketch IS quantile_disc
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.stages.events import grouped_quantile_sketch

        v = np.arange(100, dtype=float)
        tbl = pa.table({"event_type": ["g"] * 100, "value": v})
        got = grouped_quantile_sketch(
            rd.from_arrow(tbl), "event_type", "value", qs=(0.5, 0.9), k=256
        ).to_pandas()
        assert got.sort_values("q")["qvalue"].tolist() == [49.0, 89.0]


class TestCoalesceIntervals:
    def test_group_kernel(self):
        """Hand-built intervals: [0,10) [5,20) [20,30) merge (touching
        fuses); [40,45) is its own island."""
        from quickner_ray.stages.events import _coalesce_group

        # dur = cents(value) * mult; pick mult=1 and values in cents
        g = pa.table(
            {
                "user_id": pa.array([7] * 4, type=pa.int64()),
                "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "ts": pa.array([0, 5, 20, 40], type=pa.timestamp("us")),
                "value": pa.array([0.10, 0.15, 0.10, 0.05]),
            }
        )
        out = _coalesce_group(g, dur_mult=1)
        assert out.column("start_us").to_pylist() == [0, 40]
        assert out.column("end_us").to_pylist() == [30, 45]
        assert out.column("n_events").to_pylist() == [3, 1]
        assert out.column("island_id").to_pylist() == [1, 2]

    def test_matches_sql(self, ray_session, sf_dir):
        import duckdb
        import pandas as pd

        from quickner_ray.pipelines.queries import q_event_intervals
        from quickner_ray.stages.events import sql_coalesce_intervals

        got = q_event_intervals(sf_dir).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
        ora = con.sql(sql_coalesce_intervals()).df()
        assert len(got) == len(ora)
        key = ["user_id", "island_id"]
        a = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
        b = ora.sort_values(key).reset_index(drop=True)[sorted(ora.columns)]
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_islands_disjoint(self, ray_session, sf_dir):
        """Merged islands per user must be strictly separated: next start
        > previous end (touching would have fused)."""
        from quickner_ray.pipelines.queries import q_event_intervals

        got = q_event_intervals(sf_dir).to_pandas()
        for _, grp in got.groupby("user_id"):
            g = grp.sort_values("start_us")
            assert (g.start_us.values[1:] > g.end_us.values[:-1]).all()


@pytest.mark.usefixtures("ray_session")
class TestDecayScores:
    def test_recurrence_and_layout_invariance(self):
        import pyarrow as pa

        import ray.data as rd

        from quickner_ray.stages.events import decay_scores

        # user 1: values 100, 50, 200 cents-> 10000, (5000+10000)//2=7500,
        # (20000+7500)//2=13750; out-of-order ts exercises the sort
        t = pa.table(
            {
                "event_id": pa.array([3, 1, 2, 9], pa.int64()),
                "ts": pa.array([3_000_000, 1_000_000, 2_000_000, 5_000_000]).cast(
                    pa.timestamp("us")
                ),
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                "value": pa.array([200.0, 100.0, 50.0, 7.77], pa.float64()),
            }
        )
        for nblocks in (1, 3):
            ds = rd.from_arrow(t).repartition(nblocks)
            got = {
                (r["user_id"], r["event_id"]): r["decay_c"]
                for r in decay_scores(ds).take_all()
            }
            assert got == {
                (1, 1): 10000,
                (1, 2): 7500,
                (1, 3): 13750,
                (2, 9): 777,
            }


@pytest.mark.usefixtures("ray_session")
class TestRetentionCohorts:
    def test_hand_computed_and_layout_invariance(self):
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.stages.events import US_PER_DAY, retention_cohorts

        def ts(day, k=0):
            return day * US_PER_DAY + k * 1_000_000

        # user 1: first day 0, active days 0,1,3 (two events day 0)
        # user 2: first day 1, active days 1,2
        # user 3: first day 3 only
        rows = [
            (1, ts(0)), (1, ts(0, 5)), (1, ts(1)), (1, ts(3)),
            (2, ts(1)), (2, ts(2)),
            (3, ts(3)),
        ]
        t = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows]).cast(pa.timestamp("us")),
            }
        )
        expect = {
            (0, 0): 1, (0, 1): 1, (0, 3): 1,
            (1, 0): 1, (1, 1): 1,
            (3, 0): 1,
        }
        for nblocks in (1, 4):
            ds = rd.from_arrow(t).repartition(nblocks)
            got = {
                (r["cohort_day"], r["day_offset"]): r["n_users"]
                for r in retention_cohorts(ds).take_all()
            }
            assert got == expect
