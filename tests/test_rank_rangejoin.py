"""Broadcast range join and global rank: edge semantics pinned."""

from __future__ import annotations

import pytest
import pyarrow as pa
import ray.data as rd

from quickner_ray.stages.rangejoin import band_join
from quickner_ray.stages.rank import global_rank


@pytest.mark.usefixtures("ray_session")
class TestBandJoin:
    BANDS = [(0.0, 10.0, "lo"), (10.0, 20.0, "mid"), (30.0, 40.0, "hi")]

    def _run(self, values):
        ds = rd.from_arrow(pa.table({"value": pa.array(values, pa.float64())}))
        out = band_join(ds, self.BANDS, value_col="value").take_all()
        return {r["value"]: r["band"] for r in out}

    def test_boundaries_half_open(self):
        # lo <= v < hi: 10.0 belongs to "mid", 20.0 is in no band (gap)
        got = self._run([0.0, 9.99, 10.0, 19.99, 30.0])
        assert got == {
            0.0: "lo",
            9.99: "lo",
            10.0: "mid",
            19.99: "mid",
            30.0: "hi",
        }

    def test_out_of_band_rows_dropped(self):
        got = self._run([-1.0, 25.0, 40.0, 99.0])
        assert got == {}

    def test_overlapping_bands_rejected(self):
        ds = rd.from_arrow(pa.table({"value": pa.array([1.0])}))
        with pytest.raises(ValueError, match="overlapping"):
            band_join(ds, [(0.0, 10.0, "a"), (5.0, 15.0, "b")], value_col="value")


@pytest.mark.usefixtures("ray_session")
class TestGlobalRank:
    def _run(self, values, **kw):
        ds = rd.from_arrow(
            pa.table({"i": list(range(len(values))), "v": values})
        )
        out = global_rank(ds, "v", **kw).take_all()
        return {r["i"]: r["rnk"] for r in out}

    def test_rank_with_ties_matches_sql_rank(self):
        # values 5,3,3,1 -> asc ranks 4,2,2,1 (RANK leaves gaps)
        assert self._run([5, 3, 3, 1]) == {0: 4, 1: 2, 2: 2, 3: 1}

    def test_descending(self):
        assert self._run([5, 3, 3, 1], descending=True) == {
            0: 1,
            1: 2,
            2: 2,
            3: 4,
        }

    def test_max_distinct_guard(self):
        ds = rd.from_arrow(pa.table({"v": list(range(100))}))
        with pytest.raises(ValueError, match="max_distinct"):
            global_rank(ds, "v", max_distinct=10)


@pytest.mark.usefixtures("ray_session")
class TestExactQuantiles:
    QS = [0.01, 0.1, 0.5, 0.9, 0.99, 1.0]

    @staticmethod
    def _disc_reference(values, qs):
        import numpy as np

        s = np.sort(np.asarray(values, dtype=np.float64))
        n = len(s)
        return {q: float(s[max(int(np.ceil(q * n)) - 1, 0)]) for q in qs}

    def _check(self, values, **kw):
        from quickner_ray.stages.rank import exact_quantiles

        ds = rd.from_arrow(pa.table({"v": pa.array(values, pa.float64())}))
        got = dict(exact_quantiles(ds, "v", self.QS, **kw))
        assert got == self._disc_reference(values, self.QS)

    def test_uniform(self):
        import numpy as np

        rng = np.random.RandomState(3)
        self._check(list(rng.uniform(-5, 17, 5000)))

    def test_recursion_forced_by_tiny_collect_cap(self):
        import numpy as np

        rng = np.random.RandomState(4)
        self._check(list(rng.normal(0, 1, 4000)), bins=8, max_collect=50)

    def test_degenerate_mass_single_value(self):
        # 90% of the rows are the same value: zero-width interval path
        vals = [7.5] * 900 + list(range(100))
        self._check([float(v) for v in vals], bins=16, max_collect=32)

    def test_few_rows(self):
        self._check([3.0, 1.0, 2.0])

    def test_empty(self):
        from quickner_ray.stages.rank import exact_quantiles

        ds = rd.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
        assert exact_quantiles(ds, "v", [0.5]) == []


@pytest.mark.usefixtures("ray_session")
class TestDocLengthDeciles:
    def test_matches_numpy_reference(self, sf_dir):
        import numpy as np
        import pyarrow.parquet as pq

        from quickner_ray.pipelines.queries import DECILE_QS, q_doc_length_deciles

        got = {
            r["bucket"]: r["n_docs"]
            for r in q_doc_length_deciles(sf_dir).take_all()
        }
        v = (
            pq.read_table(f"{sf_dir}/documents.parquet", columns=["n_chars"])
            .column("n_chars")
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        s = np.sort(v)
        bounds = np.array(
            [s[max(int(np.ceil(q * len(s))) - 1, 0)] for q in DECILE_QS]
        )
        bk = np.searchsorted(bounds, v, side="right")
        want = {
            int(b): int(c)
            for b, c in zip(*np.unique(bk, return_counts=True))
        }
        assert got == want
        assert sum(got.values()) == len(v)


@pytest.mark.usefixtures("ray_session")
class TestMixtureSample:
    def test_rates_deterministic_and_proportional(self):
        from quickner_ray.stages.dedup_approx import h64
        from quickner_ray.stages.topk import mixture_sample

        n = 2000
        tab = pa.table(
            {
                "doc_id": list(range(n)),
                "source": [f"s{i % 3}" for i in range(n)],
            }
        )
        out1 = mixture_sample(
            rd.from_arrow(tab), "source", "doc_id"
        ).take_all()
        out2 = mixture_sample(
            rd.from_arrow(tab), "source", "doc_id"
        ).take_all()
        ids1 = sorted(r["doc_id"] for r in out1)
        assert ids1 == sorted(r["doc_id"] for r in out2)  # deterministic
        # per-source keep fraction tracks the hash-derived rate k/4
        from collections import Counter

        kept = Counter(r["source"] for r in out1)
        for s in ("s0", "s1", "s2"):
            k = (h64(s) % 4) + 1
            frac = kept.get(s, 0) / (n / 3)
            assert abs(frac - k / 4) < 0.07, (s, k, frac)

    def test_n_rates_must_be_power_of_two(self):
        from quickner_ray.stages.topk import mixture_sample

        ds = rd.from_arrow(pa.table({"doc_id": [1], "source": ["a"]}))
        with pytest.raises(ValueError, match="power of two"):
            mixture_sample(ds, "source", "doc_id", n_rates=3)


@pytest.mark.usefixtures("ray_session")
class TestGlobalRowNumber:
    def test_matches_argsort_and_survives_repartition(self):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from quickner_ray.stages.rank import global_row_number

        rng = np.random.default_rng(21)
        n = 500
        df = pd.DataFrame({"k": rng.integers(0, 50, n), "id": np.arange(n)})
        out = (
            global_row_number(
                rd.from_pandas(df).repartition(7), ["k", "id"], descending=[True, False]
            )
            .to_pandas()
            .sort_values("rn")
            .reset_index(drop=True)
        )
        ref = df.sort_values(["k", "id"], ascending=[False, True]).reset_index(drop=True)
        assert (out.rn.values == np.arange(1, n + 1)).all()
        assert (out.k.values == ref.k.values).all()
        assert (out.id.values == ref.id.values).all()

    def test_ntile_semantics(self):
        import numpy as np

        from quickner_ray.stages.rank import ntile_from_rn

        # n=10, tiles=4 -> bucket sizes 3,3,2,2 (remainder to the front)
        rn = np.arange(1, 11)
        got = ntile_from_rn(rn, 10, 4)
        assert list(got) == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
        # n < tiles: one row per bucket, sizes 1,1,1 then empty tail
        assert list(ntile_from_rn(np.arange(1, 4), 3, 4)) == [1, 2, 3]


@pytest.mark.usefixtures("ray_session")
class TestQuantilesDuplicateHeavy:
    def test_constant_column(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.stages.rank import exact_quantiles

        tbl = pa.table({"v": pa.array(np.full(5000, 7.5))})
        got = exact_quantiles(
            rd.from_arrow(tbl).repartition(4), "v", qs=(0.1, 0.5, 0.99)
        )
        assert [v for _, v in got] == [7.5, 7.5, 7.5]

    def test_hot_value_exceeds_collect_cap(self):
        # one value with more duplicates than max_collect: the distinct-
        # count collect keeps the driver bounded and the answer exact
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.stages.rank import exact_quantiles

        rng = np.random.RandomState(9)
        v = np.concatenate([np.full(20000, 5.0), rng.uniform(0, 10, 2000)])
        tbl = pa.table({"v": pa.array(v)})
        got = dict(
            exact_quantiles(
                rd.from_arrow(tbl).repartition(4),
                "v",
                qs=(0.25, 0.5, 0.9),
                max_collect=1000,
            )
        )
        sv = np.sort(v)
        n = len(v)
        for q, val in got.items():
            assert val == sv[max(int(np.ceil(q * n)) - 1, 0)], q


@pytest.mark.usefixtures("ray_session")
def test_global_prefix_max_cross_block_carry():
    """Exclusive running max matches the serial reference at any block
    layout (the carry between blocks is the hard part)."""
    import random

    import ray.data as rd

    from quickner_ray.stages.rank import global_prefix_max

    rng = random.Random(5)
    rows = [
        {"k": i, "v": rng.randrange(0, 1000)} for i in range(200)
    ]
    ref = {}
    cur = None
    for r in sorted(rows, key=lambda r: r["k"]):
        ref[r["k"]] = cur
        cur = r["v"] if cur is None else max(cur, r["v"])
    for nblocks in (1, 7):
        ds = rd.from_items(rows, override_num_blocks=nblocks)
        out = global_prefix_max(ds, ["k"], "v", out_col="pm").take_all()
        got = {r["k"]: r["pm"] for r in out}
        assert got == ref
        assert got[0] is None  # first row has no preceding max
