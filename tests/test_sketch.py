"""HyperLogLog sketch: register determinism, mergeability, estimate error."""

from __future__ import annotations

import numpy as np
import pytest
import pyarrow as pa
import ray.data as rd

from quickner_ray.stages.sketch import M, hll_estimate, hll_registers


def _regs(ids) -> dict[int, int]:
    ds = rd.from_arrow(pa.table({"k": pa.array(ids)}))
    return {
        r["bucket"]: r["register"] for r in hll_registers(ds, "k").take_all()
    }


@pytest.mark.usefixtures("ray_session")
class TestHLL:
    def test_estimate_error_sweep(self):
        # m=4096 -> expected relative error ~1.6%; allow 5%
        for n in (100, 1_000, 20_000):
            est = hll_estimate(list(_regs(range(n)).items()))
            assert abs(est - n) / n < 0.05, (n, est)

    def test_merge_is_elementwise_max(self):
        a = _regs(range(0, 3_000))
        b = _regs(range(2_000, 5_000))
        u = _regs(range(0, 5_000))
        merged = {
            k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)
        }
        assert merged == u

    def test_deterministic_and_duplicate_insensitive(self):
        once = _regs([f"u{i}" for i in range(500)])
        dup = _regs([f"u{i % 500}" for i in range(5_000)])
        assert once == dup

    def test_register_bounds(self):
        regs = _regs(range(10_000))
        assert all(0 <= b < M for b in regs)
        assert all(1 <= r <= 53 for r in regs.values())


@pytest.mark.usefixtures("ray_session")
class TestCMS:
    @staticmethod
    def _sketch(texts):
        import ray.data as rd

        from quickner_ray.stages.sketch import cms_registers

        ds = rd.from_items([{"text": t} for t in texts])
        return [
            (r["sketch_row"], r["bucket"], r["register"])
            for r in cms_registers(ds).take_all()
        ]

    def test_estimate_upper_bounds_true_count(self):
        import re

        from quickner_ray.stages.sketch import cms_estimate

        texts = [f"alpha beta gamma{i % 7} alpha" for i in range(100)]
        true = {}
        for t in texts:
            for w in re.findall(r"[a-z0-9]+", t.lower()):
                true[w] = true.get(w, 0) + 1
        regs = self._sketch(texts)
        for w, c in true.items():
            est = cms_estimate(regs, w)
            assert est >= c, (w, est, c)
        # small vocab -> no collisions expected at w=512: exact estimates
        assert cms_estimate(regs, "alpha") == true["alpha"]

    def test_row_sums_equal_token_count(self):
        # every hash row distributes ALL token occurrences over its buckets
        texts = ["one two three", "two three four", ""]  # 6 tokens total
        regs = self._sketch(texts)
        per_row = {}
        for r, _, v in regs:
            per_row[r] = per_row.get(r, 0) + v
        from quickner_ray.stages.sketch import CMS_D

        assert per_row == {r: 6 for r in range(CMS_D)}

    def test_absent_word_estimates_small(self):
        from quickner_ray.stages.sketch import cms_estimate

        regs = self._sketch(["aa bb cc"] * 3)
        assert cms_estimate(regs, "zzznotpresent") <= 3


class TestMisraGries:
    def test_partial_summary_invariants(self):
        import re

        from quickner_ray.stages.sketch import _mg_partial

        texts = ["hot " * 40 + f"cold{i} warm warm" for i in range(30)]
        k = 5
        batch = pa.table({"text": pa.array(texts)})
        out = _mg_partial(batch, "text", k)
        true = {}
        for t in texts:
            for w in re.findall(r"[a-z0-9]+", t.lower()):
                true[w] = true.get(w, 0) + 1
        n = sum(true.values())
        assert out.num_rows <= k
        weights = dict(
            zip(out.column("token").to_pylist(), out.column("weight").to_pylist())
        )
        for tok, w in weights.items():
            assert 0 < w <= true[tok]
            # undercount bound: true - weight <= n/(k+1)
            assert true[tok] - w <= n / (k + 1)
        # every token over the guarantee threshold must appear
        for tok, c in true.items():
            if c * (k + 1) > n:
                assert tok in weights, tok

    @pytest.mark.usefixtures("ray_session")
    def test_heavy_hitters_exact_vs_brute(self):
        import re

        from quickner_ray.stages.sketch import MG_K, heavy_hitter_tokens

        import pyarrow.parquet as pq

        tab = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
        )
        true = {}
        for t in tab.column("text").to_pylist():
            for w in re.findall(r"[a-z0-9]+", t.lower()):
                true[w] = true.get(w, 0) + 1
        n = sum(true.values())
        expect = {
            w: c for w, c in true.items() if c * (MG_K + 1) > n
        }
        ds = rd.from_arrow(tab).repartition(4)
        got = heavy_hitter_tokens(ds)
        got_d = dict(
            zip(got.column("token").to_pylist(),
                got.column("n_occurrences").to_pylist())
        )
        assert got_d == expect


@pytest.mark.usefixtures("ray_session")
class TestGroupedHLL:
    def test_per_group_estimates_and_layout_invariance(self):
        from quickner_ray.stages.sketch import hll_registers_grouped

        rng = np.random.RandomState(5)
        # three groups with very different true cardinalities
        rows_g, rows_u = [], []
        true = {"a": 50, "b": 500, "c": 3000}
        for g, card in true.items():
            users = rng.randint(0, card * 10, size=card * 3) % card + (
                0 if g == "a" else 10**6 * (ord(g) - 96)
            )
            rows_g += [g] * len(users)
            rows_u += users.tolist()
        t = pa.table(
            {"g": pa.array(rows_g, pa.string()), "u": pa.array(rows_u, pa.int64())}
        )
        outs = []
        for nblocks in (1, 6):
            ds = rd.from_arrow(t).repartition(nblocks)
            regs = hll_registers_grouped(ds, "u", "g").take_all()
            outs.append(sorted((r["g"], r["bucket"], r["register"]) for r in regs))
        assert outs[0] == outs[1]  # parallelism-invariant registers
        # per-group estimates within HLL error
        for g, card in true.items():
            sub = [(r[1], r[2]) for r in outs[0] if r[0] == g]
            est = hll_estimate(sub)
            true_card = len(set(u for gg, u in zip(rows_g, rows_u) if gg == g))
            assert abs(est - true_card) / true_card < 0.1


@pytest.mark.usefixtures("ray_session")
class TestKMV:
    """KMV sketch (Beyer et al. 2007): k smallest distinct h64 hashes and
    the direct set-intersection estimate, vs brute-force references."""

    @staticmethod
    def _hashes(vals) -> np.ndarray:
        from quickner_ray.kernel.md5vec import md5_h64

        return np.unique(md5_h64(pa.array([str(v) for v in vals])))

    def _sketch(self, vals, k, parallelism=1):
        from quickner_ray.stages.sketch import kmv_sketch

        ds = rd.from_arrow(
            pa.table({"v": pa.array([str(v) for v in vals])})
        )
        if parallelism > 1:
            ds = ds.repartition(parallelism)
        out = kmv_sketch(ds, "v", k=k).take_all()
        return [r["h"] for r in out]

    def test_sketch_is_k_smallest_distinct(self):
        vals = [f"doc{i % 700}" for i in range(3_000)]  # dupes collapse
        got = self._sketch(vals, k=64)
        want = self._hashes(vals)[:64].tolist()
        assert got == want
        assert got == sorted(got)

    def test_small_set_sketch_is_complete(self):
        vals = [f"x{i}" for i in range(20)]
        got = self._sketch(vals, k=256)
        assert got == self._hashes(vals).tolist()

    def test_parallelism_invariant(self):
        vals = [f"doc{i}" for i in range(2_000)]
        assert self._sketch(vals, k=128, parallelism=1) == self._sketch(
            vals, k=128, parallelism=13
        )

    def test_overlap_exact_when_union_below_k(self):
        from quickner_ray.stages.sketch import kmv_overlap

        a = [f"d{i}" for i in range(80)]
        b = [f"d{i}" for i in range(50, 130)]
        dsa = rd.from_arrow(pa.table({"v": pa.array(a)}))
        dsb = rd.from_arrow(pa.table({"v": pa.array(b)}))
        row = kmv_overlap(dsa, dsb, "v", k=256).take_all()[0]
        assert row["n_a"] == 80 and row["n_b"] == 80
        assert row["n_union"] == 130
        assert row["n_shared"] == 30
        assert row["est_intersection"] == 30  # exact below k

    def test_overlap_estimate_within_tolerance(self):
        from quickner_ray.stages.sketch import kmv_overlap

        n, overlap, k = 20_000, 5_000, 512
        a = [f"d{i}" for i in range(n)]
        b = [f"d{i}" for i in range(n - overlap, 2 * n - overlap)]
        dsa = rd.from_arrow(pa.table({"v": pa.array(a)})).repartition(7)
        dsb = rd.from_arrow(pa.table({"v": pa.array(b)})).repartition(5)
        row = kmv_overlap(dsa, dsb, "v", k=k).take_all()[0]
        assert row["n_a"] == k and row["n_b"] == k and row["n_union"] == k
        # k=512 -> relative std ~1/sqrt(k) ~ 4.4%; allow 4 sigma
        assert abs(row["est_intersection"] - overlap) / overlap < 0.18


@pytest.mark.usefixtures("ray_session")
class TestKMVGrouped:
    def _run(self, rows, k, parallelism=1):
        from quickner_ray.stages.sketch import kmv_estimate_grouped

        t = pa.table(
            {
                "g": pa.array([g for g, _ in rows]),
                "v": pa.array([v for _, v in rows]),
            }
        )
        ds = rd.from_arrow(t)
        if parallelism > 1:
            ds = ds.repartition(parallelism)
        out = kmv_estimate_grouped(ds, "g", "v", k=k).take_all()
        return {r["g"]: r for r in out}

    def test_exact_below_k(self):
        rows = [("a", f"x{i % 7}") for i in range(100)] + [
            ("b", f"y{i}") for i in range(30)
        ]
        got = self._run(rows, k=64)
        assert got["a"]["est_distinct"] == 7 and got["a"]["n_sketch"] == 7
        assert got["b"]["est_distinct"] == 30

    def test_estimate_above_k(self):
        rows = [("big", f"v{i}") for i in range(20_000)]
        got = self._run(rows, k=512)
        est = got["big"]["est_distinct"]
        assert got["big"]["n_sketch"] == 512
        assert abs(est - 20_000) / 20_000 < 0.18  # ~4 sigma at k=512

    def test_parallelism_invariant(self):
        rows = [(f"g{i % 3}", f"v{i % 500}") for i in range(3_000)]
        assert self._run(rows, k=128) == self._run(rows, k=128, parallelism=11)

    def test_mixed_group_sizes_single_pass(self):
        rows = (
            [("hot", f"v{i}") for i in range(5_000)]
            + [("cold", "only")] * 50
        )
        got = self._run(rows, k=256, parallelism=6)
        assert got["cold"]["est_distinct"] == 1
        assert got["hot"]["n_sketch"] == 256
        assert abs(got["hot"]["est_distinct"] - 5_000) / 5_000 < 0.25
