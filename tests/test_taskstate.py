"""task_stage: instance built once per process per (class, ctor) key; new
ctor args (incl. different ObjectRefs) get fresh instances."""

from __future__ import annotations

import pytest

from quickner_ray.stages.taskstate import _CACHE, task_stage


class Counting:
    builds = 0

    def __init__(self, tag="x"):
        Counting.builds += 1
        self.tag = tag

    def __call__(self, batch):
        return {"tag": [self.tag] * len(batch["v"])}


def test_instance_cached_per_key():
    Counting.builds = 0
    fn = task_stage(Counting, tag="a")
    fn({"v": [1]})
    fn({"v": [2]})
    assert Counting.builds == 1  # one instance across calls
    fn2 = task_stage(Counting, tag="b")
    fn2({"v": [1]})
    assert Counting.builds == 2  # different ctor args -> fresh instance
    # same args -> same cache slot even via a new wrapper
    fn3 = task_stage(Counting, tag="a")
    fn3({"v": [3]})
    assert Counting.builds == 2


def test_objectref_keys_cache_by_identity(ray_session):
    import ray

    Counting.builds = 0
    r1 = ray.put("a")
    r2 = ray.put("a")  # equal payload, different object -> different key
    keys_before = len(_CACHE)
    task_stage(Counting, tag=r1)  # building the fn does not build the instance
    assert len(_CACHE) == keys_before
    f1, f2 = task_stage(Counting, tag=r1), task_stage(Counting, tag=r2)
    f1({"v": [1]}); f2({"v": [1]})
    assert Counting.builds == 2


class TestStreamingIngestDedup:
    """Sharded mutable registry: survivor set is arrival-order and
    parallelism independent (min-merge algebra), equals the batch dedup."""

    @pytest.mark.usefixtures("ray_session")
    def test_order_and_shard_invariance(self):
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.stages.ingest import streaming_ingest_dedup

        texts = ["alpha", "beta", "alpha", "gamma", "beta", "alpha", "", ""]
        ids = [7, 3, 2, 9, 11, 5, 13, 4]
        rows = [{"doc_id": i, "text": t} for i, t in zip(ids, texts)]

        def run(row_order, n_shards, parallelism):
            ds = rd.from_items([rows[j] for j in row_order]).repartition(parallelism)
            out = streaming_ingest_dedup(ds, n_shards=n_shards).take_all()
            return sorted(
                (r["text_hash"], r["keep_doc_id"], r["n_dupes"]) for r in out
            )

        base = run(range(len(rows)), n_shards=3, parallelism=2)
        assert run(list(reversed(range(len(rows)))), 1, 4) == base
        assert run([3, 1, 5, 0, 7, 2, 6, 4], 5, 1) == base
        by_min = {k: (m, n) for k, m, n in base}
        # alpha survives as min id 2 with 3 arrivals; empty text dedups too
        assert (2, 3) in by_min.values()
        assert (4, 2) in by_min.values()
        assert len(base) == 4  # alpha, beta, gamma, ""
