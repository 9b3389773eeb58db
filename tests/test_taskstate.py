"""task_stage: instance built once per process per (class, ctor) key; new
ctor args (incl. different ObjectRefs) get fresh instances."""

from __future__ import annotations

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
