"""Task-based stateful stages for LIGHT broadcast state.

``map_batches(Cls, concurrency=N)`` actor pools are the right shape for
heavy exclusive state (a compiled 50k-pattern automaton, a model): setup
runs once per actor and the pool bounds how many copies exist. But for
light state — a zero-copy Arrow lookup table fetched from the object store,
a stopword dict — the pool's spin-up (~1 s per actor, per pipeline) costs
far more than the state, and Ray Data task workers already persist per
worker PROCESS. ``task_stage`` wraps a callable-class stage as a plain task
function whose instance is built once per worker process via a module-level
cache: identical setup-once-per-worker semantics, zero actor-pool overhead,
and the stage scales with whatever worker count the scheduler picks.

Broadcast objects stay broadcast: ``ray.ObjectRef`` constructor args are
resolved inside the worker (plasma-local, zero-copy for Arrow), exactly as
in the actor form.
"""

from __future__ import annotations

_CACHE: dict = {}


def task_stage(cls, **ctor):
    """Callable class + constructor kwargs -> plain ``map_batches`` function
    with a once-per-worker-process instance. Constructor kwargs must be
    picklable; ``ray.ObjectRef`` values key the cache by their hex id."""
    import ray

    parts = [cls.__module__, cls.__qualname__]
    for k, v in sorted(ctor.items()):
        parts.append(k)
        parts.append(v.hex() if isinstance(v, ray.ObjectRef) else repr(v))
    key = tuple(parts)

    def fn(batch):
        # resolve the cache through the module at CALL time, never as a
        # captured global: cloudpickle serializes closure globals by value,
        # so closing over _CACHE would ship every previously-built stage
        # instance (stale automatons, other pipelines' state — possibly
        # classes from modules the worker can't import) with every task
        from quickner_ray.stages.taskstate import _CACHE as cache

        inst = cache.get(key)
        if inst is None:
            inst = cache[key] = cls(**ctor)
        return inst(batch)

    fn.__name__ = f"task_{cls.__name__}"
    fn.__qualname__ = fn.__name__
    return fn
