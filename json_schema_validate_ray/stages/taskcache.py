"""Worker-process-level stage caching for stateless-ish map_batches tasks.

An actor pool pays pool-startup latency and pins CPU slots; for stages whose
``__init__`` is cheap (a regex, a tiny RNG, a compiled plan) that price buys
nothing.  ``cached_stage`` returns a plain function usable with task-based
``map_batches``: Ray reuses worker processes across tasks, so the stage
instance (and any per-instance cache, e.g. token-hash dictionaries) is built
once per worker process and reused — actor-grade amortization with elastic
task scheduling and read-stage operator fusion.

Use an actor pool instead when construction is genuinely expensive (model
weights, multi-GB broadcast state).
"""

from __future__ import annotations

import pickle

_INSTANCES: dict[bytes, object] = {}


def cached_stage(cls, **kwargs):
    """Return ``fn(batch)`` that lazily builds ``cls(**kwargs)`` once per
    worker process (keyed by class + kwargs) and delegates to it."""
    key = pickle.dumps((cls.__module__, cls.__qualname__, sorted(kwargs.items())),
                       protocol=4)

    def stage_fn(batch):
        inst = _INSTANCES.get(key)
        if inst is None:
            inst = cls(**kwargs)
            _INSTANCES[key] = inst
        return inst(batch)

    stage_fn.__name__ = f"cached_{cls.__name__}"
    return stage_fn
