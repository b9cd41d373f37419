"""Broadcast-state stage attachment: one policy for every stateful
``map_batches`` stage.

Two physical plans for the same logical stage (the pattern proven on
the entity linker and sameAs rewriter, where pool ramp-up dominated
small-state stages):

* **small state** → the callable is instantiated ONCE on the driver
  and pickled into the task closure; Ray caches the deserialized UDF
  per worker process, so the stage runs as plain tasks that scale to
  every free CPU with zero actor-pool ramp-up.
* **large state** (≥ ``actor_threshold_bytes``, or an explicit
  ``concurrency``) → ``ray.put`` the state once and hand the CLASS to
  ``map_batches(cls, concurrency=...)``; each actor fetches the ref in
  ``__init__`` — shipped once per actor, never per batch.

Stage classes opt in by accepting their state argument as either the
raw value or a ``ray.ObjectRef`` (resolve via :func:`resolve`).
"""

from __future__ import annotations

import pickle


def resolve(state):
    """``ObjectRef`` → value (inside an actor ``__init__``); value →
    itself (task-closure path)."""
    import ray
    if isinstance(state, ray.ObjectRef):
        return ray.get(state)
    return state


def stateful_map(ds, cls, state, state_key: str = "ref",
                 ctor_kwargs: dict | None = None,
                 batch_size: int = 8192, concurrency=None,
                 actor_threshold_bytes: int = 32 << 20,
                 **map_kwargs):
    """Attach ``cls`` (a per-batch callable class whose ``__init__``
    takes ``state_key``) to ``ds`` with the physical plan picked by
    state size.  ``concurrency`` forces the actor-pool path."""
    import ray
    ctor_kwargs = ctor_kwargs or {}
    if concurrency is None:
        try:
            small = len(pickle.dumps(state)) < actor_threshold_bytes
        except Exception:
            small = False
        if small:
            fn = cls(**{state_key: state}, **ctor_kwargs)
            return ds.map_batches(fn, batch_format="pyarrow",
                                  batch_size=batch_size, **map_kwargs)
        concurrency = (1, 8)
    ref = ray.put(state)
    return ds.map_batches(
        cls, fn_constructor_kwargs={state_key: ref, **ctor_kwargs},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, **map_kwargs)
