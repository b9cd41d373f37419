"""ferenda_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the query / data-processing
capabilities of staffanm/ferenda (download → parse → relate → generate)
as idiomatic ``ray.data.Dataset`` pipelines over Arrow batches:

1. stateless ``map_batches`` triple extraction (FSM structure
   recognition + citation scanning + COIN-style URI minting),
2. an actor-pool entity-linking stage holding a broadcast alias/label
   dictionary,
3. canonicalization: exact triple dedup + ``owl:sameAs`` union-find,
4. materialization as sorted, partitioned N-Triples/Parquet shards with
   per-partition lineage manifests and checkpoint-resume.

Reference semantics are cited per-module as ``/root/reference`` file:line.
Nothing in here calls ``ray.init()`` — sessions are owned by the caller
(tests' conftest fixture, ``bench.py``, or the driver).
"""

__version__ = "0.1.0"

import os as _os
import sys as _sys

# Polars sizes its global thread pool to the MACHINE's core count at
# import time — inside a 1-CPU Ray worker that means 32 workers × 32
# threads of oversubscription (measured: up to 1.7× end-to-end
# slowdown and large run-to-run variance).  Cap it before polars is
# first imported anywhere in the process; harmless on the driver
# (polars hot loops all run inside workers).
if "polars" not in _sys.modules:
    _os.environ.setdefault("POLARS_MAX_THREADS", "1")

from ferenda_ray import ns  # noqa: F401
from ferenda_ray.uri import URISpace, Template  # noqa: F401
from ferenda_ray.fsm import FSMParser, FSMStateError  # noqa: F401
