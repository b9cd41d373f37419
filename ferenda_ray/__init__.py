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

from ferenda_ray import ns  # noqa: F401
from ferenda_ray.uri import URISpace, Template  # noqa: F401
from ferenda_ray.fsm import FSMParser, FSMStateError  # noqa: F401
