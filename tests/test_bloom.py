# -*- coding: utf-8 -*-
"""Bloom filter: no false negatives, bounded false positives, merge
associativity, broadcast Ray stage."""

import numpy as np
import pyarrow as pa

from ferenda_ray.state.bloom import (
    BloomFilter, bloom_filter_stage, bloom_from_dataset,
)


def test_no_false_negatives_and_fpr():
    keys = [f"k{i}" for i in range(5000)]
    f = BloomFilter.sized(5000, fpr=0.01).add_many(keys)
    assert f.contains_many(keys).all()
    probes = [f"x{i}" for i in range(20000)]
    fp = f.contains_many(probes).mean()
    assert fp < 0.03, fp  # ~1% target with slack


def test_merge_equals_union():
    a = BloomFilter(1 << 14, 5).add_many([f"a{i}" for i in range(1000)])
    b = BloomFilter(1 << 14, 5).add_many([f"b{i}" for i in range(1000)])
    u = BloomFilter(1 << 14, 5).add_many(
        [f"a{i}" for i in range(1000)] + [f"b{i}" for i in range(1000)])
    m = BloomFilter.loads(a.dumps()).merge(BloomFilter.loads(b.dumps()))
    assert (m.bits == u.bits).all()


def test_ray_bloom_semi_filter(ray_session):
    import ray.data as rd
    keep = rd.from_arrow(pa.table({"k": [f"id{i}" for i in range(500)]}))
    facts = rd.from_arrow(pa.table({
        "k": [f"id{i}" for i in range(400, 1400)],
        "v": list(range(1000))}))
    bloom = bloom_from_dataset(keep, "k", capacity=500, fpr=0.01)
    out = bloom_filter_stage(facts, "k", bloom).take_all()
    got = {r["k"] for r in out}
    want = {f"id{i}" for i in range(400, 500)}
    assert want <= got                 # no false negatives
    assert len(got) <= len(want) + 25  # few false positives
