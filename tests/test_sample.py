

def test_weighted_reservoir_sample_exact_and_biased(ray_session):
    """A-Res vs a brute-force reference on the same md5 uniforms;
    heavy weights must dominate the sample."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ferenda_ray.stages.sample import (md5_u64,
                                           weighted_reservoir_sample)

    n = 200
    w = np.where(np.arange(n) < 20, 100.0, 1.0)   # 20 heavy docs
    ds = rd.from_arrow(pa.table({
        "doc_id": list(range(n)),
        "wt": [float(x) for x in w]}))
    got = [r["doc_id"] for r in
           weighted_reservoir_sample(ds, k=10, weight_col="wt")
           .take_all()]
    # brute force: same keys, numpy top-k
    u = np.array([md5_u64(f"{i}:ares") for i in range(n)],
                 np.float64) / 2.0 ** 64
    key = u ** (1.0 / w)
    exp = sorted(np.argsort(-key)[:10])
    assert sorted(got) == [int(x) for x in exp]
    # the 10% heavy docs should take most of the k=10 slots
    assert sum(1 for d in got if d < 20) >= 7


def test_weighted_reservoir_zero_weight_never_wins(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ferenda_ray.stages.sample import weighted_reservoir_sample

    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "wt": [0.0, 0.0, 5.0, 5.0]}))
    got = {r["doc_id"] for r in
           weighted_reservoir_sample(ds, k=3, weight_col="wt")
           .take_all()}
    assert got == {3, 4}
