"""Generic resumable partitioned sink: manifests, resume skip,
deterministic shard content, round-trip."""

import os
import shutil

import pyarrow as pa
import pytest

from ferenda_ray.stages import sinks


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "out")


def _docs(n=200):
    return pa.table({"doc_id": list(range(n)),
                     "text": [f"doc {i} body" for i in range(n)]})


def test_write_read_round_trip(ray_session, out_dir):
    import ray.data as rd
    man = sinks.write_partitioned(rd.from_arrow(_docs()), out_dir,
                                  "doc_id", num_buckets=8)
    assert man.num_rows == 8
    assert sum(man.column("rows").to_pylist()) == 200
    back = sinks.read_partitioned(out_dir).take_all()
    assert sorted(r["doc_id"] for r in back) == list(range(200))
    # manifests on disk, one per bucket
    assert len(os.listdir(os.path.join(out_dir, "_manifest"))) >= 8


def test_resume_skips_finished_buckets(ray_session, out_dir):
    import ray.data as rd
    ds = rd.from_arrow(_docs()).materialize()
    first = sinks.write_partitioned(ds, out_dir, "doc_id",
                                    num_buckets=8)
    shas = dict(zip(first.column("partition").to_pylist(),
                    first.column("content_sha256").to_pylist()))
    # rerun: everything finished -> nothing rewritten
    again = sinks.write_partitioned(ds, out_dir, "doc_id",
                                    num_buckets=8)
    assert again.num_rows == 0
    # delete ONE manifest -> exactly that bucket is redone, content
    # identical (deterministic within-bucket sort)
    victim = sorted(shas)[3]
    os.remove(os.path.join(out_dir, "_manifest",
                           victim + ".json"))
    redo = sinks.write_partitioned(ds, out_dir, "doc_id",
                                   num_buckets=8)
    assert redo.column("partition").to_pylist() == [victim]
    assert redo.column("content_sha256")[0].as_py() == shas[victim]


def test_user_bucket_column_round_trips(ray_session, out_dir):
    """ADVICE r4: a user table that legitimately contains a 'bucket'
    column must survive write_partitioned → read_partitioned (the
    hive-partition drop must not eat it)."""
    import ray.data as rd
    t = pa.table({"doc_id": list(range(20)),
                  "bucket": [f"b{i % 3}" for i in range(20)]})
    sinks.write_partitioned(rd.from_arrow(t), out_dir, "doc_id",
                            num_buckets=4)
    back = sinks.read_partitioned(out_dir).take_all()
    assert sorted((r["doc_id"], r["bucket"]) for r in back) == \
        sorted((i, f"b{i % 3}") for i in range(20))


def test_content_sha_covers_all_columns(ray_session, out_dir):
    """ADVICE r4: the manifest digest must change when NON-key values
    change (it used to hash only the key column)."""
    import ray.data as rd
    a = sinks.write_partitioned(rd.from_arrow(_docs(50)), out_dir,
                                "doc_id", num_buckets=4)
    other = pa.table({"doc_id": list(range(50)),
                      "text": [f"doc {i} REVISED" for i in range(50)]})
    out2 = out_dir + "_v2"
    b = sinks.write_partitioned(rd.from_arrow(other), out2,
                                "doc_id", num_buckets=4)
    sa = dict(zip(a.column("partition").to_pylist(),
                  a.column("content_sha256").to_pylist()))
    sb = dict(zip(b.column("partition").to_pylist(),
                  b.column("content_sha256").to_pylist()))
    assert set(sa) == set(sb)
    assert all(sa[p] != sb[p] for p in sa)   # same keys, new values


def test_layout_guard_rejects_bucket_count_change(ray_session, out_dir):
    import ray.data as rd
    sinks.write_partitioned(rd.from_arrow(_docs(50)), out_dir,
                            "doc_id", num_buckets=4)
    with pytest.raises(Exception):
        sinks.write_partitioned(rd.from_arrow(_docs(50)), out_dir,
                                "doc_id", num_buckets=8)


def test_string_keys_and_custom_sort(ray_session, out_dir):
    import ray.data as rd
    t = pa.table({"word": [f"w{i:03d}" for i in range(40)],
                  "n": list(range(40))})
    man = sinks.write_partitioned(rd.from_arrow(t), out_dir, "word",
                                  num_buckets=4,
                                  sort_by=["n"])
    assert sum(man.column("rows").to_pylist()) == 40
    back = sinks.read_partitioned(out_dir).take_all()
    assert sorted(r["word"] for r in back) == sorted(
        f"w{i:03d}" for i in range(40))


def test_cleaning_pipeline_into_resumable_sink(ray_session, out_dir):
    # the composed path a 100-TB cleaning job takes: substring-dedup
    # removal -> resumable partitioned sink; rerun resumes to zero work
    import ray.data as rd

    from ferenda_ray.stages.dedup import remove_duplicated_spans
    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    cleaned = remove_duplicated_spans(docs, n=16).materialize()
    man = sinks.write_partitioned(cleaned, out_dir, "doc_id",
                                  num_buckets=6)
    assert sum(man.column("rows").to_pylist()) == docs.count()
    back = sinks.read_partitioned(out_dir)
    assert back.count() == docs.count()
    assert set(back.schema().names) == {"doc_id", "clean_text",
                                        "n_removed"}
    # resume: nothing left to write
    assert sinks.write_partitioned(cleaned, out_dir, "doc_id",
                                   num_buckets=6).num_rows == 0


def test_upsert_rewrites_only_affected_buckets(ray_session, out_dir):
    import ray.data as rd
    base = _docs(200)
    sinks.write_partitioned(rd.from_arrow(base), out_dir, "doc_id",
                            num_buckets=8)
    before = {p: open(os.path.join(out_dir, p, "part.parquet"),
                      "rb").read()
              for p in os.listdir(out_dir) if p.startswith("bucket=")}
    # delta: update 2 docs, add 1 new
    delta = pa.table({"doc_id": [5, 17, 1000],
                      "text": ["updated five", "updated seventeen",
                               "brand new"]})
    man = sinks.upsert_partitioned(rd.from_arrow(delta), out_dir,
                                   "doc_id")
    touched = set(man.column("partition").to_pylist())
    assert 1 <= len(touched) <= 3
    back = {r["doc_id"]: r["text"]
            for r in sinks.read_partitioned(out_dir).take_all()}
    assert len(back) == 201
    assert back[5] == "updated five"
    assert back[17] == "updated seventeen"
    assert back[1000] == "brand new"
    assert back[6] == "doc 6 body"           # untouched row survives
    # untouched buckets are byte-identical
    for p, blob in before.items():
        if p not in touched:
            assert open(os.path.join(out_dir, p, "part.parquet"),
                        "rb").read() == blob


def test_upsert_aggregate_equals_full_recompute(ray_session, out_dir):
    # rollup (key -> cnt, total) maintained incrementally over two
    # deltas must equal the single-shot rollup over all rows; only
    # buckets containing delta keys are rewritten
    import polars as pl
    import ray.data as rd

    def rollup(rows):
        df = (pl.DataFrame(rows)
              .group_by("k").agg(pl.len().cast(pl.Int64).alias("cnt"),
                                 pl.col("v").sum().alias("total"))
              .select(["k", "cnt", "total"]))
        return rd.from_arrow(df.to_arrow())

    rows = [{"k": f"key{i % 37}", "v": float(i)} for i in range(400)]
    base, delta = rows[:300], rows[300:]

    sinks.write_partitioned(rollup(base), out_dir, "k", num_buckets=8)
    sinks.upsert_aggregate(rollup(delta), out_dir, "k",
                           sum_cols=["cnt", "total"])

    got = {r["k"]: (r["cnt"], r["total"])
           for r in sinks.read_partitioned(out_dir).take_all()}
    want = {r["k"]: (r["cnt"], r["total"])
            for r in rollup(rows).take_all()}
    assert got == want


def test_upsert_aggregate_untouched_buckets_byte_identical(
        ray_session, out_dir):
    import glob
    import hashlib as hl

    import polars as pl
    import ray.data as rd

    def ds_of(items):
        df = pl.DataFrame(items)
        return rd.from_arrow(df.to_arrow())

    base = [{"k": f"key{i}", "cnt": 1, "total": float(i)}
            for i in range(64)]
    sinks.write_partitioned(ds_of(base), out_dir, "k", num_buckets=8)
    before = {p: hl.sha256(open(p, "rb").read()).hexdigest()
              for p in glob.glob(f"{out_dir}/bucket=*/part.parquet")}
    # one-key delta touches exactly one bucket
    sinks.upsert_aggregate(ds_of([{"k": "key3", "cnt": 2,
                                   "total": 10.0}]),
                           out_dir, "k", sum_cols=["cnt", "total"])
    after = {p: hl.sha256(open(p, "rb").read()).hexdigest()
             for p in glob.glob(f"{out_dir}/bucket=*/part.parquet")}
    changed = [p for p in before if before[p] != after[p]]
    assert len(changed) == 1
    got = {r["k"]: (r["cnt"], r["total"])
           for r in sinks.read_partitioned(out_dir).take_all()}
    assert got["key3"] == (3, 13.0)


def test_rebucket_preserves_content(ray_session, out_dir, tmp_path):
    import polars as pl
    import ray.data as rd
    rows = [{"k": f"key{i}", "v": i} for i in range(100)]
    ds = rd.from_arrow(pl.DataFrame(rows).to_arrow())
    sinks.write_partitioned(ds, out_dir, "k", num_buckets=8)
    new_dir = str(tmp_path / "rebucketed")
    sinks.rebucket_partitioned(out_dir, new_dir, new_num_buckets=3)
    import glob
    assert len(glob.glob(f"{new_dir}/bucket=*/part.parquet")) == 3
    got = sorted((r["k"], r["v"]) for r in
                 sinks.read_partitioned(new_dir).take_all())
    assert got == sorted((r["k"], r["v"]) for r in rows)
    # the source layout is untouched
    assert len(glob.glob(f"{out_dir}/bucket=*/part.parquet")) == 8
    # the new layout is itself resumable: a rerun rewrites nothing
    import os
    mt = {p: os.path.getmtime(p)
          for p in glob.glob(f"{new_dir}/bucket=*/part.parquet")}
    sinks.rebucket_partitioned(out_dir, new_dir, new_num_buckets=3)
    assert all(os.path.getmtime(p) == mt[p] for p in mt)
