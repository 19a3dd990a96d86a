"""raycfg patch behavior: the version-gated Ray-internal patches must
(a) actually install, (b) keep their contracts, and (c) restore state.

These guard against silent Ray-upgrade drift: if the internals move, the
patches deliberately no-op — these tests then FAIL, flagging that the
perf fixes are gone (re-evaluate against the new Ray, don't just skip).
"""
import pyarrow as pa
import pytest


def test_sort_sample_patch_draws_more(ray_session):
    """The patched _sample_block must draw max(20x, 100) of the asked
    sample count (Ray's 10-per-reducer default gives +-30% reduce
    partition sizes — see NOTES_r4)."""
    from ray.data._internal.planner.exchange import sort_task_spec as sts
    from ray.data._internal.planner.exchange.sort_task_spec import SortKey

    block = pa.table({"part": pa.array(list(range(10_000)), type=pa.int32())})
    out = sts._sample_block(block, 5, SortKey("part"))
    assert len(out) >= 100  # 5 asked -> floor of 100


def test_skip_parquet_sampling_scoped_and_restores(ray_session, tmp_path):
    """Inside the scope: no fragment decode, flag off.  Outside: original
    sampler runs and the flag is restored."""
    from ray.data import DataContext

    from csvweb_ray.raycfg import skip_parquet_sampling

    ctx = DataContext.get_current()
    before = ctx.decoding_size_estimation
    with skip_parquet_sampling():
        assert ctx.decoding_size_estimation is False
        import ray.data as rd
        import pyarrow.parquet as pq

        p = tmp_path / "t.parquet"
        pq.write_table(pa.table({"a": list(range(100))}), p)
        ds = rd.read_parquet(str(p))
        assert ds.count() == 100  # read works with the skipped sample
    assert ctx.decoding_size_estimation == before


def test_skip_parquet_sampling_nests(ray_session):
    from ray.data import DataContext

    from csvweb_ray.raycfg import skip_parquet_sampling

    ctx = DataContext.get_current()
    before = ctx.decoding_size_estimation
    with skip_parquet_sampling():
        with skip_parquet_sampling():
            assert ctx.decoding_size_estimation is False
        # inner exit must not re-enable sampling for the outer scope
        from csvweb_ray import raycfg

        assert getattr(raycfg._SKIP_SAMPLING, "on", False) is True
    assert getattr(raycfg._SKIP_SAMPLING, "on", False) is False
    assert ctx.decoding_size_estimation == before


def test_fat_corpus_scan_still_correct(ray_session, tmp_path):
    """scan_corpus's sampling-skipped fat read returns every row/column."""
    import pyarrow.parquet as pq

    from csvweb_ray.pipeline.stages import scan_corpus

    t = pa.table({
        "repo": ["r"] * 50, "path": [f"f{i}.csv" for i in range(50)],
        "commit": ["c"] * 50, "lang": ["csv"] * 50,
        "content": ["x,y\n1,2"] * 50,
    })
    p = tmp_path / "corpus.parquet"
    pq.write_table(t, p)
    ds = scan_corpus(str(p))
    out = ds.take_all()
    assert len(out) == 50
    assert set(out[0]) == set(t.schema.names)
