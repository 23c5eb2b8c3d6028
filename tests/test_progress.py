"""Live per-stage progress counters (the CacheSaturation analogue,
PageCachedFile.cs:80-84): readable mid-run, exact at completion, and
resilient to the named-actor lifetime trap (a get_actor handle must never
replace the creation handle)."""

import pyarrow as pa


def test_progress_counters_track_rows(ray_session, tmp_path):
    import ray.data as rd

    from sick_ray.config import DedupConfig
    from sick_ray.pipelines.dedup import run_dedup
    from sick_ray.state import progress
    from sick_ray.synth import generate_webtext

    a = progress.ensure_actor()
    # ensure_actor must be idempotent AND keep the same live actor
    b = progress.ensure_actor()
    assert a._actor_id == b._actor_id
    import ray

    ray.get(a.reset.remote())

    tbl, _, _, _ = generate_webtext(300, seed=11)
    res = run_dedup(rd.from_arrow(tbl), DedupConfig(num_partitions=4,
                                                    minhash_concurrency=2))
    res.clusters.materialize()
    rows, totals = progress.snapshot()
    assert rows.get("extract") == 300
    assert rows.get("minhash") == 300
    assert rows.get("attach") == 300
    assert totals.get("attach") == 300
    line = progress.format_line(rows, totals)
    assert "attach=300/300 (100%)" in line


def test_progress_resets_between_runs(ray_session):
    """A second pipeline run in the same Ray session must start its
    counters from zero — the named actor outlives runs, and without the
    per-run reset saturation reads 200% on the second run (bench.py runs
    run_dedup twice per process)."""
    import ray.data as rd

    from sick_ray.config import DedupConfig
    from sick_ray.pipelines.dedup import run_dedup
    from sick_ray.state import progress
    from sick_ray.synth import generate_webtext

    tbl, _, _, _ = generate_webtext(200, seed=13)
    cfg = DedupConfig(num_partitions=4, minhash_concurrency=2)
    for _ in range(2):
        res = run_dedup(rd.from_arrow(tbl), cfg)
        res.clusters.materialize()
    rows, totals = progress.snapshot()
    assert rows.get("extract") == 200          # not 400
    assert rows.get("attach") == 200
    assert "(100%)" in progress.format_line(rows, totals)


def test_counted_swallows_missing_actor(ray_session):
    """counted() must never fail the wrapped stage when the actor is gone."""
    from sick_ray.state import progress

    fn = progress.counted("nope_stage_xyz", lambda b: b)
    t = pa.table({"x": [1, 2, 3]})
    # no actor named for this stage update path — still returns the batch
    assert fn(t).num_rows == 3
