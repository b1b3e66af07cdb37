"""Fake-mesh plumbing test for bench.py --scaling (VERDICT round-4 item 5):
per-device work and collective counts are asserted; wall-clock is not (the
8-device CPU mesh's timings are meaningless)."""
import importlib.util
import os

import jax


def _load_bench():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(repo, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_scaling_bench_fake_mesh():
    bench = _load_bench()
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    out = bench.bench_scaling(device_counts=[1, 2, 8], n_chains=32,
                              n_samples=3, n_leapfrog=3, verify=True)
    assert out["metric"] == "hmc_samples_per_sec_scaling"
    pts = out["points"]
    assert [p["devices"] for p in pts] == [1, 2, 8]
    for p in pts:
        assert p["chains"] % p["devices"] == 0
        assert p["samples_per_sec"] > 0
        assert p["efficiency_vs_1dev"] > 0
    assert pts[0]["efficiency_vs_1dev"] == 1.0
