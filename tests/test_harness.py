"""Checkpoint roundtrip, CLI smoke, bench contract, graft entry points."""

import json
import os
import subprocess
import sys

import jax
import numpy as np

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.utils import checkpoint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def small_cfg(**kw):
    base = dict(n=128, radius=8.0, particle_radius=2.0, block_n=128,
                gravity_solver="direct")
    base.update(kw)
    return psph.default(**base)


def test_checkpoint_roundtrip(tmp_path):
    cfg = small_cfg()
    st = planet.prime(ics.jupiter(cfg), cfg)
    st = planet.run(st, cfg, 3)
    p = str(tmp_path / "ck.npz")
    checkpoint.save(p, st, cfg, step=3)
    st2, cfg2, step = checkpoint.load(p)
    assert step == 3 and cfg2 == cfg
    for name in ("pos", "vel", "rho", "h", "n_neighbors"):
        np.testing.assert_array_equal(np.asarray(getattr(st, name)),
                                      np.asarray(getattr(st2, name)))
    # resuming produces identical trajectories
    a = planet.run(st, cfg, 2)
    b = planet.run(st2, cfg2, 2)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))


def _run_cli(args, **kw):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # keep the TPU PJRT sitecustomize from registering in the subprocess
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run(
        [sys.executable, "-m", "planetmodel_sph_tpu.cli"] + args,
        capture_output=True, text=True, cwd=REPO, env=env, timeout=600, **kw)


def test_cli_run_and_resume(tmp_path):
    ck = str(tmp_path / "s.npz")
    r = _run_cli(["run", "--n", "128", "--steps", "10", "--diag-every", "5",
                  "--checkpoint", ck,
                  "--metrics-jsonl", str(tmp_path / "m.jsonl")])
    assert r.returncode == 0, r.stderr
    assert "steps/s" in r.stderr
    assert os.path.exists(ck)
    rows = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert len(rows) == 2 and "total_energy" in rows[0]

    r2 = _run_cli(["run", "--restore", ck, "--steps", "5", "--diag-every", "5"])
    assert r2.returncode == 0, r2.stderr
    assert "restored" in r2.stderr


def test_cli_bench_prints_one_json_line(tmp_path):
    r = _run_cli(["bench", "--n", "128", "--steps", "5"])
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1
    row = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in row


def test_render(tmp_path):
    from planetmodel_sph_tpu.utils import render
    cfg = small_cfg()
    st = ics.jupiter(cfg)
    out = render.render_png(st, str(tmp_path / "f.png"))
    assert os.path.getsize(out) > 1000


def test_render_material_colors(tmp_path):
    """color_by='material': categorical per-matid colors + named legend
    (mixed-material states; a continuous colormap washes the ids out)."""
    from planetmodel_sph_tpu.utils import render
    cfg = psph.basalt_impact(n=256)
    st = ics.two_planet_collision(cfg, separation=2.0e7,
                                  approach_speed=2.0e4,
                                  materials=("basalt", "ice"))
    out = render.render_png(st, str(tmp_path / "m.png"),
                            color_by="material")
    assert os.path.getsize(out) > 1000


def test_graft_entry_single_chip():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.pop(0)
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert bool(jax.numpy.all(jax.numpy.isfinite(out.pos)))


def test_graft_dryrun_multichip():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.pop(0)
    ge.dryrun_multichip(8)


def test_graft_dryrun_multichip_clean_env():
    """Dryrun must pass WITHOUT conftest's env scaffolding.

    Round 1's driver run failed exactly here: conftest forced the CPU mesh so
    the in-process test passed while the driver's identical call initialized
    the session's relay TPU plugin and died on a libtpu version skew.
    dryrun_multichip must force the virtual CPU mesh itself, so exercise it
    in a subprocess whose env carries none of the test overrides.
    """
    env = dict(os.environ)
    for k in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_NUM_CPU_DEVICES"):
        env.pop(k, None)
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout
