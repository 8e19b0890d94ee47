"""Native C++ runtime: PSPH1 snapshot roundtrip, corruption detection."""

import os

import numpy as np
import pytest

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.models import ics
from planetmodel_sph_tpu.runtime import native, snapshot
from planetmodel_sph_tpu.utils import checkpoint

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def small_cfg():
    return psph.default(n=64, radius=6.0, particle_radius=1.8,
                        gravity_solver="none")


def test_snapshot_roundtrip(tmp_path):
    cfg = small_cfg()
    st = ics.jupiter(cfg)
    p = str(tmp_path / "s.psph")
    assert snapshot.save(p, st, cfg, step=7)
    st2, cfg2, step = snapshot.load(p)
    assert step == 7 and cfg2 == cfg
    np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(st2.pos))
    np.testing.assert_array_equal(np.asarray(st.n_neighbors),
                                  np.asarray(st2.n_neighbors))


def test_checkpoint_dispatches_psph(tmp_path):
    cfg = small_cfg()
    st = ics.jupiter(cfg)
    p = str(tmp_path / "c.psph")
    checkpoint.save(p, st, cfg, step=3)
    with open(p, "rb") as f:
        assert f.read(5) == b"PSPH1"
    st2, cfg2, step = checkpoint.load(p)
    assert step == 3
    np.testing.assert_array_equal(np.asarray(st.vel), np.asarray(st2.vel))


def test_corruption_detected(tmp_path):
    cfg = small_cfg()
    st = ics.jupiter(cfg)
    p = str(tmp_path / "s.psph")
    assert snapshot.save(p, st, cfg)
    size = os.path.getsize(p)
    with open(p, "r+b") as f:          # flip a byte inside the first frame
        f.seek(size // 2)
        b = f.read(1)
        f.seek(size // 2)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(IOError):
        snapshot.load(p)


def test_native_lib_builds():
    assert native.available()
    assert os.path.exists(native.lib_path())
