"""Live browser viewer: endpoints serve the pushed frame + diagnostics."""

import json
import urllib.request

import planetmodel_sph_tpu as psph
from planetmodel_sph_tpu.models import ics, planet
from planetmodel_sph_tpu.utils import diagnostics
from planetmodel_sph_tpu.utils.liveview import LiveViewer


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=10) as r:
        return r.status, r.read()


def test_liveview_serves_frame_and_diag():
    cfg = psph.default(n=128, radius=10.0, particle_radius=4.0,
                       gravity_solver="direct", neighbor_mode="dense",
                       block_n=128, adaptive_h=False)
    state = planet.prime(ics.jupiter(cfg), cfg)
    v = LiveViewer(0)          # port 0: bind a free port
    try:
        d = {k: float(x) for k, x in diagnostics.measure(state, cfg).items()}
        d["step"] = 7
        v.update(state, d)
        code, body = _get(v.port, "/")
        assert code == 200 and b"live view" in body.lower()
        code, png = _get(v.port, "/frame.png")
        assert code == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"
        code, dj = _get(v.port, "/diag.json")
        got = json.loads(dj)
        assert got["step"] == 7
        assert abs(got["mass"] - 100.0) < 1e-3
        # WebGL point-cloud frame: header + f32 [scale, pos, color, h]
        code, pts = _get(v.port, "/points.bin")
        assert code == 200
        import struct
        n, _ = struct.unpack("<II", pts[:8])
        assert n == 128
        assert len(pts) == 8 + 4 * (1 + 5 * n)
        # the interactive viewer is wired into the page
        code, body = _get(v.port, "/")
        assert b"points.bin" in body and b"getContext" in body
    finally:
        v.close()
