"""Binary snapshot format (PSPH1) over the native async writer.

Higher-throughput alternative to npz for big states: raw field frames with
CRC32, streamed to disk by a background C++ thread so the simulation loop
never blocks on I/O. Falls back to npz via utils.checkpoint when the native
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import dataclasses
import json

import numpy as np

from . import native
from ..config import SimConfig
from ..state import ParticleState


def save(path: str, state: ParticleState, cfg: SimConfig, step: int = 0):
    """Write a PSPH1 snapshot; returns True on success, False if native
    runtime is unavailable (caller should fall back to npz)."""
    lib = native.load()
    if lib is None:
        return False
    fields = [(f.name, np.ascontiguousarray(getattr(state, f.name)))
              for f in dataclasses.fields(state)]
    header = json.dumps({
        "format": "PSPH1",
        "step": step,
        "config": dataclasses.asdict(cfg),
        "fields": [
            {"name": n, "dtype": str(a.dtype), "shape": list(a.shape)}
            for n, a in fields
        ],
    })
    w = lib.psph_writer_open(path.encode(), header.encode())
    if not w:
        return False
    ok = True
    for _, a in fields:
        rc = lib.psph_writer_write(
            w, a.ctypes.data_as(ctypes.c_void_p), a.nbytes)
        ok = ok and rc == 0
    # close unconditionally (joins the flush thread and releases the FILE*
    # even after a failed frame, so a fallback writer can't interleave)
    rc_close = lib.psph_writer_close(w)
    return ok and rc_close == 0


def load(path: str):
    """Read a PSPH1 snapshot -> (state, cfg, step); raises on corruption."""
    lib = native.load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    r = lib.psph_reader_open(path.encode())
    if not r:
        raise IOError(f"not a PSPH1 snapshot: {path}")
    try:
        hlen = lib.psph_reader_header(r, None, 0)
        buf = ctypes.create_string_buffer(hlen + 1)
        lib.psph_reader_header(r, buf, hlen + 1)
        header = json.loads(buf.value.decode())
        out = {}
        for spec in header["fields"]:
            a = np.empty(spec["shape"], dtype=np.dtype(spec["dtype"]))
            got = lib.psph_reader_next(
                r, a.ctypes.data_as(ctypes.c_void_p), a.nbytes)
            if got != a.nbytes:
                raise IOError(f"corrupt frame for field {spec['name']} "
                              f"(rc={got})")
            out[spec["name"]] = a
        import jax.numpy as jnp
        known = {f.name for f in dataclasses.fields(SimConfig)}
        cfg = SimConfig(**{k: v for k, v in header["config"].items()
                           if k in known})
        from ..utils.checkpoint import _fill_missing
        state = _fill_missing({k: jnp.asarray(v) for k, v in out.items()},
                              cfg)
        return state, cfg, int(header["step"])
    finally:
        lib.psph_reader_close(r)
