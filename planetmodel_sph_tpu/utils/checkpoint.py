"""Checkpoint save/restore (new capability — the reference has none).

The reference keeps state only in live ECS memory (SURVEY.md §5); its roadmap
wanted runtime ICs/state but never built them. We serialize the full
ParticleState plus the SimConfig and step counter to a single .npz so a run
can resume bit-exactly (f32 state round-trips losslessly through npz).
"""

from __future__ import annotations

import dataclasses
import json

import jax
import numpy as np

from ..config import SimConfig
from ..state import ParticleState


def save(path: str, state: ParticleState, cfg: SimConfig, step: int = 0) -> None:
    """Save a checkpoint. `.psph` paths use the native async binary writer
    (runtime/snapshot.py, CRC-framed, background flush thread); anything
    else (or a missing native toolchain) uses npz."""
    if path.endswith(".psph"):
        from ..runtime import snapshot
        if snapshot.save(path, state, cfg, step):
            return
        # toolchain unavailable: fall through to npz at the same path
    arrays = {
        f.name: np.asarray(getattr(state, f.name))
        for f in dataclasses.fields(state)
    }
    # write through a file object: np.savez(path) appends '.npz' to paths
    # lacking the suffix, silently breaking save/restore at the stated path
    with open(path, "wb") as f:
        np.savez(
            f,
            __config__=np.frombuffer(
                json.dumps(dataclasses.asdict(cfg)).encode(), dtype=np.uint8),
            __step__=np.asarray(step, np.int64),
            **arrays,
        )


def load(path: str):
    """Returns (state, cfg, step). Auto-detects PSPH1 binary vs npz."""
    with open(path, "rb") as f:
        magic = f.read(5)
    if magic == b"PSPH1":
        from ..runtime import snapshot
        return snapshot.load(path)
    with np.load(path) as z:
        raw = json.loads(bytes(z["__config__"]).decode())
        # tolerate config fields from other engine versions (e.g. the
        # removed tree_* sizing knobs) so old checkpoints stay loadable
        known = {f.name for f in dataclasses.fields(SimConfig)}
        cfg = SimConfig(**{k: v for k, v in raw.items() if k in known})
        step = int(z["__step__"])
        fields = {
            f.name: jax.numpy.asarray(z[f.name])
            for f in dataclasses.fields(ParticleState)
            if f.name in z
        }
    return _fill_missing(fields, cfg), cfg, step


def _fill_missing(fields: dict, cfg: SimConfig) -> ParticleState:
    """Back-fill state fields absent from older checkpoints (e.g. the
    thermal channel u/du_dt predates some archives): u from the polytropic
    relation at the stored density — the same initialization the ICs use —
    and du_dt zero."""
    from ..ops import eos as eos_ops
    if "u" not in fields:
        fields["u"] = eos_ops.internal_energy(fields["rho"], cfg.eos_k,
                                              cfg.eos_gamma)
    if "du_dt" not in fields:
        fields["du_dt"] = jax.numpy.zeros_like(fields["rho"])
    if "matid" not in fields:
        fields["matid"] = jax.numpy.full(
            fields["rho"].shape, eos_ops.material_index(cfg.material),
            jax.numpy.int32)
    if "balsara" not in fields:
        fields["balsara"] = jax.numpy.ones_like(fields["rho"])
    return ParticleState(**fields)
