#!/usr/bin/env python3
"""Micro-benchmarks for the block-pipeline redesign (gathers, kernel tiles).

Run variants side by side on the real TPU in ONE process (the remote
compile service is slow; batch everything). Timing uses the scan-with-
data-dependence + scalar-readback pattern (docs/ROUND2.md).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from planetmodel_sph_tpu.ops.pallas.pairwise import _on_tpu


def timed(label, fn, args, k=8):
    f = jax.jit(fn, static_argnames=("k_",))
    # warm with the SAME static k_ — a different k_ compiles a different
    # executable, putting the (remote, slow) compile inside the timed region
    float(jnp.sum(f(*args, k_=k)))
    t0 = time.perf_counter()
    s = float(jnp.sum(f(*args, k_=k)))
    dt = (time.perf_counter() - t0) / k
    print(f"{label:44s} {dt*1e3:9.2f} ms   ({s:.3e})", flush=True)
    return dt


# ---------------------------------------------------------------------------
# gather variants: [NB, B] source table + [G, W] window ids -> [G, W*B] rows
# ---------------------------------------------------------------------------

def bench_gathers(nb=2067, bsz=64, g=2067, w=96, c=7, k=8, seed=0):
    key = jax.random.PRNGKey(seed)
    cols = [jax.random.normal(jax.random.fold_in(key, i), (nb * bsz,))
            for i in range(c)]
    idx = jax.random.randint(jax.random.fold_in(key, 99), (g, w), 0, nb,
                             dtype=jnp.int32)
    total_mb = g * w * bsz * c * 4 / 1e6
    print(f"[gather] nb={nb} bsz={bsz} g={g} w={w} c={c} -> {total_mb:.0f} MB "
          f"out", flush=True)

    def v_packed(cols_, idx_, k_):
        """Current production path: interleaved stack + row gather."""
        def body(cc, _):
            cs = [cols_[0] + cc] + list(cols_[1:])
            packed = jnp.stack(cs, axis=-1).reshape(nb, bsz * c)
            gat = packed[idx_].reshape(g, w, bsz, c)
            outs = [gat[..., j].reshape(g, w * bsz) for j in range(c)]
            return cc + 1e-12 * outs[0][0, 0], None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=k_)
        return out

    def v_perfield(cols_, idx_, k_):
        """Per-field row gather from the [NB, B] view (no interleave)."""
        def body(cc, _):
            cs = [cols_[0] + cc] + list(cols_[1:])
            outs = [x.reshape(nb, bsz)[idx_].reshape(g, w * bsz) for x in cs]
            return cc + 1e-12 * outs[0][0, 0], None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=k_)
        return out

    def v_take(cols_, idx_, k_):
        """Per-field jnp.take row gather."""
        def body(cc, _):
            cs = [cols_[0] + cc] + list(cols_[1:])
            fl = idx_.reshape(-1)
            outs = [jnp.take(x.reshape(nb, bsz), fl, axis=0,
                             ).reshape(g, w * bsz) for x in cs]
            return cc + 1e-12 * outs[0][0, 0], None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=k_)
        return out

    def v_blockpacked(cols_, idx_, k_):
        """Block-major packing [NB, c*B] (fields contiguous per block, no
        interleave transpose), one row gather, per-field slices."""
        def body(cc, _):
            cs = [cols_[0] + cc] + list(cols_[1:])
            packed = jnp.concatenate(
                [x.reshape(nb, bsz) for x in cs], axis=1)   # [NB, c*B]
            gat = packed[idx_]                              # [G, W, c*B]
            outs = [gat[:, :, j * bsz:(j + 1) * bsz].reshape(g, w * bsz)
                    for j in range(c)]
            return cc + 1e-12 * outs[0][0, 0], None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=k_)
        return out

    def gather_kernel(idx_ref, src_ref, out_ref):
        out_ref[0] = src_ref[...]

    def v_pallas(cols_, idx_, k_):
        """Scalar-prefetch Pallas gather: BlockSpec index_map reads the
        window id; Mosaic double-buffers the per-(g,w) block DMAs."""
        def one(packed, idx2):
            grid = (g, w)
            spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[pl.BlockSpec((1, bsz * c),
                                       lambda gi, wi, idx_ref: (
                                           idx_ref[gi, wi], 0))],
                out_specs=pl.BlockSpec((1, 1, bsz * c),
                                       lambda gi, wi, idx_ref: (gi, wi, 0)),
            )
            return pl.pallas_call(
                gather_kernel,
                grid_spec=spec,
                out_shape=jax.ShapeDtypeStruct((g, w, bsz * c), jnp.float32),
                interpret=not _on_tpu(),
            )(idx2, packed)

        def body(cc, _):
            cs = [cols_[0] + cc] + list(cols_[1:])
            packed = jnp.concatenate(
                [x.reshape(nb, bsz) for x in cs], axis=1)
            gat = one(packed, idx_)
            return cc + 1e-12 * gat[0, 0, 0], None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=k_)
        return out

    timed("gather packed-interleaved (current)", v_packed, (cols, idx), k=k)
    timed("gather per-field rows", v_perfield, (cols, idx), k=k)
    timed("gather per-field take", v_take, (cols, idx), k=k)
    timed("gather block-packed concat", v_blockpacked, (cols, idx), k=k)
    timed("gather pallas scalar-prefetch", v_pallas, (cols, idx), k=k)


# ---------------------------------------------------------------------------
# kernel tile variants: the pass1-style sweep at different target widths
# ---------------------------------------------------------------------------

def _spline_w(r2, inv_h):
    r = jnp.sqrt(r2)
    q = r * inv_h
    c = (1.0 / jnp.pi) * inv_h * inv_h * inv_h
    q2 = q * q
    inner = 1.0 - 1.5 * q2 + 0.75 * q2 * q
    t = 2.0 - q
    outer = 0.25 * t * t * t
    return jnp.where(q < 1.0, inner, jnp.where(q < 2.0, outer, 0.0)) * c


def bench_kernel_tiles(g=2067, bsz=64, w=96, chunk=512, navg=35, k=8,
                       seed=0, supers=(1, 4, 8)):
    """Sweep the pass1 pair kernel with SG consecutive blocks fused into one
    kernel instance (target tile SG*B), window rows shared per instance."""
    key = jax.random.PRNGKey(seed)

    for sg in supers:
        gb = g // sg
        tb = sg * bsz
        wl = w  # keep slot capacity equal: w blocks of bsz
        s = wl * bsz
        nvec = jnp.full((gb,), navg * bsz, jnp.int32)
        tgt = [jax.random.normal(jax.random.fold_in(key, i), (gb * tb, 1))
               for i in range(4)]
        rows = [jax.random.normal(jax.random.fold_in(key, 10 + i),
                                  (gb, 1, s)) for i in range(5)]
        pairs = gb * tb * navg * bsz / 1e9

        def kern(nv_ref, tx, ty, tz, tih, sx, sy, sz, sm, slv, rho_ref,
                 *, chunk_, tb_):
            nv = nv_ref[pl.program_id(0)]
            txv, tyv, tzv, tihv = tx[:], ty[:], tz[:], tih[:]
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk_), 1)

            def step(ci, acc):
                off = pl.multiple_of(ci * chunk_, chunk_)
                cx = sx[:, 0, pl.ds(off, chunk_)]
                cy = sy[:, 0, pl.ds(off, chunk_)]
                cz = sz[:, 0, pl.ds(off, chunk_)]
                cm = sm[:, 0, pl.ds(off, chunk_)]
                clv = slv[:, 0, pl.ds(off, chunk_)]
                valid = (iota + off) < nv
                dxx = txv - cx
                dxy = tyv - cy
                dxz = tzv - cz
                r2 = dxx * dxx + dxy * dxy + dxz * dxz
                pair = valid & (clv > 0.5)
                m_eff = jnp.where(pair, cm, 0.0)
                return acc + jnp.sum(m_eff * _spline_w(r2, tihv), axis=1,
                                     keepdims=True)

            trips = jnp.minimum(pl.cdiv(nv, chunk_), s // chunk_)
            acc = jax.lax.fori_loop(
                0, trips, step, jnp.zeros((tb_, 1), jnp.float32))
            rho_ref[:] = acc

        col = pl.BlockSpec((tb, 1), lambda gi: (gi, 0),
                           memory_space=pltpu.VMEM)
        row = pl.BlockSpec((1, 1, s), lambda gi: (gi, 0, 0),
                           memory_space=pltpu.VMEM)
        scl = pl.BlockSpec(memory_space=pltpu.SMEM)

        def run(nv_, tgt_, rows_, k_):
            def body(cc, _):
                tg = [tgt_[0] + cc] + list(tgt_[1:])
                rho = pl.pallas_call(
                    functools.partial(kern, chunk_=chunk, tb_=tb),
                    grid=(gb,),
                    in_specs=[scl] + [col] * 4 + [row] * 5,
                    out_specs=col,
                    out_shape=jax.ShapeDtypeStruct((gb * tb, 1),
                                                   jnp.float32),
                    interpret=not _on_tpu(),
                )(nv_, *tg, *rows_)
                return cc + 1e-12 * rho[0, 0], None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=k_)
            return out

        dt = timed(f"pass1-style SG={sg} tile=[{tb},{chunk}]", run,
                   (nvec, tgt, rows), k=k)
        print(f"    -> {pairs / dt:.1f} Gpair/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    want = set(args.only.split(",")) if args.only else None
    if want is None or "gather" in want:
        bench_gathers(k=args.k)
    if want is None or "tiles" in want:
        bench_kernel_tiles(k=args.k)


if __name__ == "__main__":
    main()
