"""Stream-scaling microbenches for the megakernel design.

(a) n parallel weight inputs advancing together: does aggregate DMA rate
    scale past the ~270 GB/s single-stream ceiling?
(b) megakernel-like phase gating: 5 inputs, only one advancing at a time,
    others frozen — what overhead do frozen windows add?

Usage: python tools/bench_stream2.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 3584


def timeit_sync(f, iters=6):
    np.asarray(f())
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    np.asarray(o)
    return (time.perf_counter() - t0) / iters


def parallel_streams(n, cols, S):
    """n u8 inputs [S, K, cols], all advancing each grid step."""
    def kernel(*refs):
        ws = refs[:n]
        o_ref = refs[n]
        acc = refs[n + 1]
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        s = acc[:]
        for w in ws:
            s = s + w[0, 0:1, :].astype(jnp.int32).astype(jnp.float32)
        acc[:] = s
        o_ref[:] = s

    fn = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[pl.BlockSpec((1, K, cols), lambda t: (t, 0, 0))] * n,
        out_specs=pl.BlockSpec((1, cols), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, cols), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, cols), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    ws = [jnp.ones((S, K, cols), jnp.uint8) for _ in range(n)]
    jf = jax.jit(fn)
    return lambda: jf(*ws), n * S * K * cols


def phase_gated(cols, S_phase, n_phase=5):
    """n_phase inputs; input p advances during its phase only (frozen
    otherwise) — the megakernel pattern. Grid = n_phase * S_phase."""
    def mkidx(p):
        def idx(t):
            c = jnp.clip(t - p * S_phase, 0, S_phase - 1)
            return (c, 0, 0)
        return idx

    def kernel(*refs):
        ws = refs[:n_phase]
        o_ref = refs[n_phase]
        acc = refs[n_phase + 1]
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        for p, w in enumerate(ws):
            @pl.when(jnp.logical_and(t >= p * S_phase,
                                     t < (p + 1) * S_phase))
            def _(w=w):
                acc[:] = acc[:] + w[0, 0:1, :].astype(jnp.int32).astype(jnp.float32)
        o_ref[:] = acc[:]

    fn = pl.pallas_call(
        kernel,
        grid=(n_phase * S_phase,),
        in_specs=[pl.BlockSpec((1, K, cols), mkidx(p))
                  for p in range(n_phase)],
        out_specs=pl.BlockSpec((1, cols), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, cols), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, cols), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    ws = [jnp.ones((S_phase, K, cols), jnp.uint8) for _ in range(n_phase)]
    jf = jax.jit(fn)
    return lambda: jf(*ws), n_phase * S_phase * K * cols


def manual_ring(cols, S, ring=4):
    """One logical stream fetched with an explicit multi-buffer DMA ring
    (ring in-flight copies) from an ANY-space input — bypasses Mosaic's
    2-deep auto pipeline."""
    def kernel(w_hbm, o_ref, acc, buf, sems):
        t = pl.program_id(0)

        def cp(i, slot):
            return pltpu.make_async_copy(w_hbm.at[i], buf.at[slot],
                                         sems.at[slot])

        @pl.when(t == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            for i in range(ring):
                @pl.when(i < S)
                def _(i=i):
                    cp(jnp.int32(i), jnp.int32(i)).start()

        slot = jax.lax.rem(t, ring)
        cp(t, slot).wait()
        acc[:] = acc[:] + buf[slot, 0:1, :].astype(jnp.int32).astype(jnp.float32)
        nxt = t + ring

        @pl.when(nxt < S)
        def _():
            cp(nxt, jax.lax.rem(nxt, ring)).start()
        o_ref[:] = acc[:]

    fn = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, cols), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, cols), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, cols), jnp.float32),
            pltpu.VMEM((ring, K, cols), jnp.uint8),
            pltpu.SemaphoreType.DMA((ring,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024, has_side_effects=True),
    )
    w = jnp.ones((S, K, cols), jnp.uint8)
    jf = jax.jit(fn)
    return lambda: jf(w), S * K * cols


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "par"):
        for n, cols in [(1, 1024), (2, 512), (4, 256), (8, 128)]:
            S = (1 << 31) // (n * K * cols)
            f, payload = parallel_streams(n, cols, S)
            dt = timeit_sync(f)
            print(f"parallel n={n} cols={cols} S={S}: {dt*1e3:8.2f} ms -> "
                  f"{payload/dt/1e9:6.1f} GB/s", flush=True)
    if which in ("all", "gate"):
        for cols in (256, 1024):
            S_phase = (1 << 29) // (K * cols)
            f, payload = phase_gated(cols, S_phase)
            dt = timeit_sync(f)
            print(f"phase-gated 5x cols={cols} S_phase={S_phase}: "
                  f"{dt*1e3:8.2f} ms -> {payload/dt/1e9:6.1f} GB/s",
                  flush=True)
    if which in ("all", "ring"):
        for ring, cols in [(2, 1024), (4, 1024), (8, 512), (16, 256)]:
            S = (1 << 31) // (K * cols)
            f, payload = manual_ring(cols, S, ring)
            dt = timeit_sync(f)
            print(f"manual ring={ring} cols={cols} S={S}: {dt*1e3:8.2f} ms "
                  f"-> {payload/dt/1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
