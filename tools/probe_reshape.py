"""Probe which layout transforms lower on this TPU + cost of the megakernel's
per-layer q-pack/finalize loops.

Usage: python tools/probe_reshape.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, KH, D = 16, 28, 4, 128
G = H // KH
G8 = 8
HD = H * D
REPS = 28 * 8  # layers x several steps to amortize launch overhead


def run(name, body, extra_scratch=()):
    def kernel(x_ref, o_ref, q4, *sc):
        t = pl.program_id(0)
        body(x_ref, q4, o_ref, *sc)
        o_ref[:] = o_ref[:] + q4[0, 0, 0:1, :]

    try:
        fn = pl.pallas_call(
            kernel,
            grid=(REPS,),
            in_specs=[pl.BlockSpec((B, HD), lambda t: (0, 0))],
            out_specs=pl.BlockSpec((1, D), lambda t: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, KH, G8, D), jnp.float32)]
            + list(extra_scratch),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        x = jnp.ones((B, HD), jnp.float32)
        jf = jax.jit(fn)
        np.asarray(jf(x))
        t0 = time.perf_counter()
        for _ in range(6):
            o = jf(x)
        np.asarray(o)
        dt = (time.perf_counter() - t0) / 6
        print(f"{name:28s}: {dt/REPS*1e6:8.2f} us/rep", flush=True)
    except Exception as e:
        print(f"{name:28s}: FAILED {str(e)[:140]}", flush=True)


def main():
    # current megakernel pack: 448 single-row lane slices
    def pack_rows(x_ref, q4, o_ref):
        for b in range(B):
            for h in range(KH):
                for g in range(G):
                    j = (h * G + g) * D
                    q4[b, h, g:g + 1, :] = x_ref[b:b + 1, j:j + D]
    run("per-row slices (current)", pack_rows)

    # per-(h,g) slices, all B rows at once: [B, D] -> q4[:, h, g, :]
    def pack_bd(x_ref, q4, o_ref):
        for h in range(KH):
            for g in range(G):
                j = (h * G + g) * D
                q4[:, h, g, :] = x_ref[:, j:j + D]
    run("per-(h,g) [B,D] slices", pack_bd)

    # full reshape [B, HD] -> [B, H, D] -> pad-scatter
    def pack_reshape(x_ref, q4, o_ref):
        r = x_ref[:].reshape(B, H, D)
        for h in range(KH):
            q4[:, h, :G, :] = r[:, h * G:(h + 1) * G, :]
    run("reshape [B,H,D] + scatter", pack_reshape)

    # reshape only (no scatter) — does it lower at all?
    def pack_reshape_only(x_ref, q4, o_ref):
        r = x_ref[:].reshape(B * H, D)
        q4[0, 0, 0:1, :] = r[0:1, :]
    run("reshape [B*H,D] touch", pack_reshape_only)

    # single-row [1, GD] -> [G, D] reshape
    def pack_row_reshape(x_ref, q4, o_ref):
        r = x_ref[0:1, :G * D].reshape(G, D)
        q4[0, 0, :G, :] = r
    run("row [1,GD]->[G,D] reshape", pack_row_reshape)

    # finalize direction: q4 [G8, D] -> [1, G8*D] via per-row slices
    def fin_rows(x_ref, q4, o_ref):
        for b in range(B):
            for h in range(KH):
                for g in range(G):
                    j = (h * G + g) * D
                    q4[b, h, g:g + 1, :] = x_ref[b:b + 1, j:j + D]
    # (same cost as pack) skip

    # local VMEM->VMEM async copy with reshaped view? (copy whole q4 from a
    # [B, KH*G8*D] staging buffer written as lanes)
    def pack_dma(x_ref, q4, o_ref, stage, sem):
        # stage [B, KH*G8*D] lanes; fill padded lanes per (h,g) block
        for h in range(KH):
            for g in range(G):
                jsrc = (h * G + g) * D
                jdst = (h * G8 + g) * D
                stage[:, jdst:jdst + D] = x_ref[:, jsrc:jsrc + D]
        cp = pltpu.make_async_copy(stage, q4, sem)
        cp.start()
        cp.wait()
    try:
        run("lane-pad + DMA relayout", pack_dma,
            extra_scratch=[pltpu.VMEM((B, KH * G8 * D), jnp.float32),
                           pltpu.SemaphoreType.DMA])
    except Exception as e:
        print("dma variant setup failed:", str(e)[:120])


if __name__ == "__main__":
    main()
