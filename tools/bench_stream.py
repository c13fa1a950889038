"""Microbench: weight-streaming dot rate inside a Pallas grid (isolates the
megakernel's per-byte cost — dequant + MXU dot + qparam affine — from the
full model).

Sweeps payload format (bf16 / i8 / u4, per-channel vs group-128) and chunk
size; prints effective GB/s of payload streamed. The decode megakernel's
weight phases can't run faster than the best rate here.

Usage: python tools/bench_stream.py
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

B = int(__import__("os").environ.get("DI_SB_B", "16"))
K = 3584


def build(fmt: str, gs: int, cols: int, S: int):
    """fmt: bf16|i8|u4|copy; gs: group size (0 = per-channel); cols per
    chunk; S chunks streamed."""
    store_cols = cols // 2 if fmt == "u4" else cols
    groups = K // gs if gs else 1

    def kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        if fmt == "copy":
            # touch every sublane/lane without math
            acc[:] = acc[:] + w_ref[0, 0:1, :cols].astype(jnp.float32)
            o_ref[:] = acc[:]
            return
        if fmt == "bf16":
            q = w_ref[0]
        elif fmt == "i8":
            q = w_ref[0].astype(jnp.bfloat16)
        else:
            p32 = w_ref[0].astype(jnp.int32)
            lo = (p32 & 0xF).astype(jnp.bfloat16)
            hi = (p32 >> 4).astype(jnp.bfloat16)
            q = jnp.concatenate([lo, hi], axis=-1)
        x = x_ref[:]
        if fmt == "bf16":
            y = jax.lax.dot_general(x, q, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        elif groups == 1:
            part = jax.lax.dot_general(x, q, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            xsum = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
            y = part * s_ref[0, 0].astype(jnp.float32) + \
                xsum * z_ref[0, 0].astype(jnp.float32)
        else:
            xg = x.reshape(B, groups, gs).swapaxes(0, 1)
            qg = q.reshape(groups, gs, -1)
            part = jax.lax.dot_general(
                xg, qg, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            s = s_ref[0].astype(jnp.float32)
            z = z_ref[0].astype(jnp.float32)
            xsum = jnp.sum(xg.astype(jnp.float32), axis=2)
            y = (jnp.sum(part * s[:, None, :], axis=0)
                 + jnp.sum(xsum[:, :, None] * z[:, None, :], axis=0))
        acc[:] = acc[:] + y[:1]
        o_ref[:] = acc[:]

    wdt = {"bf16": jnp.bfloat16, "i8": jnp.int8, "u4": jnp.uint8,
           "copy": jnp.int8}[fmt]
    in_specs = [
        pl.BlockSpec((B, K), lambda t: (0, 0)),
        pl.BlockSpec((1, K, store_cols), lambda t: (t, 0, 0)),
        pl.BlockSpec((1, max(groups, 1), cols), lambda t: (t, 0, 0)),
        pl.BlockSpec((1, max(groups, 1), cols), lambda t: (t, 0, 0)),
    ]
    fn = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, cols), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, cols), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, cols), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    # device arrays passed as jit ARGS (a closure would inline them as
    # giant executable constants)
    x = jnp.ones((B, K), jnp.bfloat16)
    w = jnp.ones((S, K, store_cols), wdt)
    s = jnp.ones((S, max(groups, 1), cols), jnp.bfloat16)
    z = jnp.ones((S, max(groups, 1), cols), jnp.bfloat16)
    jf = jax.jit(fn)
    f = lambda: jf(x, w, s, z)
    return f, S * K * store_cols * (2 if fmt == "bf16" else 1)


def timeit(f, iters=20):
    o = f()
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def main():
    total_mb = 128  # payload per run
    print(f"x [{B}, {K}] bf16; rates = payload GB/s", flush=True)
    for fmt, gs in [("copy", 0), ("bf16", 0), ("i8", 0), ("i8", 128),
                    ("u4", 0), ("u4", 128)]:
        for chunk_kb in (256, 1024, 4096):
            cols_bytes = chunk_kb * 1024 // (K // 2 if fmt == "u4" else K
                                             if fmt != "bf16" else 2 * K)
            step = 256 if fmt == "u4" else 128
            cols = max(step, cols_bytes // step * step)
            S = max(4, total_mb * 1024 // chunk_kb)
            try:
                f, payload = build(fmt, gs, cols, S)
                dt = timeit(f)
                print(f"{fmt:5s} gs={gs:3d} chunk={chunk_kb:5d}KB "
                      f"cols={cols:5d} S={S:4d}: {dt*1e3:7.2f} ms "
                      f"-> {payload/dt/1e9:6.1f} GB/s", flush=True)
            except Exception as e:
                print(f"{fmt} gs={gs} chunk={chunk_kb}KB FAILED: "
                      f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
