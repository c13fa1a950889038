"""Megakernel weight-path replica: the real 5-stream phase-gated layout with
the real _stream_dot compute (B=16, u4 group-128 + qparams) over Qwen2-7B
shapes, but NO attention phase / KV pools / RMW. Bisects the gap between the
full megakernel (~61 GB/s effective) and the isolated stream rate
(~300 GB/s).

Variants:
  full   — qkv/o/gu/dn/lm streams, real dots + activations chain
  nodot  — same streams/grid, dots replaced by a trivial touch
  nogroup— real dots but per-channel qparams (no [B,G,gs] reshuffle)

Usage: python tools/bench_stream3.py [full|nodot|nogroup|all]
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

from dashinfer_tpu.ops.pallas.megakernel import (_plan_stream, _stream_dot,
                                                 _round_up)

B = int(os.environ.get("DI_SB_B", "16"))
HID, INTER, V, L = 3584, 18944, 152064, 28
QKVN = (28 + 2 * 4) * 128


def build(mode: str, target_bytes: int):
    gs = 128
    qkv = _plan_stream("qkv", 4, HID, QKVN, gs, target_bytes)
    o = _plan_stream("o", 4, HID, HID, gs, target_bytes)
    while HID % o.chunk:
        import dataclasses
        o = dataclasses.replace(o, chunk=o.chunk - 256)
    import dataclasses
    o = dataclasses.replace(o, S=HID // o.chunk, Np=HID)
    gu = _plan_stream("gu", 4, HID, 2 * INTER, gs, target_bytes)
    dn = _plan_stream("dn", 4, INTER, HID, gs, target_bytes, chunk_axis="k")
    lm = _plan_stream("lm", 4, HID, V, gs, target_bytes)
    if mode == "nogroup":
        # per-channel: one group over all K
        qkv = dataclasses.replace(qkv, gs=0)
        o = dataclasses.replace(o, gs=0)
        gu = dataclasses.replace(gu, gs=0)
        dn = dataclasses.replace(dn, gs=dn.chunk)
        lm = dataclasses.replace(lm, gs=0)
    streams = [qkv, o, gu, dn, lm]
    S_layer = qkv.S + o.S + gu.S + dn.S
    T = L * S_layer + lm.S
    bases = {"qkv": 0, "o": qkv.S, "gu": qkv.S + o.S,
             "dn": qkv.S + o.S + gu.S}

    def stream_idx(sp):
        if sp.name == "lm":
            def idx(t):
                c = jnp.clip(t - L * S_layer, 0, sp.S - 1)
                return (0, c, 0, 0)
            return idx
        base = bases[sp.name]

        def idx(t):
            l = jnp.minimum(t // S_layer, L - 1)
            s = t - l * S_layer
            c = jnp.clip(s - base, 0, sp.S - 1)
            return (l, c, 0, 0)
        return idx

    in_specs = []
    payload_bytes = 0
    for sp in streams:
        rows = sp.Kp if sp.chunk_axis == "n" else sp.chunk
        in_specs.append(pl.BlockSpec((1, 1, rows, sp.store_cols),
                                     stream_idx(sp)))
        g = max((sp.Kp if sp.chunk_axis == "n" else sp.chunk) //
                (sp.gs if sp.gs else (sp.Kp if sp.chunk_axis == "n"
                                      else sp.chunk)), 1)
        cols = sp.chunk if sp.chunk_axis == "n" else sp.Np
        in_specs.append(pl.BlockSpec((1, 1, g, cols), stream_idx(sp)))
        in_specs.append(pl.BlockSpec((1, 1, g, cols), stream_idx(sp)))
        nl = 1 if sp.name == "lm" else L
        payload_bytes += nl * sp.S * rows * sp.store_cols

    def kernel(*refs):
        (qkv_w, qkv_s, qkv_z, o_w, o_s, o_z, gu_w, gu_s, gu_z,
         dn_w, dn_s, dn_z, lm_w, lm_s, lm_z, out, x_buf, acc) = refs
        t = pl.program_id(0)
        l = jnp.minimum(t // S_layer, L - 1)
        s = t - l * S_layer
        in_lm = t >= L * S_layer

        @pl.when(t == 0)
        def _():
            x_buf[:] = jnp.ones_like(x_buf)
            acc[:] = jnp.zeros_like(acc)

        def consume(sp, w, sc, zc, cidx):
            if mode == "nodot":
                acc[:, :128] = acc[:, :128] + \
                    w[0, 0, 0:1, :128].astype(jnp.int32).astype(jnp.float32)
                return
            x = x_buf[:, :sp.Kp] if sp.chunk_axis == "n" \
                else x_buf[:, :sp.chunk]
            y = _stream_dot(None, sp, x.astype(jnp.bfloat16), w, sc, zc,
                            cidx)
            acc[:, :y.shape[1]] = acc[:, :y.shape[1]] + y

        @pl.when(jnp.logical_and(~in_lm, s < bases["o"]))
        def _():
            consume(qkv, qkv_w, qkv_s, qkv_z, s)

        @pl.when(jnp.logical_and(
            ~in_lm, jnp.logical_and(s >= bases["o"], s < bases["gu"])))
        def _():
            consume(o, o_w, o_s, o_z, s - bases["o"])

        @pl.when(jnp.logical_and(
            ~in_lm, jnp.logical_and(s >= bases["gu"], s < bases["dn"])))
        def _():
            consume(gu, gu_w, gu_s, gu_z, s - bases["gu"])

        @pl.when(jnp.logical_and(~in_lm, s >= bases["dn"]))
        def _():
            consume(dn, dn_w, dn_s, dn_z, s - bases["dn"])

        @pl.when(in_lm)
        def _():
            consume(lm, lm_w, lm_s, lm_z, t - L * S_layer)

        out[:] = acc[:, :out.shape[1]]

    maxcols = max(max(sp.chunk, sp.Np) for sp in streams)
    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, 128), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, max(HID, INTER)), jnp.float32),
                        pltpu.VMEM((B, maxcols), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    args = []
    for sp in streams:
        nl = 1 if sp.name == "lm" else L
        rows = sp.Kp if sp.chunk_axis == "n" else sp.chunk
        g = max((sp.Kp if sp.chunk_axis == "n" else sp.chunk) //
                (sp.gs if sp.gs else (sp.Kp if sp.chunk_axis == "n"
                                      else sp.chunk)), 1)
        cols = sp.chunk if sp.chunk_axis == "n" else sp.Np
        args.append(jnp.ones((nl, sp.S, rows, sp.store_cols), jnp.uint8))
        args.append(jnp.ones((nl, sp.S, g, cols), jnp.bfloat16))
        args.append(jnp.ones((nl, sp.S, g, cols), jnp.bfloat16))
    jf = jax.jit(fn)
    return (lambda: jf(*args)), payload_bytes, T


def timeit_sync(f, iters=6):
    np.asarray(f())
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    np.asarray(o)
    return (time.perf_counter() - t0) / iters


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    modes = ["full", "nodot", "nogroup"] if which == "all" else [which]
    for mode in modes:
        for tkb in (512, 2048):
            f, payload, T = build(mode, tkb * 1024)
            dt = timeit_sync(f)
            print(f"{mode:8s} target={tkb}KB T={T}: {dt*1e3:8.2f} ms -> "
                  f"{payload/dt/1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
