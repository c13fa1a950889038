"""Weight-streaming microbenches for the megakernel design.

Subcommands:
  rate    — isolated stream-dot rate sweep: payload format (bf16/i8/u4,
            per-channel vs group-128) x chunk size; prints payload GB/s.
            The megakernel's weight phases cannot beat the best rate here.
  replica — the real 5-stream phase-gated layout with the real _stream_dot
            compute over Qwen2-7B shapes but NO attention/KV/RMW; variants
            full | nodot | nogroup bisect dequant/dot/group-reshuffle cost.

(The former bench_stream2.py multi-stream DMA-scaling probe answered its
question — aggregate DMA rate scales to ~330-355 GB/s with >=4 parallel
streams, frozen windows are free — and was folded into these notes.)

Usage: python tools/bench_stream.py rate
       python tools/bench_stream.py replica [full|nodot|nogroup|all]
Env:   DI_SB_B = batch rows (default 16)
"""

import dataclasses
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

from dashinfer_tpu.ops.pallas.megakernel import (_plan_stream, _stream_dot,
                                                 _round_up)

B = int(os.environ.get("DI_SB_B", "16"))
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


def timeit_d2h(f, iters=8):
    """Time with a forced tail D2H sync (np.asarray).

    On the tunneled 'axon' platform, jax.block_until_ready over repeated
    IDENTICAL dispatches under-measures wildly (observed 19 TB/s); a tail
    np.asarray is reliable but includes a fixed host<->device RTT.  Use
    main_slope below (delta over S) to cancel the constant."""
    np.asarray(f())
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    np.asarray(o)
    return (time.perf_counter() - t0) / iters


def main_slope():
    """True payload GB/s by the slope method: time two S (chunk-count)
    points per config and divide the payload delta by the time delta.
    This cancels the tunnel RTT and any fixed dispatch cost, which the
    old `rate` timing (block_until_ready) got badly wrong on axon."""
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    cfgs = [("copy", 0), ("u4", 128), ("i8", 128), ("bf16", 0)]
    if which != "all":
        cfgs = [c for c in cfgs if c[0] == which]
    chunks = tuple(int(c) for c in os.environ.get(
        "DI_SB_CHUNKS", "512,1024,2048,4096,8192").split(","))
    print(f"x [{B}, {K}] bf16; slope GB/s = d(payload)/d(time)", flush=True)
    for fmt, gs in cfgs:
        for chunk_kb in chunks:
            bytes_per_col = (K // 2 if fmt == "u4" else
                             2 * K if fmt == "bf16" else K)
            cols_bytes = chunk_kb * 1024 // bytes_per_col
            step = 256 if fmt == "u4" else 128
            cols = max(step, cols_bytes // step * step)
            chunk_bytes = cols * bytes_per_col
            S_lo = max(4, (96 << 20) // chunk_bytes)
            S_hi = max(S_lo * 4, (768 << 20) // chunk_bytes)
            try:
                f_lo, p_lo = build(fmt, gs, cols, S_lo)
                f_hi, p_hi = build(fmt, gs, cols, S_hi)
                t_lo = timeit_d2h(f_lo)
                t_hi = timeit_d2h(f_hi)
                gbs = (p_hi - p_lo) / (t_hi - t_lo) / 1e9
                per_chunk = (t_hi - t_lo) / (S_hi - S_lo)
                print(f"{fmt:5s} gs={gs:3d} chunk={chunk_bytes>>10:5d}KB "
                      f"cols={cols:5d}: {per_chunk*1e6:7.2f} us/chunk -> "
                      f"{gbs:6.1f} GB/s  (t {t_lo*1e3:.2f}/{t_hi*1e3:.2f} ms"
                      f" S {S_lo}/{S_hi})", flush=True)
            except Exception as e:
                print(f"{fmt} gs={gs} chunk={chunk_kb}KB FAILED: "
                      f"{str(e)[:120]}", flush=True)


def build_loop(fmt: str, gs: int, cols: int, S: int, R: int):
    """Like build(), but the grid is R*S with chunk index t % S — the
    whole S-chunk stream repeats R times INSIDE one kernel launch, so a
    single dispatch covers R full streams and per-call dispatch overhead
    (~3-4.5 ms on the tunneled runtime, which swamps per-call timing)
    amortizes away. Rate = payload_delta / time_delta between two R."""
    store_cols = cols // 2 if fmt == "u4" else cols
    groups = K // gs if gs else 1

    def kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        if fmt == "copy":
            # consume every sublane: reduce the whole chunk so no row of
            # the DMA'd block is dead (jnp.sum lowers to VPU adds)
            acc[0:1, :] = acc[0:1, :] + jnp.sum(
                w_ref[0].astype(jnp.float32), axis=0, keepdims=True)[:, :cols]
            o_ref[:] = acc[:1]
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
        if fmt == "bf16" or groups == 1:
            y = jax.lax.dot_general(x, q, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        else:
            xg = x.reshape(B, groups, gs).swapaxes(0, 1)
            qg = q.reshape(groups, gs, -1)
            part = jax.lax.dot_general(
                xg, qg, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            s = s_ref[0].astype(jnp.float32)
            y = jnp.sum(part * s[:, None, :], axis=0)
        acc[:] = acc[:] + y[:1]
        o_ref[:] = acc[:]

    wdt = {"bf16": jnp.bfloat16, "i8": jnp.int8, "u4": jnp.uint8,
           "copy": jnp.int8}[fmt]
    in_specs = [
        pl.BlockSpec((B, K), lambda t: (0, 0)),
        pl.BlockSpec((1, K, store_cols), lambda t: (t % S, 0, 0)),
        pl.BlockSpec((1, max(groups, 1), cols), lambda t: (t % S, 0, 0)),
        pl.BlockSpec((1, max(groups, 1), cols), lambda t: (t % S, 0, 0)),
    ]
    fn = pl.pallas_call(
        kernel,
        grid=(R * S,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, cols), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, cols), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, cols), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    x = jnp.ones((B, K), jnp.bfloat16)
    w = jnp.ones((S, K, store_cols), wdt)
    s = jnp.ones((S, max(groups, 1), cols), jnp.bfloat16)
    z = jnp.ones((S, max(groups, 1), cols), jnp.bfloat16)
    jf = jax.jit(fn)
    f = lambda: jf(x, w, s, z)
    payload = R * S * K * store_cols * (2 if fmt == "bf16" else 1)
    return f, payload


def _median_time(f, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main_loop():
    """In-kernel repeated stream: ONE dispatch per timing, R rounds of the
    stream inside it. The only trustworthy rate methodology on this
    tunneled runtime (see main_slope docstring)."""
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    cfgs = [("copy", 0), ("u4", 128), ("i8", 128), ("bf16", 0)]
    if which != "all":
        cfgs = [c for c in cfgs if c[0] == which]
    chunks = tuple(int(c) for c in os.environ.get(
        "DI_SB_CHUNKS", "512,1024,2048,4096").split(","))
    R_LO, R_HI = (1, 33) if os.environ.get("DI_SB_BIGR") else (1, 9)
    print(f"x [{B}, {K}] bf16; loop-slope GB/s over R={R_LO}->{R_HI} "
          f"in-kernel rounds", flush=True)
    for fmt, gs in cfgs:
        for chunk_kb in chunks:
            bytes_per_col = (K // 2 if fmt == "u4" else
                             2 * K if fmt == "bf16" else K)
            cols_bytes = chunk_kb * 1024 // bytes_per_col
            step = 256 if fmt == "u4" else 128
            cols = max(step, cols_bytes // step * step)
            chunk_bytes = cols * bytes_per_col
            S = max(8, (256 << 20) // chunk_bytes)
            try:
                f_lo, p_lo = build_loop(fmt, gs, cols, S, R_LO)
                f_hi, p_hi = build_loop(fmt, gs, cols, S, R_HI)
                t_lo = _median_time(f_lo)
                t_hi = _median_time(f_hi)
                gbs = (p_hi - p_lo) / (t_hi - t_lo) / 1e9
                per_chunk = (t_hi - t_lo) / ((R_HI - R_LO) * S)
                print(f"{fmt:5s} gs={gs:3d} chunk={chunk_bytes>>10:5d}KB "
                      f"cols={cols:5d} S={S:4d}: {per_chunk*1e6:7.2f} "
                      f"us/chunk -> {gbs:6.1f} GB/s  "
                      f"(t {t_lo*1e3:.1f}/{t_hi*1e3:.1f} ms)", flush=True)
            except Exception as e:
                print(f"{fmt} gs={gs} chunk={chunk_kb}KB FAILED: "
                      f"{str(e)[:120]}", flush=True)


def main_rate():
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




# ---- replica (former bench_stream3) ----
HID, INTER, V, L = 3584, 18944, 152064, 28
QKVN = (28 + 2 * 4) * 128


def build_replica(mode: str, target_bytes: int):
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


def main_replica():
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    modes = ["full", "nodot", "nogroup"] if which == "all" else [which]
    for mode in modes:
        for tkb in (512, 2048):
            f, payload, T = build_replica(mode, tkb * 1024)
            dt = timeit_sync(f)
            print(f"{mode:8s} target={tkb}KB T={T}: {dt*1e3:8.2f} ms -> "
                  f"{payload/dt/1e9:6.1f} GB/s", flush=True)




if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "rate"
    {"rate": main_rate, "replica": main_replica, "slope": main_slope,
     "loop": main_loop}[cmd]()
