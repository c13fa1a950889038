"""Stage-by-stage sampler timing at the bench shape (v5e).

Usage: [DI_BENCH_BATCH=64] python tools/profile_sampler.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, *args, iters=30):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/di_jax_cache")
    import jax.numpy as jnp
    from dashinfer_tpu.ops import sampling as S
    from dashinfer_tpu.runtime.batch_state import make_sampling_params

    B = int(os.environ.get("DI_BENCH_BATCH", "64"))
    V = 152064
    K = int(os.environ.get("DI_TOPK", "128"))  # RuntimeConfig default
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(B, V).astype(np.float32))
    counts = jnp.zeros((B, V), jnp.int32)
    gen_lens = jnp.ones((B,), jnp.int32)
    steps = jnp.full((B,), 7, jnp.int32)
    sp = make_sampling_params(B, 8)

    full = jax.jit(lambda lg: S.sample(lg, sp, counts, gen_lens, steps,
                                       max_top_k=K))
    print(f"B={B} full sample   : {timeit(full, logits)*1e3:8.2f} ms")

    proc = jax.jit(lambda lg: S.process_logits(lg, sp, counts, gen_lens))
    print(f"process_logits      : {timeit(proc, logits)*1e3:8.2f} ms")

    amk = jax.jit(lambda lg: jax.lax.approx_max_k(lg, K, recall_target=0.95))
    print(f"approx_max_k        : {timeit(amk, logits)*1e3:8.2f} ms")

    tk = jax.jit(lambda lg: jax.lax.top_k(lg, K))
    print(f"exact top_k         : {timeit(tk, logits)*1e3:8.2f} ms")

    pen = jax.jit(lambda lg: lg - sp.frequency_penalty[:, None]
                  * counts.astype(jnp.float32))
    print(f"freq penalty pass   : {timeit(pen, logits)*1e3:8.2f} ms")

    def scat(lg):
        ids = sp.stop_token_ids
        valid = ids >= 0
        safe = jnp.maximum(ids, 0)
        upd = jnp.where(valid, -1e30, jnp.inf)
        b_idx = jnp.arange(lg.shape[0])[:, None]
        return lg.at[b_idx, safe].min(upd)
    print(f"stop scatter        : {timeit(jax.jit(scat), logits)*1e3:8.2f} ms")

    gum = jax.jit(lambda s: jax.vmap(
        lambda seed, step: jax.random.gumbel(
            jax.random.fold_in(jax.random.PRNGKey(seed), step),
            (K,), jnp.float32))(sp.seed, s))
    print(f"gumbel vmap         : {timeit(gum, steps)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
