"""On-TPU validation of warmup-based KV pool planning (VERDICT r1 #5).

Builds a ~1.2B-param bf16 model where the analytic w//4 activation
heuristic and the MEASURED XLA step temps disagree by >1 GiB, prints both
plans, then installs the engine with the warmup plan and runs a real
max-bucket prefill + decode — the configuration the heuristic would have
OOMed (over-planned pool) or stranded (over-reserved headroom) on.

Usage: python tools/validate_pool_plan.py   (real TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_params(cfg, rng):
    import jax.numpy as jnp
    L, hid, inter, V = (cfg.num_layers, cfg.hidden_size,
                        cfg.intermediate_size, cfg.vocab_size)
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def w(*shape):
        return (rng.randn(*shape).astype(np.float32) * 0.02) \
            .astype(jnp.bfloat16)

    return {
        "embed_tokens": {"w": w(V, hid)},
        "norm": np.ones((hid,), jnp.bfloat16),
        "lm_head": {"w": w(hid, V)},
        "layers": {
            "input_layernorm": np.ones((L, hid), jnp.bfloat16),
            "post_attention_layernorm": np.ones((L, hid), jnp.bfloat16),
            "q_proj": {"w": w(L, hid, H * D), "b": w(L, H * D)},
            "k_proj": {"w": w(L, hid, KH * D), "b": w(L, KH * D)},
            "v_proj": {"w": w(L, hid, KH * D), "b": w(L, KH * D)},
            "o_proj": {"w": w(L, H * D, hid)},
            "gate_proj": {"w": w(L, hid, inter)},
            "up_proj": {"w": w(L, hid, inter)},
            "down_proj": {"w": w(L, inter, hid)},
        },
    }


def main():
    import jax
    assert jax.default_backend() == "tpu", "needs the real TPU"
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.config import ModelConfig
    from dashinfer_tpu.engine.model_runtime import (ModelRuntime,
                                                    _detect_hbm_bytes,
                                                    _weight_bytes)
    from dashinfer_tpu.runtime.kv_cache import logical_page_bytes
    from dashinfer_tpu.utils import EnvConfig

    cfg = ModelConfig(arch="qwen2", vocab_size=32000, hidden_size=2048,
                      intermediate_size=8192, num_layers=16, num_heads=16,
                      num_kv_heads=16, head_dim=128, qkv_bias=True)
    rng = np.random.RandomState(0)
    t0 = time.time()
    params = build_params(cfg, rng)
    print(f"host params built in {time.time()-t0:.1f}s", file=sys.stderr)

    rt = (RuntimeConfigBuilder("pp").max_length(4096).max_batch(8)
          .kv_cache_page_size(256).dtype("bfloat16")
          .update({"min_prefill_bucket": 512,
                   "max_pages_per_seq": 17}).build())
    assert rt.cache.num_pages == 0, "auto planning must be active"

    hbm = _detect_hbm_bytes()
    w = _weight_bytes(params)
    lpb = logical_page_bytes(cfg, rt.cache, np.dtype("uint16"))
    heur_act = min(2 * 1024**3, max(512 * 1024**2, w // 4))
    print(f"HBM detected: {hbm/1024**3:.2f} GiB, weights "
          f"{w/1024**3:.2f} GiB, heuristic headroom "
          f"{heur_act/1024**3:.2f} GiB")

    t0 = time.time()
    eng = Engine().install_model("pp", rt, params=params, model_config=cfg)
    mrt = eng._models["pp"]
    print(f"install (incl. warmup measurement) in {time.time()-t0:.1f}s; "
          f"planned pool = {mrt.num_logical_pages} pages "
          f"({mrt.num_logical_pages*lpb/1024**3:.2f} GiB)")

    # what the heuristic WOULD have planned
    budget_heur = int(hbm * EnvConfig.hbm_mem_ratio()) - w - heur_act
    n_heur = min(max(budget_heur // lpb, 2 * rt.max_batch),
                 rt.max_batch * rt.max_pages_per_seq)
    delta = abs(int(n_heur) - mrt.num_logical_pages) * lpb
    print(f"heuristic would plan {n_heur} pages; warmup plan differs by "
          f"{delta/1024**3:.2f} GiB")

    # real drive at the largest bucket: prefill 4000 tokens + decode
    eng.start_model("pp")
    prompt = rng.randint(1, cfg.vocab_size, size=4000).tolist()
    gen = GenerationConfig(max_length=4016, do_sample=False, top_k=1,
                           eos_token_id=-1)
    t0 = time.time()
    _, h, q = eng.start_request("pp", prompt, gen)
    eng.sync_request("pp", h, timeout_s=3600)
    toks = q.GetAllGeneratedTokens()
    print(f"max-bucket prefill + decode OK in {time.time()-t0:.1f}s "
          f"({len(toks)} tokens) with the warmup-planned pool")
    eng.release_model("pp")
    print("POOL PLAN VALIDATION OK")


if __name__ == "__main__":
    main()
