"""Hardware parity smoke check: run the tiny engine greedy drive ON THE TPU
with the megakernel fast path forced and compare tokens against the HF torch
oracle. Catches silent Mosaic lowering divergences that interpret-mode tests
cannot (they run the kernel as jax ops on CPU).

Usage: python tools/tpu_parity_check.py   (needs the real TPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    import jax
    assert jax.default_backend() == "tpu", "needs the real TPU"
    import numpy as np
    import hf_util
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model

    # head_dim must be 128 for the megakernel; bf16 end-to-end like prod
    hf = hf_util.tiny_qwen2_config(vocab=512, hidden=256, inter=512,
                                   layers=2, heads=2, kv_heads=1)
    model = hf_util.make_torch_model(hf)
    cfg, params = build_from_torch_model(model, hf.to_dict(), "float32")
    rt = (RuntimeConfigBuilder("m").max_length(96).max_batch(4)
          .kv_cache_page_size(16).kv_cache_num_pages(32).dtype("float32")
          .update({"min_prefill_bucket": 16}).build())
    eng = Engine().install_model("m", rt, params=params, model_config=cfg)
    mrt = eng._models["m"]
    assert mrt.mega_plan is not None, \
        "megakernel not selected — parity check would not cover it"
    eng.start_model("m")
    prompt = [5, 9, 2, 41, 77, 3]
    n_new = 14
    _, h, q = eng.start_request("m", prompt, GenerationConfig(
        max_length=len(prompt) + n_new, do_sample=False, top_k=1,
        eos_token_id=-1))
    eng.sync_request("m", h, timeout_s=1800)
    got = list(q.GetAllGeneratedTokens())
    want = list(hf_util.hf_greedy_tokens(model, prompt, n_new))
    print("tpu   :", got)
    print("oracle:", want)
    # fp32 engine vs fp32 torch through a bf16-ish kernel: token-level match
    # expected on a tiny model; any divergence needs a look
    assert got == want, "TPU megakernel tokens diverge from HF oracle"
    print("TPU megakernel parity: OK")
    eng.release_model("m")


if __name__ == "__main__":
    main()
