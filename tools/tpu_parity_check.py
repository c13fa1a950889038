"""Hardware parity smoke check: run tiny engine greedy drives ON THE TPU
with the megakernel fast paths forced and compare tokens against the HF
torch oracle. Catches silent Mosaic lowering divergences that interpret-mode
tests cannot (they run the kernel as jax ops on CPU).

Float cases (oracle = HF torch greedy):
  qwen2-decode    decode megakernel (prefill via tiny XLA bucket)
  qwen2-prefill   prefill megakernel (128 bucket) + decode megakernel
  qwen3-prefill   Qwen3 per-head QK RMSNorm through both kernels
  qwen2moe        MoE router/expert streams through both kernels

Quantized cases (oracle = the XLA decode_forward reference on identical
cache/inputs, step-level, Mosaic-lowered kernel — HF torch has no u4
weights to compare against):
  a16w4-int8-decode    u4 weights + int8 KV
  a16w8-uint4-decode   i8 weights + u4 KV (GQA geometry)
  a16w4-int8-ps64      the DEFAULT page_size=64 config (round-1 breaker)
  a16w4-int8-ps256     128-lane RMW qparam windows past lane 128

Usage: python tools/tpu_parity_check.py [case ...]   (needs the real TPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def run_case(name, hf, min_bucket, want_prefill_mega):
    import hf_util
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model

    model = hf_util.make_torch_model(hf)
    cfg, params = build_from_torch_model(model, hf.to_dict(), "float32")
    rt = (RuntimeConfigBuilder("m").max_length(192).max_batch(4)
          .kv_cache_page_size(16).kv_cache_num_pages(48).dtype("float32")
          .update({"min_prefill_bucket": min_bucket}).build())
    eng = Engine().install_model("m", rt, params=params, model_config=cfg)
    mrt = eng._models["m"]
    assert mrt.mega_plan is not None, \
        f"[{name}] decode megakernel not selected — check would not cover it"
    if want_prefill_mega:
        assert mrt._pmk_plans, \
            f"[{name}] prefill megakernel not selected for any bucket"
    eng.start_model("m")
    prompt = [(7 * i + 5) % (hf.vocab_size - 2) + 1 for i in range(40)]
    n_new = 14
    _, h, q = eng.start_request("m", prompt, GenerationConfig(
        max_length=len(prompt) + n_new, do_sample=False, top_k=1,
        eos_token_id=-1))
    eng.sync_request("m", h, timeout_s=1800)
    got = list(q.GetAllGeneratedTokens())
    want = list(hf_util.hf_greedy_tokens(model, prompt, n_new))
    print(f"[{name}] tpu   :", got)
    print(f"[{name}] oracle:", want)
    eng.release_model("m")
    # fp32 engine vs fp32 torch through a bf16-ish kernel: token-level match
    # expected on a tiny model; any divergence needs a look
    assert got == want, \
        f"[{name}] TPU megakernel tokens diverge from HF oracle"
    print(f"[{name}] TPU megakernel parity: OK", flush=True)


def run_case_quant(name, quant, kv_mode_name, ps=16):
    """Megakernel decode step vs the XLA decode_forward reference on
    identical cache/inputs, executed ON the TPU through the real
    Mosaic-lowered kernel (interpret=False): logits rel-tol + per-row
    argmax (greedy) parity + KV/qparam write-back checks. Step-level on
    purpose — a free-running engine-vs-engine token comparison amplifies
    bf16-vs-f32 near-ties on random tiny quantized models into spurious
    divergence, while a miscompile shows up in a single step's logits.
    torch has no u4/i8 oracle; the XLA path is the cross-implementation
    reference (itself covered by the float engine cases above)."""
    from tests.test_megakernel import run_megakernel_parity_case
    run_megakernel_parity_case(quant, kv_mode_name, qk_norm=False,
                               alibi=False, page_chunk=1, ps=ps,
                               interpret=False)
    print(f"[{name}] TPU quantized step parity: OK", flush=True)


def main():
    import jax
    assert jax.default_backend() == "tpu", "needs the real TPU"
    import hf_util

    # head_dim must be 128 for the megakernel; min_prefill_bucket=16 keeps
    # prefill on the XLA path (decode-only coverage), 128 forces the
    # prefill megakernel bucket
    cases = {
        "qwen2-decode": lambda: run_case(
            "qwen2-decode", hf_util.tiny_qwen2_config(
                vocab=512, hidden=256, inter=512, layers=2, heads=2,
                kv_heads=1), 16, False),
        "qwen2-prefill": lambda: run_case(
            "qwen2-prefill", hf_util.tiny_qwen2_config(
                vocab=512, hidden=256, inter=512, layers=2, heads=2,
                kv_heads=1), 128, True),
        "qwen3-prefill": lambda: run_case(
            "qwen3-prefill", hf_util.tiny_qwen3_config(
                vocab=512, hidden=256, inter=512, layers=2, heads=2,
                kv_heads=1), 128, True),
        "qwen2moe": lambda: run_case(
            "qwen2moe", hf_util.tiny_qwen2_moe_config(
                vocab=512, hidden=256, inter=512, layers=2, heads=2,
                kv_heads=1), 128, True),
        "a16w4-int8-decode": lambda: run_case_quant(
            "a16w4-int8-decode", "a16w4", "int8"),
        # u4 KV runs GQA geometry inside the case (KH*D/2 >= 128 gate)
        "a16w8-uint4-decode": lambda: run_case_quant(
            "a16w8-uint4-decode", "a16w8", "uint4"),
        "a16w4-int8-ps64": lambda: run_case_quant(
            "a16w4-int8-ps64", "a16w4", "int8", ps=64),
        "a16w4-int8-ps256": lambda: run_case_quant(
            "a16w4-int8-ps256", "a16w4", "int8", ps=256),
    }
    picked = sys.argv[1:] or list(cases)
    for name in picked:
        cases[name]()
    print("ALL PARITY CASES OK")


if __name__ == "__main__":
    main()
