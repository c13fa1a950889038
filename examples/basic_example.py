"""Canonical user flow (mirrors the reference's basic example,
examples/python/0_basic/cuda/basic_example_qwen_v20.py — SURVEY.md §8.17).

Usage with a real HF checkpoint:
  python examples/basic_example.py --model /path/to/Qwen2-7B-Instruct \
      --quant a16w8 --kv-cache-mode int8 --prompt "What is TPU?"
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--prompt", default="Hello! Tell me about TPUs.")
    ap.add_argument("--max-new-tokens", type=int, default=128)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--quant", default="none", choices=["none", "a16w8", "a16w4"])
    ap.add_argument("--group-size", type=int, default=-1)
    ap.add_argument("--kv-cache-mode", default="default",
                    choices=["default", "int8", "uint4"])
    ap.add_argument("--top-k", type=int, default=1)
    args = ap.parse_args()

    from transformers import AutoTokenizer
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.config import CacheMode
    from dashinfer_tpu.runtime.request import GenerateRequestStatus

    tokenizer = AutoTokenizer.from_pretrained(args.model)

    # 1. runtime config (reference AsModelRuntimeConfigBuilder)
    builder = (RuntimeConfigBuilder("demo")
               .max_length(4096).max_batch(args.max_batch)
               .kv_cache_mode(CacheMode(args.kv_cache_mode)))
    if args.quant != "none":
        builder.weight_quant(args.quant, args.group_size)
    rt = builder.build()

    # 2. install + start (conversion/quantization happen at install)
    engine = Engine()
    engine.install_model(args.model, rt, tokenizer=tokenizer)
    engine.start_model("demo")

    # 3. request with streaming
    gen_cfg = GenerationConfig(max_length=4096, top_k=args.top_k,
                               do_sample=args.top_k != 1)
    messages = [{"role": "user", "content": args.prompt}]
    try:
        ids = tokenizer.apply_chat_template(messages,
                                            add_generation_prompt=True,
                                            tokenize=True)
    except Exception:
        ids = tokenizer.encode(args.prompt)
    gen_cfg.max_length = len(ids) + args.max_new_tokens
    gen_cfg.eos_token_id = int(tokenizer.eos_token_id)

    status, handle, queue = engine.start_request("demo", ids, gen_cfg)
    printed = 0
    all_ids = []
    while queue.GenerateStatus() in (GenerateRequestStatus.Init,
                                     GenerateRequestStatus.Generating,
                                     GenerateRequestStatus.ContextFinished):
        el = queue.Get()
        if el is None:
            continue
        all_ids.extend(el.ids_from_generate)
        text = tokenizer.decode(all_ids, skip_special_tokens=True)
        print(text[printed:], end="", flush=True)
        printed = len(text)
    print()
    print("status:", queue.GenerateStatus())
    print("stats:", {k: round(v, 4) for k, v in queue.RequestStatInfo().items()})

    engine.release_request("demo", handle)
    engine.stop_model("demo")
    engine.release_model("demo")


if __name__ == "__main__":
    main()
