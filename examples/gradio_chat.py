"""Gradio streaming chat demo (mirrors the reference's examples/python/
3_gradio flow: tokenizer chat template -> engine streaming -> incremental
textbox updates).

Requires `gradio` (not bundled in this image — the demo exits with a hint
if absent).

Usage:
  python examples/gradio_chat.py --model /path/to/Qwen2-7B-Instruct \
      [--quant a16w4] [--kv-cache-mode int8] [--port 7860]
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--max-length", type=int, default=4096)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--quant", default="none",
                    choices=["none", "a16w8", "a16w4"])
    ap.add_argument("--kv-cache-mode", default="default",
                    choices=["default", "int8", "uint4"])
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args()

    try:
        import gradio as gr
    except ImportError:
        raise SystemExit("this demo needs `pip install gradio` "
                         "(not bundled); the engine itself does not")

    from transformers import AutoTokenizer
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.config import CacheMode
    from dashinfer_tpu.runtime.request import GenerateRequestStatus

    tokenizer = AutoTokenizer.from_pretrained(args.model)
    builder = (RuntimeConfigBuilder("chat")
               .max_length(args.max_length).max_batch(args.max_batch)
               .kv_cache_mode(CacheMode(args.kv_cache_mode)))
    if args.quant != "none":
        builder.weight_quant(args.quant)
    engine = Engine()
    engine.install_model(args.model, builder.build(), tokenizer=tokenizer)
    engine.start_model("chat")

    live = (GenerateRequestStatus.Init, GenerateRequestStatus.Generating,
            GenerateRequestStatus.ContextFinished)

    def respond(message, history, temperature, top_p, max_new_tokens):
        messages = []
        for user, assistant in history:
            messages.append({"role": "user", "content": user})
            messages.append({"role": "assistant", "content": assistant})
        messages.append({"role": "user", "content": message})
        ids = tokenizer.apply_chat_template(
            messages, add_generation_prompt=True, tokenize=True)
        gen = GenerationConfig(
            max_length=len(ids) + int(max_new_tokens),
            temperature=float(temperature), top_p=float(top_p),
            do_sample=temperature > 0,
            eos_token_id=int(tokenizer.eos_token_id))
        _, handle, queue = engine.start_request("chat", ids, gen)
        out_ids = []
        try:
            while queue.GenerateStatus() in live:
                el = queue.Get()
                if el is None:
                    continue
                out_ids.extend(el.ids_from_generate)
                yield tokenizer.decode(out_ids, skip_special_tokens=True)
            if queue.GenerateStatus() == \
                    GenerateRequestStatus.GenerateInterrupted:
                yield tokenizer.decode(out_ids, skip_special_tokens=True) \
                    + "\n[interrupted: KV cache exhausted — retry]"
        finally:
            engine.release_request("chat", handle)

    demo = gr.ChatInterface(
        respond,
        additional_inputs=[
            gr.Slider(0.0, 2.0, value=0.7, label="temperature"),
            gr.Slider(0.0, 1.0, value=0.9, label="top_p"),
            gr.Slider(16, 2048, value=512, step=16,
                      label="max new tokens"),
        ],
        title="dashinfer_tpu chat")
    demo.queue().launch(server_port=args.port)


if __name__ == "__main__":
    main()
