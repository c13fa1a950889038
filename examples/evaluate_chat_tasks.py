"""Chat-task accuracy evaluation (GSM8K / MMLU / C-Eval style) through the
serving engine.

Reference methodology: examples/python/2_evaluation/cpu/evaluate_chat_*.py
drive the converted model over benchmark jsonl files and score exact-match /
multiple-choice accuracy (SURVEY.md §8.13). This environment has no network
egress, so the harness takes LOCAL dataset files:

  GSM8K-style jsonl:  {"question": ..., "answer": "... #### 42"}
  MMLU/C-Eval csv:    question,A,B,C,D,answer

Generation runs through the full engine (continuous batching, megakernel
fast path on TPU) so the eval also exercises the serving stack end to end.

Usage:
  python examples/evaluate_chat_tasks.py --model <hf_dir> \
      --task gsm8k --data gsm8k_test.jsonl [--limit 200] \
      [--quant a16w4] [--max-new 256] [--batch 8]
  python examples/evaluate_chat_tasks.py --model <hf_dir> \
      --task mmlu --data mmlu_val.csv [--limit 500]
"""

import argparse
import csv
import json
import re
import sys


GSM8K_PROMPT = ("Question: {q}\nLet's think step by step. "
                "End your answer with '#### <number>'.\nAnswer:")
MC_PROMPT = ("The following is a multiple-choice question. Answer with a "
             "single letter (A, B, C or D).\n\n{q}\nA. {a}\nB. {b}\n"
             "C. {c}\nD. {d}\nAnswer:")


def extract_gsm8k(text):
    m = re.findall(r"####\s*(-?[\d,\.]+)", text)
    if m:
        return m[-1].replace(",", "").rstrip(".")
    m = re.findall(r"(-?\d[\d,]*\.?\d*)", text)
    return m[-1].replace(",", "").rstrip(".") if m else None


def extract_choice(text):
    m = re.search(r"\b([ABCD])\b", text.strip())
    return m.group(1) if m else None


def load_task(task, path, limit):
    items = []
    if task == "gsm8k":
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                d = json.loads(line)
                gold = extract_gsm8k(d["answer"])
                items.append((GSM8K_PROMPT.format(q=d["question"]), gold))
    else:
        with open(path) as f:
            for row in csv.reader(f):
                if len(row) < 6:
                    continue
                q, a, b, c, d, ans = row[:6]
                ans = ans.strip().upper()
                if ans not in ("A", "B", "C", "D"):
                    continue  # header row or malformed line
                items.append((MC_PROMPT.format(q=q, a=a, b=b, c=c, d=d),
                              ans))
    return items[:limit] if limit else items


def answers_match(task, got, gold):
    if got is None or gold is None:
        return False
    if task != "gsm8k":
        return got == gold
    try:  # numeric compare: '42.0' == '042' == '42'
        return abs(float(got) - float(gold)) < 1e-6
    except ValueError:
        return got == gold


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="HF checkpoint dir")
    ap.add_argument("--task", choices=["gsm8k", "mmlu", "ceval"],
                    default="gsm8k")
    ap.add_argument("--data", required=True, help="local dataset file")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--quant", default="none")
    ap.add_argument("--max-new", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-length", type=int, default=2048)
    args = ap.parse_args()

    from transformers import AutoTokenizer

    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder

    tok = AutoTokenizer.from_pretrained(args.model, trust_remote_code=True)
    rtb = (RuntimeConfigBuilder("eval").max_length(args.max_length)
           .max_batch(args.batch))
    if args.quant != "none":
        rtb = rtb.weight_quant(args.quant, 128)
    eng = Engine().install_model(args.model, rtb.build(), tokenizer=tok)
    eng.start_model("eval")

    items = load_task(args.task, args.data, args.limit)
    print(f"{args.task}: {len(items)} items", file=sys.stderr)
    extract = extract_gsm8k if args.task == "gsm8k" else extract_choice
    max_new = args.max_new if args.task == "gsm8k" else 8

    # submit everything; the engine's continuous batching packs the slots
    handles = []
    for prompt, gold in items:
        ids = tok(prompt)["input_ids"][-(args.max_length - max_new - 8):]
        gen = GenerationConfig(
            max_length=min(len(ids) + max_new, args.max_length),
            do_sample=False, top_k=1,
            eos_token_id=tok.eos_token_id if tok.eos_token_id is not None
            else -1)
        _, h, q = eng.start_request("eval", ids, gen)
        handles.append((h, q, gold))

    correct = 0
    for i, (h, q, gold) in enumerate(handles):
        eng.sync_request("eval", h, timeout_s=3600)
        text = tok.decode(q.GetAllGeneratedTokens())
        got = extract(text)
        correct += int(answers_match(args.task, got, gold))
        if (i + 1) % 20 == 0:
            print(f"  {i+1}/{len(handles)} acc={correct/(i+1):.3f}",
                  file=sys.stderr)
        eng.release_request("eval", h)

    acc = correct / max(len(handles), 1)
    print(json.dumps({"task": args.task, "n": len(handles),
                      "accuracy": round(acc, 4)}))
    eng.release_model("eval")


if __name__ == "__main__":
    main()
