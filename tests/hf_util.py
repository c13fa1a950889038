"""Helpers to build tiny randomly-initialized HF torch models as golden
references (no network; mirrors the reference's Arbiter parity methodology,
SURVEY.md §8.13)."""

import numpy as np
import torch


def tiny_qwen2_config(vocab=512, hidden=64, inter=128, layers=2, heads=4,
                      kv_heads=2, tie=False):
    from transformers import Qwen2Config
    return Qwen2Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=1024,
        rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=tie,
        attention_dropout=0.0)


def tiny_llama_config(vocab=512, hidden=64, inter=128, layers=2, heads=4,
                      kv_heads=2):
    from transformers import LlamaConfig
    return LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=1024,
        rope_theta=10000.0, rms_norm_eps=1e-6, attention_dropout=0.0,
        attention_bias=False)


def tiny_qwen3_config(vocab=512, hidden=64, inter=128, layers=2, heads=4,
                      kv_heads=2):
    from transformers import Qwen3Config
    return Qwen3Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, head_dim=hidden // heads,
        max_position_embeddings=1024, rope_theta=10000.0, rms_norm_eps=1e-6,
        attention_dropout=0.0)


def tiny_qwen2_moe_config(vocab=512, hidden=64, inter=128, layers=2, heads=4,
                          kv_heads=2, experts=4, topk=2):
    from transformers import Qwen2MoeConfig
    return Qwen2MoeConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=1024,
        rope_theta=10000.0, rms_norm_eps=1e-6, attention_dropout=0.0,
        num_experts=experts, num_experts_per_tok=topk,
        moe_intermediate_size=inter // 2,
        shared_expert_intermediate_size=inter,
        decoder_sparse_step=1, norm_topk_prob=False, mlp_only_layers=[])


def tiny_qwen3_moe_config(vocab=512, hidden=64, inter=128, layers=2, heads=4,
                          kv_heads=2, experts=4, topk=2):
    from transformers import Qwen3MoeConfig
    return Qwen3MoeConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, head_dim=hidden // heads,
        max_position_embeddings=1024, rope_theta=10000.0, rms_norm_eps=1e-6,
        attention_dropout=0.0, num_experts=experts, num_experts_per_tok=topk,
        moe_intermediate_size=inter // 2, decoder_sparse_step=1,
        norm_topk_prob=True, mlp_only_layers=[])


def tiny_gpt2_config(vocab=512, hidden=64, layers=2, heads=4):
    from transformers import GPT2Config
    return GPT2Config(vocab_size=vocab, n_embd=hidden, n_layer=layers,
                      n_head=heads, n_positions=256,
                      attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0)


def tiny_bloom_config(vocab=512, hidden=64, layers=2, heads=4):
    from transformers import BloomConfig
    return BloomConfig(vocab_size=vocab, hidden_size=hidden, n_layer=layers,
                       n_head=heads, attention_dropout=0.0,
                       hidden_dropout=0.0)


def tiny_gpt_neox_config(vocab=512, hidden=64, layers=2, heads=4):
    from transformers import GPTNeoXConfig
    return GPTNeoXConfig(vocab_size=vocab, hidden_size=hidden,
                         num_hidden_layers=layers, num_attention_heads=heads,
                         intermediate_size=hidden * 4, rotary_pct=0.25,
                         max_position_embeddings=256,
                         use_parallel_residual=True, attention_dropout=0.0,
                         hidden_dropout=0.0)


def make_torch_model(config, seed=0):
    from transformers import AutoModelForCausalLM
    torch.manual_seed(seed)
    model = AutoModelForCausalLM.from_config(config)
    model.eval()
    return model


def hf_greedy_tokens(model, input_ids, n_new):
    """Greedy continuation token ids via HF forward loop (float32)."""
    ids = torch.tensor([input_ids], dtype=torch.long)
    out = []
    with torch.no_grad():
        past = None
        feed = ids
        for _ in range(n_new):
            res = model(input_ids=feed, past_key_values=past, use_cache=True)
            past = res.past_key_values
            tok = int(torch.argmax(res.logits[0, -1]))
            out.append(tok)
            feed = torch.tensor([[tok]], dtype=torch.long)
    return out


def hf_full_logits(model, input_ids):
    ids = torch.tensor([input_ids], dtype=torch.long)
    with torch.no_grad():
        return model(input_ids=ids).logits[0].float().numpy()
