"""Guided (JSON) decoding tests (reference guided_decoding.rst behavior:
response_format={"type":"json_object"} makes output valid JSON)."""

import json

import numpy as np
import pytest


class FakeTokenizer:
    """Maps each id to a fixed string; enough surface for the enforcer."""

    def __init__(self, strings):
        self.strings = strings

    def __len__(self):
        return len(self.strings)

    def decode(self, ids, **kw):
        if isinstance(ids, int):
            ids = [ids]
        return "".join(self.strings[i] for i in ids)


JSONISH = ['{', '}', '[', ']', '"', ':', ',', ' ', 'a', 'b', 'key', 'val',
           '1', '2', '37', 'true', 'false', 'null', '"x"', '0.5', '-3',
           '{"', '"}', '": ', 'e8', '\\n']
GARBAGE = ['<?', 'def ', '>>>', '%%', ');', 'END', '\x01', '<<']


def _vocab(n=64):
    strings = []
    for i in range(n):
        pool = JSONISH if i % 2 == 0 else GARBAGE
        strings.append(pool[(i // 2) % len(pool)])
    return strings


def test_json_state_machine():
    from dashinfer_tpu.engine.guided import JsonState, advance_str, is_complete

    ok = ['{}', '{"a": 1}', '{"a": [1, 2, {"b": null}], "c": "x"}',
          '{"s": "he\\"llo", "n": -1.5e8}', '[1, 2]']
    for s in ok:
        st = JsonState()
        assert advance_str(st, s), s
        assert is_complete(st), s
        json.loads(s)  # sanity: our acceptor agrees with python json

    bad = ['{,', '{"a" 1}', '{"a": 01}', '{"a": tru]', '}', '{"a": 1}}',
           '{"a": .5}', '{"a": 1,,', 'hello']
    for s in bad:
        st = JsonState()
        full_ok = advance_str(st, s) and is_complete(st)
        # either rejected mid-way or not complete-and-valid
        assert not full_ok or not _pyjson_ok(s), s

    # prefixes are accepted but not complete
    st = JsonState()
    assert advance_str(st, '{"a": [1,')
    assert not is_complete(st)


def _pyjson_ok(s):
    try:
        json.loads(s)
        return True
    except Exception:
        return False


def test_enforcer_mask_allows_only_valid_prefixes():
    from dashinfer_tpu.engine.guided import JsonFormatEnforcer

    strings = _vocab()
    tok = FakeTokenizer(strings)
    enf = JsonFormatEnforcer(tok, eos_token_id=0, vocab_size=len(strings))

    mask = enf.allowed_mask()
    for i, s in enumerate(strings):
        if mask[i]:
            from dashinfer_tpu.engine.guided import JsonState, advance_str
            st = JsonState()
            assert advance_str(st, s), (i, s)
    # at start only '{'/'['-leading tokens allowed
    assert not mask[strings.index('>>>') if '>>>' in strings else 1]

    # drive a random walk through allowed tokens; the text must stay a valid
    # JSON prefix and reach completion acceptance by python json at the end
    rng = np.random.RandomState(0)
    text = ""
    for step in range(40):
        mask = enf.allowed_mask()
        if enf.complete:
            break
        ids = np.nonzero(mask)[0]
        assert len(ids), f"dead end at: {text!r}"
        tid = int(rng.choice(ids))
        assert enf.advance(tid), (text, strings[tid])
        text += strings[tid]
    # finish: if not complete, the text is at least a valid prefix
    from dashinfer_tpu.engine.guided import JsonState, advance_str
    st = JsonState()
    assert advance_str(st, text), text
    if enf.complete:
        json.loads(text)


def test_engine_json_mode_e2e():
    """Random-weight model + fake tokenizer: sampled output must be a valid
    JSON prefix (complete JSON if EOS'd)."""
    import tests.hf_util as hf_util
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model
    from dashinfer_tpu.engine.guided import JsonState, advance_str

    hf_cfg = hf_util.tiny_qwen2_config(vocab=64)
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")

    strings = _vocab(64)
    tok = FakeTokenizer(strings)
    rt = (RuntimeConfigBuilder("json").max_length(64).max_batch(2)
          .kv_cache_page_size(16).kv_cache_num_pages(16).dtype("float32")
          .update({"min_prefill_bucket": 16}).build())
    eng = Engine()
    eng.install_model("json", rt, params=params, model_config=cfg,
                      tokenizer=tok)
    eng.start_model("json")
    try:
        gen = GenerationConfig(max_length=40, do_sample=True, top_k=0,
                               temperature=1.0, seed=3, eos_token_id=0,
                               response_format={"type": "json_object"})
        _, h, q = eng.start_request("json", [5, 9, 3], gen)
        eng.sync_request("json", h, timeout_s=600)
        out_ids = q.GetAllGeneratedTokens()
        eng.release_request("json", h)
        text = "".join(strings[i] for i in out_ids if i != 0)
        st = JsonState()
        assert advance_str(st, text), f"not a JSON prefix: {text!r}"
    finally:
        eng.release_model("json")


def test_enforcer_advances_before_next_mask_with_async_prefill():
    """The async prefill drain must not let a decode step compute its
    allowed mask from a stale FSM: every allowed_mask() call after
    generation starts must be preceded by advance() of ALL previously
    emitted tokens (round-4 regression: the first decode tick after an
    async prefill read the mask before the in-flight first token had
    advanced the enforcer)."""
    import tests.hf_util as hf_util
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model
    from dashinfer_tpu.engine.model_runtime import ModelRuntime
    import numpy as np

    hf = hf_util.tiny_qwen2_config()
    cfg, params = build_from_torch_model(hf_util.make_torch_model(hf),
                                         hf.to_dict(), "float32")

    events = []

    class SpyEnforcer:
        complete = False

        def __init__(self, vocab):
            self.vocab = vocab
            self.n_advanced = 0

        def allowed_mask(self):
            events.append(("mask", self.n_advanced))
            return np.ones((self.vocab,), bool)

        def advance(self, tok):
            self.n_advanced += 1
            events.append(("advance", self.n_advanced))

    rt = (RuntimeConfigBuilder("g").max_length(64).max_batch(2)
          .kv_cache_page_size(16).kv_cache_num_pages(24).dtype("float32")
          .update({"min_prefill_bucket": 16}).build())
    eng = Engine().install_model("g", rt, params=params, model_config=cfg)
    runtime = eng._models["g"]
    runtime._make_enforcer = \
        lambda req: (SpyEnforcer(cfg.vocab_size)
                     if req.gen_cfg.response_format else None)
    eng.start_model("g")
    gen = GenerationConfig(max_length=12, do_sample=False, top_k=1,
                           eos_token_id=-1,
                           response_format={"type": "json_object"})
    _, h, q = eng.start_request("g", [5, 9, 2], gen)
    eng.sync_request("g", h, timeout_s=900)
    toks = q.GetAllGeneratedTokens()
    assert len(toks) == 12 - 3
    # every mask computed for decode step k must have seen k prior tokens:
    # the n_advanced value at each "mask" event must equal the number of
    # tokens emitted so far (prefill mask sees 0; step k's mask sees k)
    mask_counts = [n for kind, n in events if kind == "mask"]
    assert mask_counts == list(range(len(mask_counts))), events
    eng.release_model("g")
