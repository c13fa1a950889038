"""Qwen2-VL: vision tower + mRoPE positions vs HF torch (reference VLM
toolkit parity, SURVEY.md §2.19)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_vl_cfg():
    from transformers import Qwen2VLConfig
    return Qwen2VLConfig(
        vision_config=dict(depth=2, embed_dim=64, hidden_size=128,
                           num_heads=4, mlp_ratio=2, patch_size=4,
                           spatial_merge_size=2, temporal_patch_size=2),
        hidden_size=128, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
        max_position_embeddings=512,
        rope_scaling={"type": "mrope", "mrope_section": [4, 6, 6]},
        image_token_id=500, video_token_id=501, vision_start_token_id=502,
        vision_end_token_id=503)


@pytest.fixture(scope="module")
def vl_model():
    from transformers import Qwen2VLForConditionalGeneration
    torch.manual_seed(0)
    cfg = _tiny_vl_cfg()
    m = Qwen2VLForConditionalGeneration(cfg).eval().float()
    return cfg, m


def test_vision_tower_matches_hf(vl_model):
    import jax.numpy as jnp
    from dashinfer_tpu.models import qwen2_vl as VL

    cfg, m = vl_model
    vcfg = VL.vision_config_from_hf(cfg.vision_config.to_dict())
    vparams = VL.convert_hf_visual(dict(m.state_dict()), vcfg)

    grid = [(2, 4, 8)]  # t, h, w (patches)
    npatch = 2 * 4 * 8
    rng = np.random.RandomState(1)
    pixels = rng.randn(npatch, vcfg.patch_input_dim).astype(np.float32)

    with torch.no_grad():
        want = m.model.visual(torch.from_numpy(pixels),
                              grid_thw=torch.tensor(grid)).numpy()
    got = np.asarray(VL.vision_forward(vcfg, vparams, jnp.asarray(pixels),
                                       grid))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_mrope_positions_match_hf(vl_model):
    from dashinfer_tpu.models.qwen2_vl import get_mrope_positions

    cfg, m = vl_model
    merge = cfg.vision_config.spatial_merge_size
    grid = [(1, 4, 8)]
    n_img_tokens = (4 // merge) * (8 // merge)
    ids = ([7, 8, cfg.vision_start_token_id]
           + [cfg.image_token_id] * n_img_tokens
           + [cfg.vision_end_token_id, 9, 10, 11])
    with torch.no_grad():
        want_pos, want_delta = m.model.get_rope_index(
            torch.tensor([ids]), image_grid_thw=torch.tensor(grid))
    got_pos, got_delta = get_mrope_positions(
        ids, grid, cfg.image_token_id, cfg.video_token_id, merge)
    np.testing.assert_array_equal(got_pos, want_pos[:, 0].numpy())
    assert got_delta == int(want_delta[0])


def test_vlm_e2e_greedy_matches_hf(vl_model):
    """Full VLM flow: vision embeddings injected via mm_info + mRoPE
    positions -> greedy tokens match HF generate with the same image."""
    import jax.numpy as jnp
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model
    from dashinfer_tpu.models import qwen2_vl as VL
    from dashinfer_tpu.runtime.request import GenerateRequestStatus

    cfg, m = vl_model
    merge = cfg.vision_config.spatial_merge_size
    grid = [(1, 4, 8)]
    npatch = 1 * 4 * 8
    n_img_tokens = npatch // (merge * merge)
    rng = np.random.RandomState(7)
    vcfg = VL.vision_config_from_hf(cfg.vision_config.to_dict())
    pixels = rng.randn(npatch, vcfg.patch_input_dim).astype(np.float32)

    ids = ([7, 8, cfg.vision_start_token_id]
           + [cfg.image_token_id] * n_img_tokens
           + [cfg.vision_end_token_id, 9, 10, 11])
    n_new = 6

    # HF golden
    with torch.no_grad():
        out = m.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.from_numpy(pixels),
            image_grid_thw=torch.tensor(grid),
            max_new_tokens=n_new, do_sample=False)
    golden = out[0, len(ids):].tolist()

    # ours
    tcfg, params = build_from_torch_model(m, cfg.to_dict(), "float32")
    assert tcfg.arch == "qwen2_vl"
    vparams = VL.convert_hf_visual(dict(m.state_dict()), vcfg)
    embeds = np.asarray(VL.vision_forward(vcfg, vparams,
                                          jnp.asarray(pixels), grid))
    pos, delta = VL.get_mrope_positions(ids, grid, cfg.image_token_id,
                                        cfg.video_token_id, merge)

    rt = (RuntimeConfigBuilder("vl").max_length(96).max_batch(2)
          .kv_cache_page_size(16).kv_cache_num_pages(32).dtype("float32")
          .update({"min_prefill_bucket": 16}).build())
    eng = Engine().install_model("vl", rt, params=params, model_config=tcfg)
    eng.start_model("vl")
    gen = GenerationConfig(
        max_length=len(ids) + n_new, do_sample=False, top_k=1,
        eos_token_id=-1,
        mm_info=[(cfg.image_token_id, embeds)],
        mrope_positions=pos, mrope_position_delta=delta)
    _, h, q = eng.start_request("vl", ids, gen)
    eng.sync_request("vl", h, timeout_s=600)
    assert q.GenerateStatus() == GenerateRequestStatus.GenerateFinished
    got = q.GetAllGeneratedTokens()
    eng.release_model("vl")
    assert got == golden


def test_preprocess_matches_hf_processor():
    from transformers import Qwen2VLImageProcessor
    from dashinfer_tpu.vlm.preprocess import preprocess_image

    rng = np.random.RandomState(0)
    img = (rng.rand(30, 42, 3) * 255).astype(np.uint8)
    proc = Qwen2VLImageProcessor(patch_size=4, merge_size=2,
                                 temporal_patch_size=2)
    want = proc(images=[img], return_tensors="np")
    got, grid = preprocess_image(img, patch_size=4, merge_size=2,
                                 temporal_patch_size=2,
                                 min_pixels=proc.min_pixels,
                                 max_pixels=proc.max_pixels)
    assert tuple(want["image_grid_thw"][0]) == grid
    np.testing.assert_allclose(got, want["pixel_values"], rtol=2e-2,
                               atol=2e-2)  # PIL resample rounding


def test_preprocess_video_matches_hf_processor():
    """3 frames pad to 4 (repeat-last), grid_t=2; rows match HF's
    (deprecated but canonical) Qwen2VLImageProcessor video path."""
    from transformers import Qwen2VLImageProcessor
    from dashinfer_tpu.vlm.preprocess import preprocess_video

    rng = np.random.RandomState(0)
    frames = [(rng.rand(30, 42, 3) * 255).astype(np.uint8)
              for _ in range(3)]
    proc = Qwen2VLImageProcessor(patch_size=4, merge_size=2,
                                 temporal_patch_size=2)
    want = proc(images=None, videos=[frames], return_tensors="np")
    got, grid = preprocess_video(frames, patch_size=4, merge_size=2,
                                 temporal_patch_size=2,
                                 min_pixels=proc.min_pixels,
                                 max_pixels=proc.max_pixels)
    assert tuple(want["video_grid_thw"][0]) == grid
    assert grid[0] == 2
    np.testing.assert_allclose(got, want["pixel_values_videos"], rtol=2e-2,
                               atol=2e-2)  # PIL resample rounding


def test_vlm_e2e_video_greedy_matches_hf(vl_model):
    """Video flow: grid_t > 1 embeddings injected at video_token_id runs +
    temporal mRoPE -> greedy tokens match HF generate with the same
    pixel_values_videos."""
    import jax.numpy as jnp
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model
    from dashinfer_tpu.models import qwen2_vl as VL
    from dashinfer_tpu.runtime.request import GenerateRequestStatus

    cfg, m = vl_model
    merge = cfg.vision_config.spatial_merge_size
    grid = [(2, 4, 4)]
    npatch = 2 * 4 * 4
    n_vid_tokens = npatch // (merge * merge)
    rng = np.random.RandomState(11)
    vcfg = VL.vision_config_from_hf(cfg.vision_config.to_dict())
    pixels = rng.randn(npatch, vcfg.patch_input_dim).astype(np.float32)

    ids = ([7, 8, cfg.vision_start_token_id]
           + [cfg.video_token_id] * n_vid_tokens
           + [cfg.vision_end_token_id, 9, 10, 11])
    n_new = 6

    with torch.no_grad():
        out = m.generate(
            input_ids=torch.tensor([ids]),
            pixel_values_videos=torch.from_numpy(pixels),
            video_grid_thw=torch.tensor(grid),
            max_new_tokens=n_new, do_sample=False)
    golden = out[0, len(ids):].tolist()

    tcfg, params = build_from_torch_model(m, cfg.to_dict(), "float32")
    vparams = VL.convert_hf_visual(dict(m.state_dict()), vcfg)
    embeds = np.asarray(VL.vision_forward(vcfg, vparams,
                                          jnp.asarray(pixels), grid))
    pos, delta = VL.get_mrope_positions(ids, grid, cfg.image_token_id,
                                        cfg.video_token_id, merge)
    with torch.no_grad():
        want_pos, want_delta = m.model.get_rope_index(
            torch.tensor([ids]), video_grid_thw=torch.tensor(grid))
    np.testing.assert_array_equal(pos, want_pos[:, 0].numpy())

    rt = (RuntimeConfigBuilder("vl").max_length(96).max_batch(2)
          .kv_cache_page_size(16).kv_cache_num_pages(32).dtype("float32")
          .update({"min_prefill_bucket": 16}).build())
    eng = Engine().install_model("vl", rt, params=params, model_config=tcfg)
    eng.start_model("vl")
    gen = GenerationConfig(
        max_length=len(ids) + n_new, do_sample=False, top_k=1,
        eos_token_id=-1,
        mm_info=[(cfg.video_token_id, embeds)],
        mrope_positions=pos, mrope_position_delta=delta)
    _, h, q = eng.start_request("vl", ids, gen)
    eng.sync_request("vl", h, timeout_s=600)
    assert q.GenerateStatus() == GenerateRequestStatus.GenerateFinished
    got = q.GetAllGeneratedTokens()
    eng.release_model("vl")
    assert got == golden


def test_vision_runner_cache(vl_model):
    from dashinfer_tpu.models import qwen2_vl as VL
    from dashinfer_tpu.vlm.runner import VisionRunner

    cfg, m = vl_model
    vcfg = VL.vision_config_from_hf(cfg.vision_config.to_dict())
    vparams = VL.convert_hf_visual(dict(m.state_dict()), vcfg)
    runner = VisionRunner(vcfg, vparams)
    rng = np.random.RandomState(3)
    patches = rng.randn(32, vcfg.patch_input_dim).astype(np.float32)
    e1 = runner.embed(patches, (1, 4, 8))
    e2 = runner.embed(patches, (1, 4, 8))
    assert runner.hits == 1 and runner.misses == 1
    np.testing.assert_array_equal(e1, e2)

    req = runner.build_request(
        [7, cfg.vision_start_token_id] + [cfg.image_token_id] * 8 + [9],
        [(patches, (1, 4, 8))], cfg.image_token_id, cfg.video_token_id)
    assert req["mm_info"][0][1].shape == (8, cfg.vision_config.hidden_size)
    assert req["mrope_positions"].shape[0] == 3


def test_vision_runner_remote_tier(vl_model):
    """Remote embedding tier (reference redis CacheUnion, multimodal
    utils/cache/): checked after a local miss, populated on compute, and a
    remote hit refills the local LRU. Uses a dict-backed fake store (redis
    itself is optional and absent in CI)."""
    from dashinfer_tpu.models import qwen2_vl as VL
    from dashinfer_tpu.vlm.runner import VisionRunner

    cfg, m = vl_model
    vcfg = VL.vision_config_from_hf(cfg.vision_config.to_dict())
    vparams = VL.convert_hf_visual(dict(m.state_dict()), vcfg)

    class FakeStore:
        def __init__(self):
            self.d = {}
        def get(self, key):
            return self.d.get(key)
        def put(self, key, value):
            self.d[key] = np.array(value)

    store = FakeStore()
    r1 = VisionRunner(vcfg, vparams, remote_store=store)
    rng = np.random.RandomState(5)
    patches = rng.randn(32, vcfg.patch_input_dim).astype(np.float32)
    e1 = r1.embed(patches, (1, 4, 8))
    assert r1.misses == 1 and len(store.d) == 1

    # a SECOND runner (fresh local LRU, shared store) hits remotely
    r2 = VisionRunner(vcfg, vparams, remote_store=store)
    e2 = r2.embed(patches, (1, 4, 8))
    assert r2.remote_hits == 1 and r2.misses == 0
    np.testing.assert_array_equal(e1, e2)
    # and the remote hit refilled r2's local tier
    r2.embed(patches, (1, 4, 8))
    assert r2.hits == 1
