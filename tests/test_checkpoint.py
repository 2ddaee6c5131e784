"""Checkpoint loading + converted-cache tests."""
import numpy as np
import pytest

import jax.numpy as jnp

from tests.fixtures import write_tiny_checkpoint
from qwen3_asr_tpu.runtime.checkpoint import load_asr_checkpoint


def test_load_and_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("ASR_CONVERTED_CACHE", str(tmp_path / "cache"))
    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)

    cfg1, params1 = load_asr_checkpoint(ckpt, dtype=jnp.float32)
    cfg2, params2 = load_asr_checkpoint(ckpt, dtype=jnp.float32)  # cache hit

    assert cfg1.decoder.hidden_size == cfg2.decoder.hidden_size
    import jax
    for a, b in zip(jax.tree.leaves(params1), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cache_key_varies_by_dtype(tmp_path, monkeypatch):
    monkeypatch.setenv("ASR_CONVERTED_CACHE", str(tmp_path / "cache"))
    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    _, p32 = load_asr_checkpoint(ckpt, dtype=jnp.float32)
    _, p16 = load_asr_checkpoint(ckpt, dtype=jnp.bfloat16)
    assert p32["decoder"]["embed"].dtype == jnp.float32
    assert p16["decoder"]["embed"].dtype == jnp.bfloat16


def test_no_cache_mode(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    cfg, params = load_asr_checkpoint(ckpt, dtype=jnp.float32, cache=False)
    assert "decoder" in params and "encoder" in params
    assert cfg.audio_token_id > 0


def test_thinker_layout_loads_identically(tmp_path):
    """Layout regression (VERDICT r1 item 2): the real Qwen3-ASR checkpoint
    family may nest weights under a 'thinker.' prefix with the config under
    'thinker_config' (the Qwen3-Omni convention, transformers
    Qwen3OmniMoeConfig.sub_configs). The converter must produce the SAME
    pytree as the flat layout."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from qwen3_asr_tpu.runtime.checkpoint import load_asr_checkpoint

    flat = str(tmp_path / "flat")
    nested = str(tmp_path / "nested")
    write_tiny_checkpoint(flat, seed=7)
    write_tiny_checkpoint(nested, seed=7, key_prefix="thinker.",
                          nested_config=True)

    cfg_a, params_a = load_asr_checkpoint(flat, dtype=jnp.float32,
                                          cache=False)
    cfg_b, params_b = load_asr_checkpoint(nested, dtype=jnp.float32,
                                          cache=False)
    assert cfg_a.decoder == cfg_b.decoder
    assert cfg_a.encoder == cfg_b.encoder
    assert cfg_a.eos_token_id == cfg_b.eos_token_id
    leaves_a = jax.tree.leaves(params_a)
    leaves_b = jax.tree.leaves(params_b)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_real_1p7b_shapes_convert(tmp_path):
    """Shape-fidelity probe: a safetensors dir with the REAL 1.7B
    dimensions (vocab 151936, hidden 2048, 28 layers / encoder d_model 1280,
    32 layers) but a sliced layer count, in thinker layout, converts
    without key errors. Guards _find_prefix and every key pattern against
    the production layout without needing 3.4 GB of weights."""
    import json as _json
    import numpy as np
    import jax.numpy as jnp
    from safetensors.numpy import save_file
    from qwen3_asr_tpu.runtime.checkpoint import load_asr_checkpoint

    d = tmp_path / "ckpt"
    d.mkdir()
    L_DEC, L_ENC = 2, 2  # sliced depth; all other dims real
    enc = dict(num_mel_bins=128, d_model=1280, encoder_layers=L_ENC,
               encoder_attention_heads=20, encoder_ffn_dim=5120,
               output_dim=2048, downsample_hidden_size=480,
               n_window=100, n_window_infer=400)
    dec = dict(vocab_size=151936, hidden_size=2048, intermediate_size=6144,
               num_hidden_layers=L_DEC, num_attention_heads=16,
               num_key_value_heads=8, head_dim=128,
               tie_word_embeddings=True)
    (d / "config.json").write_text(_json.dumps({
        "model_type": "qwen3_asr",
        "thinker_config": {"audio_config": enc, "text_config": dec,
                           "audio_token_id": 151646,
                           "eos_token_id": 151645,
                           "pad_token_id": 151643}}))

    def z(*shape):
        return np.zeros(shape, np.float16)

    sd = {}
    p = "thinker.audio_tower."
    ch = 480
    sd[p + "conv2d1.weight"] = z(ch, 1, 3, 3); sd[p + "conv2d1.bias"] = z(ch)
    sd[p + "conv2d2.weight"] = z(ch, ch, 3, 3); sd[p + "conv2d2.bias"] = z(ch)
    sd[p + "conv2d3.weight"] = z(ch, ch, 3, 3); sd[p + "conv2d3.bias"] = z(ch)
    sd[p + "conv_out.weight"] = z(1280, ch * 16)
    for i in range(L_ENC):
        lp = f"{p}layers.{i}."
        sd[lp + "self_attn_layer_norm.weight"] = z(1280)
        sd[lp + "self_attn_layer_norm.bias"] = z(1280)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[lp + f"self_attn.{nm}.weight"] = z(1280, 1280)
            sd[lp + f"self_attn.{nm}.bias"] = z(1280)
        sd[lp + "final_layer_norm.weight"] = z(1280)
        sd[lp + "final_layer_norm.bias"] = z(1280)
        sd[lp + "fc1.weight"] = z(5120, 1280); sd[lp + "fc1.bias"] = z(5120)
        sd[lp + "fc2.weight"] = z(1280, 5120); sd[lp + "fc2.bias"] = z(1280)
    sd[p + "ln_post.weight"] = z(1280); sd[p + "ln_post.bias"] = z(1280)
    sd[p + "proj1.weight"] = z(1280, 1280); sd[p + "proj1.bias"] = z(1280)
    sd[p + "proj2.weight"] = z(2048, 1280); sd[p + "proj2.bias"] = z(2048)

    p = "thinker.model."
    sd[p + "embed_tokens.weight"] = z(151936, 2048)
    for i in range(L_DEC):
        lp = f"{p}layers.{i}."
        sd[lp + "input_layernorm.weight"] = z(2048)
        sd[lp + "post_attention_layernorm.weight"] = z(2048)
        sd[lp + "self_attn.q_proj.weight"] = z(16 * 128, 2048)
        sd[lp + "self_attn.k_proj.weight"] = z(8 * 128, 2048)
        sd[lp + "self_attn.v_proj.weight"] = z(8 * 128, 2048)
        sd[lp + "self_attn.o_proj.weight"] = z(2048, 16 * 128)
        sd[lp + "self_attn.q_norm.weight"] = z(128)
        sd[lp + "self_attn.k_norm.weight"] = z(128)
        sd[lp + "mlp.gate_proj.weight"] = z(6144, 2048)
        sd[lp + "mlp.up_proj.weight"] = z(6144, 2048)
        sd[lp + "mlp.down_proj.weight"] = z(2048, 6144)
    sd[p + "norm.weight"] = z(2048)
    save_file(sd, str(d / "model.safetensors"))

    cfg, params = load_asr_checkpoint(str(d), dtype=jnp.bfloat16, cache=False)
    assert cfg.decoder.vocab_size == 151936
    assert params["decoder"]["embed"].shape == (151936, 2048)
    assert params["decoder"]["layers"]["wq"].shape == (L_DEC, 2048, 2048)
    assert params["encoder"]["layers"]["fc1_w"].shape == (L_ENC, 1280, 5120)
    assert params["encoder"]["conv_out_w"].shape == (480 * 16, 1280)


def test_save_checkpoint_roundtrip(tmp_path):
    """save_asr_checkpoint is a true inverse of load_asr_checkpoint: the
    train→serve loop (train on stacked pytrees, serve from the HF dir)."""
    import jax
    from qwen3_asr_tpu.runtime.checkpoint import save_asr_checkpoint

    src = tmp_path / "src"
    write_tiny_checkpoint(str(src), seed=3)
    cfg, params = load_asr_checkpoint(str(src), dtype=jnp.float32,
                                      cache=False)
    out = tmp_path / "saved"
    save_asr_checkpoint(str(out), cfg, params)
    cfg2, params2 = load_asr_checkpoint(str(out), dtype=jnp.float32,
                                        cache=False)

    assert cfg2.decoder.vocab_size == cfg.decoder.vocab_size
    assert cfg2.encoder.n_window == cfg.encoder.n_window
    assert cfg2.eos_token_id == cfg.eos_token_id
    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = dict(jax.tree_util.tree_flatten_with_path(params2)[0])
    assert len(flat1) == len(flat2)
    for path, leaf in flat1:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat2[path]),
                                      err_msg=str(path))


def test_corrupt_converted_cache_self_heals(tmp_path, monkeypatch):
    """A half-written cache dir (process killed mid-save) must not wedge
    the cache: the loader clears it, reconverts, and RE-CACHES so the
    next load is a cache hit again."""
    import os

    from qwen3_asr_tpu.runtime.checkpoint import _cache_dir_for

    monkeypatch.setenv("ASR_CONVERTED_CACHE", str(tmp_path / "cache"))
    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)

    cache_dir = _cache_dir_for(ckpt, jnp.float32)
    os.makedirs(cache_dir)  # exists but holds no valid orbax payload
    with open(os.path.join(cache_dir, "junk"), "w") as f:
        f.write("partial write")

    cfg, params = load_asr_checkpoint(ckpt, dtype=jnp.float32)
    assert "decoder" in params
    # healed: the corrupt dir was replaced by a restorable cache
    cfg2, params2 = load_asr_checkpoint(ckpt, dtype=jnp.float32)
    import jax
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ambiguous_submodule_prefix_rejected(tmp_path):
    """Omni-style combined checkpoints can hold TWO decoders matching the
    marker (thinker + talker): conversion must pick the thinker, never
    first-match; with no thinker it must refuse, not guess."""
    from qwen3_asr_tpu.runtime.checkpoint import _find_prefix

    keys = ["thinker.model.layers.0.mlp.gate_proj.weight",
            "talker.model.layers.0.mlp.gate_proj.weight"]
    sd = {k: np.zeros(1) for k in keys}
    assert _find_prefix(sd, "layers.0.mlp.gate_proj") == "thinker.model."

    sd2 = {k: np.zeros(1) for k in
           ["a.model.layers.0.mlp.gate_proj.weight",
            "b.model.layers.0.mlp.gate_proj.weight"]}
    with pytest.raises(KeyError, match="multiple submodules"):
        _find_prefix(sd2, "layers.0.mlp.gate_proj")


def test_save_checkpoint_rejects_quantized(tmp_path):
    from qwen3_asr_tpu.ops.quant import quantize_params
    from qwen3_asr_tpu.runtime.checkpoint import save_asr_checkpoint

    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    cfg, params = load_asr_checkpoint(ckpt, dtype=jnp.float32, cache=False)
    qparams = quantize_params(params, "int8")
    with pytest.raises(ValueError, match="save before quantizing"):
        save_asr_checkpoint(str(tmp_path / "out"), cfg, qparams)
