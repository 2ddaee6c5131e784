"""Tiny HF-format ASR checkpoint generator for tests.

Writes a complete checkpoint directory (config.json, model.safetensors in
HuggingFace naming, tokenizer.json) that loads through the PRODUCTION path
(runtime/checkpoint.load_asr_checkpoint) — the CPU-backend fake-model
strategy the reference uses for serverless E2E coverage (SURVEY.md §4.3).
"""
import json
import os

import numpy as np

SPECIALS = ["<|endoftext|>", "<|im_start|>", "<|im_end|>",
            "<|AUDIO|>", "<|audio_bos|>", "<|audio_eos|>"]

_CORPUS = [
    "hello world this is a test of speech recognition",
    "the quick brown fox jumps over the lazy dog",
    "transcription of audio on tensor processing units",
    "language english chinese japanese thai hindi cantonese",
    "you are a speech recognition model",
    "Language: English Chinese 0123456789 .,!? '",
] * 40


def build_tokenizer_json(path: str, vocab_size: int = 480) -> None:
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, special_tokens=SPECIALS,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(_CORPUS, trainer)
    # Non-special added tokens (special: false), like Qwen3's <think> /
    # <tool_call>: atomic on encode but NOT skipped by decode.
    tok.add_tokens(["<think>", "</think>"])
    tok.save(path)


def write_tiny_checkpoint(dirpath: str, seed: int = 0,
                          key_prefix: str = "",
                          nested_config: bool = False,
                          chat_template: str = None) -> str:
    """Create a tiny random Qwen3-ASR-format checkpoint. Returns dirpath.

    key_prefix/nested_config reproduce the Qwen3-Omni "thinker" layout
    (keys like thinker.model.layers.0..., config nested under
    thinker_config) for converter layout-regression tests; chat_template
    writes a tokenizer_config.json carrying the template (the
    checkpoint-driven prompt path)."""
    os.makedirs(dirpath, exist_ok=True)
    tok_path = os.path.join(dirpath, "tokenizer.json")
    build_tokenizer_json(tok_path)

    with open(tok_path) as f:
        tok_blob = json.load(f)
    specials = {t["content"]: t["id"] for t in tok_blob["added_tokens"]}
    vocab_size = 512  # ≥ trained vocab, padded like real checkpoints

    enc = dict(num_mel_bins=32, d_model=32, encoder_layers=2,
               encoder_attention_heads=4, encoder_ffn_dim=64,
               output_dim=48, downsample_hidden_size=16,
               n_window=50, n_window_infer=200, conv_chunksize=500,
               max_source_positions=1500)
    dec = dict(vocab_size=vocab_size, hidden_size=48, intermediate_size=96,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, head_dim=12, rms_norm_eps=1e-6,
               rope_theta=1000000.0, tie_word_embeddings=True)

    inner = {
        "audio_config": enc,
        "text_config": dec,
        "audio_token_id": specials["<|AUDIO|>"],
        "bos_token_id": specials["<|endoftext|>"],
        "eos_token_id": specials["<|im_end|>"],
        "pad_token_id": specials["<|endoftext|>"],
    }
    if nested_config:
        config = {"model_type": "qwen3_asr", "thinker_config": inner}
    else:
        config = {"model_type": "qwen3_asr", **inner}
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump(config, f, indent=1)
    if chat_template is not None:
        with open(os.path.join(dirpath, "tokenizer_config.json"), "w") as f:
            json.dump({"chat_template": chat_template,
                       "audio_token": "<|AUDIO|>",
                       "audio_bos_token": "<|audio_bos|>",
                       "audio_eos_token": "<|audio_eos|>"}, f, indent=1)

    rng = np.random.default_rng(seed)

    def r(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    sd = {}
    kp = key_prefix
    # --- audio encoder (HF qwen3-omni audio tower naming) ---
    ch, d, ffn = enc["downsample_hidden_size"], enc["d_model"], enc["encoder_ffn_dim"]
    p = kp + "audio_tower."
    sd[p + "conv2d1.weight"] = r(ch, 1, 3, 3)
    sd[p + "conv2d1.bias"] = r(ch)
    sd[p + "conv2d2.weight"] = r(ch, ch, 3, 3)
    sd[p + "conv2d2.bias"] = r(ch)
    sd[p + "conv2d3.weight"] = r(ch, ch, 3, 3)
    sd[p + "conv2d3.bias"] = r(ch)
    f_out = ((enc["num_mel_bins"] + 1) // 2 + 1) // 2
    f_out = (f_out + 1) // 2
    sd[p + "conv_out.weight"] = r(d, ch * f_out)
    for i in range(enc["encoder_layers"]):
        lp = f"{p}layers.{i}."
        sd[lp + "self_attn_layer_norm.weight"] = np.ones(d, np.float32)
        sd[lp + "self_attn_layer_norm.bias"] = np.zeros(d, np.float32)
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[lp + f"self_attn.{name}.weight"] = r(d, d)
            sd[lp + f"self_attn.{name}.bias"] = r(d)
        sd[lp + "final_layer_norm.weight"] = np.ones(d, np.float32)
        sd[lp + "final_layer_norm.bias"] = np.zeros(d, np.float32)
        sd[lp + "fc1.weight"] = r(ffn, d)
        sd[lp + "fc1.bias"] = r(ffn)
        sd[lp + "fc2.weight"] = r(d, ffn)
        sd[lp + "fc2.bias"] = r(d)
    sd[p + "ln_post.weight"] = np.ones(d, np.float32)
    sd[p + "ln_post.bias"] = np.zeros(d, np.float32)
    sd[p + "proj1.weight"] = r(d, d)
    sd[p + "proj1.bias"] = r(d)
    sd[p + "proj2.weight"] = r(enc["output_dim"], d)
    sd[p + "proj2.bias"] = r(enc["output_dim"])

    # --- decoder (HF qwen3 naming) ---
    h, inter = dec["hidden_size"], dec["intermediate_size"]
    nq, nkv, hd = dec["num_attention_heads"], dec["num_key_value_heads"], dec["head_dim"]
    p = kp + "model."
    sd[p + "embed_tokens.weight"] = r(vocab_size, h)
    # Bias the tied lm_head toward word-like tokens: an unbiased random
    # model collapses greedy decode onto one whitespace token (strips to
    # ""), making every text assertion downstream vacuous. Boosting a
    # couple dozen alphabetic token rows makes argmax land on printable,
    # input-dependent tokens while staying a pure random test model.
    word_ids = sorted(
        tid for t, tid in tok_blob["model"]["vocab"].items()
        if len(t) >= 3 and t.lstrip("Ġ").isalpha() and tid < vocab_size
    )[:24]
    sd[p + "embed_tokens.weight"][word_ids] *= 4.0
    for i in range(dec["num_hidden_layers"]):
        lp = f"{p}layers.{i}."
        sd[lp + "input_layernorm.weight"] = np.ones(h, np.float32)
        sd[lp + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
        sd[lp + "self_attn.q_proj.weight"] = r(nq * hd, h)
        sd[lp + "self_attn.k_proj.weight"] = r(nkv * hd, h)
        sd[lp + "self_attn.v_proj.weight"] = r(nkv * hd, h)
        sd[lp + "self_attn.o_proj.weight"] = r(h, nq * hd)
        sd[lp + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
        sd[lp + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
        sd[lp + "mlp.gate_proj.weight"] = r(inter, h)
        sd[lp + "mlp.up_proj.weight"] = r(inter, h)
        sd[lp + "mlp.down_proj.weight"] = r(h, inter)
    sd[p + "norm.weight"] = np.ones(h, np.float32)

    from safetensors.numpy import save_file
    save_file(sd, os.path.join(dirpath, "model.safetensors"))
    return dirpath


def load_tiny_model(dirpath: str):
    """Load the tiny checkpoint through the production path."""
    import jax.numpy as jnp
    from qwen3_asr_tpu.models.asr import AsrModel
    from qwen3_asr_tpu.runtime.checkpoint import load_asr_checkpoint
    from qwen3_asr_tpu.text.tokenizer import BpeTokenizer
    from qwen3_asr_tpu.models.asr import PromptTemplate
    cfg, params = load_asr_checkpoint(dirpath, dtype=jnp.float32)
    tok = BpeTokenizer.from_file(os.path.join(dirpath, "tokenizer.json"))
    return AsrModel(cfg, params, tok,
                    template=PromptTemplate.from_checkpoint(dirpath))
