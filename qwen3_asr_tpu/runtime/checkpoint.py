"""Checkpoint subsystem: HF safetensors → stacked JAX pytrees, with cache.

This is the TPU build's equivalent of the reference's "checkpointing"
(HF weight cache volume + from_pretrained, reference src/server.py:320,
compose.yaml models volume; SURVEY.md §5): weights are converted once from
HuggingFace layout (per-layer torch ``[out, in]`` Linears) into this
framework's stacked-scan layout ([L, in, out]) and memoized on disk as a
single orbax/npz artifact so subsequent loads are a straight mmap.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..models.config import AsrConfig, AudioEncoderConfig, DecoderConfig
from ..utils.logging import log

Array = np.ndarray


def _find_prefix(sd: Dict[str, Array], marker: str) -> str:
    """Locate the key prefix for a submodule (e.g. 'model.', 'thinker.model.').

    Combined checkpoints can hold SEVERAL submodules matching the marker
    (Qwen3-Omni ships a talker decoder with its own layers.*.mlp.gate_proj
    next to the thinker's): first-match would silently convert whichever
    tower a shard happened to list first. Collect every candidate and
    prefer the thinker (the ASR text tower); anything else ambiguous is an
    error, not a guess."""
    prefixes = {key[:idx] for key in sd
                if (idx := key.find(marker)) >= 0}
    if not prefixes:
        raise KeyError(f"no parameter key contains {marker!r}; keys like: "
                       f"{list(sd)[:5]}")
    if len(prefixes) == 1:
        return next(iter(prefixes))
    thinker = [p for p in prefixes if "thinker" in p]
    if len(thinker) == 1:
        return thinker[0]
    raise KeyError(f"marker {marker!r} matches multiple submodules "
                   f"{sorted(prefixes)}; pass prefix= explicitly")


def _stack(sd: Dict[str, Array], pattern: str, n: int,
           transpose: bool = False) -> np.ndarray:
    arrs = []
    for i in range(n):
        a = sd[pattern.format(i=i)]
        arrs.append(a.T if transpose else a)
    return np.stack(arrs)


def convert_decoder_state_dict(sd: Dict[str, Array], cfg: DecoderConfig,
                               dtype=jnp.float32, prefix: Optional[str] = None
                               ) -> dict:
    """HF Qwen3ForCausalLM state_dict (numpy) → stacked decoder pytree."""
    if prefix is None:
        # mlp.gate_proj exists only in the decoder (the audio encoder uses
        # fc1/fc2), so it is an unambiguous marker in combined checkpoints.
        prefix = _find_prefix(sd, "layers.0.mlp.gate_proj")
    p = prefix
    lyr = p + "layers.{i}.{name}.weight"
    n = cfg.num_hidden_layers

    def stk(name, transpose=True):
        return _stack(sd, lyr.replace("{name}", name), n, transpose=transpose)

    params = {
        "embed": jnp.asarray(sd[p + "embed_tokens.weight"], dtype),
        "layers": {
            "ln1": jnp.asarray(stk("input_layernorm", transpose=False), dtype),
            "ln2": jnp.asarray(stk("post_attention_layernorm", transpose=False), dtype),
            "wq": jnp.asarray(stk("self_attn.q_proj"), dtype),
            "wk": jnp.asarray(stk("self_attn.k_proj"), dtype),
            "wv": jnp.asarray(stk("self_attn.v_proj"), dtype),
            "wo": jnp.asarray(stk("self_attn.o_proj"), dtype),
            "q_norm": jnp.asarray(stk("self_attn.q_norm", transpose=False), dtype),
            "k_norm": jnp.asarray(stk("self_attn.k_norm", transpose=False), dtype),
            "w_gate": jnp.asarray(stk("mlp.gate_proj"), dtype),
            "w_up": jnp.asarray(stk("mlp.up_proj"), dtype),
            "w_down": jnp.asarray(stk("mlp.down_proj"), dtype),
        },
        "final_norm": jnp.asarray(sd[p + "norm.weight"], dtype),
    }
    lm_head_key = None
    for cand in ("lm_head.weight", p.split("model.")[0] + "lm_head.weight"):
        if cand in sd:
            lm_head_key = cand
            break
    if not cfg.tie_word_embeddings:
        if lm_head_key is None:
            raise KeyError("untied config but no lm_head.weight in checkpoint")
        params["lm_head"] = jnp.asarray(sd[lm_head_key].T, dtype)
    return params


def convert_encoder_state_dict(sd: Dict[str, Array], cfg: AudioEncoderConfig,
                               dtype=jnp.float32, prefix: Optional[str] = None
                               ) -> dict:
    """HF Qwen3-Omni-style AuT audio encoder state_dict → stacked pytree.

    HF layout (transformers qwen3_omni_moe modeling, audio tower):
    conv2d{1,2,3}.{weight,bias}, conv_out.weight, layers.{i}.self_attn.{q,k,v,out}_proj
    (with bias), self_attn_layer_norm, fc1/fc2, final_layer_norm, ln_post,
    proj1, proj2.
    """
    if prefix is None:
        prefix = _find_prefix(sd, "conv2d1.weight")
    p = prefix
    n = cfg.encoder_layers
    lyr = p + "layers.{i}.{name}.{kind}"

    def stk(name, kind="weight", transpose=True):
        pat = lyr.replace("{name}", name).replace("{kind}", kind)
        return _stack(sd, pat, n, transpose=transpose and kind == "weight")

    params = {
        # conv weights kept in torch OIHW; the encoder transposes as needed.
        "conv1_w": jnp.asarray(sd[p + "conv2d1.weight"], dtype),
        "conv1_b": jnp.asarray(sd[p + "conv2d1.bias"], dtype),
        "conv2_w": jnp.asarray(sd[p + "conv2d2.weight"], dtype),
        "conv2_b": jnp.asarray(sd[p + "conv2d2.bias"], dtype),
        "conv3_w": jnp.asarray(sd[p + "conv2d3.weight"], dtype),
        "conv3_b": jnp.asarray(sd[p + "conv2d3.bias"], dtype),
        "conv_out_w": jnp.asarray(sd[p + "conv_out.weight"].T, dtype),
        "layers": {
            "ln1_w": jnp.asarray(stk("self_attn_layer_norm"), dtype),
            "ln1_b": jnp.asarray(stk("self_attn_layer_norm", "bias"), dtype),
            "wq": jnp.asarray(stk("self_attn.q_proj"), dtype),
            "bq": jnp.asarray(stk("self_attn.q_proj", "bias"), dtype),
            "wk": jnp.asarray(stk("self_attn.k_proj"), dtype),
            "bk": jnp.asarray(stk("self_attn.k_proj", "bias"), dtype),
            "wv": jnp.asarray(stk("self_attn.v_proj"), dtype),
            "bv": jnp.asarray(stk("self_attn.v_proj", "bias"), dtype),
            "wo": jnp.asarray(stk("self_attn.out_proj"), dtype),
            "bo": jnp.asarray(stk("self_attn.out_proj", "bias"), dtype),
            "ln2_w": jnp.asarray(stk("final_layer_norm"), dtype),
            "ln2_b": jnp.asarray(stk("final_layer_norm", "bias"), dtype),
            "fc1_w": jnp.asarray(stk("fc1"), dtype),
            "fc1_b": jnp.asarray(stk("fc1", "bias"), dtype),
            "fc2_w": jnp.asarray(stk("fc2"), dtype),
            "fc2_b": jnp.asarray(stk("fc2", "bias"), dtype),
        },
        "ln_post_w": jnp.asarray(sd[p + "ln_post.weight"], dtype),
        "ln_post_b": jnp.asarray(sd[p + "ln_post.bias"], dtype),
        "proj1_w": jnp.asarray(sd[p + "proj1.weight"].T, dtype),
        "proj1_b": jnp.asarray(sd[p + "proj1.bias"], dtype),
        "proj2_w": jnp.asarray(sd[p + "proj2.weight"].T, dtype),
        "proj2_b": jnp.asarray(sd[p + "proj2.bias"], dtype),
    }
    return params


def config_to_dict(cfg: AsrConfig) -> dict:
    """AsrConfig → HF-style config.json dict (AsrConfig.from_dict inverse)."""
    import dataclasses
    return {
        "model_type": "qwen3_asr",
        "audio_config": dataclasses.asdict(cfg.encoder),
        "text_config": dataclasses.asdict(cfg.decoder),
        "audio_token_id": cfg.audio_token_id,
        "bos_token_id": cfg.bos_token_id,
        "eos_token_id": cfg.eos_token_id,
        "pad_token_id": cfg.pad_token_id,
    }


def save_asr_checkpoint(path: str, cfg: AsrConfig, params: dict) -> str:
    """Inverse of :func:`load_asr_checkpoint`: write the stacked-layer
    pytree back out as an HF-layout checkpoint directory (config.json +
    model.safetensors with per-layer torch-convention tensors).

    This closes the train→serve loop: ``runtime/train.py`` produces updated
    stacked params, this writes them as a directory that ``MODEL_ID`` can
    point at. Quantized pytrees are not supported (save before quantizing).
    """
    import jax

    def _quantized(tree) -> bool:
        if isinstance(tree, dict):
            if "q" in tree and "s" in tree:   # ops/quant.py leaf layout
                return True
            return any(_quantized(v) for v in tree.values())
        return False

    if _quantized(params):
        raise ValueError("params contain quantized {'q','s'} leaves "
                         "(ops/quant.py) — save before quantizing")

    os.makedirs(path, exist_ok=True)
    host = jax.tree.map(
        lambda x: np.asarray(jax.device_get(x), dtype=np.float32), params)
    dec, enc = host["decoder"], host["encoder"]
    sd: Dict[str, np.ndarray] = {}

    p = "model."
    sd[p + "embed_tokens.weight"] = dec["embed"]
    sd[p + "norm.weight"] = dec["final_norm"]
    if "lm_head" in dec:
        sd["lm_head.weight"] = dec["lm_head"].T
    lyr = dec["layers"]
    unstack = [  # (pytree leaf, HF name, transpose back to [out, in])
        ("ln1", "input_layernorm.weight", False),
        ("ln2", "post_attention_layernorm.weight", False),
        ("wq", "self_attn.q_proj.weight", True),
        ("wk", "self_attn.k_proj.weight", True),
        ("wv", "self_attn.v_proj.weight", True),
        ("wo", "self_attn.o_proj.weight", True),
        ("q_norm", "self_attn.q_norm.weight", False),
        ("k_norm", "self_attn.k_norm.weight", False),
        ("w_gate", "mlp.gate_proj.weight", True),
        ("w_up", "mlp.up_proj.weight", True),
        ("w_down", "mlp.down_proj.weight", True),
    ]
    for i in range(cfg.decoder.num_hidden_layers):
        for leaf, name, t in unstack:
            a = lyr[leaf][i]
            sd[f"{p}layers.{i}.{name}"] = a.T if t else a

    p = "audio_tower."
    for n in (1, 2, 3):
        sd[p + f"conv2d{n}.weight"] = enc[f"conv{n}_w"]
        sd[p + f"conv2d{n}.bias"] = enc[f"conv{n}_b"]
    sd[p + "conv_out.weight"] = enc["conv_out_w"].T
    sd[p + "ln_post.weight"] = enc["ln_post_w"]
    sd[p + "ln_post.bias"] = enc["ln_post_b"]
    sd[p + "proj1.weight"] = enc["proj1_w"].T
    sd[p + "proj1.bias"] = enc["proj1_b"]
    sd[p + "proj2.weight"] = enc["proj2_w"].T
    sd[p + "proj2.bias"] = enc["proj2_b"]
    lyr = enc["layers"]
    enc_unstack = [
        ("ln1_w", "self_attn_layer_norm.weight", False),
        ("ln1_b", "self_attn_layer_norm.bias", False),
        ("wq", "self_attn.q_proj.weight", True),
        ("bq", "self_attn.q_proj.bias", False),
        ("wk", "self_attn.k_proj.weight", True),
        ("bk", "self_attn.k_proj.bias", False),
        ("wv", "self_attn.v_proj.weight", True),
        ("bv", "self_attn.v_proj.bias", False),
        ("wo", "self_attn.out_proj.weight", True),
        ("bo", "self_attn.out_proj.bias", False),
        ("ln2_w", "final_layer_norm.weight", False),
        ("ln2_b", "final_layer_norm.bias", False),
        ("fc1_w", "fc1.weight", True),
        ("fc1_b", "fc1.bias", False),
        ("fc2_w", "fc2.weight", True),
        ("fc2_b", "fc2.bias", False),
    ]
    for i in range(cfg.encoder.encoder_layers):
        for leaf, name, t in enc_unstack:
            a = lyr[leaf][i]
            sd[p + f"layers.{i}.{name}"] = a.T if t else a

    from safetensors.numpy import save_file
    # safetensors serializes the raw buffer: a transposed VIEW would write
    # the base layout under the transposed shape — force contiguity.
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    save_file(sd, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config_to_dict(cfg), f, indent=1)
    log.info("Checkpoint saved to {} ({} tensors)", path, len(sd))
    return path


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Read all *.safetensors shards in a checkpoint directory into numpy."""
    from safetensors.numpy import load_file
    sd: Dict[str, np.ndarray] = {}
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    for f in files:
        sd.update(load_file(os.path.join(path, f)))
    return sd


def _cache_dir_for(path: str, dtype) -> str:
    """Cache key: checkpoint dir content signature + target dtype."""
    import hashlib
    sig = hashlib.sha256()
    for f in sorted(os.listdir(path)):
        if f.endswith((".safetensors", ".json")):
            st = os.stat(os.path.join(path, f))
            sig.update(f"{f}:{st.st_size}:{int(st.st_mtime)}".encode())
    sig.update(str(jnp.dtype(dtype)).encode())
    root = os.environ.get("ASR_CONVERTED_CACHE",
                          os.path.expanduser("~/.cache/qwen3_asr_tpu/converted"))
    return os.path.join(root, sig.hexdigest()[:24])


def load_asr_checkpoint(path: str, dtype=jnp.bfloat16, cache: bool = True):
    """Load a local HF-format Qwen3-ASR checkpoint directory.

    Returns (AsrConfig, {"encoder": ..., "decoder": ...}).

    The converted stacked-layer pytree is memoized on disk (orbax) so
    subsequent loads skip the per-tensor transpose/stack work — the
    "checkpoint subsystem" of this framework (SURVEY.md §5: the reference's
    equivalent is its HF weight-cache volume).
    """
    cfg_path = os.path.join(path, "config.json")
    with open(cfg_path) as f:
        cfg = AsrConfig.from_dict(json.load(f))

    cache_path = _cache_dir_for(path, dtype) if cache else None
    if cache_path and os.path.isdir(cache_path):
        try:
            import orbax.checkpoint as ocp
            with ocp.PyTreeCheckpointer() as ckptr:
                params = ckptr.restore(cache_path)
            log.info("Checkpoint restored from converted cache {}", cache_path)
            return cfg, params
        except Exception as e:
            # A half-written dir (process killed mid-save) would otherwise
            # wedge the cache permanently: restore fails every load and the
            # re-save below refuses the existing path. Clear it.
            log.warning("converted-cache restore failed ({}); reconverting", e)
            import shutil
            shutil.rmtree(cache_path, ignore_errors=True)

    sd = load_safetensors_dir(path)
    dec = convert_decoder_state_dict(sd, cfg.decoder, dtype)
    enc = convert_encoder_state_dict(sd, cfg.encoder, dtype)
    params = {"encoder": enc, "decoder": dec}
    log.info("Checkpoint loaded from {} ({} tensors)", path, len(sd))

    if cache_path:
        try:
            import orbax.checkpoint as ocp
            os.makedirs(os.path.dirname(cache_path), exist_ok=True)
            # Write-then-rename: a kill mid-save must never leave a
            # half-written dir AT the cache path (see restore handler).
            tmp_path = f"{cache_path}.tmp-{os.getpid()}"
            with ocp.PyTreeCheckpointer() as ckptr:
                ckptr.save(tmp_path, params)
            try:
                os.rename(tmp_path, cache_path)
            except OSError:  # concurrent loader won the race — keep theirs
                import shutil
                shutil.rmtree(tmp_path, ignore_errors=True)
            log.info("Converted checkpoint cached at {}", cache_path)
        except Exception as e:
            log.warning("converted-cache save failed: {}", e)
    return cfg, params
