"""Analytic roofline model for the fused transcription executable.

Why not XLA's own counter: ``compiled.cost_analysis()`` on the TPU
backend under-reports this program by ~10x (bench r4 captured 13.5
TFLOP for a dispatch whose encoder prefill ALONE is ~30 TFLOP by the
2*m*n*k arithmetic below; the CPU backend counts the same HLO
correctly). The fused program is one giant scan/while nest after
fusion, and the TPU pass pipeline rewrites convs/dots into forms the
generic HloCostAnalysis visitor does not attribute. So the scoreboard
derives its MFU/HBM position from first-principles math over the model
config — the same arithmetic the scaling literature uses — and keeps
the XLA count only as a cross-check field.

FLOP accounting (per fused dispatch at batch B):
  encoder   conv frontend (3 stride-2 conv2d) + conv_out/proj matmuls +
            per-layer QKVO/FFN matmuls at S_tok tokens + block attention
            (n_window_infer-frame blocks)
  prefill   decoder matmuls at P prompt tokens + full P^2 attention
            (dense — masked positions are computed, so they count as
            executed work) + one lm_head matmul row
  decode    (max_new - 1) steps: decoder matmuls + lm_head at 1 token +
            attention against a growing cache (midpoint-summed exactly)

Modeled-but-small terms we skip: mel FFT (~1e9 flops/clip), norms,
rotary/elementwise, embedding gathers. They are <2% of the total at
production shapes.

HBM byte accounting is a TRAFFIC MODEL, not a measurement: weights are
re-read from HBM once per dispatch phase that uses them (encoder once,
decoder once for prefill and once per decode step — they cannot stay
resident in VMEM at these sizes), the KV cache is written once per
token and read back once per decode step per past position, and the
int16 audio crosses once. Fused intra-op activations are free. That is
the speed-of-light floor for this algorithm; hbm_util says how close
the measured wall time gets to it.
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np


def _dtype_bytes(dt) -> float:
    if "int4" in str(dt):
        return 0.5                    # packed sub-byte (ops/quant.py nibbles)
    return float(np.dtype(dt).itemsize)  # ml_dtypes covers bf16/fp8


def _tree_bytes(tree) -> int:
    total = 0
    for x in jax.tree.leaves(tree):
        total += int(np.prod(x.shape) * _dtype_bytes(x.dtype))
    return total


@dataclasses.dataclass
class RooflineCost:
    flops: float            # executed flops per fused dispatch
    hbm_bytes: float        # modeled HBM traffic per dispatch (floor)
    detail: dict

    def as_dict(self) -> dict:
        return {"tflops": round(self.flops / 1e12, 2),
                "hbm_gb": round(self.hbm_bytes / 1e9, 2),
                **{k: round(v / 1e12, 2) if k.endswith("_flops")
                   else round(v / 1e9, 2) for k, v in self.detail.items()}}


def analytic_cost(engine, batch: int, bucket_frames: int,
                  bucket_s: float) -> RooflineCost:
    """First-principles flops + HBM-traffic model of one fused dispatch
    (frontend -> encoder -> prefill -> full decode loop) at this shape."""
    from .engine import HOP_LENGTH, PREFIX_BUDGET, max_new_tokens_for
    from ..models.encoder import conv_tokens_per_chunk, encoder_output_length

    cfg = engine.model.cfg
    enc, dec = cfg.encoder, cfg.decoder
    B = batch
    max_new = max_new_tokens_for(bucket_s)
    steps = max_new - 1                      # decode-loop trips

    # --- shapes -----------------------------------------------------------
    chunk = enc.n_window * 2
    s_tok = int(encoder_output_length(bucket_frames, chunk))
    block_tok = conv_tokens_per_chunk(min(enc.n_window_infer, bucket_frames))
    n_samples = bucket_frames * HOP_LENGTH
    # Prompt length exactly as the fused program builds it (prefix budget +
    # audio tokens + suffix), via abstract eval — no compile.
    build = engine._prompt_builder(bucket_frames)
    P = int(jax.eval_shape(
        build, engine.model.params,
        jax.ShapeDtypeStruct((B, n_samples), np.int16),
        jax.ShapeDtypeStruct((B, PREFIX_BUDGET), np.int32)).shape[1])

    # --- encoder flops ----------------------------------------------------
    d, ffn, L_e = enc.d_model, enc.encoder_ffn_dim, enc.encoder_layers
    ch, mel = enc.downsample_hidden_size, enc.num_mel_bins
    conv = 0.0
    t, f, cin = bucket_frames, mel, 1
    for _ in range(3):
        t, f = (t + 1) // 2, (f + 1) // 2
        conv += 2.0 * 9 * cin * ch * t * f * B
        cin = ch
    enc_mm = (enc.conv_out_dim * d + L_e * (4 * d * d + 2 * d * ffn)
              + d * d + d * enc.output_dim)
    enc_attn = 4.0 * L_e * s_tok * block_tok * d * B
    enc_flops = conv + 2.0 * enc_mm * s_tok * B + enc_attn

    # --- decoder flops ----------------------------------------------------
    h, i, L_d = dec.hidden_size, dec.intermediate_size, dec.num_hidden_layers
    nh, nkv, hd = (dec.num_attention_heads, dec.num_key_value_heads,
                   dec.head_dim)
    layer_mm = 2 * h * nh * hd + 2 * h * nkv * hd + 3 * h * i
    lm_mm = h * dec.vocab_size
    prefill_flops = (2.0 * L_d * layer_mm * P * B
                     + 4.0 * L_d * P * P * nh * hd * B
                     + 2.0 * lm_mm * B)
    # decode attention: static shapes mean every step attends the FULL
    # padded cache (round-to-128 of P + max_new) with masking — that is
    # the executed work; the sum-of-growing-window is only the USEFUL part.
    total_kv = -(-(P + max_new) // 128) * 128
    attn_positions = float(steps * total_kv)
    decode_flops = (steps * 2.0 * (L_d * layer_mm + lm_mm) * B
                    + 4.0 * L_d * attn_positions * nh * hd * B)

    # --- HBM traffic model -------------------------------------------------
    enc_bytes = _tree_bytes(engine.model.params["encoder"])
    dec_bytes = _tree_bytes(engine.model.params["decoder"])
    kv_row = 2 * L_d * nkv * hd * _dtype_bytes(engine.cache_dtype)
    kv_write = (P + steps) * B * kv_row
    kv_read = attn_positions * B * kv_row
    hbm = (enc_bytes + dec_bytes * (1 + steps)
           + kv_write + kv_read + B * n_samples * 2)

    return RooflineCost(
        flops=enc_flops + prefill_flops + decode_flops,
        hbm_bytes=hbm,
        detail={
            "encoder_flops": enc_flops, "prefill_flops": prefill_flops,
            "decode_flops": decode_flops,
            "weights_gb_per_dispatch": enc_bytes + dec_bytes * (1 + steps),
            "kv_gb_per_dispatch": kv_write + kv_read,
        })
