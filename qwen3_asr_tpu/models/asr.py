"""Qwen3-ASR model assembly: encoder + prompt + decoder.

Replaces the reference's external ``qwen_asr`` SDK surface
(``Qwen3ASRModel.transcribe((audio, sr), language, return_time_stamps)``,
reference src/server.py:866-869) with an in-framework implementation.

Prompt protocol (Qwen chat convention, configurable per checkpoint):

    <|im_start|>system\n{context}<|im_end|>\n
    <|im_start|>user\n{lang_line}<|audio_bos|><|AUDIO|>×N<|audio_eos|><|im_end|>\n
    <|im_start|>assistant\n      → greedy decode until <|im_end|>

The ``<|AUDIO|>`` placeholder positions receive the audio encoder's output
embeddings (spliced by concatenation — the prompt is built programmatically
so the audio span is static per length bucket; no gather needed).

Audio is zero-padded (silence) to the bucket length and the encoder treats
the full bucket as valid — the Whisper strategy — so every tensor shape is
static per bucket and the streaming path always hits a warm executable.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..text.tokenizer import BpeTokenizer
from .config import AsrConfig
from .decoder import embed_tokens
from .encoder import encoder_forward, encoder_output_length

LANGUAGE_NAMES = {
    "en": "English", "zh": "Chinese", "ja": "Japanese", "ko": "Korean",
    "yue": "Cantonese", "hi": "Hindi", "th": "Thai", "de": "German",
    "fr": "French", "es": "Spanish", "it": "Italian", "pt": "Portuguese",
    "ru": "Russian", "ar": "Arabic", "id": "Indonesian", "vi": "Vietnamese",
    "tr": "Turkish", "nl": "Dutch", "ms": "Malay", "ur": "Urdu",
}
_NAME_TO_CODE = {v.lower(): k for k, v in LANGUAGE_NAMES.items()}


def normalize_language(lang: Optional[str]) -> Tuple[Optional[str], Optional[str]]:
    """Accept 'en' or 'English' (reference WS default lang is 'English',
    src/server.py:1082). Returns (code, display_name) or (None, None)."""
    if not lang or lang.lower() == "auto":
        return None, None
    low = lang.lower()
    if low in LANGUAGE_NAMES:
        return low, LANGUAGE_NAMES[low]
    if low in _NAME_TO_CODE:
        return _NAME_TO_CODE[low], LANGUAGE_NAMES[_NAME_TO_CODE[low]]
    return low, lang


@dataclasses.dataclass
class PromptTemplate:
    system: str = "You are a speech recognition model."
    im_start: str = "<|im_start|>"
    im_end: str = "<|im_end|>"
    audio_token: str = "<|AUDIO|>"
    audio_bos: str = "<|audio_bos|>"
    audio_eos: str = "<|audio_eos|>"

    def prefix_text(self, language_name: Optional[str], context: str = "") -> str:
        sys_block = f"{self.im_start}system\n{context or self.system}{self.im_end}\n"
        lang_line = f"Language: {language_name}\n" if language_name else ""
        return (f"{sys_block}{self.im_start}user\n{lang_line}{self.audio_bos}")

    def suffix_text(self) -> str:
        return (f"{self.audio_eos}{self.im_end}\n{self.im_start}assistant\n")


class AsrModel:
    """Bundles config, weights, tokenizer, and prompt template."""

    def __init__(self, cfg: AsrConfig, params: dict, tokenizer: BpeTokenizer,
                 template: Optional[PromptTemplate] = None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.template = template or PromptTemplate()
        t = self.template
        self.eos_id = tokenizer.special_tokens.get(t.im_end, cfg.eos_token_id)
        self.pad_id = cfg.pad_token_id

    # -- prompt construction ---------------------------------------------------
    def prompt_ids(self, n_audio_tokens: int, language: Optional[str],
                   context: str = "") -> Tuple[List[int], List[int], int]:
        """Returns (prefix_ids, suffix_ids, audio_span) for a bucket."""
        _, lang_name = normalize_language(language)
        prefix = self.tokenizer.encode(
            self.template.prefix_text(lang_name, context))
        suffix = self.tokenizer.encode(self.template.suffix_text())
        return prefix, suffix, n_audio_tokens

    def build_inputs_embeds(self, prefix_ids: List[int], suffix_ids: List[int],
                            audio_embeds: jax.Array) -> jax.Array:
        """audio_embeds: [B, n_audio, H] → [B, T_prompt, H]."""
        b = audio_embeds.shape[0]
        dec = self.cfg.decoder
        pre = embed_tokens(self.params["decoder"], dec,
                           jnp.asarray(prefix_ids)[None, :])
        suf = embed_tokens(self.params["decoder"], dec,
                           jnp.asarray(suffix_ids)[None, :])
        pre = jnp.broadcast_to(pre, (b, pre.shape[1], pre.shape[2]))
        suf = jnp.broadcast_to(suf, (b, suf.shape[1], suf.shape[2]))
        return jnp.concatenate(
            [pre, audio_embeds.astype(pre.dtype), suf], axis=1)

    # -- encoder ----------------------------------------------------------------
    def encode_audio(self, mel: jax.Array, feature_lens: jax.Array):
        return encoder_forward(self.params["encoder"], self.cfg.encoder,
                               mel, feature_lens)

    def audio_token_count(self, mel_frames: int) -> int:
        return int(encoder_output_length(mel_frames,
                                         self.cfg.encoder.n_window * 2))
