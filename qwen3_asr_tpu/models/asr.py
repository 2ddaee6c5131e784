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
    """ASR prompt construction.

    Two modes:

    * **Checkpoint-driven** (preferred): when the checkpoint directory ships
      a chat template (``chat_template.jinja`` or ``tokenizer_config.json``'s
      ``chat_template`` field — the upstream ``qwen_asr`` SDK's source of
      truth, which the reference consumes via ``model.transcribe``,
      src/server.py:866-869), it is rendered with the standard ASR message
      structure (system = context-bias text, user = language hint + audio)
      and split at the audio placeholder into (prefix, suffix).
    * **Built-in fallback**: the Qwen-Omni chat convention below, used for
      synthetic presets and checkpoints without a template. This is a
      documented approximation, NOT verified against the upstream SDK:

          <|im_start|>system\\n{context}<|im_end|>\\n
          <|im_start|>user\\n{Language: {name}\\n}<|audio_bos|><|AUDIO|>*N
          <|audio_eos|><|im_end|>\\n<|im_start|>assistant\\n
    """
    system: str = "You are a speech recognition model."
    im_start: str = "<|im_start|>"
    im_end: str = "<|im_end|>"
    audio_token: str = "<|AUDIO|>"
    audio_bos: str = "<|audio_bos|>"
    audio_eos: str = "<|audio_eos|>"
    chat_template: Optional[str] = None     # raw jinja source (checkpoint)
    # lazily-built caches (the compiled template is immutable; rendering on
    # the 450 ms WS tick must not rebuild a jinja Environment per call)
    _compiled: object = dataclasses.field(default=None, init=False,
                                          repr=False, compare=False)
    _suffix_static: Optional[bool] = dataclasses.field(default=None,
                                                       init=False,
                                                       repr=False,
                                                       compare=False)

    @staticmethod
    def from_checkpoint(model_dir: str) -> "PromptTemplate":
        """Build a template from checkpoint metadata when available.

        Reads special-token strings and the chat template from
        ``tokenizer_config.json`` / ``chat_template.jinja`` (HF convention;
        same files transformers' AutoProcessor consumes)."""
        import json as _json
        import os as _os

        kwargs: dict = {}
        tc_path = _os.path.join(model_dir, "tokenizer_config.json")
        if _os.path.isfile(tc_path):
            with open(tc_path) as f:
                tc = _json.load(f)

            def tok_str(v):
                return v.get("content") if isinstance(v, dict) else v

            for field, key in (("audio_token", "audio_token"),
                               ("audio_bos", "audio_bos_token"),
                               ("audio_eos", "audio_eos_token")):
                if tc.get(key):
                    kwargs[field] = tok_str(tc[key])
            if isinstance(tc.get("chat_template"), str):
                kwargs["chat_template"] = tc["chat_template"]
        jinja_path = _os.path.join(model_dir, "chat_template.jinja")
        if _os.path.isfile(jinja_path):
            with open(jinja_path) as f:
                kwargs["chat_template"] = f.read()
        return PromptTemplate(**kwargs)

    # -- checkpoint-template rendering ---------------------------------------
    def _render_chat(self, language_name: Optional[str], context: str
                     ) -> Optional[Tuple[str, str]]:
        """Render the checkpoint's chat template → (prefix, suffix) split at
        the audio placeholder. Returns None if no template / render fails."""
        if not self.chat_template:
            return None
        try:
            if self._compiled is None:
                import jinja2
                env = jinja2.Environment(
                    trim_blocks=True, lstrip_blocks=True,
                    extensions=["jinja2.ext.loopcontrols"])
                env.globals["raise_exception"] = _jinja_raise
                self._compiled = env.from_string(self.chat_template)
            tmpl = self._compiled
            lang_line = f"Language: {language_name}\n" if language_name else ""
            user_content = [{"type": "audio", "audio": ""}]
            if lang_line:
                user_content.insert(0, {"type": "text", "text": lang_line})
            messages = []
            if context or self.system:
                messages.append({"role": "system",
                                 "content": context or self.system})
            messages.append({"role": "user", "content": user_content})
            text = tmpl.render(
                messages=messages, add_generation_prompt=True,
                audio_token=self.audio_token, audio_bos_token=self.audio_bos,
                audio_eos_token=self.audio_eos)
            if text.count(self.audio_token) != 1:
                self._warn_template_fallback(
                    f"rendered {text.count(self.audio_token)} audio "
                    "placeholders (need exactly 1)")
                return None
            prefix, suffix = text.split(self.audio_token)
            return prefix, suffix
        except Exception as e:
            # Falling back silently would mask a real fidelity problem: the
            # builtin prompt format is an approximation the checkpoint may
            # not have been trained with.
            self._warn_template_fallback(f"render failed: {e!r}")
            return None

    def _warn_template_fallback(self, reason: str) -> None:
        if getattr(self, "_template_warned", False):
            return
        self._template_warned = True
        from ..utils.logging import log
        log.warning("checkpoint chat template unusable ({}); using the "
                    "builtin prompt format — transcripts may differ from "
                    "the upstream SDK's", reason)

    def _suffix_is_static(self) -> bool:
        """The engine bakes suffix ids into each fused executable at load, so
        the checkpoint template is only usable if the post-audio text does
        NOT depend on language/context. Probed once: a template that renders
        the language hint after the audio span (audio-first content order)
        would otherwise silently drop the hint — fall back to the builtin
        format (which keeps it in the prefix) and say so."""
        if self._suffix_static is None:
            base = self._render_chat(None, "")
            probe = self._render_chat("French", "probe context")
            self._suffix_static = (base is not None and probe is not None
                                   and base[1] == probe[1])
            if not self._suffix_static and base is not None:
                from ..utils.logging import log
                log.warning(
                    "checkpoint chat template renders language/context AFTER "
                    "the audio span; falling back to the builtin prompt "
                    "format so the hint stays in the (dynamic) prefix")
        return self._suffix_static

    def prompt_texts(self, language_name: Optional[str], context: str = ""
                     ) -> Tuple[str, str]:
        """(prefix_text, suffix_text) around the audio embedding span."""
        if self.chat_template and self._suffix_is_static():
            rendered = self._render_chat(language_name, context)
            if rendered is not None:
                return rendered
        sys_block = f"{self.im_start}system\n{context or self.system}{self.im_end}\n"
        lang_line = f"Language: {language_name}\n" if language_name else ""
        prefix = f"{sys_block}{self.im_start}user\n{lang_line}{self.audio_bos}"
        suffix = f"{self.audio_eos}{self.im_end}\n{self.im_start}assistant\n"
        return prefix, suffix

    def prefix_text(self, language_name: Optional[str], context: str = "") -> str:
        return self.prompt_texts(language_name, context)[0]

    def suffix_text(self) -> str:
        return self.prompt_texts(None, "")[1]


def _jinja_raise(msg):  # transformers chat templates call raise_exception()
    raise ValueError(msg)


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
        # ONE template render per call (suffix is enforced static, so both
        # halves come from the same render).
        prefix_t, suffix_t = self.template.prompt_texts(lang_name, context)
        prefix = self.tokenizer.encode(prefix_t)
        suffix = self.tokenizer.encode(suffix_t)
        return prefix, suffix, n_audio_tokens

    # Prompt-embed assembly lives in ONE place — engine._prompt_builder
    # (traceable, takes params as an argument for sharded/donated trees).

    # -- encoder ----------------------------------------------------------------
    def encode_audio(self, mel: jax.Array, feature_lens: jax.Array):
        return encoder_forward(self.params["encoder"], self.cfg.encoder,
                               mel, feature_lens)

    def audio_token_count(self, mel_frames: int) -> int:
        return int(encoder_output_length(mel_frames,
                                         self.cfg.encoder.n_window * 2))
