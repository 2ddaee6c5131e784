"""LLM-backed translation over any OpenAI-compatible chat API.

Behavioral parity with the reference translator (src/translator.py): text
translation at temperature 0.3 and SRT translation at temperature 0.1 with
format-preserving prompts and markdown-fence stripping — but implemented on
aiohttp directly (no ``openai`` package dependency).

Env: OPENAI_BASE_URL (e.g. http://localhost:11434/v1 for Ollama),
OPENAI_API_KEY (default "EMPTY"), TRANSLATE_MODEL (default gpt-3.5-turbo).
"""
from __future__ import annotations

import json
import os
import time

import aiohttp

from ..config import TRANSLATE_SRT_TEMPERATURE, TRANSLATE_TEMPERATURE
from ..utils.logging import log


def _lang_name(target_lang: str) -> str:
    low = target_lang.lower()
    if low in ("en", "english"):
        return "English"
    if low in ("zh", "chinese"):
        return "Chinese"
    return target_lang


async def _chat_completion(messages: list, temperature: float) -> str:
    base_url = os.getenv("OPENAI_BASE_URL", "https://api.openai.com/v1")
    api_key = os.getenv("OPENAI_API_KEY", "EMPTY")
    model = os.getenv("TRANSLATE_MODEL", "gpt-3.5-turbo")
    url = base_url.rstrip("/") + "/chat/completions"
    payload = {"model": model, "messages": messages,
               "temperature": temperature}
    timeout = aiohttp.ClientTimeout(total=float(
        os.getenv("TRANSLATE_TIMEOUT", "120")))
    async with aiohttp.ClientSession(timeout=timeout) as session:
        async with session.post(
                url, json=payload,
                headers={"Authorization": f"Bearer {api_key}"}) as resp:
            if resp.status != 200:
                body = await resp.text()
                raise RuntimeError(
                    f"translation API returned {resp.status}: {body[:200]}")
            data = await resp.json(content_type=None)
    choices = data.get("choices") or []
    if not choices:
        raise ValueError("Translation returned no choices")
    return (choices[0].get("message", {}).get("content") or "").strip()


async def translate_text(text: str, target_lang: str) -> str:
    """Translate plain transcription text."""
    if not text.strip():
        return text
    lang = _lang_name(target_lang)
    model = os.getenv("TRANSLATE_MODEL", "gpt-3.5-turbo")
    log.info("translate_text start | {} chars -> {} via {}",
             len(text), lang, model)
    prompt = (
        f"Translate the following spoken audio transcription into {lang}. "
        f"Preserve the original meaning and tone. Output ONLY the translated "
        f"text required without any introduction, markdown blocks, quotes, "
        f"or commentary.\n\nText: {text}")
    t0 = time.time()
    result = await _chat_completion(
        [{"role": "system",
          "content": "You are a professional and highly accurate translator."},
         {"role": "user", "content": prompt}],
        TRANSLATE_TEMPERATURE)
    log.info("translate_text done in {:.2f}s | {} -> {} chars",
             time.time() - t0, len(text), len(result))
    return result


async def translate_srt(srt_content: str, target_lang: str) -> str:
    """Translate SRT content, preserving indices and timestamp lines."""
    if not srt_content.strip():
        return srt_content
    lang = _lang_name(target_lang)
    model = os.getenv("TRANSLATE_MODEL", "gpt-3.5-turbo")
    log.info("translate_srt start | {} chars -> {} via {}",
             len(srt_content), lang, model)
    prompt = (
        f"Translate the following subtitle (SRT) content into {lang}. "
        f"Preserve the original SRT format and timing tags perfectly. "
        f"Output ONLY the valid translated SRT content without any "
        f"introduction, markdown wrapping blocks (like ```srt), or "
        f"commentary. Do NOT change the SRT index numbers or timestamp "
        f"lines.\n\nSRT Content:\n{srt_content}")
    t0 = time.time()
    result = await _chat_completion(
        [{"role": "system",
          "content": "You are a professional subtitle translator. You MUST "
                     "output ONLY valid SRT format."},
         {"role": "user", "content": prompt}],
        TRANSLATE_SRT_TEMPERATURE)

    # Strip a markdown fence if the model ignored instructions.
    if result.startswith("```"):
        log.debug("removing markdown fence from SRT translation")
        lines = result.split("\n")
        if lines and lines[0].startswith("```"):
            lines.pop(0)
        if lines and lines[-1].startswith("```"):
            lines.pop(-1)
        result = "\n".join(lines).strip()

    log.info("translate_srt done in {:.2f}s | {} -> {} chars",
             time.time() - t0, len(srt_content), len(result))
    return result
