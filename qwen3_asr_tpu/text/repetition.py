"""Pathological-repetition post-processor for ASR output.

Behavioral parity with reference src/server.py:170-197, applied at every
endpoint: collapse repeated single words (>2 in a row) and repeated short
phrases of 3-8 words appearing more than ``max_repeats`` times.
"""
from __future__ import annotations

import re


def detect_and_fix_repetitions(text: str, max_repeats: int = 2) -> str:
    """Remove pathological repetitions from ASR output."""
    if not text or len(text) < 10:
        return text

    # Pattern 1: repeated single words (e.g. "um um um um")
    text = re.sub(r"\b(\w+)( \1){2,}\b", r"\1", text)

    # Pattern 2: repeated short phrases (3-8 words, repeating > max_repeats times)
    words = text.split()
    for phrase_len in range(3, min(9, len(words) // 3 + 1)):
        i = 0
        result = []
        while i < len(words):
            phrase = words[i:i + phrase_len]
            count = 1
            j = i + phrase_len
            while j + phrase_len <= len(words) and words[j:j + phrase_len] == phrase:
                count += 1
                j += phrase_len
            result.extend(phrase)
            if count > max_repeats:
                i = j  # skip the extra repeats
            else:
                i += phrase_len
        words = result

    return " ".join(words)
