"""Byte-level BPE tokenizer — pure Python, loads HF tokenizer.json.

Covers the Qwen2/Qwen3 tokenizer family (GPT-2-style byte-level BPE with
added special tokens), replacing the HF ``tokenizers`` Rust runtime in the
serving path. Golden-tested against that runtime in tests/test_tokenizer.py.
"""
from __future__ import annotations

import functools
import json
import unicodedata
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import regex as _re

# Qwen2/GPT-4 style pre-tokenization pattern.
_QWEN_PATTERN = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|"
    r"[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}|"
    r" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)

# GPT-2 pattern (used by plain ByteLevel pre-tokenizers).
_GPT2_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"
    r" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
)


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2 reversible byte ↔ printable-unicode map."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_UNICODE_NORM_TYPES = ("NFC", "NFD", "NFKC", "NFKD")


def _unicode_norm_forms(norm: Optional[dict]) -> List[str]:
    """Unicode-normalization forms declared by a tokenizer.json
    ``normalizer`` block, in application order (flattens Sequence)."""
    if not norm:
        return []
    kind = norm.get("type")
    if kind in _UNICODE_NORM_TYPES:
        return [kind]
    if kind == "Sequence":
        out: List[str] = []
        for sub in norm.get("normalizers", []):
            out.extend(_unicode_norm_forms(sub))
        return out
    return []


class BpeTokenizer:
    def __init__(self, vocab: Dict[str, int], merges: List[Tuple[str, str]],
                 special_tokens: Optional[Dict[str, int]] = None,
                 pattern: str = _QWEN_PATTERN,
                 added_tokens: Optional[Dict[str, int]] = None,
                 norm_forms: Sequence[str] = ()):
        """special_tokens: added tokens with HF ``special: true`` — matched
        atomically on encode AND skipped by decode(skip_special=True).
        added_tokens: ``special: false`` entries (<think>, <tool_call>, …) —
        matched atomically on encode but ALWAYS emitted by decode, exactly
        like the HF tokenizers runtime.
        norm_forms: Unicode normalization forms ("NFC", …) applied, in
        order, to ordinary text before pre-tokenization — the tokenizer.json
        ``normalizer`` stage (Qwen2/Qwen3 declare NFC; HF's slow tokenizer
        likewise NFC-normalizes before BPE). Applied per non-special chunk,
        matching the runtime's handling of ``normalized: false`` added
        tokens (they are split out of the RAW text)."""
        self.vocab = dict(vocab)
        self.norm_forms = tuple(norm_forms)
        self.special_tokens = dict(special_tokens or {})
        self.added_tokens = dict(added_tokens or {})
        self.vocab.update(self.special_tokens)
        self.vocab.update(self.added_tokens)
        self.id_to_token = {v: k for k, v in self.vocab.items()}
        self.merge_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.pattern = _re.compile(pattern)
        self._byte_enc = bytes_to_unicode()
        self._byte_dec = {v: k for k, v in self._byte_enc.items()}
        self._special_ids = set(self.special_tokens.values())
        self._added_ids = set(self.added_tokens.values())
        self._atomic = {**self.special_tokens, **self.added_tokens}
        if self._atomic:
            self._special_re = _re.compile(
                "(" + "|".join(_re.escape(t) for t in
                               sorted(self._atomic, key=len,
                                      reverse=True)) + ")")
        else:
            self._special_re = None
        self._bpe_cache: Dict[str, List[str]] = {}

    # -- construction ---------------------------------------------------------
    @staticmethod
    def from_file(path: str) -> "BpeTokenizer":
        with open(path, encoding="utf-8") as f:
            blob = json.load(f)
        model = blob["model"]
        merges = [tuple(m.split(" ", 1)) if isinstance(m, str) else tuple(m)
                  for m in model["merges"]]
        special = {t["content"]: t["id"]
                   for t in blob.get("added_tokens", [])
                   if t.get("special", True)}
        added = {t["content"]: t["id"]
                 for t in blob.get("added_tokens", [])
                 if not t.get("special", True)}
        pattern = _QWEN_PATTERN
        pre = blob.get("pre_tokenizer") or {}
        for sub in pre.get("pretokenizers", [pre]):
            if sub.get("type") == "Split":
                pat = sub.get("pattern", {})
                pattern = pat.get("Regex", pattern)
                break
            if sub.get("type") == "ByteLevel":
                pattern = _GPT2_PATTERN
                break
        return BpeTokenizer(model["vocab"], merges, special, pattern,
                            added_tokens=added,
                            norm_forms=_unicode_norm_forms(
                                blob.get("normalizer")))

    # -- BPE core -------------------------------------------------------------
    def _bpe(self, token: str) -> List[str]:
        cached = self._bpe_cache.get(token)
        if cached is not None:
            return cached
        parts = list(token)
        while len(parts) > 1:
            best_rank = None
            best_idx = -1
            for i in range(len(parts) - 1):
                rank = self.merge_ranks.get((parts[i], parts[i + 1]))
                if rank is not None and (best_rank is None or rank < best_rank):
                    best_rank, best_idx = rank, i
            if best_rank is None:
                break
            parts = (parts[:best_idx]
                     + [parts[best_idx] + parts[best_idx + 1]]
                     + parts[best_idx + 2:])
        if len(self._bpe_cache) < 50_000:
            self._bpe_cache[token] = parts
        return parts

    def _encode_ordinary(self, text: str) -> List[int]:
        for form in self.norm_forms:
            text = unicodedata.normalize(form, text)
        ids: List[int] = []
        for piece in self.pattern.findall(text):
            mapped = "".join(self._byte_enc[b] for b in piece.encode("utf-8"))
            for part in self._bpe(mapped):
                idx = self.vocab.get(part)
                if idx is None:
                    # unknown byte sequence: fall back to single-byte tokens
                    for ch in part:
                        ids.append(self.vocab.get(ch, 0))
                else:
                    ids.append(idx)
        return ids

    # -- public API ------------------------------------------------------------
    def encode(self, text: str, allow_special: bool = True) -> List[int]:
        if not text:
            return []
        if allow_special and self._special_re is not None:
            ids: List[int] = []
            for chunk in self._special_re.split(text):
                if not chunk:
                    continue
                if chunk in self._atomic:
                    ids.append(self._atomic[chunk])
                else:
                    ids.extend(self._encode_ordinary(chunk))
            return ids
        return self._encode_ordinary(text)

    def decode(self, ids: Iterable[int], skip_special: bool = True) -> str:
        out: List[str] = []
        buf: List[str] = []

        def flush():
            if buf:
                joined = "".join(buf)
                data = bytes(self._byte_dec.get(c, ord("?") & 0xFF)
                             for c in joined)
                out.append(data.decode("utf-8", errors="replace"))
                buf.clear()

        for i in ids:
            tok = self.id_to_token.get(int(i))
            if tok is None:
                continue
            if int(i) in self._special_ids:
                flush()
                if not skip_special:
                    out.append(tok)
            elif int(i) in self._added_ids:
                flush()
                out.append(tok)  # non-special added tokens always survive
            else:
                buf.append(tok)
        flush()
        return "".join(out)

    def token_id(self, token: str) -> int:
        return self.vocab[token]

    @property
    def vocab_size(self) -> int:
        return max(self.vocab.values()) + 1
