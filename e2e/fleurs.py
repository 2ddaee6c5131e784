"""FLEURS fixture shim: map the reference suite's real speech fixtures into
this suite's ``ASR_E2E_DATA`` layout (<name>.wav + <name>.txt + <name>.lang).

The reference ships 12 FLEURS clips (6 languages x 2) with committed
expected transcripts (reference E2Etest/data/audio/real/*.wav,
E2Etest/data/expected/*.txt, downloaded by download_test_audio.py:40-47).
Language is encoded in the filename prefix. This shim makes the WER/CER
gate runnable the moment a real checkpoint is mounted — no manual fixture
prep.
"""
from __future__ import annotations

import os
import shutil
from pathlib import Path
from typing import Optional

REFERENCE_DATA = Path(
    os.getenv("ASR_REFERENCE_E2E_DATA", "/root/reference/E2Etest/data"))

# filename prefix → language code (reference conftest.py language targets)
_PREFIX_LANG = {
    "english": "en", "chinese": "zh", "japanese": "ja",
    "cantonese": "yue", "hindi": "hi", "thai": "th",
}


VENDORED = Path(__file__).parent / "data" / "real"


def materialize_fleurs_fixtures(dst_dir: str) -> Optional[str]:
    """Copy reference FLEURS wav/txt pairs into ``dst_dir`` in ASR_E2E_DATA
    form. Prefers the repo's vendored e2e/data/real fixtures (already in
    that layout); falls back to the reference mount. Returns the dir path,
    or None when neither source is present."""
    # The vendored short-circuit requires usable wav+txt PAIRS — wavs
    # alone (e.g. transcripts lost to partial vendoring) must not shadow
    # a mounted reference tree that has the full pairs.
    if any((VENDORED / (w.stem + ".txt")).exists()
           for w in VENDORED.glob("*.wav")):
        return str(VENDORED)
    wav_dir = REFERENCE_DATA / "audio" / "real"
    txt_dir = REFERENCE_DATA / "expected"
    if not wav_dir.is_dir() or not txt_dir.is_dir():
        return None

    dst = Path(dst_dir)
    dst.mkdir(parents=True, exist_ok=True)
    n = 0
    for wav in sorted(wav_dir.glob("*.wav")):
        txt = txt_dir / (wav.stem + ".txt")
        if not txt.exists():
            continue
        prefix = wav.stem.rsplit("_", 1)[0].lower()
        lang = _PREFIX_LANG.get(prefix)
        if lang is None:
            continue
        shutil.copyfile(wav, dst / wav.name)
        shutil.copyfile(txt, dst / (wav.stem + ".txt"))
        (dst / (wav.stem + ".lang")).write_text(lang)
        n += 1
    return str(dst) if n else None
