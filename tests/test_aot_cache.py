"""AOT executable cache (runtime/aot_cache.py): blob save/load/dispatch.

The TPU-native analogue of the reference's TensorRT engine deserialization
boot path (reference src/model.py engine load). Contract under test:
outputs through a blob-loaded executable are token-identical to the plain
jit path, blobs are REUSED (not rebuilt) by later engines, corrupt blobs
fall back to recompilation, and program-shaping env changes change the
fingerprint instead of silently reusing a stale blob.
"""
import os

import numpy as np
import pytest

from qwen3_asr_tpu.runtime.engine import TranscriptionEngine

from tests.fixtures import load_tiny_model, write_tiny_checkpoint


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("aot_ckpt"))
    write_tiny_checkpoint(path)
    return path


def _audio():
    rng = np.random.default_rng(7)
    return (rng.standard_normal(16000) * 0.05).astype(np.float32)


def _engine(ckpt_dir):
    return TranscriptionEngine(load_tiny_model(ckpt_dir))


def test_blob_roundtrip_token_identical(ckpt_dir, tmp_path, monkeypatch):
    audio = _audio()
    plain = _engine(ckpt_dir).transcribe(audio, 16000, language="en")

    monkeypatch.setenv("ASR_AOT_CACHE_DIR", str(tmp_path))
    eng = _engine(ckpt_dir)
    assert eng._aot is not None, "cache should engage on unsharded params"
    built = eng.transcribe(audio, 16000, language="en")
    blobs = sorted(os.listdir(tmp_path))
    assert blobs and blobs[0].startswith("fused-")
    assert built[0].text == plain[0].text
    assert built[0].token_ids == plain[0].token_ids

    # A later engine must LOAD the blob, not rebuild it.
    mtimes = {f: os.path.getmtime(tmp_path / f) for f in blobs}
    loaded = _engine(ckpt_dir).transcribe(audio, 16000, language="en")
    assert loaded[0].text == plain[0].text
    assert loaded[0].token_ids == plain[0].token_ids
    assert all(os.path.getmtime(tmp_path / f) == m
               for f, m in mtimes.items()), "blob was rebuilt, not loaded"


def test_resume_path_gets_own_blob(ckpt_dir, tmp_path, monkeypatch):
    audio = _audio()
    monkeypatch.setenv("ASR_AOT_CACHE_DIR", str(tmp_path))
    eng = _engine(ckpt_dir)
    plain = _engine(ckpt_dir)  # same env; separate instance, shares blobs
    r = eng.transcribe(audio, 16000, language="en", resume_tokens=[])
    assert any(f.startswith("resume-") for f in os.listdir(tmp_path))
    assert r[0].text == plain.transcribe(audio, 16000,
                                         language="en")[0].text


def test_corrupt_blob_recompiles(ckpt_dir, tmp_path, monkeypatch):
    audio = _audio()
    monkeypatch.setenv("ASR_AOT_CACHE_DIR", str(tmp_path))
    plain = _engine(ckpt_dir).transcribe(audio, 16000, language="en")
    for f in os.listdir(tmp_path):
        with open(tmp_path / f, "wb") as fh:
            fh.write(b"not a pickle")
    again = _engine(ckpt_dir).transcribe(audio, 16000, language="en")
    assert again[0].text == plain[0].text
    # The corrupt blob was replaced with a good one (bigger than the stub).
    assert all(os.path.getsize(tmp_path / f) > 64
               for f in os.listdir(tmp_path))


def test_blob_that_fails_at_execution_recompiles(ckpt_dir, tmp_path,
                                                 monkeypatch):
    """A blob can deserialize fine and still be unexecutable (seen on
    XLA:CPU after an unload/reload cycle: the async dispatch surfaced
    'Buffer Definition Event: Function ... not found' OUTSIDE the load
    guard and 500'd the request). The trial run must block on the result
    so execution failure falls back to recompilation."""
    audio = _audio()
    monkeypatch.setenv("ASR_AOT_CACHE_DIR", str(tmp_path))
    plain = _engine(ckpt_dir).transcribe(audio, 16000, language="en")
    blobs = set(os.listdir(tmp_path))
    assert blobs

    class LazyBroken:
        """Mimics an async-failing loaded executable: calling succeeds,
        consuming the result raises (like a poisoned jax.Array)."""
        def __call__(self, *a, **k):
            class Poisoned:
                def block_until_ready(self):
                    raise RuntimeError("Buffer Definition Event: gone")
                def __array__(self):
                    raise RuntimeError("Buffer Definition Event: gone")
            return Poisoned()

    from jax.experimental import serialize_executable as se
    monkeypatch.setattr(se, "deserialize_and_load",
                        lambda *a, **k: LazyBroken())
    again = _engine(ckpt_dir).transcribe(audio, 16000, language="en")
    assert again[0].text == plain[0].text


def test_program_env_changes_fingerprint(ckpt_dir, tmp_path, monkeypatch):
    audio = _audio()
    monkeypatch.setenv("ASR_AOT_CACHE_DIR", str(tmp_path))
    _engine(ckpt_dir).transcribe(audio, 16000, language="en")
    before = set(os.listdir(tmp_path))
    # Same shapes, different traced program → MUST be a different blob.
    monkeypatch.setenv("ASR_DECODER_UNROLL", "scan")
    _engine(ckpt_dir).transcribe(audio, 16000, language="en")
    after = set(os.listdir(tmp_path))
    assert after - before, "env change reused a stale fingerprint"


def test_source_hash_tracks_content(tmp_path):
    """The package-source hash is byte-content-sensitive and order-stable."""
    from qwen3_asr_tpu.runtime.aot_cache import package_source_hash
    pkg = tmp_path / "pkg"
    (pkg / "runtime").mkdir(parents=True)
    (pkg / "runtime" / "engine.py").write_text("x = 1\n")
    (pkg / "native.cpp").write_text("int main(){}\n")
    h1 = package_source_hash(str(pkg))
    assert h1 == package_source_hash(str(pkg)), "hash must be deterministic"
    # Touching mtime alone must NOT change it (content hash, not mtimes)...
    os.utime(pkg / "runtime" / "engine.py")
    assert package_source_hash(str(pkg)) == h1
    # ...but editing source bytes MUST.
    (pkg / "runtime" / "engine.py").write_text("x = 2\n")
    h2 = package_source_hash(str(pkg))
    assert h2 != h1, "source edit did not change the fingerprint"
    # Non-source files (docs, data) are ignored.
    (pkg / "README.md").write_text("hello")
    assert package_source_hash(str(pkg)) == h2


def test_source_change_invalidates_blobs(ckpt_dir, tmp_path, monkeypatch):
    """touch engine.py → blobs invalidate (the round-4 staleness hole).

    Simulated by swapping the package_source_hash an AotCache sees, which
    is exactly what an on-disk source edit does to the real function.
    """
    from qwen3_asr_tpu.runtime import aot_cache as ac
    audio = _audio()
    monkeypatch.setenv("ASR_AOT_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(ac, "package_source_hash", lambda root=None: "aaaa")
    plain = _engine(ckpt_dir).transcribe(audio, 16000, language="en")
    before = set(os.listdir(tmp_path))
    assert before
    monkeypatch.setattr(ac, "package_source_hash", lambda root=None: "bbbb")
    again = _engine(ckpt_dir).transcribe(audio, 16000, language="en")
    after = set(os.listdir(tmp_path))
    assert after - before, "source-hash change reused a stale blob"
    assert again[0].text == plain[0].text


def test_batch_shapes_dispatch_separately(ckpt_dir, tmp_path, monkeypatch):
    audio = _audio()
    monkeypatch.setenv("ASR_AOT_CACHE_DIR", str(tmp_path))
    eng = _engine(ckpt_dir)
    solo = eng.transcribe(audio, 16000, language="en")
    batch = eng.transcribe_batch([(audio, 16000)] * 2, language="en")
    fused = [f for f in os.listdir(tmp_path) if f.startswith("fused-")]
    assert len(fused) == 2, "batch-1 and batch-2 need distinct blobs"
    assert batch[0].text == batch[1].text == solo[0].text
