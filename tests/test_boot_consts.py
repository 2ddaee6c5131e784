"""Boot-latency invariant: jitted closures must not capture DEVICE arrays.

A `jax.Array` captured as a closure constant is fetched back to the host
at MLIR-emission time (jax's array constant handler blocks in
`Array._value`).  Over a remote-tunnel device link that fetch is pure
waste per lower() — and it is where the process's one-time first-fetch
cost (52–1416 s observed; see engine.warm_d2h_path_async and the
docs/HOST_SERVER.md boot study) used to land, stalling the first
lower() of every process.  Constants that feed jitted code must
therefore stay HOST numpy: the mel filterbank / Hann window
(audio/frontend.py), the prompt suffix ids (runtime/engine.py,
runtime/stream.py), the FIR bandpass kernel.

This test spies on every `jax.jit` call the transcribe / resume /
streaming paths make, re-traces each function with `jax.make_jaxpr`, and
fails if any closure constant is a device array.  numpy constants lower
straight from host memory and are exempt.
"""
import numpy as np
import pytest

import jax

from tests.fixtures import load_tiny_model, write_tiny_checkpoint
from tests.util_audio import speech_like


class _JitSpy:
    """Replaces jax.jit; records (fn, shape-only args) at first call of
    each jitted function so the test can re-trace with make_jaxpr."""

    def __init__(self):
        self.real_jit = jax.jit
        self.records = []

    def __call__(self, fn=None, **kw):
        if fn is None:
            return lambda f: self(f, **kw)
        jfn = self.real_jit(fn, **kw)
        records = self.records
        seen = []

        class _Proxy:
            def __call__(self, *a, **k):
                if not seen:
                    seen.append(True)
                    def to_sds(x):
                        if isinstance(x, jax.Array):
                            return jax.ShapeDtypeStruct(x.shape, x.dtype)
                        return x
                    records.append((fn, jax.tree_util.tree_map(to_sds, a)))
                return jfn(*a, **k)

            def __getattr__(self, name):
                return getattr(jfn, name)

        return _Proxy()


def _device_consts(fn, args):
    """Closure constants of fn that are device arrays (should be none)."""
    closed = jax.make_jaxpr(fn)(*args)
    return [c for c in closed.consts if isinstance(c, jax.Array)]


def test_no_device_array_closure_consts(tmp_path):
    from qwen3_asr_tpu.runtime.engine import TranscriptionEngine

    spy = _JitSpy()
    jax.jit = spy
    try:
        path = str(tmp_path / "tiny")
        write_tiny_checkpoint(path)
        engine = TranscriptionEngine(load_tiny_model(path))
        # fused path
        engine.transcribe(speech_like(1.0, seed=0), 16000, language="en")
        # fused resume path
        frames, bucket_s = engine.bucket_frames(16000)
        engine._run_bucket([speech_like(1.0, seed=1)], frames, bucket_s,
                           "en", resume_tokens=[1, 2])
        # streaming prefix-cache path (_build_tick + cache init + blocks)
        session = engine.stream_session(6.0, "en")
        audio = speech_like(2.0, seed=2)
        tick = int(0.45 * 16000)
        window = np.zeros(0, np.float32)
        for off in range(0, len(audio), tick):
            window = np.concatenate([window, audio[off:off + tick]])
            session.update(window)
    finally:
        jax.jit = spy.real_jit

    assert spy.records, "spy recorded no jit calls — harness broken"
    offenders = []
    for fn, args in spy.records:
        try:
            bad = _device_consts(fn, args)
        except Exception as e:  # pragma: no cover - diagnostics only
            pytest.fail(f"re-trace of {getattr(fn, '__qualname__', fn)} "
                        f"failed: {type(e).__name__}: {e}")
        for c in bad:
            offenders.append((getattr(fn, "__qualname__", str(fn)),
                              c.shape, str(c.dtype)))
    assert not offenders, (
        "device-array closure constants found (these force a blocking "
        f"device fetch at lower() time): {offenders}")


def test_frontend_constants_are_host_numpy():
    from qwen3_asr_tpu.audio.frontend import Bandpass, LogMelFrontend

    fe = LogMelFrontend(n_mels=16)
    bp = Bandpass()
    for name, arr in (("window", fe.window), ("mel_fb", fe.mel_fb),
                      ("bandpass", bp.kernel)):
        assert isinstance(arr, np.ndarray) and not isinstance(arr, jax.Array), (
            f"frontend constant {name} must be host numpy, got {type(arr)}")
