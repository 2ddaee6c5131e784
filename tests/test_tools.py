"""Operator tooling tests: StableHLO export + audio debug."""
import os

import pytest

from tests.fixtures import write_tiny_checkpoint
from tests.util_audio import speech_like
from qwen3_asr_tpu.audio.codec import encode_wav


def test_export_stablehlo(tmp_path, monkeypatch):
    monkeypatch.setenv("SKIP_WARMUP", "true")
    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    out = str(tmp_path / "enc.stablehlo")
    from qwen3_asr_tpu.tools.export_stablehlo import export_encoder_stablehlo
    path = export_encoder_stablehlo(ckpt, bucket_s=1.0, output=out)
    text = open(path).read()
    assert "stablehlo" in text or "module" in text
    assert "dot_general" in text or "convolution" in text


def test_debug_audio(tmp_path):
    wav = tmp_path / "t.wav"
    wav.write_bytes(encode_wav(speech_like(1.0, seed=0), 16000))
    from qwen3_asr_tpu.tools.debug_audio import describe
    info = describe(str(wav))
    assert info["sample_rate"] == 16000
    assert info["duration_s"] == pytest.approx(1.0, abs=0.01)
    assert 0 < info["peak"] <= 1.0
    assert "speech_probability" in info


def test_debug_audio_resample(tmp_path):
    wav = tmp_path / "t8k.wav"
    wav.write_bytes(encode_wav(speech_like(1.0, sr=8000, seed=1), 8000))
    from qwen3_asr_tpu.tools.debug_audio import describe
    info = describe(str(wav), target_sr=16000)
    assert info["resampled_to"] == 16000
    assert info["resampled_samples"] == 2 * info["samples"]


def test_transcribe_cli(tmp_path, monkeypatch, capsys):
    """Offline batch CLI: short clips batch through the engine, artifacts
    land in --output-dir, JSON records carry file/text/language."""
    import json
    monkeypatch.setenv("SKIP_WARMUP", "true")
    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    wavs = []
    for i in range(2):
        p = tmp_path / f"clip{i}.wav"
        p.write_bytes(encode_wav(speech_like(0.5, seed=i), 16000))
        wavs.append(str(p))
    out_dir = str(tmp_path / "out")
    from qwen3_asr_tpu.tools.transcribe import main
    rc = main(wavs + ["--model", ckpt, "--language", "en", "--json",
                      "--output-dir", out_dir])
    assert rc == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert [r["file"] for r in lines] == wavs
    for r in lines:
        assert "text" in r and r["language"]
        assert os.path.exists(r["txt"])


def test_transcribe_cli_bad_file_reports_and_continues(tmp_path, monkeypatch,
                                                       capsys):
    """A decode failure is reported per file (exit 1) without aborting the
    rest of the batch."""
    monkeypatch.setenv("SKIP_WARMUP", "true")
    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    good = tmp_path / "good.wav"
    good.write_bytes(encode_wav(speech_like(0.5, seed=3), 16000))
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not audio at all")
    from qwen3_asr_tpu.tools.transcribe import main
    rc = main([str(bad), str(good), "--model", ckpt, "--language", "en"])
    assert rc == 1
    out = capsys.readouterr()
    assert str(good) in out.out          # good file still transcribed
    assert "ERROR" in out.err
