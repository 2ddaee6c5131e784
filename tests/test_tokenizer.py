"""Golden tests: pure-Python BPE vs the HF Rust tokenizers runtime."""
import json

import pytest

from qwen3_asr_tpu.text.tokenizer import BpeTokenizer, bytes_to_unicode

SPECIALS = ["<|endoftext|>", "<|im_start|>", "<|im_end|>",
            "<|AUDIO|>", "<|audio_bos|>", "<|audio_eos|>"]

CORPUS = [
    "hello world, this is a test of the byte level bpe tokenizer.",
    "the quick brown fox jumps over the lazy dog 1234567890",
    "speech recognition on tensor processing units is fast!",
    "transcribe the following audio please. thank you very much.",
    "多语言支持 including chinese 中文 and japanese 日本語 text",
    "what's it's we're they've i'll you'd o'clock",
] * 50


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers, decoders
    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400, special_tokens=SPECIALS,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(CORPUS, trainer)
    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tok.save(str(path))
    return tok, str(path)


@pytest.fixture(scope="module")
def ours(trained):
    _, path = trained
    return BpeTokenizer.from_file(path)


@pytest.mark.parametrize("text", [
    "hello world",
    "the quick brown fox jumps over the lazy dog",
    "what's new? i'll check!",
    "  leading spaces and\nnewlines\n\n",
    "numbers 123 and punctuation?!",
    "中文 mixed with english",
    "",
])
def test_encode_matches_rust(trained, ours, text):
    rust, _ = trained
    assert ours.encode(text) == rust.encode(text).ids


def test_special_tokens_roundtrip(trained, ours):
    rust, _ = trained
    text = "<|im_start|>user\nhello<|AUDIO|><|im_end|>"
    ours_ids = ours.encode(text)
    assert ours.special_tokens["<|AUDIO|>"] in ours_ids
    # decode drops specials by default
    decoded = ours.decode(ours_ids)
    assert "<|AUDIO|>" not in decoded and "hello" in decoded
    # keep specials when asked
    full = ours.decode(ours_ids, skip_special=False)
    assert "<|AUDIO|>" in full


@pytest.mark.parametrize("text", [
    "hello world", "unicode: ñ é 漢字 🎉", "tabs\tand\nnewlines",
])
def test_decode_roundtrip(ours, text):
    assert ours.decode(ours.encode(text)) == text


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_nfc_normalizer_matches_rust(tmp_path):
    """The Qwen2/Qwen3 tokenizer.json declares an NFC normalizer; the HF
    runtime NFC-normalizes before BPE. Decomposed input (e + combining
    acute) must encode identically to its composed form."""
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers, \
        trainers, decoders
    tok = Tokenizer(models.BPE())
    tok.normalizer = normalizers.NFC()
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400, special_tokens=SPECIALS,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(CORPUS + ["café résumé naïve"] * 50, trainer)
    path = str(tmp_path / "tokenizer.json")
    tok.save(path)
    ours = BpeTokenizer.from_file(path)
    assert ours.norm_forms == ("NFC",)
    decomposed = "café résumé"
    composed = "café résumé"
    assert ours.encode(decomposed) == tok.encode(decomposed).ids
    assert ours.encode(decomposed) == ours.encode(composed)
    # Sequence-wrapped normalizers flatten in order.
    from qwen3_asr_tpu.text.tokenizer import _unicode_norm_forms
    assert _unicode_norm_forms(
        {"type": "Sequence",
         "normalizers": [{"type": "NFC"}, {"type": "Lowercase"}]}) == ["NFC"]
    assert _unicode_norm_forms(None) == []


def test_non_special_added_tokens_survive_decode(tmp_path):
    """HF semantics: added_tokens with special:false (<think>, <tool_call>)
    are matched atomically on encode but are NOT dropped by
    decode(skip_special_tokens=True)."""
    from tokenizers import Tokenizer
    from tests.fixtures import build_tokenizer_json
    p = str(tmp_path / "tok.json")
    build_tokenizer_json(p)
    hf = Tokenizer.from_file(p)
    ours = BpeTokenizer.from_file(p)
    text = "a <think>plan</think> b"
    hf_ids = hf.encode(text).ids
    assert ours.encode(text) == hf_ids
    assert ours.decode(hf_ids) == hf.decode(hf_ids, skip_special_tokens=True)
    assert "<think>" in ours.decode(hf_ids)
    # special tokens still skipped
    im_end = ours.special_tokens["<|im_end|>"]
    assert ours.decode(hf_ids + [im_end]) == ours.decode(hf_ids)
