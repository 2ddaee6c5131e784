"""Script-based language detection tests."""
from qwen3_asr_tpu.text.langid import detect_language


def test_english():
    assert detect_language("hello how are you today") == "en"


def test_chinese():
    assert detect_language("今天天气很好我们去公园") == "zh"


def test_japanese_kana_beats_han():
    assert detect_language("今日はいい天気ですね") == "ja"


def test_korean():
    assert detect_language("안녕하세요 오늘 날씨가") == "ko"


def test_thai():
    assert detect_language("สวัสดีครับ วันนี้อากาศดี") == "th"


def test_hindi():
    assert detect_language("नमस्ते आप कैसे हैं") == "hi"


def test_mixed_mostly_latin():
    assert detect_language("the word 中 appears once in english text") == "en"


def test_empty():
    assert detect_language("") is None
    assert detect_language("   ") is None


def test_digits_only():
    assert detect_language("12345 67890") is None
