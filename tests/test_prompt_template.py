"""Prompt-template tests: builtin golden format + checkpoint-driven jinja.

VERDICT round-1 item 3: the template must be provably documented (golden
test of the builtin fallback) or checkpoint-driven (rendered from the
checkpoint's chat template, the upstream qwen_asr SDK's source of truth —
reference consumes it via model.transcribe, src/server.py:866-869).
"""
import json
import os

from qwen3_asr_tpu.models.asr import AsrModel, PromptTemplate

# A Qwen-Omni-style chat template (the transformers content-list convention).
OMNI_TEMPLATE = (
    "{% for message in messages %}"
    "<|im_start|>{{ message['role'] }}\n"
    "{% if message['content'] is string %}{{ message['content'] }}"
    "{% else %}{% for content in message['content'] %}"
    "{% if content['type'] == 'audio' %}"
    "<|audio_start|><|audio_pad|><|audio_end|>"
    "{% elif content['type'] == 'text' %}{{ content['text'] }}"
    "{% endif %}{% endfor %}{% endif %}<|im_end|>\n"
    "{% endfor %}"
    "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}"
)


def test_builtin_prefix_suffix_golden():
    t = PromptTemplate()
    prefix, suffix = t.prompt_texts("English", "")
    assert prefix == ("<|im_start|>system\nYou are a speech recognition "
                      "model.<|im_end|>\n<|im_start|>user\n"
                      "Language: English\n<|audio_bos|>")
    assert suffix == "<|audio_eos|><|im_end|>\n<|im_start|>assistant\n"


def test_builtin_no_language_no_lang_line():
    t = PromptTemplate()
    prefix, _ = t.prompt_texts(None, "")
    assert "Language:" not in prefix


def test_builtin_context_replaces_system():
    t = PromptTemplate()
    prefix, _ = t.prompt_texts("English", "Names: Kata, Jo")
    assert "Names: Kata, Jo" in prefix
    assert "speech recognition model" not in prefix


def test_checkpoint_template_loaded_and_rendered(tmp_path):
    d = tmp_path / "ckpt"
    d.mkdir()
    (d / "tokenizer_config.json").write_text(json.dumps({
        "chat_template": OMNI_TEMPLATE,
        "audio_token": "<|audio_pad|>",
        "audio_bos_token": "<|audio_start|>",
        "audio_eos_token": "<|audio_end|>",
    }))
    t = PromptTemplate.from_checkpoint(str(d))
    assert t.chat_template == OMNI_TEMPLATE
    assert t.audio_token == "<|audio_pad|>"
    prefix, suffix = t.prompt_texts("English", "bias words")
    # system turn carries the context, user turn carries the language line,
    # audio markers come from the CHECKPOINT's token names
    assert prefix == ("<|im_start|>system\nbias words<|im_end|>\n"
                      "<|im_start|>user\nLanguage: English\n<|audio_start|>")
    assert suffix == ("<|audio_end|><|im_end|>\n<|im_start|>assistant\n")


def test_checkpoint_template_jinja_file_wins(tmp_path):
    d = tmp_path / "ckpt"
    d.mkdir()
    (d / "tokenizer_config.json").write_text(json.dumps(
        {"chat_template": "BROKEN {{"}))
    (d / "chat_template.jinja").write_text(OMNI_TEMPLATE)
    t = PromptTemplate.from_checkpoint(str(d))
    assert t.chat_template == OMNI_TEMPLATE


def test_bad_template_falls_back_to_builtin():
    t = PromptTemplate(chat_template="{{ unclosed")
    prefix, suffix = t.prompt_texts("English", "")
    assert prefix.endswith("<|audio_bos|>")
    assert suffix.startswith("<|audio_eos|>")


def test_template_without_audio_token_falls_back():
    # a text-only chat template (no audio placeholder) must not be used
    t = PromptTemplate(chat_template=(
        "{% for m in messages %}{{ m['role'] }}: {{ m['content'] }}\n"
        "{% endfor %}"))
    prefix, suffix = t.prompt_texts(None, "")
    assert prefix.endswith("<|audio_bos|>")


def test_model_prompt_ids_uses_checkpoint_template(tmp_path):
    from tests.fixtures import write_tiny_checkpoint, load_tiny_model
    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt, chat_template=(
        "{% for message in messages %}"
        "<|im_start|>{{ message['role'] }}\n"
        "{% if message['content'] is string %}{{ message['content'] }}"
        "{% else %}{% for content in message['content'] %}"
        "{% if content['type'] == 'audio' %}<|audio_bos|><|AUDIO|><|audio_eos|>"
        "{% elif content['type'] == 'text' %}{{ content['text'] }}"
        "{% endif %}{% endfor %}{% endif %}<|im_end|>\n{% endfor %}"
        "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}"))
    model = load_tiny_model(ckpt)
    assert model.template.chat_template  # picked up from tokenizer_config
    prefix_ids, suffix_ids, _ = model.prompt_ids(0, "en", "")
    prefix_text, suffix_text = model.template.prompt_texts("English", "")
    # ids must be the encoding of the RENDERED template (not the builtin)
    assert prefix_ids == model.tokenizer.encode(prefix_text)
    assert suffix_ids == model.tokenizer.encode(suffix_text)
    assert prefix_text.endswith("<|audio_bos|>")
    assert "Language: English" in prefix_text
    assert suffix_text == "<|audio_eos|><|im_end|>\n<|im_start|>assistant\n"
    # specials must round-trip to single special ids (not byte-split)
    assert model.tokenizer.special_tokens["<|audio_bos|>"] == prefix_ids[-1]
