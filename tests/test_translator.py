"""Translator unit tests with a local fake OpenAI-compatible server
(coverage model: reference src/translator_test.py — prompt contents,
temperatures, markdown stripping, empty-input short-circuit, no-choices)."""
import asyncio
import json
import os

import pytest
from aiohttp import web
from aiohttp.test_utils import TestServer

from qwen3_asr_tpu.sidecars.translator import translate_srt, translate_text


class FakeLLM:
    def __init__(self):
        self.requests = []
        self.response_content = "translated text"
        self.no_choices = False

    async def handler(self, request):
        body = await request.json()
        self.requests.append(body)
        if self.no_choices:
            return web.json_response({"choices": []})
        return web.json_response({"choices": [{
            "message": {"role": "assistant",
                        "content": self.response_content}}]})


@pytest.fixture
def fake_llm():
    loop = asyncio.new_event_loop()
    fake = FakeLLM()
    app = web.Application()
    app.router.add_post("/v1/chat/completions", fake.handler)
    server = TestServer(app, loop=loop)
    loop.run_until_complete(server.start_server())
    os.environ["OPENAI_BASE_URL"] = f"http://127.0.0.1:{server.port}/v1"
    os.environ["TRANSLATE_MODEL"] = "test-model"
    yield loop, fake
    loop.run_until_complete(server.close())
    loop.close()


def test_translate_text_prompt_and_temperature(fake_llm):
    loop, fake = fake_llm
    out = loop.run_until_complete(translate_text("hola mundo", "en"))
    assert out == "translated text"
    req = fake.requests[-1]
    assert req["model"] == "test-model"
    assert req["temperature"] == 0.3
    user_msg = req["messages"][1]["content"]
    assert "English" in user_msg
    assert "hola mundo" in user_msg
    assert req["messages"][0]["role"] == "system"


def test_translate_text_chinese_target(fake_llm):
    loop, fake = fake_llm
    loop.run_until_complete(translate_text("hello", "zh"))
    assert "Chinese" in fake.requests[-1]["messages"][1]["content"]


def test_translate_text_empty_short_circuit(fake_llm):
    loop, fake = fake_llm
    out = loop.run_until_complete(translate_text("   ", "en"))
    assert out == "   "
    assert fake.requests == []  # no API call


def test_translate_srt_temperature_and_prompt(fake_llm):
    loop, fake = fake_llm
    srt = "1\n00:00:00,000 --> 00:00:01,000\nhello\n"
    fake.response_content = srt
    out = loop.run_until_complete(translate_srt(srt, "zh"))
    req = fake.requests[-1]
    assert req["temperature"] == 0.1
    assert "SRT" in req["messages"][1]["content"]
    assert "timestamp" in req["messages"][1]["content"].lower()
    assert out == srt.strip()


def test_translate_srt_strips_markdown_fence(fake_llm):
    loop, fake = fake_llm
    fake.response_content = "```srt\n1\n00:00:00,000 --> 00:00:01,000\nhi\n```"
    out = loop.run_until_complete(translate_srt("1\nx\n", "en"))
    assert not out.startswith("```")
    assert "00:00:00,000" in out


def test_no_choices_raises(fake_llm):
    loop, fake = fake_llm
    fake.no_choices = True
    with pytest.raises(ValueError, match="no choices"):
        loop.run_until_complete(translate_text("hello", "en"))


def test_api_error_raises(fake_llm):
    loop, fake = fake_llm
    os.environ["OPENAI_BASE_URL"] = "http://127.0.0.1:1/v1"  # unroutable
    os.environ["TRANSLATE_TIMEOUT"] = "2"
    with pytest.raises(Exception):
        loop.run_until_complete(translate_text("hello", "en"))
    os.environ["TRANSLATE_TIMEOUT"] = "120"
