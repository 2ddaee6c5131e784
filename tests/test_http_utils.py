"""HTTP plumbing unit tests: parse_bool, OpenAPI assembly, error shapes."""
from qwen3_asr_tpu.serving.http import build_openapi, multipart_body, parse_bool
from qwen3_asr_tpu.serving.schemas import API_DESCRIPTION, API_TAGS


def test_parse_bool():
    assert parse_bool("true") and parse_bool("1") and parse_bool("YES")
    assert not parse_bool("false") and not parse_bool("0")
    assert not parse_bool(None)
    assert parse_bool(None, default=True)
    assert not parse_bool("garbage")


def test_multipart_body_required():
    body = multipart_body({
        "file": {"type": "string", "format": "binary", "x-required": True},
        "language": {"type": "string", "default": "auto"},
    })
    schema = body["content"]["multipart/form-data"]["schema"]
    assert schema["required"] == ["file"]
    assert "x-required" not in schema["properties"]["file"]


def test_build_openapi_structure():
    spec = build_openapi("T", "1.0", API_DESCRIPTION, API_TAGS, [
        {"path": "/x", "method": "GET", "summary": "s", "tags": ["System"]},
        {"path": "/y", "method": "POST", "summary": "p",
         "request_body": multipart_body({"file": {"type": "string"}})},
    ])
    assert spec["openapi"].startswith("3.")
    assert spec["paths"]["/x"]["get"]["summary"] == "s"
    assert "requestBody" in spec["paths"]["/y"]["post"]
    assert "ErrorResponse" in spec["components"]["schemas"]
    assert {t["name"] for t in spec["tags"]} >= {"Transcription", "System"}


def test_operation_ids_unique():
    from qwen3_asr_tpu.serving.server import route_metadata
    spec = build_openapi("T", "1.0", "", API_TAGS, route_metadata())
    ids = [op["operationId"] for methods in spec["paths"].values()
           for op in methods.values()]
    assert len(ids) == len(set(ids))
