"""HTTP plumbing on aiohttp: errors, request-ID middleware, OpenAPI, docs.

The reference runs FastAPI under uvicorn/granian; this build's host layer is
aiohttp (HTTP + WS + SSE in one event loop, C-accelerated parser). The
public contracts — error payloads, headers, OpenAPI surface — match the
reference byte-for-byte where they are observable.
"""
from __future__ import annotations

import uuid
from typing import Any, Awaitable, Callable, Optional

from aiohttp import web

from ..utils.errors import error_body
from ..utils.logging import reset_request_id, set_request_id


def json_response(data: Any, status: int = 200) -> web.Response:
    return web.json_response(data, status=status)


def error_response(code: str, message: str, status_code: int,
                   **context: Any) -> web.Response:
    return web.json_response(error_body(code, message, status_code, **context),
                             status=status_code)


@web.middleware
async def request_id_middleware(request: web.Request,
                                handler: Callable[[web.Request],
                                                  Awaitable[web.StreamResponse]]
                                ) -> web.StreamResponse:
    import time as _time
    from ..utils.telemetry import metrics
    req_id = request.headers.get("X-Request-ID") or str(uuid.uuid4())
    token = set_request_id(req_id)
    t0 = _time.time()
    status = "500"
    try:
        response = await handler(request)
        status = str(response.status)
        if "X-Request-ID" not in response.headers:
            response.headers["X-Request-ID"] = req_id
        return response
    except web.HTTPException as e:
        # Router-raised 404/405 etc. — real statuses, not server errors.
        # These bypass the normal-response branch above, so the request-ID
        # header (attached to every response, incl. routing errors) is set
        # here too.
        status = str(e.status)
        e.headers["X-Request-ID"] = req_id
        raise
    finally:
        reset_request_id(token)
        # Label by the MATCHED route pattern, not the raw path: raw paths
        # from scanners (/wp-admin, /.env?x=1, ...) would mint an unbounded
        # set of counter+histogram label sets in the process-lifetime
        # registry and bloat /metrics forever.
        resource = None
        if request.match_info is not None \
                and request.match_info.route is not None:
            resource = request.match_info.route.resource  # None for 404s
        route = resource.canonical if resource is not None else "unmatched"
        if route not in ("/metrics",):
            metrics.inc("asr_requests_total", path=route,
                        method=request.method, status=status)
            if route != "unmatched":
                metrics.observe("asr_request_duration_seconds",
                                _time.time() - t0, path=route)


async def read_upload(request: web.Request) -> tuple[dict, Optional[bytes], str]:
    """Parse a multipart/form upload. Returns (fields, file_bytes, filename)."""
    fields: dict = {}
    file_bytes: Optional[bytes] = None
    filename = ""
    if request.content_type.startswith("multipart/"):
        reader = await request.multipart()
        async for part in reader:
            if part.name == "file":
                file_bytes = await part.read(decode=False)
                filename = part.filename or ""
            elif part.name:
                fields[part.name] = (await part.read(decode=False)).decode(
                    "utf-8", errors="replace")
    else:
        data = await request.post()
        for k, v in data.items():
            if hasattr(v, "file"):
                file_bytes = v.file.read()
                filename = getattr(v, "filename", "") or ""
            else:
                fields[k] = v
    return fields, file_bytes, filename


def parse_bool(raw: Optional[str], default: bool = False) -> bool:
    if raw is None:
        return default
    return str(raw).lower() in ("true", "1", "yes", "on")


# --- OpenAPI / docs -------------------------------------------------------------

def build_openapi(title: str, version: str, description: str, tags: list,
                  routes: list[dict]) -> dict:
    """Assemble an OpenAPI 3.1 document from per-route metadata dicts."""
    from .schemas import (
        ErrorResponse, HealthResponse, SSEChunkEvent, TranscriptionResponse,
        TranslationResponse, WebSocketHandshake, WebSocketPartial)

    components = {}
    for model in (ErrorResponse, HealthResponse, TranscriptionResponse,
                  TranslationResponse, SSEChunkEvent, WebSocketHandshake,
                  WebSocketPartial):
        schema = model.model_json_schema(
            ref_template="#/components/schemas/{model}")
        defs = schema.pop("$defs", {})
        components.update(defs)
        components[model.__name__] = schema

    paths: dict = {}
    for r in routes:
        entry = {
            "summary": r.get("summary", ""),
            "description": r.get("description", ""),
            "tags": r.get("tags", []),
            "operationId": r.get("operation_id",
                                 r["path"].strip("/").replace("/", "_")
                                 or "root"),
            "responses": r.get("responses", {"200": {"description": "OK"}}),
        }
        if r.get("request_body"):
            entry["requestBody"] = r["request_body"]
        paths.setdefault(r["path"], {})[r["method"].lower()] = entry

    return {
        "openapi": "3.1.0",
        "info": {"title": title, "version": version,
                 "description": description},
        "tags": tags,
        "paths": paths,
        "components": {"schemas": components},
    }


_DOCS_HTML = """<!DOCTYPE html>
<html>
<head>
  <title>{title} — Swagger UI</title>
  <meta charset="utf-8"/>
  <link rel="stylesheet"
        href="https://cdn.jsdelivr.net/npm/swagger-ui-dist@5/swagger-ui.css">
</head>
<body>
  <div id="swagger-ui"><h1>{title}</h1>
  <p>API docs. If the interactive UI fails to load (offline deployment),
  the raw schema is at <a href="/openapi.json">/openapi.json</a>.</p></div>
  <script src="https://cdn.jsdelivr.net/npm/swagger-ui-dist@5/swagger-ui-bundle.js"></script>
  <script>
    window.onload = () => {{
      if (window.SwaggerUIBundle)
        SwaggerUIBundle({{url: "/openapi.json", dom_id: "#swagger-ui"}});
    }};
  </script>
</body>
</html>"""


def add_docs_routes(app: web.Application, openapi: dict, title: str) -> None:
    async def openapi_json(request: web.Request) -> web.Response:
        return web.json_response(openapi)

    async def docs(request: web.Request) -> web.Response:
        return web.Response(text=_DOCS_HTML.format(title=title),
                            content_type="text/html")

    app.router.add_get("/openapi.json", openapi_json)
    app.router.add_get("/docs", docs)


def multipart_body(fields: dict) -> dict:
    """OpenAPI requestBody for a multipart upload with the given fields."""
    return {
        "required": True,
        "content": {"multipart/form-data": {"schema": {
            "type": "object",
            "properties": fields,
            "required": [k for k, v in fields.items()
                         if v.pop("x-required", False)],
        }}},
    }
