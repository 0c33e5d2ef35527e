"""S9 — the HTTP transport over the GraphQL executor.

The reference's primary entry point is graphql-yoga bound to
``POST /api/v2/graphql`` (modules/api/index.ts:54-75). The engine side
of that surface is ``GraphQLService`` (graphql_api.py); this module is
the remaining ~30 lines: a WSGI app (PEP 3333, stdlib-only — no web
framework, keeping the public-dependency envelope) that decodes the
standard GraphQL-over-HTTP request body ``{"query": ...,
"variables": ...}`` and returns the executor's response body as JSON.

Serving model unchanged from graphql_api.py: every query is
limit-bounded, so a request materializes one bounded page driver-side;
Spark does the heavy lifting. Any WSGI server (wsgiref for tests,
gunicorn/uwsgi in production) can host the app:

    serve(GraphQLService(posts=posts, ...), port=8080)
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable

from .graphql_api import GraphQLService

GRAPHQL_PATH = "/api/v2/graphql"  # reference route, modules/api/index.ts:62
STREAM_ID_PATH = "/api/v1/create_stream_id"  # controller.ts:6-8


def wsgi_app(service: GraphQLService) -> Callable:
    """WSGI callable serving ``POST {GRAPHQL_PATH}`` and the REST
    ``POST {STREAM_ID_PATH}`` (the reference's full HTTP surface).
    Errors follow the GraphQL-over-HTTP convention: transport problems
    are HTTP errors (404/405/400), query problems are 200 with an
    ``errors`` array."""

    def app(environ, start_response) -> Iterable[bytes]:
        def respond(status: str, body: dict) -> Iterable[bytes]:
            payload = json.dumps(body).encode("utf-8")
            start_response(
                status,
                [
                    ("Content-Type", "application/json"),
                    ("Content-Length", str(len(payload))),
                ],
            )
            return [payload]

        path = environ.get("PATH_INFO")
        if path not in (GRAPHQL_PATH, STREAM_ID_PATH):
            return respond("404 Not Found", {"errors": [{"message": "not found"}]})
        if environ.get("REQUEST_METHOD") != "POST":
            return respond(
                "405 Method Not Allowed",
                {"errors": [{"message": "POST required"}]},
            )
        try:
            n = int(environ.get("CONTENT_LENGTH") or 0)
            req = json.loads(environ["wsgi.input"].read(n).decode("utf-8"))
        except Exception:
            return respond(
                "400 Bad Request",
                {"errors": [{"message": "body must be JSON"}]},
            )
        if not isinstance(req, dict):
            # valid JSON but not an object ([1], "x", 42): the req.get
            # calls below would raise — a 500 instead of the 400 the
            # transport contract promises
            return respond(
                "400 Bad Request",
                {"errors": [{"message": "body must be a JSON object"}]},
            )
        if path == STREAM_ID_PATH:
            return respond(
                "200 OK",
                service.create_stream_id(
                    req.get("author"), req.get("permlink")
                ),
            )
        if "query" not in req:
            return respond(
                "400 Bad Request",
                {"errors": [{"message": 'body must be JSON {"query": ...}'}]},
            )
        return respond("200 OK", service.execute(req["query"], req.get("variables")))

    return app


def serve(service: GraphQLService, *, host: str = "127.0.0.1", port: int = 8080):
    """Dev server (wsgiref): returns the bound server object — call
    ``.serve_forever()`` (on a thread in tests) and ``.shutdown()``.
    Pass ``port=0`` for an ephemeral port (``server.server_port``)."""
    from wsgiref.simple_server import WSGIRequestHandler, make_server

    class _Quiet(WSGIRequestHandler):
        def log_message(self, *args):  # keep test/driver stdout clean
            pass

    return make_server(host, port, wsgi_app(service), handler_class=_Quiet)
