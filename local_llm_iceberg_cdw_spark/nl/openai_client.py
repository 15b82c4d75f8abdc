"""OpenAI-compatible chat-completions client — the production LLMClient.

The reference wires a ChatOpenAI client at a self-hosted
``/v1/chat/completions`` endpoint (``/root/reference/app-gradio.py:53-68``
against ``fastapi-llm.py:86-112``).  This is the equivalent for our
pipeline: a thin, dependency-light callable matching the
:data:`~.chain.LLMClient` seam — ``(messages) -> str`` — so
``AnswerPipeline(spark, llm=OpenAICompatClient(...), ...)`` is the whole
production wiring.

Design constraints:
- stdlib-only transport (urllib) so the engine adds no HTTP dependency;
  the transport is injectable, so tests run fully offline (MockTransport)
  and deployments may swap in requests/httpx without touching callers.
- Request/response shapes follow the public OpenAI chat-completions
  schema, which the reference's server implements (fastapi-llm.py:86-112:
  ``choices[0].message.content``).
- Defaults mirror the reference's sampling config (temperature 0.7,
  top_p 0.9, seed 42, max_tokens 4096 — app-gradio.py:55-66).

NEVER used in CI hot paths: tests inject MockLLM/MockTransport; no network
I/O happens unless a caller explicitly constructs a client with a URL.
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Callable

DEFAULT_TIMEOUT_S = 120.0

# Transport: (url, payload_bytes, headers, timeout_s) -> response_bytes
Transport = Callable[[str, bytes, dict[str, str], float], bytes]


def _urllib_transport(url: str, payload: bytes, headers: dict[str, str], timeout_s: float) -> bytes:
    req = urllib.request.Request(url, data=payload, headers=headers, method="POST")
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:  # noqa: S310 — caller-provided endpoint
        return resp.read()


class OpenAICompatClient:
    """``LLMClient`` against any OpenAI-compatible chat-completions server."""

    def __init__(
        self,
        base_url: str,
        model: str = "huggingface/dummy",
        api_key: str = "dummy",
        temperature: float = 0.7,
        top_p: float = 0.9,
        max_tokens: int = 4096,
        seed: int | None = 42,
        timeout_s: float = DEFAULT_TIMEOUT_S,
        transport: Transport | None = None,
    ):
        self.url = base_url.rstrip("/") + "/chat/completions"
        self.model = model
        self.api_key = api_key
        self.temperature = temperature
        self.top_p = top_p
        self.max_tokens = max_tokens
        self.seed = seed
        self.timeout_s = timeout_s
        self.transport = transport or _urllib_transport

    def build_payload(self, messages: list[dict[str, str]]) -> dict:
        payload = {
            "model": self.model,
            "messages": messages,
            "temperature": self.temperature,
            "top_p": self.top_p,
            "max_tokens": self.max_tokens,
        }
        if self.seed is not None:
            payload["seed"] = self.seed
        return payload

    @staticmethod
    def parse_response(body: bytes) -> str:
        """``choices[0].message.content`` per the OpenAI schema (and the
        reference server's response shape, fastapi-llm.py:104-111)."""
        obj = json.loads(body)
        choices = obj.get("choices")
        if not choices:
            raise ValueError(f"no choices in completion response: {obj!r}")
        return choices[0]["message"]["content"]

    def __call__(self, messages: list[dict[str, str]]) -> str:
        payload = json.dumps(self.build_payload(messages)).encode("utf-8")
        headers = {
            "Content-Type": "application/json",
            "Authorization": f"Bearer {self.api_key}",
        }
        return self.parse_response(self.transport(self.url, payload, headers, self.timeout_s))
