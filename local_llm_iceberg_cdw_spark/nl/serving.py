"""OpenAI-compatible ``/v1/chat/completions`` serving shim (U4, server half).

The reference serves its local model as an OpenAI-compatible FastAPI app
(``/root/reference/fastapi-llm.py:64-112``: request/response models 64-85,
chat templating 89-93, sampling + prompt-strip 95-106; launched by
``run-fastapi.py:3``).  This is the engine's equivalent with the same wire
contract, built on stdlib ``http.server`` only — the sandbox ships neither
FastAPI/uvicorn nor torch/transformers, and the engine adds no HTTP
dependency (mirroring ``nl.openai_client``'s stdlib-transport rule).

The generation seam is one injectable callable::

    ChatModel = (messages, max_tokens, temperature) -> str

- Tests inject a deterministic scripted model, so the full NL loop
  (HTTP → chain.AnswerPipeline → spark.sql → answer) runs offline.
- A real deployment adapts its runtime behind the same seam;
  :func:`hf_pipeline_model` shows the reference-shaped adapter and is an
  explicit, clearly-marked stub when transformers is absent.
- ``PromptModel`` reproduces the reference's flat-prompt path: render the
  chat template, generate, strip the prompt prefix (fastapi-llm.py:89-106)
  — for backends that take one string instead of structured messages.

Wire contract (kept in lockstep with ``openai_client.OpenAICompatClient``,
which is the client half of the same schema):

- POST ``/v1/chat/completions`` with
  ``{"model", "messages": [{"role","content"}], "max_tokens"?, "temperature"?}``
- 200 → ``{"id": "chatcmpl-local", "object": "chat.completion", "created",
  "model", "choices": [{"index": 0, "message": {"role": "assistant",
  "content": ...}, "finish_reason": "stop"}]}``
- 400 malformed JSON / missing fields; 404 any other path; 500 when the
  model callable raises.
"""

from __future__ import annotations

import json
import threading
import time
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

# (messages, max_tokens, temperature) -> assistant text
ChatModel = Callable[[list[dict[str, str]], int, float], str]

DEFAULT_MAX_TOKENS = 2048  # fastapi-llm.py:68
DEFAULT_TEMPERATURE = 0.7  # fastapi-llm.py:69
MIN_TEMPERATURE = 0.01  # temperature<=0 is clamped, fastapi-llm.py:101

COMPLETIONS_PATH = "/v1/chat/completions"


def render_chat_template(messages: list[dict[str, str]], add_generation_prompt: bool = True) -> str:
    """Flat-prompt chat template (ChatML-style role tags), the shape
    ``tokenizer.apply_chat_template`` produces for the reference's model
    family (fastapi-llm.py:89-93)."""
    parts = [f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>" for m in messages]
    if add_generation_prompt:
        parts.append("<|im_start|>assistant\n")
    return "\n".join(parts)


class PromptModel:
    """Adapt a flat-prompt generator ``(prompt, max_tokens, temperature) ->
    full_text`` to the :data:`ChatModel` seam, reproducing the reference's
    template-then-strip loop: the backend returns prompt+completion and the
    prompt prefix is stripped (fastapi-llm.py:105-106)."""

    def __init__(self, generate: Callable[[str, int, float], str]):
        self.generate = generate

    def __call__(self, messages: list[dict[str, str]], max_tokens: int, temperature: float) -> str:
        prompt = render_chat_template(messages)
        full = self.generate(prompt, max_tokens, max(temperature, MIN_TEMPERATURE))
        return full.split(prompt)[-1].strip()


class ScriptedChatModel:
    """Deterministic test model: canned responses in order (the serving
    analog of ``chain.MockLLM``); records every call it receives."""

    def __init__(self, responses: list[str]):
        self.responses = list(responses)
        self.calls: list[dict] = []

    def __call__(self, messages: list[dict[str, str]], max_tokens: int, temperature: float) -> str:
        self.calls.append(
            {"messages": messages, "max_tokens": max_tokens, "temperature": temperature}
        )
        if not self.responses:
            raise RuntimeError("ScriptedChatModel exhausted")
        return self.responses.pop(0)


HF_TOP_P = 0.95  # fastapi-llm.py:104


def hf_pipeline_model(checkpoint_path: str) -> ChatModel:
    """Reference-shaped adapter: HF AutoModel + text-generation pipeline
    (load: fastapi-llm.py:31-50; generate: 89-106).  Loads the checkpoint
    ONCE and returns a :data:`ChatModel` that, per call, renders the
    tokenizer's chat template, samples with the reference's settings
    (do_sample, top_p=0.95, temperature clamped to MIN_TEMPERATURE,
    pad=eos), and strips the prompt prefix from the generated text.

    The optional transformers runtime is not shipped in this sandbox, so
    importing it raises NotImplementedError with the injection
    alternative; the adapter itself is exercised offline against a
    stubbed transformers API
    (tests/test_serving.py::test_hf_pipeline_model_against_stubbed_transformers),
    which pins every call it makes into that API."""
    try:
        from transformers import AutoModelForCausalLM, AutoTokenizer, pipeline
    except ImportError as exc:
        raise NotImplementedError(
            "hf_pipeline_model requires the optional transformers+torch "
            "runtime (not shipped in this environment); inject any "
            "ChatModel callable instead"
        ) from exc
    try:
        import torch

        device_map = "cuda" if torch.cuda.is_available() else "cpu"  # fastapi-llm.py:37
    except ImportError:
        device_map = "cpu"

    tokenizer = AutoTokenizer.from_pretrained(checkpoint_path, trust_remote_code=True)
    model = AutoModelForCausalLM.from_pretrained(
        checkpoint_path, torch_dtype="auto", device_map=device_map, trust_remote_code=True
    ).eval()
    pipe = pipeline("text-generation", model=model, tokenizer=tokenizer)

    def chat(messages: list[dict[str, str]], max_tokens: int, temperature: float) -> str:
        prompt = tokenizer.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True
        )
        outputs = pipe(
            prompt,
            max_new_tokens=max_tokens,
            do_sample=True,
            temperature=temperature if temperature > 0 else MIN_TEMPERATURE,
            top_p=HF_TOP_P,
            pad_token_id=tokenizer.eos_token_id,
        )
        # backends return prompt+completion; strip the prompt prefix
        # (fastapi-llm.py:105-106, the PromptModel rule)
        return outputs[0]["generated_text"].split(prompt)[-1].strip()

    return chat


def _validate(body: dict) -> tuple[str, list[dict[str, str]], int, float]:
    if not isinstance(body, dict):
        raise ValueError("request body must be a JSON object")
    model = body.get("model")
    messages = body.get("messages")
    if not isinstance(model, str) or not model:
        raise ValueError("'model' (string) is required")
    if not isinstance(messages, list) or not messages:
        raise ValueError("'messages' (non-empty list) is required")
    for m in messages:
        if not isinstance(m, dict) or "role" not in m or "content" not in m:
            raise ValueError("each message needs 'role' and 'content'")
    max_tokens = body.get("max_tokens", DEFAULT_MAX_TOKENS)
    temperature = body.get("temperature", DEFAULT_TEMPERATURE)
    if not isinstance(max_tokens, int) or max_tokens <= 0:
        raise ValueError("'max_tokens' must be a positive integer")
    if not isinstance(temperature, (int, float)):
        raise ValueError("'temperature' must be a number")
    return model, [{"role": m["role"], "content": m["content"]} for m in messages], max_tokens, float(temperature)


def completion_response(model: str, content: str) -> dict:
    """Response body in the reference server's exact shape
    (fastapi-llm.py:76-85,108-112)."""
    return {
        "id": "chatcmpl-local",
        "object": "chat.completion",
        "created": int(time.time()),
        "model": model,
        "choices": [
            {
                "index": 0,
                "message": {"role": "assistant", "content": content},
                "finish_reason": "stop",
            }
        ],
    }


class ChatCompletionServer:
    """Threaded local server exposing one :data:`ChatModel` at
    ``/v1/chat/completions``.  Port 0 (default) binds an ephemeral port;
    use as a context manager or call :meth:`start`/:meth:`stop`."""

    def __init__(self, model: ChatModel, host: str = "127.0.0.1", port: int = 0):
        self.model = model
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet: no stderr chatter in tests
                pass

            def _send(self, code: int, obj: dict) -> None:
                payload = json.dumps(obj).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def do_POST(self):
                if self.path != COMPLETIONS_PATH:
                    self._send(404, {"error": {"message": f"unknown path {self.path}"}})
                    return
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    body = json.loads(self.rfile.read(length) or b"")
                    model_name, messages, max_tokens, temperature = _validate(body)
                except (ValueError, json.JSONDecodeError) as exc:
                    self._send(400, {"error": {"message": str(exc)}})
                    return
                try:
                    content = outer.model(messages, max_tokens, temperature)
                except Exception as exc:  # noqa: BLE001 — surface as HTTP 500
                    self._send(500, {"error": {"message": f"generation failed: {exc}"}})
                    return
                self._send(200, completion_response(model_name, content))

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def base_url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}/v1"

    def start(self) -> "ChatCompletionServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def __enter__(self) -> "ChatCompletionServer":
        return self.start()

    def __exit__(self, *exc_info) -> None:
        self.stop()
