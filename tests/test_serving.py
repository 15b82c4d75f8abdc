"""Chat-completions serving shim (U4 server half): wire-contract tests and
the fully-offline end-to-end NL loop — HTTP round-trip → OpenAICompatClient
→ AnswerPipeline → spark.sql → answer (the reference's whole self-hosted
stack, fastapi-llm.py + app-gradio.py, with the model seam mocked)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from local_llm_iceberg_cdw_spark.catalog import register_views
from local_llm_iceberg_cdw_spark.nl.chain import AnswerPipeline
from local_llm_iceberg_cdw_spark.nl.openai_client import OpenAICompatClient
from local_llm_iceberg_cdw_spark.nl.serving import (
    ChatCompletionServer,
    PromptModel,
    ScriptedChatModel,
    hf_pipeline_model,
    render_chat_template,
)

from conftest import SF_SMOKE


def _post(url: str, body: dict | bytes) -> tuple[int, dict]:
    payload = body if isinstance(body, bytes) else json.dumps(body).encode()
    req = urllib.request.Request(
        url, data=payload, headers={"Content-Type": "application/json"}, method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as exc:
        return exc.code, json.loads(exc.read())


def test_round_trip_response_shape():
    model = ScriptedChatModel(["hello from the model"])
    with ChatCompletionServer(model) as srv:
        status, obj = _post(
            srv.base_url + "/chat/completions",
            {"model": "local-test", "messages": [{"role": "user", "content": "hi"}]},
        )
    assert status == 200
    # exact reference response shape (fastapi-llm.py:76-85)
    assert obj["object"] == "chat.completion" and obj["id"] == "chatcmpl-local"
    assert obj["model"] == "local-test"
    choice = obj["choices"][0]
    assert choice["index"] == 0 and choice["finish_reason"] == "stop"
    assert choice["message"] == {"role": "assistant", "content": "hello from the model"}
    # defaults forwarded to the model (fastapi-llm.py:68-69)
    assert model.calls[0]["max_tokens"] == 2048
    assert model.calls[0]["temperature"] == pytest.approx(0.7)


def test_error_paths():
    with ChatCompletionServer(ScriptedChatModel([])) as srv:
        base = srv.base_url
        assert _post(base + "/nope", {"x": 1})[0] == 404
        assert _post(base + "/chat/completions", b"{not json")[0] == 400
        assert _post(base + "/chat/completions", {"model": "m"})[0] == 400  # no messages
        assert (
            _post(
                base + "/chat/completions",
                {"model": "m", "messages": [{"role": "user"}]},  # no content
            )[0]
            == 400
        )
        # exhausted scripted model raises → surfaced as HTTP 500
        status, obj = _post(
            base + "/chat/completions",
            {"model": "m", "messages": [{"role": "user", "content": "hi"}]},
        )
        assert status == 500 and "generation failed" in obj["error"]["message"]


def test_prompt_model_strips_template():
    """PromptModel reproduces the template→generate→strip loop
    (fastapi-llm.py:89-106)."""
    seen = {}

    def fake_generate(prompt: str, max_tokens: int, temperature: float) -> str:
        seen["prompt"], seen["temperature"] = prompt, temperature
        return prompt + "42 laptops were sold."  # HF pipeline returns prompt+completion

    model = PromptModel(fake_generate)
    out = model([{"role": "user", "content": "how many?"}], 64, 0.0)
    assert out == "42 laptops were sold."
    assert seen["prompt"] == render_chat_template([{"role": "user", "content": "how many?"}])
    assert seen["prompt"].endswith("<|im_start|>assistant\n")
    assert seen["temperature"] == pytest.approx(0.01)  # <=0 clamped, fastapi-llm.py:101


def test_hf_adapter_raises_without_transformers():
    with pytest.raises(NotImplementedError, match="transformers"):
        hf_pipeline_model("some/checkpoint")


def test_hf_pipeline_model_against_stubbed_transformers(monkeypatch):
    """Drive the REAL hf_pipeline_model code path offline: a stubbed
    `transformers` module records every call the adapter makes
    (from_pretrained args, chat templating, sampling settings, eos pad)
    and returns prompt+completion so the strip rule is exercised —
    the one reference behavior (fastapi-llm.py:31-50,89-106) that can't
    run natively in this sandbox."""
    import sys
    import types

    calls: dict = {}

    class _FakeTokenizer:
        eos_token_id = 151643

        @classmethod
        def from_pretrained(cls, path, **kw):
            calls["tok_from_pretrained"] = (path, kw)
            return cls()

        def apply_chat_template(self, messages, tokenize, add_generation_prompt):
            assert tokenize is False and add_generation_prompt is True
            calls["templated"] = messages
            return render_chat_template(messages)

    class _FakeModel:
        @classmethod
        def from_pretrained(cls, path, **kw):
            calls["model_from_pretrained"] = (path, kw)
            return cls()

        def eval(self):
            calls["eval"] = True
            return self

    def _fake_pipeline(task, model, tokenizer):
        assert task == "text-generation"

        def run(prompt, **kw):
            calls["generate"] = {"prompt": prompt, **kw}
            return [{"generated_text": prompt + "SELECT COUNT(*) FROM plans;"}]

        return run

    fake = types.ModuleType("transformers")
    fake.AutoTokenizer = _FakeTokenizer
    fake.AutoModelForCausalLM = _FakeModel
    fake.pipeline = _fake_pipeline
    monkeypatch.setitem(sys.modules, "transformers", fake)

    model = hf_pipeline_model("org/fake-checkpoint")
    msgs = [{"role": "user", "content": "How many plans exist?"}]
    out = model(msgs, 128, 0.0)

    assert out == "SELECT COUNT(*) FROM plans;"  # prompt prefix stripped
    # load contract (fastapi-llm.py:40-48)
    assert calls["tok_from_pretrained"] == ("org/fake-checkpoint", {"trust_remote_code": True})
    path, kw = calls["model_from_pretrained"]
    assert path == "org/fake-checkpoint"
    assert kw == {"torch_dtype": "auto", "device_map": "cpu", "trust_remote_code": True}
    assert calls["eval"]
    # generate contract (fastapi-llm.py:95-104)
    g = calls["generate"]
    assert g["max_new_tokens"] == 128
    assert g["do_sample"] is True
    assert g["temperature"] == pytest.approx(0.01)  # <=0 clamped
    assert g["top_p"] == 0.95
    assert g["pad_token_id"] == 151643
    assert calls["templated"] == msgs

    # the adapter composes with the serving stack end-to-end
    with ChatCompletionServer(model) as srv:
        status, body = _post(
            srv.base_url + "/chat/completions",
            {"model": "local", "messages": msgs},
        )
    assert status == 200
    assert body["choices"][0]["message"]["content"] == "SELECT COUNT(*) FROM plans;"


def test_repl_scripted_session(spark):
    """CLI REPL streams the reference UI's progressive states
    (app-gradio.py:119-127,258-259,294-298) for a scripted session."""
    from local_llm_iceberg_cdw_spark.nl.chain import MockLLM
    from local_llm_iceberg_cdw_spark.nl.repl import run_repl

    register_views(spark, SF_SMOKE, ["region"])
    llm = MockLLM(
        [
            "SELECT r_name FROM region ORDER BY r_regionkey",
            '{"plottable": false}',
            "There are five regions.",
            "SELEKT nope",  # second question: execution error path
        ]
    )
    pipe = AnswerPipeline(spark, llm, table_info="region(r_regionkey, r_name)")
    inputs = iter(["list regions", "broken question", "exit"])
    out: list[str] = []
    n = run_repl(pipe, input_fn=lambda _prompt: next(inputs), print_fn=out.append)
    assert n == 2
    joined = "\n".join(out)
    # progressive states in order
    assert joined.index("🤔 Thinking...") < joined.index("🏃 Running query...")
    assert joined.index("🏃 Running query...") < joined.index("✍️ Summarizing")
    assert "```sql\nSELECT r_name FROM region" in joined
    assert "| AFRICA |" in joined and "There are five regions." in joined
    # error path surfaces the chain's non-raising error string
    assert "❌ The query could not be executed" in joined
    assert out[-1] == "bye."


def test_run_iter_states_match_run(spark):
    """run() is exactly 'consume run_iter' — same terminal Answer."""
    register_views(spark, SF_SMOKE, ["region"])
    responses = [
        "SELECT count(*) AS n FROM region",
        '{"plottable": true, "chart_type": "bar", "title": "t"}',
        "Five regions.",
    ]
    from local_llm_iceberg_cdw_spark.nl.chain import MockLLM

    states = [
        s
        for s, _ in AnswerPipeline(spark, MockLLM(responses), table_info="").run_iter("q")
    ]
    assert states == ["thinking", "running_query", "chart", "summarizing", "answer"]
    ans = AnswerPipeline(spark, MockLLM(responses), table_info="").run("q")
    assert ans.rows == [(5,)] and ans.text == "Five regions."


def test_end_to_end_nl_over_http(spark):
    """The closed loop the reference demos: client POSTs to the local
    server for SQL generation / plot decision / summary, executes the SQL
    on the engine, fully offline."""
    register_views(spark, SF_SMOKE, ["customer"])
    model = ScriptedChatModel(
        [
            "```sql\nSELECT c_mktsegment, COUNT(*) AS n FROM customer "
            "GROUP BY c_mktsegment ORDER BY n DESC;\n```",
            '{"plottable": true, "chart_type": "bar", "title": "Customers by segment", '
            '"x_label": "segment", "y_label": "customers"}',
            "Customers are spread across five market segments.",
        ]
    )
    with ChatCompletionServer(model) as srv:
        llm = OpenAICompatClient(base_url=srv.base_url, model="local-test")
        pipe = AnswerPipeline(spark, llm, table_info="customer(c_custkey, c_mktsegment, ...)")
        ans = pipe.run("How many customers per segment?")
    assert not ans.error
    assert len(ans.rows) == 5 and ans.columns == ["c_mktsegment", "n"]
    assert ans.plot.plottable and ans.plot.chart_type == "bar"
    assert "segments" in ans.text.lower()
    # the client really went over the wire: 3 HTTP-served generations,
    # sampling config forwarded from the client defaults
    assert len(model.calls) == 3
    assert model.calls[0]["max_tokens"] == 4096
