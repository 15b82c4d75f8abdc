"""Interactive NL analytics REPL — the CLI equivalent of the reference's
Gradio chat surface (``/root/reference/app-gradio.py:110-127,258-298``):
the same progressive states ("Thinking…" → "Running query…" → chart →
"Summarizing…" → answer), rendered as terminal lines instead of chatbot
updates.  Pure presentation over :meth:`~..nl.chain.AnswerPipeline.run_iter`
— no query logic lives here.

``input_fn``/``print_fn`` are injectable so the whole session is
scriptable in tests (SURVEY §5's mock-LLM strategy extended to the UI
loop).  Wire a real model by passing an :class:`~.openai_client.
OpenAICompatClient` (against ``nl.serving.ChatCompletionServer`` or any
OpenAI-compatible endpoint) as the pipeline's ``llm``.
"""

from __future__ import annotations

from collections.abc import Callable

from .chain import AnswerPipeline, format_rows_markdown

PROMPT = "nl> "
EXIT_COMMANDS = frozenset({"exit", "quit", ":q"})

STATE_LINES = {
    "thinking": "🤔 Thinking...",
    "summarizing": "✍️ Summarizing the results...",
}


def render_states(pipe: AnswerPipeline, question: str, print_fn: Callable[[str], None]) -> None:
    """Stream one question's progressive states to ``print_fn``."""
    for state, ans in pipe.run_iter(question):
        if state in STATE_LINES:
            print_fn(STATE_LINES[state])
        elif state == "running_query":
            print_fn(f"🏃 Running query...\n```sql\n{ans.sql}\n```")
        elif state == "chart":
            if ans.plot.plottable:
                print_fn(f"📊 {ans.plot.chart_type} chart: {ans.plot.title}")
        elif state == "error":
            print_fn(f"❌ {ans.error}")
        elif state == "answer":
            if ans.rows:
                print_fn(format_rows_markdown(ans.columns, ans.rows))
            print_fn(ans.text)


def run_repl(
    pipe: AnswerPipeline,
    input_fn: Callable[[str], str] = input,
    print_fn: Callable[[str], None] = print,
) -> int:
    """Read questions until EOF/exit; returns the number answered."""
    print_fn("Local analytics chat — ask a question, or 'exit' to leave.")
    answered = 0
    while True:
        try:
            line = input_fn(PROMPT)
        except (EOFError, KeyboardInterrupt):
            break
        question = line.strip()
        if not question:
            continue
        if question.lower() in EXIT_COMMANDS:
            break
        render_states(pipe, question, print_fn)
        answered += 1
    print_fn("bye.")
    return answered


def main() -> None:  # pragma: no cover - manual entry point
    """``python -m local_llm_iceberg_cdw_spark.nl.repl`` — interactive
    session over the fixture tables with an OpenAI-compatible endpoint
    from $NL_ENDPOINT (required: there is no bundled model)."""
    import os
    import sys

    from ..catalog import DEFAULT_SF_DIR, FIXTURE_TABLES, register_views, table_info
    from ..session import build_session
    from .openai_client import OpenAICompatClient

    endpoint = os.environ.get("NL_ENDPOINT")
    if not endpoint:
        sys.exit("set NL_ENDPOINT to an OpenAI-compatible /v1 base URL")
    spark = build_session(app_name="nl-repl")
    register_views(spark, os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    info = table_info(spark, FIXTURE_TABLES)
    pipe = AnswerPipeline(spark, OpenAICompatClient(endpoint), table_info=info)
    run_repl(pipe)
    spark.stop()


if __name__ == "__main__":  # pragma: no cover
    main()
