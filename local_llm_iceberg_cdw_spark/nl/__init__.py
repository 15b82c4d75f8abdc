"""Optional NL front-end — fully mockable; zero correctness weight."""

from .chain import AnswerPipeline, LLMClient, MockLLM, PlotDecision

__all__ = ["AnswerPipeline", "LLMClient", "MockLLM", "PlotDecision"]
