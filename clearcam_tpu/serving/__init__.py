"""Continuous-batching LLM serving (TPU-native slot engine).

The reference serializes every Qwen generation onto its single main loop
(clearcam.py:1214-1226, one request at a time); this package serves many
requests concurrently from ONE cache and ONE decode graph — requests join
and leave the running batch at chunk granularity (vLLM-style continuous
batching with chunked prefill, built on models/llm.make_serving_fns).
"""
from .engine import Request, ServingEngine  # noqa: F401
from .text import TextServing  # noqa: F401
