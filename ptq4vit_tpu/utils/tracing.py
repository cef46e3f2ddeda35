"""Tracing / profiling utilities (SURVEY.md §5: the reference has only
time.time() wall-clock prints, example/test_all.py:31-34 — here we add
structured per-phase timing plus optional XLA profiler traces)."""
from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional


class Tracer:
    """Nested scoped wall-clock timing with optional jax.profiler traces."""

    def __init__(self, profile_dir: Optional[str] = None):
        self.profile_dir = profile_dir
        self.spans: Dict[str, float] = {}
        self._stack = []

    @contextlib.contextmanager
    def span(self, name: str):
        self._stack.append(name)
        key = "/".join(self._stack)
        t0 = time.time()
        try:
            yield
        finally:
            self.spans[key] = self.spans.get(key, 0.0) + time.time() - t0
            self._stack.pop()

    @contextlib.contextmanager
    def xla_trace(self):
        """Wrap a region in a jax.profiler trace (TensorBoard-viewable)."""
        if self.profile_dir is None:
            yield
            return
        import jax
        with jax.profiler.trace(self.profile_dir):
            yield

    def summary(self) -> str:
        return json.dumps(
            {k: round(v, 3) for k, v in sorted(self.spans.items())}, indent=2)
