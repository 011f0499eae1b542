"""Structured Streaming surface (SURVEY.md §2.13).

The reference is pure batch; the per-doc extraction kernels are
stateless, so the streaming wrapper is a thin ``foreachBatch`` /
transform layer over the same operators."""

from . import pipeline, windows  # noqa: F401
