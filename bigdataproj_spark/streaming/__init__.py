"""Streaming surface (SURVEY.md §2.3 ST1-ST7).

Two halves:

- ``batch_twins``: the windowing math (tumbling/sliding/session,
  stream-static enrichment) as oracle-checked batch queries — identical
  expressions to the streaming path, so the DuckDB gate covers the
  semantics.
- ``replay``: a deterministic micro-batch replay harness that drives
  the REAL Structured Streaming operators (watermark late-data drop,
  stateful dedup, arbitrary state) from the bounded ``events`` fixture;
  golden-checked in tests/test_streaming.py (SURVEY.md §5.2 item 2).
"""
