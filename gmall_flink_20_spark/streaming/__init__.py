"""Structured Streaming layer (SURVEY.md §1.4 mapping, §7 steps 5-6).

The reference's DataStream programs are file-replay demos; here the same
dataflows are Structured Streaming queries:

- ``windows``  — watermarked tumbling/sliding window aggregations (WA1-WA8)
- ``stateful`` — applyInPandasWithState operators for what Spark has no
  built-in for: CEP-ish login-fail detection, the order-timeout state
  machine with event-time timeout alerts, the daily blacklist filter
  (§2.8, §2.7 J3/J4, §2.10)
- ``replay``   — file-replay micro-batch harness used by tests to assert
  streaming ≡ batch equivalence (SURVEY §5 plan, item 3)
"""
