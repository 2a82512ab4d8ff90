"""sparkcrawl — a PySpark-native crawl-analytics engine.

A brand-new reimplementation of the query/data-processing capabilities of
``retresco/Spyder`` (public repo, Apache-2.0): the Tornado event loop +
ZeroMQ master/worker record-at-a-time pipeline is re-expressed as a
batch-iterative *frontier-scheduler superstep* over Spark DataFrames.

Design (see SURVEY.md):
  - All state lives in tables (``frontier``, ``seen``, ``checkpoints``) —
    every superstep is a pure function ``(tables, T) -> tables``, so a
    killed run resumes from the last checkpoint with an identical
    URL-seen set.
  - All per-URL compute is vectorized (Arrow-backed pandas UDFs); the
    relational glue is plain DataFrame ops optimized by Catalyst.
  - Deterministic: virtual clock, seeded fixtures, total ordering with
    explicit tie-breaks — crawl order is reproducible bit-for-bit.

Subpackages mirror the operator inventory in SURVEY.md §2:
  functions/  scalar + vectorized column functions (C1-C9, F2-F5)
  operators/  relational operators (W1-W4, J1-J5, A1-A4, Q1-Q3, U1-U2)
  sources/    frontier store, synthetic fetch, fixtures (S1-S7)
  plans/      the superstep driver loop (§3.4)
  streaming/  optional foreachBatch wrapper (§2.10)
"""

__version__ = "0.1.0"
