"""Driver-side plans: the batch-iterative superstep loop (SURVEY §3.4)."""
