"""Measured-negative Pallas experiments, quarantined off the hot path.

Kernels here were built, tested, and benchmarked against the XLA
lowering and LOST (numbers in docs/ROADMAP.md round-4 and the module
docstrings). They are kept as frozen negative results — correct,
covered by tests, and honest about why they do not ship — so a future
hardware/compiler generation can re-measure without re-deriving them.
Nothing in the production path imports from this package.
"""
