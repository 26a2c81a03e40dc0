"""TPU Pallas kernels on the hot path (augment_kernel, sharded).

Measured-negative kernels are quarantined under ``experiments/`` —
frozen, tested, never imported by production code.
"""
