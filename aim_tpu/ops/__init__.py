"""TPU compute kernels: vectorized batch DP over pair batches.

Two backends per algorithm with identical semantics:
  * ``*_xla.py``  — pure jax.numpy, runs on any backend (CPU tests,
    sharding dry-runs, non-TPU fallback);
  * ``*_pallas.py`` — hand-written Pallas TPU kernels (the perf path).
"""
