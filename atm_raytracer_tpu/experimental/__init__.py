"""Experimental Pallas TPU kernels — correct, opt-out of the default path.

Both kernels here are validated by interpret-mode parity tests
(tests/test_combine.py, tests/test_ray.py) and are real wins on a local
Mosaic toolchain, but this deployment's remote AOT Mosaic service compiles
kernel loop bodies ~per-iteration (a 500-step fori_loop ≈ 10 minutes of
compile), which makes cold starts impractical. Decision (VERDICT r2 #9):
the default hot path is pure XLA — already at the ≤1 s/frame bar for every
generator — and these kernels live here, imported by nothing in the
default code path, until a deployment with a sane Mosaic compile path can
re-evaluate them:

* ``combine_pallas`` — fused first-crossing detection with tile-level early
  exit (~0.8 GB HBM traffic vs ~34 GB for the chunked XLA combine at
  1080p/4000 steps).
* ``march_pallas`` — the whole coarse-RK4 ray march as one kernel launch
  with the piecewise-Chebyshev l(h) evaluated in-register.
"""
