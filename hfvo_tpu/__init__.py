"""hfvo_tpu — TPU-native hybrid-feature RGB-D visual odometry.

A brand-new JAX/XLA/Pallas implementation of a low-texture-robust hybrid-feature
(points + lines + planes + Manhattan constraints) RGB-D visual odometry engine,
with the capabilities of the IROS'24 reference system
(`whwh747/A-Low-Texture-Robust-Hybrid-Feature-Based-Visual-Odometry`, an
ORB-SLAM2/MSC-VO-derived C++ stack — see SURVEY.md at the repo root).

Everything is rebuilt TPU-first: feature extraction / matching / RANSAC as
batched array programs, the g2o edge graph as a Schur-complement
Levenberg-Marquardt solver, and multi-chip scaling via `jax.sharding` meshes.
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmul precision MUST default to float32 ("highest") for this
# package. On TPU, JAX's DEFAULT precision feeds dot/conv inputs to the
# MXU truncated to bfloat16 (8 mantissa bits). VO geometry — SE(3)
# transforms, Jacobian products, Schur complements, triangulation — is
# chains of small matmuls on meter-scale coordinates, and bf16 truncation
# there is ~0.4% input error per op: measured on the synthetic golden
# orbit, tracking drifts ~10 cm PER FRAME (2.5 m by frame 28) under
# DEFAULT precision vs 0.7 cm TOTAL under "highest" (round 4; the CPU
# backend always computes f32, which is why the CPU test suite never saw
# it). Throughput-critical integer-exact matmuls (popcount Hamming, ±1
# LSH prototypes, BRIEF difference bank) opt back into bf16 locally with
# an explicit `precision=` argument — exact-in-bf16 inputs lose nothing.
_jax.config.update("jax_default_matmul_precision", "highest")
