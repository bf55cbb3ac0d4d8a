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
