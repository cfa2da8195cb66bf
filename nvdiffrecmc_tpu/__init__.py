"""nvdiffrecmc_tpu — a TPU-native (JAX/XLA/Pallas) differentiable Monte-Carlo
inverse renderer with the capabilities of NVlabs/nvdiffrecmc.

Given multi-view images with camera poses, jointly optimizes shape (DMTet SDF
or fixed-topology mesh), spatially-varying PBR materials (kd / ORM / normal
map) and an HDR lat-long environment light.  Primary visibility comes from a
differentiable tile rasterizer; direct lighting with shadows from a
differentiable Monte-Carlo tracer with light/BSDF MIS, denoised by a
cross-bilateral filter.  Everything compiles into a single XLA program per
training step.

Reference capability map: /root/reference (see SURVEY.md).  This package is a
ground-up TPU-first redesign, not a port.
"""

__version__ = "0.1.0"
