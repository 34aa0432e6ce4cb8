"""Henjou-TPU: a TPU-native physically-based wavefront path tracer.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of Henjou Renderer
(kinakomoti-321/Henjou-Renderer, a C++17/CUDA/OptiX 7.7 offline path tracer;
reference layer map in SURVEY.md). The OptiX megakernel becomes a wavefront
integrator over SoA ray batches; GAS/IAS acceleration structures become an
on-device LBVH + two-level TLAS traversed by a Pallas TPU kernel; the CUDA
BSDF library (Disney BRDF with thin-film interference LUT, minus-IOR
meta-material BTDF, multiple-scattering GGX) becomes a vectorized JAX BSDF
library with NEE/MIS integration; multi-chip scaling rides jax.sharding over
an ICI mesh (spp/tile sharding with psum accumulation).
"""

__version__ = "0.1.0"
