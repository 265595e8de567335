"""dxrpathtracer_tpu — a TPU-native progressive wavefront path tracer.

A brand-new JAX/XLA/Pallas framework with the capabilities of MJP's DXRPathTracer
(WANG-Ruipeng fork, reference mounted at /root/reference). The DXR
megakernel-with-hardware-recursion design is replaced by a TPU-first wavefront
architecture: SoA ray batches in HBM, a statically-unrolled bounce loop, a threaded
(skip-link) LBVH traversed by vectorized/Pallas kernels, and XLA fusion for shading
math. Scene state is immutable pytrees; frame state (accumulation image, sample
index) is an explicit carry, so progressive rendering is a pure function.

Layer map (mirrors SURVEY.md §7):
  core/     — math, CMJ RNG, sampling, BRDF (parity with Sampling.hlsl/BRDF.hlsl)
  scene/    — scene pytrees, procedural generators, FBX import, textures
  accel/    — LBVH build + traversal (replaces DXR TLAS/BLAS + TraceRay)
  sky/      — Hosek-Wilkie sun/sky (replaces HosekSky/ + SkyCache)
  render/   — camera, wavefront integrator, accumulation, post-processing
  bake/     — GI lightmap baking (replaces Baking.hlsl/SurfaceMap.hlsl)
  parallel/ — multi-chip pixel-tile sharding over jax.sharding.Mesh
  app/      — settings registry, render session, profiler, CLI
"""

__version__ = "0.1.0"
