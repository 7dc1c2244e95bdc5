"""gdpt_tpu: a TPU-native gradient-domain path tracing framework.

A from-scratch JAX/Pallas re-design of the capabilities of
vedrocks15/Gradient-Based-Path-Tracing (lajolla + GDPT, C++/Embree/FFTW):

- host Python owns scene I/O, BVH build and orchestration;
- the device owns everything per ray: bounce-major ``lax.while_loop``
  megakernels vmapped over flat (pixel, sample) batches;
- counter-based threefry RNG keyed per (pixel, sample) reproduces the
  reference's "shared random number" structure that gradient-domain
  shift mapping relies on (reference: src/path_tracing.h:360-403);
- Embree is replaced by a host BVH build + stackless device traversal
  (reference: src/intersection.cpp, src/shapes/*.inl);
- FFTW's DCT-I screened-Poisson reconstruction is replaced by a
  ``jnp.fft`` solve on device (reference: src/render.cpp:172-254).

Layer map (mirrors SURVEY.md section 1):
  core/        L0 math, RNG, spectra, image I/O, sampling tables
  accel/       BVH build (host, C++/numpy) + traversal (device)
  scene/       L2/L3/L5 scene objects, parser, loaders, device scene
  ops/         microfacet toolbox, materials, intersection, Poisson
  integrators/ L4 integrators (aux AOVs, path, GDPT, volumetric)
  parallel/    multi-chip sharding over jax.sharding meshes
  utils/       profiling, checkpointing
"""

__version__ = "0.1.0"
