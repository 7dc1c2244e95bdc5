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


def _enable_compile_cache():
    """Force-enable the persistent XLA compile cache.

    On this TPU environment the JAX_COMPILATION_CACHE_DIR env var is
    silently ignored (jax.config.jax_compilation_cache_dir stays None;
    every process then recompiles the big wavefront chunks server-side,
    ~10 min per scene). An explicit config.update is the only override
    that sticks, so apply it at package import. Opt out with
    GDPT_NO_COMPILE_CACHE=1 (e.g. for compile-time measurements)."""
    import os

    if os.environ.get("GDPT_NO_COMPILE_CACHE", "0") == "1":
        return
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_tpu_cache")
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", path)
    except Exception:  # pragma: no cover - cache is a pure optimization
        pass


_enable_compile_cache()
