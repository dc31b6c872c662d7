"""Central JAX configuration, imported by every jax-using module.

Kept out of the package __init__ so that `import physimglobalpose_tpu` does
NOT import jax: jax freezes platform selection (JAX_PLATFORMS) at import
time, and callers (e.g. cli.py --platform) must be able to set the
environment before jax loads.
"""

import os

import jax

# Geometric code (SE(3) composition, rigid fits, metrics) needs true f32
# matmuls; TPU's default bf16-input matmul precision corrupts poses at the
# 1e-2 level. Hot kernels opt into lower precision explicitly where safe.
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compile cache for EVERY entry point (bench, scripts, server),
# not just the test conftest: compiles over the axon remote-compile tunnel
# take minutes on this steal-heavy host, and re-runs should not pay twice.
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
