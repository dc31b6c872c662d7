"""Central JAX configuration, imported by every jax-using module.

Kept out of the package __init__ so that `import physimglobalpose_tpu` does
NOT import jax: jax freezes platform selection (JAX_PLATFORMS) at import
time, and callers (e.g. cli.py --platform) must be able to set the
environment before jax loads.
"""

import jax

# Geometric code (SE(3) composition, rigid fits, metrics) needs true f32
# matmuls; TPU's default bf16-input matmul precision corrupts poses at the
# 1e-2 level. Hot kernels opt into lower precision explicitly where safe.
jax.config.update("jax_default_matmul_precision", "float32")
