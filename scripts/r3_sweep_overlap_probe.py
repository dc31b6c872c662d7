"""Does the axon backend overlap host->device transfers with kernel execution?

Decides the LCP-sweep pipelining design (parallel/scene_sweep.py): if a
device_put issued while a kernel runs completes in parallel, chunked sweeps
can hide the per-chunk depth/mask uploads (the dominant prep cost,
scripts/profile_prepare.py) under the previous chunk's device program.

Measures, warm:
  T_k     - a ~50 ms matmul chain, forced by a scalar fetch
  T_u     - an 8-scene uint16 depth+mask upload, forced
  T_both  - kernel dispatched first, THEN the upload, both forced
Overlap works if T_both ~= max(T_k, T_u); serialized if ~= T_k + T_u.

Run: python scripts/r3_sweep_overlap_probe.py [--platform cpu]
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import time

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
parser.add_argument("--repeat", type=int, default=3)
args = parser.parse_args()

if args.platform:
    import jax
    jax.config.update("jax_platforms", args.platform)

from physimglobalpose_tpu import _jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
# Kernel sized to ~tens of ms on v5e: chained matmuls.
A = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))


@jax.jit
def kernel(a):
    x = a
    for _ in range(24):
        x = jnp.tanh(x @ a * 1e-4)
    return x[0, 0]


# Sweep-shaped payload: 8 scenes of uint16 depth + uint8 mask.
depth_np = rng.integers(0, 65535, size=(8, 480, 640), dtype=np.uint16)
mask_np = rng.integers(0, 12, size=(8, 480, 640), dtype=np.uint8)


def force(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def upload():
    d = jax.device_put(depth_np)
    m = jax.device_put(mask_np)
    return d, m


# Warm-up
float(kernel(A))
force(upload())

for rep in range(args.repeat):
    t0 = time.perf_counter()
    float(kernel(A))
    t_k = time.perf_counter() - t0

    t0 = time.perf_counter()
    d, m = upload()
    _ = force(d) + force(m)
    t_u = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = kernel(A)  # dispatched, async
    d, m = upload()  # transfer while the kernel runs?
    _ = float(out) + force(d) + force(m)
    t_both = time.perf_counter() - t0

    print(
        f"rep{rep}: kernel={t_k*1e3:.0f} ms  upload={t_u*1e3:.0f} ms  "
        f"both={t_both*1e3:.0f} ms  (max={max(t_k,t_u)*1e3:.0f}, "
        f"sum={(t_k+t_u)*1e3:.0f})"
    )
