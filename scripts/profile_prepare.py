"""Stage-level profile of parallel/scene_sweep.prepare_scenes on the TPU.

The LCP sweep is preprocess-bound (WHOLE_SCENE_BENCH.json: 0.16 s/scene host
vs 0.10 s/scene device), so this breaks prep into its stages: host PNG
decode, key derivation, depth upload+table removal, segment program, and
the output fetches. Run: python scripts/profile_prepare.py [--platform cpu]
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import time

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
parser.add_argument("--scenes", type=int, default=8)
parser.add_argument("--repeat", type=int, default=3)
args = parser.parse_args()

if args.platform:
    import jax
    jax.config.update("jax_platforms", args.platform)

from physimglobalpose_tpu import _jaxcfg  # noqa: F401
import jax
import numpy as np

from physimglobalpose_tpu.config import DEFAULT_CONFIG
from physimglobalpose_tpu.models import objectdb
from physimglobalpose_tpu.parallel import scene_sweep
from physimglobalpose_tpu.pipeline import scene as scene_mod

REF = "/root/reference"
OBJ_CONFIG = f"{REF}/src/physim_pose_estimation/src/data_layer/obj_config.yml"
MODEL_DIR = f"{REF}/src/physim_pose_estimation/models_visualization"
SCENE = f"{REF}/test-scene"

db = objectdb.load_object_db(OBJ_CONFIG, MODEL_DIR, cache_dir="/tmp/ppf_cache")
dirs = [SCENE] * args.scenes
cfg = DEFAULT_CONFIG

for rep in range(args.repeat):
    t0 = time.perf_counter()
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=min(8, len(dirs))) as pool:
        scs = list(pool.map(lambda sd: scene_mod.load_scene(sd, dataset="APC"), dirs))
    t_load = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = scene_sweep.prepare_scenes(dirs, db, dataset="APC", cfg=cfg, fetch_depth=False)
    # force any lazy device values that sweep_scenes would consume
    _ = float(np.asarray(out[0].table_pose)[0, 0])
    t_prep = time.perf_counter() - t0
    print(
        f"rep{rep}: load_scene(threaded x{args.scenes})={t_load:.3f}s  "
        f"full prepare_scenes={t_prep:.3f}s  ({t_prep/args.scenes*1000:.0f} ms/scene)"
    )

# One instrumented pass: time the internal stages by replicating them.
t = {}
t0 = time.perf_counter()
with ThreadPoolExecutor(max_workers=8) as pool:
    scs = list(pool.map(lambda sd: scene_mod.load_scene(sd, dataset="APC"), dirs))
t["png_decode"] = time.perf_counter() - t0

import jax.numpy as jnp
from physimglobalpose_tpu.geometry import depthio

t0 = time.perf_counter()
depth_np = np.stack([sc.depth for sc in scs])
raw16 = np.round(depth_np * depthio.DEPTH_SCALE)
exact = np.array_equal(
    raw16.astype(np.uint16).astype(np.float32) / depthio.DEPTH_SCALE, depth_np
)
t["codec_check"] = time.perf_counter() - t0

t0 = time.perf_counter()
dev16 = jax.device_put(raw16.astype(np.uint16))
dev16.block_until_ready()
_ = np.asarray(dev16[0, 0, 0])  # axon: force the transfer
t["depth_upload_u16"] = time.perf_counter() - t0

masks_np = np.stack([sc.class_mask for sc in scs]).astype(np.uint8)
t0 = time.perf_counter()
devm = jax.device_put(masks_np)
_ = np.asarray(devm[0, 0, 0])
t["mask_upload_u8"] = time.perf_counter() - t0

t0 = time.perf_counter()
depths = dev16.astype(jnp.float32) / depthio.DEPTH_SCALE
intrs = jnp.stack([jnp.asarray(sc.intrinsics) for sc in scs])
keys = jnp.stack([jax.random.split(jax.random.key(0))[0] for _ in scs])
dc, _pl, tp = jax.vmap(lambda d, i, k: scene_mod.remove_table(d, i, k, cfg))(
    depths, intrs, keys
)
tp_np = np.asarray(tp)
t["remove_table+fetch"] = time.perf_counter() - t0

print("stages:", {k: f"{v*1000:.0f} ms" for k, v in t.items()}, "exact_codec:", exact)
