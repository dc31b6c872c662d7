"""Generate synthetic evaluation scenes with exact ground-truth poses.

The bundled reference scene carries no GT object poses, so accuracy parity
(ADD/ADD-S) needs scenes where truth is known by construction: an object
mesh from the reference's model set is rendered (the framework's own
triangle rasterizer) above a synthetic table plane; depth/mask/gt_info.yml
are written in the reference's scene layout so pipeline/evaluate.py can
sweep them.

Usage:
  python scripts/make_synthetic_scenes.py --out /tmp/synth_scenes --n 4 \
      --object kleenex_tissue_box
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--object", default="kleenex_tissue_box")
    p.add_argument(
        "--model-dir",
        default="/root/reference/src/physim_pose_estimation/models_visualization",
    )
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--table-z", type=float, default=0.8)
    args = p.parse_args(argv)

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from scipy.spatial.transform import Rotation

    from physimglobalpose_tpu.geometry import depthio
    from physimglobalpose_tpu.models import assets
    from physimglobalpose_tpu.ops import raster_tri

    intr = np.array(
        [[613.998, 0.0, 320.0], [0.0, 613.998, 240.0], [0.0, 0.0, 1.0]], np.float32
    )
    h, w = 480, 640
    # Camera 'table_z' meters above the world table plane, looking straight
    # down: world gravity (-z) then points INTO the observed surface, so the
    # physics-aware verification stage is meaningful. camera-to-world:
    # x_cam -> +x, y_cam -> -y, z_cam -> -z (right-handed).
    cam_height = 1.5
    cam_pose = np.array(
        [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, cam_height], [0, 0, 0, 1]],
        np.float32,
    )
    table_z_world = cam_height - args.table_z
    mesh = assets.load_mesh(os.path.join(args.model_dir, args.object + ".ply"))
    mesh = assets.decimate_to_max_faces(mesh, 4000)
    half_height = (mesh.vertices[:, 2].max() - mesh.vertices[:, 2].min()) / 2

    rng = np.random.default_rng(0)
    for k in range(args.n):
        rot = Rotation.from_euler(
            "xyz", [0, 0, rng.uniform(0, 360)], degrees=True
        ).as_matrix().astype(np.float32)
        t = np.array(
            [rng.uniform(-0.08, 0.08), rng.uniform(-0.06, 0.06),
             args.table_z - half_height - 0.001],
            np.float32,
        )
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = rot
        pose[:3, 3] = t

        depth_obj = np.asarray(
            raster_tri.render_mesh_depth(
                jnp.asarray(pose), jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
                jnp.ones(len(mesh.faces), bool), jnp.asarray(intr), h, w,
            )
        )
        # Synthetic fronto-parallel table plane at table_z fills the background.
        depth = np.where(depth_obj > 0, depth_obj, np.float32(args.table_z))
        mask = np.where(depth_obj > 0, 8, 0).astype(np.uint16)  # kleenex classId=8

        sd = os.path.join(args.out, f"scene_{k:04d}")
        os.makedirs(sd, exist_ok=True)
        # APC layout stores depth bit-rotated (load_scene decodes with
        # rot-left-13 for dataset="APC").
        depthio.write_depth_png(
            os.path.join(sd, "frame-000000.depth.png"), depth, bit_rotated=True
        )
        from PIL import Image

        Image.fromarray(mask).save(os.path.join(sd, "frame-000000.mask.png"))
        Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(
            os.path.join(sd, "frame-000000.color.png")
        )
        pose_world = cam_pose @ pose
        t_w = pose_world[:3, 3]
        q = Rotation.from_matrix(pose_world[:3, :3]).as_quat()  # [x,y,z,w]
        with open(os.path.join(sd, "gt_info.yml"), "w") as fh:
            fh.write(
                "camera:\n"
                "  camera_pose: [0, 0, 1.5, 0, 1, 0, 0]\n"
                f"  camera_intrinsics: [[{intr[0,0]}, 0.0, {intr[0,2]}],"
                f"[0.0, {intr[1,1]}, {intr[1,2]}],[0.0, 0.0, 1.0]]\n"
                "rest_surface:\n"
                "  type: table\n"
                f"  surface_pose: [0, 0, {table_z_world}, 1, 0, 0, 0]\n"
                "scene:\n"
                "  num_objects: 1\n"
                "  object_1:\n"
                f"    name: '{args.object}'\n"
                f"    pose: [{t_w[0]}, {t_w[1]}, {t_w[2]}, {q[3]}, {q[0]}, {q[1]}, {q[2]}]\n"
            )
        print(f"wrote {sd}")


if __name__ == "__main__":
    main()
