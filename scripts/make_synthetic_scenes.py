"""Generate synthetic evaluation scenes with exact ground-truth poses.

The bundled reference scene carries no GT object poses, so accuracy parity
(ADD/ADD-S) needs scenes where truth is known by construction: object
meshes from the reference's model set are rendered (the framework's own
triangle rasterizer, z-min composited) above a synthetic table plane;
depth/mask/gt_info.yml are written in the reference's scene layout so
pipeline/evaluate.py can sweep them. Mask class ids come from the
reference's obj_config.yml, and multi-object scenes place every listed
object at a non-overlapping slot with a random yaw (resting upright, like
the reference's APC shelf captures).

Usage:
  python scripts/make_synthetic_scenes.py --out /tmp/synth_scenes --n 8 \
      --objects kleenex_tissue_box,expo_dry_erase_board_eraser,folgers_classic_roast_coffee
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--object", default=None,
                   help="single object (back-compat alias for --objects)")
    p.add_argument("--objects", default="kleenex_tissue_box",
                   help="comma-separated object names, all placed per scene")
    p.add_argument(
        "--model-dir",
        default="/root/reference/src/physim_pose_estimation/models_visualization",
    )
    p.add_argument(
        "--obj-config",
        default="/root/reference/src/physim_pose_estimation/src/data_layer/"
                "obj_config.yml",
        help="reference object config (mask class ids)",
    )
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--dataset", default="APC", choices=["APC", "YCB"],
                   help="scene layout codec: APC stores depth bit-rotated, "
                        "YCB plain (pass the matching obj-config, e.g. "
                        "obj_config_ycb.yml for YCB class ids)")
    p.add_argument("--table-z", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--stack", action="store_true",
                   help="place the SECOND object resting ON the first "
                        "(gt_info dependency_order semantics - the paper's "
                        "stacked-scene case); remaining objects rest on the "
                        "table at side slots")
    args = p.parse_args(argv)
    names = (args.object or args.objects).split(",")

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml
    from scipy.spatial.transform import Rotation

    from physimglobalpose_tpu.geometry import depthio
    from physimglobalpose_tpu.models import assets
    from physimglobalpose_tpu.models.objectdb import _find_mesh
    from physimglobalpose_tpu.ops import raster_tri

    # Mask class ids from the reference's obj_config.yml (objectdb schema).
    with open(args.obj_config) as fh:
        objcfg = yaml.safe_load(fh)["objects"]
    class_ids = {
        objcfg[f"object_{i}"]["name"]: int(objcfg[f"object_{i}"]["classId"])
        for i in range(1, int(objcfg["num_objects"]) + 1)
    }

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

    meshes, half_heights = {}, {}
    for name in names:
        mesh = assets.load_mesh(_find_mesh(args.model_dir, name))
        meshes[name] = assets.decimate_to_max_faces(mesh, 4000)
        v = meshes[name].vertices
        half_heights[name] = (v[:, 2].max() - v[:, 2].min()) / 2

    # Non-overlapping XY slots: fixed grid cells jittered per scene. The
    # bundled meshes span <= ~12 cm, so 16 cm cell pitch keeps footprints
    # apart without physics.
    pitch = 0.16
    cols = int(np.ceil(np.sqrt(len(names))))
    slots = [
        np.array([(i % cols - (cols - 1) / 2) * pitch,
                  (i // cols - (max(1, (len(names) + cols - 1) // cols) - 1) / 2)
                  * pitch])
        for i in range(len(names))
    ]

    rng = np.random.default_rng(args.seed)
    for k in range(args.n):
        order = rng.permutation(len(names))
        depth = np.full((h, w), np.float32(args.table_z))
        mask = np.zeros((h, w), np.uint16)
        gt_entries = []
        base_xy = None
        for idx, name in enumerate(names):
            slot = slots[order[idx]]
            rot = Rotation.from_euler(
                "xyz", [0, 0, rng.uniform(0, 360)], degrees=True
            ).as_matrix().astype(np.float32)
            if args.stack and idx == 0:
                # Stack base: centered slot (the top object must stay inside
                # its footprint).
                base_xy = np.array([rng.uniform(-0.02, 0.02),
                                    rng.uniform(-0.02, 0.02)])
                t = np.array(
                    [base_xy[0], base_xy[1],
                     args.table_z - half_heights[name] - 0.001],
                    np.float32,
                )
            elif args.stack and idx == 1:
                # Rests ON the base: bottom at the base's top surface
                # (camera depth decreases upward), xy jittered ~1 cm inside
                # the base's footprint. Ground truth is physically
                # consistent by construction - the dependent-placement case
                # the sequential-settle search exists for (gt_info.yml
                # dependency_order in the reference's own scenes).
                t = np.array(
                    [base_xy[0] + rng.uniform(-0.01, 0.01),
                     base_xy[1] + rng.uniform(-0.01, 0.01),
                     args.table_z - 2 * half_heights[names[0]]
                     - half_heights[name] - 0.002],
                    np.float32,
                )
            else:
                # In stack mode the side slots widen 1.5x so they clear the
                # centered stack's footprint.
                s = slot * (1.5 if args.stack else 1.0)
                t = np.array(
                    [s[0] + rng.uniform(-0.02, 0.02),
                     s[1] + rng.uniform(-0.02, 0.02),
                     args.table_z - half_heights[name] - 0.001],
                    np.float32,
                )
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = rot
            pose[:3, 3] = t
            mesh = meshes[name]
            depth_obj = np.asarray(
                raster_tri.render_mesh_depth(
                    jnp.asarray(pose), jnp.asarray(mesh.vertices),
                    jnp.asarray(mesh.faces),
                    jnp.ones(len(mesh.faces), bool), jnp.asarray(intr), h, w,
                )
            )
            # z-min composite: closer surfaces win pixel ownership.
            closer = (depth_obj > 0) & (depth_obj < depth)
            depth = np.where(closer, depth_obj, depth)
            mask = np.where(closer, np.uint16(class_ids[name]), mask)
            gt_entries.append((name, pose))

        sd = os.path.join(args.out, f"scene_{k:04d}")
        os.makedirs(sd, exist_ok=True)
        # APC layout stores depth bit-rotated (load_scene decodes with
        # rot-left-13 for dataset="APC"); YCB stores plain millimeters.
        depthio.write_depth_png(
            os.path.join(sd, "frame-000000.depth.png"), depth,
            bit_rotated=(args.dataset == "APC"),
        )
        from PIL import Image

        Image.fromarray(mask).save(os.path.join(sd, "frame-000000.mask.png"))
        Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(
            os.path.join(sd, "frame-000000.color.png")
        )
        lines = [
            "camera:\n",
            "  camera_pose: [0, 0, 1.5, 0, 1, 0, 0]\n",
            f"  camera_intrinsics: [[{intr[0,0]}, 0.0, {intr[0,2]}],"
            f"[0.0, {intr[1,1]}, {intr[1,2]}],[0.0, 0.0, 1.0]]\n",
            "rest_surface:\n",
            "  type: table\n",
            f"  surface_pose: [0, 0, {table_z_world}, 1, 0, 0, 0]\n",
            "scene:\n",
            f"  num_objects: {len(gt_entries)}\n",
        ]
        for i, (name, pose) in enumerate(gt_entries, start=1):
            pose_world = cam_pose @ pose
            t_w = pose_world[:3, 3]
            q = Rotation.from_matrix(pose_world[:3, :3]).as_quat()  # [x,y,z,w]
            lines += [
                f"  object_{i}:\n",
                f"    name: '{name}'\n",
                f"    pose: [{t_w[0]}, {t_w[1]}, {t_w[2]}, "
                f"{q[3]}, {q[0]}, {q[1]}, {q[2]}]\n",
            ]
        with open(os.path.join(sd, "gt_info.yml"), "w") as fh:
            fh.writelines(lines)
        print(f"wrote {sd} ({len(gt_entries)} objects)")


if __name__ == "__main__":
    main()
