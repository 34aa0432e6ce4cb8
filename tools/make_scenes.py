"""Generate the checked-in validation scenes (scenes/) as real .gltf files
plus render_option.json configs — the analogue of the reference's
HenjouRenderer/Model/test_gltf assets (SURVEY.md §4), authored by code so
the repo carries no opaque binaries."""

from __future__ import annotations

import base64
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from henjou_tpu.scene.testscenes import cornell_box_scene, sphere_gallery_scene

SCENES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scenes")


def scene_to_gltf(scene, name: str, camera=None, animated_node=None) -> dict:
    """SceneData -> glTF dict with one mesh primitive per material run and
    an embedded base64 buffer."""
    verts = scene.vertices.astype(np.float32)
    norms = scene.normals.astype(np.float32)
    tex = scene.texcoords.astype(np.float32)

    blob = verts.tobytes() + norms.tobytes() + tex.tobytes()
    buffer_views = [
        {"buffer": 0, "byteOffset": 0, "byteLength": verts.nbytes},
        {"buffer": 0, "byteOffset": verts.nbytes, "byteLength": norms.nbytes},
        {
            "buffer": 0,
            "byteOffset": verts.nbytes + norms.nbytes,
            "byteLength": tex.nbytes,
        },
    ]
    accessors = [
        {
            "bufferView": 0,
            "componentType": 5126,
            "count": len(verts),
            "type": "VEC3",
            "min": verts.min(0).tolist(),
            "max": verts.max(0).tolist(),
        },
        {"bufferView": 1, "componentType": 5126, "count": len(norms), "type": "VEC3"},
        {"bufferView": 2, "componentType": 5126, "count": len(tex), "type": "VEC2"},
    ]

    # primitives: group consecutive triangles by material id; indices are
    # sequential so ranges map to vertex ranges (the de-indexed layout)
    mat_ids = scene.material_ids
    prims = []
    start = 0
    for t in range(1, len(mat_ids) + 1):
        if t == len(mat_ids) or mat_ids[t] != mat_ids[start]:
            idx = np.arange(start * 3, t * 3, dtype=np.uint32)
            bv_id = len(buffer_views)
            acc_id = len(accessors)
            buffer_views.append(
                {"buffer": 0, "byteOffset": len(blob), "byteLength": idx.nbytes}
            )
            blob += idx.tobytes()
            accessors.append(
                {
                    "bufferView": bv_id,
                    "componentType": 5125,
                    "count": len(idx),
                    "type": "SCALAR",
                }
            )
            prims.append(
                {
                    "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                    "indices": acc_id,
                    "material": int(mat_ids[start]),
                }
            )
            start = t

    materials = []
    for m in scene.materials:
        ext = {}
        if m["transmission"] > 0:
            ext["KHR_materials_transmission"] = {
                "transmissionFactor": float(m["transmission"])
            }
        if m["ior"] != 1.0:
            ext["KHR_materials_ior"] = {"ior": float(m["ior"])}
        if m["clearcoat"] > 0:
            ext["KHR_materials_clearcoat"] = {"clearcoatFactor": float(m["clearcoat"])}
        if m["sheen"] > 0:
            ext["KHR_materials_sheen"] = {"sheenRoughnessFactor": float(m["sheen"])}
        if m["is_thinfilm"]:
            ext["ThinFilm"] = {"is_ThinFilm": True}
        em = np.asarray(m["emission"], np.float32)
        strength = float(em.max()) if em.max() > 1.0 else 1.0
        gm = {
            "name": m["name"],
            "pbrMetallicRoughness": {
                "baseColorFactor": [*map(float, m["base_color"]), 1.0],
                "roughnessFactor": float(m["roughness"]),
                "metallicFactor": float(m["metallic"]),
            },
            "emissiveFactor": (em / strength).clip(0, 1).tolist(),
        }
        if strength > 1.0:
            ext["KHR_materials_emissive_strength"] = {"emissiveStrength": strength}
        if ext:
            gm["extensions"] = ext
        materials.append(gm)

    doc = {
        "asset": {"version": "2.0", "generator": "henjou_tpu make_scenes"},
        "buffers": [
            {
                "byteLength": len(blob),
                "uri": "data:application/octet-stream;base64,"
                + base64.b64encode(blob).decode(),
            }
        ],
        "bufferViews": buffer_views,
        "accessors": accessors,
        "meshes": [{"primitives": prims}],
        "materials": materials,
        "nodes": [{"mesh": 0, "name": name}],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
    }
    if animated_node:
        doc["animations"] = [animated_node]
    return doc


def render_option(name, gltf_name, w, h, spp, cam_pos, cam_dir, sky, fov=45.0,
                  integrator="mis"):
    return {
        "Image": {
            "image_width": w,
            "image_height": h,
            "image_name": name,
            "image_directory": "./",
            "max_spp": spp,
        },
        "Render_mode": "Default",
        "GLTF_file": {"gltf_filepath": "./scenes/", "gltf_filename": gltf_name},
        "Camera": {
            "allow_camera_animation": False,
            "camera_position": list(cam_pos),
            "camera_direction": list(cam_dir),
            "camera_fov": fov,
        },
        "PTX_File": {"ptxfile_path": "(unused on TPU)"},
        "Animation": {"fps": 24, "start_frame": 0, "end_frame": 1, "time_limit": 5.0},
        "Sky": {
            "IBL_path": "",
            "IBL_intensity": 1.0,
            "use_IBL": False,
            "scene_sky_default": list(sky),
        },
        "Option": {"use_date": False, "save_renderOption": False},
        "LUT": {"LUT_path": ""},
        "TPU": {"spp_batch": 16, "integrator": integrator},
    }


def main():
    os.makedirs(SCENES, exist_ok=True)
    cornell = cornell_box_scene()
    with open(os.path.join(SCENES, "cornelbox.gltf"), "w") as f:
        json.dump(scene_to_gltf(cornell, "cornelbox"), f)
    with open(os.path.join(SCENES, "cornelbox_option.json"), "w") as f:
        json.dump(
            render_option(
                "cornell", "cornelbox.gltf", 256, 256, 64,
                (0, 0, -4.5), (0, 0, 1), (0, 0, 0),
            ),
            f,
            indent=2,
        )

    gallery = sphere_gallery_scene()
    with open(os.path.join(SCENES, "sphere_gallery.gltf"), "w") as f:
        json.dump(scene_to_gltf(gallery, "gallery"), f)
    with open(os.path.join(SCENES, "sphere_gallery_option.json"), "w") as f:
        json.dump(
            render_option(
                "gallery", "sphere_gallery.gltf", 512, 288, 128,
                (0.0, 1.2, -9.0), (0.0, -0.05, 1.0), (0.3, 0.4, 0.55),
            ),
            f,
            indent=2,
        )
    print("wrote scenes to", SCENES)


if __name__ == "__main__":
    main()
