"""Minimal binary glTF (.glb) writer for vertex-colored triangle meshes.

Replaces the reference's trimesh glb export (utils/utils.py:44-46:
`mesh.export(path, file_type='glb')`) without the trimesh dependency.
Produces a spec-conformant glTF 2.0 binary with POSITION, COLOR_0 and
indices; viewers (Blender, three.js, MeshLab) load it directly.
"""

from __future__ import annotations

import json
import struct

import numpy as np

_COMPONENT_F32 = 5126
_COMPONENT_U32 = 5125
_TARGET_ARRAY = 34962
_TARGET_ELEMENT = 34963


def _pad4(b: bytes, pad: bytes = b"\x00") -> bytes:
    return b + pad * ((4 - len(b) % 4) % 4)


def save_glb(
    path: str,
    verts: np.ndarray,
    faces: np.ndarray,
    colors: np.ndarray | None = None,
) -> None:
    """:param verts: [N, 3] float; :param faces: [M, 3] int;
    :param colors: [N, 3] float in [0, 1] (optional)."""
    verts = np.ascontiguousarray(verts, np.float32)
    idx = np.ascontiguousarray(faces.reshape(-1), np.uint32)

    bufs = [verts.tobytes(), idx.tobytes()]
    if colors is not None:
        bufs.append(np.ascontiguousarray(colors, np.float32).tobytes())

    views, accessors = [], []
    offset = 0
    # positions
    views.append({"buffer": 0, "byteOffset": offset, "byteLength": len(bufs[0]),
                  "target": _TARGET_ARRAY})
    accessors.append({
        "bufferView": 0, "componentType": _COMPONENT_F32, "count": len(verts),
        "type": "VEC3",
        "min": verts.min(0).tolist() if len(verts) else [0, 0, 0],
        "max": verts.max(0).tolist() if len(verts) else [0, 0, 0],
    })
    offset += len(_pad4(bufs[0]))
    # indices
    views.append({"buffer": 0, "byteOffset": offset, "byteLength": len(bufs[1]),
                  "target": _TARGET_ELEMENT})
    accessors.append({
        "bufferView": 1, "componentType": _COMPONENT_U32, "count": len(idx),
        "type": "SCALAR",
    })
    offset += len(_pad4(bufs[1]))

    attributes = {"POSITION": 0}
    if colors is not None:
        views.append({"buffer": 0, "byteOffset": offset, "byteLength": len(bufs[2]),
                      "target": _TARGET_ARRAY})
        accessors.append({
            "bufferView": 2, "componentType": _COMPONENT_F32,
            "count": len(verts), "type": "VEC3",
        })
        attributes["COLOR_0"] = 2

    gltf = {
        "asset": {"version": "2.0", "generator": "one2345_tpu"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": attributes, "indices": 1, "mode": 4}]}],
        "buffers": [{"byteLength": sum(len(_pad4(b)) for b in bufs)}],
        "bufferViews": views,
        "accessors": accessors,
    }

    json_chunk = _pad4(json.dumps(gltf, separators=(",", ":")).encode(), b" ")
    bin_chunk = b"".join(_pad4(b) for b in bufs)
    total = 12 + 8 + len(json_chunk) + 8 + len(bin_chunk)

    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))  # glTF magic
        f.write(struct.pack("<II", len(json_chunk), 0x4E4F534A))  # JSON
        f.write(json_chunk)
        f.write(struct.pack("<II", len(bin_chunk), 0x004E4942))  # BIN
        f.write(bin_chunk)


def load_glb(path: str):
    """Minimal reader for round-trip testing of our own GLBs."""
    with open(path, "rb") as f:
        magic, version, _ = struct.unpack("<III", f.read(12))
        assert magic == 0x46546C67 and version == 2
        jlen, jtype = struct.unpack("<II", f.read(8))
        gltf = json.loads(f.read(jlen))
        blen, btype = struct.unpack("<II", f.read(8))
        blob = f.read(blen)

    def read_accessor(i):
        acc = gltf["accessors"][i]
        view = gltf["bufferViews"][acc["bufferView"]]
        start = view["byteOffset"]
        data = blob[start : start + view["byteLength"]]
        dt = np.float32 if acc["componentType"] == _COMPONENT_F32 else np.uint32
        arr = np.frombuffer(data, dt)
        return arr.reshape(-1, 3) if acc["type"] == "VEC3" else arr

    prim = gltf["meshes"][0]["primitives"][0]
    verts = read_accessor(prim["attributes"]["POSITION"])
    faces = read_accessor(prim["indices"]).reshape(-1, 3)
    colors = (
        read_accessor(prim["attributes"]["COLOR_0"])
        if "COLOR_0" in prim["attributes"]
        else None
    )
    return verts, faces, colors
