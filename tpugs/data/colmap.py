"""COLMAP sparse-reconstruction binary loader (numpy).

Parses cameras.bin / images.bin / points3D.bin (little-endian) — behavioral
equivalent of reference src/data/colmap_loader.cpp:43-282, rebuilt on
numpy buffer slicing instead of byte-at-a-time stream reads.
"""
from __future__ import annotations

import dataclasses
import os
import struct
from typing import Dict, List, Tuple

import numpy as np

from tpugs.core.camera import CameraInfo, CameraModel, qvec_to_rotmat

# model_id -> number of double params (COLMAP convention).
_MODEL_NUM_PARAMS = {
    CameraModel.SIMPLE_PINHOLE: 3,  # f, cx, cy
    CameraModel.PINHOLE: 4,  # fx, fy, cx, cy
    CameraModel.SIMPLE_RADIAL: 4,  # f, cx, cy, k
    CameraModel.RADIAL: 5,  # f, cx, cy, k1, k2
    CameraModel.OPENCV: 8,  # fx, fy, cx, cy, k1, k2, p1, p2
}


@dataclasses.dataclass
class ColmapCamera:
    camera_id: int
    model: CameraModel
    width: int
    height: int
    params: np.ndarray  # double params, model-dependent


@dataclasses.dataclass
class ColmapImage:
    image_id: int
    qvec: np.ndarray  # (w, x, y, z)
    tvec: np.ndarray  # (3,)
    camera_id: int
    name: str


@dataclasses.dataclass
class SparsePoint:
    xyz: np.ndarray
    rgb: np.ndarray  # uint8


USE_NATIVE = os.environ.get("TPUGS_NATIVE", "1") != "0"


def _native():
    if not USE_NATIVE:
        return None
    from tpugs.data import native

    return native if native.available() else None


def parse_cameras_bin(path: str) -> Dict[int, ColmapCamera]:
    """reference: colmap_loader.cpp:43-73."""
    nat = _native()
    if nat is not None:
        rec = nat.parse_cameras(path)
        if rec is not None:
            cams = {}
            for row in rec:
                model = CameraModel(int(row[1]))
                np_params = _MODEL_NUM_PARAMS[model]
                cams[int(row[0])] = ColmapCamera(
                    int(row[0]), model, int(row[2]), int(row[3]),
                    row[4 : 4 + np_params].copy(),
                )
            return cams
    cams: Dict[int, ColmapCamera] = {}
    with open(path, "rb") as f:
        buf = f.read()
    (num,) = struct.unpack_from("<Q", buf, 0)
    off = 8
    for _ in range(num):
        cam_id, model_id = struct.unpack_from("<ii", buf, off)
        off += 8
        w, h = struct.unpack_from("<QQ", buf, off)
        off += 16
        model = CameraModel(model_id)
        np_params = _MODEL_NUM_PARAMS[model]
        params = np.frombuffer(buf, "<f8", count=np_params, offset=off).copy()
        off += 8 * np_params
        cams[cam_id] = ColmapCamera(cam_id, model, int(w), int(h), params)
    return cams


def parse_images_bin(path: str) -> List[ColmapImage]:
    """reference: colmap_loader.cpp:79-125 (2D observations skipped)."""
    nat = _native()
    if nat is not None:
        res = nat.parse_images(path)
        if res is not None:
            rec, names = res
            return [
                ColmapImage(
                    int(rec[i, 0]), rec[i, 1:5].copy(), rec[i, 5:8].copy(),
                    int(rec[i, 8]), names[i],
                )
                for i in range(rec.shape[0])
            ]
    images: List[ColmapImage] = []
    with open(path, "rb") as f:
        buf = f.read()
    (num,) = struct.unpack_from("<Q", buf, 0)
    off = 8
    for _ in range(num):
        (image_id,) = struct.unpack_from("<i", buf, off)
        off += 4
        q = np.frombuffer(buf, "<f8", count=4, offset=off).copy()
        off += 32
        t = np.frombuffer(buf, "<f8", count=3, offset=off).copy()
        off += 24
        (camera_id,) = struct.unpack_from("<i", buf, off)
        off += 4
        end = buf.index(b"\x00", off)
        name = buf[off:end].decode("utf-8")
        off = end + 1
        (num_p2d,) = struct.unpack_from("<Q", buf, off)
        off += 8 + int(num_p2d) * 24  # skip (x, y, point3D_id) triples
        images.append(ColmapImage(image_id, q, t, camera_id, name))
    return images


def parse_points3d_bin(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """-> (xyz [N,3] float64, rgb [N,3] uint8). Tracks skipped
    (reference: colmap_loader.cpp:131-177)."""
    nat = _native()
    if nat is not None:
        res = nat.parse_points3d(path)
        if res is not None:
            return res
    with open(path, "rb") as f:
        buf = f.read()
    (num,) = struct.unpack_from("<Q", buf, 0)
    off = 8
    xyz = np.empty((num, 3), np.float64)
    rgb = np.empty((num, 3), np.uint8)
    for i in range(num):
        off += 8  # point3D_id
        xyz[i] = np.frombuffer(buf, "<f8", count=3, offset=off)
        off += 24
        rgb[i] = np.frombuffer(buf, "u1", count=3, offset=off)
        off += 3
        off += 8  # reprojection error
        (track_len,) = struct.unpack_from("<Q", buf, off)
        off += 8 + int(track_len) * 8
    return xyz, rgb


def parse_colmap_sparse(sparse_dir: str):
    """Parse the three bins from a COLMAP sparse dir
    (reference: colmap_loader.cpp:183-193)."""
    cams = parse_cameras_bin(os.path.join(sparse_dir, "cameras.bin"))
    images = parse_images_bin(os.path.join(sparse_dir, "images.bin"))
    xyz, rgb = parse_points3d_bin(os.path.join(sparse_dir, "points3D.bin"))
    return cams, images, xyz, rgb


def _intrinsics_from_params(model: CameraModel, params: np.ndarray):
    """(fx, fy, cx, cy) per model; distortion params ignored
    (reference: colmap_loader.cpp:199-282)."""
    if model == CameraModel.SIMPLE_PINHOLE:
        f, cx, cy = params[:3]
        return f, f, cx, cy
    if model == CameraModel.PINHOLE:
        fx, fy, cx, cy = params[:4]
        return fx, fy, cx, cy
    if model in (CameraModel.SIMPLE_RADIAL, CameraModel.RADIAL):
        f, cx, cy = params[:3]
        return f, f, cx, cy
    if model == CameraModel.OPENCV:
        fx, fy, cx, cy = params[:4]
        return fx, fy, cx, cy
    raise ValueError(f"unsupported camera model {model}")


def merge_cameras_images(
    cams: Dict[int, ColmapCamera], images: List[ColmapImage]
) -> List[CameraInfo]:
    """Join images with their cameras into posed CameraInfo records."""
    out: List[CameraInfo] = []
    for im in images:
        cam = cams[im.camera_id]
        fx, fy, cx, cy = _intrinsics_from_params(cam.model, cam.params)
        out.append(
            CameraInfo(
                image_name=im.name,
                width=cam.width,
                height=cam.height,
                fx=float(fx),
                fy=float(fy),
                cx=float(cx),
                cy=float(cy),
                R=qvec_to_rotmat(im.qvec),
                t=im.tvec.astype(np.float64),
                camera_id=im.camera_id,
            )
        )
    return out
