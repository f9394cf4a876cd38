"""Camera: matrices + eye-ray generation parameters.

Mirrors RenderDriverRTE::CalcCameraMatrices (RenderDriverRTE.cpp:1301) —
lookAt world-view + perspective projection, with the inverse matrices used
by eye-ray generation (screen.cl MakeEyeRays* semantics) and DOF lens
sampling. Device code receives a small pytree of matrices.
"""
from __future__ import annotations

import numpy as np
from flax import struct

from hydracore_tpu.scene.statefile import CameraDesc
from hydracore_tpu.utils.math3d import np_look_at, np_perspective


@struct.dataclass
class CameraParams:
    pos: np.ndarray  # (3,)
    mWorldViewInv: np.ndarray  # (4,4) view -> world
    mProjInv: np.ndarray  # (4,4)
    lens_radius: np.ndarray  # scalar f32
    focal_dist: np.ndarray  # scalar f32
    width: int = struct.field(pytree_node=False, default=512)
    height: int = struct.field(pytree_node=False, default=512)


def build_camera(desc: CameraDesc, width: int, height: int) -> CameraParams:
    view = np_look_at(desc.position, desc.look_at, desc.up)
    proj = np_perspective(desc.fov, float(width) / float(height), desc.near, desc.far)
    focal = desc.focal_dist
    if focal <= 0.0:
        focal = float(np.linalg.norm(desc.look_at - desc.position))
    lens_r = desc.dof_lens_radius if desc.enable_dof else 0.0
    return CameraParams(
        pos=np.asarray(desc.position, np.float32),
        mWorldViewInv=np.linalg.inv(view).astype(np.float32),
        mProjInv=np.linalg.inv(proj).astype(np.float32),
        lens_radius=np.float32(lens_r),
        focal_dist=np.float32(focal),
        width=width,
        height=height,
    )
