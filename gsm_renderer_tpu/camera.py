"""Camera parameter types and projection-matrix helpers.

TPU-native equivalents of ``CameraParams`` / ``StereoCameraParams`` / ``CameraUniforms``
(reference: Sources/Renderer/Shared/GaussianRendererProtocol.swift:28-67,
BridgingTypes.h:22-39, 163-206).  Matrices follow the standard math convention
``clip = proj @ view @ [x, y, z, 1]^T``; both the OpenCV (+Z forward) and OpenGL
(-Z forward) conventions are supported — visibility is decided Z-sign-agnostically
via ``clip.w > near`` exactly like the reference (GaussianShared.h:199-234).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax.numpy as jnp
import numpy as np


Array = Any


@dataclasses.dataclass
class CameraParams:
    """Per-eye camera: view/projection matrices plus derived metadata.

    ``view_matrix`` and ``projection_matrix`` are (4, 4) float32 arrays.
    ``position`` is the world-space camera center used for SH view direction.
    """

    view_matrix: Array
    projection_matrix: Array
    position: Array  # (3,)
    focal_x: float = 0.0
    focal_y: float = 0.0
    near_plane: float = 0.1
    far_plane: float = 100.0

    def astuple_jax(self):
        """Device copies of (view, proj, position), cached per value.

        Renderers call this every frame; without the cache each call uploads
        three small arrays (a per-frame host->device round trip that costs
        real milliseconds on tunneled backends).  The cache keys on the raw
        bytes so mutating the matrices invalidates it."""
        key = (np.asarray(self.view_matrix, np.float32).tobytes(),
               np.asarray(self.projection_matrix, np.float32).tobytes(),
               np.asarray(self.position, np.float32).tobytes())
        cached = self.__dict__.get("_jax_cache")
        if cached is not None and cached[0] == key:
            return cached[1]
        vals = (
            jnp.asarray(self.view_matrix, jnp.float32),
            jnp.asarray(self.projection_matrix, jnp.float32),
            jnp.asarray(self.position, jnp.float32),
        )
        self.__dict__["_jax_cache"] = (key, vals)
        return vals


@dataclasses.dataclass
class StereoCameraParams:
    """Dual-eye camera (reference: GaussianRendererProtocol.swift:56-67)."""

    left: CameraParams
    right: CameraParams
    scene_transform: Array | None = None  # (4, 4) world -> scene

    def astuple_jax(self):
        """Device copies of (views (2,4,4), projs (2,4,4), centers (2,3),
        scene_transform (4,4)), cached per value like CameraParams."""
        st = (np.eye(4, dtype=np.float32) if self.scene_transform is None
              else np.asarray(self.scene_transform, np.float32))
        key = (np.asarray(self.left.view_matrix, np.float32).tobytes(),
               np.asarray(self.right.view_matrix, np.float32).tobytes(),
               np.asarray(self.left.projection_matrix, np.float32).tobytes(),
               np.asarray(self.right.projection_matrix, np.float32).tobytes(),
               np.asarray(self.left.position, np.float32).tobytes(),
               np.asarray(self.right.position, np.float32).tobytes(),
               st.tobytes())
        cached = self.__dict__.get("_jax_cache")
        if cached is not None and cached[0] == key:
            return cached[1]
        vals = (
            jnp.asarray(np.stack([
                np.asarray(self.left.view_matrix, np.float32),
                np.asarray(self.right.view_matrix, np.float32)])),
            jnp.asarray(np.stack([
                np.asarray(self.left.projection_matrix, np.float32),
                np.asarray(self.right.projection_matrix, np.float32)])),
            jnp.asarray(np.stack([
                np.asarray(self.left.position, np.float32),
                np.asarray(self.right.position, np.float32)])),
            jnp.asarray(st),
        )
        self.__dict__["_jax_cache"] = (key, vals)
        return vals


def make_projection_matrix(
    width: int,
    height: int,
    near: float = 0.1,
    far: float = 10.0,
    fov_degrees: float = 60.0,
    convention: str = "opencv",
) -> np.ndarray:
    """Perspective projection matrix matching the reference test harness.

    Reference behavior: Tests/RendererTests/TestUtils.swift:36-74 (Metal NDC with
    z in [0, 1]; OpenCV +Z forward or OpenGL -Z forward).
    """
    aspect = width / height
    f = 1.0 / math.tan(math.radians(fov_degrees) / 2.0)
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = f / aspect
    proj[1, 1] = f
    if convention == "opencv":
        proj[2, 2] = far / (far - near)
        proj[2, 3] = -(far * near) / (far - near)
        proj[3, 2] = 1.0
    elif convention == "opengl":
        proj[2, 2] = far / (near - far)
        proj[2, 3] = (far * near) / (near - far)
        proj[3, 2] = -1.0
    else:
        raise ValueError(f"unknown convention {convention!r}")
    return proj


def make_look_at(eye, target, up=(0.0, 1.0, 0.0), convention: str = "opencv") -> np.ndarray:
    """View matrix looking from ``eye`` toward ``target``."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    if convention == "opencv":
        zaxis = fwd
    else:
        zaxis = -fwd
    xaxis = np.cross(up, zaxis)
    n = np.linalg.norm(xaxis)
    if n < 1e-8:
        xaxis = np.array([1.0, 0.0, 0.0])
    else:
        xaxis = xaxis / n
    yaxis = np.cross(zaxis, xaxis)
    view = np.eye(4, dtype=np.float64)
    view[0, :3] = xaxis
    view[1, :3] = yaxis
    view[2, :3] = zaxis
    view[:3, 3] = -view[:3, :3] @ eye
    return view.astype(np.float32)


def make_camera(
    width: int,
    height: int,
    position=(0.0, 0.0, 0.0),
    view_matrix: np.ndarray | None = None,
    near: float = 0.1,
    far: float = 10.0,
    fov_degrees: float = 60.0,
    convention: str = "opencv",
) -> CameraParams:
    """CameraParams factory mirroring the reference test helper (TestUtils.swift:77-97)."""
    if view_matrix is None:
        view_matrix = np.eye(4, dtype=np.float32)
    aspect = width / height
    f = 1.0 / math.tan(math.radians(fov_degrees) / 2.0)
    proj = make_projection_matrix(width, height, near, far, fov_degrees, convention)
    return CameraParams(
        view_matrix=np.asarray(view_matrix, np.float32),
        projection_matrix=proj,
        position=np.asarray(position, np.float32),
        focal_x=width * f / (2 * aspect),
        focal_y=height * f / 2,
        near_plane=near,
        far_plane=far,
    )


def make_side_by_side_stereo(
    camera: CameraParams, ipd: float = 0.063
) -> StereoCameraParams:
    """Derive a side-by-side stereo rig from a mono camera by shifting +-ipd/2 along
    the view-space X axis (reference: DepthFirstRenderer.swift:469-512 derives the
    stereo configuration from the mono camera for .sideBySide)."""
    view = np.asarray(camera.view_matrix, np.float32)
    shift_l = np.eye(4, dtype=np.float32)
    shift_l[0, 3] = ipd / 2.0
    shift_r = np.eye(4, dtype=np.float32)
    shift_r[0, 3] = -ipd / 2.0
    rot = view[:3, :3]
    # camera world position from view matrix: -R^T t
    base_pos = -rot.T @ view[:3, 3]
    right_axis = rot.T @ np.array([1.0, 0.0, 0.0], np.float32)
    left = dataclasses.replace(
        camera,
        view_matrix=shift_l @ view,
        position=(base_pos - right_axis * (ipd / 2.0)).astype(np.float32),
    )
    right = dataclasses.replace(
        camera,
        view_matrix=shift_r @ view,
        position=(base_pos + right_axis * (ipd / 2.0)).astype(np.float32),
    )
    return StereoCameraParams(left=left, right=right)
