"""pathtracer_tpu — a TPU-native differentiable path tracer in JAX/Pallas.

Brand-new framework reproducing the capabilities of nbonneel/pathtracer
(C++/OpenMP/Embree CPU path tracer) with an idiomatic TPU design:
wavefront path tracing over SoA ray arrays, Pallas BVH kernels, pjit/
shard_map multi-chip sharding, and detached-sampling differentiability.
See SURVEY.md at the repo root for the reference structural analysis.
"""

from .core.camera import Camera, make_camera, rotate_camera_np
from .io.obj import load_mesh
from .render.renderer import RenderConfig, Renderer
from .scene.scene import (SceneArrays, build_scene, default_light_intensity,
                          default_objects, mesh_object, plane, sphere)

__all__ = [
    'Camera', 'make_camera', 'rotate_camera_np',
    'RenderConfig', 'Renderer', 'load_mesh',
    'SceneArrays', 'build_scene', 'default_light_intensity',
    'default_objects', 'mesh_object', 'plane', 'sphere',
]

__version__ = '0.1.0'
