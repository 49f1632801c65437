"""Animated / multi-view rendering: the render_video loop.

Counterpart of RenderPanel::render_video (reference: mainApp.cpp:868-915):
per frame, rebuild the scene at that frame's keyframe state, optionally
loop over a camera-array grid, render offline, save one image per
(frame, view) with the reference's naming scheme
(exportE<frame>[_vx_nX_vy_nY].jpg -> here .png).
"""

from __future__ import annotations

import os
from typing import Optional

from ..core import camera as cam_mod
from ..io import image as image_io
from ..scene import scene as scn
from .renderer import RenderConfig, Renderer


def render_video(objects, light_intensity, cam, cfg: RenderConfig,
                 nb_frames: int, out_dir: str = '.', prefix: str = 'exportE',
                 nbview_x: int = 1, nbview_y: int = 1,
                 max_spacing_x: float = 0.0, max_spacing_y: float = 0.0,
                 scene_kwargs: Optional[dict] = None):
    """Render nb_frames frames (x views); returns the list of file paths."""
    scene_kwargs = scene_kwargs or {}
    paths = []
    is_array = nbview_x * nbview_y > 1
    for frame in range(nb_frames):
        sc = scn.build_scene(objects, light_intensity, frame=float(frame),
                             **scene_kwargs)
        cams = (cam_mod.camera_array(cam, nbview_x, nbview_y,
                                     max_spacing_x, max_spacing_y)
                if is_array else [cam])
        for view, c in enumerate(cams):
            r = Renderer(sc, c, cfg).render()
            if is_array:
                vx, vy = view % nbview_x, view // nbview_x
                name = (f'{prefix}{frame}_{vx}_{nbview_x}_{vy}_{nbview_y}'
                        f'.png')
            else:
                name = f'{prefix}{frame}.png'
            path = os.path.join(out_dir, name)
            image_io.save_image(path, r.u8())
            paths.append(path)
    return paths
