"""Host image I/O (the reference's stb/CImg/hdr stack, utils.h:17-18,
hdrwriter.h:5, via PIL/numpy on the TPU host)."""

from __future__ import annotations

import numpy as np


def save_image(path: str, u8_image: np.ndarray):
    """Save (H,W,3) uint8 (reference save_image, utils.cpp:178)."""
    from PIL import Image
    Image.fromarray(np.asarray(u8_image)).save(path)


def load_image(path: str) -> np.ndarray:
    """Load as (H,W,3) float32 in [0,255] raw values (reference load_image)."""
    from PIL import Image
    return np.asarray(Image.open(path).convert('RGB'), np.float32)


def load_hdr(path: str) -> np.ndarray:
    """Radiance .hdr loader (reference hdrloader.h:19) -> (H,W,3) float32.

    Minimal RLE-capable parser; PIL lacks native HDR support.
    """
    with open(path, 'rb') as f:
        data = f.read()
    # header
    if not (data.startswith(b'#?RADIANCE') or data.startswith(b'#?RGBE')):
        raise ValueError('not a Radiance HDR file')
    pos = data.find(b'\n\n')
    header_end = pos + 2
    dims = data[header_end:data.find(b'\n', header_end)].split()
    # "-Y H +X W"
    h = int(dims[1])
    w = int(dims[3])
    pos = data.find(b'\n', header_end) + 1

    rgbe = np.zeros((h, w, 4), np.uint8)
    for y in range(h):
        if (pos + 4 <= len(data) and data[pos] == 2 and data[pos + 1] == 2
                and ((data[pos + 2] << 8) | data[pos + 3]) == w):
            # adaptive RLE scanline
            pos += 4
            for c in range(4):
                x = 0
                while x < w:
                    count = data[pos]
                    pos += 1
                    if count > 128:  # run
                        rgbe[y, x:x + count - 128, c] = data[pos]
                        pos += 1
                        x += count - 128
                    else:            # literal
                        rgbe[y, x:x + count, c] = np.frombuffer(
                            data, np.uint8, count, pos)
                        pos += count
                        x += count
        else:
            # flat scanline
            row = np.frombuffer(data, np.uint8, w * 4, pos).reshape(w, 4)
            rgbe[y] = row
            pos += w * 4

    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp > 0, np.ldexp(1.0, exp - 136), 0.0).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * scale[..., None]
