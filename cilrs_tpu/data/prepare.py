"""Offline dataset preparation: resize raw frames to the network resolution.

Capability parity with prepare_dataset.py (reference: cv2 resize of every
800x600 JPEG to 200x88 at quality 95, per session folder, copying
measurements.csv/summary.txt and printing a size report). Our collector renders
at network resolution already, so this is only needed for external/high-res
sessions — the resize itself runs batched on device.
"""

from __future__ import annotations

import csv
import os
import shutil

import numpy as np
import jax.numpy as jnp

from cilrs_tpu.ops.image import resize_frame


def process_session(input_dir: str, output_dir: str, height: int = 88, width: int = 200,
                    batch: int = 256, verbose: bool = True) -> dict:
    os.makedirs(output_dir, exist_ok=True)
    n_in = n_out = 0
    for name in sorted(os.listdir(input_dir)):
        path = os.path.join(input_dir, name)
        if name.endswith(".npz"):
            frames = np.load(path)["frames"]
            n_in += len(frames)
            out = []
            for i in range(0, len(frames), batch):
                chunk = jnp.asarray(frames[i : i + batch], jnp.float32) / 255.0
                out.append(np.asarray(resize_frame(chunk, height, width) * 255.0).astype(np.uint8))
            resized = np.concatenate(out)
            np.savez_compressed(os.path.join(output_dir, name), frames=resized)
            n_out += len(resized)
        elif name.endswith((".jpg", ".jpeg", ".png")):
            from PIL import Image

            img = np.asarray(Image.open(path))
            n_in += 1
            small = resize_frame(jnp.asarray(img, jnp.float32) / 255.0, height, width)
            Image.fromarray((np.asarray(small) * 255).astype(np.uint8)).save(
                os.path.join(output_dir, name), quality=95
            )
            n_out += 1
        elif name in ("measurements.csv", "summary.txt"):
            shutil.copy(path, os.path.join(output_dir, name))
    report = {"frames_in": n_in, "frames_out": n_out,
              "size_mb": _dir_size_mb(output_dir)}
    if verbose:
        print(f"  prepared {n_out} frames -> {output_dir} ({report['size_mb']:.1f} MB)")
    return report


def _dir_size_mb(d: str) -> float:
    return sum(
        os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
    ) / 1e6
