"""Stereo datasets: Tsukuba and Middlebury 2005/2014, with array caching.

Capability parity with the reference data layer (`crf/dataloader.py`):
- `TsukubaPair`: the bundled head-and-lamp pair + ground-truth disparity
  (the reference ships it in `Experiments/`; path is configurable).
- `MiddleburyStereo2014`: glob `*/im0.png`, `im1.png`, `disp0.pfm`
  (`crf/dataloader.py:37-52` semantics) with Gaussian-blurred downsizing.
- `MiddleburyStereo2005`: scene-split train/val
  (`['Laundry','Dolls','Reindeer']` / `['Art','Books','Moebius']`,
  `crf/dataloader.py:102-152`) for the depth-upsampling task, producing
  (low-res disparity, high-res image, high-res GT) triples.
- `UnaryCache`: npz-file caching of precomputed cost volumes keyed by
  (scene, downsize) — replaces the reference's `cachelist.pkl` pickle
  protocol (`crf/dataloader.py:61-87`) with per-item .npz files.

Host-side numpy; device placement happens in the training loop.
"""
from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from ..utils.io import read_image, read_pfm, read_pgm

__all__ = [
    "TsukubaPair",
    "MiddleburyStereo2014",
    "MiddleburyStereo2005",
    "UnaryCache",
    "downsize_image",
]

TSUKUBA_DIR = os.environ.get("DET_TSUKUBA_DIR", "/root/reference/Experiments")


def _gauss1d(x: np.ndarray, sigma: float, axis: int) -> np.ndarray:
    if sigma <= 0:
        return x
    r = max(1, int(np.ceil(3 * sigma)))
    k = np.exp(-0.5 * (np.arange(-r, r + 1) / sigma) ** 2)
    k /= k.sum()
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    xp = np.pad(x, pad, mode="reflect")
    out = np.zeros_like(x)
    for i, w in enumerate(k):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + x.shape[axis])
        out += w * xp[tuple(sl)]
    return out


def downsize_image(img: np.ndarray, factor: int) -> np.ndarray:
    """Anti-aliased integer downsizing: Gaussian blur (σ = factor/2) then
    stride slicing — semantics of `crf/dataloader.py:44-47`."""
    if factor <= 1:
        return img
    img = _gauss1d(_gauss1d(img, factor / 2.0, 0), factor / 2.0, 1)
    return img[::factor, ::factor]


@dataclass
class TsukubaPair:
    """The bundled Tsukuba pair. GT convention: `truedisp` is 16× the true
    disparity at full resolution (the reference trains against gt/16 — see
    `trainableDenseCRF.ipynb` cell 14's (4·d − gt/4) masked MSE)."""

    root: str = TSUKUBA_DIR

    def available(self) -> bool:
        p = Path(self.root)
        return all(
            (p / f).exists() for f in ("imL.png", "imR.png", "truedisp.row3.col3.pgm")
        )

    def load(self, downsize: int = 1):
        p = Path(self.root)
        left = read_image(p / "imL.png")
        right = read_image(p / "imR.png")
        gt = read_pgm(p / "truedisp.row3.col3.pgm").astype(np.float64) / 16.0
        if downsize > 1:
            left = downsize_image(left, downsize)
            right = downsize_image(right, downsize)
            gt = gt[::downsize, ::downsize] / downsize
        return {"left": left, "right": right, "disparity": gt}


@dataclass
class MiddleburyStereo2014:
    """Middlebury 2014 layout: root/<scene>/{im0.png, im1.png, disp0.pfm}."""

    root: str
    downsize: int = 4

    def __post_init__(self):
        self.scenes = sorted(
            d.name for d in Path(self.root).iterdir() if (d / "im0.png").exists()
        ) if Path(self.root).exists() else []

    def __len__(self):
        return len(self.scenes)

    def __getitem__(self, idx: int):
        scene = Path(self.root) / self.scenes[idx]
        left = downsize_image(read_image(scene / "im0.png"), self.downsize)
        right = downsize_image(read_image(scene / "im1.png"), self.downsize)
        item = {"left": left, "right": right, "scene": self.scenes[idx]}
        dpath = scene / "disp0.pfm"
        if dpath.exists():
            gt = read_pfm(dpath)
            gt = gt[:: self.downsize, :: self.downsize] / self.downsize
            item["disparity"] = np.where(np.isfinite(gt), gt, 0.0)
        return item


TRAIN_SCENES_2005 = ["Laundry", "Dolls", "Reindeer"]
VAL_SCENES_2005 = ["Art", "Books", "Moebius"]


@dataclass
class MiddleburyStereo2005:
    """Depth-upsampling task data (`StereoUpsampling05`,
    `crf/dataloader.py:102-152`): items are (low-res disparity, full-res
    image, full-res GT disparity) with the reference's scene split."""

    root: str
    downsize: int = 16
    val: bool = False

    def __post_init__(self):
        scenes = VAL_SCENES_2005 if self.val else TRAIN_SCENES_2005
        self.scenes = [s for s in scenes if (Path(self.root) / s).exists()]

    def __len__(self):
        return len(self.scenes)

    def __getitem__(self, idx: int):
        scene = Path(self.root) / self.scenes[idx]
        img = read_image(next(iter(sorted(scene.glob("view1.png")) or sorted(scene.glob("im0.png")))))
        gt_path = next(iter(sorted(scene.glob("disp1.png")) or sorted(scene.glob("disp0.pfm"))))
        if gt_path.suffix == ".pfm":
            gt = read_pfm(gt_path)
            gt = np.where(np.isfinite(gt), gt, 0.0)
        else:
            gt = np.asarray(read_image(gt_path))[..., 0] * 255.0
        # pyramid-reduce the GT to the low-res input disparity
        lowres = downsize_image(gt[..., None], self.downsize)[..., 0] / self.downsize
        return {
            "disp_lowres": lowres,
            "image": img,
            "disparity": gt,
            "scene": self.scenes[idx],
        }


@dataclass
class UnaryCache:
    """On-disk cache of precomputed cost volumes / features, keyed by a
    string (scene + config). Replaces `cachelist.pkl`
    (`crf/dataloader.py:61-87`) with one .npz per key."""

    cache_dir: str

    def _path(self, key: str) -> Path:
        h = hashlib.sha1(key.encode()).hexdigest()[:16]
        return Path(self.cache_dir) / f"{h}.npz"

    def get(self, key: str):
        p = self._path(key)
        if p.exists():
            with np.load(p) as z:
                return {k: z[k] for k in z.files}
        return None

    def put(self, key: str, arrays: dict) -> None:
        Path(self.cache_dir).mkdir(parents=True, exist_ok=True)
        np.savez_compressed(self._path(key), **arrays)

    def get_or_compute(self, key: str, fn):
        hit = self.get(key)
        if hit is not None:
            return hit
        out = fn()
        self.put(key, out)
        return out


@dataclass
class KITTIStereo2015:
    """KITTI 2015 scene-flow layout (`Experiments/Untitled.ipynb` browsing
    capability): root/{image_2,image_3,disp_occ_0,obj_map}/NNNNNN_10.png."""

    root: str
    downsize: int = 1

    def __post_init__(self):
        left_dir = Path(self.root) / "image_2"
        self.frames = sorted(
            p.stem for p in left_dir.glob("*_10.png")
        ) if left_dir.exists() else []

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, idx: int):
        frame = self.frames[idx]
        root = Path(self.root)
        item = {
            "left": downsize_image(read_image(root / "image_2" / f"{frame}.png"), self.downsize),
            "right": downsize_image(read_image(root / "image_3" / f"{frame}.png"), self.downsize),
            "frame": frame,
        }
        disp_path = root / "disp_occ_0" / f"{frame}.png"
        if disp_path.exists():
            # KITTI encodes disparity as uint16 png / 256
            from PIL import Image as _Image

            raw = np.asarray(_Image.open(disp_path), np.float64) / 256.0
            item["disparity"] = raw[:: self.downsize, :: self.downsize] / self.downsize
        obj_path = root / "obj_map" / f"{frame}.png"
        if obj_path.exists():
            from PIL import Image as _Image

            item["obj_map"] = np.asarray(_Image.open(obj_path))[:: self.downsize, :: self.downsize]
        return item
