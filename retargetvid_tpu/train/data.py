"""Training / inference datasets (reference ``unisal/data.py`` parity).

Dataset classes mirror the reference's surface:

- :class:`MemoryImageDataset` / :class:`MemoryFramesDataset` — in-memory
  frames, LANCZOS-resized to the optimal x32 grid and ImageNet-normalized
  (``data.py:1241-1386``); these feed the crop pipeline.
- :class:`FolderImageDataset` / :class:`FolderVideoDataset` — path inference
  over image folders (``data.py:1106-1240``).
- :class:`DHF1KDataset` / :class:`SALICONDataset` / :class:`HollywoodDataset`
  / :class:`UCFSportsDataset` — training sets, located via the same
  environment variables as the reference (``DHF1K_DATA_DIR`` etc.,
  ``data.py:23-35``); they yield (frames, saliency, fixations) NHWC batches
  for :class:`retargetvid_tpu.train.trainer.Trainer`.

All tensor preprocessing runs on device via the matmul Lanczos resize; the
host only decodes files.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from retargetvid_tpu.pipeline.saliency import get_optimal_out_size, preprocess_frames

__all__ = [
    "MemoryImageDataset", "MemoryFramesDataset",
    "FolderImageDataset", "FolderVideoDataset",
    "DHF1KDataset", "SALICONDataset", "HollywoodDataset", "UCFSportsDataset",
]

_IMG_EXTS = ('.png', '.jpg', '.jpeg', '.bmp')


class MemoryImageDataset:
    """In-memory still images; each item preprocessed independently."""

    def __init__(self, images: Sequence[np.ndarray]):
        self.images = list(images)
        self.frame_modulo = 1
        self.target_size_dict = {i: img.shape[:2]
                                 for i, img in enumerate(self.images)}
        self.out_size_dict = {i: get_optimal_out_size(img.shape[:2])
                              for i, img in enumerate(self.images)}

    def __len__(self):
        return len(self.images)

    def get_data(self, idx: int):
        img = self.images[idx]
        out = np.asarray(preprocess_frames(img[None], self.out_size_dict[idx]))
        return [1], out[0], self.target_size_dict[idx]

    def get_all_data(self) -> np.ndarray:
        out_size = self.out_size_dict[0]
        stack = np.stack(self.images)
        return np.asarray(preprocess_frames(stack, out_size))


class MemoryFramesDataset(MemoryImageDataset):
    """In-memory video frames with the reference's frame_modulo=4 chunks."""

    def __init__(self, images, frame_modulo: int = 4):
        super().__init__(images)
        self.frame_modulo = frame_modulo
        self.out_size = self.out_size_dict[0]
        self.target_size = self.target_size_dict[0]

    def get_data(self, vid_nr: int, start: int = 0):
        n = len(self.images)
        frame_nrs = list(range(vid_nr, min(vid_nr + self.frame_modulo, n)))
        stack = np.stack([self.images[f] for f in frame_nrs])
        seq = np.asarray(preprocess_frames(stack, self.out_size))
        return frame_nrs, seq, self.target_size


class FolderImageDataset(MemoryImageDataset):
    """All images under a folder."""

    def __init__(self, folder):
        import cv2
        files = sorted(p for p in Path(folder).iterdir()
                       if p.suffix.lower() in _IMG_EXTS)
        self.files = files
        images = [cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
                  for p in files]
        super().__init__(images)


class FolderVideoDataset(MemoryFramesDataset):
    """Frames of one video folder (frame images) or a video file."""

    def __init__(self, path, frame_modulo: Optional[int] = None):
        import cv2
        path = Path(path)
        if path.is_dir():
            files = sorted(p for p in path.iterdir()
                           if p.suffix.lower() in _IMG_EXTS)
            images = [cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
                      for p in files]
        else:
            from retargetvid_tpu.io.video import VideoReader
            reader = VideoReader(path)
            images = list(reader.frames())
            reader.stop()
        super().__init__(images, frame_modulo=frame_modulo or 5)


# ---------------------------------------------------------------------------
# Training datasets (environment-variable located, like the reference)
# ---------------------------------------------------------------------------

class _SaliencyFolderDataset:
    """Generic (frames, saliency, fixation) folder dataset.

    Expects per-video directories containing ``images/``, ``maps/`` and
    ``fixation/`` subfolders (the DHF1K/Hollywood/UCFSports layout the
    reference consumes).
    """

    env_var: str = ''
    source: str = ''
    seq_len: int = 12
    frame_modulo: int = 5

    def __init__(self, phase: str = 'train', data_dir=None,
                 seq_len: Optional[int] = None, seed: int = 0):
        data_dir = data_dir or os.environ.get(self.env_var)
        if not data_dir:
            raise FileNotFoundError(
                f'{self.env_var} is not set; cannot locate {self.source} data')
        self.dir = Path(data_dir)
        self.phase = phase
        self.seq_len = seq_len or self.seq_len
        self.rng = np.random.default_rng(seed)
        self.videos = sorted(p for p in self.dir.iterdir() if p.is_dir())
        if not self.videos:
            raise FileNotFoundError(f'no videos under {self.dir}')

    def __len__(self):
        return len(self.videos)

    def _load_frames(self, folder: Path, frame_nrs) -> np.ndarray:
        import cv2
        out = []
        files = sorted(folder.iterdir())
        for f in frame_nrs:
            img = cv2.imread(str(files[f]))
            out.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
        return np.stack(out)

    def sample(self, batch_size: int = 1):
        """One (x, sal, fix) training batch of random clips."""
        xs, sals, fixs = [], [], []
        for _ in range(batch_size):
            vid = self.videos[self.rng.integers(len(self.videos))]
            img_dir = vid / 'images'
            map_dir = vid / 'maps'
            fix_dir = vid / 'fixation'
            n = len(list(img_dir.iterdir()))
            max_start = max(n - self.seq_len * self.frame_modulo, 1)
            start = int(self.rng.integers(max_start))
            frame_nrs = list(range(start,
                                   min(start + self.seq_len * self.frame_modulo,
                                       n),
                                   self.frame_modulo))[:self.seq_len]
            frames = self._load_frames(img_dir, frame_nrs)
            sal = self._load_frames(map_dir, frame_nrs)[..., :1]
            fix = self._load_frames(fix_dir, frame_nrs)[..., :1]
            out_size = get_optimal_out_size(frames.shape[1:3])
            x = np.asarray(preprocess_frames(frames, out_size))
            sal = sal.astype(np.float32)
            sal = sal / np.maximum(sal.sum(axis=(1, 2, 3), keepdims=True), 1)
            xs.append(x)
            sals.append(sal)
            fixs.append((fix > 127).astype(np.float32))
        return (np.stack(xs), np.stack(sals), np.stack(fixs))


class DHF1KDataset(_SaliencyFolderDataset):
    env_var = 'DHF1K_DATA_DIR'
    source = 'DHF1K'


class HollywoodDataset(_SaliencyFolderDataset):
    env_var = 'HOLLYWOOD_DATA_DIR'
    source = 'Hollywood'


class UCFSportsDataset(_SaliencyFolderDataset):
    env_var = 'UCFSPORTS_DATA_DIR'
    source = 'UCFSports'


class SALICONDataset(_SaliencyFolderDataset):
    """Static image saliency (T=1 batches)."""
    env_var = 'SALICON_DATA_DIR'
    source = 'SALICON'
    seq_len = 1
    frame_modulo = 1
